"""Host-side pandas output assembly.

This is the library's I/O boundary: arrays live on device for compute, pandas
appears only here.  Column layouts, prefixes, NaN/dtype repair and
tie-breaking reproduce the reference byte-for-byte:

  * match table assembly  -- reference string_grouper.py:443-518
  * nearest-match (top-1) -- reference string_grouper.py:783-849
  * dedup group output    -- reference string_grouper.py:851-904
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import pandas as pd

from .config import (
    DEFAULT_COLUMN_NAME,
    DEFAULT_ID_NAME,
    DEFAULT_MASTER_ID_NAME,
    DEFAULT_MASTER_NAME,
    GROUP_REP_CENTROID,
    GROUP_REP_PREFIX,
    LEFT_PREFIX,
    MOST_SIMILAR_PREFIX,
    RIGHT_PREFIX,
)
from .ops.connected_components import connected_components


def _prefix_columns(data: Union[pd.Series, pd.DataFrame], prefix: str):
    if isinstance(data, pd.DataFrame):
        return data.rename(columns={c: f"{prefix}{c}" for c in data.columns})
    return data.rename(f"{prefix}{data.name}")


def _gather_side(
    series: pd.Series, positions, fallback_name: str, drop_index: bool
):
    named = series if series.name else series.rename(fallback_name)
    return named.iloc[positions].reset_index(drop=drop_index)


def assemble_matches(
    master: pd.Series,
    duplicates: Optional[pd.Series],
    master_id: Optional[pd.Series],
    duplicates_id: Optional[pd.Series],
    matches_list: pd.DataFrame,
    ignore_index: bool,
) -> pd.DataFrame:
    """Long-format match table: left_*, similarity, right_* columns
    (reference get_matches, string_grouper.py:443-518)."""
    left = _gather_side(
        master, matches_list.master_side, DEFAULT_COLUMN_NAME, ignore_index
    )
    right_src = master if duplicates is None else duplicates
    right = _gather_side(
        right_src, matches_list.dupe_side, DEFAULT_COLUMN_NAME, ignore_index
    )
    if isinstance(right, pd.DataFrame):
        right = right[right.columns[::-1]]

    similarity = matches_list.similarity.reset_index(drop=True)
    if master_id is None:
        return pd.concat(
            [
                _prefix_columns(left, LEFT_PREFIX),
                similarity,
                _prefix_columns(right, RIGHT_PREFIX),
            ],
            axis=1,
        )
    left_id = _gather_side(master_id, matches_list.master_side, DEFAULT_ID_NAME, True)
    right_id_src = master_id if duplicates is None else duplicates_id
    right_id = _gather_side(right_id_src, matches_list.dupe_side, DEFAULT_ID_NAME, True)
    return pd.concat(
        [
            _prefix_columns(left, LEFT_PREFIX),
            _prefix_columns(left_id, LEFT_PREFIX),
            similarity,
            _prefix_columns(right_id, RIGHT_PREFIX),
            _prefix_columns(right, RIGHT_PREFIX),
        ],
        axis=1,
    )


def assemble_nearest_matches(
    master: pd.Series,
    duplicates: pd.Series,
    master_id: Optional[pd.Series],
    duplicates_id: Optional[pd.Series],
    matches_list: pd.DataFrame,
    ignore_index: bool,
    replace_na: bool,
) -> Union[pd.DataFrame, pd.Series]:
    """Top-1 match per duplicate with unmatched-passthrough and NaN/dtype
    repair (reference _get_nearest_matches, string_grouper.py:783-849)."""
    prefix = MOST_SIMILAR_PREFIX
    master_label = f"{prefix}{master.name if master.name else DEFAULT_MASTER_NAME}"
    master_p = master.rename(master_label).reset_index(drop=ignore_index)
    dupes = duplicates.rename("duplicates").reset_index(drop=ignore_index)

    if isinstance(dupes, pd.DataFrame):
        master_p = master_p.rename(
            columns={
                c: f"{prefix}{c}" for c in master_p.columns if str(c) != master_label
            }
        )

    master_id_label = None
    if master_id is not None:
        master_id_label = (
            f"{prefix}{master_id.name if master_id.name else DEFAULT_MASTER_ID_NAME}"
        )
        master_p = pd.concat(
            [master_p, master_id.rename(master_id_label).reset_index(drop=True)], axis=1
        )
        dupes = pd.concat(
            [dupes, duplicates_id.rename("duplicates_id").reset_index(drop=True)], axis=1
        )

    # Highest similarity per duplicate; ties go to the smallest master index
    # (reference :803-807).
    best = matches_list.groupby("dupe_side").agg({"similarity": "max"}).reset_index()
    best = best.merge(matches_list, on=["dupe_side", "similarity"])
    best = best.groupby(["dupe_side"]).agg({"master_side": "min"}).reset_index()

    # Keep unmatched duplicates (outer), then attach master strings (left).
    best = best.merge(dupes, left_on="dupe_side", right_index=True, how="outer")
    best = best.merge(master_p, left_on="master_side", right_index=True, how="left")

    # Unmatched rows fall back to the duplicate string itself (:815-817).
    rows_to_update = best[master_label].isnull()
    best.loc[rows_to_update, master_label] = best[rows_to_update].duplicates
    if master_id is not None:
        best.loc[rows_to_update, master_id_label] = best[rows_to_update].duplicates_id
        # Undo pandas' NaN-driven dtype upcast when possible (:822-827).
        if (
            best[master_id_label].dtype != master_id.dtype
            and duplicates_id.dtype == master_id.dtype
        ):
            best[master_id_label] = best[master_id_label].astype(master_id.dtype)

    required = [master_label] if master_id is None else [master_id_label, master_label]
    index_cols: List = (
        [c for c in master_p.columns if c not in required]
        if isinstance(master_p, pd.DataFrame)
        else []
    )
    if replace_na:
        dupes_index_cols = [
            c for c in dupes.columns if str(c) not in ("duplicates", "duplicates_id")
        ]
        best.loc[rows_to_update, index_cols] = best.loc[
            rows_to_update, dupes_index_cols
        ].values
        for m, d in zip(index_cols, dupes_index_cols):
            if best[m].dtype != master_p[m].dtype and dupes[d].dtype == master_p[m].dtype:
                best[m] = best[m].astype(master_p[m].dtype)

    best = best.sort_values("dupe_side").set_index("dupe_side")
    output = best[index_cols + required]
    output.index = duplicates.index
    return output.squeeze(axis=1)


def group_representatives(
    matches_list: pd.DataFrame, n: int, group_rep: str
) -> np.ndarray:
    """Positional index of each row's group representative.

    Connected components run on device (ops/connected_components.py), the
    representative rule reproduces the reference exactly
    (string_grouper.py:863-886):
      'first'    -- smallest positional index in the component;
      'centroid' -- largest per-row sum of match similarities, ties to the
                    smallest positional index (pandas idxmax semantics).
    """
    rows = matches_list.master_side.to_numpy()
    cols = matches_list.dupe_side.to_numpy()
    labels = connected_components(rows, cols, n)

    pos = np.arange(n, dtype=np.int64)
    if group_rep == GROUP_REP_CENTROID:
        weight = np.bincount(
            rows, weights=matches_list.similarity.to_numpy(dtype=np.float64), minlength=n
        )
        order = np.lexsort((pos, -weight, labels))
    else:  # 'first'
        order = np.lexsort((pos, labels))
    lab_sorted = labels[order]
    firsts_mask = np.r_[True, lab_sorted[1:] != lab_sorted[:-1]]
    rep_rows = order[firsts_mask]  # representative position per group
    rep_of_label = np.zeros(n, dtype=np.int64)
    rep_of_label[lab_sorted[firsts_mask]] = rep_rows
    return rep_of_label[labels]


def assemble_groups(
    master: pd.Series,
    master_id: Optional[pd.Series],
    matches_list: pd.DataFrame,
    ignore_index: bool,
    group_rep: str,
) -> Union[pd.DataFrame, pd.Series]:
    """Group-representative output (reference _deduplicate,
    string_grouper.py:851-904)."""
    n = len(master)
    rep = group_representatives(matches_list, n, group_rep)

    prefix = GROUP_REP_PREFIX
    label = f"{prefix}{master.name}" if master.name else prefix[:-1]
    output = master.iloc[rep].rename(label).reset_index(drop=ignore_index)
    if isinstance(output, pd.DataFrame):
        output = output.rename(
            columns={c: f"{prefix}{c}" for c in output.columns if str(c) != label}
        )
    if master_id is not None:
        id_label = f"{prefix}{master_id.name if master_id.name else DEFAULT_ID_NAME}"
        output_id = master_id.iloc[rep].rename(id_label).reset_index(drop=True)
        output = pd.concat([output_id, output], axis=1)
    output.index = master.index
    return output
