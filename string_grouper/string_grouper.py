"""Alias for the reference's module path ``string_grouper.string_grouper``
(some downstream code imports symbols from, or patches attributes on, the
inner module directly — e.g.
``@patch('string_grouper.string_grouper.StringGrouper')``).

Exports every module-level name of the reference inner module
(reference string_grouper/string_grouper.py:17-49): all option defaults,
the column-naming string constants, the engine/config/exception classes and
the four high-level functions.  The functions here are thin wrappers that
look up ``StringGrouper`` in this module's globals at call time, so
reference-style mock-patching of this module intercepts them exactly like
it does the reference's (reference test_string_grouper.py:396-449).
"""

from typing import Optional, Union

import pandas as pd

from string_grouper_tpu import (  # noqa: F401
    StringGrouper,
    StringGrouperConfig,
    StringGrouperNotFitException,
)
from string_grouper_tpu.config import (  # noqa: F401
    DEFAULT_COLUMN_NAME,
    DEFAULT_DROP_INDEX,
    DEFAULT_FORCE_SYMMETRIES,
    DEFAULT_GROUP_REP,
    DEFAULT_ID_NAME,
    DEFAULT_IGNORE_CASE,
    DEFAULT_INCLUDE_ZEROES,
    DEFAULT_MASTER_ID_NAME,
    DEFAULT_MASTER_NAME,
    DEFAULT_MAX_N_MATCHES,
    DEFAULT_MIN_SIMILARITY,
    DEFAULT_N_BLOCKS,
    DEFAULT_N_PROCESSES,
    DEFAULT_NGRAM_SIZE,
    DEFAULT_NORMALIZE_TO_ASCII,
    DEFAULT_REGEX,
    DEFAULT_REPLACE_NA,
    DEFAULT_TFIDF_MATRIX_DTYPE,
    GROUP_REP_CENTROID,
    GROUP_REP_FIRST,
    GROUP_REP_PREFIX,
    LEFT_PREFIX,
    MOST_SIMILAR_PREFIX,
    RIGHT_PREFIX,
)


def compute_pairwise_similarities(
    string_series_1: pd.Series, string_series_2: pd.Series, **kwargs
) -> pd.Series:
    """Row-wise cosine similarity between two equal-length Series
    (reference string_grouper.py:55-67)."""
    return StringGrouper(string_series_1, string_series_2, **kwargs).dot()


def group_similar_strings(
    strings_to_group: pd.Series,
    string_ids: Optional[pd.Series] = None,
    **kwargs,
) -> Union[pd.DataFrame, pd.Series]:
    """Deduplicate a Series: every member of a similarity group maps to the
    group representative (reference string_grouper.py:70-92)."""
    sg = StringGrouper(strings_to_group, master_id=string_ids, **kwargs)
    sg = sg.fit()
    return sg.get_groups()


def match_most_similar(
    master: pd.Series,
    duplicates: pd.Series,
    master_id: Optional[pd.Series] = None,
    duplicates_id: Optional[pd.Series] = None,
    **kwargs,
) -> Union[pd.DataFrame, pd.Series]:
    """For each duplicate the most similar master string (or itself when
    nothing qualifies); forces max_n_matches=1 (reference
    string_grouper.py:95-127, :120)."""
    kwargs["max_n_matches"] = 1
    sg = StringGrouper(
        master,
        duplicates=duplicates,
        master_id=master_id,
        duplicates_id=duplicates_id,
        **kwargs,
    )
    sg = sg.fit()
    return sg.get_groups()


def match_strings(
    master: pd.Series,
    duplicates: Optional[pd.Series] = None,
    master_id: Optional[pd.Series] = None,
    duplicates_id: Optional[pd.Series] = None,
    **kwargs,
) -> pd.DataFrame:
    """All highly similar string pairs: self-join when only ``master`` is
    given, else master × duplicates (reference string_grouper.py:130-153)."""
    sg = StringGrouper(
        master,
        duplicates=duplicates,
        master_id=master_id,
        duplicates_id=duplicates_id,
        **kwargs,
    )
    sg = sg.fit()
    return sg.get_matches()
