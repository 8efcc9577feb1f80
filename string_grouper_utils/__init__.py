"""Drop-in equivalent of the reference's ``string_grouper_utils`` package
(reference: string_grouper_utils/__init__.py:1-2): post-hoc group
representative re-selection.  Implementation lives in
``string_grouper_tpu.utils.group_reps``; re-exported via the inner
``.string_grouper_utils`` module to mirror the reference layout."""

from .string_grouper_utils import (
    new_group_rep_by_completeness,
    new_group_rep_by_earliest_timestamp,
    new_group_rep_by_highest_weight,
)

__all__ = [
    "new_group_rep_by_completeness",
    "new_group_rep_by_earliest_timestamp",
    "new_group_rep_by_highest_weight",
]
