from .group_reps import (
    new_group_rep_by_completeness,
    new_group_rep_by_earliest_timestamp,
    new_group_rep_by_highest_weight,
)

__all__ = [
    "new_group_rep_by_completeness",
    "new_group_rep_by_earliest_timestamp",
    "new_group_rep_by_highest_weight",
]
