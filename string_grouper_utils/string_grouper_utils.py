"""Alias for the reference's inner module path
``string_grouper_utils.string_grouper_utils`` (reference
string_grouper_utils/string_grouper_utils.py:1-191) — downstream code and
the reference's own tests import both public functions and helpers
(``group_rep_transform``, ``get_column``, ``parse_timestamps``,
``is_date``, ``is_series_of_type``) from here."""

from string_grouper_tpu.utils.group_reps import (  # noqa: F401
    get_column,
    group_rep_transform,
    is_date,
    is_series_of_type,
    new_group_rep_by_completeness,
    new_group_rep_by_earliest_timestamp,
    new_group_rep_by_highest_weight,
    parse_timestamps,
)
