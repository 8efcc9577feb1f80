"""Drop-in alias for the reference package name: ``from string_grouper
import match_strings`` works unchanged against the TPU-native build
(reference string_grouper/__init__.py:1-2).

The functions are re-exported from the inner ``.string_grouper`` module —
mirroring the reference layout — so mock-patching
``string_grouper.string_grouper.StringGrouper`` intercepts them."""

from .string_grouper import (
    StringGrouper,
    StringGrouperConfig,
    StringGrouperNotFitException,
    compute_pairwise_similarities,
    group_similar_strings,
    match_most_similar,
    match_strings,
)

__all__ = [
    "compute_pairwise_similarities",
    "group_similar_strings",
    "match_most_similar",
    "match_strings",
    "StringGrouperConfig",
    "StringGrouper",
    "StringGrouperNotFitException",
]
