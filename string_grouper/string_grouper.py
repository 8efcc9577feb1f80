"""Alias for the reference's module path ``string_grouper.string_grouper``
(some downstream code imports symbols from the inner module directly)."""

from string_grouper_tpu import (  # noqa: F401
    StringGrouper,
    StringGrouperConfig,
    StringGrouperNotFitException,
    compute_pairwise_similarities,
    group_similar_strings,
    match_most_similar,
    match_strings,
)
from string_grouper_tpu.config import (  # noqa: F401
    DEFAULT_COLUMN_NAME,
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
    DEFAULT_REGEX,
    DEFAULT_REPLACE_NA,
    DEFAULT_TFIDF_MATRIX_DTYPE,
    GROUP_REP_CENTROID,
    GROUP_REP_FIRST,
    LEFT_PREFIX,
    MOST_SIMILAR_PREFIX,
    RIGHT_PREFIX,
)
