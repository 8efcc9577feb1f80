"""string_grouper_tpu: TPU-native string matching, deduplication and grouping.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
the ``string_grouper`` reference library (exports mirror
reference string_grouper/__init__.py:1-2 plus the config/engine classes).
"""

from .utils.host_alloc import should_tune as _should_tune, tune_malloc as _tune_malloc

if _should_tune():  # TPU-VM page-fault mitigation; see utils/host_alloc.py
    _tune_malloc()

from .api import (
    compute_pairwise_similarities,
    group_similar_strings,
    match_most_similar,
    match_strings,
)
from .config import (
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
    DEFAULT_NORMALIZE_TO_ASCII,
    DEFAULT_REGEX,
    DEFAULT_REPLACE_NA,
    DEFAULT_TFIDF_MATRIX_DTYPE,
    GROUP_REP_CENTROID,
    GROUP_REP_FIRST,
    StringGrouperConfig,
)
from .engine import StringGrouper
from .validation import StringGrouperNotFitException

__version__ = "0.4.0"

__all__ = [
    "compute_pairwise_similarities",
    "group_similar_strings",
    "match_most_similar",
    "match_strings",
    "StringGrouper",
    "StringGrouperConfig",
    "StringGrouperNotFitException",
]
