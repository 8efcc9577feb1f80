"""Configuration for the TPU-native string grouper.

Mirrors the option surface of the reference library's ``StringGrouperConfig``
(reference: string_grouper/string_grouper.py:17-202) while adding TPU-specific
performance knobs.  All reference options keep their exact names, defaults and
semantics so that user code written against the reference keeps working.
"""

from __future__ import annotations

import multiprocessing
from typing import NamedTuple, Optional, Tuple, Union

import numpy as np

# --- Reference-compatible defaults (string_grouper.py:17-37) -----------------
DEFAULT_NGRAM_SIZE: int = 3
DEFAULT_TFIDF_MATRIX_DTYPE: type = np.float64
DEFAULT_REGEX: str = r"[,-./]|\s"
DEFAULT_MAX_N_MATCHES: int = 20
DEFAULT_MIN_SIMILARITY: float = 0.8
DEFAULT_N_PROCESSES: int = multiprocessing.cpu_count() - 1
DEFAULT_IGNORE_CASE: bool = True
DEFAULT_DROP_INDEX: bool = False
DEFAULT_REPLACE_NA: bool = False
DEFAULT_INCLUDE_ZEROES: bool = True
GROUP_REP_CENTROID: str = "centroid"
GROUP_REP_FIRST: str = "first"
DEFAULT_GROUP_REP: str = GROUP_REP_CENTROID
DEFAULT_FORCE_SYMMETRIES: bool = True
DEFAULT_N_BLOCKS: Optional[Tuple[int, int]] = None
DEFAULT_NORMALIZE_TO_ASCII: bool = True

# --- Output column-naming constants (string_grouper.py:39-49) ----------------
DEFAULT_COLUMN_NAME: str = "side"
DEFAULT_ID_NAME: str = "id"
LEFT_PREFIX: str = "left_"
RIGHT_PREFIX: str = "right_"
MOST_SIMILAR_PREFIX: str = "most_similar_"
DEFAULT_MASTER_NAME: str = "master"
DEFAULT_MASTER_ID_NAME: str = f"{DEFAULT_MASTER_NAME}_{DEFAULT_ID_NAME}"
GROUP_REP_PREFIX: str = "group_rep_"

# --- TPU-specific defaults ----------------------------------------------------
# Feature-hash dimension for the phase-1 upper-bound filter matmul.  Must be a
# power of two.  Larger values tighten the upper bound (fewer false-positive
# candidates) at the cost of more MXU FLOPs per pair.  512 measured faster
# end-to-end at 663k than 1024 once escalation was kt-bucketed and downloads
# streamed (phase-1 wall 5.6 s vs 8-11 s; the extra ~3.5M false candidates
# cost ~+0.5 s rescore and ~+1.1 s escalation, less than the matmul saving).
# Results are exact for any value.
DEFAULT_HASH_DIM: int = 512
# DEPRECATED legacy knob (earlier designs shipped a slack margin of
# candidates); the current matcher's adaptive driver is always complete, so
# this is a no-op kept for API stability.  Explicit use warns (engine.py
# _warn_legacy_kwargs); scheduled for removal.
DEFAULT_TOPN_SLACK: int = 8
# Rows per left-side chunk streamed through the phase-1 filter.
DEFAULT_LEFT_CHUNK: int = 4096
# Right-side rows per phase-1 tile (the lax.scan step of the tiled
# matmul + candidate extraction).
DEFAULT_RIGHT_TILE: int = 4096


class StringGrouperConfig(NamedTuple):
    r"""Immutable configuration (reference: string_grouper.py:156-202).

    Reference options (identical semantics):

    :param ngram_size: number of characters per n-gram.  Default 3.
    :param tfidf_matrix_dtype: np.float32 or np.float64; dtype of the reported
        similarity values.  Default np.float64.
    :param regex: characters matching this regex are removed before n-gram
        extraction.  Default ``'[,-./]|\s'``.
    :param max_n_matches: maximum number of matches kept per master string.
    :param min_similarity: minimum cosine similarity of a reported match.
    :param number_of_processes: caps the OpenMP thread count of the native
        host kernels (exact rescore, selection, fix-ups) -- the same
        resource knob the reference routes to sp_matmul_topn's n_threads
        (reference string_grouper.py:22, :731).  Device parallelism is
        unaffected (TPU kernel parallelism is intrinsic).
    :param ignore_case: lowercase strings before matching.
    :param ignore_index: exclude index columns from outputs.
    :param include_zeroes: when min_similarity <= 0, include zero-similarity
        pairs in the output of get_matches.
    :param replace_na: fill NaN index values of non-matches with the
        duplicates-side index values (match_most_similar only).
    :param group_rep: 'centroid' or 'first' group-representative scheme.
    :param force_symmetries: for self-joins, force an exactly-1 diagonal and a
        symmetric match set.
    :param n_blocks: optional (left, right) block counts.  On TPU this is a
        hint for the streaming scheduler; results are block-count invariant.
    :param normalize_to_ascii: NFKD-normalize then strip non-ASCII.

    TPU-specific options:

    :param hash_dim: feature-hash width of the phase-1 filter matmul.
    :param topn_slack: DEPRECATED no-op knob (the adaptive matcher is always
        complete); explicit use emits a DeprecationWarning and the option
        will be removed in a future release.
    :param left_chunk: left-side rows per streamed device chunk.
    :param right_tile: right-side rows per phase-1 scan tile.
    :param mesh: optional ``jax.sharding.Mesh`` with axes ('dp', 'mp') (see
        :func:`string_grouper_tpu.parallel.make_mesh`); when set, matching
        runs sharded across the mesh devices.
    :param multihost: multi-controller (multi-host) execution tier
        (parallel/multihost.py).  ``None`` (default) auto-enables when the
        process is part of a ``jax.distributed`` multi-controller job
        (``jax.process_count() > 1``); True/False force it.  Under the tier
        every process calls the same API with the same full inputs (SPMD);
        encode and matching shard across processes internally and every
        process returns the identical full output.  Tier selection: the
        string ``"replicated"`` forces the fast tier (exact corpus
        allgathered to every host -- O(corpus) host memory per process);
        ``"sharded"`` forces the memory-scalable tier (no process holds the
        full corpus ELL; ~1/n_processes host memory).  ``True``/auto picks
        ``replicated`` below ``SG_TPU_MH_SHARDED_ROWS`` corpus rows
        (default 2,000,000) and ``sharded`` at or above it.  The
        ``replicated`` tier composes with ``mesh`` (the per-process matcher
        then runs sharded over its local devices).
    """

    ngram_size: int = DEFAULT_NGRAM_SIZE
    tfidf_matrix_dtype: type = DEFAULT_TFIDF_MATRIX_DTYPE
    regex: str = DEFAULT_REGEX
    max_n_matches: Optional[int] = DEFAULT_MAX_N_MATCHES
    min_similarity: float = DEFAULT_MIN_SIMILARITY
    number_of_processes: int = DEFAULT_N_PROCESSES
    ignore_case: bool = DEFAULT_IGNORE_CASE
    ignore_index: bool = DEFAULT_DROP_INDEX
    include_zeroes: bool = DEFAULT_INCLUDE_ZEROES
    replace_na: bool = DEFAULT_REPLACE_NA
    group_rep: str = DEFAULT_GROUP_REP
    force_symmetries: bool = DEFAULT_FORCE_SYMMETRIES
    n_blocks: Optional[Tuple[int, int]] = DEFAULT_N_BLOCKS
    normalize_to_ascii: bool = DEFAULT_NORMALIZE_TO_ASCII
    hash_dim: int = DEFAULT_HASH_DIM
    topn_slack: int = DEFAULT_TOPN_SLACK
    left_chunk: int = DEFAULT_LEFT_CHUNK
    right_tile: int = DEFAULT_RIGHT_TILE
    mesh: Optional[object] = None
    multihost: Optional[Union[bool, str]] = None
