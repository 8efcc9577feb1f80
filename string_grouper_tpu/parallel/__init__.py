"""Multi-chip sharding layer: mesh construction, sharded top-n matching,
collective TF-IDF reductions, and the multi-controller (multi-host) tier."""

from .distributed import (
    distributed_df_counts,
    distributed_topn_cosine_matches,
    make_mesh,
    replicated_idf,
    sharded_fit_transform,
)
from .multihost import (
    multihost_encode_shard,
    multihost_fit_pairs,
    multihost_match_shard,
)

__all__ = [
    "distributed_df_counts",
    "distributed_topn_cosine_matches",
    "make_mesh",
    "multihost_encode_shard",
    "multihost_fit_pairs",
    "multihost_match_shard",
    "replicated_idf",
    "sharded_fit_transform",
]
