"""Multi-chip sharding layer: mesh construction, sharded top-n matching,
collective TF-IDF reductions."""

from .distributed import (
    distributed_df_counts,
    distributed_topn_cosine_matches,
    make_mesh,
    replicated_idf,
    sharded_fit_transform,
)

__all__ = [
    "distributed_df_counts",
    "distributed_topn_cosine_matches",
    "make_mesh",
    "replicated_idf",
    "sharded_fit_transform",
]
