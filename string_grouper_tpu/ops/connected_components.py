"""On-device connected components via min-label propagation + pointer jumping.

TPU-native replacement for scipy.sparse.csgraph.connected_components used by
the reference's dedup path (reference string_grouper.py:863).  Edges are
treated as undirected (scipy 'weak' connectivity, the reference's effective
semantics for its symmetric match graphs).  Deterministic: the final label of
a component is the smallest member index, so shard count / edge order never
changes the partition.

Complexity: O((E + N) * log N) work over ~log N sparse-scatter rounds --
each round propagates minima across edges and then fully compresses paths by
repeated pointer jumping, all inside one ``lax.while_loop`` so XLA compiles a
single fused program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


@partial(jax.jit, static_argnames=("n",))
def _cc_kernel(a: jax.Array, b: jax.Array, n: int) -> jax.Array:
    labels0 = jnp.arange(n, dtype=jnp.int32)

    def compress(l):
        # log2(n) pointer jumps fully flatten any path.
        def jump(_, cur):
            return cur[cur]

        return jax.lax.fori_loop(0, max(1, n.bit_length()), jump, l)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        l, _ = state
        m = jnp.minimum(l[a], l[b])
        l2 = l.at[a].min(m)
        l2 = l2.at[b].min(m)
        l2 = compress(l2)
        return l2, jnp.any(l2 != l)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


def connected_components(
    edges_a: np.ndarray, edges_b: np.ndarray, n: int
) -> np.ndarray:
    """Component label per node; label == smallest node index in component.

    Host-resident edge lists route through the native union-find
    (exact_scorer.cpp connected_components_i64, labels bit-identical to the
    device kernel): the device's scatter-min rounds cost ~14 s at 663k
    nodes / 9M edges where union-find takes ~0.2 s.  The device kernel
    below remains the path for device-resident/sharded label propagation
    and the oracle for the equivalence test."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    from ..native import get_scorer_lib

    lib = get_scorer_lib()
    if lib is not None:
        labels = np.empty(n, dtype=np.int64)
        lib.connected_components_i64(
            np.ascontiguousarray(edges_a, dtype=np.int64),
            np.ascontiguousarray(edges_b, dtype=np.int64),
            len(edges_a), n, labels,
        )
        return labels
    e = len(edges_a)
    # Pad BOTH the edge list and the node count to powers of two so every
    # corpus size reuses one compiled kernel per pow2 bucket (XLA compiles
    # of the while-loop kernel take minutes on slow hosts).  Padding edges
    # are self-loops on padding nodes, which keep their own labels and are
    # sliced off.
    cap = _next_pow2(max(e, 8))
    n_pad = _next_pow2(max(n, 8))
    a = np.full(cap, n_pad - 1, dtype=np.int32)
    b = np.full(cap, n_pad - 1, dtype=np.int32)
    a[:e] = edges_a
    b[:e] = edges_b
    labels = _cc_kernel(jnp.asarray(a), jnp.asarray(b), n_pad)
    return np.asarray(labels[:n]).astype(np.int64)
