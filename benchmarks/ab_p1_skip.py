#!/usr/bin/env python
"""Phase-1 tile-skip A/B (round-5 item 2): can a cheap coarse bound per
(row-block x right-tile) skip the d=512 matmul for tiles that cannot reach
the threshold?

Coarse bound: the hashed projection is entrywise non-negative (TF-IDF
values are positive and the bucket accumulation never flips sign), so for
any row r in block I and column c in tile J,

    score[r, c] = sum_k a[r,k] b[c,k] <= dot(max_rows(A_I), max_cols(B_J))

i.e. ONE d-dot per (block, tile) upper-bounds every pair in the block.  A
grid step whose bound falls below thr_eff provably yields zero candidates
and could be skipped before its (bm x tile x d) MXU work.

This tool measures the skippable fraction on the real 663k corpus -- under
the production layout (collapse-unique rows, bm=512 blocks, 4096-tiles)
and under a lexicographically sorted row order (homogeneous blocks are the
best case for a max-profile bound; the collapse maps make unique-row
permutations output-invariant, so sorting is a legal production change).
The decision (implement the in-kernel skip vs recorded negative) follows
from these numbers; see PHASE1_SKIP_AB_r05.json.

Usage: python benchmarks/ab_p1_skip.py [n]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 663000
    os.makedirs(".jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    import jax.numpy as jnp

    from bench import synthetic_company_names
    from string_grouper_tpu.config import StringGrouperConfig
    from string_grouper_tpu.corpus import TfidfEncoder
    from string_grouper_tpu.ops.matcher import (
        build_hash_matrix,
        effective_threshold,
    )

    series = synthetic_company_names(n)
    cfg = StringGrouperConfig()
    enc = TfidfEncoder(cfg)
    ell = enc.fit_transform(series)
    src = ell.device_src

    # Collapse-unique representatives (the rows the production scan sees).
    if src is not None and src.row_hash is not None:
        import pandas as pd

        key = pd.DataFrame(
            {"h": src.row_hash, "l": np.diff(src.coff)}
        )
        codes = pd.factorize(
            key.h.astype(np.uint64).astype(str) + "_" + key.l.astype(str)
        )[0]
    else:
        import pandas as pd

        codes = pd.factorize(series)[0]
    _, first = np.unique(codes, return_index=True)
    reps = np.sort(first)
    m = len(reps)
    print(f"corpus {n} rows, {m} unique", file=sys.stderr)

    thr = float(effective_threshold(cfg.min_similarity))
    d = cfg.hash_dim
    full = build_hash_matrix(ell, ell.n_rows, d)

    def cleaned(i):
        return bytes(src.flat_codes[src.coff[i]:src.coff[i + 1]]) if src \
            else str(series.iloc[i])

    orders = {
        "natural": np.arange(m),
        "sorted": np.argsort([cleaned(i) for i in reps], kind="stable"),
    }

    out = {"n": n, "unique": m, "thr_eff": thr, "hash_dim": d, "cases": []}
    for oname, perm in orders.items():
        sel = reps[perm]
        for bm, tile in ((512, 4096), (512, 1024), (256, 4096)):
            m_p = -(-m // bm) * bm
            n_p = -(-m // tile) * tile
            idx = np.zeros(m_p, dtype=np.int32)
            idx[:m] = sel
            a = full[jnp.asarray(idx)]
            a = jnp.where((jnp.arange(m_p) < m)[:, None], a, 0)
            idx_t = np.zeros(n_p, dtype=np.int32)
            idx_t[:m] = sel
            b = full[jnp.asarray(idx_t)]
            b = jnp.where((jnp.arange(n_p) < m)[:, None], b, 0)

            t0 = time.perf_counter()

            @jax.jit
            def bounds(a, b):
                # Block-profile bound: one d-dot per (block, tile).
                amax = a.reshape(-1, bm, d).max(axis=1).astype(jnp.float32)
                bmax = b.reshape(-1, tile, d).max(axis=1).astype(jnp.float32)
                u_blk = amax @ bmax.T
                # Tighter per-ROW x tile-profile bound (costs 1/tile of the
                # full matmul); a step skips only if EVERY row in the block
                # is below threshold.
                u_row = a.astype(jnp.float32) @ bmax.T
                row_frac = (u_row < thr).mean()
                step_frac = (
                    u_row.reshape(-1, bm, u_row.shape[1]).max(axis=1) < thr
                ).mean()
                return u_blk, row_frac, step_frac, jnp.percentile(u_row, 50)

            u, row_frac, step_frac, row_p50 = bounds(a, b)
            u = np.asarray(u)
            dt = time.perf_counter() - t0
            skippable = float((u < thr).mean())
            out["cases"].append(
                {
                    "order": oname,
                    "block_m": bm,
                    "tile": tile,
                    "grid_steps": int(u.size),
                    "blockmax_skippable_frac": round(skippable, 4),
                    "blockmax_bound_min": float(u.min()),
                    "blockmax_bound_p50": float(np.percentile(u, 50)),
                    "rowmax_row_frac_below_thr": round(float(row_frac), 4),
                    "rowmax_step_skippable_frac": round(float(step_frac), 4),
                    "rowmax_bound_p50": round(float(row_p50), 3),
                    "coarse_pass_s": round(dt, 3),
                }
            )
            print(out["cases"][-1], file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
