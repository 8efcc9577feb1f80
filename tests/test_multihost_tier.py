"""Engine-integrated multi-controller tier (parallel/multihost.py
``multihost_fit_pairs``), exercised under ONE process.

``multihost=True`` with a single process runs the full production code path
(shard-local encode, ELL/payload allgathers, per-shard matching, result
gather, global fix-ups) with degenerate collectives -- so the whole tier is
covered in the regular suite.  The TRUE two-process form (real gloo
collectives, one shard per OS process) is tests/test_multihost.py's engine
workers; its outputs must be bitwise identical to these.
"""

import numpy as np
import pandas as pd
import pytest

import string_grouper_tpu as sgt
from string_grouper_tpu import StringGrouper


def _names(n: int, seed: int = 0) -> pd.Series:
    rng = np.random.default_rng(seed)
    stems = ["hyper", "mega", "quantum", "global", "acme", "stellar",
             "apex", "vertex", "summit", "cascade"]
    kinds = ["industries", "holdings", "systems", "partners"]
    out = []
    for _ in range(n):
        s = f"{rng.choice(stems)} {rng.choice(stems)} {rng.choice(kinds)}"
        if rng.random() < 0.4:
            p = int(rng.integers(0, len(s)))
            s = s[:p] + s[p + 1:]
        out.append(s)
    return pd.Series(out)


class TestMultihostTier:
    def test_self_join_bitwise(self):
        s = _names(250, seed=1)
        a = sgt.match_strings(s, min_similarity=0.6)
        b = sgt.match_strings(s, min_similarity=0.6, multihost=True)
        pd.testing.assert_frame_equal(a, b)

    def test_cross_join_with_ids_bitwise(self):
        s = _names(200, seed=2)
        d = _names(150, seed=3)
        ids = pd.Series([f"id{i}" for i in range(200)])
        dids = pd.Series([f"d{i}" for i in range(150)])
        a = sgt.match_strings(s, d, ids, dids, min_similarity=0.5)
        b = sgt.match_strings(
            s, d, ids, dids, min_similarity=0.5, multihost=True
        )
        pd.testing.assert_frame_equal(a, b)

    def test_groups_bitwise(self):
        s = _names(220, seed=4)
        ids = pd.Series(range(220))
        a = sgt.group_similar_strings(s, ids, min_similarity=0.6)
        b = sgt.group_similar_strings(
            s, ids, min_similarity=0.6, multihost=True
        )
        pd.testing.assert_frame_equal(a, b)

    def test_most_similar_bitwise(self):
        s = _names(180, seed=5)
        d = _names(120, seed=6)
        a = sgt.match_most_similar(s, d, min_similarity=0.5)
        b = sgt.match_most_similar(s, d, min_similarity=0.5, multihost=True)
        pd.testing.assert_frame_equal(a, b)
        a2 = sgt.match_most_similar(s, d, min_similarity=0.5,
                                    ignore_index=True)
        b2 = sgt.match_most_similar(s, d, min_similarity=0.5,
                                    ignore_index=True, multihost=True)
        pd.testing.assert_series_equal(a2, b2)

    def test_float32_bitwise(self):
        s = _names(160, seed=7)
        a = sgt.match_strings(
            s, min_similarity=0.6, tfidf_matrix_dtype=np.float32
        )
        b = sgt.match_strings(
            s, min_similarity=0.6, tfidf_matrix_dtype=np.float32,
            multihost=True,
        )
        pd.testing.assert_frame_equal(a, b)

    def test_include_zeroes_and_edits(self):
        """Zero-similarity completion and interactive edits run on the
        gathered global list exactly like the single-controller engine."""
        s = _names(60, seed=8)
        kw = dict(min_similarity=0, max_n_matches=60, include_zeroes=True)
        a = sgt.match_strings(s, **kw)
        b = sgt.match_strings(s, **kw, multihost=True)
        pd.testing.assert_frame_equal(a, b)

        sg_a = StringGrouper(s, min_similarity=0.6).fit()
        sg_b = StringGrouper(s, min_similarity=0.6, multihost=True).fit()
        sg_a.add_match(s.iloc[0], s.iloc[1])
        sg_b.add_match(s.iloc[0], s.iloc[1])
        pd.testing.assert_frame_equal(sg_a.get_matches(), sg_b.get_matches())

    def test_unicode_corpus(self):
        """Non-ASCII input disables the byte payload globally (bits0 > 8);
        the tier must agree on the fallback and stay bitwise-equal."""
        s = _names(120, seed=9)
        table = str.maketrans({"a": "á", "e": "é"})
        s = pd.Series(
            [x.translate(table) if i % 3 == 0 else x
             for i, x in enumerate(s)]
        )
        a = sgt.match_strings(s, min_similarity=0.5)
        b = sgt.match_strings(s, min_similarity=0.5, multihost=True)
        pd.testing.assert_frame_equal(a, b)

    def test_payload_attached_and_collapse_active(self):
        """The tier inherits the byte-payload + clean-equality collapse
        pillars: the gathered full ELL carries a DeviceEncodeSrc with row
        hashes on the ASCII/f64 path."""
        from string_grouper_tpu.config import StringGrouperConfig
        from string_grouper_tpu.parallel.multihost import (
            _allgather_full_ell,
            multihost_encode_shard,
        )

        s = _names(80, seed=10)
        ell, idf, n_docs = multihost_encode_shard(
            list(s), StringGrouperConfig(min_similarity=0.6)
        )
        assert n_docs == 80
        assert ell.device_src is not None
        assert ell.device_src.row_hash is not None
        full = _allgather_full_ell(ell)
        np.testing.assert_array_equal(full.ids, ell.wait_ready().ids)
        src = full.device_src
        assert src is not None
        # Equal strings must collide on (hash, length) -- the collapse key.
        dup = pd.Series(["acme holdings", "acme holdings", "apex systems"])
        ell2, _, _ = multihost_encode_shard(
            list(dup), StringGrouperConfig(min_similarity=0.6)
        )
        h = ell2.device_src.row_hash
        assert h[0] == h[1] and h[0] != h[2]

    def test_mesh_composes_with_multihost(self):
        """multihost + a LOCAL mesh: each process's matcher runs sharded
        over its own devices (all devices are local under one process);
        output stays bitwise-equal."""
        from string_grouper_tpu.parallel import make_mesh

        s = _names(150, seed=12)
        a = sgt.match_strings(s, min_similarity=0.6)
        b = sgt.match_strings(
            s, min_similarity=0.6, multihost=True, mesh=make_mesh(4, dp=2)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_randomized_fuzz_vs_single_controller(self):
        """Randomized corpora/thresholds/top-n/dtype: the tier must stay
        bitwise-equal to the single-controller engine (the multihost form
        of the mesh fuzz in test_distributed.py)."""
        rng = np.random.default_rng(99)
        for trial in range(5):
            n = int(rng.integers(30, 220))
            s = _names(n, seed=1000 + trial)
            kw = dict(
                min_similarity=float(rng.choice([0.0, 0.3, 0.6, 0.85])),
                max_n_matches=int(rng.integers(1, 12)),
            )
            if rng.random() < 0.3:
                kw["tfidf_matrix_dtype"] = np.float32
            if rng.random() < 0.5:
                d = _names(int(rng.integers(20, 150)), seed=2000 + trial)
                a = sgt.match_strings(s, d, **kw)
                b = sgt.match_strings(s, d, **kw, multihost=True)
            else:
                a = sgt.match_strings(s, **kw)
                b = sgt.match_strings(s, **kw, multihost=True)
            pd.testing.assert_frame_equal(a, b)

    def test_edge_cases(self):
        """Tiny corpora, no-symmetry self-joins, max_n_matches=None, and
        fewer rows than processes-worth of shards."""
        for s in (pd.Series(["solo"]), pd.Series(["a b c", "a b c", "xyz"])):
            a = sgt.match_strings(s, min_similarity=0.1)
            b = sgt.match_strings(s, min_similarity=0.1, multihost=True)
            pd.testing.assert_frame_equal(a, b)
        s = _names(60, seed=13)
        a = sgt.match_strings(s, min_similarity=0.5, force_symmetries=False)
        b = sgt.match_strings(
            s, min_similarity=0.5, force_symmetries=False, multihost=True
        )
        pd.testing.assert_frame_equal(a, b)
        a = sgt.match_strings(s, min_similarity=0.7, max_n_matches=None)
        b = sgt.match_strings(
            s, min_similarity=0.7, max_n_matches=None, multihost=True
        )
        pd.testing.assert_frame_equal(a, b)

    def test_replicated_capacity_guard(self):
        """The replicated tier refuses corpora whose per-host exact-encode
        replication exceeds the host budget, pointing at the sharded
        tier (docs/performance.md 'Capacity envelope')."""
        import os

        s = _names(200, seed=31)
        os.environ["SG_TPU_MH_HOST_BUDGET_GB"] = "0.0000001"
        try:
            with pytest.raises(MemoryError, match="sharded"):
                sgt.match_strings(s, min_similarity=0.6, multihost=True)
            # The sharded tier itself stays available.
            b = sgt.match_strings(
                s, min_similarity=0.6, multihost="sharded"
            )
        finally:
            del os.environ["SG_TPU_MH_HOST_BUDGET_GB"]
        a = sgt.match_strings(s, min_similarity=0.6)
        pd.testing.assert_frame_equal(a, b)

    def test_invalid_multihost_value(self):
        with pytest.raises(Exception, match="multihost"):
            sgt.match_strings(_names(10), multihost="bogus")

    def test_explicit_false_overrides(self):
        """multihost=False forces the single-controller path even when the
        auto-detection would fire (process_count is 1 here, so this just
        checks the knob plumbs through)."""
        s = _names(50, seed=11)
        sg = StringGrouper(s, min_similarity=0.6, multihost=False).fit()
        assert "match.mh_match_s" not in sg.timings.seconds
        sg2 = StringGrouper(s, min_similarity=0.6, multihost=True).fit()
        assert "match.mh_match_s" in sg2.timings.seconds
        pd.testing.assert_frame_equal(sg.get_matches(), sg2.get_matches())


class TestShardedTier:
    """The memory-scalable ``multihost='sharded'`` tier under one process
    (degenerate collectives; the real 2-3 process form is asserted by
    tests/mh_engine_worker.py).  No process materializes the full corpus
    ELL: phase 2 rescoring visits right shards over a broadcast ring."""

    def test_self_join_bitwise(self):
        s = _names(250, seed=21)
        a = sgt.match_strings(s, min_similarity=0.6)
        b = sgt.match_strings(s, min_similarity=0.6, multihost="sharded")
        pd.testing.assert_frame_equal(a, b)

    def test_cross_join_with_ids_bitwise(self):
        s = _names(200, seed=22)
        d = _names(150, seed=23)
        ids = pd.Series([f"id{i}" for i in range(200)])
        dids = pd.Series([f"d{i}" for i in range(150)])
        a = sgt.match_strings(s, d, ids, dids, min_similarity=0.5)
        b = sgt.match_strings(
            s, d, ids, dids, min_similarity=0.5, multihost="sharded"
        )
        pd.testing.assert_frame_equal(a, b)

    def test_groups_and_top1_bitwise(self):
        s = _names(220, seed=24)
        a = sgt.group_similar_strings(s, min_similarity=0.6)
        b = sgt.group_similar_strings(
            s, min_similarity=0.6, multihost="sharded"
        )
        pd.testing.assert_frame_equal(a, b)
        d = _names(120, seed=25)
        a2 = sgt.match_most_similar(s, d, min_similarity=0.5)
        b2 = sgt.match_most_similar(
            s, d, min_similarity=0.5, multihost="sharded"
        )
        pd.testing.assert_frame_equal(a2, b2)

    def test_float32_bitwise(self):
        s = _names(160, seed=26)
        kw = dict(min_similarity=0.6, tfidf_matrix_dtype=np.float32)
        a = sgt.match_strings(s, **kw)
        b = sgt.match_strings(s, **kw, multihost="sharded")
        pd.testing.assert_frame_equal(a, b)

    def test_replicated_forced_below_threshold(self):
        """True/auto keeps the replicated tier for small corpora; the
        sharded tier engages above SG_TPU_MH_SHARDED_ROWS."""
        import os

        s = _names(60, seed=27)
        sg = StringGrouper(s, min_similarity=0.6, multihost=True).fit()
        assert sg.timings.labels.get("multihost_tier") == "replicated"
        os.environ["SG_TPU_MH_SHARDED_ROWS"] = "10"
        try:
            sg2 = StringGrouper(s, min_similarity=0.6, multihost=True).fit()
        finally:
            del os.environ["SG_TPU_MH_SHARDED_ROWS"]
        assert sg2.timings.labels.get("multihost_tier") == "sharded"
        pd.testing.assert_frame_equal(sg.get_matches(), sg2.get_matches())

    def test_no_full_ell_stage_and_mem_accounting(self):
        """The sharded tier must not run the replicated tier's full-corpus
        allgather, and reports its memory accounting."""
        s = _names(150, seed=28)
        sg = StringGrouper(
            s, min_similarity=0.6, multihost="sharded"
        ).fit()
        keys = sg.timings.seconds
        assert "match.mh_ell_allgather_s" not in keys
        assert keys["match.mh_mem_local_ell_bytes"] > 0
        assert keys["match.mh_mem_replicated_ell_bytes"] >= keys[
            "match.mh_mem_local_ell_bytes"
        ]

    def test_randomized_fuzz_vs_single_controller(self):
        rng = np.random.default_rng(77)
        for trial in range(5):
            n = int(rng.integers(30, 220))
            s = _names(n, seed=3000 + trial)
            kw = dict(
                min_similarity=float(rng.choice([0.0, 0.3, 0.6, 0.85])),
                max_n_matches=int(rng.integers(1, 12)),
            )
            if rng.random() < 0.3:
                kw["tfidf_matrix_dtype"] = np.float32
            if rng.random() < 0.5:
                d = _names(int(rng.integers(20, 150)), seed=4000 + trial)
                a = sgt.match_strings(s, d, **kw)
                b = sgt.match_strings(s, d, **kw, multihost="sharded")
            else:
                a = sgt.match_strings(s, **kw)
                b = sgt.match_strings(s, **kw, multihost="sharded")
            pd.testing.assert_frame_equal(a, b)

    def test_edge_cases(self):
        for s in (pd.Series(["solo"]), pd.Series(["a b c", "a b c", "xyz"])):
            a = sgt.match_strings(s, min_similarity=0.1)
            b = sgt.match_strings(s, min_similarity=0.1, multihost="sharded")
            pd.testing.assert_frame_equal(a, b)
        s = _names(60, seed=29)
        a = sgt.match_strings(s, min_similarity=0.5, force_symmetries=False)
        b = sgt.match_strings(
            s, min_similarity=0.5, force_symmetries=False, multihost="sharded"
        )
        pd.testing.assert_frame_equal(a, b)
        a = sgt.match_strings(s, min_similarity=0.7, max_n_matches=None)
        b = sgt.match_strings(
            s, min_similarity=0.7, max_n_matches=None, multihost="sharded"
        )
        pd.testing.assert_frame_equal(a, b)
