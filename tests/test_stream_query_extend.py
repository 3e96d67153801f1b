"""Panel growth for the streaming QUERY checkpoints (r5 — VERDICT r4
#4): extend_stream_pairs_above reuses per-stripe hit files inside the
old complete range; extend_stream_topk_neighbors rescores old rows only
against new-partner stripes off the sanitized running best."""

import os

import numpy as np
import pytest

from stormtpu.config import EngineConfig
from stormtpu.layout import BitMatrix
from stormtpu.oracle import oracle_count_matrix
from stormtpu.stream_query import (
    extend_stream_pairs_above,
    extend_stream_topk_neighbors,
    stream_pairs_above,
    stream_topk_neighbors,
)


def _small_cfg():
    return EngineConfig(
        k1_tile_rows=8, k1_tile_words=128, k2_tile_rows=8, k2_tile_words=8
    )


def _grown(n_old, n_new, m, density, seed):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n_new, m)) < density).astype(np.uint8)
    return (BitMatrix.from_dense(dense[:n_old]),
            BitMatrix.from_dense(dense), dense)


# ----------------------------------------------------------------- screen

def test_extend_screen_partial_superblock(tmp_path, monkeypatch):
    """Grow past a PARTIAL old superblock: complete-range hit files are
    reused untouched (mtimes), partial-touching ones recomputed, result
    equals a from-scratch run on the grown panel."""
    import stormtpu.stream_query as sq

    # sb=32 after the bitmap lcm rounding; old 72 rows -> superblocks
    # {0,1} complete, 2 partial
    bm_old, bm_new, _ = _grown(72, 120, 600, 0.3, seed=121)
    out = str(tmp_path / "scr")
    stream_pairs_above(bm_old, 30, superblock_rows=32, kernel="dense",
                       config=_small_cfg(), interpret=True, out_dir=out)
    kept = {}
    for i in range(3):
        for j in range(i, 3):
            kept[(i, j)] = os.path.getmtime(
                os.path.join(out, f"hits_{i:05d}_{j:05d}.npz"))
    want = stream_pairs_above(bm_new, 30, superblock_rows=32,
                              kernel="dense", config=_small_cfg(),
                              interpret=True)
    got = extend_stream_pairs_above(bm_new, out, kernel="dense",
                                    config=_small_cfg(), interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    for (i, j), t in kept.items():
        now = os.path.getmtime(os.path.join(out, f"hits_{i:05d}_{j:05d}.npz"))
        if i == 2 or j == 2:
            assert now != t, (i, j)
        else:
            assert now == t, (i, j)


def test_extend_screen_aligned_reuses_everything(tmp_path, monkeypatch):
    """Aligned old n: zero stripes recomputed inside the old range — the
    stripe-screen call count proves it."""
    import stormtpu.stream_query as sq

    bm_old, bm_new, _ = _grown(64, 128, 600, 0.3, seed=122)
    out = str(tmp_path / "scr")
    stream_pairs_above(bm_old, 30, superblock_rows=32, kernel="dense",
                       config=_small_cfg(), interpret=True, out_dir=out)
    real = sq._stripe_screen
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_screen", counting)
    got = extend_stream_pairs_above(bm_new, out, kernel="dense",
                                    config=_small_cfg(), interpret=True)
    # new panel: 4 superblocks -> 10 stripes; 3 wholly-old reused
    assert calls["n"] == 7
    want = stream_pairs_above(bm_new, 30, superblock_rows=32,
                              kernel="dense", config=_small_cfg(),
                              interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_extend_screen_measure_threshold_from_manifest(tmp_path):
    """measure/threshold ride the manifest — the extended run filters
    with the original screen parameters."""
    bm_old, bm_new, _ = _grown(64, 100, 600, 0.3, seed=123)
    out = str(tmp_path / "scr")
    stream_pairs_above(bm_old, 0.22, measure="jaccard",
                       superblock_rows=32, kernel="dense",
                       config=_small_cfg(), interpret=True, out_dir=out)
    got = extend_stream_pairs_above(bm_new, out, kernel="dense",
                                    config=_small_cfg(), interpret=True)
    want = stream_pairs_above(bm_new, 0.22, measure="jaccard",
                              superblock_rows=32, kernel="dense",
                              config=_small_cfg(), interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_extend_screen_refusals(tmp_path):
    bm_old, bm_new, dense = _grown(72, 120, 600, 0.3, seed=124)
    out = str(tmp_path / "scr")
    stream_pairs_above(bm_old, 30, superblock_rows=32, kernel="dense",
                       config=_small_cfg(), interpret=True, out_dir=out)
    # tampered head
    tampered = dense.copy()
    tampered[3, :9] ^= 1
    with pytest.raises(ValueError, match="fingerprint"):
        extend_stream_pairs_above(BitMatrix.from_dense(tampered), out,
                                  kernel="dense", config=_small_cfg(),
                                  interpret=True)
    # shrinking
    with pytest.raises(ValueError, match="appended"):
        extend_stream_pairs_above(BitMatrix.from_dense(dense[:40]), out,
                                  kernel="dense", config=_small_cfg(),
                                  interpret=True)
    # incomplete directory
    os.remove(os.path.join(out, "hits_00000_00001.npz"))
    with pytest.raises(ValueError, match="INCOMPLETE"):
        extend_stream_pairs_above(bm_new, out, kernel="dense",
                                  config=_small_cfg(), interpret=True)


# ------------------------------------------------------------------ topk

def _check_topk(bm, vals, idx, k):
    c = oracle_count_matrix(bm.packed).astype(np.int64)
    np.fill_diagonal(c, -1)
    want = np.maximum(-np.sort(-c, axis=1)[:, :k], 0)
    np.testing.assert_array_equal(vals, want)
    for r in range(bm.n):
        for t in range(k):
            if vals[r, t] > 0:
                assert c[r, idx[r, t]] == vals[r, t]
                assert idx[r, t] != r
    # top-k partners must be distinct where values are real
    for r in range(bm.n):
        real = idx[r][vals[r] > 0]
        assert len(set(real.tolist())) == real.size, r


def test_extend_topk_partial_superblock(tmp_path, monkeypatch):
    """Grow past a partial old superblock: old rows rescore only against
    new-partner stripes (call count), stale padded-partner candidates
    are reset, the partial re-merge cannot seat a partner twice, and
    values equal a from-scratch run."""
    import stormtpu.stream_query as sq

    bm_old, bm_new, _ = _grown(40, 100, 600, 0.3, seed=125)
    out = str(tmp_path / "tk")
    stream_topk_neighbors(bm_old, 5, superblock_rows=16, kernel="dense",
                          config=_small_cfg(), interpret=True,
                          out_dir=out)
    real = sq._stripe_topk
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_topk", counting)
    vals, idx = extend_stream_topk_neighbors(bm_new, out, kernel="dense",
                                             config=_small_cfg(),
                                             interpret=True)
    # new: 7 superblocks of 16 (100->112) -> 28 stripes; wholly inside
    # the old COMPLETE range (superblocks 0,1): 3 skipped
    total = 7 * 8 // 2
    assert calls["n"] == total - 3
    _check_topk(bm_new, vals, idx, 5)


def test_extend_topk_aligned(tmp_path):
    bm_old, bm_new, _ = _grown(48, 96, 600, 0.35, seed=126)
    out = str(tmp_path / "tk")
    stream_topk_neighbors(bm_old, 4, superblock_rows=16, kernel="dense",
                          config=_small_cfg(), interpret=True,
                          out_dir=out)
    vals, idx = extend_stream_topk_neighbors(bm_new, out, kernel="dense",
                                             config=_small_cfg(),
                                             interpret=True)
    _check_topk(bm_new, vals, idx, 4)


def test_extend_topk_measure(tmp_path):
    """Measure route (jaccard): float64 best carries across the extend."""
    bm_old, bm_new, _ = _grown(48, 80, 600, 0.35, seed=127)
    out = str(tmp_path / "tk")
    stream_topk_neighbors(bm_old, 3, superblock_rows=16, kernel="dense",
                          measure="jaccard", config=_small_cfg(),
                          interpret=True, out_dir=out)
    vals, idx = extend_stream_topk_neighbors(bm_new, out, kernel="dense",
                                             config=_small_cfg(),
                                             interpret=True)
    want_v, _ = stream_topk_neighbors(bm_new, 3, superblock_rows=16,
                                      kernel="dense", measure="jaccard",
                                      config=_small_cfg(), interpret=True)
    np.testing.assert_array_equal(vals, want_v)


def test_extend_topk_interrupted_extend_resumes(tmp_path, monkeypatch):
    """An extend interrupted mid-walk resumes through the wrapper (the
    extend_from key pins the skip set); a PLAIN resume of the same
    checkpoint is refused — it would re-merge old stripes."""
    import stormtpu.stream_query as sq

    bm_old, bm_new, _ = _grown(48, 112, 600, 0.3, seed=128)
    out = str(tmp_path / "tk")
    stream_topk_neighbors(bm_old, 5, superblock_rows=16, kernel="dense",
                          config=_small_cfg(), interpret=True,
                          out_dir=out)
    real = sq._stripe_topk
    calls = {"n": 0, "fail_at": 6}

    def crashing(*a, **kw):
        calls["n"] += 1
        if calls["n"] == calls["fail_at"]:
            raise RuntimeError("simulated crash")
        return real(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_topk", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        extend_stream_topk_neighbors(bm_new, out, kernel="dense",
                                     config=_small_cfg(), interpret=True)
    # a plain resume refuses the extend checkpoint
    with pytest.raises(ValueError, match="checkpoint"):
        stream_topk_neighbors(bm_new, 5, superblock_rows=16,
                              kernel="dense", config=_small_cfg(),
                              interpret=True, out_dir=out)
    calls["fail_at"] = 10**9
    vals, idx = extend_stream_topk_neighbors(bm_new, out, kernel="dense",
                                             config=_small_cfg(),
                                             interpret=True)
    _check_topk(bm_new, vals, idx, 5)


def test_extend_topk_refusals(tmp_path, monkeypatch):
    import stormtpu.stream_query as sq

    bm_old, bm_new, dense = _grown(40, 80, 600, 0.3, seed=129)
    out = str(tmp_path / "tk")
    # an INCOMPLETE base run must refuse extend
    real = sq._stripe_topk
    calls = {"n": 0}

    def crash_late(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("boom")
        return real(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_topk", crash_late)
    with pytest.raises(RuntimeError):
        stream_topk_neighbors(bm_old, 5, superblock_rows=16,
                              kernel="dense", config=_small_cfg(),
                              interpret=True, out_dir=out)
    monkeypatch.setattr(sq, "_stripe_topk", real)
    with pytest.raises(ValueError, match="INCOMPLETE"):
        extend_stream_topk_neighbors(bm_new, out, kernel="dense",
                                     config=_small_cfg(), interpret=True)
    # finish the base run, then tamper the head
    stream_topk_neighbors(bm_old, 5, superblock_rows=16, kernel="dense",
                          config=_small_cfg(), interpret=True,
                          out_dir=out)
    tampered = dense.copy()
    tampered[1, :7] ^= 1
    with pytest.raises(ValueError, match="fingerprint"):
        extend_stream_topk_neighbors(BitMatrix.from_dense(tampered), out,
                                     kernel="dense", config=_small_cfg(),
                                     interpret=True)


# -------------------------------------------------- complete screen

def test_extend_complete_screen(tmp_path, monkeypatch):
    """Grow a completed pairwise-complete screen: old-range candidate
    files are reused (call count), both heads fingerprint-checked,
    values exact vs a from-scratch run on the grown panel."""
    import stormtpu.stream_query as sq
    from stormtpu.stream_query import (
        extend_stream_pairs_above_complete,
        stream_pairs_above_complete,
    )

    rng = np.random.default_rng(131)
    n_old, n_new, m = 64, 112, 800
    observed = rng.random((n_new, m)) > 0.12
    values = (rng.random((n_new, m)) < 0.4) & observed
    bm_d_old = BitMatrix.from_dense(values[:n_old].astype(np.uint8))
    bm_m_old = BitMatrix.from_dense(observed[:n_old].astype(np.uint8))
    bm_d = BitMatrix.from_dense(values.astype(np.uint8))
    bm_m = BitMatrix.from_dense(observed.astype(np.uint8))
    out = str(tmp_path / "cs")
    stream_pairs_above_complete(
        bm_d_old, bm_m_old, 0.05, measure="r2", superblock_rows=32,
        kernel="dense", config=_small_cfg(), interpret=True, out_dir=out)
    real = sq._stripe_screen_complete
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_screen_complete", counting)
    got = extend_stream_pairs_above_complete(
        bm_d, bm_m, out, kernel="dense", config=_small_cfg(),
        interpret=True)
    # 4 superblocks of 32 -> 10 stripes; 3 wholly-old reused
    assert calls["n"] <= 7
    want = stream_pairs_above_complete(
        bm_d, bm_m, 0.05, measure="r2", superblock_rows=32,
        kernel="dense", config=_small_cfg(), interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # tampered MASK head refused (data fingerprint alone is not enough)
    tampered = observed.copy()
    tampered[2, :5] = ~tampered[2, :5]
    values_t = values & tampered
    with pytest.raises(ValueError, match="fingerprint"):
        extend_stream_pairs_above_complete(
            BitMatrix.from_dense(values_t.astype(np.uint8)),
            BitMatrix.from_dense(tampered.astype(np.uint8)),
            out, kernel="dense", config=_small_cfg(), interpret=True)


# ------------------------------------------------------- merge semantics

def _merge_oracle_vals(bv, bi, cv, ci, k, fill):
    """Expected top-k VALUES per row: per-partner max over real entries,
    ranked desc, fill-padded (tie order is unspecified)."""
    out = np.full((bv.shape[0], k), fill, dtype=bv.dtype)
    for r in range(bv.shape[0]):
        best = {}
        for v, i in zip(np.concatenate([bv[r], cv[r]]),
                        np.concatenate([bi[r], ci[r]])):
            real = (v >= 0) if bv.dtype.kind == "i" else np.isfinite(v)
            if real and (i not in best or v > best[i]):
                best[i] = v
        vals = sorted(best.values(), reverse=True)[:k]
        out[r, : len(vals)] = vals
    return out


def test_merge_topk_dedup_semantics_randomized():
    """_merge_topk == per-partner-max top-k, is idempotent, and never
    seats one partner twice — under adversarial duplicate/fill mixes,
    both int (count) and float (measure) routes."""
    from stormtpu.stream_query import _merge_topk

    rng = np.random.default_rng(314)
    for it in range(40):
        rows = int(rng.integers(1, 9))
        k = int(rng.integers(1, 6))
        npart = int(rng.integers(1, 8))
        intmode = bool(rng.integers(0, 2))
        fill = -1 if intmode else -np.inf
        dt = np.int64 if intmode else np.float64

        def rand_cand(width):
            v = rng.integers(0, 5, (rows, width)).astype(dt)
            i = rng.integers(0, npart, (rows, width)).astype(np.int32)
            holes = rng.random((rows, width)) < 0.3
            v = np.where(holes, fill, v)
            i = np.where(holes, 0, i)
            return v, i

        bv = np.full((rows, k), fill, dtype=dt)
        bi = np.zeros((rows, k), dtype=np.int32)
        seen_v = [bv.copy()]
        seen_i = [bi.copy()]
        for _ in range(int(rng.integers(1, 4))):
            cv, ci = rand_cand(int(rng.integers(1, 2 * k + 2)))
            # adversarial: re-merge the SAME candidates twice sometimes
            reps = 2 if rng.random() < 0.5 else 1
            for _ in range(reps):
                _merge_topk(bv, bi, slice(0, rows), cv, ci, k)
            seen_v.append(cv)
            seen_i.append(ci)
        want = _merge_oracle_vals(
            np.concatenate(seen_v, axis=1), np.concatenate(seen_i, axis=1),
            np.zeros((rows, 0), dtype=dt), np.zeros((rows, 0), np.int32),
            k, fill)
        got_sorted = -np.sort(-bv, axis=1)
        np.testing.assert_array_equal(got_sorted, want, err_msg=f"it {it}")
        # distinct partners among real entries
        for r in range(rows):
            real_mask = (bv[r] >= 0) if intmode else np.isfinite(bv[r])
            ids = bi[r][real_mask]
            assert len(set(ids.tolist())) == ids.size, (it, r)


# --------------------------------------------------------- chained growth

def test_extend_chained_growth(tmp_path):
    """A panel that grows TWICE: each extend builds on the previous
    extended (completed) state — screen and topk both exact vs
    from-scratch at the final size."""
    rng = np.random.default_rng(151)
    m = 600
    dense = (rng.random((150, m)) < 0.3).astype(np.uint8)
    bms = [BitMatrix.from_dense(dense[:n]) for n in (50, 100, 150)]

    sd = str(tmp_path / "scr")
    stream_pairs_above(bms[0], 30, superblock_rows=32, kernel="dense",
                       config=_small_cfg(), interpret=True, out_dir=sd)
    for bm in bms[1:]:
        got = extend_stream_pairs_above(bm, sd, kernel="dense",
                                        config=_small_cfg(),
                                        interpret=True)
    want = stream_pairs_above(bms[-1], 30, superblock_rows=32,
                              kernel="dense", config=_small_cfg(),
                              interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    td = str(tmp_path / "tk")
    stream_topk_neighbors(bms[0], 4, superblock_rows=16, kernel="dense",
                          config=_small_cfg(), interpret=True, out_dir=td)
    for bm in bms[1:]:
        vals, idx = extend_stream_topk_neighbors(bm, td, kernel="dense",
                                                 config=_small_cfg(),
                                                 interpret=True)
    _check_topk(bms[-1], vals, idx, 4)


@pytest.mark.heavy
def test_extend_randomized_sweep(tmp_path):
    """Randomized (n_old, n_new, measure, threshold) sweep over both
    extend wrappers — every combination must equal from-scratch."""
    rng = np.random.default_rng(161)
    for it in range(6):
        m = int(rng.integers(200, 900))
        n_old = int(rng.integers(20, 90))
        n_new = n_old + int(rng.integers(1, 80))
        density = float(10 ** rng.uniform(-1.5, -0.3))
        dense = (rng.random((n_new, m)) < density).astype(np.uint8)
        bm_old = BitMatrix.from_dense(dense[:n_old])
        bm_new = BitMatrix.from_dense(dense)
        C = dense.astype(np.int64) @ dense.T
        measure = ["count", "jaccard", "r2"][it % 3]
        if measure == "count":
            thr = max(1, int(np.percentile(C[np.triu_indices(n_new, 1)],
                                           85)))
        else:
            thr = 0.15
        sd = str(tmp_path / f"s{it}")
        stream_pairs_above(bm_old, thr, measure=measure,
                           superblock_rows=32, kernel="dense",
                           config=_small_cfg(), interpret=True,
                           out_dir=sd)
        got = extend_stream_pairs_above(bm_new, sd, kernel="dense",
                                        config=_small_cfg(),
                                        interpret=True)
        want = stream_pairs_above(bm_new, thr, measure=measure,
                                  superblock_rows=32, kernel="dense",
                                  config=_small_cfg(), interpret=True)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w, err_msg=f"screen it {it}")

        k = int(rng.integers(1, 6))
        td = str(tmp_path / f"t{it}")
        stream_topk_neighbors(bm_old, k, superblock_rows=16,
                              kernel="dense", config=_small_cfg(),
                              interpret=True, out_dir=td)
        vals, idx = extend_stream_topk_neighbors(bm_new, td,
                                                 kernel="dense",
                                                 config=_small_cfg(),
                                                 interpret=True)
        _check_topk(bm_new, vals, idx, k)
