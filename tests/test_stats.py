"""Exact aggregate statistics over C (stats.py) vs brute-force oracle."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.oracle import oracle_count_matrix
from stormtpu.stats import count_histogram, count_row_sums


@pytest.mark.parametrize(
    "n,m,density,seed",
    [
        (25, 700, 0.3, 11),
        (64, 64, 0.9, 12),      # exact word boundary
        (37, 8193, 0.01, 13),   # crosses a K2 tile-words boundary
        (300, 1000, 0.5, 14),   # crosses the tile_rows boundary
    ],
)
def test_count_row_sums_exact(n, m, density, seed):
    bm = random_bitmatrix(n, m, density, seed=seed)
    c = oracle_count_matrix(bm.packed).astype(np.int64)
    got = count_row_sums(bm)
    np.testing.assert_array_equal(got, c.sum(axis=1))
    got_noself = count_row_sums(bm, include_self=False)
    np.testing.assert_array_equal(got_noself, c.sum(axis=1) - np.diag(c))


def test_count_row_sums_empty_rows():
    dense = np.zeros((5, 100), dtype=np.uint8)
    dense[1, :7] = 1
    dense[3, 5:9] = 1
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense)
    c = oracle_count_matrix(bm.packed).astype(np.int64)
    np.testing.assert_array_equal(count_row_sums(bm), c.sum(axis=1))


@pytest.mark.parametrize(
    "n,m,density,seed",
    [
        (25, 700, 0.3, 11),
        (64, 64, 0.9, 12),
        (37, 8193, 0.01, 13),
        (300, 1000, 0.5, 14),
        (300, 1000, 1.0, 15),   # colcount spread 0 → zero planes fast path
    ],
)
def test_count_row_sums_bitplane_route_matches_positions(n, m, density, seed):
    # positions_budget_bytes=0 forces the dense packed bit-plane walk;
    # both routes must agree exactly (dispatch invariance, SURVEY §5.3)
    bm = random_bitmatrix(n, m, density, seed=seed)
    via_positions = count_row_sums(bm)
    via_planes = count_row_sums(bm, positions_budget_bytes=0)
    np.testing.assert_array_equal(via_planes, via_positions)
    # tiny chunk_bytes → many row chunks, same answer
    via_chunked = count_row_sums(bm, positions_budget_bytes=0, chunk_bytes=4096)
    np.testing.assert_array_equal(via_chunked, via_positions)
    np.testing.assert_array_equal(
        count_row_sums(bm, include_self=False, positions_budget_bytes=0),
        via_positions - bm.row_nnz.astype(np.int64),
    )


def test_count_row_sums_empty_matrix_planes_route():
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(np.zeros((4, 0), dtype=np.uint8))
    np.testing.assert_array_equal(
        count_row_sums(bm, positions_budget_bytes=0), np.zeros(4, np.int64)
    )


@pytest.mark.heavy
def test_count_row_sums_dense_scale_bounded_rss():
    """Dense panel whose CSR view would dwarf RAM budget: N=2048 × 1M bits
    at d≈0.5 has ~1.07e9 set bits → ~12.9 GB of positions. The bit-plane
    route must produce exact sums inside a subprocess whose peak RSS stays
    within the packed matrix + bounded temporaries (VERDICT r3 weak #1)."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import resource
        # hard 5 GB address-space ceiling: the CSR route's ~12.9 GB of
        # positions would MemoryError outright, so mere completion
        # proves bounded memory — deterministic, unlike an absolute
        # ru_maxrss bound (which flaked in-suite on allocator variance)
        resource.setrlimit(resource.RLIMIT_AS, (5 << 30, 5 << 30))
        import jax
        jax.config.update("jax_platforms", "cpu")  # conftest pattern: undo axon
        import numpy as np
        from stormtpu.layout import BitMatrix, unpack_bits
        from stormtpu.stats import count_row_sums

        rng = np.random.default_rng(7)
        n, m = 2048, 1 << 20
        packed = rng.integers(0, 1 << 32, size=(n, m // 32), dtype=np.uint32)
        bm = BitMatrix.from_packed(packed, m)
        sums = count_row_sums(bm, chunk_bytes=32 << 20)
        # exact spot-check on 8 rows against the direct weighted reduction
        cc = np.zeros(m, dtype=np.int64)
        for r0 in range(0, n, 128):
            cc += unpack_bits(packed[r0:r0+128], m).sum(axis=0, dtype=np.int64)
        idx = [0, 1, 17, 500, 1000, 1500, 2040, 2047]
        want = unpack_bits(packed[idx], m).astype(np.int64) @ cc
        assert np.array_equal(sums[idx], want), (sums[idx], want)
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print("OK", rss_mb)
        """
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr + res.stdout
    assert res.stdout.startswith("OK")


@pytest.mark.parametrize(
    "n,m,density,n_bins,seed",
    [
        (25, 700, 0.3, 8, 21),
        (64, 64, 0.9, 64, 22),     # more bins than distinct counts
        (300, 1000, 0.5, 16, 23),  # crosses tile_rows; multi-tile stripes
        (40, 8193, 0.01, 4, 24),   # sparse, ragged words
    ],
)
def test_count_histogram_exact(n, m, density, n_bins, seed):
    bm = random_bitmatrix(n, m, density, seed=seed)
    man = count_histogram(bm, n_bins=n_bins)
    c = oracle_count_matrix(bm.packed)
    iu = np.triu_indices(n, k=1)
    vals = c[iu].astype(np.int64)
    w = man["bin_width"]
    want = np.zeros(n_bins, dtype=np.int64)
    np.add.at(want, np.minimum(vals // w, n_bins - 1), 1)
    np.testing.assert_array_equal(man["hist"], want)
    assert man["pairs"] == n * (n - 1) // 2
    assert man["hist"].sum() == man["pairs"]
    assert man["bin_edges"].shape == (n_bins + 1,)


def test_count_histogram_explicit_width_and_small_n():
    bm = random_bitmatrix(3, 96, 0.7, seed=31)
    man = count_histogram(bm, n_bins=97, bin_width=1)
    c = oracle_count_matrix(bm.packed)
    iu = np.triu_indices(3, k=1)
    want = np.bincount(c[iu].astype(np.int64), minlength=97)
    np.testing.assert_array_equal(man["hist"], want)


def test_count_histogram_multi_superblock():
    # force several superblock stripes (diag + off-diag walks): tile
    # geometry pins tile_rows to min(k2_tile_rows, round_up(n, 32)), so
    # the smallest multi-stripe n is one past k2_tile_rows
    bm = random_bitmatrix(300, 256, 0.4, seed=41)
    man = count_histogram(bm, n_bins=8, superblock_rows=32)
    assert man["n_super"] >= 2
    c = oracle_count_matrix(bm.packed)
    iu = np.triu_indices(300, k=1)
    vals = c[iu].astype(np.int64)
    w = man["bin_width"]
    want = np.zeros(8, dtype=np.int64)
    np.add.at(want, np.minimum(vals // w, 7), 1)
    np.testing.assert_array_equal(man["hist"], want)


def test_count_histogram_summary_skip_banded():
    """C8 skip for the histogram sink (r4): on a group-aligned banded
    panel the co-empty stripes contribute their pair mass to bin 0
    host-side; the result equals both the no-skip device walk and the
    oracle binning."""
    import jax.numpy as jnp

    from stormtpu.layout import BitMatrix
    from stormtpu.stream import stream_count_histogram
    from stormtpu.utils import round_up

    rng = np.random.default_rng(211)
    n, m = 300, 8192  # two 4096-bit summary groups
    dense = np.zeros((n, m), dtype=np.uint8)
    dense[:256, :4096] = rng.random((256, 4096)) < 0.3
    dense[256:, 4096:] = rng.random((44, 4096)) < 0.3
    bm = BitMatrix.from_dense(dense)

    man = count_histogram(bm, n_bins=8, superblock_rows=256)
    c = oracle_count_matrix(bm.packed)
    iu = np.triu_indices(n, k=1)
    want = np.zeros(8, dtype=np.int64)
    np.add.at(want, np.minimum(c[iu].astype(np.int64) // man["bin_width"],
                               7), 1)
    np.testing.assert_array_equal(man["hist"], want)

    # no-occupancy device walk agrees (skip is sound, not approximate)
    sb = man["superblock_rows"]
    n_pad = round_up(n, sb)
    w_pad = round_up(bm.n_words, 256)
    xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
    xp[:n, : bm.n_words] = bm.packed
    man2 = stream_count_histogram(jnp.asarray(xp), n, m, n_bins=8,
                                  superblock_rows=sb)
    np.testing.assert_array_equal(man2["hist"], man["hist"])


def test_count_histogram_skip_never_touches_device():
    """All-co-empty occupancy: the walk must take every stripe from the
    host arithmetic — proven by a GARBAGE device operand whose counts
    would land in high bins if any stripe actually ran."""
    import jax.numpy as jnp

    from stormtpu.config import EngineConfig
    from stormtpu.stream import stream_count_histogram

    cfg = EngineConfig(k2_tile_rows=8, k2_tile_words=8)
    n, sb, w_pad = 70, 32, 256
    n_pad = 96
    garbage = jnp.ones((n_pad, w_pad), dtype=jnp.uint32) * jnp.uint32(0xFFFF)
    occ = np.zeros((n_pad // sb, 2), dtype=bool)
    man = stream_count_histogram(garbage, n, w_pad * 32, n_bins=8,
                                 superblock_rows=sb, config=cfg,
                                 occupancy=occ)
    want = np.zeros(8, dtype=np.int64)
    want[0] = n * (n - 1) // 2
    np.testing.assert_array_equal(man["hist"], want)
    # mismatched occupancy geometry is refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="occupancy"):
        stream_count_histogram(garbage, n, w_pad * 32, n_bins=8,
                               superblock_rows=sb, config=cfg,
                               occupancy=np.zeros((7, 2), dtype=bool))


def test_hist_superblock_int32_cap():
    """User-chosen superblock_rows above the int32 pair-count bound are
    clamped (advisor r4): cap_hist_superblock keeps sb² < 2³¹ while
    preserving the unit multiple; an impossible unit raises."""
    import pytest

    from stormtpu.stream import cap_hist_superblock

    assert cap_hist_superblock(100_000, 256) == 46336
    assert cap_hist_superblock(100_000, 256) ** 2 < 2**31
    assert cap_hist_superblock(4096, 256) == 4096  # untouched below cap
    assert cap_hist_superblock(8, 16) == 16        # floor at the unit
    with pytest.raises(ValueError, match="int32"):
        cap_hist_superblock(100_000, 50_000)


def test_column_counts_host_matches_device_route():
    """The host unpack+sum column counts (big-operand slow-H2D path)
    are identical to the standard route."""
    from stormtpu.layout import BitMatrix
    from stormtpu.setops import column_counts
    from stormtpu.stats import _column_counts_host

    rng = np.random.default_rng(55)
    for n, m in [(37, 1500), (64, 64), (200, 4096)]:
        dense = (rng.random((n, m)) < 0.4).astype(np.uint8)
        bm = BitMatrix.from_dense(dense)
        np.testing.assert_array_equal(
            _column_counts_host(bm, chunk_rows=16), column_counts(bm))
        np.testing.assert_array_equal(
            _column_counts_host(bm), dense.sum(axis=0))
