"""Pallas K1/K2 kernel exactness vs the NumPy oracle (interpret mode on the
CPU test backend; identical semantics to the Mosaic-compiled TPU path).
Density sweep + ragged shapes, per SURVEY.md §5 items 1–3."""

import numpy as np
import pytest

from conftest import DENSITY_SWEEP, random_bitmatrix
from stormtpu.kernels.dense import count_matrix_pallas_dense
from stormtpu.kernels.mxu import count_matrix_pallas_mxu
from stormtpu.oracle import oracle_count_matrix
from stormtpu.utils import assemble_triangular, triangular_tile_ids


@pytest.mark.parametrize("density", (0.01, 0.5, 1.0))
def test_k1_exact_density(density):
    bm = random_bitmatrix(24, 700, density, seed=21)
    got = count_matrix_pallas_dense(bm.packed, interpret=True)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


@pytest.mark.parametrize("density", (0.01, 0.5, 1.0))
def test_k2_exact_density(density):
    bm = random_bitmatrix(24, 700, density, seed=22)
    got = count_matrix_pallas_mxu(bm.packed, interpret=True)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_k1_multi_tile():
    # Exercise >1 row-block and >1 K step: n > tile_rows cap below.
    from stormtpu.config import EngineConfig

    cfg = EngineConfig(k1_tile_rows=8, k1_tile_words=128)
    bm = random_bitmatrix(37, 128 * 32 * 2 + 60, 0.3, seed=23)
    got = count_matrix_pallas_dense(bm.packed, config=cfg, interpret=True)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_k2_multi_tile():
    from stormtpu.config import EngineConfig

    cfg = EngineConfig(k2_tile_rows=32, k2_tile_words=8)
    bm = random_bitmatrix(70, 700, 0.3, seed=24)
    got = count_matrix_pallas_mxu(bm.packed, config=cfg, interpret=True)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_triangular_assembly():
    rng = np.random.default_rng(0)
    nb, ti = 3, 4
    ibs, jbs = triangular_tile_ids(nb)
    n = nb * ti
    # build a symmetric ground-truth matrix, cut upper tiles, reassemble
    m = rng.integers(0, 100, (n, n))
    m = (m + m.T).astype(np.int32)
    tiles = np.stack(
        [m[i * ti : (i + 1) * ti, j * ti : (j + 1) * ti] for i, j in zip(ibs, jbs)]
    )
    out = assemble_triangular(tiles, ibs, jbs, nb, n - 2)
    np.testing.assert_array_equal(out, m[: n - 2, : n - 2])


def test_dispatch_invariance_pallas():
    from stormtpu import intersect_count_matrix

    bm = random_bitmatrix(40, 900, 0.2, seed=25)
    want = oracle_count_matrix(bm.packed)
    for strategy in ("pallas_dense", "pallas_mxu"):
        got = intersect_count_matrix(bm, strategy=strategy)
        np.testing.assert_array_equal(got, want, err_msg=strategy)


@pytest.mark.parametrize("variant", ("rows", "chunk"))
def test_k1_variants_exact(variant):
    import jax.numpy as jnp

    from stormtpu.kernels.dense import count_tiles_pallas_dense

    bm = random_bitmatrix(16, 512 * 32, 0.4, seed=26)
    xp = np.zeros((16, 512), dtype=np.uint32)
    xp[:, : bm.n_words] = bm.packed
    ibs = np.array([0], np.int32)
    tiles = count_tiles_pallas_dense(
        jnp.asarray(xp), jnp.asarray(ibs), jnp.asarray(ibs),
        tile_rows=16, tile_words=256, interpret=True, variant=variant,
    )
    np.testing.assert_array_equal(
        np.asarray(tiles[0]), oracle_count_matrix(bm.packed)
    )


@pytest.mark.parametrize("variant", ("concat", "planes"))
def test_k2_variants_exact(variant):
    import jax.numpy as jnp

    from stormtpu.kernels.mxu import count_tiles_pallas_mxu

    bm = random_bitmatrix(32, 512 * 32, 0.4, seed=27)
    xp = np.zeros((32, 512), dtype=np.uint32)
    xp[:, : bm.n_words] = bm.packed
    ibs = np.array([0], np.int32)
    tiles = count_tiles_pallas_mxu(
        jnp.asarray(xp), jnp.asarray(ibs), jnp.asarray(ibs),
        tile_rows=32, tile_words=256, interpret=True, variant=variant,
    )
    np.testing.assert_array_equal(
        np.asarray(tiles[0]), oracle_count_matrix(bm.packed)
    )


def test_count_block_pallas_rectangular():
    from stormtpu.kernels.mxu import count_block_pallas_mxu
    from stormtpu.oracle import oracle_count_block

    a = random_bitmatrix(19, 900, 0.3, seed=28)
    b = random_bitmatrix(41, 900, 0.6, seed=29)
    got = np.asarray(
        count_block_pallas_mxu(a.packed, b.packed, interpret=True)
    )
    np.testing.assert_array_equal(got, oracle_count_block(a.packed, b.packed))


def test_count_block_api_large_m(rng):
    # m_bits > 2^17 routes through the pallas rectangle
    from stormtpu.api import count_block
    from stormtpu.layout import BitMatrix
    from stormtpu.oracle import oracle_count_block

    m = (1 << 17) + 64
    a = BitMatrix.from_dense((rng.random((5, m)) < 0.01).astype(np.uint8))
    b = BitMatrix.from_dense((rng.random((7, m)) < 0.01).astype(np.uint8))
    got = count_block(a, b)
    np.testing.assert_array_equal(got, oracle_count_block(a.packed, b.packed))


def test_pair_count_stream_pallas_exact():
    """K0 streaming batch-pair kernel vs oracle across densities and
    ragged shapes (tail rows, W not a multiple of the block)."""
    import jax.numpy as jnp

    from stormtpu.kernels.dense import pair_count_stream_pallas

    rng = np.random.default_rng(42)
    for r, w in ((5, 7), (130, 200), (64, 1300)):
        a = rng.integers(0, 2**32, (r, w), dtype=np.uint32)
        b = rng.integers(0, 2**32, (r, w), dtype=np.uint32)
        a[r // 2] = 0  # empty row
        got = np.asarray(
            pair_count_stream_pallas(
                jnp.asarray(a), jnp.asarray(b),
                block_rows=64, block_words=128, interpret=True,
            )
        )
        want = np.bitwise_count(a & b).sum(axis=1, dtype=np.int64)
        np.testing.assert_array_equal(got.astype(np.int64), want)


def test_pair_counts_large_gather_exact():
    """query.pair_counts on a big gathered stream stays exact (the fused
    XLA stream path — measured faster than the Pallas K0 form on v5e)."""
    from conftest import random_bitmatrix
    from stormtpu.query import pair_counts

    bm = random_bitmatrix(40, 70000, 0.3, seed=9)
    rng = np.random.default_rng(10)
    p = 2048  # 2048 * 2188 words > 2^22 -> stream path
    ii = rng.integers(0, bm.n, p)
    jj = rng.integers(0, bm.n, p)
    got = pair_counts(bm, ii, jj)
    want = np.bitwise_count(bm.packed[ii] & bm.packed[jj]).sum(
        axis=1, dtype=np.int64
    )
    np.testing.assert_array_equal(got.astype(np.int64), want)
