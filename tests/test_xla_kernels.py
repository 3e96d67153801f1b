"""XLA-path kernel exactness vs the NumPy oracle across a density sweep
(reference test strategy: every optimized path bit-exact vs scalar oracle
on randomized density-swept inputs — SURVEY.md §5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import DENSITY_SWEEP, random_bitmatrix
from stormtpu.kernels import xla as kx
from stormtpu.oracle import (
    oracle_count_block,
    oracle_count_matrix,
    oracle_pair_count,
)


@pytest.mark.parametrize("density", DENSITY_SWEEP)
def test_pair_count_exact(density):
    bm = random_bitmatrix(2, 4096, density, seed=int(density * 1e6))
    got = int(kx.pair_count_xla(jnp.asarray(bm.packed[0]), jnp.asarray(bm.packed[1])))
    assert got == oracle_pair_count(bm.packed[0], bm.packed[1])


@pytest.mark.parametrize("density", DENSITY_SWEEP)
def test_count_matrix_popcount_exact(density):
    bm = random_bitmatrix(37, 1000, density, seed=7)  # ragged N and M
    got = np.asarray(kx.count_matrix_popcount_xla(jnp.asarray(bm.packed)))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


@pytest.mark.parametrize("density", DENSITY_SWEEP)
def test_count_matrix_int8_exact(density):
    bm = random_bitmatrix(37, 1000, density, seed=8)
    got = np.asarray(kx.count_matrix_int8_xla(jnp.asarray(bm.packed)))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_count_block_rectangular(rng):
    a = random_bitmatrix(11, 777, 0.3, seed=1)
    b = random_bitmatrix(23, 777, 0.05, seed=2)
    want = oracle_count_block(a.packed, b.packed)
    got_pc = np.asarray(
        kx.count_block_popcount_xla(jnp.asarray(a.packed), jnp.asarray(b.packed))
    )
    got_i8 = np.asarray(
        kx.count_block_int8_xla(jnp.asarray(a.packed), jnp.asarray(b.packed))
    )
    np.testing.assert_array_equal(got_pc, want)
    np.testing.assert_array_equal(got_i8, want)


def test_unpack_int8_is_consistent_permutation(rng):
    # K2's bit-major unpack is a column permutation of the plain unpack:
    # XXᵀ must be invariant.
    bm = random_bitmatrix(6, 96, 0.5, seed=3)
    u = np.asarray(kx.unpack_to_int8(jnp.asarray(bm.packed)))
    assert u.shape == (6, bm.n_words * 32)
    assert sorted(u.sum(axis=1)) == sorted(bm.row_nnz.tolist())
    np.testing.assert_array_equal(
        u.astype(np.int64) @ u.astype(np.int64).T, oracle_count_matrix(bm.packed)
    )


def test_empty_and_full_rows():
    dense = np.zeros((4, 256), dtype=np.uint8)
    dense[1] = 1
    dense[3, :7] = 1
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense)
    got = np.asarray(kx.count_matrix_popcount_xla(jnp.asarray(bm.packed)))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))
    assert got[1, 1] == 256 and got[1, 3] == 7 and got[0].sum() == 0
