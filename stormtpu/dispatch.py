"""D1 — density/shape-adaptive kernel dispatch.

TPU-native analog of the reference's runtime dispatch (SURVEY.md §3 C6 /
§4.4 ``STORM_get_intersect_count_func``): where the reference queries CPUID
once and picks the widest ISA kernel with small-length scalar fallbacks,
here dispatch is a pure host-Python decision over **(N, M, density,
backend)** producing a strategy name. It must be semantics-free: every
eligible strategy returns the identical exact count matrix (tested in
``tests/test_api.py::test_dispatch_invariance_xla``,
``tests/test_pallas_kernels.py::test_dispatch_invariance_pallas``, and
the K5 invariance cases in ``tests/test_clustered.py``).

Strategies:

- ``popcount``      — XLA word-wise AND+popcount (VPU). Small N (matmul
                      shapes degenerate) or single-pair-like workloads.
- ``mxu``           — XLA int8 XXᵀ (materializes unpacked operand; small M).
- ``pallas_dense``  — K1 Pallas tiled AND+popcount.
- ``pallas_mxu``    — K2 Pallas tiled int8 XXᵀ with in-kernel unpack
                      (large M; never materializes the 8× unpacked matrix).
- ``sparse``        — K3 scattered-position path (per-pair sorted
                      membership; auto-dispatched on CPU only).
- ``sparse_outer``  — K4 inverted-index outer-product path (emit row
                      pairs per occupied column; work ∝ N²·M·density²).
                      The TPU winner at extreme sparsity.
- ``clustered``     — K5 block-clustered work-list kernel: K2 MXU tiles
                      over summary-AND co-occupied (tile pair, K-group)
                      items only (the reference C8 block-skip regime —
                      block-diagonal / LD-panel structure where global
                      column compaction is a no-op). Chosen from the
                      block-summary co-occupancy statistic when it cuts
                      the dense walk's work below
                      ``clustered_work_fraction_threshold``.
"""

from __future__ import annotations

from typing import Optional

from stormtpu.config import EngineConfig, default_config

__all__ = ["choose_strategy", "STRATEGIES"]

STRATEGIES = (
    "popcount", "mxu", "pallas_dense", "pallas_mxu", "sparse",
    "sparse_outer", "clustered",
)

# Shared routing constant (see stormtpu/kernels/__init__.py): above this
# many bits, materializing the unpacked operand for the XLA mxu path is
# memory-hostile; use the Pallas K2 kernel.
from stormtpu.kernels import MXU_XLA_MAX_BITS as _MXU_XLA_MAX_BITS


def choose_strategy(
    n: int,
    m_bits: int,
    density: float,
    config: Optional[EngineConfig] = None,
    *,
    bm=None,
) -> str:
    """Pick the all-pairs strategy for an N×M bit matrix.

    Thresholds mirror the reference's honest measured crossovers (C6):
    the sparse path only wins at extreme sparsity on TPU because the MXU
    dense path is disproportionately fast (SURVEY.md §7 "Sparse on TPU").

    ``bm``: the BitMatrix itself, when available — enables the
    block-summary co-occupancy statistic (C8) that routes block-clustered
    inputs to the K5 work-list kernel. Scalar-only calls (no matrix in
    hand) never choose "clustered".
    """
    cfg = config or default_config()
    cfg.validate(m_bits)
    if density < cfg.sparse_density_threshold and n >= 2:
        # Measured on v5e (N=2048, M=1M, all-pairs): the K3 positions path
        # loses to the density-independent MXU dense path at EVERY density
        # — 48× slower at 0.01% (L=128), 175× at 0.03% (SURVEY.md §7
        # "sparse ingest, dense compute"). The path that DOES win at
        # extreme sparsity on TPU is K4's host-native inverted index; the
        # measured cost model below picks between K4 and the MXU dense
        # path (fit to v5e measurements, BASELINE.md "Sparse-path
        # crossover"). K3 stays the CPU auto-choice and every path is
        # available explicitly.
        from stormtpu.utils import is_tpu_backend

        if not is_tpu_backend():
            return "sparse"
        from stormtpu.native import HAVE_NATIVE

        if n <= 32768 and HAVE_NATIVE:
            from stormtpu.tuning import k4_constants

            # shipped defaults encode the round-1 v5e + 1-core host;
            # `python -m stormtpu tune` re-fits them for this machine
            # (tuning.refit_k4_constants)
            fit = k4_constants()
            c_sort = fit["c_sort_s_per_nnz"]
            c_n2 = fit["c_n2_s_per_elem"]
            c_emit = fit["c_emit_s_per_emission"]
            tops = fit["k2_int8_ops_per_s"]
            floor = fit["dispatch_floor_s"]
            nnz = n * m_bits * density
            # K4: np.unique sort + N² zero/mirror + pair emission
            # (E ≈ nnz · n · density)
            est_k4 = c_sort * nnz + c_n2 * n * n + c_emit * nnz * n * density
            # K2: triangular MXU matmul at the measured TOPS + floor
            est_k2 = n * n * m_bits / tops + floor
            if est_k4 < est_k2:
                return "sparse_outer"
    if n < cfg.mxu_min_rows:
        # Matmul shapes degenerate below an MXU tile; the streaming
        # popcount path wins (analog of the reference's short-input
        # scalar fallback).
        return "popcount"
    # Measured crossover, when the device has been tuned
    # (`python -m stormtpu tune`) — the C6-style honest threshold,
    # per (N, M) bucket: the winner of the nearest tuned shape, not one
    # global winner (the reference's ladder is length-aware, §4.4).
    from stormtpu.tuning import measured_dense_winner

    winner = measured_dense_winner(n, m_bits)
    if winner is not None:
        if winner == "mxu" and m_bits > _MXU_XLA_MAX_BITS:
            # the XLA int8 path materializes the 8× unpacked operand;
            # at large M only the in-kernel-unpack Pallas form is viable
            winner = "pallas_mxu"
    elif m_bits <= _MXU_XLA_MAX_BITS:
        winner = "mxu"
    else:
        winner = "pallas_mxu"
    if bm is not None and winner in ("mxu", "pallas_mxu"):
        # C8 block-clustered regime: when the summary-AND co-occupancy
        # says the K5 work list is a small fraction of the full K2 walk,
        # the skip pays ≈ 1/fraction (per-item cost matches K2's tile
        # steps — measured, CLAUDE.md). Global-compaction-invisible
        # structure (every column occupied by SOME row) is exactly what
        # this catches.
        from stormtpu.kernels.clustered import clustered_work_fraction

        wf = clustered_work_fraction(bm, cfg)
        if wf is not None and wf < cfg.clustered_work_fraction_threshold:
            return "clustered"
    return winner
