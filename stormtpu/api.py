"""User-facing API.

Analog of the reference's top-level entry points (SURVEY.md §3 C9–C11:
``STORM_pairw_intersect_cardinality`` and the contiguous blocked variants),
re-shaped for a host-orchestrated accelerator: build a :class:`BitMatrix`,
then call :func:`intersect_count_matrix` (all-pairs) or :func:`pair_count`
(one pair). Strategy selection is automatic (D1) but overridable.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from stormtpu.config import EngineConfig, default_config
from stormtpu.dispatch import STRATEGIES, choose_strategy
from stormtpu.layout import BitMatrix
from stormtpu.kernels import xla as kx

__all__ = ["pair_count", "intersect_count_matrix", "count_block"]

MatrixLike = Union[BitMatrix, np.ndarray]


def _as_bitmatrix(x: MatrixLike) -> BitMatrix:
    if isinstance(x, BitMatrix):
        return x
    x = np.asarray(x)
    if x.dtype == np.uint32:
        raise TypeError(
            "raw uint32 arrays are ambiguous; wrap packed words with "
            "BitMatrix.from_packed(packed, m_bits=...)"
        )
    return BitMatrix.from_dense(x)


def pair_count(a: MatrixLike, b: MatrixLike) -> int:
    """Exact |A ∩ B| for two bitmaps (each a 1×M BitMatrix or {0,1} row).

    Config "single pair dense AND+popcount" (BASELINE.json:7).
    """
    bm_a = _as_bitmatrix(np.atleast_2d(a) if not isinstance(a, BitMatrix) else a)
    bm_b = _as_bitmatrix(np.atleast_2d(b) if not isinstance(b, BitMatrix) else b)
    if bm_a.n != 1 or bm_b.n != 1:
        raise ValueError(
            f"pair_count takes single bitmaps (got {bm_a.n} and {bm_b.n} "
            f"rows); use intersect_count_matrix / count_block for sets"
        )
    if bm_a.m_bits != bm_b.m_bits:
        raise ValueError("bit-universe mismatch")
    # pow2 word-bucket padding (exact: zero words add nothing): every
    # distinct W is otherwise a fresh 20–60 s remote compile — a user
    # sweeping bit-universes would pay the cold-start per M instead of
    # per log₂ bucket (VERDICT r1 weak #6)
    w = bm_a.packed.shape[1]
    w_pad = 1 << max(7, (max(w, 1) - 1).bit_length())
    a_p = np.zeros(w_pad, dtype=np.uint32)
    b_p = np.zeros(w_pad, dtype=np.uint32)
    a_p[:w] = bm_a.packed[0]
    b_p[:w] = bm_b.packed[0]
    out = kx.pair_count_xla(jnp.asarray(a_p), jnp.asarray(b_p))
    return int(out)


def intersect_count_matrix(
    x: MatrixLike,
    *,
    strategy: str = "auto",
    config: Optional[EngineConfig] = None,
) -> np.ndarray:
    """Exact N×N pairwise intersection-count matrix, int32.

    ``strategy``: "auto" (D1 dispatch) or one of ``dispatch.STRATEGIES``.
    All strategies are bit-exact against the NumPy oracle.
    """
    bm = _as_bitmatrix(x)
    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    if strategy == "auto":
        strategy = choose_strategy(bm.n, bm.m_bits, bm.density, cfg, bm=bm)
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}; want one of {STRATEGIES}")
    _STREAM_HINT = (
        "use stormtpu.stream.stream_count_matrix (resumable stripes; "
        "kernel='auto' keeps the clustered skip) or the "
        "stormtpu.stream_query reduced queries"
    )
    if strategy == "clustered":
        # K5 builds its own padded+cached device operand and work list
        # (empty K-groups are skipped per tile pair, which subsumes the
        # global empty-column compaction below). Its device footprint is
        # the padded operand plus the visited count tiles — exact from
        # the plan, so guard with that rather than the dense N² formula
        # (which would refuse workable low-work-fraction inputs).
        from stormtpu.kernels.clustered import (
            build_clustered_plan,
            count_matrix_clustered,
        )
        from stormtpu.stream import require_device_budget

        plan = build_clustered_plan(bm, cfg)
        if bm.n > 2:
            if plan is not None:
                need = (4 * plan.n_pad * plan.w_pad
                        + 4 * plan.n_slots * plan.ti * plan.ti)
                require_device_budget(
                    need,
                    f"N={bm.n}: the K5 operand plus work-list count tiles",
                    _STREAM_HINT,
                )
            elif bm.nnz:
                # degenerate plan falls back to the full K2 walk, which
                # allocates the N² output like the dense strategies below
                need = 4 * bm.n * bm.n + 4 * bm.n * bm.n_words
                require_device_budget(
                    need,
                    f"N={bm.n}: the N² count matrix plus operand",
                    _STREAM_HINT,
                )
        return count_matrix_clustered(bm, config=cfg, plan=plan)

    if strategy in ("popcount", "mxu", "pallas_dense", "pallas_mxu"):
        # the device strategies allocate the N² int32 output (plus the
        # packed operand) in HBM; past the budget that's an opaque
        # mid-call OOM — refuse with the streaming route instead
        from stormtpu.stream import require_device_budget

        if bm.n > 2:
            require_device_budget(
                4 * bm.n * bm.n + 4 * bm.n * bm.n_words,
                f"N={bm.n}: the N² count matrix plus operand",
                _STREAM_HINT,
            )
    packed_np = bm.packed
    if strategy not in ("sparse", "sparse_outer") and bm.n > 1:
        # Clustered-sparsity compaction (reference C8 block-skip, done the
        # XLA way: globally, once): drop all-empty word columns — exact.
        occupied = packed_np.any(axis=0)
        occ_frac = float(occupied.mean()) if occupied.size else 1.0
        if occ_frac < cfg.compact_occupancy_threshold:
            packed_np = np.ascontiguousarray(packed_np[:, occupied])
            if packed_np.shape[1] == 0:
                return np.zeros((bm.n, bm.n), dtype=np.int32)
    # host-only strategies must not pay a device transfer ("sparse"
    # builds its own position-list operands in count_matrix_sparse, so
    # uploading the packed matrix here would waste an ~8 s/138 MB relay
    # H2D and pin an unused HBM buffer); device strategies convert here
    # (through the BitMatrix device cache when the operand is the
    # uncompacted matrix — repeated calls skip the H2D re-upload)
    if strategy in ("sparse", "sparse_outer"):
        packed = packed_np
    elif packed_np is bm.packed:
        packed = bm.device_padded(bm.n)
    else:
        packed = jnp.asarray(packed_np)
    if strategy == "popcount":
        out = kx.count_matrix_popcount_xla(packed)
    elif strategy == "mxu":
        out = kx.count_matrix_int8_xla(packed)
    elif strategy == "pallas_dense":
        from stormtpu.kernels.dense import count_matrix_pallas_dense
        from stormtpu.tuning import tuned_variant

        out = count_matrix_pallas_dense(
            packed, config=cfg, variant=tuned_variant("k1", cfg.k1_variant)
        )
    elif strategy == "pallas_mxu":
        from stormtpu.kernels.mxu import count_matrix_pallas_mxu
        from stormtpu.tuning import tuned_variant

        out = count_matrix_pallas_mxu(
            packed, config=cfg, variant=tuned_variant("k2", cfg.k2_variant)
        )
    elif strategy == "sparse_outer":
        from stormtpu.kernels.sparse import count_matrix_sparse_outer

        if bm.n > 32768:
            # K4's documented N²-int32-buffer refusal: an explicit
            # sparse_outer request must surface it, not silently
            # materialize the multi-GB dense count matrix the error
            # message tells the caller to avoid (auto dispatch never
            # routes here above this N).
            raise ValueError(
                f"K4's N²-int32 count buffer is impractical at n={bm.n} "
                f"(> 4 GB); use a dense or streaming strategy"
            )
        try:
            out = count_matrix_sparse_outer(bm, config=cfg)
        except ValueError:
            # NumPy-fallback capacity guards (native tier unbuilt:
            # clustered column occupancy blows the emission padding, or
            # positions extraction would densify) — every strategy is
            # exact, so fall back to the dense MXU form
            from stormtpu.kernels.mxu import count_matrix_pallas_mxu
            from stormtpu.tuning import tuned_variant

            out = count_matrix_pallas_mxu(
                jnp.asarray(packed), config=cfg,
                variant=tuned_variant("k2", cfg.k2_variant),
            )
    else:  # sparse
        from stormtpu.kernels.sparse import count_matrix_sparse

        out = count_matrix_sparse(bm, config=cfg)
    return np.asarray(out)[: bm.n, : bm.n]


def count_block(
    a: MatrixLike,
    b: MatrixLike,
    *,
    config: Optional[EngineConfig] = None,
) -> np.ndarray:
    """Exact cross counts int32 [Na, Nb] between two bitmap sets
    (the rectangular primitive the distributed driver composes)."""
    bm_a = _as_bitmatrix(a)
    bm_b = _as_bitmatrix(b)
    if bm_a.m_bits != bm_b.m_bits:
        raise ValueError("bit-universe mismatch")
    cfg = config or default_config()
    cfg.validate(bm_a.m_bits)
    from stormtpu.kernels import count_block_auto

    out = count_block_auto(
        jnp.asarray(bm_a.packed), jnp.asarray(bm_b.packed), config=cfg
    )
    return np.asarray(out)
