from stormtpu.utils.tiling import (
    assemble_triangular,
    next_pow2,
    quantize_bucket,
    round_up,
    triangular_tile_ids,
)
from stormtpu.utils.backend import (
    V5E_INT8_PEAK_OPS,
    enable_compilation_cache,
    is_tpu_backend,
    pallas_interpret_default,
)
from stormtpu.utils.profiling import (
    timeit_chain,
    timeit_chain_salted,
    timeit_sustained,
    timeit_sustained_auto,
    timeit_sustained_salted,
    trace,
)

__all__ = [
    "V5E_INT8_PEAK_OPS",
    "enable_compilation_cache",
    "assemble_triangular",
    "next_pow2",
    "quantize_bucket",
    "round_up",
    "triangular_tile_ids",
    "is_tpu_backend",
    "pallas_interpret_default",
    "timeit_chain",
    "timeit_chain_salted",
    "timeit_sustained",
    "timeit_sustained_auto",
    "timeit_sustained_salted",
    "trace",
]
