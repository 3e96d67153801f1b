"""Streaming scale: matrices whose result — or whose operands — exceed
device memory.

Three tiers, all exact and resumable:

1. N² result too big to materialize → ``stream_count_matrix`` writes
   superblock stripes with checkpoint/resume (SURVEY.md §6).
2. Packed operands too big for HBM → the same call flips (automatically,
   past a device budget) to operand streaming: two superblock slices
   device-resident at a time, so N is bounded by host RAM exactly like
   the reference's single-node driver (SURVEY.md §3 C11).
3. You don't want the matrix at all → ``stream_query`` top-k / screens
   reduce each stripe on device and never materialize C anywhere.

Run: python examples/streaming.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize force-registers the TPU plugin and overrides
    # the env; restore the user's explicit CPU request (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from stormtpu import BitMatrix
from stormtpu.config import EngineConfig
from stormtpu.stream import load_streamed_matrix, stream_count_matrix
from stormtpu.stream_query import stream_pairs_above, stream_topk_neighbors

rng = np.random.default_rng(0)
# demo shape — the machinery is shape-agnostic: N is bounded by host
# RAM, not HBM. On CPU the Pallas kernels run in interpret mode, so the
# demo shrinks shape and tiles to stay seconds-long.
if jax.default_backend() == "cpu":
    n, m, sb = 256, 4_096, 64
    cfg = EngineConfig(k1_tile_rows=8, k1_tile_words=128,
                       k2_tile_rows=32, k2_tile_words=32)
else:
    n, m, sb = 2048, 65_536, 512
    cfg = None
dense = (rng.random((n, m)) < 0.2).astype(np.uint8)
bm = BitMatrix.from_dense(dense)
print(f"panel: {bm}")

with tempfile.TemporaryDirectory() as out_dir:
    # --- tier 1+2: stripes with forced operand streaming (the auto mode
    # flips past ~12 GB of padded operand; forced here to demo) ---------
    man = stream_count_matrix(
        bm, out_dir, superblock_rows=sb, operand_streaming=True,
        config=cfg,
        progress=lambda d, t: print(f"  stripe {d}/{t}", end="\r"),
    )
    print(f"\nwrote {len(man['completed'])} stripes "
          f"(kernel={man['kernel']}, operand_streaming=True)")
    c = load_streamed_matrix(out_dir)

want = dense.astype(np.int64) @ dense.T
assert np.array_equal(c, want)
print("stripes exact vs the NumPy oracle")

# --- tier 3: reduced queries without materializing C anywhere ----------
vals, idx = stream_topk_neighbors(bm, k=5, superblock_rows=sb, config=cfg)
w = want.copy()
np.fill_diagonal(w, -1)
assert np.array_equal(vals, np.maximum(np.sort(w, axis=1)[:, ::-1][:, :5], 0))
print(f"stream_topk_neighbors: row 0 partners {idx[0].tolist()} "
      f"counts {vals[0].tolist()} (exact)")

thr = int(np.percentile(want[np.triu_indices(n, 1)], 99.9))
ii, jj, v = stream_pairs_above(bm, thr, superblock_rows=sb, config=cfg)
wi, wj = np.nonzero(np.triu(want, 1) >= thr)
assert np.array_equal(ii, wi) and np.array_equal(v, want[wi, wj])
print(f"stream_pairs_above(>= {thr}): {v.size} pairs, exact")

# multi-hour walks checkpoint: out_dir persists per-stripe progress and
# a re-run (or a crashed run) resumes at the first unfinished stripe
with tempfile.TemporaryDirectory() as ck:
    stream_pairs_above(bm, thr, superblock_rows=sb, config=cfg, out_dir=ck)
    ii2, jj2, v2 = stream_pairs_above(  # second run: all stripes reloaded
        bm, thr, superblock_rows=sb, config=cfg, out_dir=ck)
assert (np.array_equal(ii2, wi) and np.array_equal(jj2, wj)
        and np.array_equal(v2, want[wi, wj]))
print("checkpoint/resume round-trip exact")

# --- tier 4: extreme sparsity — per-superblock K4 host emission --------
# (auto below the measured density threshold; forced here so the demo
# shape exercises it. Measured at 131k × 1M d=1e-5: counts 42 s, top-k
# 53 s vs hours for the dense walk — BASELINE.md)
from stormtpu.native import HAVE_NATIVE

if HAVE_NATIVE:
    sparse01 = (rng.random((n, m)) < 0.002).astype(np.uint8)
    bm_s = BitMatrix.from_dense(sparse01)
    vals_s, _ = stream_topk_neighbors(
        bm_s, k=3, superblock_rows=sb, kernel="sparse_outer", config=cfg)
    ws = sparse01.astype(np.int64) @ sparse01.T
    np.fill_diagonal(ws, -1)
    assert np.array_equal(
        vals_s, np.maximum(np.sort(ws, axis=1)[:, ::-1][:, :3], 0))
    print("sparse_outer stripe top-k exact (host K4 emission, no device)")

# --- tier 5: panels bigger than host RAM stream from DISK --------------
from stormtpu.io import load_bitmatrix_mmap, save_bitmatrix_mmap

with tempfile.TemporaryDirectory() as td:
    p = os.path.join(td, "panel.npy")
    save_bitmatrix_mmap(bm, p)           # uncompressed .npy + .json sidecar
    bm_disk = load_bitmatrix_mmap(p)     # zero-copy view of the file
    assert not bm_disk.packed.flags.owndata
    vals_d, _ = stream_topk_neighbors(bm_disk, k=5, superblock_rows=sb,
                                      config=cfg)
    assert np.array_equal(vals_d, vals)
    print("disk-resident (memmap) panel: streaming top-k identical")
print("OK")
