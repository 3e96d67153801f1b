"""Multi-host initialization and the distributed streaming driver.

Multi-host is new surface (the reference is single-process; SURVEY.md §2):
on a TPU pod slice each host process sees its local chips, and
``jax.distributed.initialize`` + a global mesh make the row-sharded ring
driver (allpairs.py) and this streaming driver work unchanged — shard_map
arrays are global, collectives ride ICI within a slice and DCN across
hosts. This environment exposes one chip, so multi-host paths are
validated structurally on forced multi-device CPU meshes (tests) and via
``__graft_entry__.dryrun_multichip``.

The streaming driver covers the 1M×1M-row acceptance config
(BASELINE.json:11): C = N²·int32 is terabytes, so it is produced as
superblock stripes — each stripe computed data-parallel over the mesh
(row-sharded stripe rows × replicated partner rows), written to disk with
the same manifest/resume format as the single-device stream (stream.py),
i.e. checkpoint/resume at block-pair granularity.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stormtpu.config import EngineConfig, default_config
from stormtpu.layout import BitMatrix
from stormtpu.parallel.allpairs import BlockFn, shard_map
from stormtpu.parallel.mesh import fetch_global, make_row_mesh
from stormtpu.stream import _content_fingerprint, stripe_path
from stormtpu.utils import round_up

__all__ = ["initialize_multihost", "distributed_stream_count_matrix"]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or auto-detect) a multi-host JAX run.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; elsewhere pass coordinator host:port, world size, and rank.
    Call once per process before building meshes.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _sharded_block_fn(mesh: Mesh, axis: str, block_fn: BlockFn):
    """[SBi, W] × [SBj, W] → [SBi, SBj] counts, rows of A sharded over the
    mesh, B replicated — the rectangular primitive of a stripe."""
    fn = shard_map(
        lambda a, b: block_fn(a, b).astype(jnp.int32),
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_stream_count_matrix(
    bm: BitMatrix,
    out_dir: str,
    *,
    superblock_rows: int = 8192,
    mesh: Optional[Mesh] = None,
    config: Optional[EngineConfig] = None,
    block_fn: Optional[BlockFn] = None,
    resume: bool = True,
    compress: bool = True,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """Stream all upper-triangular superblock stripes of the count matrix,
    each computed data-parallel over the mesh. Only process 0 writes
    shards (single-writer; all processes compute)."""
    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    if mesh is None:
        mesh = make_row_mesh()
    axis = mesh.axis_names[0]
    r = mesh.shape[axis]
    superblock_rows = round_up(superblock_rows, r * 8)
    if block_fn is None:
        from stormtpu.kernels import count_block_auto

        block_fn = lambda a, b: count_block_auto(a, b, config=cfg)

    n_pad = round_up(bm.n, superblock_rows)
    n_super = n_pad // superblock_rows
    packed = np.zeros((n_pad, bm.n_words), dtype=np.uint32)
    packed[: bm.n] = bm.packed

    # C8 skip at mesh-streaming scale (superblock granularity): the
    # per-superblock K-group occupancy summary decides, identically on
    # every process (no collective needed), which stripes are exactly
    # zero — those never upload operands or touch the mesh, and their
    # files are empty sparse-tile records (see stream.py's format)
    occ_sb = None
    if bm.n and bm.n_words:
        wk = 128
        occ_rows = bm.block_summary(block_bits=wk * 32).astype(bool)
        occ_pad = np.zeros((n_pad, occ_rows.shape[1]), dtype=bool)
        occ_pad[: bm.n] = occ_rows
        occ_sb = occ_pad.reshape(n_super, superblock_rows, -1).any(axis=1)

    is_writer = jax.process_index() == 0
    if is_writer:
        os.makedirs(out_dir, exist_ok=True)
    stripe_fn = _sharded_block_fn(mesh, axis, block_fn)
    a_sharding = NamedSharding(mesh, P(axis, None))
    b_sharding = NamedSharding(mesh, P(None, None))

    manifest = {
        "n": bm.n,
        "content": _content_fingerprint(bm),
        "m_bits": bm.m_bits,
        "superblock_rows": superblock_rows,
        "n_super": n_super,
        "kernel": "distributed",
        "tile_rows": 8,  # assembly unit of zero (sparse-tile) stripes
        "completed": [],
    }
    total = n_super * (n_super + 1) // 2
    done = 0
    for i in range(n_super):
        xi = None  # upload lazily: an all-skipped row never uploads
        for j in range(i, n_super):
            path = stripe_path(out_dir, i, j)
            if resume and os.path.exists(path):
                manifest["completed"].append([i, j])
                done += 1
                continue
            if occ_sb is not None and not (occ_sb[i] & occ_sb[j]).any():
                if is_writer:
                    tmp = path + ".tmp.npz"
                    z = np.zeros(0, dtype=np.int32)
                    np.savez(tmp, tiles=np.zeros((0, 8, 8), dtype=np.int32),
                             loc_i=z, loc_j=z, i=i, j=j)
                    os.replace(tmp, path)
                manifest["completed"].append([i, j])
                done += 1
                if progress is not None:
                    progress(done, total)
                continue
            if xi is None:
                xi = jax.device_put(
                    packed[i * superblock_rows : (i + 1) * superblock_rows],
                    a_sharding,
                )
            xj = jax.device_put(
                packed[j * superblock_rows : (j + 1) * superblock_rows],
                b_sharding,
            )
            # row-sharded result: gather collectively (every process must
            # participate even though only process 0 writes)
            stripe = fetch_global(stripe_fn(xi, xj))
            if is_writer:
                tmp = path + ".tmp.npz"
                # see stream.py: compression is the 1-core-host wall at scale
                save = np.savez_compressed if compress else np.savez
                save(tmp, counts=stripe, i=i, j=j)
                os.replace(tmp, path)
            manifest["completed"].append([i, j])
            done += 1
            if progress is not None:
                progress(done, total)
    if is_writer:
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
    return manifest
