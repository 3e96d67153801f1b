"""Device-mesh construction.

Row-sharding axis per BASELINE.json:5 ("bitmap matrix is row-sharded
across hosts"). For the all-pairs workload a 1-D mesh suffices: the pair
space is streamed through the ring (allpairs.py), so there is no second
model axis; ICI carries the ring ppermute within a slice, DCN across
hosts — both expressed through the same jax.sharding mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

from stormtpu.config import default_config

__all__ = ["make_row_mesh", "fetch_global"]


def fetch_global(x) -> "np.ndarray":
    """Host ``np.ndarray`` of a global ``jax.Array``.

    Under a single controller this is ``np.asarray``; in a multi-process
    run a row-sharded result spans non-addressable devices (fetching
    raises RuntimeError), so every process all-gathers its addressable
    shards — each host gets the full array, matching the single-process
    contract of the ``distributed_*`` wrappers."""
    import numpy as np

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def make_row_mesh(
    n_devices: Optional[int] = None,
    *,
    axis: Optional[str] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all) named after the
    row-shard axis."""
    axis = axis or default_config().mesh_axis
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"asked for {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), axis_names=(axis,))


def make_grid_mesh(
    rows: int,
    bits: int,
    *,
    axes: tuple[str, str] = ("rows", "bits"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D mesh [rows × bits] for the composed row-shard × K-shard form
    (both N and M too large for either 1-D layout alone): the ring
    streams row shards along ``axes[0]`` while ``psum`` over ``axes[1]``
    merges exact int32 partials from the word slices. Lay the faster
    interconnect along the bits axis when possible — the psum runs every
    ring step."""
    if rows < 1 or bits < 1:
        raise ValueError(f"mesh dims must be >= 1, got {rows}×{bits}")
    if devices is None:
        devices = jax.devices()
    if rows * bits > len(devices):
        raise ValueError(
            f"asked for {rows}×{bits} devices, have {len(devices)}"
        )
    import numpy as np

    return Mesh(
        np.asarray(devices[: rows * bits]).reshape(rows, bits),
        axis_names=axes,
    )


def bit_axis_of(mesh: Mesh) -> Optional[str]:
    """Second mesh axis name on a 2-D [rows × bits] mesh, else None —
    the single home of the grid-mesh convention (make_grid_mesh defines
    it; every 2-D-aware sharded fn derives from here)."""
    return mesh.axis_names[1] if len(mesh.axis_names) == 2 else None
