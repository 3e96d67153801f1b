"""BitMatrix serialization.

The reference ingests positions programmatically and (in its harness)
from generated data; real pipelines need durable artifacts. Format: one
``.npz`` holding the packed words + metadata — portable, mmap-friendly
via NumPy, exact by construction.
"""

from __future__ import annotations

import numpy as np

from stormtpu.layout import BitMatrix

__all__ = ["save_bitmatrix", "load_bitmatrix"]

_FORMAT_VERSION = 1


def save_bitmatrix(bm: BitMatrix, path: str) -> None:
    """Write a BitMatrix to ``path`` (.npz, compressed). The ingest-time
    COO cache, when present, rides along so the ultra-sparse K4 path
    stays O(nnz) after a round-trip."""
    extra = {}
    if bm.coo is not None:
        extra["coo_rows"], extra["coo_positions"] = bm.coo
    np.savez_compressed(
        path,
        format_version=_FORMAT_VERSION,
        packed=bm.packed,
        m_bits=bm.m_bits,
        **extra,
    )


def load_bitmatrix(path: str) -> BitMatrix:
    with np.load(path) as z:
        version = int(z["format_version"])
        if version > _FORMAT_VERSION:
            raise ValueError(
                f"{path}: format version {version} is newer than supported "
                f"({_FORMAT_VERSION})"
            )
        bm = BitMatrix.from_packed(z["packed"], m_bits=int(z["m_bits"]))
        if "coo_rows" in z:
            bm.coo = (z["coo_rows"], z["coo_positions"])
        return bm
