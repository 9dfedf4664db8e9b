"""Snapshot container: one ``.npz`` per field with metadata.

Replaces the reference's ``outpost``/``load_fld`` round trips (64-bit ``BF_``
files, mode files ``dRe/dIm/aRe/aIm``, numbering via ``whereyouwant``,
core/IO.f90:2-10).  The ``time`` entry carries physical time — and, by the
reference's convention, the orbit period for UPO/Floquet restarts."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class FieldFile:
    u: np.ndarray  # (nelem, n, n, ndim)
    p: Optional[np.ndarray]  # (nelem, n, n) or None
    t: Optional[np.ndarray]  # temperature / scalar or None
    time: float
    meta: dict


def field_path(directory: str, prefix: str, session: str, index: int) -> str:
    """Reference naming convention: ``<prefix><session>0.f<index:05d>`` ->
    ``<prefix>_<session>_<index:05d>.npz``."""
    return os.path.join(directory, f"{prefix}_{session}_{index:05d}.npz")


def save_field(
    path: str,
    u,
    p=None,
    t=None,
    time: float = 0.0,
    **meta,
) -> str:
    """Write one snapshot (arrays coerced to host numpy, f64)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"u": np.asarray(u, dtype=np.float64),
               "time": np.asarray(float(time))}
    if p is not None:
        payload["p"] = np.asarray(p, dtype=np.float64)
    if t is not None:
        payload["t"] = np.asarray(t, dtype=np.float64)
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **payload)
    return path


def load_field(path: str) -> FieldFile:
    with np.load(path) as z:
        meta = {}
        if "meta_json" in z:
            meta = json.loads(bytes(z["meta_json"].tobytes()).decode())
        return FieldFile(
            u=z["u"],
            p=z["p"] if "p" in z else None,
            t=z["t"] if "t" in z else None,
            time=float(z["time"]),
            meta=meta,
        )
