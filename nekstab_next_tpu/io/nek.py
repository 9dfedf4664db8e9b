"""Reader for native Nek5000 ``#std`` binary field files.

Lets the framework load the reference repo's committed fixtures (converged
base flows ``BF_1cyl0.f00001``, ``BF_bfs0.f00001``, mode files) for
cross-validation, without a Nek5000 install.  Format (Nek5000 prepost.f
``mfo_outfld``):

* 132-byte ASCII header:
  ``#std wdsize nx ny nz nelg nelgt time istep fid0 nfileo rdcode p0th ifpmesh``
  where ``rdcode`` is a subset of ``XUPTS`` (coords, velocity, pressure,
  temperature, passive scalars);
* 4-byte float endian tag (6.54321);
* ``nelgt`` int32 global element ids (the element map);
* per-field data blocks, each element contiguous, Fortran (i fastest) order:
  X: ndim coords per element interleaved by component block;
  U: ndim velocity components per element; P, T: one scalar per element.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class NekField:
    nx: int
    ny: int
    nz: int
    nelem: int
    time: float
    istep: int
    rdcode: str
    elmap: np.ndarray  # (nelem,) global element ids (1-based)
    x: Optional[np.ndarray] = None  # (nelem, nz, ny, nx) per component dict
    y: Optional[np.ndarray] = None
    z: Optional[np.ndarray] = None
    u: Optional[np.ndarray] = None  # (nelem, nz, ny, nx, ndim)
    p: Optional[np.ndarray] = None  # (nelem, nz, ny, nx)
    t: Optional[np.ndarray] = None

    @property
    def ndim(self) -> int:
        return 2 if self.nz == 1 else 3


def read_nek_field(path: str) -> NekField:
    with open(path, "rb") as f:
        header = f.read(132).decode("ascii", errors="replace")
        if not header.startswith("#std"):
            raise ValueError(f"not a Nek '#std' field file: {path}")
        tok = header.split()
        wdsize = int(tok[1])
        nx, ny, nz = int(tok[2]), int(tok[3]), int(tok[4])
        nelg, nelgt = int(tok[5]), int(tok[6])
        time = float(tok[7])
        istep = int(tok[8])
        rdcode = tok[11]

        tag = f.read(4)
        (test,) = struct.unpack("<f", tag)
        if abs(test - 6.54321) < 1e-4:
            endian = "<"
        else:
            (test,) = struct.unpack(">f", tag)
            if abs(test - 6.54321) > 1e-4:
                raise ValueError("bad endian tag")
            endian = ">"

        elmap = np.frombuffer(f.read(4 * nelgt), dtype=f"{endian}i4").astype(
            np.int64
        )

        fdt = np.dtype(f"{endian}f{wdsize}")
        npts = nx * ny * nz
        ndim = 2 if nz == 1 else 3

        def read_block(ncomp: int) -> np.ndarray:
            """One field block: per element, ncomp contiguous component
            slabs of npts values each."""
            raw = np.frombuffer(
                f.read(nelgt * ncomp * npts * wdsize), dtype=fdt
            )
            a = raw.reshape(nelgt, ncomp, nz, ny, nx).astype(np.float64)
            return a

        out = NekField(
            nx=nx, ny=ny, nz=nz, nelem=nelgt, time=time, istep=istep,
            rdcode=rdcode, elmap=elmap,
        )
        code = rdcode.upper()
        if "X" in code:
            c = read_block(ndim)
            out.x, out.y = c[:, 0], c[:, 1]
            if ndim == 3:
                out.z = c[:, 2]
        if "U" in code:
            c = read_block(ndim)
            out.u = np.moveaxis(c, 1, -1)  # (nelem, nz, ny, nx, ndim)
        if "P" in code:
            out.p = read_block(1)[:, 0]
        if "T" in code:
            out.t = read_block(1)[:, 0]
        return out


def nek_to_layout(a: np.ndarray) -> np.ndarray:
    """Convert a 2-D Nek block (nelem, 1, ny, nx[, ndim]) to this framework's
    (nelem, i, j[, ndim]) layout with i the x-direction node index."""
    if a.ndim == 4:
        return np.transpose(a[:, 0], (0, 2, 1))
    if a.ndim == 5:
        return np.transpose(a[:, 0], (0, 2, 1, 3))
    raise ValueError(a.shape)
