"""Nek5000 ``.re2`` binary mesh reader.

Lets users bring the reference's own case meshes (e.g.
examples/cylinder/1cyl.re2: 1996 elements, curved cylinder wall) into the
framework for cross-validation — the TPU-native replacement for Nek's mesh
ingestion that the reference inherits (SURVEY.md section 2.2 "mesh /
discretization setup").

Format (little-endian, version ``#v002``):

* 80-byte ASCII header: ``#v002  nelgt  ndim  nelgv ...``;
* 4-byte endian-test float 6.54321;
* per element (2-D): 9 float64 — group, x(4 corners), y(4 corners), in Nek
  preprocessor corner order (counterclockwise from (-1,-1));
* curved-side section: count, then records (eg, iside, p1..p5, ccurve) of
  8 float64 each, ``ccurve`` being the first byte ('C' = circular arc of
  radius p1, sign = which of the two centers);
* BC section: count, then records (eg, iside, p1..p5, cbc3) — 'W' wall,
  'v' inflow, 'O' outflow, 'SYM', 'P' periodic (p1/p2 = partner el/side).

Element GLL coordinates come from Gordon-Hall transfinite interpolation of
the four (possibly curved) edges, after which :func:`mesh.build_mesh`
assembles connectivity by coordinate matching — the O-mesh periodic seam
('P' with coincident coordinates) merges automatically.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from .gll import gll_points_weights
from .mesh import BoundaryCondition as BC
from .mesh import Mesh2D, build_mesh

_CBC_MAP = {
    b"W": BC.WALL,
    b"v": BC.DIRICHLET,
    b"V": BC.DIRICHLET,
    b"O": BC.OUTFLOW,
    b"o": BC.OUTFLOW,
    b"SYM": BC.SYMMETRY,
}


@dataclasses.dataclass
class Re2Data:
    nelem: int
    ndim: int
    corners: np.ndarray  # (nelem, 4, ndim) preprocessor-ordered corners
    curves: Dict[Tuple[int, int], Tuple[str, np.ndarray]]  # (el, side) -> (type, p1..p5)
    bcs: Dict[Tuple[int, int], Tuple[str, np.ndarray]]  # (el, side) -> (cbc, p1..p5)


def read_re2(path: str) -> Re2Data:
    with open(path, "rb") as fh:
        raw = fh.read()
    hdr = raw[:80].decode("ascii", errors="replace")
    if hdr[:5] not in ("#v002", "#v003"):
        raise ValueError(f"unsupported .re2 version: {hdr[:10]!r}")
    parts = hdr.split()
    nelem, ndim = int(parts[1]), int(parts[2])
    test = struct.unpack("<f", raw[80:84])[0]
    if abs(test - 6.54321) > 1e-4:
        raise ValueError("byte order mismatch (big-endian .re2 not supported)")

    off = 84
    nc = 4 if ndim == 2 else 8
    per = 1 + ndim * nc  # group + coordinates
    data = np.frombuffer(raw, "<f8", nelem * per, off).reshape(nelem, per)
    off += nelem * per * 8
    if ndim == 2:
        corners = np.stack([data[:, 1:5], data[:, 5:9]], axis=-1)  # (nelem,4,2)
    else:
        corners = np.stack(
            [data[:, 1:9], data[:, 9:17], data[:, 17:25]], axis=-1
        )  # (nelem,8,3): x(1:8), y(1:8), z(1:8)

    def read_records(off: int):
        cnt = int(np.frombuffer(raw, "<f8", 1, off)[0])
        off += 8
        rec = np.frombuffer(raw, "<f8", cnt * 8, off).reshape(cnt, 8)
        off += cnt * 64
        return rec, off

    crec, off = read_records(off)
    curves: Dict[Tuple[int, int], Tuple[str, np.ndarray]] = {}
    for row in crec:
        e, s = int(row[0]) - 1, int(row[1]) - 1
        ctype = row[7:8].tobytes()[:1].decode()
        curves[(e, s)] = (ctype, row[2:7].copy())

    brec, off = read_records(off)
    bcs: Dict[Tuple[int, int], Tuple[str, np.ndarray]] = {}
    for row in brec:
        e, s = int(row[0]) - 1, int(row[1]) - 1
        cbc = row[7:8].tobytes().rstrip(b"\x00 ").decode()
        bcs[(e, s)] = (cbc, row[2:7].copy())

    return Re2Data(nelem=nelem, ndim=ndim, corners=corners, curves=curves,
                   bcs=bcs)


def _arc_points(A: np.ndarray, B: np.ndarray, radius: float,
                s: np.ndarray) -> np.ndarray:
    """Points along the circular arc A -> B of given (signed) radius at
    normalized parameters ``s`` in [0,1] (Nek 'C' curved side, genxyz
    ``arcsrf`` convention: the sign picks which of the two circle centers)."""
    chord = B - A
    d = float(np.hypot(*chord))
    R = abs(radius)
    if R < d / 2:
        raise ValueError(f"arc radius {radius} < half chord {d/2}")
    m = (A + B) / 2.0
    # left-hand normal of the A->B direction
    nhat = np.array([-chord[1], chord[0]]) / d
    h = np.sqrt(R * R - 0.25 * d * d)
    c = m + (h if radius > 0 else -h) * nhat
    thA = np.arctan2(A[1] - c[1], A[0] - c[0])
    thB = np.arctan2(B[1] - c[1], B[0] - c[0])
    dth = (thB - thA + np.pi) % (2 * np.pi) - np.pi  # short way
    th = thA + s * dth
    return c[None, :] + R * np.stack([np.cos(th), np.sin(th)], axis=-1)


def _edge_points(corners: np.ndarray, side: int,
                 curve: Optional[Tuple[str, np.ndarray]],
                 s: np.ndarray) -> np.ndarray:
    """Points along preprocessor side ``side`` (0..3: c1-c2, c2-c3, c3-c4,
    c4-c1) at parameters ``s``; straight unless a curve record exists."""
    A = corners[side]
    Bidx = (side + 1) % 4
    B = corners[Bidx]
    if curve is None:
        return A[None, :] + s[:, None] * (B - A)[None, :]
    ctype, p = curve
    if ctype == "C":
        return _arc_points(A, B, float(p[0]), s)
    if ctype == "m":  # midside-point quadratic
        M = np.array([p[0], p[1]])
        # quadratic through A (s=0), M (s=1/2), B (s=1)
        l0 = 2 * (s - 0.5) * (s - 1.0)
        l1 = -4 * s * (s - 1.0)
        l2 = 2 * s * (s - 0.5)
        return l0[:, None] * A + l1[:, None] * M + l2[:, None] * B
    raise NotImplementedError(f"curve type {ctype!r}")


def mesh_from_re2(
    path: str,
    order: int,
    coord_key: Optional[Callable] = None,
    bc_override: Optional[Dict[str, BC]] = None,
    boundary_ids: Optional[Dict[int, BC]] = None,
) -> Mesh2D:
    """Build a :class:`Mesh2D` at polynomial ``order`` from a Nek ``.re2``.

    ``bc_override`` remaps cbc strings (e.g. {'v': BC.WALL}).  Periodic
    sides rely on coordinate coincidence (O-mesh seams) or a supplied
    ``coord_key`` wrap for translational periodicity.

    ``boundary_ids`` handles v003 meshes whose BC section carries boundary
    IDs instead of condition strings ('MSH' records; the reference's BFS
    case assigns them in usrdat2 via ``setbc(id, field, bc)``,
    examples/back_fstep/baseflow/bfs.usr:114-127): map id -> BC, e.g.
    {4: BC.DIRICHLET, 2: BC.OUTFLOW, 3: BC.WALL} for the BFS."""
    data = read_re2(path)
    n = order + 1
    z, _ = gll_points_weights(n)
    s = (z + 1.0) / 2.0  # edge parameter in [0,1]
    xi = s[:, None]  # (n,1) for xi-direction blending
    eta = s[None, :]  # (1,n)

    nelem = data.nelem
    X = np.zeros((nelem, n, n))
    Y = np.zeros((nelem, n, n))
    for e in range(nelem):
        c = data.corners[e]  # (4,2)
        Eb = _edge_points(c, 0, data.curves.get((e, 0)), s)  # c1->c2, xi
        Er = _edge_points(c, 1, data.curves.get((e, 1)), s)  # c2->c3, eta
        Et = _edge_points(c, 2, data.curves.get((e, 2)), s)[::-1]  # -> xi asc
        El = _edge_points(c, 3, data.curves.get((e, 3)), s)[::-1]  # -> eta asc
        for k, out in ((0, X), (1, Y)):
            face = (
                (1 - eta) * Eb[:, k][:, None]
                + eta * Et[:, k][:, None]
                + (1 - xi) * El[:, k][None, :]
                + xi * Er[:, k][None, :]
                - (
                    (1 - xi) * (1 - eta) * c[0, k]
                    + xi * (1 - eta) * c[1, k]
                    + xi * eta * c[2, k]
                    + (1 - xi) * eta * c[3, k]
                )
            )
            out[e] = face

    if data.ndim == 3:
        raise ValueError("3-D mesh: use mesh3_from_re2")
    cbc_map = dict(_CBC_MAP)
    edge_bc = np.empty((nelem, 4), dtype=object)
    edge_bc[:] = None
    for (e, sd), (cbc, p) in data.bcs.items():
        if cbc in ("P", "E", ""):
            continue  # connectivity, not a boundary condition
        if cbc == "MSH":  # v003 boundary-ID record; id in the last param
            bid = int(p[4])
            if boundary_ids is None or bid not in boundary_ids:
                raise ValueError(
                    f"mesh carries boundary-ID records; pass boundary_ids "
                    f"(element {e} side {sd} has id {bid})"
                )
            edge_bc[e, sd] = boundary_ids[bid]
            continue
        bc = (bc_override or {}).get(cbc) or cbc_map.get(cbc.encode()[:3]) \
            or cbc_map.get(cbc.encode()[:1])
        if bc is None:
            raise ValueError(f"unmapped cbc {cbc!r} at element {e} side {sd}")
        edge_bc[e, sd] = bc

    return build_mesh(X, Y, edge_bc, order, coord_key=coord_key)


# Nek preprocessor face numbers (1..6: eta-, xi+, eta+, xi-, zeta-, zeta+)
# -> mesh3.face index (0..5: xi-, xi+, eta-, eta+, zeta-, zeta+)
_NEK_FACE3 = {0: 2, 1: 1, 2: 3, 3: 0, 4: 4, 5: 5}


def mesh3_from_re2(
    path: str,
    order: int,
    coord_key: Optional[Callable] = None,
    bc_override: Optional[Dict[str, "BC"]] = None,
    boundary_ids: Optional[Dict[int, "BC"]] = None,
):
    """3-D analog of :func:`mesh_from_re2` (hex elements, trilinear geometry
    from the 8 preprocessor corners; curved faces not supported)."""
    from .mesh3 import Mesh3D, build_mesh_3d  # noqa: F401 (Mesh3D re-export)

    data = read_re2(path)
    if data.ndim != 3:
        raise ValueError("2-D mesh: use mesh_from_re2")
    if data.curves:
        raise NotImplementedError("curved faces in 3-D .re2 not supported yet")
    n = order + 1
    z, _ = gll_points_weights(n)
    s = (z + 1.0) / 2.0
    # trilinear shape functions at the GLL grid, preprocessor corner order:
    # bottom (zeta=0): (-,-) (+,-) (+,+) (-,+), then the top copy
    xi = s[:, None, None]
    eta = s[None, :, None]
    zeta = s[None, None, :]
    wts = [
        (1 - xi) * (1 - eta), xi * (1 - eta), xi * eta, (1 - xi) * eta,
    ]
    W = np.stack([w * (1 - zeta) for w in wts] + [w * zeta for w in wts])
    # (8, n, n, n); coords: corners (nelem, 8, 3)
    XYZ = np.einsum("cijk,ecd->deijk", W, data.corners)  # (3, nelem, n,n,n)

    nelem = data.nelem
    face_bc = np.empty((nelem, 6), dtype=object)
    face_bc[:] = None
    cbc_map = dict(_CBC_MAP)
    for (e, sd), (cbc, p) in data.bcs.items():
        if cbc in ("P", "E", ""):
            continue
        face = _NEK_FACE3[sd]
        if cbc == "MSH":
            bid = int(p[4])
            if boundary_ids is None or bid not in boundary_ids:
                raise ValueError(
                    f"boundary-ID records need boundary_ids (el {e} face "
                    f"{face} id {bid})"
                )
            face_bc[e, face] = boundary_ids[bid]
            continue
        bc = (bc_override or {}).get(cbc) or cbc_map.get(cbc.encode()[:3]) \
            or cbc_map.get(cbc.encode()[:1])
        if bc is None:
            raise ValueError(f"unmapped cbc {cbc!r} at element {e} face {face}")
        face_bc[e, face] = bc

    return build_mesh_3d(XYZ[0], XYZ[1], XYZ[2], face_bc, order,
                         coord_key=coord_key)
