"""Nek ``.re2`` mesh reader (mesh/re2.py).

A synthetic two-element v002 mesh checks the parser + transfinite mapping;
the reference fixture meshes (cylinder with curved walls, BFS with v003
boundary-ID records) are read when the reference checkout is present.
"""

import os
import struct

import numpy as np
import pytest

from nekstab_next_tpu.mesh.mesh import BoundaryCondition as BC
from nekstab_next_tpu.mesh.re2 import mesh3_from_re2, mesh_from_re2, read_re2

REF = "/root/reference/examples"


def _write_re2(path, corners, curves, bcs, version=b"#v002"):
    """corners: (nelem,4|8,2|3); curves/bcs: lists of (eg, side, params, tag)."""
    nel, nc, nd = corners.shape
    hdr = (version + f" {nel:8d}  {nd} {nel:8d} hdr".encode()).ljust(80)
    out = [hdr, struct.pack("<f", 6.54321)]
    for e in range(nel):
        rec = np.zeros(1 + nc * nd)
        for d in range(nd):
            rec[1 + d * nc:1 + (d + 1) * nc] = corners[e, :, d]
        out.append(rec.astype("<f8").tobytes())
    for section in (curves, bcs):
        out.append(np.array([len(section)], "<f8").tobytes())
        for eg, side, params, tag in section:
            rec = np.zeros(8)
            rec[0], rec[1] = eg, side
            rec[2:2 + len(params)] = params
            raw = bytearray(rec.astype("<f8").tobytes())
            raw[56:56 + len(tag)] = tag
            out.append(bytes(raw))
    with open(path, "wb") as fh:
        fh.write(b"".join(out))


def test_synthetic_two_element(tmp_path):
    # two unit squares side by side; left edge inflow, right edge outflow,
    # top/bottom walls
    c1 = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    c2 = c1 + [1, 0]
    corners = np.stack([c1, c2])
    bcs = [
        (1, 4, [], b"v  "), (2, 2, [], b"O  "),
        (1, 1, [], b"W  "), (2, 1, [], b"W  "),
        (1, 3, [], b"W  "), (2, 3, [], b"W  "),
    ]
    p = tmp_path / "two.re2"
    _write_re2(str(p), corners, [], bcs)
    d = read_re2(str(p))
    assert d.nelem == 2 and len(d.bcs) == 6
    m = mesh_from_re2(str(p), order=4)
    assert m.nelem == 2
    # shared interior edge merged: 2*(5*5) - 5 shared
    assert m.nglobal == 45
    assert m.jac.min() > 0
    np.testing.assert_allclose(m.integrate(np.ones_like(m.x)), 2.0, rtol=1e-12)


def test_synthetic_3d_two_hex(tmp_path):
    # two unit cubes stacked in x; Nek preprocessor corner order: bottom
    # face CCW from (-,-), then the top copy
    base = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ], float)
    corners = np.stack([base, base + [1, 0, 0]])
    # Nek faces: 1=eta-, 2=xi+, 3=eta+, 4=xi-, 5=zeta-, 6=zeta+
    bcs = []
    for e in (1, 2):
        for sd in (1, 3, 5, 6):
            bcs.append((e, sd, [], b"W  "))
    bcs += [(1, 4, [], b"v  "), (2, 2, [], b"O  ")]
    p = tmp_path / "two3.re2"
    _write_re2(str(p), corners, [], bcs)
    m = mesh3_from_re2(str(p), order=3)
    assert m.nelem == 2
    assert m.jac.min() > 0
    np.testing.assert_allclose(float((m.bm).sum()), 2.0, rtol=1e-12)
    # inflow face masked, outflow unmasked pressure
    assert m.vmask.min() == 0.0
    assert m.pmask.min() == 0.0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_cylinder_mesh():
    m = mesh_from_re2(f"{REF}/cylinder/1cyl.re2", order=5)
    assert m.nelem == 1996  # reference fixture (examples/cylinder/SIZE:17)
    assert m.jac.min() > 0
    r = np.sqrt(m.x**2 + m.y**2)
    wall = m.dirichlet_nodes & (r < 5.0)
    # curved-side ('C') arcs put wall nodes exactly on the r=0.5 cylinder
    np.testing.assert_allclose(r[wall], 0.5, atol=5e-8)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_bfs_mesh_v003():
    m = mesh_from_re2(
        f"{REF}/back_fstep/baseflow/bfs.re2", order=5,
        boundary_ids={4: BC.DIRICHLET, 2: BC.OUTFLOW, 3: BC.WALL, 1: BC.WALL},
    )
    assert m.nelem == 1670  # reference fixture (back_fstep/baseflow/SIZE:17)
    assert m.jac.min() > 0
    assert m.outflow_nodes.sum() > 0
