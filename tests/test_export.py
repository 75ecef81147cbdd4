"""Mesh export: marching tetrahedra on an analytic SDF + PLY round-trip."""
import struct

import numpy as np

from egonerf_tpu.render.export import marching_tetrahedra, write_ply


def test_sphere_surface():
    n = 48
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = np.sqrt(x**2 + y**2 + z**2)  # distance field; surface at r=0.6
    spacing = (ax[1] - ax[0],) * 3
    verts, faces = marching_tetrahedra(vol, 0.6, spacing=spacing, origin=(-1, -1, -1))
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    # all vertices lie on the sphere up to one cell of quantization
    assert np.abs(r - 0.6).max() < 2.5 * spacing[0]
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_ply_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    path = str(tmp_path / "tri.ply")
    write_ply(path, verts, faces)
    data = open(path, "rb").read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    assert b"element vertex 3" in data and b"element face 1" in data
    body = data[header_end:]
    got_verts = np.frombuffer(body[: 3 * 12], "<f4").reshape(3, 3)
    np.testing.assert_allclose(got_verts, verts)
    count, = struct.unpack("<B", body[36:37])
    assert count == 3
    got_face = np.frombuffer(body[37:49], "<i4")
    np.testing.assert_array_equal(got_face, [0, 1, 2])
