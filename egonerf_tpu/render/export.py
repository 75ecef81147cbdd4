"""Iso-surface mesh export.

The reference exports density iso-surfaces with skimage's marching cubes +
plyfile (reference: utils.py:186-239).  Neither dependency exists in this
image, so the capability is provided self-contained: a marching-tetrahedra
surface extractor (6 tetrahedra per cell — table-free and watertight) and a
minimal binary PLY writer.
"""
from __future__ import annotations

import struct

import numpy as np

# the 6-tetrahedron decomposition of a unit cell; vertex ids are cube
# corners in (dx, dy, dz) binary order
_CUBE = np.array([
    [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
    [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1],
], dtype=np.float32)
_TETS = np.array([
    [0, 5, 1, 3], [0, 5, 3, 7], [0, 3, 2, 7],
    [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7],
], dtype=np.int32)
# triangulation of a tetrahedron by the 16 sign cases: pairs of tet-vertex
# indices whose edges cross the surface (derived, not tabulated from
# external code): case bitmask bit i set <=> corner i is inside
_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _tet_triangles(case: int):
    """Triangles (as triples of edge ids) for one tet sign case."""
    inside = [i for i in range(4) if case & (1 << i)]
    if len(inside) in (0, 4):
        return []
    cross = [e for e, (a, b) in enumerate(_TET_EDGES)
             if ((case >> a) & 1) != ((case >> b) & 1)]
    if len(cross) == 3:
        return [tuple(cross)]
    # quad case: 4 crossed edges -> two triangles; order them around the quad
    assert len(cross) == 4
    # two edges sharing a tet vertex are adjacent on the quad boundary
    def shares(e1, e2):
        return bool(set(_TET_EDGES[e1]) & set(_TET_EDGES[e2]))

    a = cross[0]
    rest = cross[1:]
    adj = [e for e in rest if shares(a, e)]
    opp = [e for e in rest if not shares(a, e)][0]
    return [(a, adj[0], opp), (a, opp, adj[1])]


_TET_TRI_TABLE = [_tet_triangles(c) for c in range(16)]


def marching_tetrahedra(volume: np.ndarray, level: float, spacing=(1.0, 1.0, 1.0),
                        origin=(0.0, 0.0, 0.0)):
    """Extract the `volume == level` surface.  Returns (verts (V,3) float32,
    faces (F,3) int32).  volume: (X, Y, Z) scalar field."""
    vol = np.asarray(volume, np.float32)
    nx, ny, nz = vol.shape
    cx, cy, cz = np.meshgrid(np.arange(nx - 1, dtype=np.int32),
                             np.arange(ny - 1, dtype=np.int32),
                             np.arange(nz - 1, dtype=np.int32), indexing="ij")
    cells = np.stack([cx, cy, cz], -1).reshape(-1, 3)

    # corner VALUES without materializing per-cell corner indices (that
    # (M, 8, 3) int tensor is ~400 MB at the default 128^3 grid): the 8
    # shifted views of the volume share storage
    vals = np.stack([vol[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
                     for dx, dy, dz in _CUBE.astype(int)], -1).reshape(-1, 8)
    # keep only cells the surface crosses
    crossing = (vals.min(1) < level) & (vals.max(1) >= level)
    cells, vals = cells[crossing], vals[crossing]

    verts, faces = [], []
    for tet in _TETS:
        tvals = vals[:, tet]  # (M, 4)
        case = ((tvals >= level) << np.arange(4)).sum(1)
        for c in range(1, 15):
            tris = _TET_TRI_TABLE[c]
            if not tris:
                continue
            m = case == c
            if not m.any():
                continue
            sub_cells = cells[m]
            sub_vals = tvals[m]
            # interpolated position on each crossed edge
            edge_pos = {}
            for e, (a, b) in enumerate(_TET_EDGES):
                va, vb = sub_vals[:, a], sub_vals[:, b]
                denom = np.where(np.abs(vb - va) < 1e-12, 1.0, vb - va)
                t = np.clip((level - va) / denom, 0.0, 1.0)
                pa = sub_cells + _CUBE[tet[a]]
                pb = sub_cells + _CUBE[tet[b]]
                edge_pos[e] = pa + t[:, None] * (pb - pa)
            for tri in tris:
                i0 = sum(len(v) for v in verts)
                verts.extend([edge_pos[tri[0]], edge_pos[tri[1]], edge_pos[tri[2]]])
                n = len(edge_pos[tri[0]])
                faces.append(np.stack([
                    i0 + np.arange(n),
                    i0 + n + np.arange(n),
                    i0 + 2 * n + np.arange(n),
                ], -1))

    if not verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    verts = np.concatenate(verts).astype(np.float32)
    faces = np.concatenate(faces).astype(np.int32)
    verts = verts * np.asarray(spacing, np.float32) + np.asarray(origin, np.float32)
    return verts, faces


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal binary-little-endian PLY writer."""
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(np.asarray(verts, "<f4").tobytes())
        face_block = np.empty((len(faces), 13), np.uint8)
        face_block[:, 0] = 3
        face_block[:, 1:] = np.asarray(faces, "<i4").view(np.uint8).reshape(len(faces), 12)
        f.write(face_block.tobytes())


def export_density_mesh(model, params, path: str, grid_size=128, level=0.005,
                        chunk_rows=8):
    """Bake the model's density on a cartesian grid spanning the aabb and
    write the `alpha == level` surface to PLY (reference: utils.py:186-239
    via train.py --export_mesh)."""
    import jax
    import jax.numpy as jnp

    from ..models.egonerf import feature2density

    aabb = model.aabb
    gs = [int(grid_size)] * 3
    axes = [np.linspace(aabb[0][d], aabb[1][d], gs[d], dtype=np.float32)
            for d in range(3)]

    def density_rows(x_vals):
        x, y, z = jnp.meshgrid(jnp.asarray(x_vals), jnp.asarray(axes[1]),
                               jnp.asarray(axes[2]), indexing="ij")
        pts = jnp.stack([x, y, z], -1).reshape(-1, 3)
        norm = model.coordinates.normalize_coord(model.coordinates.from_cartesian(pts))
        if hasattr(model, "compute_density_feature_only"):
            feat = model.compute_density_feature_only(params, norm)
        else:
            feat = model.compute_density_feature(
                params["density_planes"], params["density_lines"], norm)
        sigma = feature2density(feat, model.cfg)
        return (1.0 - jnp.exp(-sigma * model.step_size)).reshape(len(x_vals), gs[1], gs[2])

    fn = jax.jit(density_rows)
    rows = [np.asarray(fn(axes[0][i : i + chunk_rows]))
            for i in range(0, gs[0], chunk_rows)]
    alpha = np.concatenate(rows)

    spacing = (aabb[1] - aabb[0]) / (np.asarray(gs) - 1)
    verts, faces = marching_tetrahedra(alpha, level, spacing=spacing, origin=aabb[0])
    write_ply(path, verts, faces)
    print(f"exported mesh: {len(verts)} verts, {len(faces)} faces -> {path}")
    return verts, faces
