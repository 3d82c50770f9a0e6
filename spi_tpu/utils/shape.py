"""3D shape extraction: density grid -> marching cubes -> PLY.

Behavioral spec: eg3d/shape_utils.py:40-100 (convert_sdf_samples_to_ply)
plus the density sampling loop in spi/utils/video_utils.py:142-205
(gen_shapes path: 512^3 grid probed through G.sample_mixed in
max_batch chunks, sigma clipped/flipped for marching cubes).

Device part: chunked `sample_mixed` density probes (jitted, static
chunk). Host part: skimage marching cubes + a tiny PLY writer (replaces
the reference's plyfile dependency).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sample_density_grid(
    generator,
    g_params,
    ws,
    resolution: int = 128,
    box_warp: float = 1.0,
    max_batch: int = 1 << 16,
):
    """Probe sigma on a cube grid centered at the origin with side
    `box_warp` (the EG3D rendering box). Returns (R, R, R) float32."""
    half = box_warp / 2
    axis = np.linspace(-half, half, resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), axis=-1)
    pts = grid.reshape(-1, 3)

    @jax.jit
    def probe(g_params, ws, coords):
        _, sigma = generator.sample_mixed(
            g_params, ws, coords[None], jnp.zeros_like(coords)[None]
        )
        return sigma[0, :, 0]

    sigmas = np.empty((pts.shape[0],), np.float32)
    n = pts.shape[0]
    for i in range(0, n, max_batch):
        chunk = pts[i : i + max_batch]
        pad = 0
        if chunk.shape[0] < max_batch:
            pad = max_batch - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
        out = np.asarray(probe(g_params, ws, jnp.asarray(chunk)))
        sigmas[i : i + max_batch - pad] = out[: max_batch - pad]
    return sigmas.reshape(resolution, resolution, resolution)


# Each cube splits into 6 tetrahedra sharing the main diagonal (0,7).
# Corner order: bit 0 = x, bit 1 = y, bit 2 = z of the unit cube.
_TETS = np.array(
    [[0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7]]
)
_CORNER = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
    np.float32,
)
# For each of the 16 inside/outside sign patterns of a tetrahedron's 4
# vertices: the crossed edges (pairs of local vertex ids) forming 0, 1
# or 2 triangles. Standard marching-tetrahedra case table.
_TET_TRIS = {
    0b0001: [[(0, 1), (0, 2), (0, 3)]],
    0b0010: [[(1, 0), (1, 3), (1, 2)]],
    0b0100: [[(2, 0), (2, 1), (2, 3)]],
    0b1000: [[(3, 0), (3, 2), (3, 1)]],
    0b0011: [[(0, 2), (1, 2), (0, 3)], [(1, 2), (1, 3), (0, 3)]],
    0b0101: [[(0, 1), (2, 1), (0, 3)], [(2, 1), (2, 3), (0, 3)]],
    0b1001: [[(0, 1), (0, 2), (3, 1)], [(0, 2), (3, 2), (3, 1)]],
    0b0110: [[(1, 0), (2, 0), (1, 3)], [(2, 0), (2, 3), (1, 3)]],
    0b1010: [[(1, 0), (3, 0), (1, 2)], [(3, 0), (3, 2), (1, 2)]],
    0b1100: [[(2, 0), (3, 0), (2, 1)], [(3, 0), (3, 1), (2, 1)]],
}
for _pat in list(_TET_TRIS):
    # complementary pattern: same edges, reversed winding
    _TET_TRIS[0b1111 ^ _pat] = [
        [tri[0], tri[2], tri[1]] for tri in _TET_TRIS[_pat]
    ]


def marching_tetrahedra(volume: np.ndarray, level: float):
    """Isosurface of a (X, Y, Z) scalar grid via marching tetrahedra
    (table-free alternative to marching cubes; same output contract as
    skimage.measure.marching_cubes: verts in grid-index coords, faces).

    Vectorized: loops run over the 6 tets x 16 sign patterns, not over
    cells."""
    rx, ry, rz = volume.shape
    gx, gy, gz = rx - 1, ry - 1, rz - 1
    base = np.stack(
        np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # (C, 3) cell origins

    # (C, 8) corner values
    corner_vals = np.stack(
        [
            volume[
                base[:, 0] + int(c[0]), base[:, 1] + int(c[1]), base[:, 2] + int(c[2])
            ]
            for c in _CORNER
        ],
        axis=1,
    )
    inside = corner_vals > level  # (C, 8)

    verts_out = []
    for tet in _TETS:
        tv = corner_vals[:, tet]  # (C, 4)
        ti = inside[:, tet]  # (C, 4) bool
        pattern = ti[:, 0] * 1 + ti[:, 1] * 2 + ti[:, 2] * 4 + ti[:, 3] * 8
        tet_pos = base[:, None, :] + _CORNER[tet][None]  # (C, 4, 3)
        for pat, tris in _TET_TRIS.items():
            sel = np.nonzero(pattern == pat)[0]
            if sel.size == 0:
                continue
            v = tv[sel]  # (S, 4)
            p = tet_pos[sel]  # (S, 4, 3)
            for tri in tris:
                tri_pts = []
                for a, b in tri:
                    va, vb = v[:, a], v[:, b]
                    t = (level - va) / np.where(vb - va == 0, 1e-12, vb - va)
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    tri_pts.append(p[:, a] * (1 - t) + p[:, b] * t)
                verts_out.append(np.stack(tri_pts, axis=1))  # (S, 3, 3)

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    tris = np.concatenate(verts_out, axis=0)  # (T, 3, 3)
    flat = tris.reshape(-1, 3)
    # dedupe shared vertices
    keys = np.round(flat * 1e5).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    verts = np.zeros((uniq.shape[0], 3), np.float32)
    verts[inv] = flat
    faces = inv.reshape(-1, 3)
    return verts, faces


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray):
    """Minimal binary-less ASCII PLY writer (shape_utils.py:40-100
    equivalent output)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def extract_shape(
    generator,
    g_params,
    ws,
    path: str | None = None,
    resolution: int = 128,
    level: float = 10.0,
    box_warp: float = 1.0,
    max_batch: int = 1 << 16,
):
    """Density grid -> marching cubes mesh; writes PLY when `path` given.

    `level=10` matches the EG3D shape-extraction isosurface
    (video_utils.py gen_shapes / shape_utils convert_mrc default is
    sigma-space; the FFHQ checkpoints use 10)."""
    sigmas = sample_density_grid(
        generator, g_params, ws, resolution=resolution,
        box_warp=box_warp, max_batch=max_batch,
    )
    lo, hi = float(sigmas.min()), float(sigmas.max())
    level = min(max(level, lo + 1e-4), hi - 1e-4) if hi > lo else lo
    verts, faces = marching_tetrahedra(sigmas, level=level)
    # grid index -> world coords
    verts = verts / (resolution - 1) * box_warp - box_warp / 2
    if path is not None:
        write_ply(path, verts, faces)
    return verts, faces
