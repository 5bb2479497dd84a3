"""Voxelized unsigned-inside SDF + interpenetration energy.

Reproduces the semantics of the reference's CUDA voxelizer
(`sdf/sdf/csrc/sdf_cuda_kernel.cu:242-304`): on a G^3 grid over
[-1, 1]^3 with voxel centers at ``-1 + (i + 0.5) * 2/(G-1)`` (the
reference's exact, slightly-offset convention), each voxel gets

    phi = 0                          outside the mesh
    phi = min distance to surface    inside the mesh

where inside/outside is the parity of Moller-Trumbore crossings of the
ray from the voxel center toward the corner (-1,-1,-1), and distance is
the exact point-triangle distance minimized over all faces.

Two implementations:
* `sdf_grid` — pure jnp, face-chunked `lax.scan` with a running min.
  Runs on any backend; this is also the parity oracle for tests.
* `sdf_grid_pallas` — TPU Pallas kernel: voxel tiles in VMEM, faces
  streamed in chunks with per-chunk bounding-box culling, so the
  brute-force O(G^3 * F) of the reference collapses to near the
  surface-local work that actually matters.

The interpenetration energy (`collision_energy`) mirrors the inline
loss in `code/utils/fitting.py:352-394`: per-person normalized grids,
trilinear (grid_sample, align_corners=False) lookup of every person's
vertices in every other person's phi, summed and squared; phi itself is
gradient-detached exactly like the reference (`sdf/sdf/sdf.py:17-19`),
so gradients flow only through the sampling positions.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Geometry primitives (branchless, vectorized).
# ---------------------------------------------------------------------------

def point_triangle_dist_sq(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                           c: jnp.ndarray) -> jnp.ndarray:
    """Squared distance from points to triangles, fully broadcast.

    p: (..., 3); a, b, c: (..., 3) (broadcast-compatible).  Branchless
    Ericson-style closest-point classification via where-cascades.
    """
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_ab = jnp.where(jnp.abs(d1 - d3) > 1e-30, d1 - d3, 1e-30)
    v_ab = jnp.clip(d1 / denom_ab, 0.0, 1.0)

    denom_ac = jnp.where(jnp.abs(d2 - d6) > 1e-30, d2 - d6, 1e-30)
    w_ac = jnp.clip(d2 / denom_ac, 0.0, 1.0)

    num_bc = d4 - d3
    den_bc = (d4 - d3) + (d5 - d6)
    den_bc = jnp.where(jnp.abs(den_bc) > 1e-30, den_bc, 1e-30)
    w_bc = jnp.clip(num_bc / den_bc, 0.0, 1.0)

    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
    v_in = vb / denom
    w_in = vc / denom

    # Region masks (interior default; edges override; vertices last).
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    # closest point coordinates (v along ab, w along ac)
    v = v_in
    w = w_in
    v = jnp.where(on_bc, 1.0 - w_bc, v)
    w = jnp.where(on_bc, w_bc, w)
    v = jnp.where(on_ac, 0.0, v)
    w = jnp.where(on_ac, w_ac, w)
    v = jnp.where(on_ab, v_ab, v)
    w = jnp.where(on_ab, 0.0, w)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)
    v = jnp.where(in_a, 0.0, v)
    w = jnp.where(in_a, 0.0, w)

    closest = a + v[..., None] * ab + w[..., None] * ac
    diff = p - closest
    return jnp.sum(diff * diff, -1)


def ray_crossings_dir(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                      c: jnp.ndarray, d: jnp.ndarray,
                      eps: float = 1e-7) -> jnp.ndarray:
    """1 where the ray from p along direction d crosses triangle abc.

    Moller-Trumbore with the reference's bounds: u, v in [0, 1],
    u + v <= 1, t >= 0 (infinite ray), |det| > eps.
    """
    e1 = b - a
    e2 = c - a
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, -1)
    ok = jnp.abs(det) > eps
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tv = p - a
    u = jnp.sum(tv * pv, -1) * inv
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, -1) * inv
    t = jnp.sum(e2 * qv, -1) * inv
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    return hit.astype(jnp.int32)


def ray_crossings(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                  c: jnp.ndarray, dest: jnp.ndarray,
                  eps: float = 1e-7) -> jnp.ndarray:
    """Crossing test for the ray p -> (through dest), see above."""
    return ray_crossings_dir(p, a, b, c, dest - p, eps)


def voxel_centers(grid_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(G^3, 3) voxel centers in the reference's (x fastest) order."""
    G = grid_size
    dx = 2.0 / (G - 1)
    line = -1.0 + (jnp.arange(G, dtype=dtype) + 0.5) * dx
    zz, yy, xx = jnp.meshgrid(line, line, line, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)


# ---------------------------------------------------------------------------
# Grid computation.
# ---------------------------------------------------------------------------

def sdf_grid(verts: jnp.ndarray, faces: jnp.ndarray, grid_size: int = 32,
             face_chunk: int = 512) -> jnp.ndarray:
    """phi grid (G, G, G) indexed [z, y, x] — pure jnp implementation.

    verts: (V, 3) normalized to [-1, 1]^3; faces: (F, 3) int32.
    """
    G = grid_size
    centers = voxel_centers(G, verts.dtype)            # (N, 3)
    tri = verts[faces]                                 # (F, 3, 3)
    F = tri.shape[0]
    pad = (-F) % face_chunk
    if pad:
        # Padded faces: degenerate, far away -> no crossings, huge dist.
        far = jnp.full((pad, 3, 3), 1e6, tri.dtype)
        tri = jnp.concatenate([tri, far], axis=0)
    chunks = tri.reshape(-1, face_chunk, 3, 3)
    corner = jnp.asarray([-1.0, -1.0, -1.0], verts.dtype)

    def body(carry, chunk):
        min_d2, n_cross = carry
        a = chunk[:, 0][None]   # (1, C, 3)
        b = chunk[:, 1][None]
        c = chunk[:, 2][None]
        p = centers[:, None]    # (N, 1, 3)
        d2 = point_triangle_dist_sq(p, a, b, c)        # (N, C)
        hits = ray_crossings(p, a, b, c, corner[None, None])
        return (jnp.minimum(min_d2, jnp.min(d2, axis=1)),
                n_cross + jnp.sum(hits, axis=1)), None

    N = centers.shape[0]
    init = (jnp.full((N,), 1e6, verts.dtype), jnp.zeros((N,), jnp.int32))
    (min_d2, n_cross), _ = jax.lax.scan(body, init, chunks)

    # sqrt(1e6) == 1000 == the reference's min_distance init value.
    phi = jnp.where(n_cross % 2 == 1, jnp.sqrt(min_d2), 0.0)
    return phi.reshape(G, G, G)


def sdf_grid_pallas(verts: jnp.ndarray, faces: jnp.ndarray,
                    grid_size: int = 128, face_chunk: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """phi grid (G, G, G) via a Pallas TPU kernel.

    Layout: each program owns one z-slab of voxels as a (G, G) tile
    (y sublanes x x lanes).  Faces stream through VMEM in chunks; a
    per-chunk bounding box culls distance work: a chunk whose box is
    farther from the slab's box than the slab's current worst running
    min cannot improve any voxel.  Crossing parity (x/y-plane test
    against the corner ray) cannot be culled by z, so it always runs —
    it is 6 fused FMAs per face-voxel, VPU-bound but cheap.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = grid_size
    F = faces.shape[0]
    pad = (-F) % face_chunk
    tri = verts[faces]
    if pad:
        tri = jnp.concatenate(
            [tri, jnp.full((pad, 3, 3), 1e6, tri.dtype)], axis=0)
    n_chunks = tri.shape[0] // face_chunk
    # Precompute per-chunk bounding boxes on the host side of the kernel.
    boxes = jnp.stack([
        tri.reshape(n_chunks, face_chunk, 9).min(axis=1),
        tri.reshape(n_chunks, face_chunk, 9).max(axis=1)], axis=1)
    # (n_chunks, 2, 9) -> reduce xyz over the 3 triangle vertices
    lo = boxes[:, 0].reshape(n_chunks, 3, 3).min(axis=1)   # (n_chunks, 3)
    hi = boxes[:, 1].reshape(n_chunks, 3, 3).max(axis=1)
    chunk_boxes = jnp.concatenate([lo, hi], axis=1)        # (n_chunks, 6)

    dx = 2.0 / (G - 1)

    def kernel(tri_ref, boxes_ref, phi_ref):
        k = pl.program_id(0)                   # z-slab index
        cz = -1.0 + (k + 0.5) * dx
        # Voxel centers of this slab: (G, G) grids of x (lanes), y (subl).
        xi = jax.lax.broadcasted_iota(jnp.float32, (G, G), 1)
        yi = jax.lax.broadcasted_iota(jnp.float32, (G, G), 0)
        cx = -1.0 + (xi + 0.5) * dx
        cy = -1.0 + (yi + 0.5) * dx

        def chunk_body(ci, carry):
            min_d2, cross = carry
            t = tri_ref[pl.ds(ci * face_chunk, face_chunk)]  # (C, 3, 3)
            box = boxes_ref[ci]

            # Slab-to-chunk-box lower-bound distance (z only needs the
            # slab plane; xy the slab spans fully, so only z distance is
            # a valid bound for the whole tile).
            dz = jnp.maximum(box[2] - cz, jnp.maximum(cz - box[5], 0.0))
            worst = jnp.max(jnp.where(min_d2 >= 1e6, 0.0, min_d2))
            worst = jnp.maximum(worst, jnp.max(min_d2))
            skip_dist = dz * dz > worst

            ax, ay, az = t[:, 0, 0], t[:, 0, 1], t[:, 0, 2]
            bx, by, bz = t[:, 1, 0], t[:, 1, 1], t[:, 1, 2]
            gx, gy, gz = t[:, 2, 0], t[:, 2, 1], t[:, 2, 2]

            def face_loop(fi, carry2):
                min_d2_, cross_ = carry2
                a = jnp.stack([ax[fi], ay[fi], az[fi]])
                b = jnp.stack([bx[fi], by[fi], bz[fi]])
                c = jnp.stack([gx[fi], gy[fi], gz[fi]])
                p = jnp.stack([cx, cy, jnp.full_like(cx, cz)], axis=-1)
                d2 = point_triangle_dist_sq(p, a, b, c)
                hit = ray_crossings_dir(p, a, b, c, -1.0 - p)
                return (jnp.minimum(min_d2_, d2), cross_ + hit)

            def with_dist(_):
                return jax.lax.fori_loop(0, face_chunk, face_loop,
                                         (min_d2, cross))

            def crossings_only(_):
                def face_loop_x(fi, cross_):
                    a = jnp.stack([ax[fi], ay[fi], az[fi]])
                    b = jnp.stack([bx[fi], by[fi], bz[fi]])
                    c = jnp.stack([gx[fi], gy[fi], gz[fi]])
                    p = jnp.stack([cx, cy, jnp.full_like(cx, cz)],
                                  axis=-1)
                    return cross_ + ray_crossings_dir(p, a, b, c,
                                                      -1.0 - p)
                return (min_d2,
                        jax.lax.fori_loop(0, face_chunk, face_loop_x,
                                          cross))

            return jax.lax.cond(skip_dist, crossings_only, with_dist,
                                None)

        init = (jnp.full((G, G), 1e6, jnp.float32),
                jnp.zeros((G, G), jnp.int32))
        min_d2, cross = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
        phi_ref[0] = jnp.where(cross % 2 == 1, jnp.sqrt(min_d2), 0.0)

    phi = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, G), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, G, G), jnp.float32),
        interpret=interpret,
    )(tri, chunk_boxes)
    return phi


# ---------------------------------------------------------------------------
# Trilinear sampling + collision energy.
# ---------------------------------------------------------------------------

def grid_sample_trilinear(phi: jnp.ndarray, coords: jnp.ndarray
                          ) -> jnp.ndarray:
    """Sample phi (G, G, G) [z, y, x] at normalized coords (..., 3) (x,y,z).

    Matches torch `grid_sample(..., align_corners=False,
    padding_mode='zeros')`: pixel = ((coord + 1) * G - 1) / 2, trilinear
    weights, zero outside.
    """
    G = phi.shape[-1]
    pix = ((coords + 1.0) * G - 1.0) * 0.5            # (..., 3) x,y,z
    x, y, z = pix[..., 0], pix[..., 1], pix[..., 2]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0

    def gather(zi, yi, xi):
        inb = ((zi >= 0) & (zi < G) & (yi >= 0) & (yi < G) &
               (xi >= 0) & (xi < G))
        zi_c = jnp.clip(zi, 0, G - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, G - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, G - 1).astype(jnp.int32)
        return jnp.where(inb, phi[zi_c, yi_c, xi_c], 0.0)

    out = jnp.zeros(x.shape, phi.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dxi in (0, 1):
                w = (jnp.where(dxi, fx, 1 - fx) *
                     jnp.where(dy, fy, 1 - fy) *
                     jnp.where(dz, fz, 1 - fz))
                out = out + w * gather(z0 + dz, y0 + dy, x0 + dxi)
    return out


def collision_sums(verts: jnp.ndarray, faces: jnp.ndarray,
                   grid_size: int = 32,
                   use_pallas: bool = False) -> jnp.ndarray:
    """Per-person raw penetration sums s_i = sum(phi_i at all vertices).

    Mirrors `code/utils/fitting.py:352-394`: per-person box-normalized
    grid with 1.2x padding; every person's vertices sampled in every
    person's phi (self included — the reference comments out the
    self-weight zeroing at `fitting.py:374-375`).  phi is
    gradient-detached (like `sdf/sdf/sdf.py:17-19`), so gradients flow
    only through the sampling positions.  Returns (P,).
    """
    if verts.ndim == 2:
        verts = verts[None]
    P = verts.shape[0]

    boxes_min = verts.min(axis=1)                     # (P, 3)
    boxes_max = verts.max(axis=1)
    centers = 0.5 * (boxes_min + boxes_max)           # (P, 3)
    scales = 1.2 * 0.5 * jnp.max(boxes_max - boxes_min,
                                 axis=-1)             # (P,)

    grid_fn = sdf_grid_pallas if use_pallas else sdf_grid

    sums = []
    for i in range(P):
        vn = (verts[i] - centers[i]) / scales[i]
        phi = jax.lax.stop_gradient(
            grid_fn(jax.lax.stop_gradient(vn), faces, grid_size))
        local = (verts - centers[i]) / scales[i]       # (P, V, 3)
        phi_val = grid_sample_trilinear(phi, local)    # (P, V)
        sums.append(jnp.sum(phi_val))
    return jnp.stack(sums)


def collision_energy(verts: jnp.ndarray, faces: jnp.ndarray,
                     coll_weight: jnp.ndarray, grid_size: int = 32,
                     use_pallas: bool = False) -> jnp.ndarray:
    """Total interpenetration penalty: sum_i (w * s_i / P)^2."""
    s = collision_sums(verts, faces, grid_size, use_pallas)
    P = s.shape[0]
    return jnp.sum((coll_weight * s / P) ** 2)
