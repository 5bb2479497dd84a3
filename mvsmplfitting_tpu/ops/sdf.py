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

def point_triangle_closest(p: jnp.ndarray, a: jnp.ndarray,
                           b: jnp.ndarray, c: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest point on triangles + squared distance, fully broadcast.

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
    return closest, jnp.sum(diff * diff, -1)


def point_triangle_dist_sq(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                           c: jnp.ndarray) -> jnp.ndarray:
    """Squared distance from points to triangles (see
    `point_triangle_closest`)."""
    return point_triangle_closest(p, a, b, c)[1]


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


# ---------------------------------------------------------------------------
# Gridless point evaluation (the G -> infinity limit of the field).
# ---------------------------------------------------------------------------

def _face_chunks(verts, faces, face_chunk):
    """(F, 3) faces -> (F/C, C, 3, 3) padded triangle chunks."""
    tri = verts[faces]                                 # (F, 3, 3)
    F = tri.shape[0]
    pad = (-F) % face_chunk
    if pad:
        far = jnp.full((pad, 3, 3), 1e6, tri.dtype)
        tri = jnp.concatenate([tri, far], axis=0)
    return tri.reshape(-1, face_chunk, 3, 3)


def _parity_scan(points, chunks, corner):
    """Crossing counts of the ray points -> corner over all faces."""
    def body(n_cross, chunk):
        a = chunk[:, 0][None]                          # (1, C, 3)
        b = chunk[:, 1][None]
        c = chunk[:, 2][None]
        p = points[:, None]                            # (N, 1, 3)
        hits = ray_crossings(p, a, b, c, corner[None, None])
        return n_cross + jnp.sum(hits, axis=1), None

    init = jnp.zeros((points.shape[0],), jnp.int32)
    n_cross, _ = jax.lax.scan(body, init, chunks)
    return n_cross


def _dist_closest_scan(points, chunks):
    """Min squared distance to the mesh + the closest surface point."""
    def body(carry, chunk):
        min_d2, closest = carry
        a = chunk[:, 0][None]                          # (1, C, 3)
        b = chunk[:, 1][None]
        c = chunk[:, 2][None]
        p = points[:, None]                            # (N, 1, 3)
        d2 = point_triangle_dist_sq(p, a, b, c)        # (N, C)
        # Running min matches sdf_grid's bitwise; the closest point is
        # recomputed on just the per-chunk argmin face (cheap (N,)
        # work instead of materializing an (N, C, 3) closest array).
        j = jnp.argmin(d2, axis=1)                     # (N,)
        best = chunk[j]                                # (N, 3, 3)
        cl, _ = point_triangle_closest(points, best[:, 0], best[:, 1],
                                       best[:, 2])
        chunk_min = jnp.min(d2, axis=1)
        upd = chunk_min < min_d2
        return (jnp.where(upd, chunk_min, min_d2),
                jnp.where(upd[:, None], cl, closest)), None

    N = points.shape[0]
    init = (jnp.full((N,), 1e6, points.dtype),
            jnp.zeros((N, 3), points.dtype))
    (min_d2, closest), _ = jax.lax.scan(body, init, chunks)
    return min_d2, closest


# Static work-budget TIERS for the culled evaluation.  Exactness does
# not depend on them — each phase picks the smallest tier that holds
# its count via a lax.cond ladder, and falls back to the full
# evaluation when every tier overflows.  Tiers exist because top_k
# gathers always pay for the full budget: two overlapping SMPL bodies
# typically have only O(100) of one body's vertices inside the other's
# AABB, so a single generous budget would burn ~60x the needed work.
_CAND_BUDGETS = (1024, 8192)
_INSIDE_BUDGETS = (256, 2048)


def _tiers(budgets, N):
    """Ascending tier sizes strictly below N (int or tuple input)."""
    if isinstance(budgets, int):
        budgets = (budgets,)
    return sorted({int(k) for k in budgets if k < N})


def _tiered_eval(count, tiers, branch_for, full_branch):
    """Nested lax.cond ladder: run the smallest tier with count <= K,
    else the full evaluation."""
    def build(i):
        if i == len(tiers):
            return full_branch
        K = tiers[i]
        nxt = build(i + 1)
        return lambda _: jax.lax.cond(count <= K, branch_for(K),
                                      nxt, None)
    return build(0)(None)


def _sdf_at_points_impl(points, verts, faces, face_chunk=512,
                        cand_budget=_CAND_BUDGETS,
                        inside_budget=_INSIDE_BUDGETS):
    """phi + closest surface point + inside flag at query points.

    Same field as `sdf_grid` (`sdf_cuda_kernel.cu:242-304` semantics:
    unsigned distance inside, 0 outside, parity ray toward the corner
    (-1,-1,-1)) evaluated EXACTLY at arbitrary points instead of voxel
    centers — no grid, no trilinear approximation.  points: (N, 3);
    verts: (V, 3) in the same normalized frame as `sdf_grid` input;
    faces: (F, 3).  Returns (phi (N,), closest (N, 3), inside (N,)).

    Cost shape (the round-3 rework): the brute force is O(N*F) with
    ~120 flop/pair.  Three exact reductions are applied in order:

    1. AABB candidate cull — a point outside the mesh's axis-aligned
       bounding box is outside the mesh, hence phi = 0 by convention,
       with NO ray test needed.  Candidates are gathered (top_k) to
       the smallest `cand_budget` tier that holds them, so shapes stay
       fixed under jit while the work tracks the actual overlap size.
    2. Parity-only first pass (~40 flop/pair Moller-Trumbore) decides
       inside/outside for the candidates; the expensive closest-point
       classification (~80 flop/pair) is NOT run here.
    3. Distance pass only for the points actually inside (gathered to
       an `inside_budget` tier) — outside points have phi = 0 and
       never need a distance.

    If a frame's candidate / inside count exceeds every tier, that
    phase falls back to the full evaluation via `lax.cond`, so results
    are exact for every input (and bitwise-equal to the uncull path
    for each surviving point: identical per-point chunk arithmetic).
    NOTE: do not vmap directly over this function — `lax.cond` under
    vmap runs ALL branches (jacfwd/linearize through the custom JVP
    of `sdf_at_points` is fine: the primal runs unbatched there).
    """
    N = points.shape[0]
    chunks = _face_chunks(verts, faces, face_chunk)
    corner = jnp.asarray([-1.0, -1.0, -1.0], verts.dtype)

    cand_tiers = _tiers(cand_budget, N)
    inside_tiers = _tiers(inside_budget, N)

    def parity_full(_):
        return _parity_scan(points, chunks, corner)

    if cand_tiers:
        bmin = verts.min(axis=0) - 1e-6
        bmax = verts.max(axis=0) + 1e-6
        cand = jnp.all((points >= bmin) & (points <= bmax), axis=-1)

        def parity_at(K):
            def f(_):
                _, idx = jax.lax.top_k(cand.astype(points.dtype), K)
                ncr = _parity_scan(points[idx], chunks, corner)
                # Non-candidates are outside the AABB -> outside the
                # mesh: leaving their count at 0 (even) is exact.
                return jnp.zeros((N,), jnp.int32).at[idx].set(ncr)
            return f

        n_cross = _tiered_eval(jnp.sum(cand), cand_tiers,
                               parity_at, parity_full)
    else:
        n_cross = parity_full(None)
    inside = n_cross % 2 == 1

    def dist_full(_):
        min_d2, cl = _dist_closest_scan(points, chunks)
        return jnp.where(inside, jnp.sqrt(min_d2), 0.0), cl

    if inside_tiers:
        def dist_at(K):
            def f(_):
                _, idx = jax.lax.top_k(inside.astype(points.dtype), K)
                d2, cl = _dist_closest_scan(points[idx], chunks)
                phi = jnp.zeros((N,), points.dtype).at[idx].set(
                    jnp.where(inside[idx], jnp.sqrt(d2), 0.0))
                # Outside points keep closest = 0; the JVP only reads
                # closest where inside & phi > 1e-5.
                closest = jnp.zeros((N, 3),
                                    points.dtype).at[idx].set(cl)
                return phi, closest
            return f

        phi, closest = _tiered_eval(jnp.sum(inside), inside_tiers,
                                    dist_at, dist_full)
    else:
        phi, closest = dist_full(None)
    return phi, closest, inside


@jax.custom_jvp
def sdf_at_points(points: jnp.ndarray, verts: jnp.ndarray,
                  faces: jnp.ndarray) -> jnp.ndarray:
    """Exact phi at query points — the gridless limit of `sdf_grid`.

    Differentiation contract (mirrors the reference's detached-phi
    `grid_sample` backward, `sdf/sdf/sdf.py:17-19` +
    `code/utils/fitting.py:379-388`): the FIELD is a constant — the
    tangent in `verts` is deliberately ignored — and the tangent in
    `points` is the analytic spatial gradient, (p - closest)/|p -
    closest| inside and 0 outside, which is what the trilinear
    gradient of the detached grid converges to as G -> infinity.
    The custom JVP makes each Jacobian column a dot product instead
    of a replay of the face scan.
    """
    return _sdf_at_points_impl(points, verts, faces)[0]


@sdf_at_points.defjvp
def _sdf_at_points_jvp(primals, tangents):
    points, verts, faces = primals
    pt = tangents[0]
    phi, closest, inside = _sdf_at_points_impl(points, verts, faces)
    # Points ON the surface (a person's own vertices in their own
    # field) have p ~= closest with phi ~= 0: the quotient would
    # amplify fp noise into enormous garbage gradients, so gate on a
    # meaningfully-positive depth (their phi contribution is ~0
    # anyway).  The unit direction is exact elsewhere.
    live = inside & (phi > 1e-5)
    g = jnp.where(live[:, None],
                  (points - closest) / jnp.maximum(phi, 1e-5)[:, None],
                  0.0)
    return phi, jnp.sum(g * pt, axis=-1)


def _lane_tile(N: int, max_lanes: int = 4096) -> int:
    """Largest divisor of N that is <= max_lanes (lane-axis tile)."""
    if N <= max_lanes:
        return N
    for t in range(2, N + 1):
        if N % t == 0 and N // t <= max_lanes:
            return N // t
    return 1


def _dot3(ux, uy, uz, vx, vy, vz):
    return ux * vx + uy * vy + uz * vz


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) > 1e-30, b, 1e-30)


def _chunk_min_dist_sq(t, px, py, pz):
    """min over the chunk's faces of point-triangle d^2 — (1, L).

    t: (C, 9) per-face vertex components; px/py/pz: (1, L) voxel
    coords.  Componentwise Ericson closest-point classification,
    identical math to `point_triangle_dist_sq`.
    """
    ax, ay, az = t[:, 0:1], t[:, 1:2], t[:, 2:3]
    bx, by, bz = t[:, 3:4], t[:, 4:5], t[:, 5:6]
    gx, gy, gz = t[:, 6:7], t[:, 7:8], t[:, 8:9]

    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = gx - ax, gy - ay, gz - az
    apx, apy, apz = px - ax, py - ay, pz - az
    d1 = _dot3(abx, aby, abz, apx, apy, apz)
    d2_ = _dot3(acx, acy, acz, apx, apy, apz)
    bpx, bpy, bpz = px - bx, py - by, pz - bz
    d3 = _dot3(abx, aby, abz, bpx, bpy, bpz)
    d4 = _dot3(acx, acy, acz, bpx, bpy, bpz)
    cpx, cpy, cpz = px - gx, py - gy, pz - gz
    d5 = _dot3(abx, aby, abz, cpx, cpy, cpz)
    d6 = _dot3(acx, acy, acz, cpx, cpy, cpz)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2_ - d1 * d6
    vc = d1 * d4 - d3 * d2_

    v_ab = jnp.clip(_safe_div(d1, d1 - d3), 0.0, 1.0)
    w_ac = jnp.clip(_safe_div(d2_, d2_ - d6), 0.0, 1.0)
    w_bc = jnp.clip(_safe_div(d4 - d3, (d4 - d3) + (d5 - d6)),
                    0.0, 1.0)
    denom = va + vb + vc
    v = _safe_div(vb, denom)
    w = _safe_div(vc, denom)

    in_a = (d1 <= 0) & (d2_ <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2_ >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

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

    qx = ax + v * abx + w * acx - px
    qy = ay + v * aby + w * acy - py
    qz = az + v * abz + w * acz - pz
    d2_full = qx * qx + qy * qy + qz * qz            # (C, L)
    return jnp.min(d2_full, axis=0, keepdims=True)   # (1, L)


def _chunk_crossings(t, px, py, pz):
    """Moller-Trumbore crossings toward (-1,-1,-1) — (1, L) int32."""
    ax, ay, az = t[:, 0:1], t[:, 1:2], t[:, 2:3]
    bx, by, bz = t[:, 3:4], t[:, 4:5], t[:, 5:6]
    gx, gy, gz = t[:, 6:7], t[:, 7:8], t[:, 8:9]
    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = gx - ax, gy - ay, gz - az

    dxr, dyr, dzr = -1.0 - px, -1.0 - py, -1.0 - pz
    pvx = dyr * acz - dzr * acy
    pvy = dzr * acx - dxr * acz
    pvz = dxr * acy - dyr * acx
    det = _dot3(abx, aby, abz, pvx, pvy, pvz)
    ok = jnp.abs(det) > 1e-7
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvx, tvy, tvz = px - ax, py - ay, pz - az
    u = _dot3(tvx, tvy, tvz, pvx, pvy, pvz) * inv
    qvx = tvy * abz - tvz * aby
    qvy = tvz * abx - tvx * abz
    qvz = tvx * aby - tvy * abx
    vv = _dot3(dxr, dyr, dzr, qvx, qvy, qvz) * inv
    tt = _dot3(acx, acy, acz, qvx, qvy, qvz) * inv
    hit = (ok & (u >= 0) & (u <= 1) & (vv >= 0) & (u + vv <= 1) &
           (tt >= 0))
    return jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)


def sdf_grid_pallas(verts: jnp.ndarray, faces: jnp.ndarray,
                    grid_size: int = 32, face_chunk: Optional[int] = None,
                    interpret: bool = False,
                    _max_lanes: int = 4096) -> jnp.ndarray:
    """phi grid (G, G, G) via a Pallas TPU kernel.

    Layout: grid = (z-slabs, voxel lane-tiles).  Each program owns one
    lane-tile of a z-slab's voxels *flattened into the lane axis* —
    tensors are (C faces x L voxels), so faces broadcast along sublanes
    and voxel coordinates come from a lane-axis iota.  All face math is
    vectorized VPU arithmetic — no scalar face loops (those don't
    lower).  The ENTIRE face table sits in VMEM once (13776 faces x 9
    floats ~ 0.5 MB) and a `fori_loop` streams it chunk-by-chunk with a
    carried running min-distance / crossing-parity pair; the parity ->
    phi combine happens on the XLA side.

    Compared to putting the face chunks on the pipeline grid (the r1
    design), this keeps the Mosaic grid tiny — (G, N/L) programs, 512
    at G=128 instead of >100k pipeline steps, which is what blew up the
    tunnel's AOT helper at the reference's production grid 128
    (`code/utils/fitting.py:374`).

    C is sized so the ~18 (C, L) fp32 temporaries of the distance
    computation stay inside the 32M scoped-VMEM budget requested below.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = grid_size
    N = G * G
    L = _lane_tile(N, _max_lanes)
    T = N // L                                          # lane tiles/slab
    if face_chunk is None:
        face_chunk = max(8, min(128, (1 << 18) // L))
    F = faces.shape[0]
    pad = (-F) % face_chunk
    tri = verts[faces]                                  # (F, 3, 3)
    if pad:
        # Padded faces: degenerate, far away -> no crossings, huge dist.
        tri = jnp.concatenate(
            [tri, jnp.full((pad, 3, 3), 1e6, tri.dtype)], axis=0)
    n_chunks = tri.shape[0] // face_chunk
    # Per-face vertex components as 9 sublane-major columns, chunked
    # along a leading axis (leading-axis dynamic indexing is a plain
    # address offset in Mosaic; sublane-axis dynamic slices are not).
    tri_flat = tri.reshape(n_chunks, face_chunk, 9)

    dx = 2.0 / (G - 1)
    C = face_chunk

    def kernel(tri_ref, min_ref, cross_ref):
        k = pl.program_id(0)                    # z-slab
        t_id = pl.program_id(1)                 # lane tile within slab
        cz = -1.0 + (k.astype(jnp.float32) + 0.5) * dx
        lane = (jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
                + t_id * L)
        px = -1.0 + ((lane % G).astype(jnp.float32) + 0.5) * dx
        py = -1.0 + ((lane // G).astype(jnp.float32) + 0.5) * dx
        pz = jnp.full_like(px, cz)              # (1, L)

        def chunk_body(c, carry):
            run_min, run_cross = carry
            t = tri_ref[c]                      # (C, 9)
            d2_min = _chunk_min_dist_sq(t, px, py, pz)
            hits = _chunk_crossings(t, px, py, pz)
            return (jnp.minimum(run_min, d2_min), run_cross + hits)

        init = (jnp.full((1, L), 1e6, jnp.float32),
                jnp.zeros((1, L), jnp.int32))
        run_min, run_cross = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                               init)
        min_ref[0] = run_min
        cross_ref[0] = run_cross

    min_d2, cross = pl.pallas_call(
        kernel,
        grid=(G, T),
        in_specs=[
            # Whole face table resident in VMEM for every program.
            pl.BlockSpec((n_chunks, C, 9), lambda k, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, L), lambda k, t: (k * T + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda k, t: (k * T + t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G * T, 1, L), jnp.float32),
            jax.ShapeDtypeStruct((G * T, 1, L), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(tri_flat)
    phi = jnp.where(cross % 2 == 1, jnp.sqrt(min_d2), 0.0)
    return phi.reshape(G, G, G)


def sdf_grid_pallas_fast(verts: jnp.ndarray, faces: jnp.ndarray,
                         grid_size: int = 32,
                         face_chunk: Optional[int] = None,
                         interpret: bool = False,
                         cull: bool = True,
                         _max_lanes: int = 1024,
                         _visit_all: bool = False) -> jnp.ndarray:
    """Two-phase voxelizer: crossings first, distance only where needed.

    BIT-EXACT with `sdf_grid_pallas` by construction: phi is zero at
    every outside voxel (`sdf_cuda_kernel.cu:300-303`), so the exact
    point-triangle distance pass only has to run for voxel tiles that
    contain at least one INSIDE voxel.  Phase A computes crossing
    parity for all voxels; an XLA reduction derives per-tile inside
    flags; phase B runs the distance chunk loop under `@pl.when(flag)`
    so dead tiles (the vast majority — the body occupies a few % of
    the grid volume) skip all face work.  Tiles default smaller here
    (1024 lanes) so the gating is fine-grained even at small G.

    ``cull=True`` adds exact face-chunk culling on top (faces are
    y-sorted so chunk AABBs are tight bands; fp min / integer sums are
    order-independent, so reordering keeps bit-exactness):

    * phase A: the reference's parity ray runs from the voxel center
      through the grid corner (-1,-1,-1) with t >= 0
      (`sdf_cuda_kernel.cu`, `ray_crossings_dir`), so every ray point
      has y <= py and z <= pz — a chunk whose y_min exceeds the
      tile's max y (a contiguous sorted prefix) or whose z_min
      exceeds the slice z can never be crossed;
    * phase B: chunks are visited in per-tile lower-bound order
      (y/z-gap of the chunk AABB vs the tile band); the loop stops as
      soon as the next bound exceeds the running WORST inside-lane
      minimum — the remaining chunks provably cannot improve any
      inside voxel, and outside voxels' phi is zeroed anyway.
    Small fp margins on every bound keep the culls strictly
    conservative.  ``_visit_all=True`` disables only the early-exit
    gate (same loop form): the tests assert the gated result is
    BITWISE equal to it, isolating the culling claim from compiler
    FMA contraction — `lax.fori_loop` vs `lax.while_loop` bodies of
    the identical distance math compile with different mul+add
    fusion (measured <= ~4e-6 relative), so cull on/off compare
    within that tolerance, not bitwise.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = grid_size
    N = G * G
    L = _lane_tile(N, _max_lanes)
    T = N // L
    if face_chunk is None:
        face_chunk = max(8, min(128, (1 << 18) // L))
    F = faces.shape[0]
    pad = (-F) % face_chunk
    tri = verts[faces]
    if cull:
        # Sort faces by y centroid so chunk AABBs are tight y bands.
        order = jnp.argsort(tri[:, :, 1].mean(axis=1))
        tri = tri[order]
    if pad:
        tri = jnp.concatenate(
            [tri, jnp.full((pad, 3, 3), 1e6, tri.dtype)], axis=0)
    n_chunks = tri.shape[0] // face_chunk
    tri_flat = tri.reshape(n_chunks, face_chunk, 9)

    dx = 2.0 / (G - 1)
    C = face_chunk
    MARGIN = 1e-4     # fp-safety slack on every cull bound

    def coords(k, t_id):
        cz = -1.0 + (k.astype(jnp.float32) + 0.5) * dx
        lane = (jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
                + t_id * L)
        px = -1.0 + ((lane % G).astype(jnp.float32) + 0.5) * dx
        py = -1.0 + ((lane // G).astype(jnp.float32) + 0.5) * dx
        return px, py, jnp.full_like(px, cz)

    # --- chunk AABBs + tile bands (all XLA one-offs) -----------------
    tri3 = tri_flat.reshape(n_chunks, C, 3, 3)
    cy0 = tri3[..., 1].min(axis=(1, 2))              # (nc,)
    cy1 = tri3[..., 1].max(axis=(1, 2))
    cz0 = tri3[..., 2].min(axis=(1, 2))
    cz1 = tri3[..., 2].max(axis=(1, 2))
    z_line = -1.0 + (jnp.arange(G, dtype=jnp.float32) + 0.5) * dx
    # Tile t covers lanes [tL, (t+1)L) -> y rows lane//G (tiles need
    # not start on row boundaries when L % G != 0).
    lane0 = jnp.arange(T) * L
    ty0 = -1.0 + ((lane0 // G).astype(jnp.float32) + 0.5) * dx
    ty1 = -1.0 + (((lane0 + L - 1) // G).astype(jnp.float32)
                  + 0.5) * dx                        # (T,) band y max

    if cull:
        # Phase A: conservative contiguous prefix over y-sorted chunks
        # (last index whose y_min can still be crossed), plus a per-
        # slice z mask.
        can_y = cy0[None, :] <= ty1[:, None] + MARGIN       # (T, nc)
        ny = jnp.max(jnp.where(
            can_y, jnp.arange(n_chunks, dtype=jnp.int32) + 1, 0),
            axis=1).reshape(T, 1)                           # (T, 1)
        # Cull tables are (slice/tile, chunk, 1)-shaped with block
        # (1, nc, 1): Mosaic requires a block's trailing two dims to
        # be (8, 128)-divisible or EQUAL to the array's (VMEM and
        # SMEM alike), and rejects dynamic indices on the lane (last)
        # dim — so the grid slices the leading dim and the dynamic
        # chunk counter indexes SUBLANES (the same proven pattern as
        # `flag_ref[i, 0]` / the (1, 1, L) out blocks).
        zmask = (cz0[None, :] <= z_line[:, None] + MARGIN
                 ).astype(jnp.int32)[..., None]             # (G, nc, 1)

        # Phase B: per-tile (k, t) chunk lower bounds + visit order.
        ygap = jnp.maximum(jnp.maximum(cy0[None, :] - ty1[:, None],
                                       ty0[:, None] - cy1[None, :]),
                           0.0)                             # (T, nc)
        zgap = jnp.maximum(jnp.maximum(cz0[None, :] - z_line[:, None],
                                       z_line[:, None] - cz1[None, :]),
                           0.0)                             # (G, nc)
        lb2 = (ygap[None, :, :] ** 2
               + zgap[:, None, :] ** 2).reshape(G * T, n_chunks)
        chunk_order = jnp.argsort(lb2, axis=1).astype(jnp.int32)
        lb2_sorted = jnp.take_along_axis(lb2, chunk_order, axis=1)
        # (G*T, nc+1, 1) with a +inf/0 guard column so the
        # while_loop's final cond read at c == n_chunks stays in
        # bounds (see the zmask layout note above).
        chunk_order = jnp.concatenate(
            [chunk_order,
             jnp.zeros((G * T, 1), jnp.int32)], axis=1)[..., None]
        lb2_sorted = jnp.concatenate(
            [lb2_sorted,
             jnp.full((G * T, 1), jnp.inf, lb2.dtype)],
            axis=1)[..., None]

    def cross_kernel(*refs):
        if cull:
            ny_ref, zmask_ref, tri_ref, cross_ref = refs
        else:
            tri_ref, cross_ref = refs
        k, t_id = pl.program_id(0), pl.program_id(1)
        px, py, pz = coords(k, t_id)

        if cull:
            def body(c, run):
                @pl.when(zmask_ref[0, c, 0] > 0)
                def _compute():
                    run_ref[0] = (run_ref[0]
                                  + _chunk_crossings(tri_ref[c],
                                                     px, py, pz))
                return run

            # fori_loop carries nothing mutable across pl.when, so use
            # the output ref as the accumulator directly.
            run_ref = cross_ref
            run_ref[0] = jnp.zeros((1, L), jnp.int32)
            jax.lax.fori_loop(0, ny_ref[t_id, 0], body, 0)
        else:
            def body(c, run):
                return run + _chunk_crossings(tri_ref[c], px, py, pz)

            cross_ref[0] = jax.lax.fori_loop(
                0, n_chunks, body, jnp.zeros((1, L), jnp.int32))

    cross_in_specs = [pl.BlockSpec((n_chunks, C, 9),
                                   lambda k, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM)]
    cross_args = [tri_flat]
    if cull:
        cross_in_specs = [
            pl.BlockSpec((T, 1), lambda k, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, 1), lambda k, t: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + cross_in_specs
        cross_args = [ny, zmask] + cross_args

    cross = pl.pallas_call(
        cross_kernel,
        grid=(G, T),
        in_specs=cross_in_specs,
        out_specs=pl.BlockSpec((1, 1, L), lambda k, t: (k * T + t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * T, 1, L), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*cross_args)

    inside = (cross % 2 == 1)                        # (G*T, 1, L)
    flags = inside.any(axis=(1, 2)).astype(jnp.int32)[:, None]

    def dist_kernel(*refs):
        if cull:
            (flag_ref, order_ref, lb_ref, inside_ref, tri_ref,
             min_ref) = refs
        else:
            flag_ref, tri_ref, min_ref = refs
        k, t_id = pl.program_id(0), pl.program_id(1)
        px, py, pz = coords(k, t_id)
        min_ref[0] = jnp.full((1, L), 1e6, jnp.float32)

        @pl.when(flag_ref[k * T + t_id, 0] > 0)
        def _():
            if not cull:
                def body(c, run):
                    return jnp.minimum(
                        run, _chunk_min_dist_sq(tri_ref[c], px, py, pz))

                min_ref[0] = jax.lax.fori_loop(
                    0, n_chunks, body,
                    jnp.full((1, L), 1e6, jnp.float32))
                return

            ins = inside_ref[0] > 0                    # (1, L)

            def cond(carry):
                c, m, worst = carry
                # Chunks are LB-sorted per tile: once the next bound
                # exceeds the worst inside-lane minimum (with fp
                # slack), no later chunk can improve any inside lane.
                # (The tables are chunk-major; this tile's column is
                # block-sliced, and row n_chunks is the +inf guard.)
                return (c < n_chunks) & (
                    (lb_ref[0, c, 0] < worst * (1.0 + 1e-4) + 1e-9)
                    | _visit_all)

            def body(carry):
                c, m, _ = carry
                d2 = _chunk_min_dist_sq(tri_ref[order_ref[0, c, 0]],
                                        px, py, pz)
                m = jnp.minimum(m, d2)
                worst = jnp.max(jnp.where(ins, m, 0.0))
                return c + 1, m, worst

            m0 = jnp.full((1, L), 1e6, jnp.float32)
            _, m, _ = jax.lax.while_loop(
                cond, body, (jnp.zeros((), jnp.int32), m0,
                             jnp.asarray(1e6, jnp.float32)))
            min_ref[0] = m

    dist_in_specs = [
        # Whole flag vector resident in VMEM (per-tile (1,1) SMEM
        # blocks violate Mosaic's block rules, and SMEM is already
        # at capacity at G=128's 2048 tiles).
        pl.BlockSpec((G * T, 1), lambda k, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dist_args = [flags]
    if cull:
        dist_in_specs += [
            pl.BlockSpec((1, n_chunks + 1, 1),
                         lambda k, t: (k * T + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks + 1, 1),
                         lambda k, t: (k * T + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda k, t: (k * T + t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        dist_args += [chunk_order, lb2_sorted,
                      inside.astype(jnp.int32)]
    dist_in_specs.append(
        pl.BlockSpec((n_chunks, C, 9), lambda k, t: (0, 0, 0),
                     memory_space=pltpu.VMEM))
    dist_args.append(tri_flat)

    min_d2 = pl.pallas_call(
        dist_kernel,
        grid=(G, T),
        in_specs=dist_in_specs,
        out_specs=pl.BlockSpec((1, 1, L), lambda k, t: (k * T + t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * T, 1, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*dist_args)

    phi = jnp.where(inside, jnp.sqrt(min_d2), 0.0)
    return phi.reshape(G, G, G)


# ---------------------------------------------------------------------------
# Trilinear sampling + collision energy.
# ---------------------------------------------------------------------------

def _trilinear_corners(phi: jnp.ndarray, coords: jnp.ndarray):
    """Shared gather stage: corner values + fractional offsets.

    Returns (vals[8], fx, fy, fz) with vals ordered (dz, dy, dx) in
    binary counting order; out-of-bounds corners contribute 0
    (padding_mode='zeros').
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

    vals = [gather(z0 + dz, y0 + dy, x0 + dxi)
            for dz in (0, 1) for dy in (0, 1) for dxi in (0, 1)]
    return vals, fx, fy, fz


@jax.custom_jvp
def grid_sample_trilinear(phi: jnp.ndarray, coords: jnp.ndarray
                          ) -> jnp.ndarray:
    """Sample phi (G, G, G) [z, y, x] at normalized coords (..., 3) (x,y,z).

    Matches torch `grid_sample(..., align_corners=False,
    padding_mode='zeros')`: pixel = ((coord + 1) * G - 1) / 2, trilinear
    weights, zero outside.

    Carries a custom JVP: the tangent in `coords` is the analytic
    trilinear spatial gradient (the same 8 gathered corner values
    recombined with weight derivatives, x G/2 for the pixel scaling),
    so Jacobian columns through the collision term reuse the primal
    gathers instead of re-tracing the sample — this is the
    "custom-VJP trilinear sampler" that keeps the multi-person SDF
    Jacobian cheap (torch analogue: grid_sample's backward).
    """
    vals, fx, fy, fz = _trilinear_corners(phi, coords)
    out = jnp.zeros(fx.shape, phi.dtype)
    i = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dxi in (0, 1):
                w = (jnp.where(dxi, fx, 1 - fx) *
                     jnp.where(dy, fy, 1 - fy) *
                     jnp.where(dz, fz, 1 - fz))
                out = out + w * vals[i]
                i += 1
    return out


def _grid_sample_trilinear_jvp(primals, tangents):
    phi, coords = primals
    dphi, dcoords = tangents
    G = phi.shape[-1]

    vals, fx, fy, fz = _trilinear_corners(phi, coords)
    out = jnp.zeros(fx.shape, phi.dtype)
    gx = jnp.zeros_like(out)
    gy = jnp.zeros_like(out)
    gz = jnp.zeros_like(out)
    i = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dxi in (0, 1):
                wx = jnp.where(dxi, fx, 1 - fx)
                wy = jnp.where(dy, fy, 1 - fy)
                wz = jnp.where(dz, fz, 1 - fz)
                sx = jnp.where(dxi, 1.0, -1.0)
                sy = jnp.where(dy, 1.0, -1.0)
                sz = jnp.where(dz, 1.0, -1.0)
                v = vals[i]
                out = out + wx * wy * wz * v
                gx = gx + sx * wy * wz * v
                gy = gy + wx * sy * wz * v
                gz = gz + wx * wy * sz * v
                i += 1

    # d pixel / d coord = G / 2 (align_corners=False).
    if isinstance(dcoords, jax.custom_derivatives.SymbolicZero):
        tangent = jnp.zeros_like(out)
    else:
        scale = 0.5 * G
        tangent = scale * (gx * dcoords[..., 0] + gy * dcoords[..., 1] +
                           gz * dcoords[..., 2])
    # phi tangent: same trilinear weights over dphi (zero in the
    # fitting path, where phi is stop-gradient'ed like the reference).
    if not isinstance(dphi, jax.custom_derivatives.SymbolicZero):
        dvals, _, _, _ = _trilinear_corners(dphi, coords)
        i = 0
        for dz in (0, 1):
            for dy in (0, 1):
                for dxi in (0, 1):
                    w = (jnp.where(dxi, fx, 1 - fx) *
                         jnp.where(dy, fy, 1 - fy) *
                         jnp.where(dz, fz, 1 - fz))
                    tangent = tangent + w * dvals[i]
                    i += 1
    return out, tangent


grid_sample_trilinear.defjvp(_grid_sample_trilinear_jvp,
                             symbolic_zeros=True)


def person_grids(verts: jnp.ndarray, faces: jnp.ndarray,
                 grid_size: int = 32,
                 use_pallas: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Voxelize each person's mesh into its box-normalized phi grid.

    Returns (phi (P, G, G, G), centers (P, 3), scales (P,)) with the
    reference's 1.2x-padded normalization (`code/utils/fitting.py:
    369-378`).  phi is NOT detached here — callers apply
    `stop_gradient` (the lagged-LM aux path does it wholesale).
    """
    if verts.ndim == 2:
        verts = verts[None]
    P = verts.shape[0]
    boxes_min = verts.min(axis=1)                     # (P, 3)
    boxes_max = verts.max(axis=1)
    centers = 0.5 * (boxes_min + boxes_max)           # (P, 3)
    scales = 1.2 * 0.5 * jnp.max(boxes_max - boxes_min,
                                 axis=-1)             # (P,)
    # The two-phase kernel is bit-exact with the single-phase one and
    # 1.2x/3.8x/4.9x faster at G=32/64/128 (measured on chip).
    grid_fn = sdf_grid_pallas_fast if use_pallas else sdf_grid
    phis = [grid_fn((verts[i] - centers[i]) / scales[i], faces,
                    grid_size) for i in range(P)]
    return jnp.stack(phis), centers, scales


def collision_sums_sampled(phi: jnp.ndarray, centers: jnp.ndarray,
                           scales: jnp.ndarray, verts: jnp.ndarray
                           ) -> jnp.ndarray:
    """s_i = sum over ALL persons' vertices of phi_i at those vertices.

    phi: (P, G, G, G); verts: (P, V, 3).  Every person's vertices are
    sampled in every person's grid (self included — the reference
    comments out the self-weight zeroing, `fitting.py:374-375`).
    """
    P = phi.shape[0]
    sums = []
    for i in range(P):
        local = (verts - centers[i]) / scales[i]       # (P, V, 3)
        sums.append(jnp.sum(grid_sample_trilinear(phi[i], local)))
    return jnp.stack(sums)


def collision_sums(verts: jnp.ndarray, faces: jnp.ndarray,
                   grid_size: int = 32,
                   use_pallas: bool = False) -> jnp.ndarray:
    """Per-person raw penetration sums s_i = sum(phi_i at all vertices).

    Mirrors `code/utils/fitting.py:352-394`: per-person box-normalized
    grid with 1.2x padding; every person's vertices sampled in every
    person's phi.  phi is gradient-detached (like `sdf/sdf/sdf.py:
    17-19`), so gradients flow only through the sampling positions
    (including the box normalization of the sample coordinates).
    Returns (P,).
    """
    if verts.ndim == 2:
        verts = verts[None]
    phi, centers, scales = person_grids(
        jax.lax.stop_gradient(verts), faces, grid_size, use_pallas)
    phi = jax.lax.stop_gradient(phi)
    # Sample coordinates keep live gradients: recompute the box frame
    # from the LIVE verts (the reference normalizes with grad-carrying
    # min/max there too).
    boxes_min = verts.min(axis=1)
    boxes_max = verts.max(axis=1)
    centers_live = 0.5 * (boxes_min + boxes_max)
    scales_live = 1.2 * 0.5 * jnp.max(boxes_max - boxes_min, axis=-1)
    return collision_sums_sampled(phi, centers_live, scales_live, verts)


def collision_sums_points(verts: jnp.ndarray, faces: jnp.ndarray,
                          include_self: bool = False) -> jnp.ndarray:
    """`collision_sums` in the G -> infinity limit: exact phi (no
    voxel grid) evaluated directly at every person's vertices via
    `sdf_at_points`.

    Same semantics as the grid path (`code/utils/fitting.py:352-394`):
    per-person 1.2x-padded box-normalized frame, field geometry
    gradient-detached, query coordinates (incl. the live box frame)
    carrying the gradient.  ~150x less work than voxelizing a 128^3
    grid per evaluation — this is what makes exact-semantics joint
    refinement affordable on chip (`docs/BENCH_NOTES.md` r3).

    Self queries: the reference samples every person's vertices in
    every person's grid INCLUDING their own (the self-weight zeroing
    is commented out, `fitting.py:374-375`), but a body's own vertices
    lie ON its surface, where the exact field is identically 0 (phi is
    continuous, 0 on and outside the boundary — this holds even for
    self-intersecting poses, since an on-surface point has distance 0
    to the nearest surface regardless of crossing parity).  The grid
    form's large self-contribution is purely a trilinear
    discretization artifact that vanishes as G -> infinity, so the
    default skips the self queries: exact in the limit semantics and
    ~P/(P-1)x cheaper.  `include_self=True` restores the literal
    everyone-in-everyone query set (values differ only by fp dust).
    Returns (P,).
    """
    if verts.ndim == 2:
        verts = verts[None]
    P, V, _ = verts.shape
    field_verts = jax.lax.stop_gradient(verts)
    det_min = field_verts.min(axis=1)
    det_max = field_verts.max(axis=1)
    centers_det = 0.5 * (det_min + det_max)
    scales_det = 1.2 * 0.5 * jnp.max(det_max - det_min, axis=-1)
    boxes_min = verts.min(axis=1)
    boxes_max = verts.max(axis=1)
    centers_live = 0.5 * (boxes_min + boxes_max)
    scales_live = 1.2 * 0.5 * jnp.max(boxes_max - boxes_min, axis=-1)
    sums = []
    for i in range(P):
        mesh_i = (field_verts[i] - centers_det[i]) / scales_det[i]
        if include_self:
            others = verts.reshape(-1, 3)
        elif P == 1:
            sums.append(jnp.zeros((), verts.dtype))
            continue
        else:
            others = jnp.concatenate(
                [verts[j] for j in range(P) if j != i], axis=0)
        q = (others - centers_live[i]) / scales_live[i]
        sums.append(jnp.sum(sdf_at_points(q, mesh_i, faces)))
    return jnp.stack(sums)


def collision_energy(verts: jnp.ndarray, faces: jnp.ndarray,
                     coll_weight: jnp.ndarray, grid_size: int = 32,
                     use_pallas: bool = False) -> jnp.ndarray:
    """Total interpenetration penalty: sum_i (w * s_i / P)^2."""
    s = collision_sums(verts, faces, grid_size, use_pallas)
    P = s.shape[0]
    return jnp.sum((coll_weight * s / P) ** 2)
