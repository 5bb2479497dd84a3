"""SDF voxelization and interpenetration-energy tests.

Parity target: `sdf/sdf/csrc/sdf_cuda_kernel.cu:242-304` (phi = 0
outside / min surface distance inside, voxel centers at
-1 + (i+0.5)*2/(G-1), corner-ray parity) and the inline collision loss
at `code/utils/fitting.py:352-394` (torch grid_sample semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.ops.sdf import (
    collision_energy, grid_sample_trilinear, point_triangle_dist_sq,
    ray_crossings, sdf_grid, sdf_grid_pallas, sdf_grid_pallas_fast,
    voxel_centers,
)


def icosphere(radius=0.5, center=(0.0, 0.0, 0.0), n=12, tilt=0.1):
    """Simple UV sphere mesh, slightly tilted.

    The tilt breaks grid-axis alignment: a perfectly axis-aligned UV
    sphere makes the corner parity ray graze shared triangle edges,
    which flips inside/outside for a fraction of voxels — an inherent
    property of single-ray parity testing that the reference kernel
    shares (its only guard is the det epsilon, `sdf_cuda_kernel.cu:114`).
    """
    lats = np.linspace(1e-3, np.pi - 1e-3, n)
    lons = np.linspace(0, 2 * np.pi, n, endpoint=False)
    verts = []
    for la in lats:
        for lo in lons:
            verts.append([
                radius * np.sin(la) * np.cos(lo) + center[0],
                radius * np.cos(la) + center[1],
                radius * np.sin(la) * np.sin(lo) + center[2]])
    verts.append([center[0], radius + center[1], center[2]])
    verts.append([center[0], -radius + center[1], center[2]])
    top, bot = len(verts) - 2, len(verts) - 1
    faces = []
    for i in range(n - 1):
        for j in range(n):
            a = i * n + j
            b = i * n + (j + 1) % n
            c = (i + 1) * n + j
            d = (i + 1) * n + (j + 1) % n
            faces += [[a, b, c], [b, d, c]]
    for j in range(n):
        faces.append([top, j, (j + 1) % n])
        faces.append([bot, (n - 1) * n + (j + 1) % n, (n - 1) * n + j])
    verts = np.asarray(verts, np.float32)
    if tilt:
        c, s = np.cos(tilt), np.sin(tilt)
        rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        rx = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        ctr = np.asarray(center, np.float32)
        verts = (verts - ctr) @ (rz @ rx).T + ctr
    return verts, np.asarray(faces, np.int32)


class TestPrimitives:
    def test_point_triangle_distance_cases(self):
        a = jnp.asarray([0.0, 0.0, 0.0])
        b = jnp.asarray([1.0, 0.0, 0.0])
        c = jnp.asarray([0.0, 1.0, 0.0])
        cases = [
            ([0.25, 0.25, 1.0], 1.0),     # above interior
            ([-1.0, -1.0, 0.0], 2.0),     # vertex A region
            ([2.0, 0.0, 0.0], 1.0),       # vertex B region
            ([0.5, -1.0, 0.0], 1.0),      # edge AB region
            ([1.0, 1.0, 0.0], 0.5),       # edge BC region
        ]
        for p, want in cases:
            got = float(point_triangle_dist_sq(
                jnp.asarray(p), a, b, c))
            np.testing.assert_allclose(got, want, rtol=1e-5,
                                       err_msg=str(p))

    def test_ray_crossing(self):
        a = jnp.asarray([-1.0, -1.0, 0.5])
        b = jnp.asarray([1.0, -1.0, 0.5])
        c = jnp.asarray([0.0, 2.0, 0.5])
        # Ray from origin toward (0,0,1): passes through triangle plane.
        hit = ray_crossings(jnp.zeros(3), a, b, c,
                            jnp.asarray([0.0, 0.0, 2.0]))
        assert int(hit) == 1
        # Opposite direction misses (t < 0).
        miss = ray_crossings(jnp.zeros(3), a, b, c,
                             jnp.asarray([0.0, 0.0, -2.0]))
        assert int(miss) == 0


class TestSdfGrid:
    def test_sphere_inside_outside_and_distance(self):
        verts, faces = icosphere(radius=0.6, n=16)
        G = 24
        phi = np.asarray(sdf_grid(jnp.asarray(verts), jnp.asarray(faces),
                                  G))
        centers = np.asarray(voxel_centers(G)).reshape(G, G, G, 3)
        r = np.linalg.norm(centers, axis=-1)
        inside = r < 0.55           # clear margin from the faceted surface
        outside = r > 0.65
        assert (phi[outside] == 0).all()
        assert (phi[inside] > 0).all()
        # Inside distances approximate (0.6 - r) (faceted -> loose tol).
        want = 0.6 - r[inside]
        np.testing.assert_allclose(phi[inside], want, atol=0.03)

    def test_pallas_interpret_matches_jnp(self):
        verts, faces = icosphere(radius=0.55, n=10)
        G = 16
        phi_ref = np.asarray(sdf_grid(jnp.asarray(verts),
                                      jnp.asarray(faces), G))
        phi_pl = np.asarray(sdf_grid_pallas(
            jnp.asarray(verts), jnp.asarray(faces), G, face_chunk=64,
            interpret=True))
        np.testing.assert_allclose(phi_pl, phi_ref, atol=1e-5)

    def test_pallas_lane_tiled_matches_jnp(self):
        """The G=128-style lane split (N/L tiles per z-slab) is exact.

        Exercised via `_max_lanes` so the tiled code path runs at a
        test-sized grid; on hardware the split only engages at G > 64.
        """
        verts, faces = icosphere(radius=0.55, n=10)
        G = 16
        phi_ref = np.asarray(sdf_grid(jnp.asarray(verts),
                                      jnp.asarray(faces), G))
        phi_pl = np.asarray(sdf_grid_pallas(
            jnp.asarray(verts), jnp.asarray(faces), G, interpret=True,
            _max_lanes=64))       # 256 voxels/slab -> 4 lane tiles
        np.testing.assert_allclose(phi_pl, phi_ref, atol=1e-5)



    def test_two_phase_fast_matches_jnp(self):
        """The crossings-then-gated-distance kernel is exact: dead
        tiles never contribute (phi = 0 outside), live tiles run the
        identical distance math."""
        verts, faces = icosphere(radius=0.55, n=10)
        G = 16
        phi_ref = np.asarray(sdf_grid(jnp.asarray(verts),
                                      jnp.asarray(faces), G))
        phi_fast = np.asarray(sdf_grid_pallas_fast(
            jnp.asarray(verts), jnp.asarray(faces), G, interpret=True,
            _max_lanes=64))
        np.testing.assert_allclose(phi_fast, phi_ref, atol=1e-5)


class TestGridSample:
    def test_matches_torch_grid_sample(self, rng):
        import torch
        import torch.nn.functional as tF

        G = 9
        phi = rng.standard_normal((G, G, G)).astype(np.float32)
        coords = rng.uniform(-1.2, 1.2, size=(50, 3)).astype(np.float32)

        got = np.asarray(grid_sample_trilinear(jnp.asarray(phi),
                                               jnp.asarray(coords)))
        want = tF.grid_sample(
            torch.from_numpy(phi)[None, None],
            torch.from_numpy(coords).view(1, -1, 1, 1, 3),
            mode="bilinear", padding_mode="zeros",
            align_corners=False).view(-1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestGridSampleJVP:
    """The custom-JVP sampler must match torch grid_sample's autograd
    (the reference differentiates through `F.grid_sample` of a detached
    phi, `code/utils/fitting.py:381-391`)."""

    def test_coord_gradient_matches_torch(self, rng):
        import torch
        import torch.nn.functional as tF

        G = 9
        phi = rng.standard_normal((G, G, G)).astype(np.float32)
        coords = rng.uniform(-1.2, 1.2, size=(50, 3)).astype(np.float32)

        g = np.asarray(jax.grad(lambda c: jnp.sum(jnp.sin(
            grid_sample_trilinear(jnp.asarray(phi), c) * 2.0)))(
            jnp.asarray(coords)))

        tc = torch.from_numpy(coords).requires_grad_(True)
        out = tF.grid_sample(
            torch.from_numpy(phi)[None, None], tc.view(1, -1, 1, 1, 3),
            mode="bilinear", padding_mode="zeros",
            align_corners=False).view(-1)
        torch.sin(out * 2.0).sum().backward()
        np.testing.assert_allclose(g, tc.grad.view(-1, 3).numpy(),
                                   atol=1e-5)

    def test_phi_gradient_matches_torch(self, rng):
        import torch
        import torch.nn.functional as tF

        G = 7
        phi = rng.standard_normal((G, G, G)).astype(np.float32)
        coords = rng.uniform(-1.1, 1.1, size=(40, 3)).astype(np.float32)

        gp = np.asarray(jax.grad(lambda p: jnp.sum(
            grid_sample_trilinear(p, jnp.asarray(coords)) ** 2))(
            jnp.asarray(phi)))

        tp = torch.from_numpy(phi).requires_grad_(True)
        out = tF.grid_sample(
            tp[None, None], torch.from_numpy(coords).view(1, -1, 1, 1, 3),
            mode="bilinear", padding_mode="zeros",
            align_corners=False).view(-1)
        (out ** 2).sum().backward()
        np.testing.assert_allclose(gp, tp.grad.numpy(), atol=1e-5)

    def test_jvp_matches_finite_difference(self):
        # Private rng (the shared session rng makes the draws depend on
        # which tests ran before) + points kept away from cell faces:
        # trilinear weights kink at integer pixel coords, where a
        # central difference is invalid.
        rng = np.random.default_rng(7)
        G = 8
        phi = rng.standard_normal((G, G, G)).astype(np.float32)
        k = rng.integers(1, G - 2, size=(20, 3))
        pix = k + rng.uniform(0.2, 0.8, size=(20, 3))
        c0 = ((2.0 * pix + 1.0) / G - 1.0).astype(np.float32)
        dc = rng.standard_normal((20, 3)).astype(np.float32) * 0.5

        _, tangent = jax.jvp(
            lambda c: grid_sample_trilinear(jnp.asarray(phi), c),
            (jnp.asarray(c0),), (jnp.asarray(dc),))
        eps = 1e-4
        fd = (np.asarray(grid_sample_trilinear(
                  jnp.asarray(phi), jnp.asarray(c0 + eps * dc))) -
              np.asarray(grid_sample_trilinear(
                  jnp.asarray(phi), jnp.asarray(c0 - eps * dc)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(tangent), fd, atol=2e-2)


class TestCollisionEnergy:
    def test_overlap_penalized_separation_not(self):
        v1, faces = icosphere(radius=0.5, center=(0, 0, 0), n=12)
        v2_overlap, _ = icosphere(radius=0.5, center=(0.3, 0, 0), n=12)
        v2_apart, _ = icosphere(radius=0.5, center=(2.5, 0, 0), n=12)

        e_overlap = float(collision_energy(
            jnp.stack([v1, v2_overlap]), jnp.asarray(faces),
            jnp.asarray(1.0), grid_size=24))
        e_apart = float(collision_energy(
            jnp.stack([v1, v2_apart]), jnp.asarray(faces),
            jnp.asarray(1.0), grid_size=24))
        # Self-sampling contributes a little (the reference keeps it);
        # overlap must dominate clearly.
        assert e_overlap > 4 * max(e_apart, 1e-8)

    def test_gradient_flows_through_positions_only(self):
        v1, faces = icosphere(radius=0.5, center=(0, 0, 0), n=8)
        v2, _ = icosphere(radius=0.5, center=(0.4, 0, 0), n=8)
        verts = jnp.stack([v1, v2])

        g = jax.grad(lambda v: collision_energy(
            v, jnp.asarray(faces), jnp.asarray(1.0), grid_size=16))(verts)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestCulledTwoPhase:
    """Exactness of the chunk-culling paths (y-sorted faces, phase-A
    prefix+z-mask, phase-B LB-ordered early-exit loop).

    The culling claim is tested BITWISE against the same kernel with
    the early-exit gate disabled (`_visit_all=True`, identical loop
    form) — the skipped chunks change nothing.  Against the unculled
    kernel / jnp oracle the comparison is allclose: `lax.fori_loop`
    and `lax.while_loop` bodies of the same distance math compile
    with different FMA contraction (measured <= ~4e-6 relative)."""

    def _check(self, verts, faces, G, **kw):
        phi_ref = np.asarray(sdf_grid(jnp.asarray(verts),
                                      jnp.asarray(faces), G))
        got = np.asarray(sdf_grid_pallas_fast(
            jnp.asarray(verts), jnp.asarray(faces), G, interpret=True,
            cull=True, **kw))
        ungated = np.asarray(sdf_grid_pallas_fast(
            jnp.asarray(verts), jnp.asarray(faces), G, interpret=True,
            cull=True, _visit_all=True, **kw))
        base = np.asarray(sdf_grid_pallas_fast(
            jnp.asarray(verts), jnp.asarray(faces), G, interpret=True,
            cull=False, **kw))
        np.testing.assert_array_equal(got, ungated)
        # same inside set (integer parity is contraction-independent)
        np.testing.assert_array_equal(got > 0, base > 0)
        np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(got, phi_ref, atol=1e-5)
        return got

    def test_offset_blob_lane_tiled(self):
        verts, faces = icosphere(radius=0.35, center=(0.3, -0.4, 0.2),
                                 n=10)
        phi = self._check(verts, faces, 16, _max_lanes=64,
                          face_chunk=16)
        assert (phi > 0).any()

    def test_two_blobs(self):
        v1, f1 = icosphere(radius=0.3, center=(0.0, 0.45, 0.0), n=8)
        v2, f2 = icosphere(radius=0.25, center=(0.1, -0.5, -0.2), n=8)
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + len(v1)])
        self._check(verts, faces, 16, _max_lanes=64, face_chunk=8)

    def test_mesh_partially_outside_grid(self):
        verts, faces = icosphere(radius=0.6, center=(0.7, 0.7, 0.0),
                                 n=10)
        self._check(verts, faces, 12, _max_lanes=48, face_chunk=16)

    def test_thin_sliver(self):
        verts, faces = icosphere(radius=0.5, n=10)
        verts = verts * np.asarray([1.0, 0.15, 1.0])  # flat pancake
        self._check(verts, faces, 16, _max_lanes=64, face_chunk=16)

    def test_odd_lane_split_not_row_aligned(self):
        """L % G != 0: tile y-bands must span the partial rows."""
        verts, faces = icosphere(radius=0.45, center=(0.2, 0.1, -0.1),
                                 n=9)
        # G=12 -> N=144; _max_lanes=48 -> L=48, 48 % 12 == 0... use 36:
        # divisors of 144 <= 36: 36 (3 rows) -> still aligned; G=10,
        # N=100, max 20 -> L=20 = 2 rows aligned; G=14, N=196,
        # max 28 -> L=28 = 2 rows. True misalignment needs L % G != 0:
        # G=12, max 16 -> L=16, 16 % 12 = 4 -> tiles straddle rows.
        self._check(verts, faces, 12, _max_lanes=16, face_chunk=8)

    def test_synthetic_smpl_body(self):
        """The full synthetic body mesh (the production collision
        input) — this case exposed the fori/while FMA-contraction
        sensitivity the class docstring describes."""
        from mvsmplfitting_tpu.models.assets import synthetic_smpl
        from mvsmplfitting_tpu.models.smpl import (SMPLParams,
                                                   smpl_forward)
        assets = synthetic_smpl()
        verts, _ = smpl_forward(assets, SMPLParams.zeros())
        v = np.asarray(verts)
        lo, hi = v.min(0), v.max(0)
        v = (v - (lo + hi) / 2) / (hi - lo).max() * 1.8
        phi = self._check(v.astype(np.float32),
                          np.asarray(assets.faces), 16, face_chunk=64)
        assert (phi > 0).any()


class TestSdfAtPoints:
    """Gridless exact field (`sdf_at_points`) — the round-3 production
    collision engine."""

    def test_culled_path_bitwise_equals_full(self):
        """The AABB-candidate + inside-budget culled evaluation must be
        bitwise-equal to the brute-force path on every output the
        consumers read (phi everywhere; closest on the inside set) —
        including when a budget overflows and the `lax.cond` fallback
        fires."""
        from mvsmplfitting_tpu.ops.sdf import _sdf_at_points_impl
        verts, faces = icosphere(radius=0.55, n=14)
        vj, fj = jnp.asarray(verts), jnp.asarray(faces)
        rng = np.random.default_rng(1)
        pts = jnp.asarray(
            rng.uniform(-0.95, 0.95, (5000, 3)).astype(np.float32))

        full = _sdf_at_points_impl(pts, vj, fj,
                                   cand_budget=10**9,
                                   inside_budget=10**9)
        inside = np.asarray(full[2])
        n_in = int(inside.sum())
        assert 0 < n_in < 1024          # fixture exercises the cull

        for k1, k2 in ((4096, 1024),          # single culled tier
                       ((1024, 4096), (256, 1024)),  # default-style ladder
                       (max(n_in // 2, 1),) * 2):   # overflow fallback
            got = _sdf_at_points_impl(pts, vj, fj,
                                      cand_budget=k1, inside_budget=k2)
            np.testing.assert_array_equal(np.asarray(got[0]),
                                          np.asarray(full[0]))
            np.testing.assert_array_equal(np.asarray(got[2]), inside)
            np.testing.assert_array_equal(
                np.asarray(got[1])[inside],
                np.asarray(full[1])[inside])

    def test_matches_sdf_grid_at_voxel_centers(self):
        from mvsmplfitting_tpu.ops.sdf import sdf_at_points
        verts, faces = icosphere(radius=0.55, n=10)
        G = 12
        phi_grid = np.asarray(sdf_grid(jnp.asarray(verts),
                                       jnp.asarray(faces), G)).ravel()
        pts = voxel_centers(G)
        phi_pts = np.asarray(sdf_at_points(pts, jnp.asarray(verts),
                                           jnp.asarray(faces)))
        # Same math on the same points (both scan face chunks with the
        # identical primitives): bitwise.
        np.testing.assert_array_equal(phi_pts, phi_grid)

    def test_sphere_field_values(self):
        from mvsmplfitting_tpu.ops.sdf import sdf_at_points
        verts, faces = icosphere(radius=0.6, n=16)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.9, 0.9, (500, 3)).astype(np.float32)
        r = np.linalg.norm(pts, axis=-1)
        phi = np.asarray(sdf_at_points(jnp.asarray(pts),
                                       jnp.asarray(verts),
                                       jnp.asarray(faces)))
        assert (phi[r > 0.65] == 0).all()
        inside = r < 0.55
        np.testing.assert_allclose(phi[inside], 0.6 - r[inside],
                                   atol=0.03)

    def test_jvp_is_spatial_gradient(self):
        """Inside a sphere, d phi / d p = -p/|p| (distance to the
        surface shrinks moving outward); outside, 0.  Also check the
        custom JVP against finite differences of the primal."""
        from mvsmplfitting_tpu.ops.sdf import sdf_at_points
        verts, faces = icosphere(radius=0.6, n=24)
        pts = np.array([[0.3, 0.1, -0.2],       # inside
                        [0.0, 0.45, 0.0],       # inside
                        [0.8, 0.0, 0.5]],       # outside
                       np.float32)
        vj, fj = jnp.asarray(verts), jnp.asarray(faces)

        def f(p):
            return sdf_at_points(p, vj, fj)

        g = jax.jacfwd(f)(jnp.asarray(pts))      # (N, N, 3)
        g = np.asarray(g)[np.arange(3), np.arange(3)]
        r = np.linalg.norm(pts[:2], axis=-1, keepdims=True)
        # The faceted surface's true gradient is the facet normal, not
        # the analytic sphere's radial direction — loose tolerance.
        np.testing.assert_allclose(g[:2], -pts[:2] / r, atol=0.1)
        np.testing.assert_array_equal(g[2], 0.0)

        eps = 1e-3
        for i in range(2):
            for d in range(3):
                e = np.zeros((3, 3), np.float32)
                e[i, d] = eps
                fd = (np.asarray(f(jnp.asarray(pts + e)))[i]
                      - np.asarray(f(jnp.asarray(pts - e)))[i]) / (2 * eps)
                # The field is only piecewise smooth: a central
                # difference straddling a facet-Voronoi boundary
                # averages two facet normals while the JVP is exact
                # for the argmin facet — tolerance covers that kink.
                np.testing.assert_allclose(g[i, d], fd, atol=2e-2)

    def test_field_is_detached_from_mesh(self):
        """The verts tangent must be ignored (the reference's
        detached-phi contract, `sdf/sdf/sdf.py:17-19`)."""
        from mvsmplfitting_tpu.ops.sdf import sdf_at_points
        verts, faces = icosphere(radius=0.6, n=12)
        pts = jnp.asarray([[0.2, 0.0, 0.1]], jnp.float32)
        vj, fj = jnp.asarray(verts), jnp.asarray(faces)
        g = jax.grad(lambda v: jnp.sum(sdf_at_points(pts, v, fj)))(vj)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_collision_sums_points_three_people(self):
        """P=3 exercises the skip-self concatenation path: person 0
        and 1 overlap, person 2 is far away — cross sums must be
        positive exactly for the overlapping pair and ~0 for the
        isolated one, and `include_self=True` must agree up to the
        on-surface fp dust (the self term is identically 0 in the
        exact field)."""
        from mvsmplfitting_tpu.ops.sdf import collision_sums_points
        v1, faces = icosphere(radius=0.5, n=12)
        v2 = v1 + np.array([0.45, 0.0, 0.0], np.float32)
        v3 = v1 + np.array([5.0, 0.0, 0.0], np.float32)
        verts = jnp.asarray(np.stack([v1, v2, v3]))
        fj = jnp.asarray(faces)
        s = np.asarray(collision_sums_points(verts, fj))
        assert s[0] > 0 and s[1] > 0        # the overlapping pair
        np.testing.assert_allclose(s[2], 0.0, atol=1e-5)
        s_self = np.asarray(collision_sums_points(verts, fj,
                                                  include_self=True))
        np.testing.assert_allclose(s_self, s, atol=1e-3)

    def test_collision_sums_points_converges_to_grid(self):
        """collision_sums_points == the G -> infinity limit of
        collision_sums: the grid value at G=48 must be closer to the
        points value than the G=12 one."""
        from mvsmplfitting_tpu.ops.sdf import (collision_sums,
                                               collision_sums_points)
        v1, faces = icosphere(radius=0.5, n=12)
        v2 = v1 + np.array([0.45, 0.0, 0.0], np.float32)
        verts = jnp.asarray(np.stack([v1, v2]))
        fj = jnp.asarray(faces)
        s_pts = np.asarray(collision_sums_points(verts, fj))
        s12 = np.asarray(collision_sums(verts, fj, 12))
        s48 = np.asarray(collision_sums(verts, fj, 48))
        assert (s_pts > 0).all()      # overlapping spheres penetrate
        err12 = np.abs(s12 - s_pts).sum()
        err48 = np.abs(s48 - s_pts).sum()
        assert err48 < err12, (s12, s48, s_pts)
        np.testing.assert_allclose(s48, s_pts, rtol=0.15)
