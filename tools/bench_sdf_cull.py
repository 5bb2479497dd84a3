"""One-off chip measurement: culled vs unculled two-phase voxelizer.

Run on the real TPU (serialized — one TPU process at a time):
    timeout 1700 python tools/bench_sdf_cull.py [G ...]

For each grid size: the culling claim is checked BITWISE against the
gate-disabled same-loop-form kernel (`_visit_all=True`); vs cull=False
the comparison is allclose (different loop forms compile with
different FMA contraction, <= ~4e-6 relative).  Host-synced timing of
both, on a body-like synthetic SMPL mesh normalized to [-1, 1]^3 the
way the collision path does (`ops/sdf.py:person_grids`).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mvsmplfitting_tpu.models.assets import synthetic_smpl  # noqa: E402
from mvsmplfitting_tpu.models.smpl import (SMPLParams,  # noqa: E402
                                           smpl_forward)
from mvsmplfitting_tpu.ops.sdf import sdf_grid_pallas_fast  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [32, 64, 128]
    assets = synthetic_smpl()
    verts, _ = smpl_forward(assets, SMPLParams.zeros())
    v = np.asarray(verts)
    lo, hi = v.min(0), v.max(0)
    v = (v - (lo + hi) / 2) / (hi - lo).max() * 1.8   # fill the grid
    verts = jnp.asarray(v, jnp.float32)
    faces = jnp.asarray(assets.faces)
    print(f"faces={faces.shape[0]} device={jax.devices()[0]}")

    for G in sizes:
        fns = {}
        for mode in ("base", "cull", "visit_all"):
            f = jax.jit(lambda vv, m=mode: sdf_grid_pallas_fast(
                vv, faces, G, cull=(m != "base"),
                _visit_all=(m == "visit_all")))
            t0 = time.perf_counter()
            out = np.asarray(f(verts))   # compile + run, fetch syncs
            fns[mode] = (f, out, time.perf_counter() - t0)
        gate_exact = (fns["cull"][1] == fns["visit_all"][1]).all()
        base, culled = fns["base"][1], fns["cull"][1]
        rel = (np.abs(culled - base)
               / np.maximum(np.abs(base), 1e-12)).max()
        same_inside = ((culled > 0) == (base > 0)).all()
        inside = (culled > 0).sum()
        times = {}
        for mode in ("base", "cull"):
            f = fns[mode][0]
            reps = 5 if G < 128 else 3
            t0 = time.perf_counter()
            for _ in range(reps):
                np.asarray(f(verts))     # fetch -> host sync each rep
            times[mode] = (time.perf_counter() - t0) / reps
        print(f"G={G}: gate_bitexact={bool(gate_exact)} "
              f"inside_set_equal={bool(same_inside)} "
              f"max_rel_vs_base={rel:.1e} inside_voxels={inside} "
              f"base={times['base']*1e3:.1f}ms "
              f"cull={times['cull']*1e3:.1f}ms "
              f"speedup={times['base']/times['cull']:.2f}x "
              f"(compile+first base/cull "
              f"{fns['base'][2]:.1f}/{fns['cull'][2]:.1f}s)")
        assert gate_exact, f"G={G} gate skipped a relevant chunk"
        assert same_inside and rel < 1e-4, f"G={G} mismatch"


if __name__ == "__main__":
    main()
