"""Multi-process scaling overhead measurement (CPU, 2 real processes).

The env has ONE TPU chip, so true multi-chip scaling is unmeasurable;
what IS measurable with real process boundaries (the
`tests/test_distributed.py` infra) is the OVERHEAD the distributed
path adds: the same global batch, fit on the same physical cores,
executed (a) by one process with an 8-virtual-device mesh and (b) by
two `jax.distributed` processes with 4 devices each whose `frames`
axis crosses the process boundary.  Ideal distributed execution costs
the same wall time; the measured ratio bounds the framework-side
scaling loss (the workload's collectives are tiny — see the
communication model in docs/ARCHITECTURE.md section 12).

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python tools/bench_distributed_scaling.py [B] [iters]
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time
import numpy as np

nproc, pid, port, B, iters = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], int(sys.argv[4]),
                              int(sys.argv[5]))

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mvsmplfitting_tpu.parallel import global_mesh, init_distributed

if nproc > 1:
    init_distributed(f"127.0.0.1:{port}", num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc

sys.path.insert(0, ".")
from __graft_entry__ import _make_problem
from bench import _fit_fn
from mvsmplfitting_tpu.fitting import FitConfig
from mvsmplfitting_tpu.fitting.lm import LMOptions

assets, vw, cam, obs1 = _make_problem(num_views=6, num_frames=1)
cfg = FitConfig(lm=LMOptions(max_iters=iters))
one = _fit_fn(cfg, assets, vw, cam)

mesh = global_mesh(cameras_axis=1)           # frames axis = all 8
sh = NamedSharding(mesh, P("frames"))

def dist(x):
    full = jnp.broadcast_to(x, (B,) + x.shape)
    return jax.make_array_from_callback(
        full.shape, sh, lambda idx: np.asarray(full)[idx])

obs = jax.tree.map(dist, obs1)
f = jax.jit(jax.vmap(one))
out = f(obs)
jax.block_until_ready(out)
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    jax.block_until_ready(f(obs))
dt = (time.perf_counter() - t0) / reps
if pid == 0:
    print(f"RESULT {B / dt:.3f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run_config(nproc, B, iters):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count="
                         f"{8 // nproc}")
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(nproc), str(pid), port,
         str(B), str(iters)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for pid in range(nproc)]
    fps = None
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, (pid, err[-2000:])
        for line in out.splitlines():
            if line.startswith("RESULT"):
                fps = float(line.split()[1])
    return fps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    t0 = time.time()
    fps1 = run_config(1, B, iters)
    t1 = time.time()
    fps2 = run_config(2, B, iters)
    print(f"1-process (8 dev): {fps1:.2f} fits/s   "
          f"2-process (4+4 dev): {fps2:.2f} fits/s   "
          f"overhead {100 * (1 - fps2 / fps1):.1f}% "
          f"({t1 - t0:.0f}s / {time.time() - t1:.0f}s)",
          file=sys.stderr)
    print(json.dumps({"metric": "distributed_scaling", "detail": {
        "batch": B, "iters": iters,
        "fps_1proc_8dev": round(fps1, 2),
        "fps_2proc_4x4dev": round(fps2, 2),
        "two_process_overhead_pct": round(100 * (1 - fps2 / fps1), 1),
    }}))


if __name__ == "__main__":
    main()
