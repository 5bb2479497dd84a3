"""REAL multi-process `jax.distributed` validation (2 CPU processes).

The rest of the suite simulates multi-host with one process and 8
virtual devices; this test actually spawns two OS processes, each with
4 virtual CPU devices, connects them through
`parallel.init_distributed` (gloo coordinator on localhost), builds the
library's `global_mesh` spanning BOTH processes, and runs the
psum-assembled sharded triangulation (`parallel.sharded_triangulate`)
with the `cameras` axis crossing the process boundary — i.e. the
collective rides the real cross-host transport, not intra-process
virtual devices.  Each worker asserts parity against the single-device
`ops.triangulate.triangulate` and checks `process_local_batch_slice`
disjointness.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import numpy as np

pid, port = int(sys.argv[1]), sys.argv[2]

import jax
from mvsmplfitting_tpu.parallel import (
    global_mesh, init_distributed, process_local_batch_slice,
    sharded_triangulate)

init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 8

mesh = global_mesh(cameras_axis=8)       # all 8 devices on one axis
assert mesh.shape["cameras"] == 8 and mesh.shape["frames"] == 1

# Deterministic synthetic rig, identical on both processes.
import jax.numpy as jnp
from mvsmplfitting_tpu.models.camera import Camera
from mvsmplfitting_tpu.ops.triangulate import triangulate
from jax.sharding import NamedSharding, PartitionSpec as P
from functools import partial

rng = np.random.default_rng(0)
V, K = 8, 17
pts = rng.normal(0, 0.4, (K, 3)) + [0, 0, 3.0]
angles = np.linspace(0, 2 * np.pi, V, endpoint=False)
rot = np.stack([np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                          [-np.sin(a), 0, np.cos(a)]]) for a in angles])
trans = np.tile([0.0, 0.0, 3.0], (V, 1)) - np.einsum(
    "vab,b->va", rot, [0, 0, 3.0])
cam = Camera(rotation=jnp.asarray(rot, jnp.float32),
             translation=jnp.asarray(trans, jnp.float32),
             focal=jnp.full((V, 2), 1200.0, jnp.float32),
             center=jnp.full((V, 2), 500.0, jnp.float32))
c = jnp.einsum("vab,kb->vka", cam.rotation, jnp.asarray(pts, jnp.float32)
               ) + cam.translation[:, None]
gt2d = c[..., :2] / c[..., 2:] * cam.focal[:, None] + cam.center[:, None]
conf = jnp.asarray(rng.uniform(0.3, 1.0, (V, K)), jnp.float32)
mask = jnp.ones((V,), jnp.float32)

# Shard the camera/observation view axis across the global mesh: each
# process materializes only ITS 4 views' shards.
sh = NamedSharding(mesh, P("cameras"))
def dist(x):
    return jax.make_array_from_callback(
        x.shape, sh, lambda idx: np.asarray(x)[idx])
cam_g = jax.tree_util.tree_map(dist, cam)
gt2d_g, conf_g, mask_g = dist(gt2d), dist(conf), dist(mask)

@partial(jax.shard_map, mesh=mesh,
         in_specs=(jax.tree_util.tree_map(lambda _: P("cameras"), cam),
                   P("cameras"), P("cameras"), P("cameras")),
         out_specs=P())
def run(cam_l, gt2d_l, conf_l, mask_l):
    return sharded_triangulate(cam_l, gt2d_l, conf_l, mask_l)

got = np.asarray(jax.jit(run)(cam_g, gt2d_g, conf_g, mask_g))
want = np.asarray(triangulate(cam, gt2d, conf))
err = np.abs(got - want).max()
assert err < 1e-3, err
rec = np.abs(got - pts).max()
assert rec < 1e-2, rec

sl = process_local_batch_slice(16)
assert sl == slice(pid * 8, (pid + 1) * 8), sl

print(f"WORKER_OK {pid} err={err:.2e} rec={rec:.2e}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_triangulation(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out
