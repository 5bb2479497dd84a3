"""Run the REFERENCE pipeline (read-only at /root/reference) on CPU.

Used by the end-to-end parity harness: both the reference and
mvsmplfitting_tpu fit the same bundled demo frame with the same
synthetic SMPL pkl (the real one is license-gated), and the outputs are
compared.  This script only *stubs missing third-party modules* and
no-ops `.cuda()` so the unmodified reference code runs on CPU; no
reference code is copied or altered.

Usage: python tools/run_reference_cpu.py <workdir> [maxiters]
  <workdir> must contain models/smpl/SMPL_NEUTRAL.pkl and a data/
  symlink (images/, keypoints/, J_regressor_lsp.npz, camera txt).
"""

from __future__ import annotations

import os
import sys
import types


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__file__ = f"<stub {name}>"
    for k, v in attrs.items():
        setattr(mod, k, v)

    def getattr_(attr, _n=name):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return lambda *a, **k: None

    mod.__getattr__ = getattr_
    sys.modules[name] = mod
    return mod


def main():
    workdir = os.path.abspath(sys.argv[1])
    maxiters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    os.chdir(workdir)  # reference hardcodes data/J_regressor_lsp.npz

    _stub("configargparse")
    _stub("configer", Configer=object)
    _stub("torchgeometry")
    _stub("pyrender")
    _stub("pyrender.constants", RenderFlags=object)
    _stub("trimesh")

    import torch

    # No-op GPU movement (the reference hardcodes .cuda() at
    # init_guess.py:38 even in its CPU path).
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False
    # torch>=2.6 defaults weights_only=True; the reference pickles whole
    # modules. The snapshot is the trusted bundled file.
    _orig_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        k.setdefault("map_location", "cpu")
        return _orig_load(*a, **k)

    torch.load = _load

    sys.path.insert(0, "/root/reference/code")
    from main import main as ref_main

    args = {
        # data
        "data_folder": "data",
        "cam_param": "data/camparams.txt",
        "dataset": "offline",
        "img_folder": "images",
        "keyp_folder": "keypoints",
        # output
        "output_folder": "output",
        "result_folder": "results",
        "mesh_folder": "meshes",
        "summary_folder": "summaries",
        "save_meshes": False,
        "save_images": False,
        "visualize": False,
        "interactive": True,
        "adjustment": False,
        "use_cuda": False,
        # model
        "model_folder": "models",
        "model_type": "smpllsp",
        "gender": "neutral",
        "float_dtype": "float32",
        "batch_size": 1,
        # priors
        "use_vposer": True,
        "prior_folder": "/root/reference/priors",
        "body_prior_type": "l2",
        "shape_prior_type": "l2",
        "angle_prior_type": "angle",
        "num_gaussians": 8,
        # annotation
        "use_joints_conf": True,
        "use_3d": False,
        "use_hip": True,
        "use_hands": False,
        "use_face": False,
        "use_face_contour": False,
        # weights
        "data_weights": [1.0, 1.0, 1.0, 1.0],
        "body_pose_prior_weights": [404.0, 404.0, 57.4, 4.78],
        "shape_weights": [100.0, 50.0, 10.0, 5.0],
        "coll_loss_weights": [0.0, 0.0, 1000.0, 4500.0],
        # optimization
        "rho": 100.0,
        "optim_type": "lbfgsls",
        "ftol": 1e-9,
        "gtol": 1e-9,
        "lr": 1.0,
        "maxiters": maxiters,
        "interpenetration": False,
        "loss_type": "smplify",
        # fixed params
        "fix_scale": False,
        "scale": None,
        "fix_shape": False,
        "shape": None,
        "is_seq": False,
    }
    ref_main(**args)


if __name__ == "__main__":
    main()
