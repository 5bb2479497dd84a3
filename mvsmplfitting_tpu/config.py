"""Typed configuration tree, YAML-loadable, CLI-overridable.

One typed config replaces the reference's three config systems
(configargparse + YAML `code/cmd_parser.py:16-340`, easydict YAML in
alphapose, hardcoded model config in yolox).  Field names follow
`cfg_files/fit_smpl.yaml` so reference configs load unmodified.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


@dataclass
class Config:
    # data
    data_folder: str = "data"
    img_folder: str = "images"
    keyp_folder: str = "keypoints"
    cam_param: str = "data/camparams.txt"
    dataset: str = "offline"
    # output
    output_folder: str = "output"
    result_folder: str = "results"
    mesh_folder: str = "meshes"
    save_meshes: bool = True
    save_images: bool = True
    interactive: bool = True
    visualize: bool = False
    # model
    model_folder: str = "models"
    model_type: str = "smpllsp"       # smpl | smpllsp | smplx
    gender: str = "neutral"
    float_dtype: str = "float32"
    allow_synthetic_model: bool = True  # fall back when no SMPL pkl exists
    lsp_regressor: Optional[str] = None  # path to J_regressor_lsp.npz
    # priors
    use_vposer: bool = True
    prior_folder: str = "priors"
    body_prior_type: str = "l2"       # l2 | gmm
    gmm_path: Optional[str] = None
    # annotation
    use_joints_conf: bool = True
    use_3d: bool = False
    use_hip: bool = True
    # stage weights
    data_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    body_pose_prior_weights: Tuple[float, ...] = (404.0, 404.0, 57.4, 4.78)
    shape_weights: Tuple[float, ...] = (100.0, 50.0, 10.0, 5.0)
    coll_loss_weights: Tuple[float, ...] = (0.0, 0.0, 1000.0, 4500.0)
    # optimization
    rho: float = 100.0
    optim_type: str = "lm"  # lm (primary) | lbfgsls (parity) | adam|rmsprop|sgd
    ftol: float = 1e-9
    gtol: float = 1e-9
    lr: float = 1.0
    maxiters: int = 30
    # fixed params
    fix_scale: bool = False
    scale: Optional[float] = None
    fix_shape: bool = False
    shape: Optional[Tuple[float, ...]] = None
    # modes
    is_seq: bool = False
    adjustment: bool = False
    interpenetration: bool = False
    # The reference voxelizes collisions at grid 128
    # (`code/utils/fitting.py:374`); the Pallas kernel handles it on
    # TPU, the jnp oracle makes CPU runs at 128 slow but correct.
    coll_grid_size: int = 128
    # None -> auto: Pallas voxelizer on TPU, jnp oracle elsewhere.
    use_pallas_sdf: Optional[bool] = None
    # Multi-person joint-refinement field: "points" evaluates the
    # exact (gridless) field at the query vertices — reference
    # semantics in the G -> infinity limit at a fraction of the cost;
    # "grid" is the strict-parity voxelize+trilinear form
    # (`fitting/multi_person.py:fit_people`).
    sdf_engine: str = "points"
    # Multi-person: fit up to this many detected people per frame
    # (vmapped solo fits + joint SDF refinement when interpenetration
    # is on — `fitting/multi_person.py`; the reference's own path
    # asserts batch 1, `non_linear_solver.py:56`).
    num_people: int = 1
    # batching / parallelism
    batch_frames: int = 1             # frames fitted per device program
    mesh_shape: Optional[Tuple[int, int]] = None  # (frames, cameras) axes

    def resolved(self, base: str = ".") -> "Config":
        """Resolve relative paths against `base`."""
        out = dataclasses.replace(self)
        for name in ("data_folder", "cam_param", "output_folder",
                     "model_folder", "prior_folder"):
            v = getattr(out, name)
            if v and not os.path.isabs(v):
                setattr(out, name, os.path.join(base, v))
        return out


def _coerce(value, target):
    """Coerce a YAML value to the dataclass field's declared type."""
    if value is None or target is None:
        return value
    origin = getattr(target, "__origin__", None)
    if origin in (tuple, list) or target in (tuple, list):
        return tuple(float(v) for v in value)
    if target is bool:
        return bool(value)
    if target is float:
        return float(value)
    if target is int:
        return int(value)
    return value


_FIELD_TYPES = {
    "data_weights": tuple, "body_pose_prior_weights": tuple,
    "shape_weights": tuple, "coll_loss_weights": tuple, "shape": tuple,
    "rho": float, "ftol": float, "gtol": float, "lr": float,
    "scale": float, "maxiters": int, "batch_frames": int,
}


def load_config(path: Optional[str] = None, **overrides) -> Config:
    """Load a YAML config file, apply keyword overrides, return Config.

    Unknown YAML keys are ignored (so the reference's configs, which
    carry torch-era flags like `use_cuda`, load unchanged).
    """
    values = {}
    if path:
        import yaml
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        values.update(raw)
    values.update({k: v for k, v in overrides.items() if v is not None})

    known = {f.name for f in dataclasses.fields(Config)}
    # Compatibility aliases from the reference's flag names.
    if "optim_type" in values and values["optim_type"] in (
            "lbfgs", "lbfgsls"):
        values["optim_type"] = "lbfgsls"
    clean = {}
    for k, v in values.items():
        if k not in known:
            continue
        clean[k] = _coerce(v, _FIELD_TYPES.get(k))
    cfg = Config(**clean)
    n = len(cfg.body_pose_prior_weights)
    assert (len(cfg.shape_weights) == n and
            len(cfg.coll_loss_weights) == n), \
        "stage weight lists must have equal length"
    return cfg


def dump_config(cfg: Config, path: str) -> None:
    """Write the resolved config (like the reference's `output/conf.yaml`,
    `init.py:33-35`)."""
    import yaml
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    d = {k: (list(v) if isinstance(v, tuple) else v)
         for k, v in dataclasses.asdict(cfg).items()}
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
