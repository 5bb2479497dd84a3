"""Build the shared workspace for the end-to-end parity harness.

Writes the synthetic SMPL model as a reference-format pkl (plain numpy
arrays — `to_np` in the reference loader handles them), symlinks the
bundled demo data, and emits a config for our CLI that uses the SAME
model pkl and the SAME LSP regressor npz so both pipelines minimize the
identical energy.

Usage: python tools/make_parity_workspace.py <workdir>
"""

from __future__ import annotations

import os
import pickle
import shutil
import sys

import numpy as np


def main():
    workdir = os.path.abspath(sys.argv[1])
    os.makedirs(os.path.join(workdir, "models", "smpl"), exist_ok=True)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from mvsmplfitting_tpu.models.assets import synthetic_smpl

    # Regenerate the raw arrays the synthetic model is built from.
    assets = synthetic_smpl("smpllsp")
    V = assets.num_verts
    posedirs = np.asarray(assets.posedirs)         # (207, V*3)
    raw = {
        "v_template": np.asarray(assets.v_template, np.float64),
        "shapedirs": np.asarray(assets.shapedirs, np.float64),
        # reference reshapes (V, 3, 207) -> (-1, 207) then transposes
        "posedirs": posedirs.T.reshape(V, 3, -1).astype(np.float64),
        "J_regressor": np.asarray(assets.j_regressor, np.float64),
        "weights": np.asarray(assets.lbs_weights, np.float64),
        "f": np.asarray(assets.faces, np.int64),
        "kintree_table": np.stack([
            np.asarray(assets.parents, np.int64) % (1 << 32),
            np.arange(len(assets.parents), dtype=np.int64)]),
    }
    with open(os.path.join(workdir, "models", "smpl",
                           "SMPL_NEUTRAL.pkl"), "wb") as f:
        pickle.dump(raw, f, protocol=2)

    # data/: demo images + keypoints + camera file + LSP regressor.
    data_dir = os.path.join(workdir, "data")
    os.makedirs(data_dir, exist_ok=True)
    ref = "/root/reference/data"
    for name in ("images", "keypoints"):
        dst = os.path.join(data_dir, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(ref, name), dst)
    shutil.copy(os.path.join(ref, "3DOH50K_Parameters.txt"),
                os.path.join(data_dir, "camparams.txt"))
    # Our synthetic smpllsp regressor, shared with the reference run
    # (the reference loads data/J_regressor_lsp.npz relative to cwd).
    np.savez(os.path.join(data_dir, "J_regressor_lsp.npz"),
             joint_regressor=np.asarray(assets.lsp_regressor,
                                        np.float64))
    print(f"parity workspace ready at {workdir}")


if __name__ == "__main__":
    main()
