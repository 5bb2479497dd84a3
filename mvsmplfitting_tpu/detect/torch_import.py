"""Convert live torch modules to flax variables (test-time parity).

Same mappings as `convert.py` but sourced from an in-memory module's
state_dict — used by the golden-parity tests, which build the
reference's torch graphs with random weights (the real checkpoints are
external downloads).
"""

from __future__ import annotations

from typing import Dict


def state_dict_numpy(module) -> Dict:
    return {k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


def yolox_params_from_module(module, depth_mul: float = 1.33) -> Dict:
    from . import convert

    sd = state_dict_numpy(module)
    return convert.convert_yolox_sd(sd, depth_mul)


def fastpose_params_from_module(module) -> Dict:
    from . import convert

    sd = state_dict_numpy(module)
    return convert.convert_fastpose_sd(sd)
