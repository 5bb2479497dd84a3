"""YOLOFPN (YOLOv3 Darknet-53 neck) parity vs the reference torch code.

Full-graph activation parity: random-init the reference's
`yolox/models/yolo_fpn.py` module, convert its state_dict with
`convert.convert_yolo_fpn_sd`, and compare all three output feature
maps on the same input.
"""

import importlib
import sys
import types

import numpy as np
import pytest

from mvsmplfitting_tpu.detect.convert import convert_yolo_fpn_sd
from mvsmplfitting_tpu.detect.yolo_fpn import YOLOFPN, Darknet


def _import_reference_yolo_fpn():
    """Import the reference module without executing the package
    __init__ chain (which needs pycocotools/torchvision/loguru)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    for name in ("yolox", "yolox.models"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = ["/root/reference/" + name.replace(".", "/")]
            sys.modules[name] = pkg
    try:
        mod = importlib.import_module("yolox.models.yolo_fpn")
    except Exception as e:                  # pragma: no cover
        pytest.skip(f"reference yolo_fpn unimportable: {e}")
    finally:
        sys.path.pop(0)
    return torch, mod


class TestYOLOFPNGolden:
    @pytest.mark.parametrize("depth", [21, 53])
    def test_full_graph_activation_parity(self, depth):
        torch, mod = _import_reference_yolo_fpn()
        torch.manual_seed(0)
        # depth=21 keeps the test fast; 53 is the reference default.
        ref = mod.YOLOFPN(depth=depth).eval()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        variables = convert_yolo_fpn_sd(sd, depth)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 128, 160, 3)).astype(np.float32)
        with torch.no_grad():
            want = [o.numpy() for o in ref(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))]

        import jax.numpy as jnp
        model = YOLOFPN(depth=depth)
        got = model.apply(variables, jnp.asarray(x))
        assert len(got) == 3
        for g, w, stride in zip(got, want, (8, 16, 32)):
            g = np.transpose(np.asarray(g), (0, 3, 1, 2))
            assert g.shape == w.shape, (g.shape, w.shape, stride)
            np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)

    def test_shapes_and_strides(self):
        """(128, 256, 512) channels at strides (8, 16, 32) — the
        contract the YOLOv3 head consumes (`yolo_fpn.py:83`)."""
        import jax
        import jax.numpy as jnp
        model = YOLOFPN(depth=21)
        x = jnp.zeros((2, 64, 96, 3))
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x))
        out = jax.eval_shape(
            lambda v: model.apply(v, x),
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                         variables))
        assert out[0].shape == (2, 8, 12, 128)
        assert out[1].shape == (2, 4, 6, 256)
        assert out[2].shape == (2, 2, 3, 512)

    def test_darknet_feature_channels(self):
        import jax
        import jax.numpy as jnp
        model = Darknet(depth=21)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        c3, c4, c5 = model.apply(variables, x)
        assert c3.shape == (1, 8, 8, 256)
        assert c4.shape == (1, 4, 4, 512)
        assert c5.shape == (1, 2, 2, 512)
