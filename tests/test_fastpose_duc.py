"""FastPose-DUC(-dense) zoo models.

The reference classes (`fastpose_duc.py`, `fastpose_duc_dense.py`)
download torchvision-pretrained backbones in __init__ and so cannot be
instantiated offline; parity here is (a) a weight-copied torch check of
the DUC stage itself (PixelShuffle + conv/BN/ReLU chain,
`fastpose_duc.py:72-88`) and (b) structural checks of the full graphs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.detect.fastpose_duc import (
    DUCStage, FastPoseDUC, FastPoseDUCDense,
)


class TestDUCStage:
    def test_matches_torch_stage(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        C_in, C_out, num_conv = 32, 24, 3
        x = rng.standard_normal((2, 8, 6, C_in)).astype(np.float32)

        stage = DUCStage(C_out, num_conv)
        params = stage.init(jax.random.PRNGKey(0),
                            jnp.asarray(x))

        # Torch mirror (`fastpose_duc.py:72-88`): PixelShuffle(2) then
        # (num_conv-1) same-width conv+BN+ReLU, then conv+BN+ReLU to
        # C_out.
        mid = C_in // 4
        layers = [tnn.PixelShuffle(2)]
        for _ in range(num_conv - 1):
            layers += [tnn.Conv2d(mid, mid, 3, padding=1, bias=False),
                       tnn.BatchNorm2d(mid), tnn.ReLU()]
        layers += [tnn.Conv2d(mid, C_out, 3, padding=1, bias=False),
                   tnn.BatchNorm2d(C_out), tnn.ReLU()]
        tstage = tnn.Sequential(*layers).eval()

        # Copy flax weights -> torch (HWIO -> OIHW).
        p = params["params"]
        convs = [m for m in tstage if isinstance(m, tnn.Conv2d)]
        bns = [m for m in tstage if isinstance(m, tnn.BatchNorm2d)]
        names = [f"conv{i}" for i in range(num_conv - 1)] + ["conv_out"]
        bn_names = [f"bn{i}" for i in range(num_conv - 1)] + ["bn_out"]
        with torch.no_grad():
            for conv, name in zip(convs, names):
                conv.weight.copy_(torch.from_numpy(np.transpose(
                    np.asarray(p[name]["kernel"]), (3, 2, 0, 1))))
            for bn, name in zip(bns, bn_names):
                bn.weight.copy_(torch.from_numpy(
                    np.asarray(p[name]["scale"])))
                bn.bias.copy_(torch.from_numpy(
                    np.asarray(p[name]["bias"])))
                st = params["batch_stats"][name]
                bn.running_mean.copy_(torch.from_numpy(
                    np.asarray(st["mean"])))
                bn.running_var.copy_(torch.from_numpy(
                    np.asarray(st["var"])))

        got = np.asarray(stage.apply(params, jnp.asarray(x)))
        with torch.no_grad():
            want = tstage(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestFullModels:
    def test_fastpose_duc_shapes(self, rng):
        model = FastPoseDUC(num_joints=17)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)),
                        jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        # ResNet /32 then 3x PixelShuffle(2) -> /4 heatmaps.
        assert out.shape == (1, 16, 16, 17)
        assert np.isfinite(np.asarray(out)).all()

    def test_dense_concat_order(self, rng):
        model = FastPoseDUCDense(num_joints=5, num_joints_dense=9)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)),
                        jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 16, 16, 9)
        # The two chains are independently weighted: zeroing the dense
        # head's kernel must zero ONLY channels 5:9.
        import flax
        p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") \
            else dict(params)
        p["params"] = dict(p["params"])
        p["params"]["conv_out_dense"] = jax.tree.map(
            jnp.zeros_like, p["params"]["conv_out_dense"])
        out2 = model.apply(p, x)
        assert np.allclose(np.asarray(out2)[..., 5:], 0.0)
        np.testing.assert_allclose(np.asarray(out2)[..., :5],
                                   np.asarray(out)[..., :5])

    def test_se_backbone_variant(self, rng):
        model = FastPoseDUC(num_joints=4, se=True)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)),
                        jnp.float32)
        out = model.apply(model.init(jax.random.PRNGKey(1), x), x)
        assert out.shape == (1, 16, 16, 4)


class TestDUCTorchParity:
    def test_full_graph_matches_torch_random_weights(self):
        """Reference ResNet-50 + the exact `_make_duc_stage`
        Sequentials + conv_out head, converted with
        `convert_fastpose_duc_sd` (`fastpose_duc.py:15-98`)."""
        import importlib.util
        import sys

        import torch
        import torch.nn as tnn

        path = ("/root/reference/alphapose_core/alphapose/models/"
                "layers/Resnet.py")
        spec = importlib.util.spec_from_file_location("apx_resnet2",
                                                      path)
        rmod = importlib.util.module_from_spec(spec)
        sys.modules["apx_resnet2"] = rmod
        spec.loader.exec_module(rmod)

        def duc_stage(num_conv, inplanes, outplanes):
            """Verbatim `_make_duc_stage` (`fastpose_duc.py:72-90`)."""
            layers = [tnn.PixelShuffle(2)]
            inplanes //= 4
            for _ in range(num_conv - 1):
                layers += [tnn.Conv2d(inplanes, inplanes, 3, padding=1,
                                      bias=False),
                           tnn.BatchNorm2d(inplanes, momentum=0.1),
                           tnn.ReLU(True)]
            layers += [tnn.Conv2d(inplanes, outplanes, 3, padding=1,
                                  bias=False),
                       tnn.BatchNorm2d(outplanes, momentum=0.1),
                       tnn.ReLU(True)]
            return tnn.Sequential(*layers)

        J = 17
        ncs = (2, 2, 1)   # smaller than the zoo 4/2/1 for speed

        class TFastPoseDUC(tnn.Module):
            def __init__(self):
                super().__init__()
                self.preact = rmod.ResNet("resnet50")
                self.duc1 = duc_stage(ncs[0], 2048, 1024)
                self.duc2 = duc_stage(ncs[1], 1024, 512)
                self.duc3 = duc_stage(ncs[2], 512, 256)
                self.conv_out = tnn.Conv2d(256, J, 3, 1, 1)

            def forward(self, x):
                return self.conv_out(
                    self.duc3(self.duc2(self.duc1(self.preact(x)))))

        torch.manual_seed(0)
        tm = TFastPoseDUC()
        g = torch.Generator().manual_seed(1)
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(0.5 + torch.rand(buf.shape, generator=g))
        tm.eval()

        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)
                      ).permute(0, 2, 3, 1).numpy()

        from mvsmplfitting_tpu.detect.convert import \
            convert_fastpose_duc_sd
        from mvsmplfitting_tpu.detect.fastpose_duc import FastPoseDUC

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_fastpose_duc_sd(sd, ncs))
        got = np.asarray(FastPoseDUC(num_joints=J, num_convs=ncs
                                     ).apply(variables, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_dense_full_graph_matches_torch(self):
        """Dense variant: nested `duc.{k}` / `duc_dense.{k}`
        Sequentials + dual heads (`fastpose_duc_dense.py:60-93`)."""
        import importlib.util
        import sys

        import torch
        import torch.nn as tnn

        path = ("/root/reference/alphapose_core/alphapose/models/"
                "layers/Resnet.py")
        spec = importlib.util.spec_from_file_location("apx_resnet3",
                                                      path)
        rmod = importlib.util.module_from_spec(spec)
        sys.modules["apx_resnet3"] = rmod
        spec.loader.exec_module(rmod)

        def duc_stage(num_conv, inplanes, outplanes):
            layers = [tnn.PixelShuffle(2)]
            inplanes //= 4
            for _ in range(num_conv - 1):
                layers += [tnn.Conv2d(inplanes, inplanes, 3, padding=1,
                                      bias=False),
                           tnn.BatchNorm2d(inplanes), tnn.ReLU(True)]
            layers += [tnn.Conv2d(inplanes, outplanes, 3, padding=1,
                                  bias=False),
                       tnn.BatchNorm2d(outplanes), tnn.ReLU(True)]
            return tnn.Sequential(*layers)

        J, JD = 17, 26
        ncs = (1, 1, 1)

        class TDense(tnn.Module):
            def __init__(self):
                super().__init__()
                self.preact = rmod.ResNet("resnet50")
                self.duc = tnn.Sequential(
                    duc_stage(ncs[0], 2048, 1024),
                    duc_stage(ncs[1], 1024, 512),
                    duc_stage(ncs[2], 512, 256))
                self.duc_dense = tnn.Sequential(
                    duc_stage(ncs[0], 2048, 1024),
                    duc_stage(ncs[1], 1024, 512),
                    duc_stage(ncs[2], 512, 256))
                self.conv_out = tnn.Conv2d(256, J, 3, 1, 1)
                self.conv_out_dense = tnn.Conv2d(256, JD - J, 3, 1, 1)

            def forward(self, x):
                feat = self.preact(x)
                return torch.cat([self.conv_out(self.duc(feat)),
                                  self.conv_out_dense(
                                      self.duc_dense(feat))], 1)

        torch.manual_seed(0)
        tm = TDense()
        g = torch.Generator().manual_seed(1)
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(0.5 + torch.rand(buf.shape, generator=g))
        tm.eval()

        rng = np.random.default_rng(4)
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)
                      ).permute(0, 2, 3, 1).numpy()

        from mvsmplfitting_tpu.detect.convert import \
            convert_fastpose_duc_dense_sd
        from mvsmplfitting_tpu.detect.fastpose_duc import \
            FastPoseDUCDense

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_fastpose_duc_dense_sd(sd, ncs))
        got = np.asarray(FastPoseDUCDense(
            num_joints=J, num_joints_dense=JD, num_convs=ncs).apply(
            variables, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def _load_reference_shuffle_resnet():
    """Load the reference's ShuffleResnet (+ its relative imports) as a
    synthetic package, like test_detect does for SE_Resnet."""
    import importlib.util
    import sys
    import types

    layers_dir = ("/root/reference/alphapose_core/alphapose/"
                  "models/layers")
    pkg = types.ModuleType("apx_layers")
    pkg.__path__ = [layers_dir]
    sys.modules.setdefault("apx_layers", pkg)

    def load(name):
        if f"apx_layers.{name}" in sys.modules:
            return sys.modules[f"apx_layers.{name}"]
        spec = importlib.util.spec_from_file_location(
            f"apx_layers.{name}", f"{layers_dir}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"apx_layers.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("SE_module")
    load("PixelUnshuffle")
    return load("ShuffleResnet").ShuffleResnet


class TestShuffleResnet:
    """ShuffleResnet backbone (`layers/ShuffleResnet.py`) — the
    reference's third BACKBONE choice (`fastpose_duc.py:21-23`)."""

    def test_pixel_unshuffle_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        import importlib.util

        from mvsmplfitting_tpu.detect.blocks import pixel_unshuffle

        path = ("/root/reference/alphapose_core/alphapose/models/"
                "layers/PixelUnshuffle.py")
        spec = importlib.util.spec_from_file_location("apx_pu", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        x = rng.standard_normal((2, 8, 12, 5)).astype(np.float32)
        for r in (2, 3):
            if 8 % r or 12 % r:
                continue
            with torch.no_grad():
                want = mod.PixelUnshuffle(r)(
                    torch.from_numpy(x.transpose(0, 3, 1, 2))
                ).numpy().transpose(0, 2, 3, 1)
            got = np.asarray(pixel_unshuffle(jnp.asarray(x), r))
            np.testing.assert_array_equal(got, want)

    def test_shuffle_duc_full_graph_matches_torch(self):
        """Reference ShuffleResnet('resnet50') + `_make_duc_stage`
        chain + head vs FastPoseDUC(shuffle=True) with converted
        random weights (`ShuffleResnet.py:60-198`)."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        try:
            ShuffleResnet = _load_reference_shuffle_resnet()
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference alphapose unavailable: {e}")

        def duc_stage(num_conv, inplanes, outplanes):
            layers = [tnn.PixelShuffle(2)]
            inplanes //= 4
            for _ in range(num_conv - 1):
                layers += [tnn.Conv2d(inplanes, inplanes, 3, padding=1,
                                      bias=False),
                           tnn.BatchNorm2d(inplanes, momentum=0.1),
                           tnn.ReLU(True)]
            layers += [tnn.Conv2d(inplanes, outplanes, 3, padding=1,
                                  bias=False),
                       tnn.BatchNorm2d(outplanes, momentum=0.1),
                       tnn.ReLU(True)]
            return tnn.Sequential(*layers)

        J = 7
        ncs = (2, 1, 1)

        class TShuffleDUC(tnn.Module):
            def __init__(self):
                super().__init__()
                self.preact = ShuffleResnet("resnet50")
                self.duc1 = duc_stage(ncs[0], 2048, 1024)
                self.duc2 = duc_stage(ncs[1], 1024, 512)
                self.duc3 = duc_stage(ncs[2], 512, 256)
                self.conv_out = tnn.Conv2d(256, J, 3, 1, 1)

            def forward(self, x):
                return self.conv_out(
                    self.duc3(self.duc2(self.duc1(self.preact(x)))))

        torch.manual_seed(0)
        tm = TShuffleDUC()
        g = torch.Generator().manual_seed(1)
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(0.5 + torch.rand(buf.shape, generator=g))
        tm.eval()

        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)
                      ).permute(0, 2, 3, 1).numpy()

        from mvsmplfitting_tpu.detect.convert import \
            convert_fastpose_duc_sd

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_fastpose_duc_sd(sd, ncs, se=True))
        got = np.asarray(FastPoseDUC(
            num_joints=J, num_convs=ncs, shuffle=True).apply(
            variables, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
