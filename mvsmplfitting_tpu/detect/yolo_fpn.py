"""YOLOv3-style Darknet-53 + FPN neck as batched NHWC flax.

Behavioral rebuild of the reference's `yolox/models/yolo_fpn.py:12-84`
(YOLOFPN over the classic `Darknet` backbone,
`yolox/models/darknet.py:10-94`) — the one zoo net with no counterpart
until round 3.  Unused by the demo predictor (the PAFPN in `yolox.py`
is the production neck) but part of the reference's model surface, so
a user switching over finds it here, checkpoint-convertible and
activation-parity-tested (`tests/test_yolo_fpn.py`).

All convs are BaseConv (conv+BN+LeakyReLU 0.1, `network_blocks.py:
29-62` with act="lrelu") — on TPU these lower to MXU convs with the
BN/activation fused by XLA; nearest-neighbor 2x upsampling is the same
broadcast-reshape used by the PAFPN.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnAct, SPPBottleneck
from .yolox import _upsample2


class ResLayer(nn.Module):
    """Darknet residual block (`network_blocks.py:104-119`):
    1x1 halve -> 3x3 restore -> add."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = ConvBnAct(c // 2, 1, 1, act="lrelu", name="layer1")(x)
        y = ConvBnAct(c, 3, 1, act="lrelu", name="layer2")(y)
        return x + y


class Darknet(nn.Module):
    """Darknet-21/53 backbone (`darknet.py:10-94`).

    Returns (dark3, dark4, dark5) features at strides (8, 16, 32) with
    (256, 512, 512) channels at stem_out=32 — dark5 ends in the SPP
    block that halves its channels (`darknet.py:54-57,66-80`).
    """

    depth: int = 53
    stem_out: int = 32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray,
                                   jnp.ndarray]:
        blocks = {21: (1, 2, 2, 1), 53: (2, 8, 8, 4)}[self.depth]

        def group(x, n, name):
            # `make_group_layer` (`darknet.py:59-64`): stride-2 channel
            # doubling conv, then n residual blocks.
            x = ConvBnAct(x.shape[-1] * 2, 3, 2, act="lrelu",
                          name=f"{name}_conv")(x)
            for i in range(n):
                x = ResLayer(name=f"{name}_res{i}")(x)
            return x

        x = ConvBnAct(self.stem_out, 3, 1, act="lrelu",
                      name="stem0")(x)
        x = group(x, 1, "stem1")                      # stride 2
        x = group(x, blocks[0], "dark2")              # stride 4
        x = c3 = group(x, blocks[1], "dark3")         # stride 8
        x = c4 = group(x, blocks[2], "dark4")         # stride 16
        x = group(x, blocks[3], "dark5")              # stride 32
        # SPP tail (`make_spp_block`, `darknet.py:66-80`).
        c = x.shape[-1]
        x = ConvBnAct(c // 2, 1, 1, act="lrelu", name="dark5_spp0")(x)
        x = ConvBnAct(c, 3, 1, act="lrelu", name="dark5_spp1")(x)
        x = SPPBottleneck(c // 2, act="lrelu", name="dark5_spp2")(x)
        x = ConvBnAct(c, 3, 1, act="lrelu", name="dark5_spp3")(x)
        c5 = ConvBnAct(c // 2, 1, 1, act="lrelu", name="dark5_spp4")(x)
        return c3, c4, c5


class YOLOFPN(nn.Module):
    """YOLOv3 FPN neck (`yolo_fpn.py:12-84`): top-down only, concat +
    5-conv embedding per level.  Returns (out_dark3, out_dark4, dark5)
    at strides (8, 16, 32) with (128, 256, 512) channels."""

    depth: int = 53

    @nn.compact
    def __call__(self, x):
        def embedding(x, f0, f1, name):
            # `_make_embedding` (`yolo_fpn.py:41-51`): 1-3-1-3-1 convs.
            x = ConvBnAct(f0, 1, 1, act="lrelu", name=f"{name}_0")(x)
            x = ConvBnAct(f1, 3, 1, act="lrelu", name=f"{name}_1")(x)
            x = ConvBnAct(f0, 1, 1, act="lrelu", name=f"{name}_2")(x)
            x = ConvBnAct(f1, 3, 1, act="lrelu", name=f"{name}_3")(x)
            return ConvBnAct(f0, 1, 1, act="lrelu",
                             name=f"{name}_4")(x)

        c3, c4, c5 = Darknet(self.depth, name="backbone")(x)

        x1 = ConvBnAct(256, 1, 1, act="lrelu", name="out1_cbl")(c5)
        x1 = jnp.concatenate([_upsample2(x1), c4], axis=-1)
        out_dark4 = embedding(x1, 256, 512, "out1")

        x2 = ConvBnAct(128, 1, 1, act="lrelu", name="out2_cbl")(
            out_dark4)
        x2 = jnp.concatenate([_upsample2(x2), c3], axis=-1)
        out_dark3 = embedding(x2, 128, 256, "out2")

        return out_dark3, out_dark4, c5
