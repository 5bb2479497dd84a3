"""SimplePose (ResNet + 3 deconv stages) heatmap network, NHWC flax.

The reference's alternative SPPE model
(`alphapose_core/alphapose/models/simplepose.py`): plain ResNet-50
backbone (no SE), then three ConvTranspose(k4 s2) + BN + ReLU stages
(default filters 256/256/256) and a 1x1 head — input/4 heatmaps like
FastPose.  Provided for config parity with the reference model zoo.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnAct, ResBottleneck, batch_norm


class ResNet50(nn.Module):
    """Plain (non-SE) ResNet-50 backbone."""

    @nn.compact
    def __call__(self, x):
        x = ConvBnAct(64, 7, 2, act="relu", name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        cfg = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        for s, (planes, blocks, stride) in enumerate(cfg):
            for b in range(blocks):
                first = b == 0
                x = ResBottleneck(planes, stride if first else 1,
                                  downsample=first, se=False,
                                  name=f"layer{s + 1}_{b}")(x)
        return x


class SimplePose(nn.Module):
    num_joints: int = 26
    deconv_filters: Tuple[int, int, int] = (256, 256, 256)

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 3) -> (N, H/4, W/4, J) heatmaps."""
        x = ResNet50(name="preact")(x)
        for i, f in enumerate(self.deconv_filters):
            # torch ConvTranspose2d(k=4, s=2, p=1) == flax ConvTranspose
            # with SAME padding (verified numerically; convert torch
            # weights via spatial flip + (2,3,0,1) transpose).
            x = nn.ConvTranspose(f, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 name=f"deconv{i + 1}")(x)
            x = batch_norm(self, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        return nn.Conv(self.num_joints, (1, 1), use_bias=True,
                       name="final")(x)
