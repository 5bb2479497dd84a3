"""Pose HRNet (high-resolution net) in NHWC flax.

Counterpart of the reference's alternative SPPE backbone
(`alphapose_core/alphapose/models/hrnet.py:270-470`): a stem to 1/4
resolution, a Bottleneck stage, then three multi-branch stages that
keep a high-resolution stream alive while exchanging information
between resolutions through fuse layers (1x1-conv + nearest-upsample
going up, strided 3x3 convs going down).  Defaults are HRNet-W32
(channels 32/64/128/256, module counts 1/4/3, 4 BasicBlocks per
branch), final 1x1 head to J heatmaps at input/4.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnAct, ResBottleneck, batch_norm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ConvBnAct(self.planes, 3, self.stride, act="relu",
                        name="conv1")(x)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = batch_norm(self, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=self.stride, use_bias=False,
                               name="down_conv")(x)
            identity = batch_norm(self, name="down_bn")(identity)
        return nn.relu(out + identity)


def _upsample(x, factor: int):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


class HRModule(nn.Module):
    """One high-resolution module: per-branch blocks + full fuse."""

    channels: Tuple[int, ...]
    num_blocks: int = 4
    multi_scale_output: bool = True

    @nn.compact
    def __call__(self, xs):
        nb = len(self.channels)
        outs = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.channels[i],
                               name=f"branch{i}_block{b}")(x)
            outs.append(x)

        n_out = nb if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(nb):
                y = outs[j]
                if j > i:       # lower res -> up: 1x1 conv + upsample
                    y = nn.Conv(self.channels[i], (1, 1),
                                use_bias=False,
                                name=f"fuse{i}_{j}_conv")(y)
                    y = batch_norm(self, name=f"fuse{i}_{j}_bn")(y)
                    y = _upsample(y, 2 ** (j - i))
                elif j < i:     # higher res -> down: strided 3x3 chain
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else \
                            self.channels[j]
                        y = nn.Conv(ch, (3, 3), strides=2, padding=1,
                                    use_bias=False,
                                    name=f"fuse{i}_{j}_d{k}_conv")(y)
                        y = batch_norm(self, name=f"fuse{i}_{j}_d{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class PoseHRNet(nn.Module):
    num_joints: int = 17
    width: int = 32
    stage_modules: Tuple[int, int, int] = (1, 4, 3)

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 3) -> (N, H/4, W/4, J) heatmaps."""
        w = self.width
        chans = [(w, 2 * w), (w, 2 * w, 4 * w),
                 (w, 2 * w, 4 * w, 8 * w)]

        x = ConvBnAct(64, 3, 2, act="relu", name="stem1")(x)
        x = ConvBnAct(64, 3, 2, act="relu", name="stem2")(x)
        for b in range(4):
            x = ResBottleneck(64, 1, downsample=(b == 0), se=False,
                              name=f"layer1_{b}")(x)   # 256ch @ /4

        # transition1: 256 -> [w, 2w] (new branch strided).
        xs = [ConvBnAct(w, 3, 1, act="relu", name="t1_b0")(x),
              ConvBnAct(2 * w, 3, 2, act="relu", name="t1_b1")(x)]

        for m in range(self.stage_modules[0]):
            xs = HRModule(chans[0], name=f"stage2_m{m}")(xs)

        xs.append(ConvBnAct(4 * w, 3, 2, act="relu",
                            name="t2_b2")(xs[-1]))
        for m in range(self.stage_modules[1]):
            xs = HRModule(chans[1], name=f"stage3_m{m}")(xs)

        xs.append(ConvBnAct(8 * w, 3, 2, act="relu",
                            name="t3_b3")(xs[-1]))
        for m in range(self.stage_modules[2]):
            last = m == self.stage_modules[2] - 1
            xs = HRModule(chans[2], multi_scale_output=not last,
                          name=f"stage4_m{m}")(xs)

        return nn.Conv(self.num_joints, (1, 1), use_bias=True,
                       name="final")(xs[0])
