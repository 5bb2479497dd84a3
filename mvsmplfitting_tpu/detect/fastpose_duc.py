"""FastPose-DUC and FastPose-DUC-dense heatmap networks, NHWC flax.

Rebuild of `alphapose_core/alphapose/models/fastpose_duc.py:15-98` and
`fastpose_duc_dense.py:15-135`: a ResNet (plain or SE) backbone
followed by three DUC stages — PixelShuffle(2), then (NUM_CONV-1)
channel-preserving 3x3 conv+BN+ReLU blocks, then a 3x3 conv+BN+ReLU to
the stage's output width (2048->1024->512->256) — and a 3x3 head to
`num_joints` channels.  Stage conv counts default to the zoo config
(`256x192_res50_lr1e-3_1x-duc.yaml`: 4/2/1).

The dense variant (`fastpose_duc_dense.py:96-123`) runs a SECOND,
independently-weighted DUC chain off the same backbone features and
concatenates its `num_joints_dense - num_joints` extra heatmaps onto
the base head's output.

The reference's three `BACKBONE` choices (`fastpose_duc.py:21-29`) all
exist: plain ResNet (default), `se=True` for SE-ResNet50 (the strongest
released checkpoints), and `shuffle=True` for ShuffleResnet
(`layers/ShuffleResnet.py` — SE-bottlenecks whose strided convs
downsample by PixelUnshuffle; a training-from-scratch experiment
backbone, golden-tested against the reference torch code).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import batch_norm, pixel_shuffle
from .fastpose import SEResnet50
from .simplepose import ResNet50


class DUCStage(nn.Module):
    """PixelShuffle(2) + NUM_CONV 3x3 conv+BN+ReLU blocks."""

    out_channels: int
    num_conv: int = 1

    @nn.compact
    def __call__(self, x):
        x = pixel_shuffle(x, 2)
        mid = x.shape[-1]
        for i in range(self.num_conv - 1):
            x = nn.Conv(mid, (3, 3), use_bias=False,
                        name=f"conv{i}")(x)
            x = batch_norm(self, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), use_bias=False,
                    name="conv_out")(x)
        x = batch_norm(self, name="bn_out")(x)
        return nn.relu(x)


def _backbone(se: bool, shuffle: bool):
    """BACKBONE selection (`fastpose_duc.py:21-29`): 'shuffle' |
    'se-resnet' | plain resnet."""
    if shuffle:
        return SEResnet50(shuffle=True, name="preact")
    return (SEResnet50 if se else ResNet50)(name="preact")


class FastPoseDUC(nn.Module):
    num_joints: int = 17
    num_convs: Tuple[int, int, int] = (4, 2, 1)
    conv_dim: int = 256
    se: bool = False
    shuffle: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 3) -> (N, H/4, W/4, J) heatmaps."""
        x = _backbone(self.se, self.shuffle)(x)
        x = DUCStage(1024, self.num_convs[0], name="duc1")(x)
        x = DUCStage(512, self.num_convs[1], name="duc2")(x)
        x = DUCStage(self.conv_dim, self.num_convs[2], name="duc3")(x)
        return nn.Conv(self.num_joints, (3, 3), use_bias=True,
                       name="conv_out")(x)


class FastPoseDUCDense(nn.Module):
    num_joints: int = 17
    num_joints_dense: int = 136
    num_convs: Tuple[int, int, int] = (4, 2, 1)
    conv_dim: int = 256
    se: bool = False
    shuffle: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 3) -> (N, H/4, W/4, J_dense) heatmaps
        (base joints first, dense extras concatenated after —
        `fastpose_duc_dense.py:117-123`)."""
        feat = _backbone(self.se, self.shuffle)(x)

        def chain(prefix):
            y = DUCStage(1024, self.num_convs[0],
                         name=f"{prefix}1")(feat)
            y = DUCStage(512, self.num_convs[1], name=f"{prefix}2")(y)
            return DUCStage(self.conv_dim, self.num_convs[2],
                            name=f"{prefix}3")(y)

        base = nn.Conv(self.num_joints, (3, 3), use_bias=True,
                       name="conv_out")(chain("duc"))
        dense = nn.Conv(self.num_joints_dense - self.num_joints,
                        (3, 3), use_bias=True,
                        name="conv_out_dense")(chain("duc_dense"))
        return jnp.concatenate([base, dense], axis=-1)
