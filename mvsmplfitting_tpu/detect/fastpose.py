"""FastPose (SE-ResNet50 + DUC) heatmap pose network, NHWC flax.

Matches the reference's demo config
(`alphapose_core/configs/halpe_26/resnet/256x192_res50_lr1e-3_1x.yaml`):
input 256x192, SE-ResNet50 backbone (SE only on each stage's first
block, reduction=1 — `SE_Resnet.py:196-204`, `SE_module.py:11`),
PixelShuffle(2), DUC(512->1024), DUC(256->512), 3x3 conv to 26 joint
heatmaps at 64x48 (`fastpose.py:14-67`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnAct, DUC, ResBottleneck, pixel_shuffle


class SEResnet50(nn.Module):
    # `-dcn-` zoo configs enable DCN per stage (`SE_Resnet.py:147,171`).
    # `shuffle=True` gives the reference's ShuffleResnet
    # (`layers/ShuffleResnet.py:126-198`): identical SE-bottleneck
    # topology, but every strided conv2 downsamples by
    # PixelUnshuffle + stride-1 conv.  `depths` selects the bottleneck
    # architectures (resnet50/101/152: (3,4,6,3)/(3,4,23,3)/(3,8,36,3));
    # the BasicBlock resnet18 branch is out of scope (no FastPose head
    # accepts its 512-channel output).
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = False
    deformable_groups: int = 1
    shuffle: bool = False
    depths: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = ConvBnAct(64, 7, 2, act="relu", name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1),
                                                            (1, 1)))
        planes_strides = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for s, ((planes, stride), blocks) in enumerate(
                zip(planes_strides, self.depths)):
            for b in range(blocks):
                first = b == 0
                x = ResBottleneck(
                    planes, stride if first else 1,
                    downsample=first, se=first,
                    dcn=self.stage_with_dcn[s],
                    dcn_modulated=self.dcn_modulated,
                    deformable_groups=self.deformable_groups,
                    shuffle=self.shuffle,
                    name=f"layer{s + 1}_{b}")(x)
        return x                                        # (N, H/32, W/32, 2048)


class FastPose(nn.Module):
    num_joints: int = 26
    conv_dim: int = 128
    # (False, True, True, True) reproduces the `-dcn-` configs' backbone
    # (`256x192_res50_lr1e-3_2x-dcn-regression.yaml` STAGE_WITH_DCN).
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, 256, 192, 3) normalized crops -> (N, 64, 48, J)."""
        x = SEResnet50(stage_with_dcn=self.stage_with_dcn,
                       dcn_modulated=self.dcn_modulated,
                       name="preact")(x)
        x = pixel_shuffle(x, 2)                          # 512 @ /16
        x = DUC(1024, 2, name="duc1")(x)                 # 256 @ /8
        x = DUC(512 if self.conv_dim == 128 else 1024, 2,
                name="duc2")(x)                          # 128 @ /4
        return nn.Conv(self.num_joints, (3, 3), padding=1,
                       use_bias=True, name="conv_out")(x)
