"""Shared NHWC conv blocks for the detection nets (flax.linen).

Behavioral counterparts of `yolox/models/network_blocks.py:9-210` and
`alphapose_core/alphapose/models/layers/{SE_Resnet,SE_module,DUC}.py`,
written fresh for NHWC/TPU: SiLU conv blocks, CSP layers, Focus
(space-to-depth), SPP, SE bottlenecks, and DUC (conv + pixel-shuffle)
upsampling.  All BatchNorms run in inference mode (running statistics),
matching the converted checkpoints.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def batch_norm(mod: nn.Module, name: str, momentum: float = 0.9):
    """BatchNorm that trains iff the caller made `batch_stats` mutable.

    Inference (every converted-checkpoint path) applies variables
    immutably and gets running statistics, exactly as before.  The
    trainer (`detect/train.py`) applies with `mutable=['batch_stats']`
    and gets batch statistics + running-average updates with torch's
    BatchNorm2d semantics (momentum 0.1 torch == 0.9 flax, eps 1e-5).
    """
    train = mod.is_mutable_collection("batch_stats")
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=1e-5, name=name)


class ConvBnAct(nn.Module):
    """Conv -> BN (inference) -> activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    use_bias: bool = False
    name_prefix: str = ""

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=pad,
                    feature_group_count=self.groups,
                    use_bias=self.use_bias, name="conv")(x)
        # torch nn.BatchNorm2d default eps (both reference nets).
        x = batch_norm(self, name="bn")(x)
        if self.act == "silu":
            x = nn.silu(x)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "lrelu":
            x = nn.leaky_relu(x, 0.1)
        return x


class DWConv(nn.Module):
    """Depthwise + pointwise conv pair (`network_blocks.py:44-60`)."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = ConvBnAct(x.shape[-1], self.kernel, self.stride,
                      groups=x.shape[-1], name="dconv")(x)
        return ConvBnAct(self.features, 1, 1, name="pconv")(x)


class Bottleneck(nn.Module):
    """YOLOX CSP bottleneck (`network_blocks.py:63-88`)."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 1, 1, name="conv1")(x)
        conv2 = (DWConv(self.features, 3, 1, name="conv2")
                 if self.depthwise
                 else ConvBnAct(self.features, 3, 1, name="conv2"))
        y = conv2(y)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """Cross-stage-partial layer (`network_blocks.py:121-167`)."""

    features: int
    num_blocks: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        a = ConvBnAct(hidden, 1, 1, name="conv1")(x)
        b = ConvBnAct(hidden, 1, 1, name="conv2")(x)
        for i in range(self.num_blocks):
            a = Bottleneck(hidden, self.shortcut, 1.0, self.depthwise,
                           name=f"m{i}")(a)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBnAct(self.features, 1, 1, name="conv3")(y)


class Focus(nn.Module):
    """Space-to-depth stem (`network_blocks.py:170-192`)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        tl = x[:, 0::2, 0::2]
        bl = x[:, 1::2, 0::2]
        tr = x[:, 0::2, 1::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBnAct(self.features, self.kernel, 1, name="conv")(x)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (`network_blocks.py:91-118`).  The
    PAFPN path uses the silu default; the YOLOv3 Darknet-53 backbone
    builds it with ``activation="lrelu"`` (`darknet.py:66-80`)."""

    features: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    act: str = "silu"

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, 1, act=self.act, name="conv1")(x)
        pools = [x]
        for k in self.kernel_sizes:
            pools.append(nn.max_pool(
                x, (k, k), strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2))))
        x = jnp.concatenate(pools, axis=-1)
        return ConvBnAct(self.features, 1, 1, act=self.act,
                         name="conv2")(x)


# ---------------------------------------------------------------------------
# ResNet-SE blocks (FastPose backbone).
# ---------------------------------------------------------------------------

class SELayer(nn.Module):
    """Squeeze-excite, reduction=1 like the reference
    (`SE_module.py:10-24`)."""

    channels: int
    reduction: int = 1

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))                      # (N, C)
        y = nn.Dense(self.channels // self.reduction, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class DeformConvBlock(nn.Module):
    """The Bottleneck's DCN conv2 (`SE_Resnet.py:72-101,117-127`).

    A regular (zero-initialized) conv predicts the offsets — and the
    modulation mask for DCNv2, split as the reference Bottleneck does:
    offset = first 18*dg channels, mask = sigmoid of the last 9*dg
    (`SE_Resnet.py:121-125`) — then the deformable conv samples and
    contracts (see `deform_conv.py`).
    """

    planes: int
    stride: int = 1
    deformable_groups: int = 1
    modulated: bool = False

    @nn.compact
    def __call__(self, x):
        from .deform_conv import deform_conv2d

        dg = self.deformable_groups
        offc = dg * (27 if self.modulated else 18)
        om = nn.Conv(offc, (3, 3), strides=self.stride, padding=1,
                     use_bias=True,
                     kernel_init=nn.initializers.zeros,
                     name="conv2_offset")(x)
        w = self.param(
            "kernel", nn.initializers.kaiming_normal(),
            (3, 3, x.shape[-1], self.planes))
        if self.modulated:
            offset = om[..., :18 * dg]
            mask = nn.sigmoid(om[..., -9 * dg:])
        else:
            offset, mask = om, None
        return deform_conv2d(x, offset, w, stride=self.stride, padding=1,
                             deformable_groups=dg, mask=mask)


class ResBottleneck(nn.Module):
    """ResNet-50 bottleneck with optional SE and optional DCN conv2
    (`SE_Resnet.py:59-141`).

    `shuffle=True` gives the ShuffleResnet variant
    (`layers/ShuffleResnet.py:60-123`): a strided conv2 becomes
    PixelUnshuffle(stride) + a stride-1 3x3 conv (or DCN) over the
    4x-widened channels — downsampling by space-to-depth instead of
    discarding samples.
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    se: bool = False
    dcn: bool = False
    dcn_modulated: bool = False
    deformable_groups: int = 1
    shuffle: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ConvBnAct(self.planes, 1, 1, act="relu", name="conv1")(x)
        unshuffled = self.shuffle and self.stride > 1
        if unshuffled:
            out = pixel_unshuffle(out, self.stride)
        conv2_stride = 1 if unshuffled else self.stride
        if self.dcn:
            out = DeformConvBlock(self.planes, conv2_stride,
                                  self.deformable_groups,
                                  self.dcn_modulated, name="conv2")(out)
            out = batch_norm(self, name="bn2")(out)
            out = nn.relu(out)
        else:
            out = ConvBnAct(self.planes, 3, conv2_stride, act="relu",
                            name="conv2")(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = batch_norm(self, name="bn3")(out)
        if self.se:
            out = SELayer(self.planes * 4, name="se")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=self.stride, use_bias=False,
                               name="down_conv")(x)
            identity = batch_norm(self, name="down_bn")(identity)
        return nn.relu(out + identity)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC pixel shuffle matching torch's NCHW PixelShuffle.

    torch shuffles channel blocks [C_out, r, r]; converted NHWC weights
    keep torch channel order, so reshape accordingly.
    """
    n, h, w, c = x.shape
    r = factor
    co = c // (r * r)
    x = x.reshape(n, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)                    # n h r w r co
    return x.reshape(n, h * r, w * r, co)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC space-to-depth matching the reference's NCHW
    `layers/PixelUnshuffle.py:20-28`: output channel order is
    [c, row_offset, col_offset], i.e. channel ((c*r + i)*r + j) holds
    input channel c at spatial offset (i, j) — so torch-converted
    weights of the following conv apply unchanged.
    """
    n, h, w, c = x.shape
    r = factor
    oh, ow = h // r, w // r
    x = x.reshape(n, oh, r, ow, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)                    # n oh ow c r r
    return x.reshape(n, oh, ow, c * r * r)


class DUC(nn.Module):
    """Dense upsampling conv (`DUC.py:9-29`): conv-BN-ReLU + shuffle."""

    features: int
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        x = ConvBnAct(self.features, 3, 1, act="relu", name="conv")(x)
        return pixel_shuffle(x, self.factor)
