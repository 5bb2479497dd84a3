"""HarDNet-68 pose network (harmonic dense blocks), NHWC flax.

Counterpart of the reference's `HarDNetPose`
(`alphapose_core/alphapose/models/hardnet.py:397-531`, NUM_LAYERS=68):
a HarDNet base (log2-linked dense blocks, `HarDBlock.get_link` at
`:100-118`), a bottom block fed with [x, avg9x9(x), x/sum(x)]
channel-attention-style concatenation, and three TransitionUp decoder
stages with skip concatenation and "SC" side channels that bypass to
the head.  All topology (links, channel counts) is computed in Python
exactly like the reference's recursion, so shapes match layer for
layer.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import batch_norm


def hard_link(layer: int, base_ch: int, growth_rate: int,
              grmul: float) -> Tuple[int, int, List[int]]:
    """The reference's `HarDBlock.get_link` recursion (`:100-118`)."""
    if layer == 0:
        return base_ch, 0, []
    out_channels = float(growth_rate)
    link = []
    for i in range(10):
        dv = 2 ** i
        if layer % dv == 0:
            link.append(layer - dv)
            if i > 0:
                out_channels *= grmul
    out_channels = int(int(out_channels + 1) / 2) * 2
    in_channels = 0
    for i in link:
        ch, _, _ = hard_link(i, base_ch, growth_rate, grmul)
        in_channels += ch
    return out_channels, in_channels, link


class ConvLayer(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.kernel // 2,
                    use_bias=False, name="conv")(x)
        x = batch_norm(self, name="norm")(x)
        return nn.relu(x)


class HarDBlock(nn.Module):
    in_channels: int
    growth_rate: int
    grmul: float = 1.7
    n_layers: int = 8
    keep_base: bool = False

    @staticmethod
    def out_ch(in_channels, growth_rate, grmul, n_layers,
               keep_base=False) -> int:
        total = in_channels if keep_base else 0
        for i in range(n_layers):
            outch, _, _ = hard_link(i + 1, in_channels, growth_rate,
                                    grmul)
            if (i % 2 == 0) or (i == n_layers - 1):
                total += outch
        return total

    @nn.compact
    def __call__(self, x):
        layers = [x]
        for i in range(self.n_layers):
            outch, _, link = hard_link(i + 1, self.in_channels,
                                       self.growth_rate, self.grmul)
            tin = [layers[k] for k in link]
            inp = tin[0] if len(tin) == 1 else jnp.concatenate(tin, -1)
            layers.append(ConvLayer(outch, 3, name=f"l{i}")(inp))

        t = len(layers)
        outs = [layers[i] for i in range(t)
                if (i == 0 and self.keep_base) or (i == t - 1) or
                (i % 2 == 1)]
        return jnp.concatenate(outs, -1)


def _avg_pool(x, k, s, pad=0):
    return nn.avg_pool(x, (k, k), strides=(s, s),
                       padding=((pad, pad), (pad, pad)))


def _resize_bilinear(x, hw):
    """align_corners=True bilinear, exactly the reference's
    `F.interpolate(..., mode='bilinear', align_corners=True)`
    (`hardnet.py:382-387,517-520`).  jax.image.resize is half-pixel
    (align_corners=False), so this is a separable corner-aligned
    gather instead."""
    N, H, W, C = x.shape
    h, w = hw
    if (h, w) == (H, W):
        return x
    ys = jnp.linspace(0.0, H - 1.0, h)
    xs = jnp.linspace(0.0, W - 1.0, w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wy = (ys - y0)[None, :, None, None]
    x = x[:, y0] * (1.0 - wy) + x[:, y1] * wy
    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wx = (xs - x0)[None, None, :, None]
    return x[:, :, x0] * (1.0 - wx) + x[:, :, x1] * wx


# HarDNet-68 tables (`hardnet.py:306-317,421-431`).
_BASE_CH = (32, 64)
_CH_LIST = (128, 256, 320, 640)
_GR = (14, 16, 20, 40)
_N_LAYERS = (8, 16, 16, 16)
_SKIP_NODES = (1, 3, 8, 11)
_SC = (32, 32, 0)
_GR_UP = (48, 32, 20)
_LAYERS_UP = (8, 8, 4)
_CH_LIST2 = (224 + 32, 96 + 32, 64 + 0)
_CHANNELS = (64, 124, 328, 654)
_SKIP_LV = 2


class HarDNetPose(nn.Module):
    """HarDNet-68 pose net; input (N, H, W, 3) -> heatmaps at H/4."""

    num_joints: int = 17
    final_kernel: int = 1

    @nn.compact
    def __call__(self, x):
        # ---- base (`HarDNetBase`, arch 68) ------------------------
        xs = []
        seq = 0

        def tick(val):
            nonlocal seq
            if seq in _SKIP_NODES:
                xs.append(val)
            seq += 1

        x = ConvLayer(_BASE_CH[0], 3, 2, name="base0")(x)
        tick(x)
        x = ConvLayer(_BASE_CH[1], 3, 1, name="base1")(x)
        tick(x)
        x = _avg_pool(x, 3, 2, pad=1)
        tick(x)

        ch = _BASE_CH[1]
        for i in range(4):
            x = HarDBlock(ch, _GR[i], 1.7, _N_LAYERS[i],
                          name=f"blk{i}")(x)
            ch = HarDBlock.out_ch(ch, _GR[i], 1.7, _N_LAYERS[i])
            tick(x)
            if i != 3:
                x = ConvLayer(_CH_LIST[i], 1, name=f"proj{i}")(x)
                tick(x)
            ch = _CH_LIST[i]
            if i == 0:
                x = _avg_pool(x, 2, 2)
                tick(x)
            elif i != 3 and i != 1:
                x = _avg_pool(x, 2, 2)
                tick(x)

        # ---- bottom (`HarDNetPose.__init__/forward`) --------------
        x = ConvLayer(192, 1, name="last_proj")(x)
        x = _avg_pool(x, 2, 2)
        x2 = _avg_pool(x, 9, 1, pad=4)
        x3 = x / (jnp.sum(x, axis=(1, 2), keepdims=True) + 0.1)
        x = jnp.concatenate([x, x2, x3], -1)          # 576 ch
        x = HarDBlock(576, 72, 1.7, 8, name="last_blk")(x)
        prev_ch = HarDBlock.out_ch(576, 72, 1.7, 8)

        # ---- decoder ----------------------------------------------
        x_sc = []
        for i in range(3):
            skip = xs[3 - i]
            x = _resize_bilinear(x, skip.shape[1:3])
            if i < _SKIP_LV:
                x = jnp.concatenate([x, skip], -1)
            x = ConvLayer(_CH_LIST2[i], 1, name=f"up_proj{i}")(x)
            if _SC[i] > 0:
                x_sc.append(x[..., -_SC[i]:])
                x = x[..., :-_SC[i]]
            x2 = _avg_pool(x, 9, 1, pad=4)
            x3 = x / (jnp.sum(x, axis=(1, 2), keepdims=True) + 0.1)
            x = jnp.concatenate([x, x2, x3], -1)
            cur = (_CH_LIST2[i] - _SC[i]) * 3
            x = HarDBlock(cur, _GR_UP[i], 1.7, _LAYERS_UP[i],
                          name=f"up_blk{i}")(x)

        scs = [x]
        for i in range(3):
            if _SC[i] > 0:
                scs.insert(0, _resize_bilinear(x_sc[i], x.shape[1:3]))
        x = jnp.concatenate(scs, -1)

        ch = max(128, self.num_joints * 4)
        x = nn.Conv(ch, (3, 3), padding=1, use_bias=True,
                    name="head0")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_joints,
                       (self.final_kernel, self.final_kernel),
                       padding=self.final_kernel // 2, use_bias=True,
                       name="head1")(x)
