"""Deformable (PS-)RoI pooling as XLA gather + masked mean.

Replaces the reference's CUDA extension
(`alphapose_core/alphapose/models/layers/dcn/deform_pool.py:10-252`,
kernel `dcn/src/deform_pool_cuda_kernel.cu:53-144`) — the third and
last DCN op (after deform conv + RoIAlign).  Construction is TPU-first:
all RoIs' sample points are computed at once as a static
(N, OH, OW, S, S) coordinate grid, sampled with one batched bilinear
gather over the feature map, masked-averaged per bin, and routed
through the position-sensitive channel map with a single static
channel gather — no per-RoI loops, no dynamic shapes.

Semantics transcribed from `DeformablePSROIPoolForwardKernel`
(`deform_pool_cuda_kernel.cu:53-144`):
  - RoI corners are rounded, scaled, then shifted by -0.5; the end
    corner adds +1 before scaling; width/height clamp to >= 0.1.
  - Per output bin (ph, pw): sample_per_part^2 sub-samples; samples
    with w outside [-0.5, W-0.5] (or h likewise) are SKIPPED (they
    reduce the average's count, they are not zeros); in-range samples
    clamp to [0, dim-1] and bilinear-interpolate with floor/ceil
    corners; a bin with zero valid samples outputs 0.
  - The per-bin offset comes from a (part_size x part_size) `trans`
    table indexed by floor(ph/OH*P): trans * trans_std * roi_size.
  - Position-sensitive channel routing: output channel ctop at bin
    (ph, pw) reads input channel (ctop*gs + gh)*gs + gw with
    gh = clip(floor(ph*gs/OH)), i.e. data C == out_channels * gs^2.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_floor_ceil(flat: jnp.ndarray, H: int, W: int,
                         y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """`bilinear_interp` (`deform_pool_cuda_kernel.cu:31-51`): corners
    are floor/ceil (NOT floor/floor+1 — integer coords collapse to one
    texel), coords pre-clamped by the caller.

    flat: (N, H*W, C); y/x: (N, P).  Returns (N, P, C).
    """
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.ceil(y)
    x1 = jnp.ceil(x)
    dy = y - y0
    dx = x - x0
    iy0, ix0 = y0.astype(jnp.int32), x0.astype(jnp.int32)
    iy1, ix1 = y1.astype(jnp.int32), x1.astype(jnp.int32)

    def corner(iy, ix, w):
        lin = iy * W + ix
        v = jnp.take_along_axis(flat, lin[:, :, None], axis=1)
        return v * w[..., None]

    return (corner(iy0, ix0, (1 - dx) * (1 - dy))
            + corner(iy1, ix0, (1 - dx) * dy)
            + corner(iy0, ix1, dx * (1 - dy))
            + corner(iy1, ix1, dx * dy))


def deform_roi_pool(data: jnp.ndarray, rois: jnp.ndarray,
                    trans: Optional[jnp.ndarray], *,
                    out_size: int, out_channels: int,
                    spatial_scale: float, no_trans: bool = False,
                    group_size: int = 1,
                    part_size: Optional[int] = None,
                    sample_per_part: int = 4,
                    trans_std: float = 0.0) -> jnp.ndarray:
    """Deformable PS-RoI pooling forward.

    Args:
      data: (B, H, W, C) feature map (NHWC); C == out_channels *
        group_size**2 (position-sensitive) — group_size=1 gives plain
        deformable RoI pooling with C == out_channels.
      rois: (N, 5) rows [batch_idx, x1, y1, x2, y2] in image coords
        (pre-spatial_scale), like the CUDA op.
      trans: (N, num_classes*2, P, P) normalized bin offsets (the
        reference's NCHW layout kept verbatim: channel 2k = x of class
        k, 2k+1 = y), or None when no_trans.
      out_size / out_channels / spatial_scale / group_size / part_size
        / sample_per_part / trans_std: as the reference module
        (`deform_pool.py:83-110`); out must be square (`:26-29`).

    Returns:
      (N, out_size, out_size, out_channels).

    Gradients flow to both ``data`` and ``trans`` (the CUDA backward,
    `deform_pool_cuda_kernel.cu:146-264`, is jax.grad here for free).
    """
    B, H, W, C = data.shape
    N = rois.shape[0]
    OH = OW = int(out_size)
    P = int(out_size if part_size is None else part_size)
    S = int(sample_per_part)
    gs = int(group_size)
    if C != out_channels * gs * gs:
        raise ValueError(f"C={C} != out_channels*group_size^2 = "
                         f"{out_channels}*{gs}^2")

    f32 = jnp.float32
    rois = rois.astype(f32)
    batch_idx = rois[:, 0].astype(jnp.int32)
    # `deform_pool_cuda_kernel.cu:82-90`
    rs_w = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    rs_h = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    re_w = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    re_h = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(re_w - rs_w, 0.1)
    roi_h = jnp.maximum(re_h - rs_h, 0.1)
    bin_w = roi_w / OW                                        # (N,)
    bin_h = roi_h / OH
    sub_w = bin_w / S
    sub_h = bin_h / S

    ph = jnp.arange(OH, dtype=f32)
    pw = jnp.arange(OW, dtype=f32)
    if no_trans or trans is None:
        nc = 1
        tx = jnp.zeros((N, 1, OH, OW), f32)
        ty = jnp.zeros((N, 1, OH, OW), f32)
    else:
        nc = trans.shape[1] // 2
        part_h = jnp.floor(ph / OH * P).astype(jnp.int32)     # (OH,)
        part_w = jnp.floor(pw / OW * P).astype(jnp.int32)
        t = trans.astype(f32).reshape(N, nc, 2, P, P)
        t = t[:, :, :, part_h][:, :, :, :, part_w]            # (N,nc,2,OH,OW)
        tx = t[:, :, 0] * trans_std
        ty = t[:, :, 1] * trans_std

    # Bin start corners + per-class trans shift (`:106-110`).
    wstart = (pw[None, None, None, :] * bin_w[:, None, None, None]
              + rs_w[:, None, None, None] + tx * roi_w[:, None, None, None])
    hstart = (ph[None, None, :, None] * bin_h[:, None, None, None]
              + rs_h[:, None, None, None] + ty * roi_h[:, None, None, None])

    ss = jnp.arange(S, dtype=f32)
    # (N, nc, OH, OW, S, S): h varies over axis -2, w over axis -1.
    w = (wstart[..., None, None]
         + ss[None, None, None, None, None, :] * sub_w[:, None, None, None, None, None])
    h = (hstart[..., None, None]
         + ss[None, None, None, None, :, None] * sub_h[:, None, None, None, None, None])

    grid = (N, nc, OH, OW, S, S)
    w = jnp.broadcast_to(w, grid)
    h = jnp.broadcast_to(h, grid)
    valid = ((w >= -0.5) & (w <= W - 0.5)
             & (h >= -0.5) & (h <= H - 0.5))                  # `:120-125`
    wc = jnp.clip(w, 0.0, W - 1.0)
    hc = jnp.clip(h, 0.0, H - 1.0)

    feats = jnp.take(data.astype(f32), batch_idx, axis=0)     # (N,H,W,C)
    flat = feats.reshape(N, H * W, C)
    vals = _bilinear_floor_ceil(
        flat, H, W, hc.reshape(N, -1), wc.reshape(N, -1))
    vals = vals.reshape(N, nc, OH, OW, S, S, C)
    vmask = valid[..., None].astype(f32)
    ssum = jnp.sum(vals * vmask, axis=(4, 5))                 # (N,nc,OH,OW,C)
    cnt = jnp.sum(vmask, axis=(4, 5))
    avg = jnp.where(cnt > 0, ssum / jnp.maximum(cnt, 1.0), 0.0)

    # Position-sensitive channel routing (`:112-116,127`): output
    # channel ctop at (ph,pw) reads input channel (ctop*gs+gh)*gs+gw.
    gh = jnp.clip(jnp.floor(ph * gs / OH), 0, gs - 1).astype(jnp.int32)
    gw = jnp.clip(jnp.floor(pw * gs / OW), 0, gs - 1).astype(jnp.int32)
    ctop = jnp.arange(out_channels, dtype=jnp.int32)
    cmap = ((ctop[None, None, :] * gs + gh[:, None, None]) * gs
            + gw[None, :, None])                              # (OH,OW,out)
    routed = jnp.take_along_axis(
        avg, jnp.broadcast_to(cmap, (N, nc, OH, OW, out_channels)),
        axis=-1)                                              # (N,nc,OH,OW,out)

    # Per-output-channel class selection (`:101`): class_id = ctop //
    # (out_channels // num_classes).
    if nc == 1:
        return routed[:, 0]
    class_id = ctop // (out_channels // nc)                   # (out,)
    sel = jnp.take_along_axis(
        jnp.moveaxis(routed, 1, -1),                          # (N,OH,OW,out,nc)
        jnp.broadcast_to(class_id[None, None, None, :, None],
                         (N, OH, OW, out_channels, 1)), axis=-1)
    return sel[..., 0]


def _fc_stack(x: jnp.ndarray, n_layers: int, hidden: int, out: int,
              name: str, final_sigmoid: bool = False) -> jnp.ndarray:
    """The reference's Linear/ReLU offset (and mask) FC stacks with the
    zero-initialized final Linear (`deform_pool.py:134-147,211-228`) —
    so a freshly built pack module starts exactly at plain pooling."""
    for i in range(n_layers):
        last = i == n_layers - 1
        x = nn.Dense(out if last else hidden, name=f"{name}{i}",
                     kernel_init=(nn.initializers.zeros if last
                                  else nn.initializers.lecun_normal()),
                     bias_init=nn.initializers.zeros)(x)
        if not last:
            x = nn.relu(x)
        elif final_sigmoid:
            x = nn.sigmoid(x)
    return x


class DeformRoIPoolingPack(nn.Module):
    """`DeformRoIPoolingPack` (`deform_pool.py:113-172`): plain pool ->
    FC offset head -> deformable pool."""

    spatial_scale: float
    out_size: int
    out_channels: int
    no_trans: bool = False
    group_size: int = 1
    part_size: Optional[int] = None
    sample_per_part: int = 4
    trans_std: float = 0.0
    num_offset_fcs: int = 3
    deform_fc_channels: int = 1024

    def _pool(self, data, rois, trans, no_trans):
        return deform_roi_pool(
            data, rois, trans, out_size=self.out_size,
            out_channels=self.out_channels, no_trans=no_trans,
            spatial_scale=self.spatial_scale, group_size=self.group_size,
            part_size=self.part_size, sample_per_part=self.sample_per_part,
            trans_std=self.trans_std)

    @nn.compact
    def __call__(self, data: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        if self.no_trans:
            return self._pool(data, rois, None, True)
        n = rois.shape[0]
        x = self._pool(data, rois, None, True)
        off = _fc_stack(x.reshape(n, -1), self.num_offset_fcs,
                        self.deform_fc_channels,
                        self.out_size * self.out_size * 2, "offset_fc")
        off = off.reshape(n, 2, self.out_size, self.out_size)
        return self._pool(data, rois, off, False)


class ModulatedDeformRoIPoolingPack(DeformRoIPoolingPack):
    """`ModulatedDeformRoIPoolingPack` (`deform_pool.py:175-252`):
    adds a sigmoid mask FC head multiplying the pooled output."""

    num_mask_fcs: int = 2

    @nn.compact
    def __call__(self, data: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        if self.no_trans:
            return self._pool(data, rois, None, True)
        n = rois.shape[0]
        x = self._pool(data, rois, None, True)
        flat = x.reshape(n, -1)
        off = _fc_stack(flat, self.num_offset_fcs,
                        self.deform_fc_channels,
                        self.out_size * self.out_size * 2, "offset_fc")
        off = off.reshape(n, 2, self.out_size, self.out_size)
        mask = _fc_stack(flat, self.num_mask_fcs,
                         self.deform_fc_channels,
                         self.out_size * self.out_size, "mask_fc",
                         final_sigmoid=True)
        # torch (N,1,OH,OW) broadcast == NHWC (N,OH,OW,1).
        mask = mask.reshape(n, self.out_size, self.out_size, 1)
        return self._pool(data, rois, off, False) * mask
