"""Deformable convolution v1/v2 as XLA offset-gather + one matmul.

Replaces the reference's CUDA extension
(`alphapose_core/alphapose/models/layers/dcn/deform_conv.py:12-337`,
kernels `dcn/src/deform_conv_cuda_kernel.cu`) for the `-dcn-` pose-zoo
configs.  Construction is TPU-first (SURVEY §2.5 item 3): per output
position and kernel tap, sample the input at
``p = p0 + dilation*(i,j) + offset`` with zero-padded bilinear
interpolation (`deform_conv_cuda_kernel.cu:153-183`: taps gate to zero
unless ``-1 < p < size``), multiply by the modulation mask (v2), then
contract all taps x input channels against the weights in a single
(B*OH*OW, kh*kw*Cin) @ (kh*kw*Cin, Cout) matmul that tiles onto the MXU.

Layouts are channel-last (NHWC) to match the rest of the detect stack;
the offset/mask channel order is the reference's
[group][tap][h,w] / [group][tap] moved to the last axis, so converted
torch weights drop in after a transpose.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _bilinear_zero_pad(images: jnp.ndarray, y: jnp.ndarray,
                       x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded bilinear sampling.

    images: (B, H, W, C); y/x: (B, P) sample coordinates.
    Returns (B, P, C).  Matches `deformable_im2col_bilinear`
    (`deform_conv_cuda_kernel.cu:153-183`): corners outside the image
    contribute zero, and the whole tap is zero unless -1 < p < size.
    """
    B, H, W, C = images.shape
    valid = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    ly = y - y0
    lx = x - x0
    iy0 = y0.astype(jnp.int32)
    ix0 = x0.astype(jnp.int32)

    flat = images.reshape(B, H * W, C)

    def corner(iy, ix, w):
        ok = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        v = jnp.take_along_axis(flat, lin[:, :, None], axis=1)
        return v * (w * ok)[..., None]

    out = (corner(iy0, ix0, (1 - ly) * (1 - lx))
           + corner(iy0, ix0 + 1, (1 - ly) * lx)
           + corner(iy0 + 1, ix0, ly * (1 - lx))
           + corner(iy0 + 1, ix0 + 1, ly * lx))
    return out * valid[..., None]


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
                  stride=1, padding=0, dilation=1, groups: int = 1,
                  deformable_groups: int = 1,
                  mask: Optional[jnp.ndarray] = None,
                  bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Deformable conv forward (v1; pass `mask` for modulated v2).

    Args:
      x: (B, H, W, Cin).
      offset: (B, OH, OW, dg*kh*kw*2), last axis ordered
        [group][tap i*kw+j][dy, dx] (reference layout,
        `deform_conv_cuda_kernel.cu:215-224`, channels moved last).
      weight: (kh, kw, Cin // groups, Cout) (flax HWIO).
      mask: optional (B, OH, OW, dg*kh*kw) modulation (DCNv2,
        `deform_conv.py:118-165`).
      bias: optional (Cout,) (v2 only in the reference).

    Returns:
      (B, OH, OW, Cout).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    dg = deformable_groups
    OH = (H + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    OW = (W + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    K = kh * kw

    # Sample coordinates: p0 + dilation*tap + offset, per deform group.
    oy = jnp.arange(OH) * sh - ph                              # (OH,)
    ox = jnp.arange(OW) * sw - pw
    ty = (jnp.arange(kh) * dh)[:, None].repeat(kw, 1).reshape(-1)  # (K,)
    tx = (jnp.arange(kw) * dw)[None, :].repeat(kh, 0).reshape(-1)

    off = offset.reshape(B, OH, OW, dg, K, 2)
    y = (oy[None, :, None, None, None] + ty[None, None, None, None, :]
         + off[..., 0])                                        # (B,OH,OW,dg,K)
    xs = (ox[None, None, :, None, None] + tx[None, None, None, None, :]
          + off[..., 1])

    cg = Cin // dg  # channels per deformable group
    xg = x.reshape(B, H, W, dg, cg)
    cols = []
    for g in range(dg):  # dg is small (1-4); unrolled at trace time
        v = _bilinear_zero_pad(xg[..., g, :],
                               y[..., g, :].reshape(B, -1),
                               xs[..., g, :].reshape(B, -1))
        cols.append(v.reshape(B, OH, OW, K, cg))
    col = jnp.concatenate(
        [c[..., None, :] for c in cols], axis=-2)              # (B,OH,OW,K,dg,cg)

    if mask is not None:
        m = mask.reshape(B, OH, OW, dg, K)
        col = col * jnp.moveaxis(m, 3, 4)[..., None]

    col = col.reshape(B, OH, OW, K, Cin)
    if groups == 1:
        out = jnp.einsum("bhwkc,kco->bhwo",
                         col, weight.reshape(K, Cin, Cout))
    else:
        cg2 = Cin // groups
        og = Cout // groups
        colg = col.reshape(B, OH, OW, K, groups, cg2)
        wg = weight.reshape(K, cg2, groups, og)
        out = jnp.einsum("bhwkgc,kcgo->bhwgo", colg, wg
                         ).reshape(B, OH, OW, Cout)
    if bias is not None:
        out = out + bias
    return out


def dcn_offset_mask_split(conv_out: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a conv_offset_mask output into (offset, sigmoid mask).

    DCNv2's pack layer predicts 3*dg*kh*kw channels that the reference
    chunks into (o1, o2, mask), re-concatenating offset = cat(o1, o2)
    before the kernel interprets it as [group][tap][dy, dx] interleaved
    (`deform_conv.py:330-337`).  The same channel mapping is reproduced
    verbatim so converted `-dcn-` checkpoints drop in.
    """
    o1, o2, m = jnp.split(conv_out, 3, axis=-1)    # each (..., dg*K)
    offset = jnp.concatenate([o1, o2], axis=-1)
    return offset, 1.0 / (1.0 + jnp.exp(-m))
