"""RoIAlign as XLA gather + bilinear (no custom kernel needed on TPU).

Numerics match the reference CUDA op
(`alphapose_core/alphapose/utils/roi_align/src/roi_align_kernel.cu:64-124`),
which differs from torchvision's roi_align:

* roi ends are inclusive: ``roi_end = (coord + 1) * spatial_scale``;
* each pooled cell averages ``sample_num x sample_num`` bilinear taps at
  ``start + p*bin + (s+0.5)*bin/n``;
* ``sample_num <= 0`` is adaptive: ``ceil(roi_extent / pooled)`` taps
  per axis (data-dependent — emulated with a static upper bound and a
  tap mask, keeping the op jittable);
* out-of-range taps: 0 outside ``[-1, size]``, else coordinates clamp
  to ``[0, size-1]`` (`roi_align_kernel.cu:17-62`).

The op is dense data-parallel math — gathers and one weighted sum —
which is exactly what XLA fuses well; a Pallas kernel would buy nothing
(SURVEY §2.5 item 2).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _bilinear_kernel_weights(y: jnp.ndarray, x: jnp.ndarray,
                             height: int, width: int):
    """Corner indices + weights with the CUDA kernel's boundary rules."""
    valid = ((y >= -1.0) & (y <= height) & (x >= -1.0) & (x <= width))
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(y.astype(jnp.int32), height - 1)
    x_low = jnp.minimum(x.astype(jnp.int32), width - 1)
    # y_low >= height-1 -> both corners pinned to height-1 and y snapped.
    y = jnp.where(y_low >= height - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x_low >= width - 1, x_low.astype(x.dtype), x)
    y_high = jnp.minimum(y_low + 1, height - 1)
    x_high = jnp.minimum(x_low + 1, width - 1)

    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    w = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx], axis=-1)
    w = w * valid[..., None]
    iy = jnp.stack([y_low, y_low, y_high, y_high], axis=-1)
    ix = jnp.stack([x_low, x_high, x_low, x_high], axis=-1)
    return iy, ix, w


def roi_align(features: jnp.ndarray, rois: jnp.ndarray,
              out_size: Tuple[int, int], spatial_scale: float = 1.0,
              sample_num: int = 0, max_samples: int = 8) -> jnp.ndarray:
    """RoIAlign forward.

    Args:
      features: (B, H, W, C) feature map (NHWC — TPU-native layout).
      rois: (N, 5) rows [batch_index, x1, y1, x2, y2].
      out_size: (out_h, out_w) pooled size.
      sample_num: taps per axis per cell; <= 0 selects the reference's
        adaptive count, bounded by `max_samples` (static).
      max_samples: static tap bound for the adaptive mode.

    Returns:
      (N, out_h, out_w, C) pooled features.
    """
    B, H, W, C = features.shape
    out_h, out_w = out_size
    dtype = features.dtype

    batch_idx = rois[:, 0].astype(jnp.int32)                  # (N,)
    start_w = rois[:, 1] * spatial_scale
    start_h = rois[:, 2] * spatial_scale
    end_w = (rois[:, 3] + 1.0) * spatial_scale
    end_h = (rois[:, 4] + 1.0) * spatial_scale
    roi_w = jnp.maximum(end_w - start_w, 0.0)
    roi_h = jnp.maximum(end_h - start_h, 0.0)
    bin_h = roi_h / out_h                                      # (N,)
    bin_w = roi_w / out_w

    if sample_num > 0:
        n_h = jnp.full_like(bin_h, sample_num)
        n_w = jnp.full_like(bin_w, sample_num)
        S = sample_num
    else:
        n_h = jnp.minimum(jnp.ceil(roi_h / out_h), max_samples)
        n_w = jnp.minimum(jnp.ceil(roi_w / out_w), max_samples)
        n_h = jnp.maximum(n_h, 1.0)
        n_w = jnp.maximum(n_w, 1.0)
        S = max_samples

    ph = jnp.arange(out_h, dtype=dtype)                        # (OH,)
    pw = jnp.arange(out_w, dtype=dtype)
    s = jnp.arange(S, dtype=dtype) + 0.5                       # (S,)

    # y[n, ph, iy] = start_h + ph*bin + (iy+.5)*bin/n_h  (kernel :105-116)
    y = (start_h[:, None, None] + ph[None, :, None] * bin_h[:, None, None]
         + s[None, None, :] * bin_h[:, None, None] / n_h[:, None, None])
    x = (start_w[:, None, None] + pw[None, :, None] * bin_w[:, None, None]
         + s[None, None, :] * bin_w[:, None, None] / n_w[:, None, None])
    tap_h = (jnp.arange(S)[None, :] < n_h[:, None]).astype(dtype)  # (N, S)
    tap_w = (jnp.arange(S)[None, :] < n_w[:, None]).astype(dtype)

    # Full sample grid: (N, OH, OW, S, S)
    yy = y[:, :, None, :, None]
    xx = x[:, None, :, None, :]
    yy, xx = jnp.broadcast_arrays(
        jnp.broadcast_to(yy, (len(rois), out_h, out_w, S, S)),
        jnp.broadcast_to(xx, (len(rois), out_h, out_w, S, S)))

    iy, ix, w = _bilinear_kernel_weights(yy, xx, H, W)  # (...,4)
    flat = features.reshape(B, H * W, C)
    per_roi = flat[batch_idx]                                 # (N, H*W, C)
    lin = iy * W + ix                                         # (N,OH,OW,S,S,4)
    vals = jnp.take_along_axis(
        per_roi[:, :, None, :],
        lin.reshape(len(rois), -1)[:, :, None, None],
        axis=1)[:, :, 0, :]                                   # (N, P, C)
    vals = vals.reshape(lin.shape + (C,))
    tap = tap_h[:, None, None, :, None] * tap_w[:, None, None, None, :]
    w = w * tap[..., None]
    out = jnp.einsum("nhwabk,nhwabkc->nhwc", w, vals)
    denom = (n_h * n_w)[:, None, None, None]
    return (out / denom).astype(dtype)


# Crop preprocessing constants of `SimpleTransform.align_transform`
# (`simple_transform.py:105-124`): RGB mean subtraction then RoIAlign on
# the aspect-clipped boxes with the adaptive sample count
# (`simple_transform.py:80`: sample_num=-1).
RGB_MEANS = (0.406, 0.457, 0.480)


def clip_aspect_ratio(boxes: jnp.ndarray,
                      aspect_ratio: float) -> jnp.ndarray:
    """(N,4) xyxy -> (N,5) [0, x1,y1,x2,y2] grown to the aspect ratio
    about the box center (`bbox.py:229-251`)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    w = x2 - x1
    h = y2 - y1
    cx = x1 + 0.5 * w
    cy = y1 + 0.5 * h
    h = jnp.where(w > aspect_ratio * h, w / aspect_ratio, h)
    w = jnp.where(w < aspect_ratio * h, h * aspect_ratio, w)
    zeros = jnp.zeros_like(w)
    return jnp.stack([zeros, cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=1)


def align_transform(image: jnp.ndarray, boxes: jnp.ndarray,
                    out_size: Tuple[int, int],
                    max_samples: int = 8
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RoIAlign-based crop of person boxes from one image.

    Args:
      image: (H, W, 3) RGB float in [0, 1].
      boxes: (N, 4) xyxy person boxes.
      out_size: (out_h, out_w) crop size (the model input size).

    Returns:
      crops (N, out_h, out_w, 3) mean-subtracted, and the aspect-clipped
      boxes (N, 4) used (for coordinate back-transform).
    """
    aspect = float(out_size[1]) / float(out_size[0])          # w / h
    img = image - jnp.asarray(RGB_MEANS, image.dtype)
    rois = clip_aspect_ratio(boxes, aspect)
    crops = roi_align(img[None], rois, out_size, spatial_scale=1.0,
                      sample_num=-1, max_samples=max_samples)
    return crops, rois[:, 1:]
