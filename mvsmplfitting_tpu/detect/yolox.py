"""YOLOX person detector as batched NHWC flax inference.

Architecture matches the reference's YOLOX-X build (depth 1.33, width
1.25, 1 class — `yolox/yolox.py:163-167`): CSPDarknet backbone
(`yolox/models/darknet.py:97-179`) -> PAFPN neck
(`yolox/models/yolo_pafpn.py:12-116`) -> decoupled anchor-free head
(`yolox/models/yolo_head.py:145-253`), with the grid+stride decode and
class-agnostic NMS done in jnp.  The reference loops images through the
GPU one at a time; here the whole camera set is one batched jit call.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import ConvBnAct, CSPLayer, DWConv, Focus, SPPBottleneck


class CSPDarknet(nn.Module):
    depth_mul: float = 1.33
    width_mul: float = 1.25
    depthwise: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        w = lambda c: int(c * self.width_mul)
        d = lambda n: max(round(n * self.depth_mul), 1)

        x = Focus(w(64), 3, name="stem")(x)
        # dark2
        x = ConvBnAct(w(128), 3, 2, name="dark2_conv")(x)
        x = CSPLayer(w(128), d(3), depthwise=self.depthwise,
                     name="dark2_csp")(x)
        # dark3
        x = ConvBnAct(w(256), 3, 2, name="dark3_conv")(x)
        x = c3 = CSPLayer(w(256), d(9), depthwise=self.depthwise,
                          name="dark3_csp")(x)
        # dark4
        x = ConvBnAct(w(512), 3, 2, name="dark4_conv")(x)
        x = c4 = CSPLayer(w(512), d(9), depthwise=self.depthwise,
                          name="dark4_csp")(x)
        # dark5
        x = ConvBnAct(w(1024), 3, 2, name="dark5_conv")(x)
        x = SPPBottleneck(w(1024), name="dark5_spp")(x)
        c5 = CSPLayer(w(1024), d(3), shortcut=False,
                      depthwise=self.depthwise, name="dark5_csp")(x)
        return c3, c4, c5


def _upsample2(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class YOLOPAFPN(nn.Module):
    depth_mul: float = 1.33
    width_mul: float = 1.25
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        w = lambda c: int(c * self.width_mul)
        d = lambda n: max(round(n * self.depth_mul), 1)

        c3, c4, c5 = CSPDarknet(self.depth_mul, self.width_mul,
                                self.depthwise, name="backbone")(x)

        # top-down
        p5 = ConvBnAct(w(512), 1, 1, name="lateral_conv0")(c5)
        m4 = jnp.concatenate([_upsample2(p5), c4], axis=-1)
        m4 = CSPLayer(w(512), d(3), shortcut=False,
                      depthwise=self.depthwise, name="C3_p4")(m4)
        p4 = ConvBnAct(w(256), 1, 1, name="reduce_conv1")(m4)
        m3 = jnp.concatenate([_upsample2(p4), c3], axis=-1)
        out3 = CSPLayer(w(256), d(3), shortcut=False,
                        depthwise=self.depthwise, name="C3_p3")(m3)

        # bottom-up
        n3 = ConvBnAct(w(256), 3, 2, name="bu_conv2")(out3)
        m4b = jnp.concatenate([n3, p4], axis=-1)
        out4 = CSPLayer(w(512), d(3), shortcut=False,
                        depthwise=self.depthwise, name="C3_n3")(m4b)
        n4 = ConvBnAct(w(512), 3, 2, name="bu_conv1")(out4)
        m5 = jnp.concatenate([n4, p5], axis=-1)
        out5 = CSPLayer(w(1024), d(3), shortcut=False,
                        depthwise=self.depthwise, name="C3_n4")(m5)
        return out3, out4, out5


class YOLOXHead(nn.Module):
    num_classes: int = 1
    width_mul: float = 1.25
    strides: Tuple[int, ...] = (8, 16, 32)
    depthwise: bool = False
    apply_sigmoid: bool = True   # False -> raw obj/cls logits (training)

    @nn.compact
    def __call__(self, feats) -> jnp.ndarray:
        """Returns raw predictions (N, total_anchors, 5 + C)."""
        w = lambda c: int(c * self.width_mul)
        outputs = []
        Conv = DWConv if self.depthwise else ConvBnAct
        for i, f in enumerate(feats):
            x = ConvBnAct(w(256), 1, 1, name=f"stem{i}")(f)
            c = Conv(w(256), 3, 1, name=f"cls_conv{i}_0")(x)
            c = Conv(w(256), 3, 1, name=f"cls_conv{i}_1")(c)
            cls = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                          name=f"cls_pred{i}")(c)
            r = Conv(w(256), 3, 1, name=f"reg_conv{i}_0")(x)
            r = Conv(w(256), 3, 1, name=f"reg_conv{i}_1")(r)
            reg = nn.Conv(4, (1, 1), use_bias=True,
                          name=f"reg_pred{i}")(r)
            obj = nn.Conv(1, (1, 1), use_bias=True,
                          name=f"obj_pred{i}")(r)
            if self.apply_sigmoid:
                obj, cls = jax.nn.sigmoid(obj), jax.nn.sigmoid(cls)
            out = jnp.concatenate([reg, obj, cls], axis=-1)
            outputs.append(out.reshape(out.shape[0], -1, out.shape[-1]))
        return jnp.concatenate(outputs, axis=1)


class YOLOX(nn.Module):
    """Full detector; `__call__` returns decoded (N, A, 5+C) boxes.

    With `train_outputs=True` (same params), obj/cls stay LOGITS and the
    call returns `(decoded, raw_reg)` — the pair `yolox_loss.yolox_losses`
    consumes, mirroring the torch head's training branch
    (`yolo_head.py:145-219`: decoded xywh + logits + origin_preds).
    """

    num_classes: int = 1
    depth_mul: float = 1.33
    width_mul: float = 1.25
    input_hw: Tuple[int, int] = (800, 1440)
    train_outputs: bool = False

    @nn.compact
    def __call__(self, x):
        feats = YOLOPAFPN(self.depth_mul, self.width_mul,
                          name="fpn")(x)
        raw = YOLOXHead(self.num_classes, self.width_mul,
                        apply_sigmoid=not self.train_outputs,
                        name="head")(feats)
        decoded = decode_outputs(raw, self.input_hw)
        if self.train_outputs:
            return decoded, raw[..., :4]
        return decoded


def decode_outputs(raw: jnp.ndarray, input_hw: Tuple[int, int],
                   strides: Sequence[int] = (8, 16, 32)) -> jnp.ndarray:
    """Grid + stride decode (`yolo_head.py:238-253`).

    raw: (N, A, 5+C) with xy offsets and log-wh; returns center-xywh in
    input pixels.
    """
    h, w = input_hw
    grids = []
    strides_full = []
    for s in strides:
        hs, ws = h // s, w // s
        yy, xx = jnp.meshgrid(jnp.arange(hs), jnp.arange(ws),
                              indexing="ij")
        grid = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
        grids.append(grid)
        strides_full.append(jnp.full((grid.shape[0], 1), s))
    grid = jnp.concatenate(grids, axis=0)[None].astype(raw.dtype)
    stride = jnp.concatenate(strides_full, axis=0)[None].astype(raw.dtype)

    xy = (raw[..., :2] + grid) * stride
    wh = jnp.exp(raw[..., 2:4]) * stride
    return jnp.concatenate([xy, wh, raw[..., 4:]], axis=-1)


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray,
             iou_thresh: float = 0.45) -> List[int]:
    """Greedy class-agnostic NMS (host-side, tiny candidate sets)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = (np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0))
        a1 = ((boxes[i, 2] - boxes[i, 0]) *
              (boxes[i, 3] - boxes[i, 1]))
        a2 = ((boxes[rest, 2] - boxes[rest, 0]) *
              (boxes[rest, 3] - boxes[rest, 1]))
        iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return keep


def postprocess_boxes(decoded: np.ndarray, conf_thresh: float = 0.1,
                      nms_thresh: float = 0.45,
                      high_thresh: float = 0.46) -> np.ndarray:
    """One image's decoded preds -> kept person boxes (M, 5) xyxy+score.

    Mirrors `yolox/utils/boxes.py:33-71` + the predictor's two-band
    concatenation (`yolox/yolox.py:54-66`): boxes >= `high_thresh`
    stacked first, then the [conf_thresh, high_thresh) band — i.e. ALL
    boxes above `conf_thresh` survive, ordered high band first.
    """
    decoded = np.asarray(decoded)
    xy, wh = decoded[:, :2], decoded[:, 2:4]
    xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    cls_score = decoded[:, 5:].max(axis=-1)
    score = decoded[:, 4] * cls_score
    m = score >= conf_thresh
    if not m.any():
        return np.zeros((0, 5), np.float32)
    boxes, score = xyxy[m], score[m]
    keep = nms_xyxy(boxes, score, nms_thresh)
    boxes, score = boxes[keep], score[keep]
    order = np.concatenate([np.flatnonzero(score >= high_thresh),
                            np.flatnonzero(score < high_thresh)])
    boxes, score = boxes[order], score[order]
    return np.concatenate([boxes, score[:, None]],
                          axis=-1).astype(np.float32)
