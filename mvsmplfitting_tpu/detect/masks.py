"""Native COCO mask API (the pycocotools subset the pipeline touches).

The reference turns COCO segmentation annotations into binary masks
through pycocotools (`code/utils/module_utils.py:20-45` ``annToMask``:
polygons / uncompressed RLE -> RLE -> decode).  pycocotools is not
available in this environment, so the mask *data contracts* are
implemented natively from the COCO mask representation:

* compressed RLE strings — the 6-bit varint codec with delta-coded
  counts (maskApi ``rleToString``/``rleFrString`` semantics, including
  the ``i > 2`` delta-start quirk);
* uncompressed RLE — ``{"counts": [..], "size": [h, w]}``;
* polygon rasterization — maskApi ``rleFrPoly`` semantics: vertices
  upsampled x5, boundary traced with the integer line walk, column
  crossings downsampled, mask filled by crossing parity (column-major
  order throughout, as COCO specifies);
* merge (union/intersection), area, and the ``annToMask`` dispatch.

Everything is plain numpy on the host — mask decoding is data-layer
work that feeds the jitted device pipeline, not device math.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

__all__ = [
    "rle_decode", "rle_encode", "counts_to_string", "string_to_counts",
    "poly_to_rle", "merge_rles", "rle_area", "ann_to_mask",
]


def counts_to_string(counts: Sequence[int]) -> str:
    """Compress an RLE counts array to the COCO 6-bit varint string.

    Counts after the first two are delta-coded against ``counts[i-2]``
    (same-parity previous run).  Matches maskApi ``rleToString``,
    including its ``i > 2`` (not ``>= 2``) delta start.
    """
    out = []
    counts = list(int(c) for c in counts)
    for i, c in enumerate(counts):
        x = c - counts[i - 2] if i > 2 else c
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
    return "".join(out)


def string_to_counts(s: Union[str, bytes]) -> np.ndarray:
    """Inverse of :func:`counts_to_string`."""
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    p = 0
    while p < len(s):
        x, k = 0, 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def _counts_of(rle: dict) -> np.ndarray:
    c = rle["counts"]
    if isinstance(c, (str, bytes)):
        return string_to_counts(c)
    return np.asarray(c, np.int64)


def rle_decode(rle: dict) -> np.ndarray:
    """RLE dict ``{"size": [h, w], "counts": str | list}`` -> (h, w)
    uint8 mask.  Counts alternate 0-runs / 1-runs over the
    column-major (Fortran) flattening."""
    h, w = int(rle["size"][0]), int(rle["size"][1])
    counts = np.asarray(_counts_of(rle), np.int64)
    # Vectorized run expansion (parity-alternating runs): np.repeat of
    # the 0/1 run values — O(runs) python work was the round-4 advisor
    # note; this is pure numpy regardless of mask density.
    vals = np.zeros(counts.size, np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if flat.size != h * w:
        raise ValueError(f"RLE counts sum {flat.size} != h*w {h * w}")
    return flat.reshape(w, h).T  # column-major


def rle_encode(mask: np.ndarray, compress: bool = True) -> dict:
    """(h, w) binary mask -> RLE dict (compressed string by default)."""
    mask = np.asarray(mask)
    h, w = mask.shape
    flat = (mask.T.reshape(-1) != 0).astype(np.int8)  # column-major
    # Run lengths, always starting with a (possibly empty) 0-run.
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds).tolist() if flat.size else [0]
    if flat.size and flat[0] == 1:
        runs = [0] + runs
    counts = runs
    return {"size": [h, w],
            "counts": counts_to_string(counts) if compress else counts}


def rle_area(rle: dict) -> int:
    """Foreground pixel count (sum of the 1-runs)."""
    return int(_counts_of(rle)[1::2].sum())


def poly_to_rle(xy: Sequence[float], h: int, w: int) -> dict:
    """Rasterize one polygon (flat [x0, y0, x1, y1, ...]) to RLE with
    maskApi ``rleFrPoly`` semantics (x5 upsampled boundary walk,
    column-crossing parity fill)."""
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    k = xy.shape[0]
    scale = 5.0
    # C casts truncate toward zero.
    x = np.trunc(scale * xy[:, 0] + 0.5).astype(np.int64)
    y = np.trunc(scale * xy[:, 1] + 0.5).astype(np.int64)
    x = np.append(x, x[0])
    y = np.append(y, y[0])

    us: List[np.ndarray] = []
    vs: List[np.ndarray] = []
    for j in range(k):
        xs, xe, ys, ye = int(x[j]), int(x[j + 1]), int(y[j]), int(y[j + 1])
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe = xe, xs
            ys, ye = ye, ys
        if dx >= dy:
            s = (ye - ys) / dx if dx else 0.0
            d = np.arange(dx + 1)
            t = (dx - d) if flip else d
            us.append(t + xs)
            vs.append(np.trunc(ys + s * t + 0.5).astype(np.int64))
        else:
            s = (xe - xs) / dy if dy else 0.0
            d = np.arange(dy + 1)
            t = (dy - d) if flip else d
            vs.append(t + ys)
            us.append(np.trunc(xs + s * t + 0.5).astype(np.int64))
    u = np.concatenate(us)
    v = np.concatenate(vs)

    # Column crossings, downsampled back to pixel coordinates.
    pts_x: List[int] = []
    pts_y: List[int] = []
    for j in range(1, u.size):
        if u[j] == u[j - 1]:
            continue
        xd = float(u[j] if u[j] < u[j - 1] else u[j] - 1)
        xd = (xd + 0.5) / scale - 0.5
        if np.floor(xd) != xd or xd < 0 or xd > w - 1:
            continue
        yd = float(min(v[j], v[j - 1]))
        yd = (yd + 0.5) / scale - 0.5
        yd = min(max(yd, 0.0), float(h))
        pts_x.append(int(xd))
        pts_y.append(int(np.ceil(yd)))

    # Crossing parity -> RLE over the column-major flattening.
    a = np.asarray(pts_x, np.int64) * h + np.asarray(pts_y, np.int64)
    a = np.sort(np.append(a, h * w))
    diffs = np.empty_like(a)
    diffs[0] = a[0]
    diffs[1:] = a[1:] - a[:-1]
    b: List[int] = [int(diffs[0])]
    j = 1
    while j < diffs.size:
        if diffs[j] > 0:
            b.append(int(diffs[j]))
            j += 1
        else:  # zero-length run: fold the next run into the previous
            j += 1
            if j < diffs.size:
                b[-1] += int(diffs[j])
                j += 1
    return {"size": [h, w], "counts": counts_to_string(b)}


def merge_rles(rles: Sequence[dict], intersect: bool = False) -> dict:
    """Union (default) or intersection of RLEs, as one compressed RLE."""
    if not rles:
        raise ValueError("merge_rles: empty input")
    m = rle_decode(rles[0]).astype(bool)
    for r in rles[1:]:
        m = (m & rle_decode(r).astype(bool)) if intersect else \
            (m | rle_decode(r).astype(bool))
    return rle_encode(m.astype(np.uint8))


def ann_to_mask(segm, height: int, width: int) -> np.ndarray:
    """COCO annotation segmentation -> (h, w) uint8 binary mask.

    Dispatch mirrors the reference's ``annToMask``
    (`code/utils/module_utils.py:20-45`): a list is polygons (parts
    merged by union), a dict with a list ``counts`` is uncompressed
    RLE, anything else is compressed RLE.
    """
    if isinstance(segm, list):
        rles = [poly_to_rle(p, height, width) for p in segm]
        return rle_decode(merge_rles(rles))
    if isinstance(segm.get("counts"), list):
        return rle_decode({"size": [height, width],
                           "counts": segm["counts"]})
    return rle_decode(segm)
