"""RoIAlign + deformable conv: parity vs exact kernel-semantics oracles.

The reference ops are CUDA-only (their CPU paths raise
NotImplementedError — `roi_align.py:27`, `deform_conv.py:44`), so the
oracles here are direct numpy transcriptions of the CUDA kernels'
documented math (`roi_align_kernel.cu:17-124`,
`deform_conv_cuda_kernel.cu:153-254`), plus structural property checks
(zero-offset DCN == regular conv; whole-image unit ROI == bilinear
resample).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.detect.deform_conv import (dcn_offset_mask_split,
                                                  deform_conv2d)
from mvsmplfitting_tpu.detect.roi_align import (align_transform,
                                                clip_aspect_ratio,
                                                roi_align)


# --------------------------------------------------------------------------
# Oracles: numpy transcriptions of the CUDA kernels.
# --------------------------------------------------------------------------

def _bilinear_roialign(data, height, width, y, x):
    """`bilinear_interpolate` (`roi_align_kernel.cu:17-62`)."""
    if y < -1.0 or y > height or x < -1.0 or x > width:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= height - 1:
        y_high = y_low = height - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= width - 1:
        x_high = x_low = width - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (hy * hx * data[y_low, x_low] + hy * lx * data[y_low, x_high]
            + ly * hx * data[y_high, x_low]
            + ly * lx * data[y_high, x_high])


def roi_align_oracle(features, rois, out_size, spatial_scale, sample_num):
    """`ROIAlignForward` (`roi_align_kernel.cu:64-124`), NHWC in/out."""
    B, H, W, C = features.shape
    oh, ow = out_size
    N = rois.shape[0]
    out = np.zeros((N, oh, ow, C), np.float32)
    for n in range(N):
        b = int(rois[n, 0])
        sw = rois[n, 1] * spatial_scale
        sh = rois[n, 2] * spatial_scale
        ew = (rois[n, 3] + 1) * spatial_scale
        eh = (rois[n, 4] + 1) * spatial_scale
        rw = max(ew - sw, 0.0)
        rh = max(eh - sh, 0.0)
        bh, bw = rh / oh, rw / ow
        nh = sample_num if sample_num > 0 else int(np.ceil(rh / oh))
        nw = sample_num if sample_num > 0 else int(np.ceil(rw / ow))
        nh, nw = max(nh, 1), max(nw, 1)
        for c in range(C):
            img = features[b, :, :, c]
            for ph in range(oh):
                for pw in range(ow):
                    acc = 0.0
                    for iy in range(nh):
                        yy = sh + ph * bh + (iy + 0.5) * bh / nh
                        for ix in range(nw):
                            xx = sw + pw * bw + (ix + 0.5) * bw / nw
                            acc += _bilinear_roialign(img, H, W, yy, xx)
                    out[n, ph, pw, c] = acc / (nh * nw)
    return out


def _bilinear_dcn(img, h, w):
    """`deformable_im2col_bilinear` (`deform_conv_cuda_kernel.cu:153-183`)."""
    H, W = img.shape
    h0, w0 = int(np.floor(h)), int(np.floor(w))
    lh, lw = h - h0, w - w0
    val = 0.0
    for dy, wy in ((0, 1 - lh), (1, lh)):
        for dx, wx in ((0, 1 - lw), (1, lw)):
            yy, xx = h0 + dy, w0 + dx
            if 0 <= yy < H and 0 <= xx < W:
                val += wy * wx * img[yy, xx]
    return val


def deform_conv_oracle(x, offset, weight, stride, padding, dilation,
                       groups, dg, mask=None, bias=None):
    """`deformable_im2col` + matmul (`deform_conv_cuda_kernel.cu:186-254`).

    NHWC x/offset/mask; HWIO weight — same layouts as the op under test.
    """
    B, H, W, Cin = x.shape
    kh, kw, cpg, Cout = weight.shape
    OH = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    OW = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    K = kh * kw
    off = offset.reshape(B, OH, OW, dg, K, 2)
    cgd = Cin // dg
    out = np.zeros((B, OH, OW, Cout), np.float32)
    col = np.zeros((B, OH, OW, K, Cin), np.float32)
    for b in range(B):
        for ohh in range(OH):
            for oww in range(OW):
                for i in range(kh):
                    for j in range(kw):
                        t = i * kw + j
                        for c in range(Cin):
                            g = c // cgd
                            hh = (ohh * stride - padding + i * dilation
                                  + off[b, ohh, oww, g, t, 0])
                            ww = (oww * stride - padding + j * dilation
                                  + off[b, ohh, oww, g, t, 1])
                            v = 0.0
                            if -1 < hh < H and -1 < ww < W:
                                v = _bilinear_dcn(x[b, :, :, c], hh, ww)
                            if mask is not None:
                                v *= mask.reshape(
                                    B, OH, OW, dg, K)[b, ohh, oww, g, t]
                            col[b, ohh, oww, t, c] = v
    og = Cout // groups
    cg2 = Cin // groups
    for g in range(groups):
        w_g = weight[:, :, :, g * og:(g + 1) * og].reshape(K * cg2, og)
        c_g = col[..., g * cg2:(g + 1) * cg2].reshape(B, OH, OW, K * cg2)
        out[..., g * og:(g + 1) * og] = c_g @ w_g
    if bias is not None:
        out = out + bias
    return out


# --------------------------------------------------------------------------
# RoIAlign
# --------------------------------------------------------------------------

class TestRoIAlign:
    @pytest.mark.parametrize("sample_num", [2, 1, -1])
    def test_matches_cuda_kernel_oracle(self, rng, sample_num):
        feats = rng.standard_normal((2, 13, 11, 3)).astype(np.float32)
        rois = np.asarray([
            [0, 1.2, 0.7, 8.3, 9.9],
            [1, -2.0, 3.0, 14.0, 12.5],   # out-of-bounds roi
            [0, 4.0, 4.0, 4.0, 4.0],      # degenerate
        ], np.float32)
        got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                                   (4, 5), spatial_scale=0.5,
                                   sample_num=sample_num, max_samples=8))
        want = roi_align_oracle(feats, rois, (4, 5), 0.5, sample_num)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_jit_and_batch(self, rng):
        feats = jnp.asarray(
            rng.standard_normal((1, 32, 24, 8)).astype(np.float32))
        rois = jnp.asarray([[0, 2.0, 3.0, 20.0, 30.0]], jnp.float32)
        f = jax.jit(lambda a, b: roi_align(a, b, (8, 6), 1.0, 2))
        out = f(feats, rois)
        assert out.shape == (1, 8, 6, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_align_transform_pipeline(self, rng):
        img = jnp.asarray(rng.random((64, 48, 3)).astype(np.float32))
        boxes = jnp.asarray([[10.0, 5.0, 30.0, 60.0]])
        crops, new_boxes = align_transform(img, boxes, (32, 24))
        assert crops.shape == (1, 32, 24, 3)
        # aspect-clipped to w/h = 0.75 about the same center
        nb = np.asarray(new_boxes)[0]
        w, h = nb[2] - nb[0], nb[3] - nb[1]
        np.testing.assert_allclose(w / h, 24.0 / 32.0, rtol=1e-5)
        np.testing.assert_allclose((nb[0] + nb[2]) / 2, 20.0, rtol=1e-5)

    def test_clip_aspect_ratio_matches_reference_semantics(self):
        # `bbox.py:229-251`: grow the short side, keep center.
        boxes = jnp.asarray([[0.0, 0.0, 40.0, 10.0],
                             [0.0, 0.0, 10.0, 40.0]])
        out = np.asarray(clip_aspect_ratio(boxes, 1.0))
        np.testing.assert_allclose(out[0], [0, 0, -15, 40, 25], atol=1e-5)
        np.testing.assert_allclose(out[1], [0, -15, 0, 25, 40], atol=1e-5)


# --------------------------------------------------------------------------
# Deformable conv
# --------------------------------------------------------------------------

class TestDeformConv:
    def test_zero_offset_equals_regular_conv(self, rng):
        x = rng.standard_normal((2, 9, 9, 4)).astype(np.float32)
        w = (0.3 * rng.standard_normal((3, 3, 4, 6))).astype(np.float32)
        offset = np.zeros((2, 9, 9, 18), np.float32)
        got = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w),
            stride=1, padding=1))
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-4)

    @pytest.mark.parametrize("stride,padding,dilation,dgroups", [
        (1, 1, 1, 1), (2, 1, 1, 2), (1, 2, 2, 1),
    ])
    def test_matches_cuda_kernel_oracle(self, rng, stride, padding,
                                        dilation, dgroups):
        x = rng.standard_normal((2, 8, 7, 4)).astype(np.float32)
        w = (0.3 * rng.standard_normal((3, 3, 4, 5))).astype(np.float32)
        OH = (8 + 2 * padding - (dilation * 2 + 1)) // stride + 1
        OW = (7 + 2 * padding - (dilation * 2 + 1)) // stride + 1
        offset = (1.5 * rng.standard_normal(
            (2, OH, OW, dgroups * 9 * 2))).astype(np.float32)
        got = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w),
            stride=stride, padding=padding, dilation=dilation,
            deformable_groups=dgroups))
        want = deform_conv_oracle(x, offset, w, stride, padding, dilation,
                                  1, dgroups)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_modulated_v2_with_mask_bias_groups(self, rng):
        x = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
        w = (0.3 * rng.standard_normal((3, 3, 2, 6))).astype(np.float32)
        offset = (1.0 * rng.standard_normal((1, 6, 6, 18))
                  ).astype(np.float32)
        mask = rng.random((1, 6, 6, 9)).astype(np.float32)
        bias = rng.standard_normal(6).astype(np.float32)
        got = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w),
            stride=1, padding=1, groups=2, deformable_groups=1,
            mask=jnp.asarray(mask), bias=jnp.asarray(bias)))
        want = deform_conv_oracle(x, offset, w, 1, 1, 1, 2, 1,
                                  mask=mask, bias=bias)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_offset_mask_split_matches_pack(self, rng):
        """chunk->cat->sigmoid exactly like ModulatedDeformConvPack
        (`deform_conv.py:330-337`)."""
        conv_out = rng.standard_normal((1, 4, 4, 27)).astype(np.float32)
        offset, mask = dcn_offset_mask_split(jnp.asarray(conv_out))
        np.testing.assert_allclose(
            np.asarray(offset),
            np.concatenate([conv_out[..., :9], conv_out[..., 9:18]], -1))
        np.testing.assert_allclose(
            np.asarray(mask), 1 / (1 + np.exp(-conv_out[..., 18:])),
            rtol=1e-5)

    def test_dcn_fastpose_zoo_config(self, rng):
        """FastPose with the `-dcn-` config's backbone
        (STAGE_WITH_DCN=[F,T,T,T], MODULATED=false, DEFORM_GROUP=1 —
        `256x192_res50_lr1e-3_2x-dcn-regression.yaml:45-53`) builds and
        runs; zero-init offset convs make every DCN block equal a
        regular conv at init."""
        import jax.random as jr

        from mvsmplfitting_tpu.detect.blocks import DeformConvBlock
        from mvsmplfitting_tpu.detect.fastpose import FastPose

        # Block-level init equivalence.
        blk = DeformConvBlock(8, stride=1)
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)), jnp.float32)
        params = blk.init(jr.PRNGKey(0), x)
        out = blk.apply(params, x)
        w = params["params"]["kernel"]
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-4)

        # Full zoo model forward (tiny input for speed).
        model = FastPose(num_joints=26,
                         stage_with_dcn=(False, True, True, True))
        x = jnp.zeros((1, 64, 96, 3))
        params = model.init(jr.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (1, 16, 24, 26)
        assert np.isfinite(np.asarray(y)).all()

    def test_gradients_flow(self, rng):
        """Offsets receive gradients (the CUDA op's backward pass exists
        for a reason; XLA autodiff covers it for free)."""
        x = jnp.asarray(rng.standard_normal((1, 5, 5, 2)), jnp.float32)
        w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 2, 2)),
                        jnp.float32)
        offset = jnp.asarray(0.3 * rng.standard_normal((1, 5, 5, 18)),
                             jnp.float32)
        g = jax.grad(lambda o: jnp.sum(
            deform_conv2d(x, o, w, stride=1, padding=1) ** 2))(offset)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


# --------------------------------------------------------------------------
# Deformable (PS-)RoI pooling
# --------------------------------------------------------------------------

from mvsmplfitting_tpu.detect.deform_pool import (  # noqa: E402
    DeformRoIPoolingPack, ModulatedDeformRoIPoolingPack, deform_roi_pool)


def _bilinear_interp_pool(data, x, y, width, height):
    """`bilinear_interp` (`deform_pool_cuda_kernel.cu:31-51`)."""
    x1, x2 = int(np.floor(x)), int(np.ceil(x))
    y1, y2 = int(np.floor(y)), int(np.ceil(y))
    dx, dy = x - x1, y - y1
    return ((1 - dx) * (1 - dy) * data[y1, x1]
            + (1 - dx) * dy * data[y2, x1]
            + dx * (1 - dy) * data[y1, x2]
            + dx * dy * data[y2, x2])


def deform_pool_oracle(data, rois, trans, spatial_scale, out_size,
                       output_dim, no_trans, group_size=1, part_size=None,
                       sample_per_part=4, trans_std=0.0):
    """`DeformablePSROIPoolForwardKernel`
    (`deform_pool_cuda_kernel.cu:53-144`), NHWC in/out."""
    B, H, W, C = data.shape
    P = out_size if part_size is None else part_size
    N = rois.shape[0]
    nc = 1 if no_trans else trans.shape[1] // 2
    cec = output_dim if no_trans else output_dim // nc
    out = np.zeros((N, out_size, out_size, output_dim), np.float32)
    for n in range(N):
        b = int(rois[n, 0])
        rs_w = round(rois[n, 1]) * spatial_scale - 0.5
        rs_h = round(rois[n, 2]) * spatial_scale - 0.5
        re_w = (round(rois[n, 3]) + 1.0) * spatial_scale - 0.5
        re_h = (round(rois[n, 4]) + 1.0) * spatial_scale - 0.5
        roi_w = max(re_w - rs_w, 0.1)
        roi_h = max(re_h - rs_h, 0.1)
        bin_h, bin_w = roi_h / out_size, roi_w / out_size
        sub_h, sub_w = bin_h / sample_per_part, bin_w / sample_per_part
        for ctop in range(output_dim):
            for ph in range(out_size):
                for pw in range(out_size):
                    part_h = int(np.floor(ph / out_size * P))
                    part_w = int(np.floor(pw / out_size * P))
                    cid = ctop // cec
                    t = trans[n].reshape(nc, 2, P, P) if not no_trans \
                        else None
                    tx = 0.0 if no_trans else \
                        t[cid, 0, part_h, part_w] * trans_std
                    ty = 0.0 if no_trans else \
                        t[cid, 1, part_h, part_w] * trans_std
                    wstart = pw * bin_w + rs_w + tx * roi_w
                    hstart = ph * bin_h + rs_h + ty * roi_h
                    gw = min(max(int(np.floor(pw * group_size
                                              / out_size)), 0),
                             group_size - 1)
                    gh = min(max(int(np.floor(ph * group_size
                                              / out_size)), 0),
                             group_size - 1)
                    c = (ctop * group_size + gh) * group_size + gw
                    s, cnt = 0.0, 0
                    for ih in range(sample_per_part):
                        for iw in range(sample_per_part):
                            w = wstart + iw * sub_w
                            h = hstart + ih * sub_h
                            if (w < -0.5 or w > W - 0.5 or h < -0.5
                                    or h > H - 0.5):
                                continue
                            w = min(max(w, 0.0), W - 1.0)
                            h = min(max(h, 0.0), H - 1.0)
                            s += _bilinear_interp_pool(
                                data[b, :, :, c], w, h, W, H)
                            cnt += 1
                    out[n, ph, pw, ctop] = 0.0 if cnt == 0 else s / cnt
    return out


class TestDeformPool:
    def test_no_trans_matches_cuda_kernel_oracle(self, rng):
        feats = rng.standard_normal((2, 12, 10, 5)).astype(np.float32)
        rois = np.asarray([
            [0, 1.2, 0.7, 7.3, 9.9],
            [1, -3.0, 2.0, 13.0, 14.5],   # partly outside
            [0, 4.0, 4.0, 4.2, 4.2],      # tiny -> 0.1 clamp
        ], np.float32)
        got = np.asarray(deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), None, out_size=3,
            out_channels=5, spatial_scale=0.5, no_trans=True))
        want = deform_pool_oracle(feats, rois, None, 0.5, 3, 5, True)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_trans_matches_cuda_kernel_oracle(self, rng):
        feats = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
        rois = np.asarray([[0, 2.0, 2.0, 11.0, 12.0],
                           [0, 0.0, 5.0, 15.0, 15.0]], np.float32)
        trans = rng.standard_normal((2, 2, 5, 5)).astype(np.float32)
        kw = dict(out_size=4, output_dim=4, no_trans=False,
                  part_size=5, sample_per_part=2, trans_std=0.2)
        got = np.asarray(deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), jnp.asarray(trans),
            out_size=4, out_channels=4, spatial_scale=1.0,
            no_trans=False, part_size=5, sample_per_part=2,
            trans_std=0.2))
        want = deform_pool_oracle(feats, rois, trans, 1.0, **kw)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_position_sensitive_group2(self, rng):
        """group_size=2: C = out*gs^2 position-sensitive routing."""
        out_ch, gs = 3, 2
        feats = rng.standard_normal((1, 10, 10, out_ch * gs * gs)
                                    ).astype(np.float32)
        rois = np.asarray([[0, 1.0, 1.0, 8.0, 8.0]], np.float32)
        got = np.asarray(deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), None, out_size=4,
            out_channels=out_ch, spatial_scale=1.0, no_trans=True,
            group_size=gs))
        want = deform_pool_oracle(feats, rois, None, 1.0, 4, out_ch,
                                  True, group_size=gs)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_multiclass_trans(self, rng):
        """num_classes=2 offsets select by ctop // channels_each."""
        feats = rng.standard_normal((1, 12, 12, 6)).astype(np.float32)
        rois = np.asarray([[0, 1.0, 2.0, 9.0, 10.0]], np.float32)
        trans = rng.standard_normal((1, 4, 3, 3)).astype(np.float32)
        got = np.asarray(deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), jnp.asarray(trans),
            out_size=3, out_channels=6, spatial_scale=1.0,
            no_trans=False, trans_std=0.1))
        want = deform_pool_oracle(feats, rois, trans, 1.0, 3, 6, False,
                                  trans_std=0.1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pack_zero_init_equals_plain_pool(self, rng):
        """Zero-init offset FC (`deform_pool.py:146-147`) => the pack
        module's first output == the plain no_trans pooling."""
        feats = jnp.asarray(rng.standard_normal((1, 12, 12, 4)),
                            jnp.float32)
        rois = jnp.asarray([[0, 1.0, 1.0, 9.0, 9.0]], jnp.float32)
        mod = DeformRoIPoolingPack(spatial_scale=1.0, out_size=3,
                                   out_channels=4, trans_std=0.1,
                                   deform_fc_channels=16)
        params = mod.init(jax.random.PRNGKey(0), feats, rois)
        got = mod.apply(params, feats, rois)
        plain = deform_roi_pool(feats, rois, None, out_size=3,
                                out_channels=4, spatial_scale=1.0,
                                no_trans=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(plain),
                                   atol=1e-6)

    def test_modulated_pack_starts_at_half(self, rng):
        """Zero-init mask FC => sigmoid(0)=0.5 scaling
        (`deform_pool.py:226-227`)."""
        feats = jnp.asarray(rng.standard_normal((1, 12, 12, 4)),
                            jnp.float32)
        rois = jnp.asarray([[0, 1.0, 1.0, 9.0, 9.0]], jnp.float32)
        mod = ModulatedDeformRoIPoolingPack(
            spatial_scale=1.0, out_size=3, out_channels=4,
            trans_std=0.1, deform_fc_channels=16)
        params = mod.init(jax.random.PRNGKey(0), feats, rois)
        got = mod.apply(params, feats, rois)
        plain = deform_roi_pool(feats, rois, None, out_size=3,
                                out_channels=4, spatial_scale=1.0,
                                no_trans=True)
        np.testing.assert_allclose(np.asarray(got),
                                   0.5 * np.asarray(plain), atol=1e-6)

    def test_gradients_flow_to_data_and_trans(self, rng):
        feats = jnp.asarray(rng.standard_normal((1, 12, 12, 4)),
                            jnp.float32)
        rois = jnp.asarray([[0, 1.0, 1.0, 9.0, 9.0]], jnp.float32)
        trans = jnp.asarray(rng.standard_normal((1, 2, 3, 3)),
                            jnp.float32)

        def loss(f, t):
            return jnp.sum(deform_roi_pool(
                f, rois, t, out_size=3, out_channels=4,
                spatial_scale=1.0, trans_std=0.2) ** 2)

        gf, gt = jax.grad(loss, argnums=(0, 1))(feats, trans)
        assert np.isfinite(np.asarray(gf)).all()
        assert float(jnp.abs(gf).max()) > 0
        assert float(jnp.abs(gt).max()) > 0
