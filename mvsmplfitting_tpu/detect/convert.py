"""Torch checkpoint -> flax parameter conversion for the detectors.

The reference ships torch checkpoints (`bytetrack_x_mot17` for YOLOX,
`fast_res50_256x192.pth` for FastPose — external downloads per
`README.md:18-22`).  This module maps their state_dicts onto the NHWC
flax modules in `yolox.py` / `fastpose.py`.

Conv kernels transpose (O, I, kH, kW) -> (kH, kW, I, O); BatchNorms map
weight/bias/running_mean/running_var -> scale/bias/mean/var; Linear
transposes (O, I) -> (I, O).  Torch is imported only here.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(sd, name):
    return {"kernel": np.transpose(sd[name + ".weight"], (2, 3, 1, 0))}


def _conv_b(sd, name):
    out = _conv(sd, name)
    out["bias"] = sd[name + ".bias"]
    return out


def _bn(sd, name):
    return {
        "scale": sd[name + ".weight"],
        "bias": sd[name + ".bias"],
    }


def _bn_stats(sd, name):
    return {
        "mean": sd[name + ".running_mean"],
        "var": sd[name + ".running_var"],
    }


def _dense(sd, name):
    return {"kernel": np.transpose(sd[name + ".weight"], (1, 0)),
            "bias": sd[name + ".bias"]}


def _convbn(sd, prefix):
    """Reference BaseConv 'conv' + 'bn' pair -> ConvBnAct params."""
    return ({"conv": _conv(sd, prefix + ".conv"),
             "bn": _bn(sd, prefix + ".bn")},
            {"bn": _bn_stats(sd, prefix + ".bn")})


class _Tree:
    """Accumulates params and batch_stats trees in parallel."""

    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def put(self, path, pair):
        params, stats = pair
        p = self.params
        s = self.stats
        for k in path[:-1]:
            p = p.setdefault(k, {})
            s = s.setdefault(k, {})
        p[path[-1]] = params
        s[path[-1]] = stats


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return {k: v.numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def _csp(tree, sd, dst, src, num_blocks):
    tree.put(dst + ("conv1",), _convbn(sd, src + ".conv1"))
    tree.put(dst + ("conv2",), _convbn(sd, src + ".conv2"))
    tree.put(dst + ("conv3",), _convbn(sd, src + ".conv3"))
    for i in range(num_blocks):
        tree.put(dst + (f"m{i}", "conv1"),
                 _convbn(sd, f"{src}.m.{i}.conv1"))
        tree.put(dst + (f"m{i}", "conv2"),
                 _convbn(sd, f"{src}.m.{i}.conv2"))


def convert_yolox(path: str, depth_mul: float = 1.33) -> Dict:
    """Convert a YOLOX torch checkpoint file to flax variables."""
    return convert_yolox_sd(load_torch_state_dict(path), depth_mul)


def convert_yolox_sd(sd: Dict, depth_mul: float = 1.33) -> Dict:
    """Convert a YOLOX torch state_dict to flax variables."""
    t = _Tree()
    d = lambda n: max(round(n * depth_mul), 1)
    bb = "backbone.backbone"

    t.put(("fpn", "backbone", "stem", "conv"), _convbn(sd, bb + ".stem.conv"))
    for i, (name, blocks, csp) in enumerate([
            ("dark2", d(3), True), ("dark3", d(9), True),
            ("dark4", d(9), True)]):
        t.put(("fpn", "backbone", f"{name}_conv"),
              _convbn(sd, f"{bb}.{name}.0"))
        _csp(t, sd, ("fpn", "backbone", f"{name}_csp"),
             f"{bb}.{name}.1", blocks)
    t.put(("fpn", "backbone", "dark5_conv"), _convbn(sd, bb + ".dark5.0"))
    t.put(("fpn", "backbone", "dark5_spp", "conv1"),
          _convbn(sd, bb + ".dark5.1.conv1"))
    t.put(("fpn", "backbone", "dark5_spp", "conv2"),
          _convbn(sd, bb + ".dark5.1.conv2"))
    _csp(t, sd, ("fpn", "backbone", "dark5_csp"), bb + ".dark5.2", d(3))

    neck = "backbone"
    t.put(("fpn", "lateral_conv0"), _convbn(sd, neck + ".lateral_conv0"))
    _csp(t, sd, ("fpn", "C3_p4"), neck + ".C3_p4", d(3))
    t.put(("fpn", "reduce_conv1"), _convbn(sd, neck + ".reduce_conv1"))
    _csp(t, sd, ("fpn", "C3_p3"), neck + ".C3_p3", d(3))
    t.put(("fpn", "bu_conv2"), _convbn(sd, neck + ".bu_conv2"))
    _csp(t, sd, ("fpn", "C3_n3"), neck + ".C3_n3", d(3))
    t.put(("fpn", "bu_conv1"), _convbn(sd, neck + ".bu_conv1"))
    _csp(t, sd, ("fpn", "C3_n4"), neck + ".C3_n4", d(3))

    for i in range(3):
        t.put(("head", f"stem{i}"), _convbn(sd, f"head.stems.{i}"))
        for j in range(2):
            t.put(("head", f"cls_conv{i}_{j}"),
                  _convbn(sd, f"head.cls_convs.{i}.{j}"))
            t.put(("head", f"reg_conv{i}_{j}"),
                  _convbn(sd, f"head.reg_convs.{i}.{j}"))
        t.params.setdefault("head", {})[f"cls_pred{i}"] = _conv_b(
            sd, f"head.cls_preds.{i}")
        t.params["head"][f"reg_pred{i}"] = _conv_b(
            sd, f"head.reg_preds.{i}")
        t.params["head"][f"obj_pred{i}"] = _conv_b(
            sd, f"head.obj_preds.{i}")
    return {"params": t.params, "batch_stats": t.stats}


def convert_fastpose(path: str) -> Dict:
    """Convert an AlphaPose FastPose-R50 checkpoint to flax variables."""
    return convert_fastpose_sd(load_torch_state_dict(path))


def convert_fastpose_sd(sd: Dict) -> Dict:
    t = _Tree()

    t.put(("preact", "stem"), ({"conv": _conv(sd, "preact.conv1"),
                                "bn": _bn(sd, "preact.bn1")},
                               {"bn": _bn_stats(sd, "preact.bn1")}))
    blocks = [3, 4, 6, 3]
    for s, n in enumerate(blocks):
        for b in range(n):
            src = f"preact.layer{s + 1}.{b}"
            dst = ("preact", f"layer{s + 1}_{b}")
            t.put(dst + ("conv1",), ({"conv": _conv(sd, src + ".conv1"),
                                      "bn": _bn(sd, src + ".bn1")},
                                     {"bn": _bn_stats(sd, src + ".bn1")}))
            t.put(dst + ("conv2",), ({"conv": _conv(sd, src + ".conv2"),
                                      "bn": _bn(sd, src + ".bn2")},
                                     {"bn": _bn_stats(sd, src + ".bn2")}))
            p = {"conv3": _conv(sd, src + ".conv3")}
            st = {}
            t.params["preact"][f"layer{s + 1}_{b}"]["conv3"] = \
                p["conv3"]
            t.params["preact"][f"layer{s + 1}_{b}"]["bn3"] = _bn(
                sd, src + ".bn3")
            t.stats["preact"][f"layer{s + 1}_{b}"]["bn3"] = _bn_stats(
                sd, src + ".bn3")
            if b == 0:
                t.params["preact"][f"layer{s + 1}_{b}"]["se"] = {
                    "fc1": _dense(sd, src + ".se.fc.0"),
                    "fc2": _dense(sd, src + ".se.fc.2"),
                }
                if f"{src}.downsample.0.weight" in sd:
                    t.params["preact"][f"layer{s + 1}_{b}"]["down_conv"] \
                        = _conv(sd, src + ".downsample.0")
                    t.params["preact"][f"layer{s + 1}_{b}"]["down_bn"] = \
                        _bn(sd, src + ".downsample.1")
                    t.stats["preact"][f"layer{s + 1}_{b}"]["down_bn"] = \
                        _bn_stats(sd, src + ".downsample.1")

    for duc in ("duc1", "duc2"):
        t.put((duc, "conv"), ({"conv": _conv(sd, f"{duc}.conv"),
                               "bn": _bn(sd, f"{duc}.bn")},
                              {"bn": _bn_stats(sd, f"{duc}.bn")}))
    t.params["conv_out"] = _conv_b(sd, "conv_out")
    return {"params": t.params, "batch_stats": t.stats}


def convert_hrnet(path: str, stage_modules=(1, 4, 3)) -> Dict:
    """Convert an AlphaPose PoseHRNet checkpoint to flax variables."""
    return convert_hrnet_sd(load_torch_state_dict(path), stage_modules)


def convert_hrnet_sd(sd: Dict, stage_modules=(1, 4, 3)) -> Dict:
    """PoseHighResolutionNet state_dict (`hrnet.py:270-470`) ->
    `PoseHRNet` variables.  Name map: stem conv1/bn1+conv2/bn2 ->
    stem1/2; layer1 Bottlenecks; transitionN branch convs; per-module
    branches + fuse layers; final_layer."""
    t = _Tree()

    def cb(conv, bn):
        return ({"conv": _conv(sd, conv), "bn": _bn(sd, bn)},
                {"bn": _bn_stats(sd, bn)})

    t.put(("stem1",), cb("conv1", "bn1"))
    t.put(("stem2",), cb("conv2", "bn2"))
    for b in range(4):
        src = f"layer1.{b}"
        dst = f"layer1_{b}"
        t.put((dst, "conv1"), cb(src + ".conv1", src + ".bn1"))
        t.put((dst, "conv2"), cb(src + ".conv2", src + ".bn2"))
        t.params[dst]["conv3"] = _conv(sd, src + ".conv3")
        t.params[dst]["bn3"] = _bn(sd, src + ".bn3")
        t.stats[dst]["bn3"] = _bn_stats(sd, src + ".bn3")
        if f"{src}.downsample.0.weight" in sd:
            t.params[dst]["down_conv"] = _conv(sd, src + ".downsample.0")
            t.params[dst]["down_bn"] = _bn(sd, src + ".downsample.1")
            t.stats[dst]["down_bn"] = _bn_stats(sd,
                                                src + ".downsample.1")

    # Transition layers: existing-branch channel converts + new strided
    # branches (`_make_transition_layer`; Nones for unchanged branches).
    t.put(("t1_b0",), cb("transition1.0.0", "transition1.0.1"))
    t.put(("t1_b1",), cb("transition1.1.0.0", "transition1.1.0.1"))
    t.put(("t2_b2",), cb("transition2.2.0.0", "transition2.2.0.1"))
    t.put(("t3_b3",), cb("transition3.3.0.0", "transition3.3.0.1"))

    for si, (stage, nb) in enumerate(zip((2, 3, 4), (2, 3, 4))):
        for m in range(stage_modules[si]):
            src_m = f"stage{stage}.{m}"
            dst_m = f"stage{stage}_m{m}"
            for i in range(nb):
                for blk in range(4):
                    srcb = f"{src_m}.branches.{i}.{blk}"
                    dstb = f"branch{i}_block{blk}"
                    t.put((dst_m, dstb),
                          ({"conv1": cb(srcb + ".conv1",
                                        srcb + ".bn1")[0],
                            "conv2": _conv(sd, srcb + ".conv2"),
                            "bn2": _bn(sd, srcb + ".bn2")},
                           {"conv1": cb(srcb + ".conv1",
                                        srcb + ".bn1")[1],
                            "bn2": _bn_stats(sd, srcb + ".bn2")}))
            last = stage == 4 and m == stage_modules[si] - 1
            for i in range(1 if last else nb):
                for j in range(nb):
                    if j > i:
                        srcf = f"{src_m}.fuse_layers.{i}.{j}"
                        t.params[dst_m][f"fuse{i}_{j}_conv"] = _conv(
                            sd, srcf + ".0")
                        t.params[dst_m][f"fuse{i}_{j}_bn"] = _bn(
                            sd, srcf + ".1")
                        t.stats[dst_m][f"fuse{i}_{j}_bn"] = _bn_stats(
                            sd, srcf + ".1")
                    elif j < i:
                        for k in range(i - j):
                            srcf = f"{src_m}.fuse_layers.{i}.{j}.{k}"
                            t.params[dst_m][f"fuse{i}_{j}_d{k}_conv"] \
                                = _conv(sd, srcf + ".0")
                            t.params[dst_m][f"fuse{i}_{j}_d{k}_bn"] = \
                                _bn(sd, srcf + ".1")
                            t.stats[dst_m][f"fuse{i}_{j}_d{k}_bn"] = \
                                _bn_stats(sd, srcf + ".1")

    t.params["final"] = _conv_b(sd, "final_layer")
    return {"params": t.params, "batch_stats": t.stats}


def _deconv(sd, name):
    """torch ConvTranspose2d (Cin, Cout, kH, kW) -> flax ConvTranspose
    HWIO with the spatial flip (cross-correlation vs convolution)."""
    w = sd[name + ".weight"]
    return {"kernel": np.transpose(w[:, :, ::-1, ::-1],
                                   (2, 3, 0, 1)).copy()}


def _resnet_backbone(t, sd, dst_root, src_root,
                     blocks=(3, 4, 6, 3), se=False):
    """Reference `layers/Resnet.py` / `SE_Resnet.py` /
    `ShuffleResnet.py` state_dict -> the flax `ResNet50`/`SEResnet`
    param layout.  ShuffleResnet's strided conv2 is a Sequential
    [PixelUnshuffle, Conv2d] (`ShuffleResnet.py:76-86`), detected by
    the `conv2.1.weight` key (PixelUnshuffle has no params)."""
    t.put((dst_root, "stem"), ({"conv": _conv(sd, src_root + ".conv1"),
                                "bn": _bn(sd, src_root + ".bn1")},
                               {"bn": _bn_stats(sd, src_root + ".bn1")}))
    for s, n in enumerate(blocks):
        for b in range(n):
            src = f"{src_root}.layer{s + 1}.{b}"
            dst = f"layer{s + 1}_{b}"
            t.put((dst_root, dst, "conv1"),
                  ({"conv": _conv(sd, src + ".conv1"),
                    "bn": _bn(sd, src + ".bn1")},
                   {"bn": _bn_stats(sd, src + ".bn1")}))
            c2 = (src + ".conv2.1"
                  if src + ".conv2.1.weight" in sd else src + ".conv2")
            t.put((dst_root, dst, "conv2"),
                  ({"conv": _conv(sd, c2),
                    "bn": _bn(sd, src + ".bn2")},
                   {"bn": _bn_stats(sd, src + ".bn2")}))
            t.params[dst_root][dst]["conv3"] = _conv(sd, src + ".conv3")
            t.params[dst_root][dst]["bn3"] = _bn(sd, src + ".bn3")
            t.stats[dst_root][dst]["bn3"] = _bn_stats(sd, src + ".bn3")
            # SE exists only on each stage's first block
            # (`SE_Resnet.py:201-207` / `ShuffleResnet.py:186-192`:
            # reduction=True iff downsample) — detect by key.
            if se and f"{src}.se.fc.0.weight" in sd:
                t.params[dst_root][dst]["se"] = {
                    "fc1": _dense(sd, src + ".se.fc.0"),
                    "fc2": _dense(sd, src + ".se.fc.2"),
                }
            if f"{src}.downsample.0.weight" in sd:
                t.params[dst_root][dst]["down_conv"] = _conv(
                    sd, src + ".downsample.0")
                t.params[dst_root][dst]["down_bn"] = _bn(
                    sd, src + ".downsample.1")
                t.stats[dst_root][dst]["down_bn"] = _bn_stats(
                    sd, src + ".downsample.1")


def convert_simplepose(path: str) -> Dict:
    """Convert an AlphaPose SimplePose checkpoint to flax variables."""
    return convert_simplepose_sd(load_torch_state_dict(path))


def convert_simplepose_sd(sd: Dict) -> Dict:
    """`SimplePose` state_dict (`models/simplepose.py`: ResNet-50 +
    deconv_layers Sequential + final_layer) -> flax variables."""
    t = _Tree()
    _resnet_backbone(t, sd, "preact", "preact")
    for i, idx in enumerate((0, 3, 6)):       # Sequential positions
        t.params[f"deconv{i + 1}"] = _deconv(
            sd, f"deconv_layers.{idx}")
        t.params[f"bn{i + 1}"] = _bn(sd, f"deconv_layers.{idx + 1}")
        t.stats[f"bn{i + 1}"] = _bn_stats(sd,
                                          f"deconv_layers.{idx + 1}")
    t.params["final"] = _conv_b(sd, "final_layer")
    return {"params": t.params, "batch_stats": t.stats}


def convert_hardnet(path: str) -> Dict:
    """Convert an AlphaPose HarDNet-68 pose checkpoint to flax."""
    return convert_hardnet_sd(load_torch_state_dict(path))


def convert_hardnet_sd(sd: Dict) -> Dict:
    """`HarDNetPose` state_dict (`models/hardnet.py:397-531`, arch 68)
    -> `HarDNetPose` flax variables.  Base Sequential indices for
    arch 68: convs 0-1, pool 2, blocks 3/6/8/11, projs 4/7/9, pools
    5/10 (`HarDNetBase.__init__`, `hardnet.py:330-360`)."""
    t = _Tree()

    def cl(dst_path, src):
        t.put(dst_path, ({"conv": _conv(sd, src + ".conv"),
                          "norm": _bn(sd, src + ".norm")},
                         {"norm": _bn_stats(sd, src + ".norm")}))

    def blk(dst, src, n_layers):
        for i in range(n_layers):
            cl((dst, f"l{i}"), f"{src}.layers.{i}")

    cl(("base0",), "base.0")
    cl(("base1",), "base.1")
    blk("blk0", "base.3", 8)
    cl(("proj0",), "base.4")
    blk("blk1", "base.6", 16)
    cl(("proj1",), "base.7")
    blk("blk2", "base.8", 16)
    cl(("proj2",), "base.9")
    blk("blk3", "base.11", 16)
    cl(("last_proj",), "last_proj")
    blk("last_blk", "last_blk", 8)
    for i, n in enumerate((8, 8, 4)):
        cl((f"up_proj{i}",), f"conv1x1_up.{i}")
        blk(f"up_blk{i}", f"denseBlocksUp.{i}", n)
    t.params["head0"] = _conv_b(sd, "conv_out.0")
    t.params["head1"] = _conv_b(sd, "conv_out.2")
    return {"params": t.params, "batch_stats": t.stats}


def convert_fastpose_duc(path: str, num_convs=(4, 2, 1),
                         se: bool = False) -> Dict:
    """Convert a FastPose_DUC checkpoint to flax variables."""
    return convert_fastpose_duc_sd(load_torch_state_dict(path),
                                   num_convs, se)


def convert_fastpose_duc_sd(sd: Dict, num_convs=(4, 2, 1),
                            se: bool = False) -> Dict:
    """`FastPose_DUC` state_dict (`models/fastpose_duc.py:15-98`) ->
    `FastPoseDUC` variables.  Each duc Sequential is [PixelShuffle,
    (conv,bn,relu)x(NUM_CONV-1), conv,bn,relu]: convs at 1+3i."""
    t = _Tree()
    _resnet_backbone(t, sd, "preact", "preact", se=se)
    for k, n in enumerate(num_convs):
        _duc_stage(t, sd, f"duc{k + 1}", f"duc{k + 1}", n)
    t.params["conv_out"] = _conv_b(sd, "conv_out")
    return {"params": t.params, "batch_stats": t.stats}


def _duc_stage(t, sd, dst, src, n):
    """One `_make_duc_stage` Sequential (`fastpose_duc.py:72-90`):
    [PixelShuffle, (conv,bn,relu)x(n-1), conv,bn,relu] -> DUCStage."""
    p = t.params.setdefault(dst, {})
    s = t.stats.setdefault(dst, {})
    for i in range(n - 1):
        p[f"conv{i}"] = _conv(sd, f"{src}.{1 + 3 * i}")
        p[f"bn{i}"] = _bn(sd, f"{src}.{2 + 3 * i}")
        s[f"bn{i}"] = _bn_stats(sd, f"{src}.{2 + 3 * i}")
    last = 1 + 3 * (n - 1)
    p["conv_out"] = _conv(sd, f"{src}.{last}")
    p["bn_out"] = _bn(sd, f"{src}.{last + 1}")
    s["bn_out"] = _bn_stats(sd, f"{src}.{last + 1}")


def convert_fastpose_duc_dense(path: str, num_convs=(4, 2, 1),
                               se: bool = False) -> Dict:
    """Convert a FastPose_DUC_Dense checkpoint to flax variables."""
    return convert_fastpose_duc_dense_sd(load_torch_state_dict(path),
                                         num_convs, se)


def convert_fastpose_duc_dense_sd(sd: Dict, num_convs=(4, 2, 1),
                                  se: bool = False) -> Dict:
    """`FastPose_DUC_Dense` (`fastpose_duc_dense.py:14-135`): the base
    and dense DUC chains are nested Sequentials `duc.{k}` /
    `duc_dense.{k}`, heads `conv_out` / `conv_out_dense`."""
    t = _Tree()
    _resnet_backbone(t, sd, "preact", "preact", se=se)
    for k, n in enumerate(num_convs):
        _duc_stage(t, sd, f"duc{k + 1}", f"duc.{k}", n)
        _duc_stage(t, sd, f"duc_dense{k + 1}", f"duc_dense.{k}", n)
    t.params["conv_out"] = _conv_b(sd, "conv_out")
    t.params["conv_out_dense"] = _conv_b(sd, "conv_out_dense")
    return {"params": t.params, "batch_stats": t.stats}


# Zoo-name -> checkpoint converter (same keys as `zoo.POSE_MODELS`).
def convert_hybrik(path: str) -> Dict:
    """Convert a HybrIK (`simple3dposeSMPLWithCam`) checkpoint."""
    return convert_hybrik_sd(load_torch_state_dict(path))


def convert_hybrik_sd(sd: Dict) -> Dict:
    """`simple3dposeSMPLWithCam.py:32-127` state_dict -> flax
    variables for `Simple3DPoseSMPLCam`: the SimplePose trunk
    (preact ResNet + 3 deconv/BN + final 1x1) plus the FC camera/
    shape/twist heads (`:103-110`; dropout is stateless)."""
    t = _Tree()
    _resnet_backbone(t, sd, "preact", "preact")
    for i, idx in enumerate((0, 3, 6)):       # Sequential positions
        t.params[f"deconv{i + 1}"] = _deconv(
            sd, f"deconv_layers.{idx}")
        t.params[f"bn{i + 1}"] = _bn(sd, f"deconv_layers.{idx + 1}")
        t.stats[f"bn{i + 1}"] = _bn_stats(sd,
                                          f"deconv_layers.{idx + 1}")
    t.params["final"] = _conv_b(sd, "final_layer")
    for name in ("fc1", "fc2", "decshape", "decphi", "deccam"):
        t.params[name] = _dense(sd, name)
    return {"params": t.params, "batch_stats": t.stats}


def convert_yolo_fpn(path: str, depth: int = 53) -> Dict:
    """Convert a YOLOFPN (darknet53) torch checkpoint to flax."""
    return convert_yolo_fpn_sd(load_torch_state_dict(path), depth)


def convert_yolo_fpn_sd(sd: Dict, depth: int = 53) -> Dict:
    """`yolox/models/yolo_fpn.py:12-84` + `darknet.py:10-94`
    state_dict -> flax variables for `yolo_fpn.YOLOFPN`.

    Sequential index map: stem = [BaseConv, BaseConv s2, ResLayer];
    dark2-5 = [BaseConv s2, ResLayer x n]; dark5 additionally ends in
    the SPP block [.5 cbl, .6 cbl, .7 SPPBottleneck, .8 cbl, .9 cbl]
    (`darknet.py:54-57,66-80`); out1/out2 = cbl + 5-conv embedding.
    """
    t = _Tree()
    blocks = {21: (1, 2, 2, 1), 53: (2, 8, 8, 4)}[depth]
    bb = ("backbone",)

    t.put(bb + ("stem0",), _convbn(sd, "backbone.stem.0"))
    t.put(bb + ("stem1_conv",), _convbn(sd, "backbone.stem.1"))
    t.put(bb + ("stem1_res0", "layer1"),
          _convbn(sd, "backbone.stem.2.layer1"))
    t.put(bb + ("stem1_res0", "layer2"),
          _convbn(sd, "backbone.stem.2.layer2"))
    for name, n in zip(("dark2", "dark3", "dark4", "dark5"), blocks):
        t.put(bb + (f"{name}_conv",), _convbn(sd, f"backbone.{name}.0"))
        for i in range(n):
            for layer in ("layer1", "layer2"):
                t.put(bb + (f"{name}_res{i}", layer),
                      _convbn(sd, f"backbone.{name}.{i + 1}.{layer}"))
    n5 = blocks[3]
    for j, dst in enumerate(("dark5_spp0", "dark5_spp1", None,
                             "dark5_spp3", "dark5_spp4")):
        src = f"backbone.dark5.{n5 + 1 + j}"
        if dst is None:                   # the SPPBottleneck itself
            t.put(bb + ("dark5_spp2", "conv1"),
                  _convbn(sd, src + ".conv1"))
            t.put(bb + ("dark5_spp2", "conv2"),
                  _convbn(sd, src + ".conv2"))
        else:
            t.put(bb + (dst,), _convbn(sd, src))

    for out in ("out1", "out2"):
        t.put((f"{out}_cbl",), _convbn(sd, f"{out}_cbl"))
        for i in range(5):
            t.put((f"{out}_{i}",), _convbn(sd, f"{out}.{i}"))
    return {"params": t.params, "batch_stats": t.stats}


POSE_CONVERTERS = {
    "fastpose": convert_fastpose,
    "simplepose": convert_simplepose,
    "hrnet": convert_hrnet,
    "hardnet": convert_hardnet,
    "fastpose_duc": convert_fastpose_duc,
    "fastpose_duc_dense": convert_fastpose_duc_dense,
    "hybrik": convert_hybrik,
}
