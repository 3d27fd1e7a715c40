"""Import PyTorch ``.pth`` checkpoints into flax parameter pytrees.

The reference ships teacher/pretrained weights as torch checkpoints in
three on-disk formats (raw state_dict, DataParallel ``module.``-prefixed,
and full ckpt dicts with ``state_dict``/``best_state_dict`` —
``lib/utils/utils.py:204-258``).  This module normalizes all three and maps
the reference models' parameter names onto this package's flax trees:

* conv weights OIHW -> HWIO; BN weight/bias -> scale/bias, running stats ->
  batch_stats.
* transposed-conv weights (PoseResNet deconvs) are spatially flipped and
  axis-swapped to match ``flax.linen.ConvTranspose`` semantics (torch's
  ConvTranspose2d is the *gradient* of a conv — kernel applied mirrored).

Numerical equivalence of imported models is pinned by
tests/test_torch_import.py, which runs the actual torch reference modules
on random inputs and compares forwards.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# generic plumbing
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load any of the reference's checkpoint formats -> flat numpy dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    elif isinstance(ckpt, dict) and "best_state_dict" in ckpt:
        ckpt = ckpt["best_state_dict"]
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, KH, KW) -> flax ConvTranspose (KH, KW, I, O).

    torch's transposed conv scatters with the kernel as-is, which equals a
    fractionally-strided *correlation* with the spatially-mirrored kernel —
    what flax ConvTranspose computes — so flip KH/KW.
    """
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


class _Assembler:
    def __init__(self, strict: bool = True):
        self.params: dict = {}
        self.stats: dict = {}
        self.unmatched: list = []
        self.skipped: list = []
        self.strict = strict

    def _missing(self, sd, tkey) -> bool:
        """Non-strict mode tolerates absent torch keys (trunk-only ImageNet
        checkpoints: the reference loads them with strict=False,
        pose_resnet.py:233-236)."""
        if tkey + ".weight" in sd:
            return False
        if self.strict:
            raise KeyError(tkey + ".weight")
        self.skipped.append(tkey)
        return True

    def conv(self, sd, tkey, path, bias=True):
        if self._missing(sd, tkey):
            return
        _set(self.params, path + ("Conv_0", "kernel"), _conv_w(sd[tkey + ".weight"]))
        if bias and tkey + ".bias" in sd:
            _set(self.params, path + ("Conv_0", "bias"), sd[tkey + ".bias"])

    def deconv(self, sd, tkey, path, bias=False):
        if self._missing(sd, tkey):
            return
        _set(self.params, path + ("ConvTranspose_0", "kernel"),
             _deconv_w(sd[tkey + ".weight"]))
        if bias and tkey + ".bias" in sd:
            _set(self.params, path + ("ConvTranspose_0", "bias"),
                 sd[tkey + ".bias"])

    def bn(self, sd, tkey, path):
        if self._missing(sd, tkey):
            return
        _set(self.params, path + ("BatchNorm_0", "scale"), sd[tkey + ".weight"])
        _set(self.params, path + ("BatchNorm_0", "bias"), sd[tkey + ".bias"])
        _set(self.stats, path + ("BatchNorm_0", "mean"),
             sd[tkey + ".running_mean"])
        _set(self.stats, path + ("BatchNorm_0", "var"),
             sd[tkey + ".running_var"])

    def result(self):
        return {"params": self.params, "batch_stats": self.stats}


def _import_bottleneck_preact(a, sd, tprefix, path):
    """Hourglass pre-activation Bottleneck (hourglass.py:11-52)."""
    for bn in ("bn1", "bn2", "bn3"):
        a.bn(sd, f"{tprefix}.{bn}", path + (bn,))
    for cv in ("conv1", "conv2", "conv3"):
        a.conv(sd, f"{tprefix}.{cv}", path + (cv,))
    if f"{tprefix}.downsample.0.weight" in sd:
        a.conv(sd, f"{tprefix}.downsample.0", path + ("downsample",))


def _import_block_postact(a, sd, tprefix, path, kind):
    """HRNet/ResNet BasicBlock or Bottleneck (pose_hrnet.py:28-98)."""
    convs = ("conv1", "conv2") if kind == "BASIC" else ("conv1", "conv2", "conv3")
    bns = ("bn1", "bn2") if kind == "BASIC" else ("bn1", "bn2", "bn3")
    for cv in convs:
        a.conv(sd, f"{tprefix}.{cv}", path + (cv,), bias=False)
    for bn in bns:
        a.bn(sd, f"{tprefix}.{bn}", path + (bn,))
    if f"{tprefix}.downsample.0.weight" in sd:
        a.conv(sd, f"{tprefix}.downsample.0", path + ("ds_conv",), bias=False)
        a.bn(sd, f"{tprefix}.downsample.1", path + ("ds_bn",))


# ---------------------------------------------------------------------------
# hourglass
# ---------------------------------------------------------------------------

def import_hourglass(sd: Dict[str, np.ndarray], num_stacks: int,
                     num_blocks: int = 1, depth: int = 4) -> dict:
    a = _Assembler()
    a.conv(sd, "conv1", ("conv1",))
    a.bn(sd, "bn1", ("bn1",))
    for k in (1, 2, 3):
        for b in range(1):
            _import_bottleneck_preact(a, sd, f"layer{k}.{b}",
                                      (f"layer{k}", f"block{b}"))
    # torch hourglass submodule: hg.{s}.hg.{n}.{j}.{b}; n = level-1,
    # j: 0=up1, 1=low1, 2=low3, 3=low2 (innermost only)
    jmap = {0: "up1", 1: "low1", 2: "low3"}
    for s in range(num_stacks):
        for n in range(depth):
            for j, stem in jmap.items():
                for b in range(num_blocks):
                    _import_bottleneck_preact(
                        a, sd, f"hg.{s}.hg.{n}.{j}.{b}",
                        (f"hg{s}", f"{stem}_{n + 1}", f"block{b}"))
        for b in range(num_blocks):
            _import_bottleneck_preact(
                a, sd, f"hg.{s}.hg.0.3.{b}", (f"hg{s}", "low2_base", f"block{b}"))
        for b in range(num_blocks):
            _import_bottleneck_preact(a, sd, f"res.{s}.{b}",
                                      (f"res{s}", f"block{b}"))
        a.conv(sd, f"fc.{s}.0", (f"fc{s}_conv",))
        a.bn(sd, f"fc.{s}.1", (f"fc{s}_bn",))
        a.conv(sd, f"score.{s}", (f"score{s}",))
        if s < num_stacks - 1:
            a.conv(sd, f"fc_.{s}", (f"fc_{s}",))
            a.conv(sd, f"score_.{s}", (f"score_{s}",))
    return a.result()


# ---------------------------------------------------------------------------
# HRNet
# ---------------------------------------------------------------------------

def import_hrnet(sd: Dict[str, np.ndarray], stage_cfgs: dict,
                 strict: bool = True) -> dict:
    """stage_cfgs: {"STAGE2": {...}, "STAGE3": {...}, "STAGE4": {...}} dicts
    with NUM_MODULES/NUM_BRANCHES/NUM_BLOCKS/NUM_CHANNELS/BLOCK."""
    a = _Assembler(strict=strict)
    a.conv(sd, "conv1", ("conv1",), bias=False)
    a.bn(sd, "bn1", ("bn1",))
    a.conv(sd, "conv2", ("conv2",), bias=False)
    a.bn(sd, "bn2", ("bn2",))
    for b in range(4):
        _import_block_postact(a, sd, f"layer1.{b}", ("layer1", f"b{b}"),
                              "BOTTLENECK")

    for si, scfg in (("2", stage_cfgs["STAGE2"]), ("3", stage_cfgs["STAGE3"]),
                     ("4", stage_cfgs["STAGE4"])):
        tn = int(si) - 1  # torch transition index
        nb = scfg["NUM_BRANCHES"]
        # transitions: existing branches Sequential(conv,bn,relu) or nested
        for i in range(nb):
            if f"transition{tn}.{i}.0.weight" in sd:
                a.conv(sd, f"transition{tn}.{i}.0",
                       (f"transition{si}", f"t{i}_conv"), bias=False)
                a.bn(sd, f"transition{tn}.{i}.1",
                     (f"transition{si}", f"t{i}_bn"))
            else:
                j = 0
                while f"transition{tn}.{i}.{j}.0.weight" in sd:
                    a.conv(sd, f"transition{tn}.{i}.{j}.0",
                           (f"transition{si}", f"t{i}_conv{j}"), bias=False)
                    a.bn(sd, f"transition{tn}.{i}.{j}.1",
                         (f"transition{si}", f"t{i}_bn{j}"))
                    j += 1
        kind = scfg["BLOCK"]
        for m in range(scfg["NUM_MODULES"]):
            mpath = f"stage{si}_m{m}"
            for b in range(nb):
                for blk in range(scfg["NUM_BLOCKS"][b]):
                    _import_block_postact(
                        a, sd, f"stage{si}.{m}.branches.{b}.{blk}",
                        (mpath, f"branch{b}", f"b{blk}"), kind)
            for i in range(nb):
                for j in range(nb):
                    if i == j:
                        continue
                    base = f"stage{si}.{m}.fuse_layers.{i}.{j}"
                    if f"{base}.0.weight" in sd:  # j > i: conv+bn+upsample
                        a.conv(sd, f"{base}.0",
                               (mpath, f"fuse{i}_{j}", "conv"), bias=False)
                        a.bn(sd, f"{base}.1", (mpath, f"fuse{i}_{j}", "bn"))
                    else:  # j < i: chain of (conv, bn[, relu])
                        k = 0
                        while f"{base}.{k}.0.weight" in sd:
                            a.conv(sd, f"{base}.{k}.0",
                                   (mpath, f"fuse{i}_{j}", f"conv{k}"),
                                   bias=False)
                            a.bn(sd, f"{base}.{k}.1",
                                 (mpath, f"fuse{i}_{j}", f"bn{k}"))
                            k += 1
    a.conv(sd, "final_layer", ("final_layer",))
    return a.result()


# ---------------------------------------------------------------------------
# PoseResNet
# ---------------------------------------------------------------------------

RESNET_LAYERS = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3],
                 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}


def import_pose_resnet(sd: Dict[str, np.ndarray], num_layers: int = 50,
                       num_deconv: int = 3, deconv_with_bias: bool = False,
                       strict: bool = True) -> dict:
    kind = "BASIC" if num_layers in (18, 34) else "BOTTLENECK"
    layers = RESNET_LAYERS[num_layers]
    a = _Assembler(strict=strict)
    a.conv(sd, "conv1", ("conv1",), bias=False)
    a.bn(sd, "bn1", ("bn1",))
    for li, n in enumerate(layers):
        for b in range(n):
            _import_block_postact(a, sd, f"layer{li + 1}.{b}",
                                  (f"layer{li + 1}", f"b{b}"), kind)
    for i in range(num_deconv):
        a.deconv(sd, f"deconv_layers.{3 * i}", (f"deconv{i}",),
                 bias=deconv_with_bias)
        a.bn(sd, f"deconv_layers.{3 * i + 1}", (f"deconv{i}_bn",))
    a.conv(sd, "final_layer", ("final_layer",))
    return a.result()


# ---------------------------------------------------------------------------
# ImageNet-pretrained initialization (MODEL.PRETRAINED)
# ---------------------------------------------------------------------------

def filter_pretrained_layers(sd: Dict[str, np.ndarray], layers) -> dict:
    """HRNet PRETRAINED_LAYERS filter: keep torch keys whose first dotted
    component is listed, or everything if the list starts with '*'
    (reference pose_hrnet.py:484-489)."""
    if layers and layers[0] == "*":
        return dict(sd)
    keep = set(layers)
    return {k: v for k, v in sd.items() if k.split(".")[0] in keep}


def merge_variables(variables: dict, partial: dict):
    """Overlay ``partial`` leaves onto ``variables`` where path+shape match.

    The flax analogue of torch ``load_state_dict(..., strict=False)``
    (reference pose_resnet.py:236, pose_hrnet.py:489): matching leaves are
    replaced (cast to the existing leaf dtype), everything else keeps its
    fresh initialization.  Returns (merged, loaded_paths, skipped_paths).
    """
    from flax import traverse_util
    from flax.core import unfreeze

    flat_v = traverse_util.flatten_dict(unfreeze(variables))
    flat_p = traverse_util.flatten_dict(partial)
    loaded, skipped = [], []
    for k, v in flat_p.items():
        cur = flat_v.get(k)
        if cur is not None and tuple(cur.shape) == tuple(np.shape(v)):
            flat_v[k] = np.asarray(v, dtype=cur.dtype)
            loaded.append(k)
        else:
            skipped.append(k)
    return traverse_util.unflatten_dict(flat_v), loaded, skipped


def import_pretrained(cfg, state_dict: Dict[str, np.ndarray]) -> dict:
    """Map an ImageNet trunk checkpoint (torchvision ResNet / HRNet
    classification) onto this package's tree, tolerating the missing
    pose-head keys.  HRNet applies the PRETRAINED_LAYERS filter first."""
    name = cfg.MODEL.NAME
    extra = cfg.MODEL.EXTRA
    if name == "pose_hrnet":
        sd = filter_pretrained_layers(state_dict,
                                      list(extra.PRETRAINED_LAYERS))
        return import_hrnet(sd, {
            "STAGE2": dict(extra.STAGE2), "STAGE3": dict(extra.STAGE3),
            "STAGE4": dict(extra.STAGE4)}, strict=False)
    if name == "pose_resnet":
        return import_pose_resnet(state_dict, extra.NUM_LAYERS,
                                  extra.NUM_DECONV_LAYERS,
                                  extra.DECONV_WITH_BIAS, strict=False)
    raise KeyError(
        f"MODEL.PRETRAINED is not supported for '{name}' (the reference's "
        f"hourglass has no pretrained path either, hourglass.py:195)")


def load_pretrained(cfg, variables: dict, logger=None):
    """Reference ``init_weights(cfg.MODEL.PRETRAINED)`` semantics
    (pose_resnet.py:209-249, pose_hrnet.py:462-492): if the checkpoint file
    exists, load the trunk non-strictly over freshly-initialized variables.

    Deviation (documented in docs/PARITY.md): a missing file logs a
    prominent warning instead of HRNet's ValueError, so hermetic/synthetic
    runs of reference YAMLs proceed from random init.
    Returns (variables, n_loaded).
    """
    import os

    path = cfg.MODEL.PRETRAINED
    if not (cfg.MODEL.INIT_WEIGHTS and path):
        return variables, 0
    if cfg.MODEL.NAME == "hourglass":
        return variables, 0  # reference hourglass has no pretrained init
    if not os.path.isfile(path):
        if logger:
            logger.warning(
                f"=> MODEL.PRETRAINED '{path}' not found — training from "
                f"RANDOM INIT. The reference relies on ImageNet-pretrained "
                f"trunks for its published accuracy; expect several AP/PCKh "
                f"points lower without them (pose_hrnet.py:490-492).")
        return variables, 0
    sd = load_torch_state_dict(path)
    partial = import_pretrained(cfg, sd)
    merged, loaded, skipped = merge_variables(variables, partial)
    if logger:
        logger.info(f"=> loaded {len(loaded)} pretrained tensors from "
                    f"{path} ({len(skipped)} skipped)")
    return merged, len(loaded)


def import_for_model(cfg, state_dict: Dict[str, np.ndarray]) -> dict:
    """Dispatch on cfg.MODEL.NAME -> {"params", "batch_stats"}."""
    name = cfg.MODEL.NAME
    extra = cfg.MODEL.EXTRA
    if name == "hourglass":
        return import_hourglass(state_dict, extra.NUM_STACKS, extra.NUM_BLOCKS)
    if name == "pose_hrnet":
        return import_hrnet(state_dict, {
            "STAGE2": dict(extra.STAGE2), "STAGE3": dict(extra.STAGE3),
            "STAGE4": dict(extra.STAGE4)})
    if name == "pose_resnet":
        return import_pose_resnet(state_dict, extra.NUM_LAYERS,
                                  extra.NUM_DECONV_LAYERS,
                                  extra.DECONV_WITH_BIAS)
    raise KeyError(name)
