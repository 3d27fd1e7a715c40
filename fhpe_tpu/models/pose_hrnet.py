"""HRNet-W32/W48 pose backbone, TPU-native rebuild.

Capability-equivalent to the reference ``lib/models/pose_hrnet.py`` (the
HRNet heatmap backbone used for COCO in FPD: W48 teacher / W32 student) as a
functional flax module in NHWC.  The multi-resolution branch lists of the
reference become Python lists of arrays traced into one flat XLA graph.

Semantics preserved from the reference:
* BasicBlock (expansion 1) and Bottleneck (expansion 4), bias-free convs,
  BN momentum 0.1 (pose_hrnet.py:28-98).
* HighResolutionModule: per-branch residual chains + full fuse matrix —
  1x1 conv + BN + nearest 2^k upsample for low->high, chains of strided
  3x3 conv+BN(+ReLU except last) for high->low, summed then ReLU
  (pose_hrnet.py:187-263).
* Stem: two 3x3/2 convs to 64ch, then layer1 = 4x Bottleneck-64 -> 256ch
  (pose_hrnet.py:282-289).
* Transitions insert 3x3 convs when channel counts change / new branches
  are created from the lowest-resolution branch (pose_hrnet.py:333-372).
* Final 1x1 conv on the highest-resolution branch only
  (``multi_scale_output=False`` for the last stage4 module).
* Explicit init: conv kernels normal(0, 0.001), BN gamma=1 beta=0
  (pose_hrnet.py:462-478) — the `normal001` default of Conv(torch_init=False).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm, Conv, upsample_nearest


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = Conv(self.planes, 3, self.stride, torch_init=False,
                   dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, torch_init=False, dtype=self.dtype,
                   name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train)
        if self.downsample:
            residual = Conv(self.planes, 1, self.stride, torch_init=False,
                            dtype=self.dtype, name="ds_conv")(x)
            residual = BatchNorm(dtype=self.dtype, name="ds_bn")(residual, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = Conv(self.planes, 1, torch_init=False, dtype=self.dtype,
                   name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, self.stride, torch_init=False,
                   dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes * 4, 1, torch_init=False, dtype=self.dtype,
                   name="conv3")(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, train)
        if self.downsample:
            residual = Conv(self.planes * 4, 1, self.stride, torch_init=False,
                            dtype=self.dtype, name="ds_conv")(x)
            residual = BatchNorm(dtype=self.dtype, name="ds_bn")(residual, train)
        return nn.relu(out + residual)


BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


class BranchChain(nn.Module):
    """num_blocks blocks at fixed width (one HRM branch)."""

    block: str
    planes: int
    num_blocks: int
    in_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        cls = BLOCKS[self.block]
        out_ch = self.planes * cls.expansion
        x = cls(self.planes, downsample=self.in_channels != out_ch,
                dtype=self.dtype, name="b0")(x, train)
        for i in range(1, self.num_blocks):
            x = cls(self.planes, dtype=self.dtype, name=f"b{i}")(x, train)
        return x


class FuseDown(nn.Module):
    """j->i fuse path for j < i: (i-j) strided 3x3 conv+BN, ReLU between."""

    steps: int
    mid_channels: int
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        for k in range(self.steps):
            last = k == self.steps - 1
            ch = self.out_channels if last else self.mid_channels
            x = Conv(ch, 3, 2, torch_init=False, dtype=self.dtype,
                     name=f"conv{k}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"bn{k}")(x, train)
            if not last:
                x = nn.relu(x)
        return x


class FuseUp(nn.Module):
    """j->i fuse path for j > i: 1x1 conv+BN then nearest 2^(j-i) upsample."""

    out_channels: int
    factor: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.out_channels, 1, torch_init=False, dtype=self.dtype,
                 name="conv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train)
        return upsample_nearest(x, self.factor)


class HighResolutionModule(nn.Module):
    block: str
    num_blocks: Sequence[int]
    num_channels: Sequence[int]   # per-branch width (pre-expansion)
    in_channels: Sequence[int]
    multi_scale_output: bool = True
    dtype: Any = jnp.bfloat16
    def _branch(self, i: int, train: bool):
        # Round-4 note: a Pallas "fused branch chain" eval drop-in lived
        # here behind TPU.FUSED_EVAL through round 3.  It measured 14x
        # slower than XLA's fused forward at kernel level (BENCH_NOTES
        # round 2) and the model-level A/B could not even compile W32
        # through the AOT helper (scripts/probe/fused_eval_ab.py, round
        # 4) while the unfused flip-test eval already runs 2,144
        # img/s/chip — the knob was deleted; the kernels remain as probe
        # infrastructure under scripts/probe/fused_block/.
        return BranchChain(self.block, self.num_channels[i],
                           self.num_blocks[i], self.in_channels[i],
                           dtype=self.dtype, name=f"branch{i}")

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool) -> List[jnp.ndarray]:
        nb = len(self.num_channels)
        exp = BLOCKS[self.block].expansion
        out_ch = [c * exp for c in self.num_channels]

        xs = [self._branch(i, train)(xs[i], train) for i in range(nb)]
        if nb == 1:
            return xs

        n_out = nb if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            y = None
            for j in range(nb):
                if j == i:
                    t = xs[j]
                elif j > i:
                    t = FuseUp(out_ch[i], 2 ** (j - i), dtype=self.dtype,
                               name=f"fuse{i}_{j}")(xs[j], train)
                else:
                    t = FuseDown(i - j, out_ch[j], out_ch[i], dtype=self.dtype,
                                 name=f"fuse{i}_{j}")(xs[j], train)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class Transition(nn.Module):
    """Channel-adapting / branch-creating layer between stages."""

    prev_channels: Sequence[int]
    cur_channels: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool) -> List[jnp.ndarray]:
        out = []
        n_prev = len(self.prev_channels)
        for i, ch in enumerate(self.cur_channels):
            if i < n_prev:
                if ch != self.prev_channels[i]:
                    # Reference quirk: a non-identity transition on an existing
                    # branch reads the LOWEST-res input (pose_hrnet.py:445,453
                    # pass y_list[-1]), not branch i.  Unreachable in shipped
                    # configs (channels always match), preserved for parity.
                    t = Conv(ch, 3, torch_init=False, dtype=self.dtype,
                             name=f"t{i}_conv")(xs[-1])
                    t = BatchNorm(dtype=self.dtype, name=f"t{i}_bn")(t, train)
                    out.append(nn.relu(t))
                else:
                    out.append(xs[i])
            else:
                # New branch: strided convs from the lowest-res branch.
                t = xs[-1]
                for j in range(i + 1 - n_prev):
                    last = j == i - n_prev
                    c = ch if last else self.prev_channels[-1]
                    t = Conv(c, 3, 2, torch_init=False, dtype=self.dtype,
                             name=f"t{i}_conv{j}")(t)
                    t = BatchNorm(dtype=self.dtype, name=f"t{i}_bn{j}")(t, train)
                    t = nn.relu(t)
                out.append(t)
        return out


class PoseHighResolutionNet(nn.Module):
    stage2: dict
    stage3: dict
    stage4: dict
    num_joints: int = 17
    final_conv_kernel: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Stem (pose_hrnet.py:282-289)
        x = Conv(64, 3, 2, torch_init=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = Conv(64, 3, 2, torch_init=False, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm(dtype=self.dtype, name="bn2")(x, train)
        x = nn.relu(x)
        x = BranchChain("BOTTLENECK", 64, 4, 64, dtype=self.dtype,
                        name="layer1")(x, train)

        prev = [256]
        xs = [x]
        for si, scfg in (("2", self.stage2), ("3", self.stage3),
                         ("4", self.stage4)):
            exp = BLOCKS[scfg["BLOCK"]].expansion
            cur = [c * exp for c in scfg["NUM_CHANNELS"]]
            xs = Transition(tuple(prev), tuple(cur), dtype=self.dtype,
                            name=f"transition{si}")(xs, train)
            last_stage = si == "4"
            for m in range(scfg["NUM_MODULES"]):
                mso = not (last_stage and m == scfg["NUM_MODULES"] - 1)
                xs = HighResolutionModule(
                    scfg["BLOCK"], tuple(scfg["NUM_BLOCKS"]),
                    tuple(scfg["NUM_CHANNELS"]), tuple(cur),
                    multi_scale_output=mso, dtype=self.dtype,
                    name=f"stage{si}_m{m}")(xs, train)
            prev = cur

        pad = 1 if self.final_conv_kernel == 3 else 0
        out = Conv(self.num_joints, self.final_conv_kernel, padding=pad,
                   use_bias=True, torch_init=False, dtype=self.dtype,
                   name="final_layer")(xs[0])
        return out.astype(jnp.promote_types(jnp.float32, self.dtype))


def get_pose_net(cfg, dtype=jnp.bfloat16) -> PoseHighResolutionNet:
    extra = cfg.MODEL.EXTRA
    return PoseHighResolutionNet(
        stage2=dict(extra.STAGE2),
        stage3=dict(extra.STAGE3),
        stage4=dict(extra.STAGE4),
        num_joints=cfg.MODEL.NUM_JOINTS,
        final_conv_kernel=extra.FINAL_CONV_KERNEL,
        dtype=dtype,
    )
