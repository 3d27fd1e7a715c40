"""Stacked Hourglass network (Newell et al., ECCV 2016), TPU-native rebuild.

Capability-equivalent to the reference ``lib/models/hourglass.py`` (teacher:
stacks=8/features=256, student: stacks=4/features=128, FPD CVPR'19) but
written as a functional flax module in NHWC with a statically-unrolled
recursion — XLA sees one flat graph, no Python control flow at run time.

Architecture notes mirroring the reference semantics:
* Pre-activation Bottleneck with expansion 2 and conv **bias on**
  (hourglass.py:11-52).
* ``NUM_FEATURES`` from the config is halved internally: stem plane count is
  ``features/4``, hourglass planes ``features/2``, block channels
  ``features/2 * 2`` (hourglass.py:110-127).
* Per-stack intermediate supervision: returns one heatmap per stack, with
  inter-stack feedback ``x = x + fc_(y) + score_(score)``
  (hourglass.py:181-190).
* Depth-4 hourglass: downsample by maxpool, upsample by nearest neighbor.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm, Conv, max_pool_2x2, upsample_nearest


class Bottleneck(nn.Module):
    """Pre-activation bottleneck, expansion 2, biased convs.

    ``biased=False`` (TPU.DEAD_BIAS_SKIP) drops the conv biases: in this
    pre-activation topology every one of them feeds a BatchNorm through
    purely constant-commuting ops (residual adds, maxpool, nearest
    upsample), so BN absorbs them exactly — their gradients are
    identically zero and the outputs do not depend on them, in train or
    eval mode.  Dropping them removes one reduce-sum HBM pass over dy per
    conv from the backward (docs/BENCH_NOTES.md bias-grad finding).
    """

    planes: int
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    biased: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        b = self.biased
        residual = x
        out = BatchNorm(dtype=self.dtype, name="bn1")(x, train)
        out = nn.relu(out)
        out = Conv(self.planes, kernel=1, use_bias=b, dtype=self.dtype,
                   name="conv1")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, kernel=3, use_bias=b, dtype=self.dtype,
                   name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes * 2, kernel=1, use_bias=b, dtype=self.dtype,
                   name="conv3")(out)
        if self.downsample:
            residual = Conv(self.planes * 2, kernel=1, use_bias=b,
                            dtype=self.dtype, name="downsample")(x)
        return out + residual


class ResidualChain(nn.Module):
    """``num_blocks`` bottlenecks at ``planes`` (first may downsample)."""

    planes: int
    num_blocks: int
    in_channels: int
    dtype: Any = jnp.bfloat16
    biased: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        down = self.in_channels != self.planes * 2
        x = Bottleneck(self.planes, downsample=down, dtype=self.dtype,
                       biased=self.biased, name="block0")(x, train)
        for i in range(1, self.num_blocks):
            x = Bottleneck(self.planes, dtype=self.dtype, biased=self.biased,
                           name=f"block{i}")(x, train)
        return x


class HourglassModule(nn.Module):
    """One depth-``depth`` hourglass over ``planes*2``-channel features.

    The recursion of the reference (hourglass.py:80-92) is unrolled
    statically; level ``n`` runs at spatial stride ``2**(depth-n)``.
    """

    planes: int
    num_blocks: int
    depth: int = 4
    dtype: Any = jnp.bfloat16
    biased: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        ch = self.planes * 2

        def res(name):
            return ResidualChain(self.planes, self.num_blocks, ch,
                                 dtype=self.dtype, biased=self.biased,
                                 name=name)

        def level(n, x):
            up1 = res(f"up1_{n}")(x, train)
            low1 = max_pool_2x2(x)
            low1 = res(f"low1_{n}")(low1, train)
            if n > 1:
                low2 = level(n - 1, low1)
            else:
                low2 = res("low2_base")(low1, train)
            low3 = res(f"low3_{n}")(low2, train)
            up2 = upsample_nearest(low3)
            return up1 + up2

        return level(self.depth, x)


class HourglassNet(nn.Module):
    """Full stacked-hourglass with per-stack heatmap outputs.

    Input NHWC ``(B, H, W, 3)``; output ``(num_stacks, B, H/4, W/4, J)`` —
    stacked along a leading axis instead of the reference's Python list so
    the per-stack loss is one fused reduction.
    """

    num_stacks: int = 8
    num_blocks: int = 1
    num_features: int = 256  # cfg MODEL.EXTRA.NUM_FEATURES (pre-halving)
    num_joints: int = 16
    dtype: Any = jnp.bfloat16
    # TPU.DEAD_BIAS_SKIP: drop every conv bias except the score heads'.
    # All of them are exactly absorbed by a downstream BatchNorm (see
    # Bottleneck docstring) — training dynamics and outputs are equivalent;
    # the backward loses one dy reduce-sum pass per conv.  Checkpoints are
    # self-consistent under the knob but NOT interchangeable with the
    # default (biased) variable tree — keep it fixed per run.
    dead_bias_skip: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = self.num_features // 4
        feats = self.num_features // 2
        ch = feats * 2
        b = not self.dead_bias_skip

        # Stem: 7x7/2 conv -> res -> maxpool -> res -> res (hourglass.py:170-179)
        x = Conv(inplanes, kernel=7, stride=2, use_bias=b,
                 dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = ResidualChain(inplanes, 1, inplanes, dtype=self.dtype, biased=b,
                          name="layer1")(x, train)
        x = max_pool_2x2(x)
        # layer2 planes = inplanes*2 (reference passes mutated self.inplanes)
        x = ResidualChain(inplanes * 2, 1, inplanes * 2, dtype=self.dtype,
                          biased=b, name="layer2")(x, train)
        x = ResidualChain(feats, 1, inplanes * 4, dtype=self.dtype, biased=b,
                          name="layer3")(x, train)

        outs: List[jnp.ndarray] = []
        for i in range(self.num_stacks):
            y = HourglassModule(feats, self.num_blocks, dtype=self.dtype,
                                biased=b, name=f"hg{i}")(x, train)
            y = ResidualChain(feats, self.num_blocks, ch, dtype=self.dtype,
                              biased=b, name=f"res{i}")(y, train)
            y = Conv(ch, kernel=1, use_bias=b, dtype=self.dtype,
                     name=f"fc{i}_conv")(y)
            y = BatchNorm(dtype=self.dtype, name=f"fc{i}_bn")(y, train)
            y = nn.relu(y)
            # score heads keep their bias: the heatmap output has no BN
            # after it, so these biases are live parameters.
            score = Conv(self.num_joints, kernel=1, use_bias=True,
                         dtype=self.dtype, name=f"score{i}")(y)
            outs.append(score.astype(jnp.promote_types(jnp.float32, self.dtype)))
            if i < self.num_stacks - 1:
                fc_ = Conv(ch, kernel=1, use_bias=b, dtype=self.dtype,
                           name=f"fc_{i}")(y)
                score_ = Conv(ch, kernel=1, use_bias=b, dtype=self.dtype,
                              name=f"score_{i}")(score)
                x = x + fc_ + score_

        return jnp.stack(outs, axis=0)


def get_pose_net(cfg, dtype=jnp.bfloat16) -> HourglassNet:
    """Factory mirroring the reference's get_pose_net (hourglass.py:195-197)."""
    extra = cfg.MODEL.EXTRA
    return HourglassNet(
        num_stacks=extra.NUM_STACKS,
        num_blocks=extra.NUM_BLOCKS,
        num_features=extra.NUM_FEATURES,
        num_joints=cfg.MODEL.NUM_JOINTS,
        dtype=dtype,
        dead_bias_skip=bool(cfg.TPU.get("DEAD_BIAS_SKIP", False)),
    )
