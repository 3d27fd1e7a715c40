"""PoseResNet (SimpleBaseline, Xiao et al. ECCV 2018), TPU-native rebuild.

Capability-equivalent to the reference ``lib/models/pose_resnet.py``:
ResNet-{18,34,50,101,152} trunk, three 4x4/stride-2 transposed convs to
256ch, and a 1x1 heatmap head.  NHWC flax module; the transposed convs use
flax ``ConvTranspose`` configured to exactly double spatial dims (torch:
kernel 4, stride 2, pad 1 -> out = 2*in; here padding matched accordingly).

Init matches the reference's from-scratch branch (pose_resnet.py:236-249):
conv/deconv kernels normal(0, 0.001), BN gamma=1 beta=0; deconv bias off by
default (``DECONV_WITH_BIAS: false``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm, Conv, max_pool_3x3_s2, normal001
from .pose_hrnet import BLOCKS

RESNET_SPEC = {
    18: ("BASIC", [2, 2, 2, 2]),
    34: ("BASIC", [3, 4, 6, 3]),
    50: ("BOTTLENECK", [3, 4, 6, 3]),
    101: ("BOTTLENECK", [3, 4, 23, 3]),
    152: ("BOTTLENECK", [3, 8, 36, 3]),
}


class ResNetStage(nn.Module):
    block: str
    planes: int
    num_blocks: int
    in_channels: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        cls = BLOCKS[self.block]
        out_ch = self.planes * cls.expansion
        down = self.stride != 1 or self.in_channels != out_ch
        x = cls(self.planes, stride=self.stride, downsample=down,
                dtype=self.dtype, name="b0")(x, train)
        for i in range(1, self.num_blocks):
            x = cls(self.planes, dtype=self.dtype, name=f"b{i}")(x, train)
        return x


class Deconv(nn.Module):
    """4x4/s2 transposed conv doubling H and W (torch k4 s2 p1 equivalent)."""

    features: int
    kernel: int = 4
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # torch output size: (in-1)*2 - 2*pad + k; for (k, pad) in
        # {(4,1), (3,1)+outpad1, (2,0)} this is exactly 2*in, which flax
        # ConvTranspose produces with padding='SAME' at stride 2.
        return nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(2, 2),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=normal001,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class PoseResNet(nn.Module):
    num_layers: int = 50
    num_joints: int = 17
    num_deconv_layers: int = 3
    num_deconv_filters: Sequence[int] = (256, 256, 256)
    num_deconv_kernels: Sequence[int] = (4, 4, 4)
    deconv_with_bias: bool = False
    final_conv_kernel: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers = RESNET_SPEC[self.num_layers]
        exp = BLOCKS[block].expansion

        x = Conv(64, 7, 2, padding=3, torch_init=False, dtype=self.dtype,
                 name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        in_ch = 64
        for i, (planes, stride) in enumerate(
                zip((64, 128, 256, 512), (1, 2, 2, 2))):
            x = ResNetStage(block, planes, layers[i], in_ch, stride,
                            dtype=self.dtype, name=f"layer{i + 1}")(x, train)
            in_ch = planes * exp

        for i in range(self.num_deconv_layers):
            x = Deconv(self.num_deconv_filters[i], self.num_deconv_kernels[i],
                       use_bias=self.deconv_with_bias, dtype=self.dtype,
                       name=f"deconv{i}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"deconv{i}_bn")(x, train)
            x = nn.relu(x)

        pad = 1 if self.final_conv_kernel == 3 else 0
        out = Conv(self.num_joints, self.final_conv_kernel, padding=pad,
                   use_bias=True, torch_init=False, dtype=self.dtype,
                   name="final_layer")(x)
        return out.astype(jnp.promote_types(jnp.float32, self.dtype))


def get_pose_net(cfg, dtype=jnp.bfloat16) -> PoseResNet:
    extra = cfg.MODEL.EXTRA
    return PoseResNet(
        num_layers=extra.NUM_LAYERS,
        num_joints=cfg.MODEL.NUM_JOINTS,
        num_deconv_layers=extra.NUM_DECONV_LAYERS,
        num_deconv_filters=tuple(extra.NUM_DECONV_FILTERS),
        num_deconv_kernels=tuple(extra.NUM_DECONV_KERNELS),
        deconv_with_bias=extra.DECONV_WITH_BIAS,
        final_conv_kernel=extra.FINAL_CONV_KERNEL,
        dtype=dtype,
    )
