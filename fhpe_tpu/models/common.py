"""Shared building blocks for the pose backbones.

TPU-first conventions used by every model in this package:

* **NHWC layout** everywhere — the native layout for XLA:TPU convolutions
  (the reference uses NCHW, the torch default).
* **Mixed precision**: convolutions compute in ``dtype`` (bfloat16 by
  default, MXU-native); parameters and BatchNorm statistics stay float32.
* **BatchNorm semantics**: torch ``momentum=0.1`` corresponds to flax
  ``momentum=0.9`` (flax keeps ``m*old + (1-m)*new``).  Statistics are
  per-device under data parallelism — matching the reference's
  ``nn.DataParallel`` per-replica BN (no sync-BN; SURVEY.md section 2.3).
* **Initializers**: ``torch_conv_kernel_init``/``torch_conv_bias_init``
  reproduce torch's default Conv2d init (kaiming_uniform with a=sqrt(5),
  i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in))) used by the hourglass model,
  which never calls an explicit init (reference ``lib/models/hourglass.py``).
  ``normal001`` is the explicit normal(0, 0.001) used by HRNet/PoseResNet
  (``pose_hrnet.py:462-478``, ``pose_resnet.py:209-249``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_MOMENTUM_TORCH = 0.1
BN_MOMENTUM = 1.0 - BN_MOMENTUM_TORCH
BN_EPS = 1e-5

Dtype = Any


def _conv_fan_in(shape: Sequence[int]) -> int:
    # flax conv kernel shape: (kh, kw, in_ch, out_ch)
    kh, kw, in_ch, _ = shape
    return kh * kw * in_ch


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(_conv_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int) -> Callable:
    """torch Conv2d default bias: U(+-1/sqrt(fan_in)) with the conv's fan_in."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


normal001 = nn.initializers.normal(stddev=0.001)


class Conv(nn.Module):
    """2D conv in NHWC with explicit torch-style symmetric padding.

    ``torch_init=True`` uses torch's default (hourglass); otherwise
    normal(0, 0.001) as in HRNet/ResNet ``init_weights``.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None  # None -> (kernel - 1) // 2
    use_bias: bool = False
    torch_init: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 if self.padding is None else self.padding
        in_ch = x.shape[-1]
        fan_in = self.kernel * self.kernel * in_ch
        kernel_init = torch_conv_kernel_init if self.torch_init else normal001
        bias_init = (make_torch_bias_init(fan_in) if self.torch_init
                     else nn.initializers.zeros)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def _batch_var(x32, mean, red, input_dtype=None):
    """Biased batch variance; algorithm chosen by the COMPUTE precision.

    * float32/float64 compute (parity paths, f32 production runs):
      TWO-PASS (mean of squared deviations — torch's algorithm).  The
      one-pass E[x^2]-E[x]^2 loses ~3 decimal digits to cancellation on
      post-ReLU activations (mean >> std), which Adam's g/|g| first-step
      normalization amplifies into visible trajectory divergence:
      measured 2.5e-3 forward error one-pass vs 1e-6 two-pass
      (tests/test_trajectory_parity.py).
    * bfloat16 inputs upcast to f32: ONE-PASS.  The cancellation error
      (~1e-6 relative here) sits four orders below bf16's own 1e-2
      rounding noise, and the extra activation pass of the two-pass form
      costs ~6% of the flagship hourglass step on v5e (744.6 -> 695.6
      img/s/chip, BENCH_r04 vs r03; scripts/probe/bn_var_ab.py).

    Module-level so the probe can monkeypatch either form.
    """
    if input_dtype is not None and jnp.dtype(input_dtype).itemsize < 4:
        return jnp.maximum(
            jnp.mean(jnp.square(x32), red) - jnp.square(mean), 0.0)
    return jnp.mean(jnp.square(x32 - mean), red)


class _TorchBatchNorm(nn.Module):
    """Inner BN with full torch ``_BatchNorm`` train-mode semantics.

    Written out by hand (rather than wrapping ``nn.BatchNorm``) for one
    semantic reason: torch normalizes with the *biased* batch variance but
    stores the *unbiased* (Bessel-corrected, n/(n-1)) variance into
    ``running_var`` (ATen batch_norm update), while flax's ``nn.BatchNorm``
    stores the biased one — an eval-time skew that the torch-trajectory
    parity test (tests/test_trajectory_parity.py) catches.  Collection
    layout ("batch_stats" with "mean"/"var", params "scale"/"bias") is
    identical to ``nn.BatchNorm`` so checkpoints and the torch importer
    are unaffected.
    """

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        # compute in >= float32 (bf16 inputs upcast; f64 parity runs stay f64)
        x32 = x.astype(jnp.promote_types(jnp.float32, x.dtype))
        c = x32.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            red = tuple(range(x32.ndim - 1))
            mean = jnp.mean(x32, red)
            var = _batch_var(x32, mean, red, input_dtype=x.dtype)
            if not self.is_initializing():
                n = 1
                for a in red:
                    n *= x32.shape[a]
                bessel = n / max(n - 1, 1)
                ra_mean.value = (BN_MOMENTUM * ra_mean.value
                                 + (1.0 - BN_MOMENTUM) * mean)
                ra_var.value = (BN_MOMENTUM * ra_var.value
                                + (1.0 - BN_MOMENTUM) * var * bessel)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x32 - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
        return y.astype(self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with torch momentum-0.1 semantics; computes in float32.

    Delegates to :class:`_TorchBatchNorm` under the child scope name
    ``BatchNorm_0`` so the parameter/batch-stats tree layout stays
    identical to the previous ``nn.BatchNorm``-based implementation
    (checkpoints and ``utils/torch_import.py`` paths unchanged).
    """

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        return _TorchBatchNorm(dtype=self.dtype, name="BatchNorm_0")(x, train)


def max_pool_2x2(x):
    """2x2/stride-2 max pool (reference hourglass F.max_pool2d(x, 2, 2))."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def max_pool_3x3_s2(x):
    """3x3/stride-2/pad-1 max pool (ResNet stem)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def upsample_nearest(x, factor: int = 2):
    """Nearest-neighbor upsample in NHWC (reference nn.Upsample(scale_factor)).

    Single broadcast+reshape (one materialization, fusable) instead of two
    sequential jnp.repeat materializations.
    """
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return y.reshape(b, h * factor, w * factor, c)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
