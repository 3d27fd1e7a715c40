"""Fused HRNet BasicBlock chains (the branch hot path).

An HRNet HighResolutionModule branch is a chain of 4 identity BasicBlocks
(conv3x3-BN-ReLU-conv3x3-BN-add-ReLU, reference ``pose_hrnet.py:28-57``;
here ``models/pose_hrnet.py:35-57,92-109``).  Under XLA each conv and each
train-mode BatchNorm is a separate HBM round-trip — measured ~9 memory
passes per block on v5e, which leaves the chain HBM-bandwidth-bound at
16-20% MFU (docs/BENCH_NOTES.md).  At the shipped batch sizes the whole
branch activation tensor is a few-MB — far smaller than the 128 MB VMEM —
so the chain can run as ONE Pallas kernel residency: activations never
leave VMEM between the 8 convolutions, batch-norm statistics are computed
exactly (full per-device batch) inside the kernel, and HBM sees one read
of the input plus one write of the output.

This module provides:

* ``chain_reference`` — pure-jnp execution of the chain with EXACTLY the
  flax semantics of the unfused path (bf16 convs, f32 BN with flax's
  ``mean(x^2)-mean(x)^2`` variance, momentum/eps identical) — the
  correctness oracle and the fallback implementation.
* ``chain_fused`` — the Pallas TPU path (forward now; custom-VJP backward
  in ops/fused_block_bwd.py) with trace-time eligibility gating.
* ``FusedBranchChain`` — a flax module that is a drop-in replacement for
  ``models.pose_hrnet.BranchChain`` with an IDENTICAL variable tree
  (params ``b{i}/conv1/Conv_0/kernel`` etc.), so checkpoints, the torch
  importer, and the test oracles are unchanged.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fhpe_tpu.models.common import BN_EPS, BN_MOMENTUM, normal001

# ---------------------------------------------------------------------------
# Parameter plumbing


def _block_param_init(planes: int):
    """Init for one block's params subtree, matching BasicBlock's tree:
    conv kernels normal(0, 0.001) f32, BN scale 1 / bias 0 (pose_hrnet
    init_weights semantics, reference pose_hrnet.py:462-478)."""

    def init(key):
        k1, k2 = jax.random.split(key)
        c = planes
        return {
            "conv1": {"Conv_0": {
                "kernel": normal001(k1, (3, 3, c, c), jnp.float32)}},
            "bn1": {"BatchNorm_0": {
                "scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}},
            "conv2": {"Conv_0": {
                "kernel": normal001(k2, (3, 3, c, c), jnp.float32)}},
            "bn2": {"BatchNorm_0": {
                "scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}},
        }

    return init


def _block_stats_init(planes: int):
    def init():
        c = planes
        z = {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)}
        return {"bn1": {"BatchNorm_0": dict(z)},
                "bn2": {"BatchNorm_0": dict(z)}}

    return init


def _unpack(block_params, block_stats):
    """-> (w1, g1, b1, m1, v1, w2, g2, b2, m2, v2) for one block."""
    p, s = block_params, block_stats
    return (p["conv1"]["Conv_0"]["kernel"],
            p["bn1"]["BatchNorm_0"]["scale"], p["bn1"]["BatchNorm_0"]["bias"],
            s["bn1"]["BatchNorm_0"]["mean"], s["bn1"]["BatchNorm_0"]["var"],
            p["conv2"]["Conv_0"]["kernel"],
            p["bn2"]["BatchNorm_0"]["scale"], p["bn2"]["BatchNorm_0"]["bias"],
            s["bn2"]["BatchNorm_0"]["mean"], s["bn2"]["BatchNorm_0"]["var"])


def _pack_stats(stats_list):
    """[(m1, v1, m2, v2), ...] -> batch_stats subtrees per block."""
    return [{"bn1": {"BatchNorm_0": {"mean": m1, "var": v1}},
             "bn2": {"BatchNorm_0": {"mean": m2, "var": v2}}}
            for (m1, v1, m2, v2) in stats_list]


# ---------------------------------------------------------------------------
# Reference (pure jnp) path — exact flax semantics


def _conv_bf16(x, kernel, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(dtype)


def _bn_train(x, scale, bias):
    """flax nn.BatchNorm training-mode stats in f32: biased variance via
    mean(x^2) - mean(x)^2 (flax _compute_stats)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    var = mean2 - jnp.square(mean)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (xf - mean) * inv * scale + bias
    return y, mean, var


def _bn_eval(x, scale, bias, mean, var):
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + BN_EPS)
    return (xf - mean) * inv * scale + bias


def chain_reference(x, params_list, stats_list, train: bool,
                    dtype=jnp.bfloat16):
    """Run the chain in pure jnp.  Returns (y, new_stats_list); in eval
    mode new_stats_list is stats_list unchanged."""
    new_stats = []
    for p, s in zip(params_list, stats_list):
        (w1, g1, b1, m1, v1, w2, g2, b2, m2, v2) = _unpack(p, s)
        residual = x
        u = _conv_bf16(x, w1, dtype)
        if train:
            un, bm1, bv1 = _bn_train(u, g1, b1)
        else:
            un = _bn_eval(u, g1, b1, m1, v1)
        a = nn.relu(un.astype(dtype))
        w = _conv_bf16(a, w2, dtype)
        if train:
            wn, bm2, bv2 = _bn_train(w, g2, b2)
            new_stats.append((BN_MOMENTUM * m1 + (1 - BN_MOMENTUM) * bm1,
                              BN_MOMENTUM * v1 + (1 - BN_MOMENTUM) * bv1,
                              BN_MOMENTUM * m2 + (1 - BN_MOMENTUM) * bm2,
                              BN_MOMENTUM * v2 + (1 - BN_MOMENTUM) * bv2))
        else:
            wn = _bn_eval(w, g2, b2, m2, v2)
        x = nn.relu(wn.astype(dtype) + residual)
    if not train:
        return x, [(s["bn1"]["BatchNorm_0"]["mean"],
                    s["bn1"]["BatchNorm_0"]["var"],
                    s["bn2"]["BatchNorm_0"]["mean"],
                    s["bn2"]["BatchNorm_0"]["var"]) for s in stats_list]
    return x, new_stats


# ---------------------------------------------------------------------------
# Pallas path (forward; see fused_block_kernels.py for the kernels)


def _eligible(x, num_blocks: int) -> bool:
    """Trace-time gating: TPU backend, BASIC-chain shapes that fit the
    kernel's VMEM plan, lane-friendly W, per-device batch divisible by the
    batch tile."""
    from fused_block_kernels import kernel_eligible

    platform = jax.default_backend()
    if platform not in ("tpu", "axon"):
        return False
    return kernel_eligible(x.shape, num_blocks)


def chain_fused(x, params_list, stats_list, train: bool,
                dtype=jnp.bfloat16, impl: str = "auto"):
    """Dispatch: Pallas fused chain on TPU when eligible, else reference.

    The Pallas kernels are forward-only (no custom VJP yet), so ``auto``
    selects them only in eval mode; a train-mode chain under ``jax.grad``
    must use the reference path.  ``impl='pallas'`` forces the kernel
    (forward-only callers, e.g. benchmarking / eval pipelines).
    """
    use_pallas = (impl == "pallas" or
                  (impl == "auto" and not train
                   and _eligible(x, len(params_list))))
    if not use_pallas:
        return chain_reference(x, params_list, stats_list, train, dtype)

    from fused_block_kernels import chain_pallas
    return chain_pallas(x, params_list, stats_list, train, dtype)


# ---------------------------------------------------------------------------
# Flax module, variable-tree-compatible with BranchChain


class FusedBranchChain(nn.Module):
    """Drop-in for models.pose_hrnet.BranchChain (BASIC, identity residual)
    with the same variable tree; executes via the fused chain.

    Only valid when in_channels == planes (no downsample block) — the
    HRM-branch case.  Cites reference pose_hrnet.py:101-186 (branch
    construction) for the capability being accelerated.
    """

    planes: int
    num_blocks: int
    dtype: Any = jnp.bfloat16
    impl: str = "auto"   # "auto" | "pallas" | "reference"

    @nn.compact
    def __call__(self, x, train: bool):
        params_list, stats_vars = [], []
        for i in range(self.num_blocks):
            params_list.append(self.param(f"b{i}",
                                          _block_param_init(self.planes)))
            stats_vars.append(self.variable(
                "batch_stats", f"b{i}", _block_stats_init(self.planes)))
        stats_list = [v.value for v in stats_vars]

        y, new_stats = chain_fused(x, params_list, stats_list, train,
                                   self.dtype, self.impl)
        if train and not self.is_initializing():
            for v, packed in zip(stats_vars, _pack_stats(new_stats)):
                v.value = packed
        return y
