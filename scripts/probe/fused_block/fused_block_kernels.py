"""Pallas TPU kernels for fused HRNet BasicBlock chains.

Design (see ops/fused_block.py for why): one kernel residency per chain —
activations stay in VMEM across all 2*num_blocks convolutions; HBM sees one
read of the chain input and one write of its output, vs ~9 passes per block
for the unfused XLA lowering (measured on v5e, docs/BENCH_NOTES.md).

Conv formulation ("overlapped column groups"): all activations live in a
lane-packed layout (B, H, W/g, g*C) with group width g = 128 // C (g=1 for
C >= 128), so the minor dimension always fills the 128 vector lanes.  A
3x3 conv producing one g-column output group reads a 3 x (g+2) input
window; the kernel materializes those 3*(g+2) taps (static slices of a
group-aligned padded buffer — Mosaic-safe: leading-dim collapses and lane
concatenation only) and runs ONE matmul per tile:

    patches (BT*H*W/g, 3*(g+2)*C) @ Wmat (3*(g+2)*C, g*C)

Wmat is the conv kernel expanded block-sparsely over output subcolumns —
(g+2)/3 x padded FLOPs (2x at C=32) in exchange for full MXU lane
utilization; the chain is bandwidth-bound, so the padded FLOPs are free.

Training-mode BatchNorm is computed EXACTLY (full per-device batch) with a
three-phase schedule per block over batch tiles:
  phase 1: conv1 tiles -> y1 scratch, accumulate sum/sum^2
  phase 2: normalize+ReLU+conv2 tiles -> y2 scratch, accumulate stats
  phase 3: normalize+residual-add+ReLU -> next block's input
using 3 rotating whole-batch VMEM scratch buffers.  Variance uses flax's
single-pass mean(x^2) - mean(x)^2 formula on the bf16-rounded conv output
(exactly what nn.BatchNorm sees in the unfused path).

Eval mode folds running stats into per-channel scale/bias and runs the
whole chain tile-local under a pipelined grid.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fhpe_tpu.models.common import BN_EPS

VMEM_BUDGET = 110 * 1024 * 1024
VMEM_LIMIT = 120 * 1024 * 1024
BT = 4  # batch tile for the in-kernel loops


def _group_width(c: int) -> int:
    return max(1, 128 // c)


def kernel_eligible(shape, num_blocks: int = 4) -> bool:
    """Static shape gating for the fused chain kernels."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if c < 8 or c % 8 or c > 512:
        return False
    g = _group_width(c)
    if w % g or b % BT:
        return False
    # whole-batch buffers: in + out + 3 scratch (bf16), the expanded
    # weight matrices (2 convs/block, (3*(g+2)*C, g*C) bf16 each — scales
    # with num_blocks and C^2), and a working margin for tile temporaries.
    tensor = b * h * w * c * 2
    weights = 2 * num_blocks * (3 * (g + 2) * c) * (g * c) * 2
    if 5 * tensor + weights + 16 * 1024 * 1024 > VMEM_BUDGET:
        return False
    return True


def expand_conv_weights(w, g: int, dtype):
    """(3,3,C,C) HWIO -> (3*(g+2)*C, g*C) block matrix for the overlapped
    column-group matmul.  Output subcolumn j uses window column c = j + dx."""
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3 and ci == co
    c = ci
    wb = jnp.zeros((3, g + 2, c, g, c), jnp.float32)
    wf = w.astype(jnp.float32)
    for j in range(g):
        for dx in range(3):
            wb = wb.at[:, j + dx, :, j, :].add(wf[:, dx, :, :])
    return wb.reshape(3 * (g + 2) * c, g * c).astype(dtype)


def _conv_tile(xpad_val, wmat, bt, h, wg, g, c):
    """Padded tile value (bt, h+2, wg+2, g*C) -> conv output (bt, h, wg, g*C)
    f32 via taps + one matmul.  Tap (r, dc): window column c0 = dc covers
    padded group delta = (g - 1 + dc) // g, lane slot (dc - 1) % g."""
    taps = []
    for r in range(3):
        for dc in range(g + 2):
            delta = (g - 1 + dc) // g
            slot = (dc - 1) % g
            t = xpad_val[:, r:r + h, delta:delta + wg,
                         slot * c:(slot + 1) * c]
            taps.append(t.reshape(bt * h * wg, c))
    patches = jnp.concatenate(taps, axis=-1) if len(taps) > 1 else taps[0]
    y = jnp.dot(patches, wmat, preferred_element_type=jnp.float32)
    return y.reshape(bt, h, wg, g * c)


def _fold_slots(v2d, g: int, c: int):
    """(1, g*C) -> (1, C): sum over the g lane slots."""
    if g == 1:
        return v2d
    out = v2d[:, 0:c]
    for s in range(1, g):
        out = out + v2d[:, s * c:(s + 1) * c]
    return out


def _tile_slots(v2d, g: int):
    """(1, C) -> (1, g*C): repeat per-channel vector across the g slots."""
    if g == 1:
        return v2d
    return jnp.concatenate([v2d] * g, axis=-1)


# ---------------------------------------------------------------------------
# Train-mode kernel: whole chain, exact batch stats


def _train_kernel(nb, b, h, wg, g, c, dtype,
                  x_ref, w_ref, gamma_ref, beta_ref, o_ref,
                  means_ref, vars_ref, s1, s2, s3, xpad):
    nt = b // BT
    n = b * h * wg * g  # elements per channel
    gc = g * c

    def conv_phase(src_ref, w_idx, dst_ref, pre=None):
        """conv(pre(src_tile)) -> dst tiles; returns (sum, sumsq) (1, gc)."""
        wmat = w_ref[w_idx]

        def body(i, carry):
            sm, sq = carry
            xt = src_ref[pl.ds(i * BT, BT)]
            if pre is not None:
                xt = pre(xt)
            xpad[:] = jnp.zeros_like(xpad)
            xpad[:, 1:h + 1, 1:wg + 1, :] = xt.astype(dtype)
            y = _conv_tile(xpad[:], wmat, BT, h, wg, g, c)
            yb = y.astype(dtype)
            dst_ref[pl.ds(i * BT, BT)] = yb
            yf = yb.astype(jnp.float32)
            sm = sm + jnp.sum(yf, axis=(0, 1, 2)).reshape(1, gc)
            sq = sq + jnp.sum(jnp.square(yf), axis=(0, 1, 2)).reshape(1, gc)
            return sm, sq

        zero = jnp.zeros((1, gc), jnp.float32)
        return jax.lax.fori_loop(0, nt, body, (zero, zero))

    def finalize(sm, sq, k):
        """Batch stats for BN k; writes stats refs; returns folded
        (scale', bias') as (1, gc) f32."""
        mean_c = _fold_slots(sm, g, c) / n
        mean2_c = _fold_slots(sq, g, c) / n
        var_c = mean2_c - jnp.square(mean_c)
        means_ref[k:k + 1, :] = mean_c
        vars_ref[k:k + 1, :] = var_c
        gam = gamma_ref[k:k + 1, :]
        bet = beta_ref[k:k + 1, :]
        sc = gam * jax.lax.rsqrt(var_c + BN_EPS)
        bi = bet - mean_c * sc
        return _tile_slots(sc, g), _tile_slots(bi, g)

    bufs = [s1, s2, s3]
    cur = x_ref
    for blk in range(nb):
        y1_buf = bufs[0]
        y2_buf = bufs[1]
        out_buf = o_ref if blk == nb - 1 else bufs[0]

        sm1, sq1 = conv_phase(cur, 2 * blk, y1_buf)
        sc1, bi1 = finalize(sm1, sq1, 2 * blk)

        def pre_norm_relu(xt, sc=sc1, bi=bi1):
            return jnp.maximum(
                (xt.astype(jnp.float32) * sc + bi).astype(dtype), 0)

        sm2, sq2 = conv_phase(y1_buf, 2 * blk + 1, y2_buf, pre=pre_norm_relu)
        sc2, bi2 = finalize(sm2, sq2, 2 * blk + 1)

        def phase3(i, _, cur=cur, y2_buf=y2_buf, out_buf=out_buf,
                   sc=sc2, bi=bi2):
            y2t = y2_buf[pl.ds(i * BT, BT)].astype(jnp.float32)
            res = cur[pl.ds(i * BT, BT)].astype(dtype)
            out = (y2t * sc + bi).astype(dtype) + res
            out_buf[pl.ds(i * BT, BT)] = jnp.maximum(out, 0)
            return 0

        jax.lax.fori_loop(0, nt, phase3, 0)

        # rotate: bufs[0] (the block output) becomes next input; y2's buffer
        # and the previous input (when it was scratch, not x_ref) free up
        if blk < nb - 1:
            new_bufs = list(bufs[2:]) + [bufs[1]]
            if cur is not x_ref:
                new_bufs.append(cur)
            cur = bufs[0]
            bufs = new_bufs


def chain_pallas_train(x, wmats, gammas, betas, nb, g, dtype,
                       interpret=False):
    b, h, wg, gc = x.shape
    c = gc // g
    kern = functools.partial(_train_kernel, nb, b, h, wg, g, c, dtype)
    buf = lambda: pltpu.VMEM((b, h, wg, gc), dtype)  # noqa: E731
    y, means, variances = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, h, wg, gc), dtype),
                   jax.ShapeDtypeStruct((2 * nb, c), jnp.float32),
                   jax.ShapeDtypeStruct((2 * nb, c), jnp.float32)),
        scratch_shapes=[buf(), buf(), buf(),
                        pltpu.VMEM((BT, h + 2, wg + 2, gc), dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, wmats, gammas, betas)
    return y, means, variances


# ---------------------------------------------------------------------------
# Eval-mode kernel: running stats folded, tile-local, pipelined grid


def _eval_kernel(nb, h, wg, g, c, dtype,
                 x_ref, w_ref, scale_ref, bias_ref, o_ref, xpad):
    gc = g * c
    xt = x_ref[:]
    for blk in range(nb):
        res = xt
        for half in range(2):
            k = 2 * blk + half
            xpad[:] = jnp.zeros_like(xpad)
            xpad[:, 1:h + 1, 1:wg + 1, :] = xt
            y = _conv_tile(xpad[:], w_ref[k], BT, h, wg, g, c)
            sc = _tile_slots(scale_ref[k:k + 1, :], g)
            bi = _tile_slots(bias_ref[k:k + 1, :], g)
            y = (y * sc + bi).astype(dtype)
            xt = jnp.maximum(y, 0) if half == 0 else y
        xt = jnp.maximum(xt + res, 0)
    o_ref[:] = xt


def chain_pallas_eval(x, wmats, scales, biases, nb, g, dtype,
                      interpret=False):
    b, h, wg, gc = x.shape
    c = gc // g
    kern = functools.partial(_eval_kernel, nb, h, wg, g, c, dtype)
    return pl.pallas_call(
        kern,
        grid=(b // BT,),
        in_specs=[
            pl.BlockSpec((BT, h, wg, gc), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2 * nb,) + wmats.shape[1:], lambda i: (0, 0, 0)),
            pl.BlockSpec((2 * nb, c), lambda i: (0, 0)),
            pl.BlockSpec((2 * nb, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BT, h, wg, gc), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wg, gc), dtype),
        scratch_shapes=[pltpu.VMEM((BT, h + 2, wg + 2, gc), dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, wmats, scales, biases)


# ---------------------------------------------------------------------------
# Host-side entry: packing + dispatch (forward only; custom VJP wires the
# backward in fused_block.py once fused_block_bwd.py lands)


def _pack(params_list, stats_list, g, dtype, train):
    from fused_block import _unpack

    wm, gam, bet, scl, bia, run = [], [], [], [], [], []
    for p, s in zip(params_list, stats_list):
        (w1, g1, b1, m1, v1, w2, g2, b2, m2, v2) = _unpack(p, s)
        for (w, ga, be, m, v) in ((w1, g1, b1, m1, v1),
                                  (w2, g2, b2, m2, v2)):
            wm.append(expand_conv_weights(w, g, dtype))
            gam.append(ga)
            bet.append(be)
            run.append((m, v))
            if not train:
                sc = ga * jax.lax.rsqrt(v + BN_EPS)
                scl.append(sc)
                bia.append(be - m * sc)
    wmats = jnp.stack(wm)
    if train:
        return wmats, jnp.stack(gam), jnp.stack(bet), run
    return wmats, jnp.stack(scl), jnp.stack(bia), run


def chain_pallas(x, params_list, stats_list, train, dtype=jnp.bfloat16,
                 interpret=False):
    """Group-pack x, run the fused chain, unpack; returns (y, new_stats)
    with the same contract as fused_block.chain_reference."""
    from fhpe_tpu.models.common import BN_MOMENTUM

    b, h, w, c = x.shape
    g = _group_width(c)
    nb = len(params_list)
    xg = x.astype(dtype).reshape(b, h, w // g, g * c)

    if train:
        wmats, gammas, betas, run = _pack(params_list, stats_list, g, dtype,
                                          True)
        y, means, variances = chain_pallas_train(
            xg, wmats, gammas, betas, nb, g, dtype, interpret)
        new_stats = []
        for blk in range(nb):
            m1o, v1o = run[2 * blk]
            m2o, v2o = run[2 * blk + 1]
            upd = lambda old, new: BN_MOMENTUM * old + (1 - BN_MOMENTUM) * new
            new_stats.append((upd(m1o, means[2 * blk]),
                              upd(v1o, variances[2 * blk]),
                              upd(m2o, means[2 * blk + 1]),
                              upd(v2o, variances[2 * blk + 1])))
        return y.reshape(b, h, w, c), new_stats

    wmats, scales, biases, run = _pack(params_list, stats_list, g, dtype,
                                       False)
    y = chain_pallas_eval(xg, wmats, scales, biases, nb, g, dtype, interpret)
    return y.reshape(b, h, w, c), [(m, v, m2, v2) for ((m, v), (m2, v2)) in
                                   zip(run[0::2], run[1::2])]
