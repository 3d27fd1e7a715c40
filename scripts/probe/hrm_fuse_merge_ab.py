"""HRM fuse-layer 1x1 concat-width A/B (round-4 verdict #5).

The one self-identified HRNet-MFU lever never tried: an HRM source branch
j feeds a SEPARATE 1x1 conv per destination i<j (fuse_layers[i][j],
reference pose_hrnet.py:101-265).  All of those read the SAME input
tensor, so they can run as ONE conv with concatenated output width —
identical FLOPs, wider MXU N dimension, one kernel launch instead of
up-to-3.  This probe times the W32 stage-4 fuse set both ways (forward +
backward, bf16, differenced chained runs) to decide whether to wire it.

Also times the full sequential BasicBlock branch chains for context (the
3x3 residual chains CANNOT merge without block-diagonal FLOP waste —
space-to-depth variants were measured as losses in rounds 1-2).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe/hrm_fuse_merge_ab.py [batch]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
# W32 stage-4 branch shapes at 256x192 input
SHAPES = [(64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256)]
WARMUP, N1, N2 = 3, 10, 40


def conv1x1(x, w):
    # bf16 in / bf16 out, like the model's flax Conv (MXU accumulates in
    # f32 internally either way; preferred_element_type=f32 would break
    # the conv transpose rule under jax.grad with mixed dtypes).
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_inputs(rs):
    xs, ws_sep, ws_merged = [], [], []
    for j, (h, w, c) in enumerate(SHAPES):
        xs.append(jnp.asarray(rs.randn(B, h, w, c), jnp.bfloat16))
        dests = [SHAPES[i][2] for i in range(j)]  # 1x1 C_j -> C_i, i < j
        ws = [jnp.asarray(rs.randn(1, 1, c, ci) / np.sqrt(c), jnp.bfloat16)
              for ci in dests]
        ws_sep.append(ws)
        ws_merged.append(jnp.concatenate(ws, axis=-1) if ws else None)
    return xs, ws_sep, ws_merged


def fuse_separate(xs, ws_sep):
    outs = []
    for j, ws in enumerate(ws_sep):
        for w in ws:
            outs.append(jnp.sum(conv1x1(xs[j], w).astype(jnp.float32)))
    return jnp.stack(outs).sum()


def fuse_merged(xs, ws_merged):
    outs = []
    for j, w in enumerate(ws_merged):
        if w is None:
            continue
        y = conv1x1(xs[j], w)
        # split back per destination (consumers differ in real HRM)
        lo = 0
        for i in range(j):
            ci = SHAPES[i][2]
            outs.append(jnp.sum(y[..., lo:lo + ci].astype(jnp.float32)))
            lo += ci
    return jnp.stack(outs).sum()


def timed(fn, xs, args):
    loss_grad = jax.jit(jax.grad(lambda xs_: fn(xs_, args)))

    def run(n):
        cur = xs
        g = None
        for _ in range(WARMUP):
            g = loss_grad(cur)
        float(g[0].astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(n):
            cur = [x + gg.astype(x.dtype) * 0 for x, gg in zip(cur, g)]
            g = loss_grad(cur)
        float(g[0].astype(jnp.float32).sum())
        return time.perf_counter() - t0

    # min over trials: a transient relay stall inside one chained run is
    # NOT cancelled by differencing and fabricates a huge per-step time
    # (first run of this probe: 132 ms/step for six tiny 1x1 convs, 30x
    # the whole-model fuse budget from the round-2 trace).
    return min((run(N2) - run(N1)) / (N2 - N1) for _ in range(3))


def main():
    rs = np.random.RandomState(0)
    xs, ws_sep, ws_merged = make_inputs(rs)
    t_sep = timed(fuse_separate, xs, ws_sep)
    t_mrg = timed(fuse_merged, xs, ws_merged)
    print(f"fuse 1x1 separate: {t_sep*1e3:.3f} ms  merged: {t_mrg*1e3:.3f} ms"
          f"  ratio merged/sep {t_mrg/t_sep:.3f} "
          f"({'merged WINS' if t_mrg < t_sep else 'merged loses'})",
          flush=True)


if __name__ == "__main__":
    main()
