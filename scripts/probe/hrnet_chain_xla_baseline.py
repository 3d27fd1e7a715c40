"""Probe: XLA baselines for one HRNet branch chain on real TPU.

Measures (differenced chained-run timing, see docs/BENCH_NOTES.md):
  - isolated 3x3 conv at each branch width (roofline reference)
  - BranchChain (4 BasicBlocks) train-mode forward
  - BranchChain forward+backward (grads wrt params)

Per-device batch 64, COCO 256x192 geometry (hm 64x48 top branch).
"""

import time
import json

import numpy as np
import jax
import jax.numpy as jnp

from fhpe_tpu.models.pose_hrnet import BranchChain
from fhpe_tpu.models.common import Conv

B = 64
SHAPES = [  # (H, W, C) per branch, COCO 256x192
    (64, 48, 32),
    (32, 24, 64),
    (16, 12, 128),
    (8, 6, 256),
]
WARM, N1, N2 = 3, 10, 40


def diff_time(run):
    run(WARM)
    t1 = run(N1)
    t2 = run(N2)
    return (t2 - t1) / (N2 - N1)


def bench_conv(h, w, c):
    conv = Conv(c, 3, torch_init=False, dtype=jnp.bfloat16)
    x0 = jnp.asarray(np.random.RandomState(0).randn(B, h, w, c), jnp.bfloat16)
    v = conv.init(jax.random.PRNGKey(0), x0)
    f = jax.jit(lambda xx: conv.apply(v, xx))

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = f(x)
        float(jnp.sum(x.astype(jnp.float32)))
        return time.perf_counter() - t0

    dt = diff_time(run)
    flops = 2 * B * h * w * 9 * c * c
    return dt, flops / dt / 1e12


def bench_chain(h, w, c, backward):
    chain = BranchChain("BASIC", c, 4, c, dtype=jnp.bfloat16)
    x0 = jnp.asarray(np.random.RandomState(0).randn(B, h, w, c), jnp.bfloat16)
    variables = chain.init(jax.random.PRNGKey(0), x0, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    if not backward:
        f = jax.jit(lambda xx: chain.apply(
            {"params": params, "batch_stats": stats}, xx, train=True,
            mutable=["batch_stats"])[0])

        def run(n):
            x = x0
            t0 = time.perf_counter()
            for _ in range(n):
                x = f(x)
            float(jnp.sum(x.astype(jnp.float32)))
            return time.perf_counter() - t0
    else:
        def loss_fn(p, xx):
            out, _ = chain.apply({"params": p, "batch_stats": stats}, xx,
                                 train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        g = jax.jit(jax.grad(loss_fn))

        def run(n):
            p = params
            t0 = time.perf_counter()
            for _ in range(n):
                gr = g(p, x0)
                p = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, gr)
            float(jax.tree_util.tree_leaves(p)[0].astype(jnp.float32).sum())
            return time.perf_counter() - t0

    dt = diff_time(run)
    conv_flops = 2 * B * h * w * 9 * c * c * 8  # 8 convs per chain
    if backward:
        conv_flops *= 3  # fwd + dx + dw
    return dt, conv_flops / dt / 1e12


def main():
    out = {}
    for (h, w, c) in SHAPES:
        dt, tf = bench_conv(h, w, c)
        out[f"conv_{c}ch"] = {"ms": round(dt * 1e3, 3), "tf_s": round(tf, 1)}
        print(f"conv   C={c:4d} {h}x{w}: {dt*1e3:8.3f} ms  {tf:6.1f} TF/s",
              flush=True)
    for (h, w, c) in SHAPES:
        dt, tf = bench_chain(h, w, c, backward=False)
        out[f"chain_fwd_{c}ch"] = {"ms": round(dt * 1e3, 3),
                                   "tf_s": round(tf, 1)}
        print(f"chain fwd  C={c:4d}: {dt*1e3:8.3f} ms  {tf:6.1f} TF/s",
              flush=True)
        dt, tf = bench_chain(h, w, c, backward=True)
        out[f"chain_fwdbwd_{c}ch"] = {"ms": round(dt * 1e3, 3),
                                      "tf_s": round(tf, 1)}
        print(f"chain f+b  C={c:4d}: {dt*1e3:8.3f} ms  {tf:6.1f} TF/s",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
