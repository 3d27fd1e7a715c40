"""Probe v2: Mosaic-compatible conv formulations + corrected XLA f+b baseline.

Mosaic rejected jnp.stack (unit-dim insert) and minor-dim-merging reshapes.
Layout-safe variants:

P-C  9-matmul accumulate — tap_2d (M, C) @ W_k (C, C), f32 accumulator.
P-A2 lane-concat im2col  — jnp.concatenate(taps, axis=-1) -> (M, 9C) @ (9C, C).
P-B2 overlapped groups   — taps from a (Bt,H+2,Wq,4C)-lane layout via lane
     slices, concat -> (M/4, 18C) @ (18C, 4C); out ref shaped (B,H,W/4,4C).

Also: XLA chain f+b with the param update folded INTO the jit (one dispatch
per step — the v1 numbers were relay-dispatch-bound).
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 64, 64, 48, 32
BT = 4
M = BT * H * W


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _taps_2d(xpad):
    """xpad (BT,H+2,W+2,C) value -> 9 taps, each (M, C) via leading-collapse
    reshapes only."""
    taps = []
    for dy in range(3):
        for dx in range(3):
            t = xpad[:, dy:dy + H, dx:dx + W, :]
            taps.append(t.reshape(M, C))
    return taps


def _kernel_c(x_ref, w_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[:, 1:H + 1, 1:W + 1, :] = x_ref[:]
    taps = _taps_2d(xpad[:])
    acc = jnp.zeros((M, C), jnp.float32)
    for k, t in enumerate(taps):
        acc = acc + jnp.dot(t, w_ref[k], preferred_element_type=jnp.float32)
    o_ref[:] = acc.reshape(BT, H, W, C).astype(o_ref.dtype)


def conv_c(x, w, interpret=False):
    wk = w.reshape(9, C, C)
    return pl.pallas_call(
        _kernel_c,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BT, H + 2, W + 2, C), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x, wk)


def _kernel_a2(x_ref, w_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[:, 1:H + 1, 1:W + 1, :] = x_ref[:]
    patches = jnp.concatenate(_taps_2d(xpad[:]), axis=-1)  # (M, 9C)
    y = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(BT, H, W, C).astype(o_ref.dtype)


def conv_a2(x, w, interpret=False):
    wmat = w.reshape(9 * C, C)
    return pl.pallas_call(
        _kernel_a2,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BT, H + 2, W + 2, C), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x, wmat)


# ---- P-B2: overlapped 4-col groups, lane-packed layout ----
WQ = (W + 4) // 4
MG = BT * H * (W // 4)


def _kernel_b2(x_ref, w_ref, o_ref, xpad):
    # x_ref (BT, H, W//4, 4C): lane-packed groups of 4 cols
    xpad[:] = jnp.zeros_like(xpad)
    # write x into padded groups: padded col w' = w + 1 -> group (w+1)//4.
    # x group g covers cols 4g..4g+3 = padded 4g+1..4g+4: crosses padded
    # group boundary -> write via two lane-shifted halves is complex; instead
    # pad in ORIGINAL cols then re-pack: here we keep xpad as (BT,H+2,W+4,C)
    # and accept sublane-dim (W) slicing, with taps lane-sliced from a 4C
    # repack below.
    xpad[:, 1:H + 1, 1:W + 1, :] = x_ref[:].reshape(BT, H, W, C)
    xp = xpad[:].reshape(BT, H + 2, WQ, 4 * C)
    taps = []
    for r in range(3):
        for c in range(6):
            g, s = c // 4, c % 4
            t = xp[:, r:r + H, g:g + W // 4, s * C:(s + 1) * C]
            taps.append(t.reshape(MG, C))
    patches = jnp.concatenate(taps, axis=-1)  # (MG, 18C)
    y = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(BT, H, W // 4, 4 * C).astype(o_ref.dtype)


def _weights_b(w):
    wb = np.zeros((3, 6, C, 4, C), np.float32)
    wn = np.asarray(w, np.float32)
    for j in range(4):
        for dx in range(3):
            wb[:, j + dx, :, j, :] = wn[:, dx, :, :]
    return jnp.asarray(wb.reshape(18 * C, 4 * C), w.dtype)


def conv_b2(x, w, interpret=False):
    wmat = _weights_b(w)
    xg = x.reshape(B, H, W // 4, 4 * C)
    out = pl.pallas_call(
        _kernel_b2,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, H, W // 4, 4 * C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18 * C, 4 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, H, W // 4, 4 * C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W // 4, 4 * C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BT, H + 2, W + 4, C), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xg, wmat)
    return out.reshape(B, H, W, C)


def diff_time(f, x, n1=10, n2=40):
    def run(n):
        xx = x
        t0 = time.perf_counter()
        for _ in range(n):
            xx = f(xx)
        float(jnp.sum(xx.astype(jnp.float32)))
        return time.perf_counter() - t0

    run(3)
    return min((run(n2) - run(n1)) / (n2 - n1) for _ in range(3))


def bench_chain_fb():
    """Corrected XLA chain f+b: update folded into ONE jitted call."""
    from fhpe_tpu.models.pose_hrnet import BranchChain

    chain = BranchChain("BASIC", C, 4, C, dtype=jnp.bfloat16)
    x0 = jnp.asarray(np.random.RandomState(0).randn(B, H, W, C), jnp.bfloat16)
    variables = chain.init(jax.random.PRNGKey(0), x0, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p, xx):
        out, _ = chain.apply({"params": p, "batch_stats": stats}, xx,
                             train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    @jax.jit
    def step(p, xx):
        g = jax.grad(loss_fn)(p, xx)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)

    def run(n):
        p = params
        t0 = time.perf_counter()
        for _ in range(n):
            p = step(p, x0)
        float(jax.tree_util.tree_leaves(p)[0].astype(jnp.float32).sum())
        return time.perf_counter() - t0

    run(3)
    dt = (run(40) - run(10)) / 30
    flops = 2 * B * H * W * 9 * C * C * 8 * 3
    print(f"XLA chain f+b (1 dispatch): {dt*1e3:8.3f} ms "
          f"{flops/dt/1e12:6.1f} TF/s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rs.randn(3, 3, C, C) * 0.1, jnp.bfloat16)
    ref = conv_ref(x, w)

    variants = [("C", conv_c), ("A2", conv_a2), ("B2", conv_b2)]
    ok = []
    for name, fn in variants:
        try:
            out = fn(x, w, interpret=args.interpret)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            print(f"P-{name}: max abs err {err:.4f}", flush=True)
            ok.append((name, fn))
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"P-{name}: FAILED {type(e).__name__}: {msg}", flush=True)

    if args.interpret:
        return

    flops = 2 * B * H * W * 9 * C * C
    fr = jax.jit(lambda xx: conv_ref(xx, w).astype(jnp.bfloat16))
    dt = diff_time(fr, x)
    print(f"XLA conv : {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)
    for name, fn in ok:
        fj = jax.jit(lambda xx, fn=fn: fn(xx, w).astype(jnp.bfloat16))
        try:
            dt = diff_time(fj, x)
            print(f"Pallas {name}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"Pallas {name}: RUN FAILED {type(e).__name__}", flush=True)

    bench_chain_fb()


if __name__ == "__main__":
    main()
