"""Probe: Pallas 3x3 conv formulations for the HRNet fused-block kernel.

Two in-VMEM conv formulations, validated against lax.conv and timed on the
real TPU (differenced chained runs):

P-A  full im2col      — patches (M, 9C) @ (9C, C): trivial construction,
                        but N=C=32 fills 1/4 of the MXU lanes.
P-B  overlapped cols  — 4 consecutive output columns per matmul row:
                        patches (M/4, 18C) @ (18C, 4C). 2x padded FLOPs,
                        full 128 lanes at C=32. Taps are static rank-5
                        slices on a 4-aligned padded layout (no strided
                        slicing).

Run with --interpret for CPU correctness, default for TPU timing.
"""

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 64, 64, 48, 32
BT = 8  # batch tile


def conv_ref(x, w):
    """lax 3x3 SAME conv, NHWC x HWIO."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


# ---------------- P-A: full im2col ----------------

def _kernel_a(x_ref, w_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[:, 1:H + 1, 1:W + 1, :] = x_ref[:]
    xp = xpad[:]
    taps = [xp[:, dy:dy + H, dx:dx + W, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.stack(taps, axis=-2).reshape(BT * H * W, 9 * C)
    y = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(BT, H, W, C)


def conv_a(x, w, interpret=False):
    wmat = w.reshape(9 * C, C)  # HWIO -> (9C, C); tap order dy-major matches
    return pl.pallas_call(
        _kernel_a,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BT, H + 2, W + 2, C), x.dtype)],
        interpret=interpret,
    )(x, wmat)


# ---------------- P-B: overlapped 4-column groups ----------------

WQ = (W + 4) // 4  # padded cols [-1 .. W+2], width W+4 (mult of 4), groups


def _kernel_b(x_ref, w_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[:, 1:H + 1, 1:W + 1, :] = x_ref[:]
    xp = xpad[:].reshape(BT, H + 2, WQ, 4, C)
    # tap (r, c): padded w index c + 4k, k in [0, W//4) -> 5D static slice
    taps = []
    for r in range(3):
        for c in range(6):
            g, s = c // 4, c % 4
            taps.append(xp[:, r:r + H, g:g + W // 4, s, :])
    patches = jnp.stack(taps, axis=-2).reshape(BT * H * (W // 4), 18 * C)
    y = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(BT, H, W, C)


def _weights_b(w):
    """(3,3,C,C) HWIO -> (18C, 4C) block matrix: output subcol j uses input
    col offset c = j + dx (dx in 0..2) of the 6-wide window."""
    wb = np.zeros((3, 6, C, 4, C), np.float32)
    wn = np.asarray(w, np.float32)
    for j in range(4):
        for dx in range(3):
            wb[:, j + dx, :, j, :] = wn[:, dx, :, :]
    return jnp.asarray(wb.reshape(18 * C, 4 * C), w.dtype)


def conv_b(x, w, interpret=False):
    wmat = _weights_b(w)
    return pl.pallas_call(
        _kernel_b,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18 * C, 4 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BT, H + 2, W + 4, C), x.dtype)],
        interpret=interpret,
    )(x, wmat)


# ---------------- harness ----------------

def diff_time(f, x, n1=10, n2=40):
    def run(n):
        xx = x
        t0 = time.perf_counter()
        for _ in range(n):
            xx = f(xx)
        float(jnp.sum(xx.astype(jnp.float32)))
        return time.perf_counter() - t0

    run(3)
    return (run(n2) - run(n1)) / (n2 - n1)


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
    for name, fn in [("A", conv_a), ("B", conv_b)]:
        try:
            out = fn(x, w, interpret=args.interpret)
            err = float(jnp.max(jnp.abs(out - ref)))
            rel = err / float(jnp.max(jnp.abs(ref)))
            print(f"P-{name}: max abs err {err:.4f} rel {rel:.5f}", flush=True)
        except Exception as e:
            print(f"P-{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue

    if args.interpret:
        return

    flops = 2 * B * H * W * 9 * C * C
    fr = jax.jit(lambda xx: conv_ref(xx, w).astype(jnp.bfloat16))
    dt = diff_time(fr, x)
    print(f"XLA conv : {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)
    for name, fn in [("A", conv_a), ("B", conv_b)]:
        try:
            fj = jax.jit(lambda xx, fn=fn: fn(xx, w).astype(jnp.bfloat16))
            dt = diff_time(fj, x)
            print(f"Pallas {name} : {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"Pallas {name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
