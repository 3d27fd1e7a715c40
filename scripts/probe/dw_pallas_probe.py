"""Prototype: Pallas filter-gradient kernel for 3x3 stride-1 same-pad convs.

Why: the W32 trace shows branch0/branch1 conv *backward* dominating the
train step; probe2 shows XLA's kernel-grad for C=32 runs at 21 TF/s (its
output (3,3,32,32) has no spatial dim to lane-pack, so the MXU runs 25%
lanes at best and pays HBM re-reads).  This kernel streams x and dy once,
builds the 9 shifted taps in VMEM, and accumulates dw in a f32 scratch.

Measures: XLA autodiff dw vs pallas dw, correctness + in-jit timing.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N1, N2 = 20, 100
B = 64


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)


def _dw_kernel(xp_ref, dy_ref, out_ref, acc_ref, *, H, W, C, BC):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = xp_ref[...]
    dyf = dy_ref[...].reshape(BC * H * W, C)
    for r in range(3):
        for c in range(3):
            tap = x[:, r:r + H, c:c + W, :].reshape(BC * H * W, C)
            acc_ref[r, c] += lax.dot_general(
                tap, dyf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _done():
        out_ref[...] = acc_ref[...]


def dw_pallas(x, dy, BC=8):
    Bt, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid = Bt // BC
    return pl.pallas_call(
        functools.partial(_dw_kernel, H=H, W=W, C=C, BC=BC),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BC, H + 2, W + 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((BC, H, W, C), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3, C, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, 3, C, C), jnp.float32)],
    )(xp, dy)


def timed(body, init):
    @jax.jit
    def f(n, v):
        return lax.fori_loop(0, n, body, v)

    jax.block_until_ready(f(N1, init))

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(n, init)
            jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)).item()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(N2) - t(N1)) / (N2 - N1)


def main():
    rs = np.random.RandomState(0)
    for H, W, C, BC in [(64, 48, 32, 8), (32, 24, 64, 16)]:
        x = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
        dy0 = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
        cf = 2 * B * H * W * 9 * C * C

        # correctness vs autodiff
        _, vjp = jax.vjp(lambda ww: conv(x, ww), w)
        ref = vjp(dy0)[0].astype(jnp.float32)
        got = dw_pallas(x, dy0)
        err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"-- {H}x{W}x{C}: rel err {err:.2e}", flush=True)

        z = jnp.float32(0)

        def dw_auto(i, carry):
            dyc, acc = carry
            _, vjp = jax.vjp(lambda ww: conv(x, ww), w)
            g = vjp(dyc)[0]
            s = jnp.sum(g.astype(jnp.float32)) * 1e-20
            return dyc + s.astype(dyc.dtype), acc + s

        def dw_pl(i, carry):
            dyc, acc = carry
            g = dw_pallas(x, dyc, BC)
            s = jnp.sum(g) * 1e-20
            return dyc + s.astype(dyc.dtype), acc + s

        for name, body in [("dw auto", dw_auto), ("dw pallas", dw_pl)]:
            dt = timed(body, (dy0, z))
            print(f"  {name:10s} {dt*1e3:8.4f} ms {cf/dt/1e12:7.1f} TF/s",
                  flush=True)


if __name__ == "__main__":
    main()
