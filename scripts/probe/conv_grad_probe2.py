"""Probe: TRUE cost of conv gradients per HRNet branch shape.

conv_grad_probe.py's autodiff dx/dw numbers were invalid: the grads were
loop-invariant (constant x, w, dy), so XLA hoisted them out of the timing
fori_loop.  Here every iteration's gradient depends on the loop carry.

For each branch shape (b=64): fwd, dx, dw (autodiff), and dw alternates:
  dw_taps : 9 per-tap dot_generals on shifted slices (no im2col blowup)
  dw_im2col: concat patches + one dot_general
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N1, N2 = 20, 100
B = 64

SHAPES = [  # (H, W, C) per W32 branch
    (64, 48, 32),
    (32, 24, 64),
    (16, 12, 128),
    (8, 6, 256),
]


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)


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
    for H, W, C in SHAPES:
        x = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
        cf = 2 * B * H * W * 9 * C * C
        M = B * H * W

        def fwd(i, v):
            return conv(v, w)

        # dx: carry dy; output dx becomes next dy (carry-dependent)
        def dx(i, v):
            _, vjp = jax.vjp(lambda xx: conv(xx, w), x)
            return vjp(v)[0]

        # dw: carry dy through a scalar coupling into the next iteration
        def dw(i, carry):
            dyc, acc = carry
            _, vjp = jax.vjp(lambda ww: conv(x, ww), w)
            g = vjp(dyc)[0]
            s = jnp.sum(g.astype(jnp.float32)) * 1e-20
            return dyc + s.astype(dyc.dtype), acc + s

        def dw_taps(i, carry):
            dyc, acc = carry
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            dyf = dyc.reshape(M, C)
            gs = []
            for r in range(3):
                for c in range(3):
                    tap = xp[:, r:r + H, c:c + W, :].reshape(M, C)
                    gs.append(lax.dot_general(
                        tap, dyf, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
            g = jnp.stack(gs).reshape(3, 3, C, C)
            s = jnp.sum(g) * 1e-20
            return dyc + s.astype(dyc.dtype), acc + s

        def dw_im2col(i, carry):
            dyc, acc = carry
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            taps = [xp[:, r:r + H, c:c + W, :].reshape(M, C)
                    for r in range(3) for c in range(3)]
            patches = jnp.concatenate(taps, axis=-1)
            g = lax.dot_general(patches, dyc.reshape(M, C),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            s = jnp.sum(g) * 1e-20
            return dyc + s.astype(dyc.dtype), acc + s

        dy0 = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
        z = jnp.float32(0)
        print(f"-- {H}x{W}x{C}", flush=True)
        for name, body, init in [
            ("fwd", fwd, x),
            ("dx", dx, dy0),
            ("dw auto", dw, (dy0, z)),
            ("dw taps", dw_taps, (dy0, z)),
            ("dw im2col", dw_im2col, (dy0, z)),
        ]:
            dt = timed(body, init)
            print(f"  {name:10s} {dt*1e3:8.4f} ms {cf/dt/1e12:7.1f} TF/s",
                  flush=True)


if __name__ == "__main__":
    main()
