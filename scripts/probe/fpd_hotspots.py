"""Probe the FPD-trace anomalies standalone (in-jit, carry-dependent).

1. score conv: 1x1 256->16 at (128,64,64,256) — trace shows 1.53 ms each
   (roofline ~0.35 ms). Variants: as-is, padded to 32/128 outputs.
2. bias-grad reduce_sum over (128,64,64,128) bf16 -> (128,) — trace shows
   0.59-1.12 ms (roofline 0.16 ms). Variants: plain sum, f32-upcast sum.
3. fc conv 1x1 256->256 (reference point).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N1, N2 = 10, 40
B = 128


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


def conv1x1(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, 64, 64, 256) * 0.1, jnp.bfloat16)

    for n_out in (16, 32, 128, 256):
        w = jnp.asarray(rs.randn(1, 1, 256, n_out) * 0.05, jnp.bfloat16)

        def body(i, v):
            y = conv1x1(v, w)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return v + s.astype(v.dtype)

        dt = timed(body, x)
        print(f"conv1x1 256->{n_out:3d}  {dt*1e3:8.4f} ms", flush=True)

    dy = jnp.asarray(rs.randn(B, 64, 64, 128), jnp.bfloat16)

    def bias_grad(i, v):
        s = jnp.sum(v.astype(jnp.float32), axis=(0, 1, 2))
        return v + (jnp.sum(s) * 1e-20).astype(v.dtype)

    def bias_grad_bf16(i, v):
        s = jnp.sum(v, axis=(0, 1, 2))
        return v + (jnp.sum(s).astype(jnp.float32) * 1e-20).astype(v.dtype)

    print(f"reduce_sum f32-acc   {timed(bias_grad, dy)*1e3:8.4f} ms",
          flush=True)
    print(f"reduce_sum bf16      {timed(bias_grad_bf16, dy)*1e3:8.4f} ms",
          flush=True)

    # autodiff bias grad through a biased conv (what the model actually does)
    w = jnp.asarray(rs.randn(1, 1, 128, 128) * 0.05, jnp.bfloat16)
    b = jnp.zeros((128,), jnp.float32)
    xx = jnp.asarray(rs.randn(B, 64, 64, 128) * 0.1, jnp.bfloat16)

    def loss(bb, v):
        y = conv1x1(v, w) + bb.astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32) * v.astype(jnp.float32)) * 1e-20

    def biased_conv_fb(i, carry):
        v, acc = carry
        g = jax.grad(loss)(b, v)
        s = jnp.sum(g) * 1e-20
        return v + s.astype(v.dtype), acc + s

    dt = timed(biased_conv_fb, (xx, jnp.float32(0)))
    print(f"conv+bias f+db       {dt*1e3:8.4f} ms", flush=True)


if __name__ == "__main__":
    main()
