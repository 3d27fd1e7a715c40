"""A/B: 2x2/2 maxpool as reduce_window (flax nn.max_pool) vs reshape+max.

Hourglass-scale tensors (128,64,64,256) bf16; fwd and f+b (the backward
of reduce_window is select_and_scatter — a known slow lowering).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as nn

N1, N2 = 10, 40


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


def pool_rw(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def pool_rs(x):
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(128, 64, 64, 256), jnp.bfloat16)

    y1, y2 = pool_rw(x), pool_rs(x)
    assert jnp.array_equal(y1, y2), "pool variants disagree"

    for name, pool in [("reduce_window", pool_rw), ("reshape+max", pool_rs)]:
        def fwd(i, v):
            y = pool(v)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return v + s.astype(v.dtype)

        def fb(i, v):
            def loss(xx):
                return jnp.sum(pool(xx).astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(v)
            return v + g.astype(v.dtype) * 1e-20

        tf_, tb = timed(fwd, x), timed(fb, x)
        print(f"{name:14s} fwd {tf_*1e3:7.4f} ms   f+b {tb*1e3:7.4f} ms",
              flush=True)


if __name__ == "__main__":
    main()
