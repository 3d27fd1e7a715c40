"""Measure sustained HBM streaming bandwidth (carry-dependent in-jit loop).

y = x + tiny: reads 268MB, writes 268MB per iteration (bf16), no reuse.
Also f32 (536MB each way) and a reduce (read-only).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

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


def main():
    rs = np.random.RandomState(0)
    for dt, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        x = jnp.asarray(rs.randn(128, 64, 64, 256) * 0.1, dt)
        nbytes = x.size * x.dtype.itemsize

        def add(i, v):
            return v + jnp.asarray(1e-7, dt)

        dtm = timed(add, x)
        print(f"{name} add (r+w {2*nbytes/1e6:.0f}MB): {dtm*1e3:7.4f} ms "
              f"= {2*nbytes/dtm/1e9:6.0f} GB/s", flush=True)

        def red(i, carry):
            v, acc = carry
            s = jnp.sum(v.astype(jnp.float32)) * 1e-20
            return v + s.astype(v.dtype), acc + s

        dtr = timed(red, (x, jnp.float32(0)))
        print(f"{name} sum+add (r+r+w {3*nbytes/1e6:.0f}MB): {dtr*1e3:7.4f} ms"
              f" = {3*nbytes/dtr/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
