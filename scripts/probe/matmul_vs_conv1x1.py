"""Probe: 1x1 conv vs reshaped dot_general on hourglass-sized tensors.

fpd_hotspots.py found conv1x1 on (128,64,64,256) costs ~1.35 ms for ANY
output width (16..256) — input streams at only ~200 GB/s.  If a reshaped
(M,K)@(K,N) dot streams at full HBM bandwidth, rewriting the model's 1x1
convs as dots is a step-change win (hourglass bottlenecks are 1x1-heavy).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N1, N2 = 10, 40
B = 128
M = B * 64 * 64


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

    for k, n_out in [(256, 16), (256, 128), (256, 256), (128, 128)]:
        x4 = jnp.asarray(rs.randn(B, 64, 64, k) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rs.randn(k, n_out) * 0.05, jnp.bfloat16)
        wc = w.reshape(1, 1, k, n_out)

        def conv_body(i, v):
            y = lax.conv_general_dilated(
                v, wc, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(v.dtype)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return v + s.astype(v.dtype)

        def dot_body(i, v):
            y = jax.lax.dot_general(v.reshape(M, k), w,
                                    (((1,), (0,)), ((), ())))
            s = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return v + s.astype(v.dtype)

        def dot4_body(i, v):
            # keep 4D: contract last dim directly (no reshape)
            y = jax.lax.dot_general(v, w, (((3,), (0,)), ((), ())))
            s = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return v + s.astype(v.dtype)

        tc = timed(conv_body, x4)
        td = timed(dot_body, x4)
        t4 = timed(dot4_body, x4)
        print(f"{k:3d}->{n_out:3d}: conv {tc*1e3:7.4f}  dot2d {td*1e3:7.4f}"
              f"  dot4d {t4*1e3:7.4f} ms", flush=True)

    # reference: pure read-bound elementwise on the same tensor
    x4 = jnp.asarray(rs.randn(B, 64, 64, 256) * 0.1, jnp.bfloat16)

    def ew(i, v):
        return v * jnp.bfloat16(1.0000001)

    print(f"elementwise x*c on (128,64,64,256): {timed(ew, x4)*1e3:7.4f} ms "
          f"(536MB r+w)", flush=True)


if __name__ == "__main__":
    main()
