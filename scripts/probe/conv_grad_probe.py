"""Probe: cost of conv gradients and BN-train, and hand-written alternates.

All timings dispatch-free (in-jit fori_loop, dynamic trip count).
b=64, 64x48, C=32 (the HRNet top branch shape).

  conv fwd                — roofline reference
  conv dx (autodiff)      — XLA's conv data-grad lowering
  conv dw (autodiff)      — XLA's conv kernel-grad lowering
  conv dx (hand)          — conv with spatially-flipped, io-transposed kernel
  conv dw (hand)          — im2col patches^T @ dy dot_general
  bn train fwd            — flax BatchNorm train mode (stats + normalize)
  bn train f+b            — its f+b
  block f+b (autodiff)    — one BasicBlock via flax autodiff
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fhpe_tpu.models.pose_hrnet import BasicBlock

B, H, W, C = 64, 64, 48, 32
N1, N2 = 20, 100


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)


def timed(body, init):
    @jax.jit
    def f(n, v):
        return lax.fori_loop(0, n, body, v)

    f(N1, init)

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jnp.sum(jax.tree_util.tree_leaves(f(n, init))[0]
                    .astype(jnp.float32)).item()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(N2) - t(N1)) / (N2 - N1)


def report(name, dt, flops):
    print(f"{name:26s} {dt*1e3:8.4f} ms  {flops/dt/1e12:6.1f} TF/s",
          flush=True)


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rs.randn(3, 3, C, C) * 0.1, jnp.bfloat16)
    dy = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
    cf = 2 * B * H * W * 9 * C * C

    report("conv fwd", timed(lambda i, v: conv(v, w), x), cf)

    # autodiff dx
    def dx_auto(i, v):
        _, vjp = jax.vjp(lambda xx: conv(xx, w), v)
        return vjp(dy)[0]

    report("conv dx (autodiff)", timed(dx_auto, x), cf)

    # autodiff dw
    def dw_auto(i, v):
        _, vjp = jax.vjp(lambda ww: conv(x, ww), v)
        return vjp(dy)[0]

    report("conv dw (autodiff)", timed(dw_auto, w), cf)

    # hand dx: full correlation with flipped kernel, transposed channels
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)

    def dx_hand(i, v):
        return conv(v, w_flip)

    report("conv dx (hand)", timed(dx_hand, dy), cf)

    # hand dw: padded x patches^T @ dy, 9 taps as one dot_general over M
    def dw_hand(i, v):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [xp[:, r:r + H, c:c + W, :].reshape(B * H * W, C)
                for r in range(3) for c in range(3)]
        patches = jnp.concatenate(taps, axis=-1)          # (M, 9C)
        dyf = (dy + 0 * v[0, 0, 0, 0]).reshape(B * H * W, C)
        g = lax.dot_general(patches, dyf, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return g.reshape(3, 3, C, C).astype(jnp.bfloat16)

    report("conv dw (hand im2col)", timed(dw_hand, w), cf)

    # BN train fwd / f+b
    from flax import linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.float32, param_dtype=jnp.float32)
    bvars = bn.init(jax.random.PRNGKey(0), x.astype(jnp.float32))
    bparams, bstats = bvars["params"], bvars["batch_stats"]
    bn_bytes = B * H * W * C * 4 * 4  # rough passes estimate ignored

    def bn_fwd(i, v):
        out, _ = bn.apply({"params": bparams, "batch_stats": bstats},
                          v.astype(jnp.float32), mutable=["batch_stats"])
        return out.astype(jnp.bfloat16)

    dt = timed(bn_fwd, x)
    print(f"{'bn train fwd':26s} {dt*1e3:8.4f} ms", flush=True)

    def bn_fb(i, p):
        def loss(pp):
            out, _ = bn.apply({"params": pp, "batch_stats": bstats},
                              x.astype(jnp.float32), mutable=["batch_stats"])
            return jnp.mean(jnp.square(out))
        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)

    dt = timed(bn_fb, bparams)
    print(f"{'bn train f+b':26s} {dt*1e3:8.4f} ms", flush=True)

    # one BasicBlock f+b
    blk = BasicBlock(C, dtype=jnp.bfloat16)
    bv = blk.init(jax.random.PRNGKey(0), x, train=True)

    def blk_fb(i, p):
        def loss(pp):
            out, _ = blk.apply({"params": pp,
                                "batch_stats": bv["batch_stats"]},
                               x, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(out.astype(jnp.float32)))
        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)

    dt = timed(blk_fb, bv["params"])
    report("block f+b (autodiff)", dt, cf * 2 * 3)


if __name__ == "__main__":
    main()
