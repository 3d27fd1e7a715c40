"""Probe: isolate WHY the XLA backward of a C=32 HRNet branch chain costs
~10x its forward. Variants (b=64, 64x48x32, 4 BasicBlocks):

  fwd            - train-mode forward (baseline)
  f+b full       - grad wrt params AND input, train-mode BN
  f+b dx only    - grad wrt input only (no conv weight grads)
  f+b dw only    - grad wrt params only
  f+b bn-eval    - grad wrt params, BN in eval mode (running stats)
  f+b conv only  - 8-conv chain, no BN, grad wrt params
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from fhpe_tpu.models.pose_hrnet import BranchChain
from fhpe_tpu.models.common import Conv

B, H, W, C = 64, 64, 48, 32
WARM, N1, N2 = 3, 10, 40


def diff_time(run):
    run(WARM)
    return (run(N2) - run(N1)) / (N2 - N1)


class ConvOnlyChain(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i in range(8):
            x = Conv(C, 3, torch_init=False, dtype=jnp.bfloat16,
                     name=f"c{i}")(x)
            x = nn.relu(x)
        return x


def bench(name, make_fn, params, x0):
    f = jax.jit(make_fn)

    def run(n):
        p = params
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(p, x0)
            p = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, out)
        float(jax.tree_util.tree_leaves(p)[0].astype(jnp.float32).sum())
        return time.perf_counter() - t0

    dt = diff_time(run)
    print(f"{name:16s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)

    chain = BranchChain("BASIC", C, 4, C, dtype=jnp.bfloat16)
    variables = chain.init(jax.random.PRNGKey(0), x0, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def fwd_train(p, xx):
        out, _ = chain.apply({"params": p, "batch_stats": stats}, xx,
                             train=True, mutable=["batch_stats"])
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a) + jnp.mean(out).astype(a.dtype), p)

    def loss_train(p, xx):
        out, _ = chain.apply({"params": p, "batch_stats": stats}, xx,
                             train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    def loss_eval(p, xx):
        out = chain.apply({"params": p, "batch_stats": stats}, xx,
                          train=False)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    bench("fwd", fwd_train, params, x0)
    bench("f+b full", lambda p, xx: jax.grad(loss_train)(p, xx), params, x0)

    def dx_only(p, xx):
        g = jax.grad(loss_train, argnums=1)(p, xx)
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a) + jnp.mean(g).astype(a.dtype), p)

    bench("f+b dx only", dx_only, params, x0)
    bench("f+b bn-eval", lambda p, xx: jax.grad(loss_eval)(p, xx), params, x0)

    conv_chain = ConvOnlyChain()
    cvars = conv_chain.init(jax.random.PRNGKey(0), x0)

    def loss_conv(p, xx):
        return jnp.mean(jnp.square(
            conv_chain.apply({"params": p}, xx).astype(jnp.float32)))

    bench("f+b conv only",
          lambda p, xx: jax.grad(loss_conv)(p, xx), cvars["params"], x0)


if __name__ == "__main__":
    main()
