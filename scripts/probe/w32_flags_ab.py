"""A/B XLA flag settings on the full W32 f+b step (b=128, in-jit loop).

Usage: XLA_FLAGS="..." python w32_flags_ab.py [tag]
Prints one line: tag, ms/step, img/s.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo/scripts/probe")
from hrnet_attribution import _cfg  # noqa: E402
from fhpe_tpu.models import get_pose_net  # noqa: E402

B = 128
N1, N2 = 10, 40


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    cfg = _cfg(1, 4, 3)
    model = get_pose_net(cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(B, 256, 192, 3),
                    jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p, xx):
        out, _ = model.apply({"params": p, "batch_stats": stats}, xx,
                             train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    @jax.jit
    def f(n, p, xx):
        def body(i, p):
            g = jax.grad(loss_fn)(p, xx)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)
        return lax.fori_loop(0, n, body, p)

    jnp.sum(jax.tree_util.tree_leaves(f(N1, params, x))[0]
            .astype(jnp.float32)).item()

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(n, params, x)
            jnp.sum(jax.tree_util.tree_leaves(r)[0]
                    .astype(jnp.float32)).item()
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(N2) - t(N1)) / (N2 - N1)
    print(f"{tag:40s} {dt*1e3:8.2f} ms/step  {B/dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
