"""Capture a jax.profiler trace of the W32 train step (f+b) on the TPU."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo/scripts/probe")
from hrnet_attribution import _cfg  # noqa: E402
from fhpe_tpu.models import get_pose_net  # noqa: E402

B = 64
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/w32_trace"


def main():
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

    out = f(3, params, x)
    jax.block_until_ready(out)
    print("warmed", flush=True)

    jax.profiler.start_trace(OUT)
    out = f(10, params, x)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    jax.profiler.stop_trace()
    print("trace written to", OUT, flush=True)


if __name__ == "__main__":
    main()
