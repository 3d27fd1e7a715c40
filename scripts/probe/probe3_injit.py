"""Probe v3: dispatch-free timing — the iteration loop runs INSIDE one jit
via lax.fori_loop, so relay dispatch cost is paid once per measurement and
cancels in the difference.  Times XLA conv / chain fwd / chain f+b and the
Pallas conv candidates on identical footing.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo/scripts/probe")
import pallas_conv_probe2 as p2  # noqa: E402
from fhpe_tpu.models.pose_hrnet import BranchChain  # noqa: E402

B, H, W, C = p2.B, p2.H, p2.W, p2.C
N1, N2 = 20, 100


def timed(make_loop, *args):
    """make_loop(n) -> jitted fn running n dependent iterations."""
    f1, f2 = make_loop(N1), make_loop(N2)
    f1(*args), f2(*args)  # compile+warm

    def t(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jnp.sum(jax.tree_util.tree_leaves(f(*args))[0]
                    .astype(jnp.float32)).item()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f2) - t(f1)) / (N2 - N1)


def report(name, dt, flops):
    print(f"{name:24s} {dt*1e3:8.4f} ms  {flops/dt/1e12:6.1f} TF/s",
          flush=True)


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rs.randn(3, 3, C, C) * 0.1, jnp.bfloat16)
    conv_flops = 2 * B * H * W * 9 * C * C

    # XLA conv
    def mk_conv(n):
        @jax.jit
        def f(xx):
            return lax.fori_loop(
                0, n, lambda i, v: p2.conv_ref(v, w).astype(jnp.bfloat16), xx)
        return f

    report("XLA conv", timed(mk_conv, x), conv_flops)

    # Pallas conv A2 / C
    for name, fn in [("Pallas conv A2", p2.conv_a2), ("Pallas conv C",
                                                      p2.conv_c)]:
        def mk(n, fn=fn):
            @jax.jit
            def f(xx):
                return lax.fori_loop(0, n, lambda i, v: fn(v, w), xx)
            return f

        try:
            report(name, timed(mk, x), conv_flops)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)

    # XLA chain fwd / f+b
    chain = BranchChain("BASIC", C, 4, C, dtype=jnp.bfloat16)
    variables = chain.init(jax.random.PRNGKey(0), x, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    chain_flops = conv_flops * 8

    def mk_fwd(n):
        @jax.jit
        def f(xx):
            def body(i, v):
                out, _ = chain.apply({"params": params, "batch_stats": stats},
                                     v, train=True, mutable=["batch_stats"])
                return out
            return lax.fori_loop(0, n, body, xx)
        return f

    report("XLA chain fwd", timed(mk_fwd, x), chain_flops)

    def loss_fn(p, xx):
        out, _ = chain.apply({"params": p, "batch_stats": stats}, xx,
                             train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    def mk_fb(n):
        @jax.jit
        def f(p, xx):
            def body(i, p):
                g = jax.grad(loss_fn)(p, xx)
                return jax.tree_util.tree_map(
                    lambda a, b: a - 1e-12 * b, p, g)
            return lax.fori_loop(0, n, body, p)
        return f

    report("XLA chain f+b", timed(mk_fb, params, x), chain_flops * 3)

    # eval-mode chain fwd (BN folded) for the eval-kernel comparison
    def mk_eval(n):
        @jax.jit
        def f(xx):
            def body(i, v):
                return chain.apply({"params": params, "batch_stats": stats},
                                   v, train=False)
            return lax.fori_loop(0, n, body, xx)
        return f

    report("XLA chain fwd(eval)", timed(mk_eval, x), chain_flops)


if __name__ == "__main__":
    main()
