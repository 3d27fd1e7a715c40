"""Attribute W32 train-step time by component (dispatch-free in-jit loops).

Variants (b=64, COCO 256x192):
  - full W32 fwd(train) / fwd(eval) / f+b / f+b+sgd
  - NUM_MODULES ablations: (1,1,1), (1,4,1), (1,1,3) vs full (1,4,3)
    -> per-module stage3/stage4 cost deltas, fwd and f+b
  - one stage4-shaped HRM module isolated: fwd / f+b; its 4 chains
    isolated sum (from probe3-style chain timing) tells the fuse cost
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net
from fhpe_tpu.models.pose_hrnet import HighResolutionModule

B = 64
IMG_H, IMG_W = 256, 192
N1, N2 = 10, 40


def _cfg(m2=1, m3=4, m4=3):
    cfg = get_default_config()
    cfg.MODEL.NAME = "pose_hrnet"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [IMG_W, IMG_H]
    cfg.MODEL.HEATMAP_SIZE = [IMG_W // 4, IMG_H // 4]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["pose_hrnet"]()
    cfg.MODEL.EXTRA.STAGE2.NUM_MODULES = m2
    cfg.MODEL.EXTRA.STAGE3.NUM_MODULES = m3
    cfg.MODEL.EXTRA.STAGE4.NUM_MODULES = m4
    return cfg


def timed(make_loop, *args):
    f = make_loop(None)  # n passed dynamically: ONE compile per variant
    f(N1, *args)

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jnp.sum(jax.tree_util.tree_leaves(f(n, *args))[0]
                    .astype(jnp.float32)).item()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(N2) - t(N1)) / (N2 - N1)


def bench_model(tag, cfg, mode):
    model = get_pose_net(cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(B, IMG_H, IMG_W, 3),
                    jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    if mode in ("fwd", "fwd_eval"):
        train = mode == "fwd"

        def mk(_):
            @jax.jit
            def f(n, xx):
                def body(i, v):
                    if train:
                        out, _ = model.apply(
                            {"params": params, "batch_stats": stats}, v,
                            train=True, mutable=["batch_stats"])
                    else:
                        out = model.apply(
                            {"params": params, "batch_stats": stats}, v,
                            train=False)
                    # heatmap (B,64,48,17) -> project back to input shape dep
                    s = jnp.sum(out.astype(jnp.float32)) * 1e-12
                    return v + s.astype(v.dtype)
                return lax.fori_loop(0, n, body, xx)
            return f

        dt = timed(mk, x)
    else:  # f+b
        def loss_fn(p, xx):
            out, _ = model.apply({"params": p, "batch_stats": stats}, xx,
                                 train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        def mk(_):
            @jax.jit
            def f(n, p, xx):
                def body(i, p):
                    g = jax.grad(loss_fn)(p, xx)
                    return jax.tree_util.tree_map(
                        lambda a, b: a - 1e-12 * b, p, g)
                return lax.fori_loop(0, n, body, p)
            return f

        dt = timed(mk, params, x)
    print(f"{tag:28s} {mode:8s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def bench_hrm(mode):
    """One stage4-shaped HRM (4 branches, W32 widths) isolated."""
    chans = (32, 64, 128, 256)
    shapes = [(B, 64, 48, 32), (B, 32, 24, 64), (B, 16, 12, 128),
              (B, 8, 6, 256)]
    mod = HighResolutionModule("BASIC", (4, 4, 4, 4), chans, chans,
                               multi_scale_output=True, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    xs = [jnp.asarray(rs.randn(*s), jnp.bfloat16) for s in shapes]
    variables = mod.init(jax.random.PRNGKey(0), xs, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    if mode == "fwd":
        def mk(_):
            @jax.jit
            def f(n, x0):
                def body(i, v):
                    out, _ = mod.apply(
                        {"params": params, "batch_stats": stats},
                        [v] + xs[1:], train=True, mutable=["batch_stats"])
                    return out[0]
                return lax.fori_loop(0, n, body, x0)
            return f

        dt = timed(mk, xs[0])
    else:
        def loss_fn(p, x0):
            out, _ = mod.apply({"params": p, "batch_stats": stats},
                               [x0] + xs[1:], train=True,
                               mutable=["batch_stats"])
            return sum(jnp.mean(jnp.square(o.astype(jnp.float32)))
                       for o in out)

        def mk(_):
            @jax.jit
            def f(n, p, x0):
                def body(i, p):
                    g = jax.grad(loss_fn)(p, x0)
                    return jax.tree_util.tree_map(
                        lambda a, b: a - 1e-12 * b, p, g)
                return lax.fori_loop(0, n, body, p)
            return f

        dt = timed(mk, params, xs[0])
    print(f"{'HRM stage4 isolated':28s} {mode:8s} {dt*1e3:9.3f} ms",
          flush=True)
    return dt


def main():
    full = _cfg(1, 4, 3)
    bench_model("W32 full (1,4,3)", full, "fwd")
    bench_model("W32 full (1,4,3)", full, "fwd_eval")
    bench_model("W32 full (1,4,3)", full, "fb")
    for tag, cfg in [("W32 (1,1,3)", _cfg(1, 1, 3)),
                     ("W32 (1,4,1)", _cfg(1, 4, 1)),
                     ("W32 (1,1,1)", _cfg(1, 1, 1))]:
        bench_model(tag, cfg, "fwd")
        bench_model(tag, cfg, "fb")
    bench_hrm("fwd")
    bench_hrm("fb")


if __name__ == "__main__":
    main()
