"""A/B: TPU.DEAD_BIAS_SKIP on the flagship FPD step (VERDICT r2 task #5).

Measures the differenced steady-state step time of the FPD distillation
step (hourglass s8/f256 teacher eval-forward + s4/f128 student train
step, 256px, bf16, b=128) with the student's dead conv biases present
vs dropped.  Method identical to bench.py (chained runs ended by a real
value fetch, two trip counts differenced).

Run on the real chip:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/probe/dead_bias_ab.py
"""

from __future__ import annotations

import time

import numpy as np

BATCH = 128
IMAGE = 256
JOINTS = 16
WARMUP = 3
ITERS = 20


def _hg_cfg(stacks, feats, dead_bias=False):
    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.config.defaults import MODEL_EXTRAS

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = JOINTS
    cfg.MODEL.IMAGE_SIZE = [IMAGE, IMAGE]
    cfg.MODEL.HEATMAP_SIZE = [IMAGE // 4, IMAGE // 4]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = stacks
    cfg.MODEL.EXTRA.NUM_FEATURES = feats
    cfg.TRAIN.LR = 2.5e-4
    cfg.TPU.DEAD_BIAS_SKIP = dead_bias
    return cfg


def measure(dead_bias: bool) -> float:
    import jax
    import jax.numpy as jnp

    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_fpd_train_step

    scfg = _hg_cfg(4, 128, dead_bias)
    scfg.KD.ALPHA = 0.5
    tcfg = _hg_cfg(8, 256)  # teacher forward has no bias-grad cost

    n = len(jax.devices())
    mesh = get_mesh(n)
    student = get_pose_net(scfg, dtype=jnp.bfloat16)
    teacher = get_pose_net(tcfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, IMAGE, IMAGE, 3))
    state = create_train_state(scfg, student, jax.random.PRNGKey(0), sample)
    tvars = teacher.init(jax.random.PRNGKey(1), sample, train=False)
    step = make_fpd_train_step(student, teacher, scfg, mesh,
                               multi_output=True, teacher_multi_output=True,
                               teacher_cfg=tcfg)
    rs = np.random.RandomState(0)
    b = BATCH * n
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(b, IMAGE, IMAGE, 3), jnp.float32),
        "target": jnp.asarray(rs.rand(b, IMAGE // 4, IMAGE // 4, JOINTS),
                              jnp.float32),
        "target_weight": jnp.ones((b, JOINTS), jnp.float32),
    })

    def run(k):
        st = jax.tree_util.tree_map(jnp.array, state)
        m = None
        for _ in range(WARMUP):
            st, m = step(st, tvars, batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(k):
            st, m = step(st, tvars, batch)
        float(m["loss"])
        return time.perf_counter() - t0

    n1, n2 = ITERS, ITERS * 4
    per_step = (run(n2) - run(n1)) / (n2 - n1)
    return b / per_step / n


def main():
    base = measure(False)
    skip = measure(True)
    print(f"baseline (biased)      : {base:8.2f} img/s/chip")
    print(f"DEAD_BIAS_SKIP         : {skip:8.2f} img/s/chip "
          f"({(skip / base - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
