"""Differenced throughput of the COCO flagship FPD pair (BASELINE #5):
HRNet-W48 teacher eval forward + HRNet-W32 student train step, 256x192.

Usage: python scripts/probe/fpd_w48_w32.py [batch]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMG_H, IMG_W = 256, 192
J = 17
WARMUP, N1, N2 = 3, 10, 40


def _cfg(width):
    from fhpe_tpu.config import load_config

    cfg = load_config(
        f"/root/repo/experiments/coco/hrnet/"
        f"w{width}_256x192_adam_lr1e-3.yaml",
        opts=["KD.ALPHA", "0.5"])
    return cfg


def main():
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_fpd_train_step

    scfg, tcfg = _cfg(32), _cfg(48)
    n = len(jax.devices())
    mesh = get_mesh(n)
    student = get_pose_net(scfg, dtype=jnp.bfloat16)
    teacher = get_pose_net(tcfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, IMG_H, IMG_W, 3))
    state = create_train_state(scfg, student, jax.random.PRNGKey(0), sample)
    tvars = teacher.init(jax.random.PRNGKey(1), sample, train=False)
    step = make_fpd_train_step(student, teacher, scfg, mesh,
                               multi_output=False, teacher_multi_output=False,
                               teacher_cfg=tcfg)

    rs = np.random.RandomState(0)
    b = B * n
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(b, IMG_H, IMG_W, 3), jnp.float32),
        "target": jnp.asarray(rs.rand(b, IMG_H // 4, IMG_W // 4, J),
                              jnp.float32),
        "target_weight": jnp.ones((b, J), jnp.float32),
    })

    def run(nsteps):
        st = jax.tree_util.tree_map(jnp.array, state)
        m = None
        for _ in range(WARMUP):
            st, m = step(st, tvars, batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(nsteps):
            st, m = step(st, tvars, batch)
        float(m["loss"])
        return time.perf_counter() - t0

    per_step = (run(N2) - run(N1)) / (N2 - N1)
    print(f"FPD W48->W32 b={B}: {per_step*1e3:.1f} ms/step, "
          f"{b/per_step/n:.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
