"""Capture a jax.profiler trace of the flagship FPD step (bench.py workload)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fpd_trace"


def main():
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_fpd_train_step

    scfg = bench._hg_cfg(stacks=4, feats=128)
    scfg.KD.ALPHA = 0.5
    tcfg = bench._hg_cfg(stacks=8, feats=256)
    n = len(jax.devices())
    mesh = get_mesh(n)
    student = get_pose_net(scfg, dtype=jnp.bfloat16)
    teacher = get_pose_net(tcfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, bench.IMAGE, bench.IMAGE, 3))
    state = create_train_state(scfg, student, rng, sample)
    tvars = teacher.init(jax.random.PRNGKey(1), sample, train=False)
    step = make_fpd_train_step(student, teacher, scfg, mesh,
                               multi_output=True, teacher_multi_output=True,
                               teacher_cfg=tcfg)
    rs = np.random.RandomState(0)
    b = bench.BATCH * n
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(b, bench.IMAGE, bench.IMAGE, 3),
                             jnp.float32),
        "target": jnp.asarray(
            rs.rand(b, bench.IMAGE // 4, bench.IMAGE // 4, bench.JOINTS),
            jnp.float32),
        "target_weight": jnp.ones((b, bench.JOINTS), jnp.float32),
    })

    m = None
    for _ in range(3):
        state, m = step(state, tvars, batch)
    float(m["loss"])
    print("warmed", flush=True)

    jax.profiler.start_trace(OUT)
    for _ in range(8):
        state, m = step(state, tvars, batch)
    float(m["loss"])
    jax.profiler.stop_trace()
    print("trace written to", OUT, flush=True)


if __name__ == "__main__":
    main()
