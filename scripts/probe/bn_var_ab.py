"""A/B the BN batch-variance algorithm cost on the real chip.

Round 4 switched BN to torch's two-pass variance (mean of squared
deviations) for trajectory parity — one extra elementwise pass over the
activations per BN vs flax's one-pass E[x^2]-E[x]^2.  This probe times
the flagship hourglass FPD train step both ways (monkeypatching
models.common._batch_var) to quantify the cost on the BN-heavy hourglass.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe/bn_var_ab.py [batch]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMG, J = 256, 16
WARMUP, N1, N2 = 3, 10, 40


def bench(two_pass: bool) -> float:
    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.config.defaults import MODEL_EXTRAS
    from fhpe_tpu.models import common, get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_fpd_train_step

    if two_pass:
        common._batch_var = (
            lambda x32, mean, red, input_dtype=None:
            jnp.mean(jnp.square(x32 - mean), red))
    else:
        common._batch_var = (
            lambda x32, mean, red, input_dtype=None: jnp.maximum(
                jnp.mean(jnp.square(x32), red) - jnp.square(mean), 0.0))

    def cfg_for(stacks, feats):
        cfg = get_default_config()
        cfg.MODEL.NAME = "hourglass"
        cfg.MODEL.NUM_JOINTS = J
        cfg.MODEL.IMAGE_SIZE = [IMG, IMG]
        cfg.MODEL.HEATMAP_SIZE = [IMG // 4, IMG // 4]
        cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
        cfg.MODEL.EXTRA.NUM_STACKS = stacks
        cfg.MODEL.EXTRA.NUM_FEATURES = feats
        return cfg

    scfg = cfg_for(4, 128)
    scfg.KD.ALPHA = 0.5
    scfg.TPU.DEAD_BIAS_SKIP = True
    tcfg = cfg_for(8, 256)
    n = len(jax.devices())
    mesh = get_mesh(n)
    student = get_pose_net(scfg, dtype=jnp.bfloat16)
    teacher = get_pose_net(tcfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, IMG, IMG, 3))
    state = create_train_state(scfg, student, jax.random.PRNGKey(0), sample)
    tvars = teacher.init(jax.random.PRNGKey(1), sample, train=False)
    step = make_fpd_train_step(student, teacher, scfg, mesh,
                               multi_output=True, teacher_multi_output=True,
                               teacher_cfg=tcfg)
    rs = np.random.RandomState(0)
    b = B * n
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(b, IMG, IMG, 3), jnp.float32),
        "target": jnp.asarray(rs.rand(b, IMG // 4, IMG // 4, J), jnp.float32),
        "target_weight": jnp.ones((b, J), jnp.float32),
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

    per_step = (run(N2) - run(N1)) / (N2 - N1)
    print(f"two_pass={int(two_pass)} b={B}: {per_step*1e3:.1f} ms/step, "
          f"{b/per_step/len(jax.devices()):.1f} img/s/chip", flush=True)
    return per_step


def main():
    two = bench(True)
    one = bench(False)
    print(f"two-pass/one-pass ratio: {two/one:.3f} "
          f"({(two/one-1)*100:+.1f}% step time)", flush=True)


if __name__ == "__main__":
    main()
