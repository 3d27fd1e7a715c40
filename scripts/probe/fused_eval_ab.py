"""Model-level A/B of TPU.FUSED_EVAL on the real chip (round-4 verdict #4).

W32 COCO 256x192 flip-test eval step (the knob's only production entry
point, models/pose_hrnet.py HighResolutionModule._branch), FUSED_EVAL off
vs on, differenced chained timing.  Decides whether the Pallas fused
branch chains ship as a default, stay a knob, or get demoted to probe
infrastructure (kernel-level round-2 measurement said 14x SLOWER than
XLA's fused forward; this is the end-to-end confirmation).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe/fused_eval_ab.py [batch]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMG_H, IMG_W = 256, 192
J = 17
WARMUP, N1, N2 = 3, 10, 40


def bench(fused: bool) -> float:
    from fhpe_tpu.config import load_config
    from fhpe_tpu.data import dataset_meta
    from fhpe_tpu.geometry.flip import flip_pair_permutation
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.step import make_eval_step

    cfg = load_config(
        "/root/repo/experiments/coco/hrnet/w32_256x192_adam_lr1e-3.yaml")
    cfg.defrost()
    cfg.TPU.FUSED_EVAL = fused
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.SHIFT_HEATMAP = True
    cfg.TEST.POST_PROCESS = True
    cfg.freeze()

    n = len(jax.devices())
    mesh = get_mesh(n)
    model = get_pose_net(cfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, IMG_H, IMG_W, 3))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    meta = dataset_meta("coco")
    perm = flip_pair_permutation(meta["num_joints"], meta["flip_pairs"])
    step = make_eval_step(model, cfg, mesh, multi_output=False,
                          flip_perm=perm)

    rs = np.random.RandomState(0)
    b = B * n
    inv = np.tile(np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32),
                  (b, 1, 1))
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(b, IMG_H, IMG_W, 3), jnp.float32),
        "target": jnp.asarray(rs.rand(b, IMG_H // 4, IMG_W // 4, J),
                              jnp.float32),
        "target_weight": jnp.ones((b, J), jnp.float32),
        "inv_trans": jnp.asarray(inv),
    })

    def run(nsteps):
        bb = dict(batch)
        out = None
        for _ in range(WARMUP):
            out = step(variables, bb)
        eps = out["loss"] * 0.0
        t0 = time.perf_counter()
        for _ in range(nsteps):
            bb["image"] = batch["image"] + eps
            out = step(variables, bb)
            eps = out["loss"] * 0.0
        float(out["loss"])
        return time.perf_counter() - t0

    per_step = (run(N2) - run(N1)) / (N2 - N1)
    print(f"FUSED_EVAL={int(fused)} b={B}: {per_step*1e3:.1f} ms/step, "
          f"{b/per_step/n:.1f} img/s/chip", flush=True)
    return per_step


def main():
    off = bench(False)
    on = bench(True)
    print(f"fused/off ratio: {on/off:.3f} "
          f"({'fused LOSES' if on > off else 'fused WINS'})", flush=True)


if __name__ == "__main__":
    main()
