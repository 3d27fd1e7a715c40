"""Benchmark: training throughput of the flagship FPD config on real TPU.

Measures steady-state images/sec/chip for the stacked-hourglass student
(stacks=4, features=128) MPII 256x256 **training step** (forward + backward
+ optimizer, bf16 compute), the workload of BASELINE.json config #1/#4.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline: the reference publishes no throughput (BASELINE.md).  The
documented estimate for the reference setup (4x TITAN XP, DataParallel,
batch 4/GPU, cv2+numpy dataloader) is ~140 images/sec total — derived from
TITAN XP fp32 utilization on hourglass-s4 (~6.2 GFLOPs fwd @256px) with the
small per-GPU batch and per-step host sync the reference incurs.  The
BASELINE.json north star is 2x that at v5e-8 scale; vs_baseline reported
here is per-chip throughput / (north-star per-chip share), i.e.
value / (2 * 140 / 8).
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_TOTAL_IMGS_PER_SEC = 140.0   # documented estimate, see docstring
NORTH_STAR_PER_CHIP = 2.0 * REFERENCE_TOTAL_IMGS_PER_SEC / 8.0

BATCH = 128  # per-chip; b=32 is latency-bound on v5e (b=128 ~2x img/s/chip)
IMAGE = 256
STACKS = 4
FEATS = 128
JOINTS = 16
WARMUP = 3
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.config.defaults import MODEL_EXTRAS
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_train_step

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = JOINTS
    cfg.MODEL.IMAGE_SIZE = [IMAGE, IMAGE]
    cfg.MODEL.HEATMAP_SIZE = [IMAGE // 4, IMAGE // 4]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = STACKS
    cfg.MODEL.EXTRA.NUM_FEATURES = FEATS
    cfg.TRAIN.LR = 2.5e-4

    n_chips = len(jax.devices())
    mesh = get_mesh(n_chips)
    model = get_pose_net(cfg, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, model, rng, jnp.zeros((1, IMAGE, IMAGE, 3)))
    step = make_train_step(model, cfg, mesh, multi_output=True)

    rs = np.random.RandomState(0)
    b = BATCH * n_chips
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(b, IMAGE, IMAGE, 3), jnp.float32),
        "target": jnp.asarray(
            rs.rand(b, IMAGE // 4, IMAGE // 4, JOINTS), jnp.float32),
        "target_weight": jnp.ones((b, JOINTS), jnp.float32),
    })

    # Differenced timing with a real value fetch: time N1 and N2 chained
    # steps each ended by materializing the final loss (which forces the
    # whole dependent chain to complete), then difference to cancel the
    # constant fetch/relay overhead.  block_until_ready alone is not
    # reliable on remote-attached backends (13x scatter observed);
    # differencing reproduces within <1% across trials.
    def run(n):
        st = jax.tree_util.tree_map(jnp.array, state)
        m = None
        for _ in range(WARMUP):
            st, m = step(st, batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            st, m = step(st, batch)
        float(m["loss"])
        return time.perf_counter() - t0

    n1, n2 = ITERS, ITERS * 4
    per_step = (run(n2) - run(n1)) / (n2 - n1)
    imgs_per_sec_per_chip = b / per_step / n_chips
    print(json.dumps({
        "metric": "hourglass_s4_f128_mpii256_train_images_per_sec_per_chip",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / NORTH_STAR_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
