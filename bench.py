"""Benchmark: FPD distillation training throughput on real TPU.

Measures steady-state images/sec/chip for the flagship FPD workload
(BASELINE.json config #4): stacked-hourglass teacher (stacks=8, feats=256)
eval-mode forward co-supervising the student (stacks=4, feats=128) training
step (forward + fused pose+KD loss + backward + optimizer), MPII 256x256,
bf16 compute.  Reference hot loop: lib/core/function.py:99-187.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline: the reference publishes no throughput (BASELINE.md).  The
documented ESTIMATE for the reference setup (4x TITAN XP, DataParallel,
batch 4/GPU, cv2+numpy dataloader; the reference FPD loop additionally
backprops through the teacher, function.py:120-122) is ~140 images/sec
total for the plain train loop — FPD is strictly slower there, so using
140 keeps the comparison conservative in the reference's favor.  The
BASELINE.json north star is 2x that at v5e-8 scale; vs_baseline reported
here is value / (2 * 140 / 8).
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_TOTAL_IMGS_PER_SEC = 140.0   # documented estimate, see docstring
NORTH_STAR_PER_CHIP = 2.0 * REFERENCE_TOTAL_IMGS_PER_SEC / 8.0

import os

# Per-chip batch; teacher s8/f256 eval forward + student train step.
# A/B on v5e (differenced): b=64 602 img/s/chip, b=128 724 (+20%) — the
# teacher forward saves no activations, so the workload scales past the
# round-1 "fits b=64" assumption. FHPE_BENCH_BATCH overrides for A/B runs.
BATCH = int(os.environ.get("FHPE_BENCH_BATCH", "128"))
IMAGE = 256
JOINTS = 16
WARMUP = 3
ITERS = 20


def _hg_cfg(stacks, feats):
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
    return cfg


def _wait_for_device(max_wait_s: float) -> None:
    """Gate on device-transport health before benchmarking.

    A dead TPU relay hangs even ``jax.devices()`` in-process (observed
    live: a 7h outage on this box), so the probe runs a tiny matmul in a
    *subprocess* with a hard timeout, and we retry for up to
    ``max_wait_s`` before proceeding anyway (letting the in-process run
    fail loudly rather than silently skipping the bench).
    """
    import subprocess
    import sys

    if max_wait_s <= 0:
        return
    probe = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
             "assert float((x @ x).sum()) > 0")
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            rc = subprocess.run([sys.executable, "-c", probe],
                                timeout=120, capture_output=True).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return
        if time.monotonic() >= deadline:
            print(f"# bench: device probe still failing after "
                  f"{max_wait_s:.0f}s; attempting the run anyway",
                  flush=True)
            return
        print("# bench: device transport unhealthy; retrying in 60s",
              flush=True)
        time.sleep(60)


def main() -> None:
    _wait_for_device(float(os.environ.get("FHPE_BENCH_RELAY_WAIT_S", "1200")))

    import jax
    import jax.numpy as jnp

    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_fpd_train_step

    scfg = _hg_cfg(stacks=4, feats=128)   # student (the trained model)
    scfg.KD.ALPHA = 0.5
    # Exactly-equivalent training config: the pre-activation hourglass's
    # non-head conv biases have analytically zero gradient (each is
    # absorbed by a downstream BatchNorm), so they stay at their zero
    # init forever; dropping them deletes one dy reduce-sum HBM pass per
    # conv from the backward.  Equivalence pinned by tests/test_dead_bias.py;
    # measured +3.0% on v5e (723.06 -> 744.61 img/s/chip,
    # scripts/probe/dead_bias_ab.py, docs/BENCH_NOTES.md round 3).
    scfg.TPU.DEAD_BIAS_SKIP = True
    tcfg = _hg_cfg(stacks=8, feats=256)   # teacher (eval-mode forward)

    n_chips = len(jax.devices())
    mesh = get_mesh(n_chips)
    student = get_pose_net(scfg, dtype=jnp.bfloat16)
    teacher = get_pose_net(tcfg, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMAGE, IMAGE, 3))
    state = create_train_state(scfg, student, rng, sample)
    tvars = teacher.init(jax.random.PRNGKey(1), sample, train=False)
    step = make_fpd_train_step(student, teacher, scfg, mesh,
                               multi_output=True, teacher_multi_output=True,
                               teacher_cfg=tcfg)

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
            st, m = step(st, tvars, batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            st, m = step(st, tvars, batch)
        float(m["loss"])
        return time.perf_counter() - t0

    n1, n2 = ITERS, ITERS * 4
    per_step = (run(n2) - run(n1)) / (n2 - n1)
    imgs_per_sec_per_chip = b / per_step / n_chips
    print(json.dumps({
        "metric": "fpd_hg8f256_to_hg4f128_mpii256_train_images_per_sec_per_chip",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / NORTH_STAR_PER_CHIP, 3),
        # The reference publishes no throughput (BASELINE.md); the divisor
        # is the documented ~140 img/s ESTIMATE (docstring above), x2
        # north-star, /8 chips.  Flagged so vs_baseline is never quoted as
        # a measured-reference comparison.
        "baseline_estimated": True,
        "baseline_estimate_imgs_per_sec_total": REFERENCE_TOTAL_IMGS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
