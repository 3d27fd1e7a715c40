"""Attribute the FPD CLI end-to-end speed gap (round-4 verdict #3).

Round-3 queue #9 measured the KD CLI at ~60 samples/s (b=64, synthetic,
PRINT_FREQ 4) vs the ~150-210 samples/s relay-H2D ceiling plain training
reaches and the ~600 img/s step capacity.  This probe decomposes the
exact CLI pipeline into its terms on the real chip:

  loader    host-only synthetic loader rate (uint8 crops + joints)
  h2d       loader + prefetch_to_device (relay H2D), no compute
  step      FPD step capacity on a cached device batch (differenced)
  loop_pN   the actual CLI inner loop (prefetch + step + WindowedMeters
            push/drain) at PRINT_FREQ=N — the drain's scalar fetches are
            the suspected stall

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe/fpd_cli_attrib.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("FHPE_ATTRIB_BATCH", "64"))
N_SAMPLES = 512


def build():
    from fhpe_tpu.cli.common import build_loaders, train_batch_keys
    from fhpe_tpu.config import load_config
    from fhpe_tpu.data import dataset_meta
    from fhpe_tpu.models import get_pose_net, is_multi_output
    from fhpe_tpu.parallel.mesh import get_mesh
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import (make_batch_preprocessor,
                                     make_fpd_train_step)

    cfg = load_config(
        "/root/repo/experiments/fpd_mpii/hourglass/"
        "hg4_128_fpd_student.yaml",
        opts=["DATASET.DATASET", "synthetic", "KD.ALPHA", "0.5",
              "TRAIN.BATCH_SIZE_PER_GPU", str(BATCH), "WORKERS", "4"])
    tcfg = cfg.clone()
    tcfg.defrost()
    tcfg.merge_from_file(
        "/root/repo/experiments/mpii/hourglass/hg8_256x256_teacher.yaml")
    tcfg.freeze()

    n = len(jax.devices())
    mesh = get_mesh(n)
    student = get_pose_net(cfg, dtype=jnp.bfloat16)
    teacher = get_pose_net(tcfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, 256, 256, 3))
    state = create_train_state(cfg, student, jax.random.PRNGKey(0), sample)
    from fhpe_tpu.parallel.mesh import replicated
    tvars = jax.device_put(
        teacher.init(jax.random.PRNGKey(1), sample, train=False),
        replicated(mesh))
    meta = dataset_meta("mpii")
    prepare = (make_batch_preprocessor(cfg, meta["joints_weight"])
               if cfg.TPU.DEVICE_PREPROCESS else None)
    step_fn = make_fpd_train_step(student, teacher, cfg, mesh,
                                  is_multi_output(student),
                                  is_multi_output(teacher),
                                  prepare=prepare, teacher_cfg=tcfg)
    import tempfile
    synth = tempfile.mkdtemp(prefix="fpd_attrib_")
    train_loader, _, _ = build_loaders(cfg, n, synthetic_dir=synth)
    return cfg, mesh, state, tvars, step_fn, train_loader, train_batch_keys(cfg)


def rate(n_images, seconds):
    return n_images / max(seconds, 1e-9)


def main():
    from fhpe_tpu.parallel.mesh import prefetch_to_device
    from fhpe_tpu.utils.logger import WindowedMeters

    cfg, mesh, state, tvars, step_fn, loader, keys = build()
    print(f"# batch={BATCH} DEVICE_PREPROCESS={cfg.TPU.DEVICE_PREPROCESS}",
          flush=True)

    # loader (host only) — epoch 1 fills the decode cache, epoch 2 measures
    for ep in range(2):
        t0 = time.perf_counter()
        n = 0
        for batch in iter(loader):
            n += batch["joints"].shape[0]
        t = time.perf_counter() - t0
        print(f"loader epoch{ep}: {rate(n, t):.1f} samples/s", flush=True)

    # h2d: loader + device transfer, no compute (touch one element).
    # Hold every device batch alive until the end: dropping a still-in-
    # flight buffer deletes it through the relay mid-transfer, which
    # measured as low as 0.3 samples/s (first two runs of this probe) —
    # an artifact no real consumer hits (compute always drains the batch
    # before it is dropped).
    t0 = time.perf_counter()
    n = 0
    held = []
    for dev, batch in prefetch_to_device(iter(loader), mesh, keys=keys):
        n += batch["joints"].shape[0]
        held.append(dev)
    t_iter = time.perf_counter() - t0
    # completion split: tiny-leaf fetch first (forces transfer completion
    # with a small D2H), then the full 12.6 MB image D2H separately —
    # through this relay a first big D2H has measured in the minutes.
    t1 = time.perf_counter()
    float(np.asarray(held[-1]["joints"]).ravel()[0])
    t_small = time.perf_counter() - t1
    t1 = time.perf_counter()
    _ = np.asarray(held[-1]["image"])
    t_big = time.perf_counter() - t1
    t = time.perf_counter() - t0
    print(f"h2d: {rate(n, t):.1f} samples/s (iter {t_iter*1e3:.0f} ms, "
          f"small-leaf completion {t_small*1e3:.0f} ms, "
          f"12.6MB image D2H {t_big*1e3:.0f} ms)", flush=True)
    held.clear()

    # step capacity: differenced chained steps on one cached device batch
    dev_batch = None
    for dev, _ in prefetch_to_device(iter(loader), mesh, keys=keys):
        dev_batch = dev
        break

    def chain(k):
        st = jax.tree_util.tree_map(jnp.array, state)
        m = None
        for _ in range(3):
            st, m = step_fn(st, tvars, dev_batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(k):
            st, m = step_fn(st, tvars, dev_batch)
        float(m["loss"])
        return time.perf_counter() - t0

    n1, n2 = 10, 40
    per_step = (chain(n2) - chain(n1)) / (n2 - n1)
    print(f"step: {per_step*1e3:.1f} ms -> "
          f"{rate(BATCH, per_step):.1f} samples/s", flush=True)

    # discriminating legs: is the loop transfer/compute-SERIALIZED?
    # loop_nometers: prefetch + step only (no meter pushes/drains).
    # loop_depth4:   prefetch size=4 — if relay H2D overlaps compute,
    #                extra depth closes the gap; if the relay serializes
    #                transfers with compute on one stream, it cannot.
    for label, depth in (("loop_nometers", 2), ("loop_depth4", 4)):
        st = jax.tree_util.tree_map(jnp.array, state)
        t0 = time.perf_counter()
        n = 0
        m = None
        for dev, batch in prefetch_to_device(iter(loader), mesh,
                                             size=depth, keys=keys):
            st, m = step_fn(st, tvars, dev)
            n += batch["joints"].shape[0]
        float(m["loss"])
        print(f"{label}: {rate(n, time.perf_counter() - t0):.1f} samples/s",
              flush=True)

    # the actual CLI loop at two PRINT_FREQs
    for pf in (4, 100):
        st = jax.tree_util.tree_map(jnp.array, state)
        meters = WindowedMeters(value_keys=("loss", "pose_loss", "kd_loss"))
        t0 = time.perf_counter()
        n = 0
        for i, (dev, batch) in enumerate(
                prefetch_to_device(iter(loader), mesh, keys=keys)):
            st, metrics = step_fn(st, tvars, dev)
            meters.push(metrics, batch["joints"].shape[0])
            n += batch["joints"].shape[0]
            if i % pf == 0:
                meters.drain()
        meters.drain()
        print(f"loop_p{pf}: {rate(n, time.perf_counter() - t0):.1f} "
              f"samples/s", flush=True)

    # drain cost in isolation: fetch cost of one completed scalar set
    st = jax.tree_util.tree_map(jnp.array, state)
    st, metrics = step_fn(st, tvars, dev_batch)
    float(metrics["loss"])  # ensure completed
    t0 = time.perf_counter()
    for k in ("loss", "pose_loss", "kd_loss", "acc", "acc_cnt"):
        float(np.asarray(metrics[k]))
    print(f"scalar fetch x5 (completed): "
          f"{(time.perf_counter() - t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
