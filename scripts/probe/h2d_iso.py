"""Isolate the pathological loader+prefetch H2D rate (attrib h2d leg).

Observed: the exact CLI batch streams at 201 samples/s through
prefetch-style back-to-back device_puts (h2d_bw.py), but the attrib
probe's loader+prefetch-no-compute leg crawls at 0.3-1.3 samples/s even
when every device buffer is held alive.  This probe bisects:

  A  8 pre-materialized distinct host batches (no loader) -> shard_batch
     back-to-back, per-call + completion timing.
  B  the same 8 batches through prefetch_to_device (the generator
     machinery, no loader).
  C  the REAL synthetic loader through prefetch_to_device, with next()
     and shard_batch individually timed inside an instrumented wrapper.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe/h2d_iso.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

BATCH = 64


def touch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def make_host_batches(n, keys):
    rs = np.random.RandomState(0)
    out = []
    for i in range(n):
        b = {
            "image": rs.randint(0, 255, (BATCH, 256, 256, 3), dtype=np.uint8),
            "joints": rs.rand(BATCH, 16, 2).astype(np.float32),
            "joints_vis": np.ones((BATCH, 16, 1), np.float32),
        }
        out.append({k: b[k] for k in keys if k in b})
    return out


def main():
    from fhpe_tpu.cli.common import build_loaders, train_batch_keys
    from fhpe_tpu.config import load_config
    from fhpe_tpu.parallel.mesh import (get_mesh, prefetch_to_device,
                                        shard_batch)

    cfg = load_config(
        "/root/repo/experiments/fpd_mpii/hourglass/hg4_128_fpd_student.yaml",
        opts=["DATASET.DATASET", "synthetic", "TRAIN.BATCH_SIZE_PER_GPU",
              str(BATCH), "WORKERS", "4"])
    keys = train_batch_keys(cfg)
    print(f"# keys={keys}", flush=True)
    n = len(jax.devices())
    mesh = get_mesh(n)
    touch(shard_batch(mesh, np.ones((8, 8), np.uint8)))  # warm

    host = make_host_batches(8, keys)

    # A: direct back-to-back shard_batch
    held = []
    t0 = time.perf_counter()
    for i, hb in enumerate(host):
        t1 = time.perf_counter()
        held.append(shard_batch(mesh, hb))
        print(f"A put {i}: {(time.perf_counter()-t1)*1e3:8.1f} ms",
              flush=True)
    touch(held[-1])
    t = time.perf_counter() - t0
    print(f"A total: {t*1e3:.1f} ms  {8*BATCH/t:.1f} samples/s", flush=True)
    held.clear()

    # B: same batches via prefetch_to_device
    held = []
    t0 = time.perf_counter()
    for dev, hb in prefetch_to_device(iter(host), mesh, keys=keys):
        held.append(dev)
    touch(held[-1])
    t = time.perf_counter() - t0
    print(f"B total: {t*1e3:.1f} ms  {8*BATCH/t:.1f} samples/s", flush=True)
    held.clear()

    # C: real loader via prefetch_to_device, instrumented
    import tempfile
    synth = tempfile.mkdtemp(prefix="h2d_iso_")
    loader, _, _ = build_loaders(cfg, n, synthetic_dir=synth)
    for _ in iter(loader):
        pass  # warm decode cache

    class TimedIter:
        def __init__(self, it):
            self.it = iter(it)
            self.next_s = 0.0

        def __iter__(self):
            return self

        def __next__(self):
            t1 = time.perf_counter()
            try:
                return next(self.it)
            finally:
                self.next_s += time.perf_counter() - t1

    orig_put = jax.device_put
    put_s = [0.0]

    def timed_put(x, *a, **k):
        t1 = time.perf_counter()
        try:
            return orig_put(x, *a, **k)
        finally:
            put_s[0] += time.perf_counter() - t1

    jax.device_put = timed_put
    try:
        ti = TimedIter(loader)
        held = []
        nimg = 0
        t0 = time.perf_counter()
        for dev, hb in prefetch_to_device(ti, mesh, keys=keys):
            held.append(dev)
            nimg += hb["joints"].shape[0]
        touch(held[-1])
        t = time.perf_counter() - t0
    finally:
        jax.device_put = orig_put
    print(f"C total: {t*1e3:.1f} ms  {nimg/t:.1f} samples/s  "
          f"(loader next(): {ti.next_s*1e3:.1f} ms, device_put calls: "
          f"{put_s[0]*1e3:.1f} ms, residual: "
          f"{(t - ti.next_s - put_s[0])*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
