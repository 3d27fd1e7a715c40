"""Relay H2D bandwidth probe (round-4 verdict #3 follow-up).

The fpd_cli_attrib run printed an anomalous "h2d: 1.1 samples/s" for the
loader+transfer-only leg while the full CLI loop (which contains the same
transfers) ran at ~45 samples/s — the number is unusable for the
attribution.  This probe measures relay H2D cleanly:

  raw kMB      device_put of a single uint8 array of k MB, timed to a
               1-element fetch of the result (forces materialisation);
               serial, per-transfer.
  pipelined    8 transfers issued back-to-back, one fetch at the end —
               what prefetch_to_device actually achieves.
  batch        the exact CLI uint8 training batch pytree (image crops +
               joints + vis) through shard_batch, serial and pipelined.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe/h2d_bw.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fhpe_tpu.parallel.mesh import get_mesh, shard_batch

BATCH = 64


def touch(x):
    """Force the transfer to have completed (fetch one element)."""
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def mb(tree):
    return sum(l.size * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(tree)) / 1e6


def main():
    mesh = get_mesh(len(jax.devices()))
    rs = np.random.RandomState(0)

    # warm the path
    touch(shard_batch(mesh, np.ones((8, 8), np.uint8)))

    for k in (1, 4, 16, 64):
        a = rs.randint(0, 255, (k * 1_000_000,), dtype=np.uint8)
        ts = []
        for rep in range(4):
            t0 = time.perf_counter()
            touch(shard_batch(mesh, a))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"raw {k:3d}MB serial: {t*1e3:8.1f} ms  {k/t:7.1f} MB/s",
              flush=True)

    # pipelined: 8 in flight, fetch only the last
    a = rs.randint(0, 255, (4_000_000,), dtype=np.uint8)
    arrs = [a + np.uint8(i) for i in range(8)]
    t0 = time.perf_counter()
    devs = [shard_batch(mesh, x) for x in arrs]
    touch(devs[-1])
    t = time.perf_counter() - t0
    print(f"pipelined 8x4MB:   {t*1e3:8.1f} ms  {32/t:7.1f} MB/s", flush=True)

    # the CLI batch pytree (uint8 crops + f32 joints) serial + pipelined
    batch = {
        "image_u8": rs.randint(0, 255, (BATCH, 256, 256, 3), dtype=np.uint8),
        "joints": rs.rand(BATCH, 16, 2).astype(np.float32),
        "joints_vis": np.ones((BATCH, 16, 1), np.float32),
    }
    size = mb(batch)
    ts = []
    for rep in range(4):
        t0 = time.perf_counter()
        touch(shard_batch(mesh, batch))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"cli batch ({size:.1f}MB) serial: {t*1e3:8.1f} ms  "
          f"{size/t:7.1f} MB/s  {BATCH/t:7.1f} samples/s", flush=True)

    t0 = time.perf_counter()
    devs = [shard_batch(mesh, batch) for _ in range(8)]
    touch(devs[-1])
    t = (time.perf_counter() - t0) / 8
    print(f"cli batch pipelined x8:  {t*1e3:8.1f} ms/batch  "
          f"{size/t:7.1f} MB/s  {BATCH/t:7.1f} samples/s", flush=True)


if __name__ == "__main__":
    main()
