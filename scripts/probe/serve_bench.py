"""Serving latency/throughput bench for fhpe_tpu.serve.Predictor.

Measures the compiled fixed-shape inference program on the real chip:
- steady-state batch latency + img/s via DIFFERENCED chained runs
  (relay-safe timing, see docs/BENCH_NOTES.md), and
- a host-side request-level number including pad/trim + H2D/D2H.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe/serve_bench.py \
      [--cfg experiments/mpii/hourglass/hg4_256x256_d256x3_adam_lr2.5e-4.yaml] \
      [--batch 64] [--flip]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="experiments/mpii/hourglass/"
                    "hg4_256x256_d256x3_adam_lr2.5e-4.yaml")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--flip", action="store_true")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fhpe_tpu.config import load_config
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.ops.decode import make_inverse_transforms
    from fhpe_tpu.serve import Predictor

    cfg = load_config(args.cfg, opts=[
        "TEST.FLIP_TEST", str(bool(args.flip)),
        "TEST.POST_PROCESS", "True",
    ])
    model = get_pose_net(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3)), train=False)
    p = Predictor(cfg, variables, batch_size=args.batch)
    print(f"model={cfg.MODEL.NAME} input={w}x{h} batch={args.batch} "
          f"flip={args.flip} devices={len(jax.devices())}", flush=True)

    t0 = time.time()
    p.warmup()
    print(f"warmup (compile) {time.time() - t0:.1f}s", flush=True)

    rng = np.random.RandomState(0)
    crops = rng.randint(0, 256, size=(args.batch, h, w, 3)).astype(np.uint8)
    centers = rng.uniform(100, 300, size=(args.batch, 2))
    scales = rng.uniform(0.8, 2.0, size=(args.batch, 2))
    inv = make_inverse_transforms(centers, scales,
                                  tuple(cfg.MODEL.HEATMAP_SIZE))
    dev = jax.device_put({"image": jnp.asarray(crops),
                          "inv_trans": jnp.asarray(inv.astype(np.float32))},
                         p._sharding)

    # differenced chained device-side runs: each rep re-consumes the
    # previous output's maxvals as a (broadcast) brightness bias so no
    # iteration can be hoisted; ended by a real value fetch.
    # On the CPU backend, sync every step: deep async chains of
    # multi-partition programs (the step + the .sum() all-reduce) can
    # starve XLA:CPU's per-device rendezvous threads past its 40 s hard
    # deadline (observed F-level aborts on the 1-core build box).  The
    # relay-safe async chain is only needed on TPU.
    sync_each = jax.default_backend() == "cpu"

    def chain(n):
        out = p._step(p.variables, dev)
        for _ in range(n - 1):
            if sync_each:
                jax.block_until_ready(out)
            bias = (out["maxvals"].sum() * 0).astype(jnp.uint8)
            d2 = dict(dev)
            d2["image"] = dev["image"] + bias
            out = p._step(p.variables, d2)
        return float(np.asarray(out["maxvals"]).sum())

    chain(2)  # prime the bias-added shape variant
    n1, n2 = 4, 4 + args.reps
    t1 = time.time(); chain(n1); t1 = time.time() - t1
    t2 = time.time(); chain(n2); t2 = time.time() - t2
    step_s = (t2 - t1) / (n2 - n1)
    print(f"device step: {step_s * 1e3:.2f} ms/batch  "
          f"{args.batch / step_s:.1f} img/s", flush=True)

    # request-level (host API): includes pad/trim, H2D of uint8 crops,
    # D2H of (B,J,3) — what a serving frontend actually sees.
    p.predict_crops(crops, centers, scales)
    t0 = time.time()
    for _ in range(10):
        p.predict_crops(crops, centers, scales)
    req_s = (time.time() - t0) / 10
    print(f"request API (1 chunk): {req_s * 1e3:.2f} ms/batch  "
          f"{args.batch / req_s:.1f} img/s", flush=True)

    # multi-chunk request: 8 compiled batches per call — exercises the
    # double-buffered pipeline (prefetch thread pads+uploads chunk k+1
    # while the device computes chunk k and the host drains k-1).
    k = 8
    big = np.broadcast_to(crops, (k,) + crops.shape).reshape(
        (k * args.batch,) + crops.shape[1:]).copy()
    bc = np.tile(centers, (k, 1))
    bs = np.tile(scales, (k, 1))
    p.predict_crops(big, bc, bs)
    t0 = time.time()
    for _ in range(3):
        p.predict_crops(big, bc, bs)
    multi_s = (time.time() - t0) / 3
    rate = k * args.batch / multi_s
    print(f"request API ({k} chunks): {multi_s * 1e3:.2f} ms/req  "
          f"{rate:.1f} img/s  ({rate * step_s / args.batch * 100:.0f}% of "
          f"device-step)", flush=True)


if __name__ == "__main__":
    main()
