"""Benchmark: the five BASELINE.json flagship workloads on real TPU.

Headline (driver-tracked ``value``): FPD distillation training throughput,
images/sec/chip, for the flagship MPII workload (BASELINE.json config #4):
stacked-hourglass teacher (stacks=8, feats=256) eval-mode forward
co-supervising the student (stacks=4, feats=128) training step (forward +
fused pose+KD loss + backward + optimizer), MPII 256x256, bf16 compute.
Reference hot loop: lib/core/function.py:99-187.

``extra_metrics`` carries the rest of the BASELINE workload grid so every
flagship number is driver-tracked (round-3 verdict: "if it isn't in
BENCH_r*.json it can silently regress"):

* fpd_w48_w32   — COCO flagship FPD pair, HRNet-W48 teacher -> W32 student
                  train step, 256x192 (BASELINE #5, reference README.md:57).
* w32_train     — plain HRNet-W32 COCO 256x192 train step (README.md:56).
* rn50_train    — plain PoseResNet-50 COCO 256x192 train step.
* w32_eval      — HRNet-W32 COCO 256x192 flip-test eval + on-device decode
                  (BASELINE #3; reference validate(), function.py:189-332).
* hg8_eval      — hourglass teacher (s8/f256) MPII flip-test eval + decode
                  (BASELINE #2).
* serve_w32     — the serving Predictor's device step (beyond-reference
                  surface, serve/predictor.py): uint8 crops in ->
                  on-device normalize -> W32 forward -> flip-test
                  ensemble -> decode -> source-coordinate keypoints.
                  Tracks the program the request API dispatches; the
                  request-API wall number itself is relay-H2D transport
                  bound on this box (BENCH_NOTES round-4) and is
                  deliberately not driver-tracked.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "extra_metrics": [{"metric": ..., "value": N, "unit": ...}, ...]}

vs_baseline: the reference publishes no throughput (BASELINE.md).  The
documented ESTIMATE for the reference setup (4x TITAN XP, DataParallel,
batch 4/GPU, cv2+numpy dataloader; the reference FPD loop additionally
backprops through the teacher, function.py:120-122) is ~140 images/sec
total for the plain train loop — FPD is strictly slower there, so using
140 keeps the comparison conservative in the reference's favor.  The
BASELINE.json north star is 2x that at v5e-8 scale; vs_baseline reported
here is value / (2 * 140 / 8).

Timing: differenced chained runs ended by a real value fetch (time N1 and
N2 dependent steps, report (t2-t1)/(N2-N1)) — block_until_ready alone is
unreliable through the relay, and differencing cancels the constant
fetch/dispatch overhead.  Each workload's chain carries a data dependence
(train: donated state; eval: the fetched loss folded back into the input)
so no iteration can be elided or reordered.  Each leg is the MIN over
``FHPE_BENCH_TRIALS`` (>=3) trials BEFORE differencing: a transient relay
stall inflates one trial only, and min-per-leg discards it; min over
*pairwise differences* would instead select the pair whose SHORT leg
stalled (difference shrinks), i.e. an underestimate.

Timeout-proofing (round-4 lesson: the driver killed the grid mid-run and
recorded NO number): the cumulative result JSON line is printed after
EVERY completed workload — the last JSON line in the tail is always the
richest valid record — and ``FHPE_BENCH_BUDGET_S`` (default 3300 s) is a
total wall-clock budget: when it runs low, remaining workloads are
emitted as skipped and the final line goes out before any external axe
falls.  ``FHPE_BENCH_RELAY_WAIT_S`` caps the pre-run device-health wait
(counted against the budget).

Each workload also reports ``analytic_flops_per_img`` (XLA cost_analysis
on the unoptimized lowering of its whole step — forward+backward+optimizer
for train, flip-test+decode for eval) and ``mfu_est`` = achieved
FLOP/s / 197e12 (v5e bf16 peak), making the MFU-ceiling claims in
docs/BENCH_NOTES.md regression-tracked numbers.  The axon PJRT plugin's
``Lowering.cost_analysis()`` returns None (measured round 5), so the
counts come from a ``FHPE_PLATFORM=cpu`` subprocess that traces + lowers
the identical n=1 workload client-side (``--flops-json`` mode; lowering
is backend-independent, per-image FLOPs are device-count-independent for
these data-parallel steps).  Disable with ``FHPE_BENCH_CPU_FLOPS=0``.
The counts are cached in ``.bench_flops_cache.json`` keyed by the
committed tree hash of ``fhpe_tpu`` + ``bench.py`` (they are a pure
function of the source), so a driver invocation on a clean tree spends
zero budget re-deriving them; a dirty tree falls back to the subprocess.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import numpy as np

# Persistent compile cache: first compiles of the big steps cost 5-15 min
# each through the relay's remote-compile path; cached re-runs are
# seconds.  Set before jax import so driver invocations (which may not
# export it) reuse the cache this repo's probe runs already warmed.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REFERENCE_TOTAL_IMGS_PER_SEC = 140.0   # documented estimate, see docstring
NORTH_STAR_PER_CHIP = 2.0 * REFERENCE_TOTAL_IMGS_PER_SEC / 8.0

# Per-chip batch.  A/B on v5e (differenced): b=64 602 img/s/chip, b=128 724
# (+20%) for the headline FPD workload — the teacher forward saves no
# activations, so the workload scales past the round-1 "fits b=64"
# assumption; b=256 645 -> 128 is the knee (docs/BENCH_NOTES.md).
BATCH = int(os.environ.get("FHPE_BENCH_BATCH", "128"))
WARMUP = 3
ITERS = int(os.environ.get("FHPE_BENCH_ITERS", "20"))
TRIALS = max(3, int(os.environ.get("FHPE_BENCH_TRIALS", "3")))

# Total wall-clock budget.  The round-4 driver invocation was killed
# (rc=124) during the 7th workload and, because the single JSON line only
# printed after ALL workloads, recorded nothing.  Now the cumulative line
# prints after every workload AND the budget pre-empts the external
# timeout: with less than _RESERVE_S left, remaining workloads are
# reported as skipped and the final line still goes out.
BUDGET_S = float(os.environ.get("FHPE_BENCH_BUDGET_S", "3300"))
_RESERVE_S = 90.0
_T0 = time.monotonic()

V5E_BF16_PEAK_FLOPS = 197e12  # per chip


def _remaining_s() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


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


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

def _hg_cfg(stacks, feats):
    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.config.defaults import MODEL_EXTRAS

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [256, 256]
    cfg.MODEL.HEATMAP_SIZE = [64, 64]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = stacks
    cfg.MODEL.EXTRA.NUM_FEATURES = feats
    cfg.TRAIN.LR = 2.5e-4
    cfg.DATASET.DATASET = "mpii"
    return cfg


def _coco_cfg(yaml_name):
    from fhpe_tpu.config import load_config

    return load_config(f"/root/repo/experiments/coco/{yaml_name}",
                       opts=["KD.ALPHA", "0.5"])


def _train_batch(mesh, b, img_hw, joints, shard_batch, seed=0):
    import jax.numpy as jnp

    rs = np.random.RandomState(seed)
    h, w = img_hw
    return shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(b, h, w, 3), jnp.float32),
        "target": jnp.asarray(rs.rand(b, h // 4, w // 4, joints),
                              jnp.float32),
        "target_weight": jnp.ones((b, joints), jnp.float32),
    })


def _eval_batch(mesh, b, img_hw, joints, shard_batch, seed=0):
    import jax.numpy as jnp

    batch = _train_batch(mesh, b, img_hw, joints, shard_batch, seed)
    rs = np.random.RandomState(seed + 1)
    inv = np.tile(np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                           np.float32), (b, 1, 1))
    inv[:, :, 2] = rs.rand(b, 2)
    batch["inv_trans"] = jnp.asarray(inv)
    return batch


# ---------------------------------------------------------------------------
# workloads — each returns (per_step_seconds, images_per_step)
# ---------------------------------------------------------------------------

def _min_leg(run, n):
    """Min over TRIALS of one chained-run leg.

    Min-per-leg BEFORE differencing: a transient relay stall only ever
    ADDS time, so the min approaches the stall-free time of each leg and
    the difference cancels the (min-consistent) constant overhead.  Taking
    min over pairwise differences instead would prefer the pair whose
    short leg stalled (the difference shrinks) — a silent underestimate.
    """
    return min(run(n) for _ in range(TRIALS))


def _timed_train(step_fn, state, extra_args, batch, jnp, tree_map):
    """Differenced chained train-step timing (state carries dependence)."""
    def run(n):
        st = tree_map(jnp.array, state)
        m = None
        for _ in range(WARMUP):
            st, m = step_fn(st, *extra_args, batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            st, m = step_fn(st, *extra_args, batch)
        float(m["loss"])
        return time.perf_counter() - t0

    n1, n2 = ITERS, ITERS * 4
    return (_min_leg(run, n2) - _min_leg(run, n1)) / (n2 - n1)


def _timed_eval(step_fn, variables, batch, jnp):
    """Differenced IN-JIT chained eval timing.

    Eval steps are short (tens of ms), so python-level chaining lets
    per-dispatch relay jitter ride the measurement (observed +-20%
    run-to-run on hg8_eval).  The chain therefore runs inside one jit as
    a ``lax.fori_loop`` with a DYNAMIC trip count (one compile, one
    dispatch per measurement): each iteration folds the previous loss
    back into the input image, so no iteration can be elided or hoisted,
    and the final carry fetch forces the whole loop.
    """
    import jax
    from jax import lax

    img_dtype = batch["image"].dtype

    # The carry must stay FLOAT: float x*0 cannot be constant-folded
    # (NaN/Inf), so the loop body stays live.  An integer carry (uint8
    # serving images) folds x*0 -> 0, the body goes dead, and the loop
    # measures as constant time regardless of trip count (observed:
    # negative differenced values on the serve workload).
    @jax.jit
    def chain(variables, batch, n):
        def body(_, carry):
            b = dict(batch)
            b["image"] = batch["image"] + carry.astype(img_dtype)
            out = step_fn(variables, b)
            return out["loss"].astype(jnp.float32) * 0
        return lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    def run(n):
        t0 = time.perf_counter()
        float(chain(variables, batch, jnp.int32(n)))
        return time.perf_counter() - t0

    run(WARMUP)  # compile + warm
    n1, n2 = ITERS, ITERS * 4
    return (_min_leg(run, n2) - _min_leg(run, n1)) / (n2 - n1)


def _step_flops(jitted, *args):
    """Whole-step FLOPs from XLA cost_analysis on the unoptimized lowering.

    Lowering is client-side (no relay round trip, no AOT compile — the
    relay AOT path can SIGKILL, docs/BENCH_NOTES.md round 4).  The count is
    the analytic FLOPs of the program as written (fusion may elide a little
    of it), which is exactly what an MFU *estimate* wants.  Best-effort:
    returns None rather than failing the workload.
    """
    import jax

    try:
        fn = jitted if hasattr(jitted, "lower") else jax.jit(jitted)
        cost = fn.lower(*args).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = cost.get("flops") if cost else None
        return float(f) if f and f > 0 else None
    except Exception as e:  # noqa: BLE001 — diagnostics only
        print(f"# bench: cost_analysis unavailable: {e!r}", flush=True)
        return None


def bench_fpd_hg(ctx):
    """BASELINE #4: hourglass FPD MPII train (the headline)."""
    import jax
    import jax.numpy as jnp

    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_fpd_train_step

    scfg = _hg_cfg(stacks=4, feats=128)
    scfg.KD.ALPHA = 0.5
    # Exactly-equivalent training config: the pre-activation hourglass's
    # non-head conv biases have analytically zero gradient (absorbed by a
    # downstream BatchNorm), so they stay at zero forever; dropping them
    # deletes one dy reduce-sum HBM pass per conv from the backward.
    # Equivalence pinned by tests/test_dead_bias.py; +3.0% on v5e
    # (scripts/probe/dead_bias_ab.py, docs/BENCH_NOTES.md round 3).
    scfg.TPU.DEAD_BIAS_SKIP = True
    tcfg = _hg_cfg(stacks=8, feats=256)

    student = get_pose_net(scfg, dtype=jnp.bfloat16)
    teacher = get_pose_net(tcfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, 256, 256, 3))
    state = create_train_state(scfg, student, jax.random.PRNGKey(0), sample)
    tvars = teacher.init(jax.random.PRNGKey(1), sample, train=False)
    step = make_fpd_train_step(student, teacher, scfg, ctx["mesh"],
                               multi_output=True, teacher_multi_output=True,
                               teacher_cfg=tcfg)
    b = BATCH * ctx["n"]
    batch = _train_batch(ctx["mesh"], b, (256, 256), 16, ctx["shard_batch"])
    flops = _step_flops(step, state, tvars, batch)
    if ctx.get("flops_only"):
        return None, b, flops
    per_step = _timed_train(step, state, (tvars,), batch, jnp,
                            jax.tree_util.tree_map)
    return per_step, b, flops


def bench_fpd_w48_w32(ctx):
    """BASELINE #5: COCO flagship FPD pair train."""
    import jax
    import jax.numpy as jnp

    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_fpd_train_step

    scfg = _coco_cfg("hrnet/w32_256x192_adam_lr1e-3.yaml")
    tcfg = _coco_cfg("hrnet/w48_256x192_adam_lr1e-3.yaml")
    student = get_pose_net(scfg, dtype=jnp.bfloat16)
    teacher = get_pose_net(tcfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, 256, 192, 3))
    state = create_train_state(scfg, student, jax.random.PRNGKey(0), sample)
    tvars = teacher.init(jax.random.PRNGKey(1), sample, train=False)
    step = make_fpd_train_step(student, teacher, scfg, ctx["mesh"],
                               multi_output=False,
                               teacher_multi_output=False, teacher_cfg=tcfg)
    b = BATCH * ctx["n"]
    batch = _train_batch(ctx["mesh"], b, (256, 192), 17, ctx["shard_batch"])
    flops = _step_flops(step, state, tvars, batch)
    if ctx.get("flops_only"):
        return None, b, flops
    per_step = _timed_train(step, state, (tvars,), batch, jnp,
                            jax.tree_util.tree_map)
    return per_step, b, flops


def _bench_plain_train(ctx, cfg, img_hw, joints):
    import jax
    import jax.numpy as jnp

    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_train_step

    model = get_pose_net(cfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, img_hw[0], img_hw[1], 3))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    step = make_train_step(model, cfg, ctx["mesh"], multi_output=False)
    b = BATCH * ctx["n"]
    batch = _train_batch(ctx["mesh"], b, img_hw, joints, ctx["shard_batch"])
    flops = _step_flops(step, state, batch)
    if ctx.get("flops_only"):
        return None, b, flops
    per_step = _timed_train(step, state, (), batch, jnp,
                            jax.tree_util.tree_map)
    return per_step, b, flops


def bench_w32_train(ctx):
    return _bench_plain_train(
        ctx, _coco_cfg("hrnet/w32_256x192_adam_lr1e-3.yaml"), (256, 192), 17)


def bench_rn50_train(ctx):
    return _bench_plain_train(
        ctx, _coco_cfg("resnet/res50_256x192_d256x3_adam_lr1e-3.yaml"),
        (256, 192), 17)


def _bench_eval(ctx, cfg, img_hw, joints, multi_output):
    import jax
    import jax.numpy as jnp

    from fhpe_tpu.data import dataset_meta
    from fhpe_tpu.geometry.flip import flip_pair_permutation
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.train.step import make_eval_step

    cfg.defrost()
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.SHIFT_HEATMAP = True
    cfg.TEST.POST_PROCESS = True
    cfg.freeze()
    meta = dataset_meta(cfg.DATASET.DATASET)
    perm = flip_pair_permutation(meta["num_joints"], meta["flip_pairs"])
    model = get_pose_net(cfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, img_hw[0], img_hw[1], 3))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    step = make_eval_step(model, cfg, ctx["mesh"], multi_output=multi_output,
                          flip_perm=perm)
    b = BATCH * ctx["n"]
    batch = _eval_batch(ctx["mesh"], b, img_hw, joints, ctx["shard_batch"])
    flops = _step_flops(step, variables, batch)
    if ctx.get("flops_only"):
        return None, b, flops
    per_step = _timed_eval(step, variables, batch, jnp)
    return per_step, b, flops


def bench_w32_eval(ctx):
    """BASELINE #3: W32 COCO flip-test eval + decode."""
    return _bench_eval(
        ctx, _coco_cfg("hrnet/w32_256x192_adam_lr1e-3.yaml"), (256, 192), 17,
        multi_output=False)


def bench_hg8_eval(ctx):
    """BASELINE #2: hourglass teacher MPII flip-test eval + decode."""
    return _bench_eval(ctx, _hg_cfg(stacks=8, feats=256), (256, 256), 16,
                       multi_output=True)


def bench_serve_w32(ctx):
    """Serving device step: the Predictor's full compiled program."""
    import jax
    import jax.numpy as jnp

    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import shard_batch
    from fhpe_tpu.serve.predictor import Predictor

    cfg = _coco_cfg("hrnet/w32_256x192_adam_lr1e-3.yaml")
    cfg.defrost()
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.SHIFT_HEATMAP = True
    cfg.TEST.POST_PROCESS = True
    cfg.freeze()
    model = get_pose_net(cfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, 256, 192, 3))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    b = BATCH * ctx["n"]
    p = Predictor(cfg, variables, batch_size=b, n_devices=ctx["n"])

    rs = np.random.RandomState(0)
    inv = np.tile(np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32),
                  (b, 1, 1))
    inv[:, :, 2] = rs.rand(b, 2)
    batch = shard_batch(p.mesh, {
        "image": jnp.asarray(
            rs.randint(0, 256, (b, 256, 192, 3)).astype(np.uint8)),
        "inv_trans": jnp.asarray(inv),
    })

    # _timed_eval folds loss*0 back into the uint8 image each iteration, so
    # the whole serve program (normalize included) re-runs per step.
    def step(v, bt):
        out = p._step(v, bt)
        return {"loss": out["preds"].sum() + out["maxvals"].sum()}

    flops = _step_flops(step, p.variables, batch)
    if ctx.get("flops_only"):
        return None, b, flops
    per_step = _timed_eval(step, p.variables, batch, jnp)
    return per_step, b, flops


WORKLOADS = [
    # (key, metric name, fn)
    ("fpd_hg",
     "fpd_hg8f256_to_hg4f128_mpii256_train_images_per_sec_per_chip",
     bench_fpd_hg),
    ("fpd_w48_w32",
     "fpd_hrw48_to_hrw32_coco256x192_train_images_per_sec_per_chip",
     bench_fpd_w48_w32),
    ("w32_train",
     "hrnet_w32_coco256x192_train_images_per_sec_per_chip",
     bench_w32_train),
    ("rn50_train",
     "pose_resnet50_coco256x192_train_images_per_sec_per_chip",
     bench_rn50_train),
    ("w32_eval",
     "hrnet_w32_coco256x192_fliptest_eval_images_per_sec_per_chip",
     bench_w32_eval),
    ("hg8_eval",
     "hourglass8_f256_mpii256_fliptest_eval_images_per_sec_per_chip",
     bench_hg8_eval),
    ("serve_w32",
     "serve_w32_coco256x192_fliptest_predict_device_step_images_per_sec_per_chip",
     bench_serve_w32),
]


_FLOPS_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".bench_flops_cache.json")


def _src_fingerprint():
    """Identity of the code that determines the analytic FLOPs counts.

    The per-image FLOPs of each workload are a pure function of the model/
    step definitions, so they are cached on disk keyed by the committed
    tree hash of ``fhpe_tpu`` + the ``bench.py`` blob hash.  Returns None
    (cache disabled) when either is dirty or git is unavailable — the
    subprocess fallback then recomputes from source.
    """
    import subprocess

    cwd = os.path.dirname(os.path.abspath(__file__))
    try:
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--", "fhpe_tpu", "bench.py"],
            cwd=cwd, capture_output=True, text=True, timeout=15).stdout
        if dirty.strip():
            return None
        r = subprocess.run(
            ["git", "rev-parse", "HEAD:fhpe_tpu", "HEAD:bench.py"],
            cwd=cwd, capture_output=True, text=True, timeout=15)
        if r.returncode != 0:
            return None
        return "-".join(r.stdout.split())
    except Exception:  # noqa: BLE001 — cache is best-effort
        return None


def _flops_cache_load(fingerprint) -> dict:
    if not fingerprint:
        return {}
    try:
        with open(_FLOPS_CACHE_PATH) as f:
            d = json.load(f)
        if d.get("fingerprint") == fingerprint:
            return {k: v for k, v in d.get("flops_per_img", {}).items() if v}
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass
    return {}


def _flops_cache_store(fingerprint, flops_per_img) -> None:
    if not fingerprint or not flops_per_img:
        return
    try:
        merged = _flops_cache_load(fingerprint)
        merged.update(flops_per_img)
        with open(_FLOPS_CACHE_PATH, "w") as f:
            json.dump({"fingerprint": fingerprint,
                       "flops_per_img": merged}, f, indent=1, sort_keys=True)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"# bench: flops cache write failed: {e!r}", flush=True)


def _cpu_flops_subprocess(keys) -> dict:
    """Per-image analytic FLOPs for the selected workloads, computed in a
    ``FHPE_PLATFORM=cpu`` subprocess (``--flops-json`` mode below).

    The axon plugin's lowered ``cost_analysis()`` returns None, but
    lowering is client-side and backend-independent: the n=1 CPU lowering
    of these data-parallel steps has the same per-image FLOPs as the TPU
    program.  Best-effort, budget-capped; returns {} on any failure.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--flops-json", ",".join(keys)],
            env={**os.environ, "FHPE_PLATFORM": "cpu"},
            capture_output=True, text=True,
            timeout=min(600.0, max(60.0, _remaining_s() - 600.0)))
        for ln in r.stdout.splitlines():
            if ln.startswith("FLOPS_JSON:"):
                d = json.loads(ln[len("FLOPS_JSON:"):])
                return {k: v for k, v in d.items() if v}
        print(f"# bench: cpu-flops subprocess printed no FLOPS_JSON "
              f"(rc={r.returncode}, stderr tail: {r.stderr[-300:]!r})",
              flush=True)
    except Exception as e:  # noqa: BLE001 — diagnostics only
        print(f"# bench: cpu-flops subprocess failed: {e!r}", flush=True)
    return {}


def _flops_json_main(keys) -> None:
    """--flops-json mode: trace + lower each workload on CPU (n=1), print
    one ``FLOPS_JSON:{key: flops_per_img}`` line.  Run with
    FHPE_PLATFORM=cpu (applied at fhpe_tpu import)."""
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch

    ctx = {"n": 1, "mesh": get_mesh(1), "shard_batch": shard_batch,
           "flops_only": True}
    out = {}
    for key, _, fn in WORKLOADS:
        if key not in keys:
            continue
        try:
            _, b, flops = fn(ctx)
            out[key] = (flops / b) if flops else None
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"# flops {key} failed: {e!r}", flush=True)
            out[key] = None
    print("FLOPS_JSON:" + json.dumps(out), flush=True)


def _emit(results) -> None:
    """Print the cumulative result JSON line (schema unchanged).

    Called after EVERY completed workload so the last JSON line in the
    output tail is always the richest valid record, even if the process
    is killed mid-grid (round-4 failure: rc=124 -> no record at all).
    """
    head = results[0] if results else {"metric": "none", "value": None}
    line = {
        **head,  # keeps batch_per_chip / analytic_flops_per_img / mfu_est
        "metric": head["metric"],
        "value": head.get("value"),
        "unit": "images/sec/chip",
        "vs_baseline": (round(head["value"] / NORTH_STAR_PER_CHIP, 3)
                        if head.get("value") else None),
        # The reference publishes no throughput (BASELINE.md); the divisor
        # is the documented ~140 img/s ESTIMATE (docstring above), x2
        # north-star, /8 chips.  Flagged so vs_baseline is never quoted as
        # a measured-reference comparison.
        "baseline_estimated": True,
        "baseline_estimate_imgs_per_sec_total": REFERENCE_TOTAL_IMGS_PER_SEC,
        "extra_metrics": results[1:],
    }
    print(json.dumps(line), flush=True)


def main() -> None:
    _wait_for_device(min(
        float(os.environ.get("FHPE_BENCH_RELAY_WAIT_S", "600")),
        max(0.0, _remaining_s() - 600.0)))

    import jax

    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch

    only = os.environ.get("FHPE_BENCH_ONLY")
    selected = [w for w in WORKLOADS
                if only is None or w[0] in only.split(",")]

    n = len(jax.devices())
    ctx = {"n": n, "mesh": get_mesh(n), "shard_batch": shard_batch}

    flops_per_img = {}
    if os.environ.get("FHPE_BENCH_CPU_FLOPS", "1") != "0":
        # Disk cache first: the counts are deterministic for a committed
        # tree, and the CPU lowering costs minutes on a 1-core host —
        # budget the driver run should spend measuring, not re-deriving.
        fp = _src_fingerprint()
        flops_per_img = _flops_cache_load(fp)
        missing = [w[0] for w in selected if w[0] not in flops_per_img]
        if missing and _remaining_s() > 900:
            fresh = _cpu_flops_subprocess(missing)
            flops_per_img.update(fresh)
            _flops_cache_store(fp, fresh)
        print(f"# bench: cpu-flops: "
              f"{ {k: round(v / 1e9, 2) for k, v in flops_per_img.items()} } "
              f"GF/img ({_remaining_s():.0f}s budget left)", flush=True)

    results = []
    out_of_budget = False
    for key, metric, fn in selected:
        if out_of_budget or _remaining_s() < _RESERVE_S:
            out_of_budget = True
            results.append({"metric": metric, "value": None,
                            "unit": "images/sec/chip",
                            "skipped_budget": True})
            print(f"# bench: {key} skipped (budget: "
                  f"{_remaining_s():.0f}s left)", flush=True)
            continue
        last_err = None
        for attempt in range(2):
            try:
                per_step, b, flops = fn(ctx)
                row = {
                    "metric": metric,
                    "value": round(b / per_step / n, 2),
                    "unit": "images/sec/chip",
                    "batch_per_chip": BATCH,
                }
                # cost_analysis counts the whole n-device step; the MFU
                # estimate is per chip (uniform data-parallel shards).  On
                # axon the in-process count is None — fall back to the
                # CPU-subprocess lowering of the identical workload.
                fpi = (flops / b) if flops else flops_per_img.get(key)
                if fpi:
                    row["analytic_flops_per_img"] = round(fpi, 0)
                    row["mfu_est"] = round(
                        fpi * row["value"] / V5E_BF16_PEAK_FLOPS, 4)
                results.append(row)
                last_err = None
                break
            except Exception as e:          # noqa: BLE001 — transient relay
                last_err = e
                print(f"# bench: {key} attempt {attempt} failed: {e!r}",
                      flush=True)
                traceback.print_exc()
                if _remaining_s() < _RESERVE_S + 30:
                    break
                time.sleep(30)
        if last_err is not None:
            results.append({"metric": metric, "value": None,
                            "unit": "images/sec/chip",
                            "error": repr(last_err)})
        done = results[-1]
        print(f"# bench: {key} -> {done.get('value')} "
              f"(mfu_est={done.get('mfu_est')}, "
              f"{_remaining_s():.0f}s budget left)", flush=True)
        _emit(results)

    _emit(results)


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--flops-json":
        _flops_json_main(set(sys.argv[2].split(",")))
    else:
        main()
