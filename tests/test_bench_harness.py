"""Bench harness logic tests (no TPU): cumulative emission, budget skip,
min-per-leg trial policy, and the timing helpers on dummy steps.

Round-4 driver record was ``rc=124, parsed=null`` — the grid was killed
mid-run and the single end-of-run JSON line never printed.  These tests
pin the round-5 contract: a valid cumulative JSON line exists after EVERY
completed workload, the ``FHPE_BENCH_BUDGET_S`` budget converts remaining
workloads into explicit ``skipped_budget`` rows instead of letting an
external timeout produce nothing, and the differenced timing takes the
min over >=3 trials per leg (advisor round-4 medium finding).
"""

import json
import time

import numpy as np
import pytest

import bench


def _json_lines(out):
    return [json.loads(ln) for ln in out.splitlines()
            if ln.startswith("{")]


def _stub_workloads(behaviors):
    """[(key, fn_behavior)] -> WORKLOADS-shaped list.

    behavior: float seconds-per-step => success returning (s, b, flops);
    an Exception instance => raise it.
    """
    out = []
    for key, beh in behaviors:
        def fn(ctx, beh=beh):
            if isinstance(beh, Exception):
                raise beh
            return beh, 128 * ctx["n"], 1.0e9 * 128 * ctx["n"]
        out.append((key, f"{key}_metric", fn))
    return out


@pytest.fixture
def bench_env(monkeypatch, tmp_path):
    monkeypatch.setenv("FHPE_BENCH_RELAY_WAIT_S", "0")
    # don't spawn the real CPU-flops subprocess under stub workloads
    monkeypatch.setenv("FHPE_BENCH_CPU_FLOPS", "0")
    monkeypatch.setattr(bench, "BUDGET_S", 3300.0)
    monkeypatch.setattr(bench, "_T0", time.monotonic())
    # never touch the repo's committed flops cache from stub workloads
    monkeypatch.setattr(bench, "_FLOPS_CACHE_PATH",
                        str(tmp_path / "flops_cache.json"))
    return monkeypatch


def test_cumulative_json_after_every_workload(bench_env, capsys):
    bench_env.setattr(bench, "WORKLOADS", _stub_workloads(
        [("a", 0.01), ("b", 0.02), ("c", 0.04)]))
    bench.main()
    lines = _json_lines(capsys.readouterr().out)
    # one cumulative line per completed workload + the final one
    assert len(lines) == 4
    # each prefix is a valid, monotonically richer record
    for i, ln in enumerate(lines[:3]):
        assert ln["metric"] == "a_metric"
        assert ln["value"] is not None
        assert len(ln["extra_metrics"]) == i
    assert lines[-1] == lines[-2]  # final emit repeats the last cumulative


def test_kill_midway_leaves_valid_record(bench_env, capsys):
    # a passes; b dies twice (retry exhausted); c passes.  Even if the
    # process were killed during c, the line printed after b is complete.
    bench_env.setattr(bench, "WORKLOADS", _stub_workloads(
        [("a", 0.01), ("b", RuntimeError("relay down")), ("c", 0.03)]))
    bench_env.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    lines = _json_lines(capsys.readouterr().out)
    after_b = lines[1]
    assert after_b["value"] is not None
    assert after_b["extra_metrics"][0]["error"]
    final = lines[-1]
    assert [m.get("value") is not None for m in final["extra_metrics"]] == \
        [False, True]


def test_budget_exhaustion_emits_skip_rows(bench_env, capsys):
    bench_env.setattr(bench, "WORKLOADS", _stub_workloads(
        [("a", 0.01), ("b", 0.01), ("c", 0.01)]))

    # budget runs out right after workload a completes
    real_remaining = bench._remaining_s
    calls = {"n": 0}

    def fake_remaining():
        calls["n"] += 1
        return 3000.0 if calls["n"] <= 2 else 10.0

    bench_env.setattr(bench, "_remaining_s", fake_remaining)
    bench.main()
    lines = _json_lines(capsys.readouterr().out)
    final = lines[-1]
    assert final["value"] is not None  # headline completed
    skipped = [m for m in final["extra_metrics"] if m.get("skipped_budget")]
    assert len(skipped) == 2  # b and c present as explicit skip rows
    assert real_remaining() > 0  # sanity: the real clock wasn't consumed


def test_headline_mfu_fields(bench_env, capsys):
    bench_env.setattr(bench, "WORKLOADS", _stub_workloads([("a", 0.01)]))
    bench.main()
    final = _json_lines(capsys.readouterr().out)[-1]
    # stub: 1 GFLOP/img, b/per_step/n img/s
    assert final["vs_baseline"] is not None
    row = json.loads(json.dumps(final))  # headline row fields live on top
    assert row["value"] > 0


def test_cpu_flops_fallback_populates_mfu(bench_env, capsys):
    """When the in-process cost_analysis gives nothing (axon returns None,
    round-5 finding), per-image FLOPs from the CPU-subprocess lowering
    must populate analytic_flops_per_img/mfu_est."""
    def fn(ctx):
        return 0.01, 128 * ctx["n"], None  # no in-process flops

    bench_env.setattr(bench, "WORKLOADS", [("a", "a_metric", fn)])
    bench_env.setenv("FHPE_BENCH_CPU_FLOPS", "1")
    bench_env.setattr(bench, "_cpu_flops_subprocess",
                      lambda keys: {"a": 2.0e9})
    bench.main()
    final = _json_lines(capsys.readouterr().out)[-1]
    assert final["analytic_flops_per_img"] == 2.0e9
    assert final["mfu_est"] == pytest.approx(
        2.0e9 * final["value"] / bench.V5E_BF16_PEAK_FLOPS, rel=1e-3)


def test_flops_disk_cache_hit_skips_subprocess(bench_env, capsys):
    """With a cache file matching the source fingerprint, main() must not
    spawn the CPU-flops subprocess at all (the driver run's budget goes to
    measuring, not re-deriving deterministic counts)."""
    def fn(ctx):
        return 0.01, 128 * ctx["n"], None

    bench_env.setattr(bench, "WORKLOADS", [("a", "a_metric", fn)])
    bench_env.setenv("FHPE_BENCH_CPU_FLOPS", "1")
    bench_env.setattr(bench, "_src_fingerprint", lambda: "fp1")
    with open(bench._FLOPS_CACHE_PATH, "w") as f:
        json.dump({"fingerprint": "fp1", "flops_per_img": {"a": 4.0e9}}, f)

    def boom(keys):
        raise AssertionError("subprocess must not run on cache hit")

    bench_env.setattr(bench, "_cpu_flops_subprocess", boom)
    bench.main()
    final = _json_lines(capsys.readouterr().out)[-1]
    assert final["analytic_flops_per_img"] == 4.0e9


def test_flops_disk_cache_stale_fingerprint_recomputes_and_stores(
        bench_env, capsys):
    def fn(ctx):
        return 0.01, 128 * ctx["n"], None

    bench_env.setattr(bench, "WORKLOADS", [("a", "a_metric", fn)])
    bench_env.setenv("FHPE_BENCH_CPU_FLOPS", "1")
    bench_env.setattr(bench, "_src_fingerprint", lambda: "fp2")
    with open(bench._FLOPS_CACHE_PATH, "w") as f:
        json.dump({"fingerprint": "fp1", "flops_per_img": {"a": 4.0e9}}, f)
    bench_env.setattr(bench, "_cpu_flops_subprocess",
                      lambda keys: {"a": 5.0e9})
    bench.main()
    final = _json_lines(capsys.readouterr().out)[-1]
    assert final["analytic_flops_per_img"] == 5.0e9
    with open(bench._FLOPS_CACHE_PATH) as f:
        stored = json.load(f)
    assert stored == {"fingerprint": "fp2", "flops_per_img": {"a": 5.0e9}}


def test_flops_dirty_tree_disables_cache(bench_env, capsys):
    """fingerprint None (dirty tree / no git): cache neither read nor
    written; subprocess still supplies the numbers."""
    def fn(ctx):
        return 0.01, 128 * ctx["n"], None

    bench_env.setattr(bench, "WORKLOADS", [("a", "a_metric", fn)])
    bench_env.setenv("FHPE_BENCH_CPU_FLOPS", "1")
    bench_env.setattr(bench, "_src_fingerprint", lambda: None)
    bench_env.setattr(bench, "_cpu_flops_subprocess",
                      lambda keys: {"a": 6.0e9})
    bench.main()
    final = _json_lines(capsys.readouterr().out)[-1]
    assert final["analytic_flops_per_img"] == 6.0e9
    import os
    assert not os.path.exists(bench._FLOPS_CACHE_PATH)


def test_flops_json_mode_prints_parseable_line(bench_env, capsys):
    """--flops-json path: stub workloads, keys filtered, one FLOPS_JSON
    line with per-image FLOPs (flops/b), failures as null."""
    def ok(ctx):
        return None, 128 * ctx["n"], 3.0e9 * 128 * ctx["n"]

    def boom(ctx):
        raise RuntimeError("no")

    bench_env.setattr(bench, "WORKLOADS",
                      [("a", "a_metric", ok), ("b", "b_metric", boom),
                       ("c", "c_metric", ok)])

    class _Mesh:  # _flops_json_main only passes these through to fns
        pass

    import fhpe_tpu.parallel.mesh as mesh_mod
    bench_env.setattr(mesh_mod, "get_mesh", lambda n: _Mesh())
    bench._flops_json_main({"a", "b"})
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("FLOPS_JSON:")]
    assert len(line) == 1
    d = json.loads(line[0][len("FLOPS_JSON:"):])
    assert d == {"a": 3.0e9, "b": None}  # c filtered out, b's failure null


def test_min_leg_discards_stall():
    seq = iter([5.0, 1.0, 1.0])  # first trial stalls

    def run(n):
        return next(seq) * n

    assert bench._min_leg(run, 2) == 2.0


def test_timed_train_on_dummy_step():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(state, batch):
        s = state + batch["x"].sum()
        return s, {"loss": s}

    per_step = bench._timed_train(step, jnp.float32(0.0), (),
                                  {"x": jnp.ones((4,))}, jnp,
                                  jax.tree_util.tree_map)
    assert np.isfinite(per_step)


def test_timed_eval_on_dummy_step():
    import jax.numpy as jnp

    def step(variables, batch):
        return {"loss": (batch["image"] * variables["w"]).sum()}

    batch = {"image": jnp.ones((2, 4, 4, 3), jnp.float32)}
    per_step = bench._timed_eval(step, {"w": jnp.float32(2.0)}, batch, jnp)
    assert np.isfinite(per_step)


def test_step_flops_on_dummy():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(a, b):
        return a @ b

    x = jnp.ones((64, 64), jnp.float32)
    flops = bench._step_flops(f, x, x)
    # XLA counts 2*M*N*K for a matmul; tolerate None (backend-dependent)
    assert flops is None or flops >= 2 * 64 ** 3
