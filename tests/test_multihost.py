"""Execute the real multi-process (DCN-analog) branches: 2 local processes
with gloo CPU collectives, 4 virtual devices each (8 global).

This covers the code only reachable with ``jax.process_count() > 1``:
``initialize_multihost`` (parallel/mesh.py), ``shard_batch``'s
``make_array_from_process_local_data`` assembly, the process-sharded
``BatchLoader``, a cross-process SPMD train step (psum over DCN-analog),
``multihost_eval_setup``'s process-0 eval, and ``auto_resume_multihost``.
Reference-parity scope: SURVEY §2.3 DataParallel row (the reference is
single-process only; multi-host is a beyond-reference capability).
"""

import os
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _parse(out: str) -> dict:
    kv = {}
    for line in out.splitlines():
        if line.startswith("MH "):
            _, key, value = line.split(" ", 2)
            kv[key] = value
    return kv


def _launch_children(tmp_path, attempt):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    repo = os.path.dirname(os.path.dirname(CHILD))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    # dynamic port: a fixed one collides with leftover children of an
    # earlier run still holding the coordinator socket
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    work = os.path.join(str(tmp_path), f"attempt{attempt}")
    os.makedirs(work, exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), str(port), work],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(CHILD)))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            # generous: the children compile a jitted SPMD step on one
            # (often contended) CPU core; cache hits take ~2 min
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


@pytest.mark.slow
def test_two_process_training(tmp_path):
    # gloo's context init has a fixed 30s KV deadline; on a saturated
    # 1-core box the second process can miss it (DEADLINE_EXCEEDED).
    # That's box contention, not product state — retry once.
    for attempt in (0, 1):
        procs, outs = _launch_children(tmp_path, attempt)
        if all(p.returncode == 0 for p in procs):
            break
        transient = any("DEADLINE_EXCEEDED" in o for o in outs)
        if not transient or attempt == 1:
            break

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    kv0, kv1 = _parse(outs[0]), _parse(outs[1])
    assert kv0["done"] == kv1["done"] == "ok"
    assert kv0["process_count"] == kv1["process_count"] == "2"

    # SPMD equality: identical loss and post-step params on both processes
    assert kv0["loss"] == kv1["loss"]
    assert kv0["params_sum"] == kv1["params_sum"]

    # eval runs on process 0 only
    assert kv0["run_eval"] == "True" and kv1["run_eval"] == "False"
    assert "eval_loss" in kv0 and "eval_loss" not in kv1

    # resume decision + restored state broadcast from process 0
    assert kv0["resume_epoch"] == kv1["resume_epoch"] == "5"
    assert kv0["resume_perf"] == kv1["resume_perf"] == "0.25"
    assert kv0["resume_params_sum"] == kv1["resume_params_sum"]
