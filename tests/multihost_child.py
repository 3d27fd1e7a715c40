"""Child process for the 2-process multi-host test (test_multihost.py).

NOT a pytest module.  Runs the real multi-process branches: gloo-backed
``jax.distributed`` on the CPU backend with 4 virtual devices per process
(8 global), exercising ``initialize_multihost``, the process-sharded
``BatchLoader``, ``shard_batch``'s ``make_array_from_process_local_data``
path, one SPMD train step over the global mesh (cross-process psum),
``multihost_eval_setup``'s process-0 eval, and ``auto_resume_multihost``'s
broadcast resume.  Prints ``MH <key> <value>`` lines the parent compares
across processes.

Usage: python tests/multihost_child.py <process_id> <port> <workdir>
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

PID = int(sys.argv[1])
PORT = int(sys.argv[2])
WORKDIR = sys.argv[3]


def say(key, value):
    print(f"MH {key} {value}", flush=True)


def main():
    import jax.numpy as jnp

    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.config.defaults import MODEL_EXTRAS
    from fhpe_tpu.data import dataset_meta, make_synthetic_db
    from fhpe_tpu.data.loader import BatchLoader, PoseDataSource
    from fhpe_tpu.models import get_pose_net, is_multi_output
    from fhpe_tpu.parallel.mesh import (get_mesh, initialize_multihost,
                                        shard_batch)
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_batch_preprocessor, make_train_step

    initialize_multihost(coordinator_address=f"localhost:{PORT}",
                         num_processes=2, process_id=PID)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    say("process_count", jax.process_count())

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_FEATURES = 32
    cfg.MODEL.EXTRA.NUM_STACKS = 1
    cfg.MODEL.EXTRA.NUM_BLOCKS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"

    meta = dataset_meta("mpii")
    # per-process db copy: deterministic generator -> identical pixels
    db = make_synthetic_db(f"{WORKDIR}/db_p{PID}", 16, 16, (64, 64))
    src = PoseDataSource(cfg, db, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"], seed=7)
    loader = BatchLoader(src, batch_size=8, shuffle=True, drop_last=True,
                         host_targets=False, num_threads=2, seed=7,
                         process_index=PID, process_count=2)

    mesh = get_mesh()  # all 8 global devices
    model = get_pose_net(cfg, dtype=jnp.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    prepare = make_batch_preprocessor(cfg, meta["joints_weight"])
    step_fn = make_train_step(model, cfg, mesh, is_multi_output(model),
                              prepare=prepare)

    host = next(iter(loader))
    assert host["image"].shape[0] == 4  # this process's slice of global 8
    dev = shard_batch(mesh, {k: jnp.asarray(host[k])
                             for k in ("image", "joints", "joints_vis")})
    # the multi-process assembly path must have produced a GLOBAL batch
    assert dev["image"].shape[0] == 8, dev["image"].shape

    state, metrics = step_fn(state, dev)
    say("loss", f"{float(metrics['loss']):.10f}")
    psum = float(sum(jnp.abs(l.astype(jnp.float64)).sum()
                     for l in jax.tree_util.tree_leaves(state.params)))
    say("params_sum", f"{psum:.8f}")

    # multihost_eval_setup: process 0 evals on its local mesh
    from fhpe_tpu.cli.common import multihost_eval_setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_mesh, eval_vars, run_eval = multihost_eval_setup(mesh, variables)
    say("run_eval", run_eval)
    if run_eval:
        assert all(d.process_index == 0 for d in eval_mesh.devices.flat)
        from fhpe_tpu.train.step import make_eval_step
        ev = make_eval_step(model, cfg, eval_mesh, is_multi_output(model),
                            prepare=prepare)
        evb = shard_batch(eval_mesh, {
            "image": jnp.asarray(host["image"]),
            "joints": jnp.asarray(host["joints"]),
            "joints_vis": jnp.asarray(host["joints_vis"]),
            "inv_trans": jnp.tile(jnp.eye(2, 3), (4, 1, 1)),
            "valid": jnp.ones((4,), jnp.float32)})
        out = ev(eval_vars, evb)
        say("eval_loss", f"{float(out['loss']):.6f}")

    # auto_resume_multihost: p0 writes, the decision + state broadcast
    from fhpe_tpu.utils.checkpoint import (auto_resume_multihost,
                                           save_checkpoint)
    ckpt_dir = f"{WORKDIR}/ckpt_p{PID}"
    if PID == 0:
        save_checkpoint(ckpt_dir, state, epoch=5, perf=0.25, is_best=False,
                        async_write=False)
    fresh = create_train_state(cfg, model, jax.random.PRNGKey(9),
                               jnp.zeros((1, 64, 64, 3)))
    restored, epoch, perf = auto_resume_multihost(ckpt_dir, fresh)
    say("resume_epoch", epoch)
    say("resume_perf", perf)
    rsum = float(sum(jnp.abs(l.astype(jnp.float64)).sum()
                     for l in jax.tree_util.tree_leaves(restored.params)))
    say("resume_params_sum", f"{rsum:.8f}")

    # On a saturated 1-core box the processes can drift minutes apart in
    # the local (collective-free) sections; align them here so both reach
    # the atexit jax.distributed.shutdown barrier together (its ~5 min
    # deadline is otherwise exceeded by whichever process lags).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mh-child-done")
    say("done", "ok")


if __name__ == "__main__":
    main()
