"""Minimal programmatic training loop (hermetic — synthetic data).

Shows the library API beneath the CLIs: config -> data -> model -> SPMD
train step -> eval step.  Runs on whatever devices are visible (real TPU
chips or a virtual CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=8``).

  python examples/minimal_train.py
"""

import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.data import (BatchLoader, PoseDataSource, dataset_meta,
                           make_synthetic_db)
from fhpe_tpu.geometry.flip import flip_pair_permutation
from fhpe_tpu.models import get_pose_net, is_multi_output
from fhpe_tpu.ops.decode import make_inverse_transforms
from fhpe_tpu.parallel.mesh import get_mesh, prefetch_to_device
from fhpe_tpu.train.state import create_train_state, lr_for_epoch, set_lr
from fhpe_tpu.train.step import (make_batch_preprocessor, make_eval_step,
                                 make_train_step)


def main():
    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [128, 128]
    cfg.MODEL.HEATMAP_SIZE = [32, 32]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = 2
    cfg.MODEL.EXTRA.NUM_FEATURES = 128
    cfg.TRAIN.LR = 5e-4

    n_dev = len(jax.devices())
    mesh = get_mesh(n_dev)
    print(f"devices: {jax.devices()}")

    # synthetic dataset on disk (swap for data.build_db with real MPII/COCO)
    tmp = tempfile.mkdtemp()
    db = make_synthetic_db(tmp, num_samples=64, image_hw=(128, 128))
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, db, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    loader = BatchLoader(src, batch_size=4 * n_dev, drop_last=True)

    model = get_pose_net(cfg, dtype=jnp.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 128, 3)))
    prepare = make_batch_preprocessor(cfg)   # on-device normalize + targets
    step = make_train_step(model, cfg, mesh, is_multi_output(model),
                           prepare=prepare)

    for epoch in range(3):
        state = set_lr(state, lr_for_epoch(cfg, epoch))
        stream = prefetch_to_device(iter(loader), mesh,
                                    keys=["image", "joints", "joints_vis"])
        for dev, _ in stream:
            state, metrics = step(state, dev)
        print(f"epoch {epoch}: loss {float(metrics['loss']):.5f} "
              f"PCK {float(metrics['acc']):.3f}")

    # eval with flip-test + on-device decode
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.POST_PROCESS = True
    cfg.TEST.SHIFT_HEATMAP = True
    perm = flip_pair_permutation(16, meta["flip_pairs"])
    estep = make_eval_step(model, cfg, mesh, is_multi_output(model),
                           flip_perm=perm, prepare=prepare)
    esrc = PoseDataSource(cfg, db, is_train=False,
                          flip_pairs=meta["flip_pairs"],
                          upper_body_ids=meta["upper_body_ids"])
    eloader = BatchLoader(esrc, batch_size=4 * n_dev, shuffle=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    hits = valids = 0.0
    for batch in eloader:
        dev = {k: jnp.asarray(batch[k]) for k in
               ("image", "joints", "joints_vis")}
        dev["inv_trans"] = jnp.asarray(make_inverse_transforms(
            batch["center"], batch["scale"], (32, 32)))
        dev["valid"] = jnp.asarray(batch["valid"].astype(np.float32))
        from fhpe_tpu.parallel.mesh import shard_batch
        out = estep(variables, shard_batch(mesh, dev))
        hits += np.asarray(out["hits"]).sum()
        valids += np.asarray(out["valids"]).sum()
    print(f"eval PCK (flip-test): {hits / max(valids, 1):.3f}")


if __name__ == "__main__":
    main()
