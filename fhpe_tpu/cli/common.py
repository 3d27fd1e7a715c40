"""Shared CLI wiring: args, datasets, validation epoch.

This is the integration layer the reference spreads over
``tools/{train,fpd_train,test}.py`` and ``lib/core/function.py:189-332``
(validate): argparse with ``--cfg`` + ``KEY VALUE`` overrides, dataset/
loader construction, and the full validation pass (jitted eval step with
flip-test, decode on device, all_preds/all_boxes accumulation, dataset
evaluation, markdown table).
"""

from __future__ import annotations

import argparse
import time
from collections import OrderedDict

import numpy as np

import jax.numpy as jnp

from ..config import load_config
from ..data import BatchLoader, PoseDataSource, build_db, dataset_meta
from ..geometry.flip import flip_pair_permutation
from ..ops.decode import make_inverse_transforms
from ..parallel.mesh import shard_batch
from ..train.step import make_batch_preprocessor, make_eval_step
from ..utils.logger import AverageMeter, print_name_value


def parse_args(description: str, teacher: bool = False):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--cfg", required=True, help="experiment config file")
    if teacher:
        parser.add_argument("--tcfg", required=True,
                            help="teacher experiment config file")
    parser.add_argument("--modelDir", default="", type=str)
    parser.add_argument("--logDir", default="", type=str)
    parser.add_argument("--dataDir", default="", type=str)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="config overrides: KEY VALUE [KEY VALUE ...]")
    return parser.parse_args()


def load_cfg_from_args(args, cfg_attr="cfg"):
    return load_config(getattr(args, cfg_attr), opts=args.opts,
                       model_dir=args.modelDir, log_dir=args.logDir,
                       data_dir=args.dataDir)


def build_loaders(cfg, n_devices: int, synthetic_dir: str | None = None,
                  train: bool = True):
    """(train_loader, val_loader, meta).  synthetic_dir swaps in the
    hermetic synthetic db (for smoke runs without real data)."""
    meta = dataset_meta(cfg.DATASET.DATASET)

    if synthetic_dir is not None:
        from ..data import make_synthetic_db
        db_train = make_synthetic_db(
            synthetic_dir, 64, meta["num_joints"],
            (cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]))
        db_val = db_train[:32]
    else:
        db_train = build_db(cfg, cfg.DATASET.TRAIN_SET, True) if train else []
        db_val = build_db(cfg, cfg.DATASET.TEST_SET, False)

    train_loader = None
    if train:
        import jax
        seed = int(cfg.TRAIN.get("SEED", 0))
        src = PoseDataSource(cfg, db_train, is_train=True,
                             flip_pairs=meta["flip_pairs"],
                             upper_body_ids=meta["upper_body_ids"],
                             joints_weight=meta["joints_weight"],
                             seed=seed)
        # batch_size is GLOBAL; under multi-host each process yields its
        # own slice of every global batch (loader process sharding).
        train_loader = BatchLoader(
            src, batch_size=cfg.TRAIN.BATCH_SIZE_PER_GPU * n_devices,
            shuffle=cfg.TRAIN.SHUFFLE, drop_last=True,
            host_targets=not cfg.TPU.DEVICE_PREPROCESS,
            num_threads=max(2, cfg.WORKERS),
            seed=seed,
            process_index=jax.process_index(),
            process_count=jax.process_count())

    val_src = PoseDataSource(cfg, db_val, is_train=False,
                             flip_pairs=meta["flip_pairs"],
                             upper_body_ids=meta["upper_body_ids"],
                             joints_weight=meta["joints_weight"])
    # Validation runs on process 0's LOCAL devices (multihost_eval_setup),
    # so size the eval batch by the local device count — a global-sized
    # batch would scale per-device eval memory/time with process_count.
    import jax
    n_val_devices = (min(n_devices, len(jax.local_devices()))
                     if jax.process_count() > 1 else n_devices)
    val_loader = BatchLoader(
        val_src, batch_size=cfg.TEST.BATCH_SIZE_PER_GPU * n_val_devices,
        shuffle=False, drop_last=False,
        host_targets=not cfg.TPU.DEVICE_PREPROCESS,
        num_threads=max(2, cfg.WORKERS))
    return train_loader, val_loader, meta


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def multihost_eval_setup(mesh, variables):
    """(eval_mesh, eval_variables, run_eval) for validation.

    Single-process: unchanged.  Multi-host: validation runs on process 0
    over its LOCAL devices only (the eval pass needs no cross-host
    collectives; the val loader is not process-sharded), with variables
    pulled to host so the local-mesh jit can place them freely.
    """
    import jax
    if jax.process_count() == 1:
        return mesh, variables, True
    from ..parallel.mesh import get_local_mesh, replicated
    if not is_main_process():
        return mesh, variables, False
    # Pull to host (frees the global-mesh placement), then commit ONCE to
    # the local mesh: leaving numpy leaves would re-upload the full model
    # on every eval batch (numpy args are transferred per jitted call).
    local_mesh = get_local_mesh()
    host_vars = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    dev_vars = jax.device_put(host_vars, replicated(local_mesh))
    return local_mesh, dev_vars, True


def train_batch_keys(cfg):
    """Minimal host->device transfer set for a train step."""
    if cfg.TPU.get("DEVICE_WARP", False):
        return ["canvas", "warp_inv", "joints", "joints_vis"]
    keys = ["image"]
    if cfg.TPU.DEVICE_PREPROCESS:
        keys += ["joints", "joints_vis"]
    else:
        keys += ["target", "target_weight"]
    return keys


def eval_batch_transform(cfg):
    """Host batch -> device dict for the eval step (adds inverse affines).

    Eval always ships host-warped images (bit-parity with the reference),
    even when TPU.DEVICE_WARP accelerates training batches.
    """
    keys = ["image"]
    if cfg.TPU.DEVICE_PREPROCESS:
        keys += ["joints", "joints_vis"]
    else:
        keys += ["target", "target_weight"]
    hm_size = tuple(cfg.MODEL.HEATMAP_SIZE)

    def tf(batch):
        dev = {k: batch[k] for k in keys}
        dev["inv_trans"] = make_inverse_transforms(batch["center"],
                                                   batch["scale"], hm_size)
        dev["valid"] = batch["valid"].astype("float32")
        return dev

    return tf


def device_batch(cfg, batch, mesh, for_eval=False):
    """Host batch dict -> device arrays (sharded), minimal transfer set."""
    if for_eval:
        return shard_batch(mesh, eval_batch_transform(cfg)(batch))
    return shard_batch(mesh, {k: jnp.asarray(batch[k])
                              for k in train_batch_keys(cfg)})


# make_eval_step builds a fresh shard_map+jit closure; without memoization
# every validate() call (each EVAL_FREQ epochs) re-traces and re-compiles
# the whole eval graph — the train step is built once, the eval step must
# be too.  Keyed on the identities that change the traced program; LRU-
# bounded so long test sessions creating many models don't pin compiled
# executables forever.
_EVAL_STEP_CACHE: OrderedDict = OrderedDict()
_EVAL_STEP_CACHE_MAX = 8


def _cached_eval_step(model, cfg, mesh, multi_output, perm, prepare, debug):
    key = (id(model), id(cfg), mesh, multi_output,
           prepare is not None, debug)
    step = _EVAL_STEP_CACHE.get(key)
    if step is None:
        step = make_eval_step(model, cfg, mesh, multi_output,
                              flip_perm=perm, prepare=prepare,
                              debug_outputs=debug)
        _EVAL_STEP_CACHE[key] = step
        while len(_EVAL_STEP_CACHE) > _EVAL_STEP_CACHE_MAX:
            _EVAL_STEP_CACHE.popitem(last=False)
    else:
        _EVAL_STEP_CACHE.move_to_end(key)
    return step


def validate(cfg, model, variables, val_loader, mesh, meta, logger,
             multi_output: bool, evaluate_fn=None, output_dir: str = "",
             writer=None, global_step: int = 0, watchdog=None):
    """Full validation pass (reference function.py:189-332).

    With ``writer`` set, mirrors the reference's TB surface (valid_loss /
    valid_acc scalars + the name_values dict, function.py:304-330) and
    additionally logs the DEBUG-gated image grids as TB images.
    Returns (perf_indicator, name_values, all_preds, all_boxes, img_paths).
    """
    perm = flip_pair_permutation(meta["num_joints"], meta["flip_pairs"])
    prepare = (make_batch_preprocessor(cfg, meta["joints_weight"])
               if cfg.TPU.DEVICE_PREPROCESS else None)
    debug = bool(cfg.DEBUG.DEBUG and output_dir)
    eval_step = _cached_eval_step(model, cfg, mesh, multi_output,
                                  perm, prepare, debug)

    num_samples = len(val_loader.source)
    num_joints = meta["num_joints"]
    all_preds = np.zeros((num_samples, num_joints, 3), np.float32)
    all_boxes = np.zeros((num_samples, 6))
    img_paths = []
    losses, accs = AverageMeter(), AverageMeter()
    hits_total = np.zeros(num_joints)
    valids_total = np.zeros(num_joints)
    idx = 0
    t0 = time.time()
    n_batches = len(val_loader)
    from ..parallel.mesh import prefetch_to_device
    for i, (dev, batch) in enumerate(prefetch_to_device(
            iter(val_loader), mesh, transform=eval_batch_transform(cfg))):
        out = eval_step(variables, dev)
        valid = batch["valid"]
        n = int(valid.sum())
        preds = np.asarray(out["preds"])[:n]
        maxvals = np.asarray(out["maxvals"])[:n]

        all_preds[idx:idx + n, :, 0:2] = preds
        all_preds[idx:idx + n, :, 2] = maxvals
        c, s = batch["center"][:n], batch["scale"][:n]
        all_boxes[idx:idx + n, 0:2] = c
        all_boxes[idx:idx + n, 2:4] = s
        all_boxes[idx:idx + n, 4] = np.prod(s * 200, 1)
        all_boxes[idx:idx + n, 5] = batch["score"][:n]
        img_paths.extend(batch["image_path"][:n])

        losses.update(float(out["loss"]), n)
        hits, valids = np.asarray(out["hits"]), np.asarray(out["valids"])
        hits_total += hits
        valids_total += valids
        # macro PCK per batch (reference accuracy(): mean of per-joint
        # accuracies over joints with valid samples, evaluate.py:62-68),
        # meter weighted by the counted-joint number (function.py:253)
        has = valids > 0
        batch_acc = float((hits[has] / valids[has]).mean()) if has.any() else 0.0
        accs.update(batch_acc, max(int(has.sum()), 1))
        idx += n
        if watchdog is not None:
            watchdog.beat()

        if i % cfg.PRINT_FREQ == 0:
            if logger:
                logger.info(
                    f"Test: [{i}/{n_batches}]\t"
                    f"Loss {losses.val:.4f} ({losses.avg:.4f})\t"
                    f"Accuracy {accs.val:.3f} ({accs.avg:.3f})")
            if debug:
                # reference function.py:286-289: val-batch image dumps
                import os
                from ..utils.vis import save_debug_images, tb_log_images
                save_debug_images(
                    cfg, batch["image"], batch["joints"],
                    batch["joints_vis"][..., None],
                    np.asarray(out["target"]), np.asarray(out["output"]),
                    os.path.join(output_dir, f"val_{i}"))
                if i == 0:
                    tb_log_images(
                        writer, "valid", cfg, batch["image"],
                        batch["joints"], batch["joints_vis"][..., None],
                        np.asarray(out["target"]),
                        np.asarray(out["output"]), global_step)

    has = valids_total > 0
    overall_acc = (float((hits_total[has] / valids_total[has]).mean())
                   if has.any() else 0.0)
    if logger:
        logger.info(
            f"Test: loss {losses.avg:.4f}  acc {accs.avg:.3f}  "
            f"(overall PCK {overall_acc:.3f}, "
            f"{num_samples / max(time.time() - t0, 1e-9):.1f} samples/s)")
    if writer is not None:
        # reference function.py:304-316
        writer.add_scalar("valid_loss", losses.avg, global_step)
        writer.add_scalar("valid_acc", accs.avg, global_step)

    if evaluate_fn is None:
        return overall_acc, {}, all_preds, all_boxes, img_paths

    # Dataset evaluation is host-only (PCKh / OKS-NMS / COCO AP) and can
    # legitimately run long on real annotation sets: suspend the stall
    # watchdog across it, re-arm once back on the device path.
    if watchdog is not None:
        watchdog.disarm()
    name_values, perf = evaluate_fn(cfg, all_preds, output_dir, all_boxes,
                                    img_paths)
    if watchdog is not None:
        watchdog.beat()
    if logger:
        if isinstance(name_values, list):
            for nv in name_values:
                print_name_value(logger, nv, cfg.MODEL.NAME)
        else:
            print_name_value(logger, name_values, cfg.MODEL.NAME)
    if writer is not None:
        # reference function.py:317-329
        nvs = name_values if isinstance(name_values, list) else [name_values]
        for nv in nvs:
            writer.add_scalars("valid", {k: float(v) for k, v in dict(nv).items()},
                               global_step)
    return perf, name_values, all_preds, all_boxes, img_paths


def make_evaluate_fn(cfg):
    """Dataset-dispatch for the final metric computation."""
    name = cfg.DATASET.DATASET
    if name == "synthetic":
        return None  # perf = in-training PCK proxy
    if name == "mpii":
        from ..data import mpii

        def fn(cfg, preds, output_dir, all_boxes, img_paths):
            return mpii.evaluate(cfg, preds, output_dir or None)
        return fn
    if name == "coco":
        from ..data import coco as coco_data
        from ..data.coco import CocoIndex, rescore_and_nms, write_results_json
        from ..eval.coco_eval import CocoKeypointEval
        import os
        from collections import OrderedDict

        def fn(cfg, preds, output_dir, all_boxes, img_paths):
            nmsed = rescore_and_nms(
                preds, all_boxes, img_paths,
                num_joints=coco_data.NUM_JOINTS,
                in_vis_thre=cfg.TEST.IN_VIS_THRE,
                oks_thre=cfg.TEST.OKS_THRE, soft=cfg.TEST.SOFT_NMS)
            res_file = os.path.join(
                output_dir or ".", "results",
                f"keypoints_{cfg.DATASET.TEST_SET}_results_{cfg.RANK}.json")
            results = write_results_json(nmsed, res_file)
            if "test" in cfg.DATASET.TEST_SET:
                return OrderedDict([("Null", 0.0)]), 0.0
            ann = os.path.join(cfg.DATASET.ROOT, "annotations",
                               f"person_keypoints_{cfg.DATASET.TEST_SET}.json")
            ev = CocoKeypointEval(CocoIndex(ann))
            info = ev.evaluate(results)
            nv = OrderedDict(info)
            return nv, nv["AP"]
        return fn
    raise KeyError(name)
