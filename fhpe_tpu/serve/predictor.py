"""Fixed-shape batched pose predictor for serving.

Design (TPU-first, no reference analogue — the reference stops at dataset
evaluation, ``tools/test.py`` + ``lib/core/function.py:189-332``):

* ONE jitted SPMD program per (model, global-batch) pair: uint8 crops +
  inverse affines in, source-image-coordinate keypoints out.  Static
  shapes — arbitrary request sizes are padded up to the compiled global
  batch and trimmed on the host, so XLA never re-traces in steady state.
* The whole post-network pipeline stays on device: normalize (/255,
  ImageNet mean/std), forward (bf16 by default), optional flip-test
  ensembling (input W-flip -> ``flip_back`` -> SHIFT_HEATMAP -> 0.5
  average, matching ``lib/core/function.py:218-240``), argmax decode with
  the quarter-offset refinement, and the affine map back to source
  coordinates.  Only (x, y, confidence) per joint is fetched.
* Multi-device serving shards the batch over a 1-D ``data`` mesh via
  ``shard_map`` — the same layout the training/eval steps use.

Typical use::

    from fhpe_tpu.serve import Predictor
    p = Predictor.from_checkpoint(cfg, "model_best.msgpack")
    p.warmup()                                   # compile ahead of traffic
    kpts = p.predict(frame, boxes)               # (N, J, 3) in frame coords
    # or, with pre-cropped inputs:
    preds, maxvals = p.predict_crops(crops, centers, scales)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..data import dataset_meta
from ..data.coco import xywh2cs
from ..geometry.affine import get_affine_transform
from ..geometry.flip import flip_back_jax, flip_pair_permutation
from ..utils.dtype import compute_dtype
from ..models import get_pose_net, is_multi_output
from ..ops.decode import decode_heatmaps_jax, make_inverse_transforms
from ..ops.preprocess import normalize_images_jax
from ..parallel.mesh import DATA_AXIS, batch_sharding, get_mesh, replicated


def xywh_to_center_scale(box, aspect_ratio: float, pixel_std: float = 200.0):
    """Person box (x, y, w, h) -> (center, scale) crop parametrization.

    Thin wrapper over the COCO loader's :func:`fhpe_tpu.data.coco.xywh2cs`
    (``lib/dataset/coco.py:112-134`` semantics) so the box->crop logic has
    exactly one implementation.
    """
    x, y, w, h = [float(v) for v in box]
    return xywh2cs(x, y, w, h, aspect_ratio, pixel_std)


class Predictor:
    """Compiled fixed-shape pose inference over a device mesh.

    Parameters
    ----------
    cfg : the experiment config (defines model, input/heatmap sizes, and
        the TEST.* inference options honored here: FLIP_TEST,
        SHIFT_HEATMAP, POST_PROCESS).
    variables : flax variable tree ({"params", "batch_stats"}).  Host
        (numpy) leaves are committed to device once, replicated.
    batch_size : compiled GLOBAL batch.  Requests of any size run in
        padded chunks of this.  Default TEST.BATCH_SIZE_PER_GPU * devices.
    n_devices : mesh size (default cfg.TPU.NUM_DEVICES, else all local).
    """

    def __init__(self, cfg, variables, batch_size: Optional[int] = None,
                 n_devices: Optional[int] = None,
                 flip_pairs: Optional[Sequence] = None):
        self.cfg = cfg
        if n_devices is None:
            n_devices = (cfg.TPU.NUM_DEVICES if cfg.TPU.NUM_DEVICES > 0
                         else len(jax.devices()))
        self.mesh = get_mesh(n_devices)
        self.batch_size = int(batch_size or
                              cfg.TEST.BATCH_SIZE_PER_GPU * n_devices)
        if self.batch_size % n_devices:
            raise ValueError(
                f"batch_size {self.batch_size} must divide over "
                f"{n_devices} devices")
        dtype = compute_dtype(cfg)
        self.model = get_pose_net(cfg, dtype=dtype)
        self._multi = is_multi_output(self.model)
        # Commit once, replicated: numpy leaves would re-upload the whole
        # model on every request (numpy args transfer per jitted call).
        self.variables = jax.device_put(
            jax.tree_util.tree_map(np.asarray, variables),
            replicated(self.mesh))

        self.image_size = tuple(int(v) for v in cfg.MODEL.IMAGE_SIZE)  # (W,H)
        self.heatmap_size = tuple(int(v) for v in cfg.MODEL.HEATMAP_SIZE)
        self.aspect_ratio = self.image_size[0] / self.image_size[1]

        flip_test = bool(cfg.TEST.FLIP_TEST)
        perm = None
        if flip_test:
            num_joints = int(cfg.MODEL.NUM_JOINTS)
            if flip_pairs is None:
                meta = dataset_meta(cfg.DATASET.DATASET)
                if meta["num_joints"] != num_joints:
                    raise ValueError(
                        f"MODEL.NUM_JOINTS={num_joints} != dataset "
                        f"'{cfg.DATASET.DATASET}' joint count "
                        f"{meta['num_joints']}; pass flip_pairs= explicitly "
                        f"for non-registry joint layouts")
                flip_pairs = meta["flip_pairs"]
            perm = jnp.asarray(flip_pair_permutation(num_joints, flip_pairs))
        shift = bool(cfg.TEST.SHIFT_HEATMAP)
        post = bool(cfg.TEST.POST_PROCESS)
        model, multi = self.model, self._multi

        def fwd(variables, images):
            out = model.apply(variables, images, train=False)
            return out[-1] if multi else out

        def step(variables, batch):
            x = normalize_images_jax(batch["image"])
            hm = fwd(variables, x)
            if flip_test:
                hm_f = fwd(variables, x[:, :, ::-1, :])
                hm_f = flip_back_jax(hm_f, perm)
                if shift:
                    hm_f = jnp.concatenate(
                        [hm_f[:, :, :1, :], hm_f[:, :, :-1, :]], axis=2)
                hm = (hm + hm_f) * 0.5
            preds, maxvals = decode_heatmaps_jax(hm, batch["inv_trans"], post)
            return {"preds": preds, "maxvals": maxvals}

        self._step = jax.jit(shard_map(
            step, mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs={"preds": P(DATA_AXIS), "maxvals": P(DATA_AXIS)},
            check_vma=False,
        ))
        self._sharding = batch_sharding(self.mesh)
        # chunks allowed in flight before results are drained (2 = classic
        # double buffering; each holds one padded global batch on device)
        self.max_in_flight = 2

    # -- construction ------------------------------------------------

    @classmethod
    def from_checkpoint(cls, cfg, model_file: str, **kw) -> "Predictor":
        """Build from a saved weight file (msgpack state dict)."""
        from flax import serialization
        from ..utils.checkpoint import load_model_weights
        dtype = compute_dtype(cfg)
        model = get_pose_net(cfg, dtype=dtype)
        sample = jnp.zeros((1, cfg.MODEL.IMAGE_SIZE[1],
                            cfg.MODEL.IMAGE_SIZE[0], 3))
        init_vars = model.init(jax.random.PRNGKey(0), sample, train=False)
        variables = serialization.from_state_dict(
            init_vars, load_model_weights(model_file))
        return cls(cfg, variables, **kw)

    # -- inference ---------------------------------------------------

    def warmup(self) -> None:
        """Compile (and prime the executable cache) before traffic."""
        b = self.batch_size
        w, h = self.image_size
        batch = {
            "image": jnp.zeros((b, h, w, 3), jnp.uint8),
            "inv_trans": jnp.zeros((b, 2, 3), jnp.float32),
        }
        out = self._step(self.variables, jax.device_put(batch,
                                                        self._sharding))
        jax.block_until_ready(out)

    def predict_crops(self, crops, centers, scales):
        """Model-input-sized uint8 crops -> keypoints in source coords.

        crops: (N, H, W, 3) uint8 (H, W = MODEL.IMAGE_SIZE);
        centers/scales: (N, 2) crop parametrization (the affine that
        produced each crop).  Returns (preds (N, J, 2), maxvals (N, J))
        as numpy, in the source-image coordinate frame.
        """
        crops = np.asarray(crops)
        if crops.dtype != np.uint8:
            raise ValueError(
                f"crops must be uint8 in [0, 255]; got dtype {crops.dtype} "
                f"(float crops are NOT rescaled — convert explicitly, e.g. "
                f"np.clip(x * 255, 0, 255).astype(np.uint8))")
        crops = np.ascontiguousarray(crops)
        n = crops.shape[0]
        if crops.shape[1] != self.image_size[1] or \
                crops.shape[2] != self.image_size[0]:
            raise ValueError(
                f"crops must be (N, {self.image_size[1]}, "
                f"{self.image_size[0]}, 3); got {crops.shape}")
        inv = make_inverse_transforms(np.asarray(centers),
                                      np.asarray(scales),
                                      self.heatmap_size).astype(np.float32)
        b = self.batch_size

        def prep(lo):
            """Host pad + H2D of one chunk (runs on the prefetch thread)."""
            hi = min(lo + b, n)
            pad = b - (hi - lo)
            img = crops[lo:hi]
            itr = inv[lo:hi]
            if pad:
                img = np.concatenate(
                    [img, np.zeros((pad,) + img.shape[1:], img.dtype)])
                itr = np.concatenate(
                    [itr, np.zeros((pad, 2, 3), itr.dtype)])
            dev = jax.device_put({"image": jnp.asarray(img),
                                  "inv_trans": jnp.asarray(itr)},
                                 self._sharding)
            return hi - lo, dev

        # Double-buffered pipeline: while the device computes chunk k, the
        # prefetch thread pads + uploads chunk k+1 and the main thread
        # drains chunk k-1's results, so host prep / H2D / compute / D2H
        # overlap instead of running strictly serially (round-3 measured
        # the serial loop at <20% of device-step throughput).
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        preds_out, vals_out = [], []
        pending = deque()

        def drain_one():
            cnt, out = pending.popleft()
            preds_out.append(np.asarray(out["preds"])[:cnt])
            vals_out.append(np.asarray(out["maxvals"])[:cnt])

        with ThreadPoolExecutor(max_workers=1) as ex:
            nxt = ex.submit(prep, 0)
            for lo in range(0, n, b):
                cnt, dev = nxt.result()
                if lo + b < n:
                    nxt = ex.submit(prep, lo + b)
                pending.append((cnt, self._step(self.variables, dev)))
                while len(pending) > self.max_in_flight:
                    drain_one()
            while pending:
                drain_one()
        return np.concatenate(preds_out), np.concatenate(vals_out)

    def crop(self, image: np.ndarray, center, scale) -> np.ndarray:
        """Host affine crop of ``image`` to the model input size.

        Uses the bit-parity warp path (native C++ when TPU.NATIVE_WARP,
        else cv2) — identical pixels to the evaluation loader.
        """
        trans = get_affine_transform(np.asarray(center, np.float64),
                                     np.asarray(scale, np.float64),
                                     0, self.image_size)
        if self.cfg.TPU.get("NATIVE_WARP", False):
            from ..ops import native_image
            return native_image.warp_affine_native(image, trans,
                                                   self.image_size)
        import cv2
        return np.ascontiguousarray(cv2.warpAffine(
            image, trans, self.image_size, flags=cv2.INTER_LINEAR))

    def predict(self, image: np.ndarray, boxes: Sequence) -> np.ndarray:
        """Full-frame entry: person boxes -> keypoints.

        image: (H, W, 3) uint8 frame (RGB if the model was trained with
        DATASET.COLOR_RGB, the loader convention).  boxes: sequence of
        (x, y, w, h) person boxes.  Returns (N, J, 3) numpy — x, y in
        frame coordinates plus per-joint confidence.
        """
        if len(boxes) == 0:
            return np.zeros((0, int(self.cfg.MODEL.NUM_JOINTS), 3),
                            np.float32)
        centers, scales, crops = [], [], []
        for box in boxes:
            c, s = xywh_to_center_scale(box, self.aspect_ratio)
            centers.append(c)
            scales.append(s)
            crops.append(self.crop(image, c, s))
        preds, maxvals = self.predict_crops(
            np.stack(crops), np.stack(centers), np.stack(scales))
        return np.concatenate([preds, maxvals[..., None]],
                              axis=-1).astype(np.float32)
