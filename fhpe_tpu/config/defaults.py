"""Default config schema.

Key names, nesting, and default values follow the reference schema
(``lib/config/default.py:18-134`` and ``lib/config/models.py:15-58``) so that
the reference's ``experiments/**.yaml`` files load unchanged.  Keys the
reference uses to control CUDA/cuDNN are kept (accepted, ignored) for YAML
compatibility; TPU-specific knobs live under the new ``TPU`` section.

Conventions preserved from the reference:
* ``MODEL.IMAGE_SIZE`` / ``HEATMAP_SIZE`` are ``[width, height]``
  (``lib/config/default.py:44-45``).
* ``KD.TRAIN_TYPE`` in {'NORMAL', 'FPD'}; ``KD.ALPHA`` is the distillation
  mixing weight (``lib/config/default.py:123-126``).
"""

from __future__ import annotations

import os

from .node import CfgNode


def _base() -> CfgNode:
    c = CfgNode()

    c.OUTPUT_DIR = ""
    c.LOG_DIR = ""
    c.DATA_DIR = ""
    c.GPUS = (0,)  # accepted for YAML compat; device count comes from jax.devices()
    c.WORKERS = 4
    c.PRINT_FREQ = 20
    c.AUTO_RESUME = False
    c.PIN_MEMORY = True
    c.RANK = 0

    # Accepted-and-ignored CUDA knobs (reference lib/config/default.py:31-34).
    c.CUDNN = CfgNode()
    c.CUDNN.BENCHMARK = True
    c.CUDNN.DETERMINISTIC = False
    c.CUDNN.ENABLED = True

    # TPU-native knobs (new).
    c.TPU = CfgNode()
    c.TPU.COMPUTE_DTYPE = "bfloat16"  # MXU-native compute; params stay f32
    c.TPU.MESH_AXIS = "data"          # 1-D data-parallel mesh axis name
    c.TPU.NUM_DEVICES = -1            # -1 = use all visible devices
    c.TPU.DONATE = True               # donate train-state buffers to the step
    c.TPU.DEVICE_PREPROCESS = True    # fused on-device normalize + target gen
    # Opt-in: move the affine crop/rotate/flip warp itself on device too.
    # The host then ships fixed-size letterboxed canvases (uint8) plus
    # composed output->canvas affines, and the step warps with the batched
    # bilinear kernel (ops/preprocess.warp_affine_jax).  Trades bit-parity
    # with the reference's cv2 warp (one extra resampling through the
    # canvas) for a host pipeline that only decodes + resizes.
    c.TPU.DEVICE_WARP = False
    c.TPU.CANVAS_SIZE = [512, 512]    # width, height of the letterbox canvas
    # BatchNorm running stats under data parallelism: "device0" keeps the
    # master replica's stats (nn.DataParallel-faithful); "mean" averages
    # across devices (statistically nicer).
    c.TPU.BN_STATS = "device0"
    # Decoded-image RAM cache budget (MB, 0 = off).  JPEG decode dominates
    # the host pipeline (~3-5 ms/sample vs ~0.3 ms for the warp); with a
    # budget the loader keeps decoded images (train; augmentation stays
    # random) and finished eval samples in RAM from epoch 2 onward.
    # The budget is PROCESS-GLOBAL: train images, their cached flipped
    # copies (2x per image with DATASET.FLIP), and eval samples all share
    # it.  Size to the decoded bytes actually cached (synthetic soak:
    # 2048x256x256x3 = 400 MB decoded, ~2x that with flips + eval split;
    # full MPII does not fit - leave 0 there unless RAM allows ~140 GB).
    c.TPU.DECODE_CACHE_MB = 0
    # Opt-in (hourglass): drop the conv biases that a downstream BatchNorm
    # absorbs exactly (all but the score heads' in the pre-activation
    # topology) — equivalent training dynamics, fewer bias-grad reduce
    # passes in the backward.  Checkpoints taken under the knob are
    # self-consistent but not interchangeable with the default tree.
    c.TPU.DEAD_BIAS_SKIP = False
    # Opt-in: native C++ host image path (ops/cpp/imagedec.cpp via
    # ops/native_image.py).  NATIVE_DECODE decodes JPEGs with libjpeg
    # directly (bit-identical to cv2.imread, no Python/cv2 overhead);
    # NATIVE_WARP runs the affine crop in C++ (cv2-5 warpAffine float-
    # engine parity; ±1 at exact rounding ties, ~1 per million pixels)
    # and reads flipped samples through a mirrored-tap mode instead of
    # materializing img[:, ::-1] copies.  Both fall back to cv2 when the
    # library cannot be built.
    c.TPU.NATIVE_DECODE = False
    c.TPU.NATIVE_WARP = False
    # DEPRECATED no-op (removed round 4: in-loop fused-eval measured 14x
    # slower than the jitted eval step, docs/BENCH_NOTES.md).  Kept so
    # configs saved by older runs (output/**/config.yaml) still merge;
    # load_config warns if set true.
    c.TPU.FUSED_EVAL = False
    # Stall watchdog (utils/watchdog.py): if the train/eval loop makes no
    # progress for this many seconds (e.g. the TPU transport drops and a
    # device fetch blocks forever), dump stacks, flush pending host-side
    # checkpoint writes, and force-exit 86 so a supervisor can restart the
    # run (AUTO_RESUME restores the last rolling checkpoint).  0 = off.
    # Armed only after the first completed step, so cold-cache XLA
    # compilation does not count; set comfortably above one eval pass.
    c.TPU.STALL_TIMEOUT_S = 0

    c.MODEL = CfgNode()
    c.MODEL.NAME = "pose_hrnet"
    c.MODEL.INIT_WEIGHTS = True
    c.MODEL.PRETRAINED = ""
    c.MODEL.NUM_JOINTS = 17
    c.MODEL.TAG_PER_JOINT = True
    c.MODEL.TARGET_TYPE = "gaussian"
    c.MODEL.IMAGE_SIZE = [256, 256]  # width, height
    c.MODEL.HEATMAP_SIZE = [64, 64]  # width, height
    c.MODEL.SIGMA = 2
    c.MODEL.EXTRA = CfgNode(new_allowed=True)

    c.LOSS = CfgNode()
    c.LOSS.USE_OHKM = False
    c.LOSS.TOPK = 8
    c.LOSS.USE_TARGET_WEIGHT = True
    c.LOSS.USE_DIFFERENT_JOINTS_WEIGHT = False

    c.DATASET = CfgNode()
    c.DATASET.ROOT = ""
    c.DATASET.DATASET = "mpii"
    c.DATASET.TRAIN_SET = "train"
    c.DATASET.TEST_SET = "valid"
    c.DATASET.DATA_FORMAT = "jpg"
    c.DATASET.HYBRID_JOINTS_TYPE = ""
    c.DATASET.SELECT_DATA = False
    c.DATASET.FLIP = True
    c.DATASET.SCALE_FACTOR = 0.25
    c.DATASET.ROT_FACTOR = 30
    c.DATASET.PROB_HALF_BODY = 0.0
    c.DATASET.NUM_JOINTS_HALF_BODY = 8
    c.DATASET.COLOR_RGB = False
    c.DATASET.CACHE_ROOT = "data/cache"
    # TPU-build extension: synthetic-dataset train size (val = half);
    # lets hermetic convergence soaks scale past the 64-sample smoke db.
    c.DATASET.SYNTH_SIZE = 64
    # Overfit-proof mode: the synthetic VAL db is the exact TRAIN db, so
    # "val PCK" measures the memorization ceiling (a loss/target/decode/LR
    # bug caps it; a correct pipeline must saturate it).
    c.DATASET.SYNTH_OVERFIT = False

    c.TRAIN = CfgNode()
    c.TRAIN.LR_FACTOR = 0.1
    c.TRAIN.LR_STEP = [90, 110]
    c.TRAIN.LR = 0.001
    c.TRAIN.OPTIMIZER = "adam"
    c.TRAIN.MOMENTUM = 0.9
    c.TRAIN.WD = 0.0001
    c.TRAIN.NESTEROV = False
    c.TRAIN.GAMMA1 = 0.99
    c.TRAIN.GAMMA2 = 0.0
    c.TRAIN.BEGIN_EPOCH = 0
    c.TRAIN.END_EPOCH = 140
    c.TRAIN.RESUME = False
    c.TRAIN.CHECKPOINT = ""
    c.TRAIN.BATCH_SIZE_PER_GPU = 32
    c.TRAIN.SHUFFLE = True
    # TPU-build extension: master seed for init RNG, augmentation draws,
    # and the shuffle stream (the reference has no seed control; its runs
    # are CUDA-nondeterministic).  Runs with equal SEED are bit-reproducible
    # end-to-end; vary it for independent replicas (e.g. A/B repeats).
    c.TRAIN.SEED = 0
    # TPU-build extension: validate every N epochs (1 = reference
    # behavior).  Long synthetic soaks with tiny epochs waste most of
    # their wall-clock on per-epoch validation otherwise; checkpoints are
    # written on eval epochs (and always on the final epoch).
    c.TRAIN.EVAL_FREQ = 1
    # Checkpoint every N-th eval epoch (1 = reference behavior: every
    # eval).  The checkpoint's device->host state snapshot is expensive on
    # remote-attached TPUs (~75 s through this box's relay for a 3.3M-param
    # state); soaks with tiny epochs can spend most wall-clock there.
    # >1 trades best-model granularity for speed (final epoch always saved).
    c.TRAIN.CKPT_FREQ = 1

    c.TEST = CfgNode()
    c.TEST.BATCH_SIZE_PER_GPU = 32
    c.TEST.FLIP_TEST = False
    c.TEST.POST_PROCESS = False
    c.TEST.SHIFT_HEATMAP = False
    c.TEST.USE_GT_BBOX = False
    c.TEST.IMAGE_THRE = 0.1
    c.TEST.NMS_THRE = 0.6
    c.TEST.SOFT_NMS = False
    c.TEST.OKS_THRE = 0.5
    c.TEST.IN_VIS_THRE = 0.0
    c.TEST.COCO_BBOX_FILE = ""
    c.TEST.BBOX_THRE = 1.0
    c.TEST.MODEL_FILE = ""

    c.KD = CfgNode()
    c.KD.TRAIN_TYPE = "NORMAL"  # 'FPD' enables teacher->student distillation
    c.KD.TEACHER = ""
    c.KD.ALPHA = 0.5

    c.DEBUG = CfgNode()
    c.DEBUG.DEBUG = False
    c.DEBUG.SAVE_BATCH_IMAGES_GT = False
    c.DEBUG.SAVE_BATCH_IMAGES_PRED = False
    c.DEBUG.SAVE_HEATMAPS_GT = False
    c.DEBUG.SAVE_HEATMAPS_PRED = False

    return c


# Per-architecture EXTRA defaults (reference lib/config/models.py:55-58).
def _pose_resnet_extra() -> CfgNode:
    e = CfgNode(new_allowed=True)
    e.NUM_LAYERS = 50
    e.DECONV_WITH_BIAS = False
    e.NUM_DECONV_LAYERS = 3
    e.NUM_DECONV_FILTERS = [256, 256, 256]
    e.NUM_DECONV_KERNELS = [4, 4, 4]
    e.FINAL_CONV_KERNEL = 1
    e.PRETRAINED_LAYERS = ["*"]
    return e


def _pose_hrnet_extra() -> CfgNode:
    e = CfgNode(new_allowed=True)
    e.PRETRAINED_LAYERS = ["*"]
    e.STEM_INPLANES = 64
    e.FINAL_CONV_KERNEL = 1
    for name, (branches, channels) in {
        "STAGE2": (2, [32, 64]),
        "STAGE3": (3, [32, 64, 128]),
        "STAGE4": (4, [32, 64, 128, 256]),
    }.items():
        s = CfgNode()
        s.NUM_MODULES = 1
        s.NUM_BRANCHES = branches
        s.NUM_BLOCKS = [4] * branches
        s.NUM_CHANNELS = channels
        s.BLOCK = "BASIC"
        s.FUSE_METHOD = "SUM"
        e[name] = s
    return e


def _hourglass_extra() -> CfgNode:
    e = CfgNode(new_allowed=True)
    e.NUM_FEATURES = 256
    e.NUM_STACKS = 8
    e.NUM_BLOCKS = 1
    return e


MODEL_EXTRAS = {
    "pose_resnet": _pose_resnet_extra,
    "pose_hrnet": _pose_hrnet_extra,
    "pose_high_resolution_net": _pose_hrnet_extra,
    "hourglass": _hourglass_extra,
}


def get_default_config() -> CfgNode:
    return _base()


def load_config(cfg_file: str, opts: list | None = None,
                model_dir: str = "", log_dir: str = "", data_dir: str = "") -> CfgNode:
    """defaults < YAML file < CLI overrides, then path joins + freeze.

    Mirrors ``update_config`` (reference lib/config/default.py:137-164).
    """
    cfg = get_default_config()
    cfg.merge_from_file(cfg_file)
    if opts:
        cfg.merge_from_list(list(opts))

    if model_dir:
        cfg.OUTPUT_DIR = model_dir
    if log_dir:
        cfg.LOG_DIR = log_dir
    if data_dir:
        cfg.DATA_DIR = data_dir

    cfg.DATASET.ROOT = os.path.join(cfg.DATA_DIR, cfg.DATASET.ROOT)
    cfg.MODEL.PRETRAINED = os.path.join(cfg.DATA_DIR, cfg.MODEL.PRETRAINED)
    if cfg.TEST.MODEL_FILE:
        cfg.TEST.MODEL_FILE = os.path.join(cfg.DATA_DIR, cfg.TEST.MODEL_FILE)

    if cfg.TPU.FUSED_EVAL:
        import warnings
        warnings.warn("TPU.FUSED_EVAL is deprecated and ignored (removed "
                      "round 4: measured 14x slower than the jitted eval "
                      "step)", stacklevel=2)

    # DEVICE_WARP ships canvases + affines and relies on the on-device
    # preprocessor to warp/normalize/stamp targets; without it the step
    # has neither an image nor a target (a bare KeyError deep inside
    # shard_map tracing otherwise).
    if cfg.TPU.get("DEVICE_WARP", False) and not cfg.TPU.DEVICE_PREPROCESS:
        raise ValueError(
            "TPU.DEVICE_WARP True requires TPU.DEVICE_PREPROCESS True")

    cfg.freeze()
    return cfg
