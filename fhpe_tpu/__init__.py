"""fhpe_tpu — TPU-native Fast Human Pose Estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ilovepose/fast-human-pose-estimation.pytorch`` (CVPR 2019 Fast Pose
Distillation): heatmap-based top-down 2D pose estimation with stacked
Hourglass / HRNet / PoseResNet backbones on MPII and COCO, plus FPD
teacher->student distillation — designed TPU-first (SPMD data parallelism
over a device mesh, fused on-device preprocessing, jitted train/eval steps).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keeps `import fhpe_tpu` dependency-light)."""
    if name in ("load_config", "get_default_config", "CfgNode"):
        from . import config
        return getattr(config, name)
    if name in ("get_pose_net", "is_multi_output"):
        from . import models
        return getattr(models, name)
    if name == "get_mesh":
        from .parallel.mesh import get_mesh
        return get_mesh
    raise AttributeError(name)
