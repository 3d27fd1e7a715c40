"""fhpe_tpu — TPU-native Fast Human Pose Estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ilovepose/fast-human-pose-estimation.pytorch`` (CVPR 2019 Fast Pose
Distillation): heatmap-based top-down 2D pose estimation with stacked
Hourglass / HRNet / PoseResNet backbones on MPII and COCO, plus FPD
teacher->student distillation — designed TPU-first (SPMD data parallelism
over a device mesh, fused on-device preprocessing, jitted train/eval steps).
"""

__version__ = "0.1.0"


def _apply_platform_override():
    """Honor ``FHPE_PLATFORM`` (e.g. ``cpu``) as a jax platform override.

    Some site configurations force-set ``jax_platforms`` at interpreter
    start (overriding the standard ``JAX_PLATFORMS`` env var), which makes
    it impossible to run the CLIs hermetically on CPU when the accelerator
    transport is down.  ``FHPE_PLATFORM`` is applied at package import —
    before any backend initialization triggered by our entry points — so
    ``FHPE_PLATFORM=cpu python -m fhpe_tpu.cli.train ...`` always works.
    """
    import os
    plat = os.environ.get("FHPE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


_apply_platform_override()


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
