"""fhpe_tpu — TPU-native Fast Human Pose Estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ilovepose/fast-human-pose-estimation.pytorch`` (CVPR 2019 Fast Pose
Distillation): heatmap-based top-down 2D pose estimation with stacked
Hourglass / HRNet / PoseResNet backbones on MPII and COCO, plus FPD
teacher->student distillation — designed TPU-first (SPMD data parallelism
over a device mesh, fused on-device preprocessing, jitted train/eval steps).
"""

__version__ = "0.1.0"
