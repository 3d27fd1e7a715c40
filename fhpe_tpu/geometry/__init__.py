from .affine import (
    get_affine_transform,
    affine_transform,
    crop,
    transform_preds,
    transform_preds_batch,
)
from .flip import flip_back, flip_back_jax, fliplr_joints, flip_pair_permutation
from .targets import generate_target_np, generate_target_jax

__all__ = [
    "get_affine_transform",
    "affine_transform",
    "crop",
    "transform_preds",
    "transform_preds_batch",
    "flip_back",
    "flip_back_jax",
    "fliplr_joints",
    "flip_pair_permutation",
    "generate_target_np",
    "generate_target_jax",
]
