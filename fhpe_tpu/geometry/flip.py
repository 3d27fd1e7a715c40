"""Horizontal-flip utilities for images, joints, and heatmaps.

Behavioral equivalents of ``lib/utils/transforms.py:15-46`` in the reference,
written as pure functions.  ``flip_back`` additionally has a JAX version used
inside the jitted flip-test eval step (the reference round-trips through
numpy on the host every eval batch, ``lib/core/function.py:218-240``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def flip_pair_permutation(num_joints: int, matched_parts) -> np.ndarray:
    """Joint-index permutation realizing the left/right swap."""
    perm = np.arange(num_joints)
    for a, b in matched_parts:
        perm[a], perm[b] = perm[b], perm[a]
    return perm


def flip_back(output_flipped: np.ndarray, matched_parts) -> np.ndarray:
    """Un-flip heatmaps predicted on a mirrored image.

    Width-reverses the heatmaps and swaps paired joint channels
    (transforms.py:15-29).  Input: (batch, joints, height, width).
    """
    assert output_flipped.ndim == 4
    perm = flip_pair_permutation(output_flipped.shape[1], matched_parts)
    return output_flipped[:, perm, :, ::-1]


def flip_back_jax(output_flipped: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """JIT-friendly flip_back; ``perm`` from :func:`flip_pair_permutation`.

    Accepts NHWC ``(batch, height, width, joints)`` — the TPU-native layout —
    and reverses width then permutes the joint channel axis.
    """
    return output_flipped[:, :, ::-1, :][..., perm]


def fliplr_joints(joints: np.ndarray, joints_vis: np.ndarray, width: int,
                  matched_parts):
    """Mirror joint coordinates horizontally and swap left/right pairs.

    Matches transforms.py:32-46 including the ``width - x - 1`` convention and
    the final ``joints * joints_vis`` masking.  Returns new arrays.
    """
    joints = np.array(joints, copy=True)
    joints_vis = np.array(joints_vis, copy=True)
    joints[:, 0] = width - joints[:, 0] - 1
    perm = flip_pair_permutation(joints.shape[0], matched_parts)
    joints = joints[perm]
    joints_vis = joints_vis[perm]
    return joints * joints_vis, joints_vis
