"""On-device NMS: pairwise OKS/IoU matrices + masked greedy selection.

TPU-native equivalent of the reference's CUDA NMS (``lib/nms/nms_kernel.cu``
— a tiled pairwise-IoU bitmask kernel plus a sequential host reduction).
Here the same decomposition maps to TPU as:

* the pairwise similarity matrix — a Pallas kernel over (TILE, TILE) VMEM
  blocks (:func:`pairwise_oks_pallas`) or a plain fused-XLA expression
  (:func:`pairwise_oks_jnp`; bit-identical, used where Pallas is
  unavailable e.g. CPU tests);
* the greedy score-ordered selection — a ``lax.while_loop`` over a static
  keep mask (:func:`greedy_nms_mask`), replacing the host bitmask scan.

All shapes static: callers pad detections to a fixed N and pass a validity
mask.  Keep-lists match ``ops.nms`` (and the reference) exactly; pinned by
tests/test_native_nms.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .nms import COCO_SIGMAS

_EPS = float(np.spacing(1))


def pairwise_oks_jnp(xs, ys, areas, sigmas=None):
    """OKS matrix (N, N): oks[i, j] = similarity of det j w.r.t. det i.

    xs/ys: (N, J) keypoint coords; areas: (N,).
    Matches ops.nms.oks_iou pairwise (nms.py:75-94 formula).
    """
    sigmas = COCO_SIGMAS if sigmas is None else np.asarray(sigmas)
    variances = jnp.asarray((sigmas * 2.0) ** 2, dtype=jnp.float32)
    dx = xs[None, :, :] - xs[:, None, :]       # (N, N, J)
    dy = ys[None, :, :] - ys[:, None, :]
    denom = (areas[:, None] + areas[None, :]) / 2.0 + _EPS  # (N, N)
    e = (dx ** 2 + dy ** 2) / variances / denom[..., None] / 2.0
    return jnp.mean(jnp.exp(-e), axis=-1)


def pairwise_oks_pallas(xs, ys, areas, sigmas=None, tile: int = 128,
                        interpret: bool | None = None):
    """Pallas tiled OKS matrix; numerically identical to pairwise_oks_jnp.

    N must be a multiple of ``tile`` (pad with zeros; padded rows produce
    garbage similarities that the greedy mask ignores via ``valid``).

    Layout: keypoints ship transposed as (J, N) so each joint is one
    128-lane row; the joint loop is a ``fori_loop`` (a Python unroll keeps
    17 x several (tile, tile) f32 temporaries live simultaneously and
    spills VMEM — observed 135M of scoped-vmem spill slots on v5e).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sigmas = COCO_SIGMAS if sigmas is None else np.asarray(sigmas)
    inv_two_vars = (1.0 / (2.0 * (sigmas * 2.0) ** 2)).astype(np.float32)
    n, j = xs.shape
    assert n % tile == 0, f"pad N={n} to a multiple of {tile}"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    xs_t = jnp.transpose(xs.astype(jnp.float32))      # (J, N)
    ys_t = jnp.transpose(ys.astype(jnp.float32))
    a_row = areas.astype(jnp.float32)[None, :]        # (1, N)
    ivars = jnp.asarray(inv_two_vars)[None, :]        # (1, J)

    def kernel(iv_ref, x_i, y_i, a_i, x_j, y_j, a_j, out_ref):
        inv_denom = 1.0 / ((jnp.transpose(a_i[:, :]) + a_j[0, :][None, :])
                           / 2.0 + _EPS)              # (TI, TJ)

        def body(k, acc):
            xi = jnp.transpose(x_i[pl.ds(k, 1), :])   # (TI, 1)
            yi = jnp.transpose(y_i[pl.ds(k, 1), :])
            xj = x_j[pl.ds(k, 1), :]                  # (1, TJ)
            yj = y_j[pl.ds(k, 1), :]
            dx = xj - xi
            dy = yj - yi
            e = (dx * dx + dy * dy) * iv_ref[0, k] * inv_denom
            return acc + jnp.exp(-e)

        acc = jax.lax.fori_loop(
            0, j, body, jnp.zeros(out_ref.shape, jnp.float32))
        out_ref[:, :] = acc / float(j)

    grid = (n // tile, n // tile)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, j), lambda i, jj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((j, tile), lambda i, jj: (0, i)),
            pl.BlockSpec((j, tile), lambda i, jj: (0, i)),
            pl.BlockSpec((1, tile), lambda i, jj: (0, i)),
            pl.BlockSpec((j, tile), lambda i, jj: (0, jj)),
            pl.BlockSpec((j, tile), lambda i, jj: (0, jj)),
            pl.BlockSpec((1, tile), lambda i, jj: (0, jj)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, jj: (i, jj)),
        interpret=interpret,
    )(ivars, xs_t, ys_t, a_row, xs_t, ys_t, a_row)


def pairwise_iou_jnp(boxes):
    """Box IoU matrix with the reference's +1 pixel-area convention."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(0.0, xx2 - xx1 + 1) * jnp.maximum(0.0, yy2 - yy1 + 1)
    return inter / (areas[:, None] + areas[None, :] - inter)


@functools.partial(jax.jit, static_argnames=("use_index_tiebreak",))
def greedy_nms_mask(sim, scores, valid, thresh, use_index_tiebreak=True):
    """Greedy suppression: keep mask (N,) bool.

    sim: (N, N) similarity; scores: (N,); valid: (N,) bool.
    Matches the reference greedy: highest-score alive det is kept, all
    alive dets with sim > thresh suppressed; ties broken toward the larger
    index (numpy argsort()[::-1] convention).
    """
    n = scores.shape[0]

    def cond(state):
        alive, _ = state
        return jnp.any(alive)

    def body(state):
        alive, keep = state
        masked = jnp.where(alive, scores, -jnp.inf)
        if use_index_tiebreak:
            # numpy argsort()[::-1] puts equal scores in DECREASING index
            # order: pick the LARGEST index among maxima.
            m = jnp.max(masked)
            i = (n - 1) - jnp.argmax((masked == m)[::-1])
        else:
            i = jnp.argmax(masked)
        keep = keep.at[i].set(True)
        suppress = sim[i] > thresh
        alive = alive & ~suppress
        alive = alive.at[i].set(False)
        return alive, keep

    alive0 = valid
    keep0 = jnp.zeros((n,), bool)
    _, keep = jax.lax.while_loop(cond, body, (alive0, keep0))
    return keep


def oks_nms_device(kpts_db, thresh, sigmas=None, pad_to: int = 128,
                   use_pallas: bool = False):
    """Drop-in oks_nms with on-device matrix + greedy; returns keep list
    ordered by descending score (reference order)."""
    n = len(kpts_db)
    if n == 0:
        return []
    sigmas_arr = COCO_SIGMAS if sigmas is None else np.asarray(sigmas)
    j = len(sigmas_arr)
    total = max(pad_to, ((n + pad_to - 1) // pad_to) * pad_to)

    xs = np.zeros((total, j), np.float32)
    ys = np.zeros((total, j), np.float32)
    areas = np.ones(total, np.float32)
    scores = np.full(total, -np.inf, np.float32)
    for i, k in enumerate(kpts_db):
        kp = np.asarray(k["keypoints"], dtype=np.float64).reshape(-1)[:3 * j]
        xs[i] = kp[0::3]
        ys[i] = kp[1::3]
        areas[i] = k["area"]
        scores[i] = k["score"]
    valid = np.zeros(total, bool)
    valid[:n] = True

    if use_pallas:
        sim = pairwise_oks_pallas(jnp.asarray(xs), jnp.asarray(ys),
                                  jnp.asarray(areas), sigmas_arr)
    else:
        sim = pairwise_oks_jnp(jnp.asarray(xs), jnp.asarray(ys),
                               jnp.asarray(areas), sigmas_arr)
    keep_mask = np.asarray(greedy_nms_mask(
        sim, jnp.asarray(scores), jnp.asarray(valid), float(thresh)))
    kept = np.nonzero(keep_mask[:n])[0]
    return kept[np.argsort(-scores[kept], kind="stable")].tolist()


def box_nms_device(dets, thresh, pad_to: int = 128):
    """Drop-in box nms with on-device IoU matrix + greedy."""
    n = len(dets)
    if n == 0:
        return []
    total = max(pad_to, ((n + pad_to - 1) // pad_to) * pad_to)
    boxes = np.zeros((total, 4), np.float32)
    scores = np.full(total, -np.inf, np.float32)
    boxes[:n] = np.asarray(dets)[:, :4]
    scores[:n] = np.asarray(dets)[:, 4]
    valid = np.zeros(total, bool)
    valid[:n] = True
    sim = pairwise_iou_jnp(jnp.asarray(boxes))
    keep_mask = np.asarray(greedy_nms_mask(
        sim, jnp.asarray(scores), jnp.asarray(valid), float(thresh)))
    kept = np.nonzero(keep_mask[:n])[0]
    return kept[np.argsort(-scores[kept], kind="stable")].tolist()
