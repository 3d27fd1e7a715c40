"""Pallas heatmap-decode kernel: fused argmax + quarter-pixel offset.

TPU-kernel form of the decode hot path (BASELINE.json names
``get_final_preds`` as a Pallas port target): one pass over each (sample,
joint) heatmap row computes the flat argmax (first-max tie-break, numpy
semantics), the peak value, the (x, y) split, and the +-0.25 px shift
toward the larger neighbor — bit-identical to ``ops.decode``'s
``get_max_preds_jax`` + ``quarter_offset_jax`` (pinned by tests).

Layout: heatmaps are reshaped to rows of H*W values, tiled (TILE_ROWS, HW)
into VMEM; per-row reductions run on the VPU.  The inverse-affine map back
to source coordinates stays in XLA (a tiny batched matmul).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp


def _decode_kernel(hm_ref, coords_ref, maxvals_ref, *, w: int, h: int):
    hw = w * h
    rows = hm_ref[:, :]                                  # (T, HW)
    t = rows.shape[0]

    maxv = jnp.max(rows, axis=1)                         # (T,)
    # first-max tie-break: smallest flat index among maxima
    col = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    big = jnp.where(rows == maxv[:, None], col, hw)
    idx = jnp.min(big, axis=1).astype(jnp.int32)         # (T,)

    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    mask = (maxv > 0.0).astype(jnp.float32)
    x = x * mask
    y = y * mask

    # quarter-pixel offset toward the larger neighbor (inference.py:56-69)
    px = jnp.floor(x + 0.5).astype(jnp.int32)
    py = jnp.floor(y + 0.5).astype(jnp.int32)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)
    base = pyc * w + pxc                                 # (T,)

    def take(flat_idx):
        sel = col == flat_idx[:, None]
        return jnp.sum(jnp.where(sel, rows, 0.0), axis=1)

    dx = take(base + 1) - take(base - 1)
    dy = take(base + w) - take(base - w)
    okf = ok.astype(jnp.float32)
    coords_ref[:, 0] = x + jnp.sign(dx) * 0.25 * okf
    coords_ref[:, 1] = y + jnp.sign(dy) * 0.25 * okf
    maxvals_ref[:, 0] = maxv


def decode_pallas(heatmaps, tile_rows: int = 128, interpret: bool | None = None):
    """(B, H, W, J) NHWC float -> coords (B, J, 2), maxvals (B, J).

    Matches get_max_preds_jax + quarter_offset_jax exactly.
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, j = heatmaps.shape
    rows = heatmaps.transpose(0, 3, 1, 2).reshape(b * j, h * w)
    n = rows.shape[0]
    pad = (-n) % tile_rows
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, h * w), rows.dtype)], axis=0)
    total = rows.shape[0]

    kernel = functools.partial(_decode_kernel, w=w, h=h)
    coords, maxvals = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((total, 2), jnp.float32),
                   jax.ShapeDtypeStruct((total, 1), jnp.float32)),
        grid=(total // tile_rows,),
        in_specs=[pl.BlockSpec((tile_rows, h * w), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((tile_rows, 2), lambda i: (i, 0)),
                   pl.BlockSpec((tile_rows, 1), lambda i: (i, 0))),
        interpret=interpret,
    )(rows.astype(jnp.float32))

    coords = coords[:n].reshape(b, j, 2)
    maxvals = maxvals[:n, 0].reshape(b, j)
    return coords, maxvals
