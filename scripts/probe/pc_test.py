import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 64, 64, 48, 32
BT = 4
M = BT * H * W


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _kernel(x_ref, w_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[:, 1:H + 1, 1:W + 1, :] = x_ref[:]
    xp = xpad[:]
    acc = jnp.zeros((M, C), jnp.float32)
    k = 0
    for dy in range(3):
        for dx in range(3):
            t = xp[:, dy:dy + H, dx:dx + W, :].reshape(M, C)
            acc = acc + jnp.dot(t, w_ref[k],
                                preferred_element_type=jnp.float32)
            k += 1
    o_ref[:] = acc.reshape(BT, H, W, C).astype(jnp.bfloat16)


def conv_c(x, w):
    wk = w.reshape(9, C, C)
    return pl.pallas_call(
        _kernel,
        grid=(B // BT,),
        in_specs=[pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((9, C, C), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BT, H + 2, W + 2, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x, wk)


rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
w = jnp.asarray(rs.randn(3, 3, C, C) * 0.1, jnp.bfloat16)
try:
    out = conv_c(x, w)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - conv_ref(x, w))))
    print("P-C noMS OK err=", err, flush=True)
except Exception:
    tb = traceback.format_exc()
    lines = [l[:240] for l in tb.splitlines()
             if any(k in l for k in ("Mosaic", "memory", "unsupported",
                                     "tpu.", "Error"))]
    print("\n".join(lines[-6:]), flush=True)
