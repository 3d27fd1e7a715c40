"""Run each probe-v2 conv variant on TPU, printing full Mosaic errors."""
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts/probe")
import pallas_conv_probe2 as p2  # noqa: E402

rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(p2.B, p2.H, p2.W, p2.C), jnp.bfloat16)
w = jnp.asarray(rs.randn(3, 3, p2.C, p2.C) * 0.1, jnp.bfloat16)
ref = p2.conv_ref(x, w)

which = sys.argv[1] if len(sys.argv) > 1 else "C"
fn = {"C": p2.conv_c, "A2": p2.conv_a2, "B2": p2.conv_b2}[which]
try:
    out = fn(x, w)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"P-{which} OK err={err}")
except Exception:
    tb = traceback.format_exc()
    # print only the interesting tail
    for line in tb.splitlines():
        if any(k in line for k in ("tpu.", "vector<", "Mosaic", "unsupported",
                                   "Error", "error", "NotImplemented")):
            print(line[:300])
