"""Compute-dtype resolution for the CLIs and the serving Predictor.

``TPU.COMPUTE_DTYPE`` picks the model compute dtype: ``bfloat16``
(MXU-native production default; params stay f32), ``float32``, or
``float64`` (parity/debug mode — used by the CLI-vs-CLI epoch-loop
rehearsal against the torch reference, where f32 rounding chaos would
swamp the comparison; see tests/test_epoch_loop_parity.py).  float64
requires the x64 flag, which must be set before arrays are created, so
resolving the dtype enables it as a side effect.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float64": jnp.float64,
}


def compute_dtype(cfg):
    """cfg -> jnp dtype; enables jax x64 when float64 is requested."""
    name = cfg.TPU.COMPUTE_DTYPE
    if name not in _DTYPES:
        raise ValueError(
            f"TPU.COMPUTE_DTYPE must be one of {sorted(_DTYPES)}, "
            f"got {name!r}")
    if name == "float64":
        jax.config.update("jax_enable_x64", True)
    return _DTYPES[name]
