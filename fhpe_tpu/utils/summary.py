"""Model summary: parameters and FLOPs.

TPU-native replacement for the reference's forward-hook FLOPs counter
(``lib/utils/utils.py:86-202``): parameters come from the pytree, FLOPs
from XLA's own ``cost_analysis`` on the compiled forward — the compiler's
count of what will actually execute, rather than a per-module estimate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.common import param_count


def get_model_summary(model, input_hw, batch: int = 1, train: bool = False):
    """dict with params, flops (fwd, per batch), and a printable text."""
    x = jnp.zeros((batch, input_hw[0], input_hw[1], 3))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    n_params = param_count(shapes["params"])

    variables = None
    flops = None
    try:
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        compiled = jax.jit(
            lambda v, i: model.apply(v, i, train=train)).lower(variables, x).compile()
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = c.get("flops")
    except Exception:  # cost analysis is best-effort (backend-dependent)
        pass

    lines = [
        f"Model: {type(model).__name__}",
        f"Total Parameters: {n_params:,}",
    ]
    if flops is not None:
        lines.append(f"Forward GFLOPs (batch={batch}): {flops / 1e9:.2f}")
    return {"params": n_params, "flops": flops, "text": "\n".join(lines)}


def dump_hlo(model, input_hw, path: str, batch: int = 1,
             train: bool = False) -> bool:
    """Write the lowered StableHLO of the forward pass to ``path``.

    The JAX analogue of the reference's TensorBoard model-graph dump
    (tools/train.py:129-138).  Set FHPE_DUMP_HLO=1 to trigger from the
    train CLI.  Returns True on success.
    """
    try:
        x = jnp.zeros((batch, input_hw[0], input_hw[1], 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        lowered = jax.jit(
            lambda v, i: model.apply(v, i, train=train)).lower(variables, x)
        with open(path, "w") as f:
            f.write(lowered.as_text())
        return True
    except Exception:
        return False
