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


def module_param_table(params) -> list:
    """Per-top-level-module parameter breakdown from the params pytree.

    The analogue of the reference's per-module summary rows
    (``lib/utils/utils.py:86-202`` prints name/params/FLOPs per module via
    forward hooks); here modules are the top-level flax submodules and the
    counts come straight from the pytree — no hooks, no forward pass.
    Returns ``[(name, n_params), ...]`` in sorted-by-name order.
    """
    rows = []
    for name in sorted(params.keys()):
        rows.append((name, param_count(params[name])))
    return rows


def get_model_summary(model, input_hw, batch: int = 1, train: bool = False):
    """dict with params, flops (fwd, per batch), per-module rows, and a
    printable text table (reference get_model_summary,
    lib/utils/utils.py:86-202)."""
    x = jnp.zeros((batch, input_hw[0], input_hw[1], 3))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    n_params = param_count(shapes["params"])
    rows = module_param_table(shapes["params"])

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

    name_w = max([len(r[0]) for r in rows] + [len("Module")])
    lines = [
        f"Model: {type(model).__name__}",
        f"{'Module':<{name_w}}  {'Params':>12}  {'Share':>6}",
        "-" * (name_w + 22),
    ]
    for name, n in rows:
        share = 100.0 * n / max(n_params, 1)
        lines.append(f"{name:<{name_w}}  {n:>12,}  {share:>5.1f}%")
    lines.append("-" * (name_w + 22))
    lines.append(f"Total Parameters: {n_params:,}")
    if flops is not None:
        lines.append(f"Forward GFLOPs (batch={batch}, XLA cost_analysis): "
                     f"{flops / 1e9:.2f}")
    return {"params": n_params, "flops": flops, "modules": rows,
            "text": "\n".join(lines)}


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
