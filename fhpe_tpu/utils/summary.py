"""Model summary: parameters and FLOPs.

TPU-native replacement for the reference's forward-hook FLOPs counter
(``lib/utils/utils.py:86-202``): parameters come from the pytree, FLOPs
from XLA's own ``cost_analysis`` on the compiled forward — the compiler's
count of what will actually execute, rather than a per-module estimate.
Per-module name/params/FLOPs rows (the reference's per-module table) come
from ``flax.linen.tabulate(compute_flops=True)``, which costs each
submodule call via the same XLA analysis.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from ..models.common import param_count

logger = logging.getLogger(__name__)


def _cpu_lowering_scope():
    """Context targeting the always-registered CPU backend for lowering.

    The axon TPU plugin returns None from ``cost_analysis`` and routes
    ``compile()`` through the remote relay (5-15 min, can SIGKILL) — but
    analysis only needs *a* lowering, and lowering is client-side on CPU.
    Falls back to a null context if no CPU backend exists.
    """
    import contextlib

    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:  # noqa: BLE001 — analysis is best-effort
        return contextlib.nullcontext()


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


def per_module_flops_table(model, x, train: bool = False,
                           depth: int = 2) -> str | None:
    """Per-module name/params/FLOPs table (reference per-module summary,
    ``lib/utils/utils.py:86-202``) via ``flax.linen.tabulate`` with
    ``compute_flops`` — each submodule call is costed by XLA's own
    analysis instead of hand-counted hook formulas.  Best-effort: returns
    None (with a logged warning) if tabulation fails.
    """
    try:
        import flax.linen as nn
        tab = nn.tabulate(
            model, jax.random.PRNGKey(0), compute_flops=True, depth=depth,
            console_kwargs={"width": 120, "force_terminal": False,
                            "force_jupyter": False})
        with _cpu_lowering_scope():
            return tab(x, train=train)
    except Exception as e:  # noqa: BLE001 — observability must not kill runs
        logger.warning("per-module FLOPs table unavailable: %r", e)
        return None


def get_model_summary(model, input_hw, batch: int = 1, train: bool = False,
                      per_module_flops: bool = True):
    """dict with params, flops (fwd, per batch), per-module rows, and a
    printable text table (reference get_model_summary,
    lib/utils/utils.py:86-202).  ``per_module_flops`` appends the
    per-module name/params/FLOPs table (reference :170-199 prints one row
    per module)."""
    # host-side sample: a jnp.zeros here would upload through the TPU
    # relay just to derive shapes
    x = np.zeros((batch, input_hw[0], input_hw[1], 3), np.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    n_params = param_count(shapes["params"])
    rows = module_param_table(shapes["params"])

    flops = None
    try:
        # abstract lowering on the CPU backend: no device arrays, no
        # compile — the axon plugin's cost_analysis is None and its
        # compile path goes through the remote relay
        abstract_vars = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
        with _cpu_lowering_scope():
            lowered = jax.jit(
                lambda v, i: model.apply(v, i, train=train)).lower(
                    abstract_vars, jax.ShapeDtypeStruct(x.shape, x.dtype))
            cost = lowered.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = c.get("flops")
    except Exception as e:  # cost analysis is best-effort (backend-dependent)
        logger.warning("whole-model FLOPs unavailable (XLA cost_analysis "
                       "failed): %r", e)

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
                     f"{flops / 1e9:.4g}")
    else:
        lines.append("Forward GFLOPs: unavailable (see warning log)")
    module_table = None
    if per_module_flops:
        module_table = per_module_flops_table(model, x, train=train)
        if module_table:
            lines.append(module_table)
    return {"params": n_params, "flops": flops, "modules": rows,
            "module_flops_table": module_table, "text": "\n".join(lines)}


def dump_hlo(model, input_hw, path: str, batch: int = 1,
             train: bool = False) -> bool:
    """Write the lowered StableHLO of the forward pass to ``path``.

    The JAX analogue of the reference's TensorBoard model-graph dump
    (tools/train.py:129-138).  Set FHPE_DUMP_HLO=1 to trigger from the
    train CLI.  Returns True on success.
    """
    try:
        x = np.zeros((batch, input_hw[0], input_hw[1], 3), np.float32)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, train=False))
        abstract_vars = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
        # abstract args + CPU lowering: no init arrays, no device traffic
        # (a real init on the TPU relay costs seconds of upload for a
        # graph text dump)
        with _cpu_lowering_scope():
            lowered = jax.jit(
                lambda v, i: model.apply(v, i, train=train)).lower(
                    abstract_vars, jax.ShapeDtypeStruct(x.shape, x.dtype))
            text = lowered.as_text()
        with open(path, "w") as f:
            f.write(text)
        return True
    except Exception:
        return False
