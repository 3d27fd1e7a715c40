"""TPU.DEAD_BIAS_SKIP equivalence proofs (hourglass).

Claim: in the pre-activation hourglass every conv bias except the score
heads' is exactly absorbed by a downstream BatchNorm (constants commute
with the residual adds, maxpool, and nearest upsample in between), so
(a) outputs do not depend on those biases in train or eval mode, and
(b) the skip variant computes the bit-identical function of the shared
parameters when the dropped biases are zero.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net


def _cfg(skip):
    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = 2
    cfg.MODEL.EXTRA.NUM_FEATURES = 32
    cfg.TPU.DEAD_BIAS_SKIP = skip
    return cfg


def _is_dead_bias(path_str):
    """Conv biases dropped by the skip variant: every conv except the
    score heads (score0, score1, ...).  The inter-stack feedback convs
    (score_0, ...) and all other convs are BN-absorbed; BatchNorm 'bias'
    params are live and never touched."""
    import re
    if not path_str.endswith("['Conv_0']['bias']"):
        return False
    return not re.search(r"\['score\d+'\]", path_str)


def _map_biases(tree, fn):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {jax.tree_util.keystr(p): l for p, l in flat}
    mapped = jax.tree_util.tree_map_with_path(
        lambda p, l: fn(jax.tree_util.keystr(p), l), tree)
    return mapped


@pytest.fixture(scope="module")
def setup():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 64, 64, 3), jnp.float32)
    full = get_pose_net(_cfg(False), dtype=jnp.float32)
    skip = get_pose_net(_cfg(True), dtype=jnp.float32)
    fvars = full.init(jax.random.PRNGKey(1), x, train=True)
    return x, full, skip, fvars


def test_outputs_independent_of_dead_biases(setup):
    """Randomizing every dead bias must not change train-mode outputs
    (batch stats absorb the constants immediately); eval-mode outputs
    match once the running stats have converged (they absorb the bias
    exponentially at momentum 0.1 — 150 updates leave 0.9^150 ~ 1e-7 of
    it).  Training dynamics are therefore identical and the final
    trained/evaluated model is bias-independent."""
    x, full, _, fvars = setup
    rng = np.random.RandomState(3)

    def randomize(path, leaf):
        if _is_dead_bias(path):
            return jnp.asarray(rng.uniform(-0.5, 0.5, leaf.shape), leaf.dtype)
        return leaf

    params_a = fvars["params"]
    params_b = _map_biases(params_a, randomize)

    @jax.jit
    def train_pass(p, stats):
        return full.apply({"params": p, "batch_stats": stats},
                          x, train=True, mutable=["batch_stats"])

    out_a, mut_a = train_pass(params_a, fvars["batch_stats"])
    out_b, mut_b = train_pass(params_b, fvars["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               rtol=1e-3, atol=1e-3)

    # converge the running stats under each parameterization, then eval
    for _ in range(150):
        _, mut_a = train_pass(params_a, mut_a["batch_stats"])
        _, mut_b = train_pass(params_b, mut_b["batch_stats"])
    # Tolerance note: eval divides by sqrt(running_var + 1e-5); channels
    # with near-zero variance amplify f32 stat rounding by up to
    # 1/sqrt(eps) ~ 316x, which is what remains here — the exact-equality
    # proof is test_skip_variant_bit_identical_at_zero_bias below.
    ev_a = full.apply({"params": params_a, **mut_a}, x, train=False)
    ev_b = full.apply({"params": params_b, **mut_b}, x, train=False)
    np.testing.assert_allclose(np.asarray(ev_b), np.asarray(ev_a),
                               rtol=2e-2, atol=2e-2)


def test_skip_variant_bit_identical_at_zero_bias(setup):
    """With the dead biases zeroed, the skip model computes the
    bit-identical function and bit-identical gradients of the shared
    parameters (x + 0 is exact)."""
    x, full, skip, fvars = setup

    params_zero = _map_biases(
        fvars["params"],
        lambda p, l: jnp.zeros_like(l) if _is_dead_bias(p) else l)

    svars = skip.init(jax.random.PRNGKey(2), x, train=True)
    flat_full = {jax.tree_util.keystr(p): l for p, l in
                 jax.tree_util.tree_flatten_with_path(params_zero)[0]}
    sparams = jax.tree_util.tree_map_with_path(
        lambda p, l: flat_full[jax.tree_util.keystr(p)], svars["params"])
    # every skip param must exist in the full tree; the dropped ones are
    # exactly the non-score biases
    n_full = len(flat_full)
    n_skip = len(jax.tree_util.tree_leaves(sparams))
    n_dead = sum(1 for p in flat_full if _is_dead_bias(p))
    assert n_skip == n_full - n_dead and n_dead > 0

    out_f, mut_f = full.apply({"params": params_zero,
                               "batch_stats": fvars["batch_stats"]},
                              x, train=True, mutable=["batch_stats"])
    out_s, mut_s = skip.apply({"params": sparams,
                               "batch_stats": fvars["batch_stats"]},
                              x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_s))
    for a, b in zip(jax.tree_util.tree_leaves(mut_f),
                    jax.tree_util.tree_leaves(mut_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval mode too: same function, bit-identical
    ev_f = full.apply({"params": params_zero, **mut_f}, x, train=False)
    ev_s = skip.apply({"params": sparams, **mut_s}, x, train=False)
    np.testing.assert_array_equal(np.asarray(ev_f), np.asarray(ev_s))

    tgt = jnp.asarray(np.random.RandomState(5).rand(2, 4, 16, 16, 16),
                      jnp.float32)

    def loss_full(p):
        out = full.apply({"params": p, "batch_stats": fvars["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])[0]
        return jnp.mean((out - tgt) ** 2)

    def loss_skip(p):
        out = skip.apply({"params": p, "batch_stats": fvars["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])[0]
        return jnp.mean((out - tgt) ** 2)

    gf = jax.grad(loss_full)(params_zero)
    gs = jax.grad(loss_skip)(sparams)
    gf_flat = {jax.tree_util.keystr(p): l for p, l in
               jax.tree_util.tree_flatten_with_path(gf)[0]}
    # dead-bias grads in the full model are zero (up to f32 rounding of
    # the analytically-exact per-channel dy cancellation through BN)...
    for p, l in gf_flat.items():
        if _is_dead_bias(p):
            np.testing.assert_allclose(np.asarray(l), 0.0, atol=1e-5)
    # ...and every shared grad matches (XLA may schedule the two graphs'
    # reductions differently; the values are the same function)
    for p, l in jax.tree_util.tree_flatten_with_path(gs)[0]:
        ref = np.asarray(gf_flat[jax.tree_util.keystr(p)])
        np.testing.assert_allclose(np.asarray(l), ref, rtol=1e-5,
                                   atol=1e-6)
