"""FusedBranchChain correctness vs the unfused flax BranchChain.

The fused module must be a drop-in: identical variable tree, identical
forward values, identical train-mode batch_stats updates, and matching
gradients; the Pallas kernels themselves are pinned against
chain_reference in interpret mode (runs on CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhpe_tpu.models.pose_hrnet import BranchChain
from fhpe_tpu.ops.fused_block import FusedBranchChain, chain_reference

B, H, W, C = 8, 16, 16, 32
NB = 4


@pytest.fixture(scope="module")
def setup():
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, C), jnp.float32)
    ref = BranchChain("BASIC", C, NB, C, dtype=jnp.float32)
    variables = ref.init(jax.random.PRNGKey(1), x, train=True)
    return x, ref, variables


def test_variable_tree_identical(setup):
    x, ref, variables = setup
    fused = FusedBranchChain(planes=C, num_blocks=NB, dtype=jnp.float32,
                             impl="reference")
    fvars = fused.init(jax.random.PRNGKey(1), x, train=True)

    ref_paths = {jax.tree_util.keystr(p): l.shape for p, l in
                 jax.tree_util.tree_flatten_with_path(variables)[0]}
    fused_paths = {jax.tree_util.keystr(p): l.shape for p, l in
                   jax.tree_util.tree_flatten_with_path(fvars)[0]}
    assert ref_paths == fused_paths


def _apply(module, variables, x, train):
    if train:
        out, mut = module.apply(variables, x, train=True,
                                mutable=["batch_stats"])
        return out, mut["batch_stats"]
    return module.apply(variables, x, train=False), None


@pytest.mark.parametrize("train", [False, True])
def test_forward_matches_unfused(setup, train):
    x, ref, variables = setup
    fused = FusedBranchChain(planes=C, num_blocks=NB, dtype=jnp.float32,
                             impl="reference")

    out_ref, stats_ref = _apply(ref, variables, x, train)
    out_fused, stats_fused = _apply(fused, variables, x, train)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    if train:
        for (p, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(stats_fused)[0],
                jax.tree_util.tree_flatten_with_path(stats_ref)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=jax.tree_util.keystr(p))


def test_gradients_match_unfused(setup):
    x, ref, variables = setup
    fused = FusedBranchChain(planes=C, num_blocks=NB, dtype=jnp.float32,
                             impl="reference")

    def loss(module, params):
        out, _ = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out))

    g_ref = jax.grad(lambda p: loss(ref, p))(variables["params"])
    g_fused = jax.grad(lambda p: loss(fused, p))(variables["params"])
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_fused)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(p))


def test_bf16_forward_close(setup):
    """bf16 compute path: fused reference vs unfused within bf16 tolerance."""
    x, _, variables = setup
    xb = x.astype(jnp.bfloat16)
    ref16 = BranchChain("BASIC", C, NB, C, dtype=jnp.bfloat16)
    fused16 = FusedBranchChain(planes=C, num_blocks=NB, dtype=jnp.bfloat16,
                               impl="reference")
    a, _ = _apply(ref16, variables, xb, True)
    b, _ = _apply(fused16, variables, xb, True)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("train", [False, True])
def test_chain_pallas_interpret_matches_reference(setup, train):
    """The Pallas kernels themselves (interpret mode on CPU) must match
    chain_reference: conv formulation, stats fold, scratch rotation."""
    from fhpe_tpu.ops.fused_block_kernels import chain_pallas

    x, ref, variables = setup
    params_list = [variables["params"][f"b{i}"] for i in range(NB)]
    stats_list = [variables["batch_stats"][f"b{i}"] for i in range(NB)]

    y_ref, stats_ref = chain_reference(x, params_list, stats_list, train,
                                       jnp.float32)
    y_pl, stats_pl = chain_pallas(x, params_list, stats_list, train,
                                  jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)
    for sr, sp in zip(jax.tree_util.tree_leaves(stats_ref),
                      jax.tree_util.tree_leaves(stats_pl)):
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sr),
                                   rtol=2e-3, atol=2e-3)


def test_fused_eval_knob_wires_into_hrnet():
    """cfg.TPU.FUSED_EVAL must route eval-mode identity BASIC chains
    through FusedBranchChain with an unchanged variable tree and identical
    eval outputs (on CPU the 'auto' impl falls back to chain_reference, so
    this pins the *wiring*; kernel parity is pinned in interpret mode
    above).  Training must be unaffected by the knob."""
    from fhpe_tpu.config import load_config
    from fhpe_tpu.models import get_pose_net

    yaml = "/root/reference/experiments/coco/hrnet/w32_256x192_adam_lr1e-3.yaml"
    cfg = load_config(yaml)
    cfg.defrost()
    cfg.TPU.FUSED_EVAL = False
    plain = get_pose_net(cfg, dtype=jnp.float32)
    cfg.TPU.FUSED_EVAL = True
    fused = get_pose_net(cfg, dtype=jnp.float32)

    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    fvars = fused.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(fvars))

    out_plain = plain.apply(variables, x, train=False)
    out_fused = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)

    # train path ignores the knob entirely (kernel has no VJP)
    t_plain, m1 = plain.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    t_fused, m2 = fused.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(t_fused), np.asarray(t_plain),
                               rtol=1e-5, atol=1e-5)
