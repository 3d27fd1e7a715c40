"""Train state, optimizer, and learning-rate schedule.

Replaces the reference's torch optimizer/scheduler wiring
(``lib/utils/utils.py:59-75`` get_optimizer, ``tools/train.py:204-210``
MultiStepLR) with optax.  The LR is an **epoch-indexed piecewise-constant**
schedule injected as a hyperparameter: LR changes only at epoch boundaries,
reproducing the reference's effective LR sequence (MultiStepLR stepped at
the top of each epoch; for epoch e the factor is
``LR_FACTOR ** (#milestones <= e)``).

Optimizer parity (utils.py:59-75):
* adam: torch defaults (betas 0.9/0.999, eps 1e-8) and **no weight decay**.
* sgd: momentum + nesterov + L2 weight decay applied to the gradient before
  the momentum update (torch semantics: add_decayed_weights before sgd).
"""

from __future__ import annotations

import bisect
from typing import Any

import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def lr_for_epoch(cfg, epoch: int) -> float:
    """LR * LR_FACTOR ** (#LR_STEP milestones <= epoch + 1).

    The ``+ 1`` is the reference's effective (historically accidental)
    schedule: MultiStepLR's constructor performs an initial ``step()`` and
    ``tools/train.py:209-210`` steps again at the top of EVERY epoch
    including the first, so by the time epoch ``e`` trains the scheduler's
    ``last_epoch`` is ``e + 1`` — a milestone at epoch ``m`` takes effect
    from trained epoch ``m - 1``.  Verified empirically against torch
    (both the 2.x recursive and the closed-form semantics agree) and
    pinned end-to-end by tests/test_trajectory_parity.py.
    """
    steps = sorted(cfg.TRAIN.LR_STEP)
    return float(cfg.TRAIN.LR) * float(cfg.TRAIN.LR_FACTOR) ** bisect.bisect_right(
        steps, epoch + 1)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """inject_hyperparams-wrapped optimizer; set LR per epoch via set_lr."""
    name = cfg.TRAIN.OPTIMIZER

    if name == "adam":
        @optax.inject_hyperparams
        def tx(learning_rate):
            return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "sgd":
        wd = float(cfg.TRAIN.WD)
        momentum = float(cfg.TRAIN.MOMENTUM)
        nesterov = bool(cfg.TRAIN.NESTEROV)

        @optax.inject_hyperparams
        def tx(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov),
            )
    else:
        raise ValueError(f"unknown TRAIN.OPTIMIZER '{name}'")

    return tx(learning_rate=float(cfg.TRAIN.LR))


def set_lr(state: TrainState, lr: float) -> TrainState:
    """Write the injected learning_rate hyperparameter (epoch boundary)."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=hp["learning_rate"].dtype)
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


def create_train_state(cfg, model, rng, sample_input) -> TrainState:
    """Initialize params/batch_stats and the optimizer."""
    variables = model.init(rng, sample_input, train=True)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
