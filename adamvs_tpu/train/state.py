"""Train state, optimizer, and LR schedule.

Reference training recipe (train_whu.py:115-150): RMSprop(lr=1e-3, alpha=0.9,
weight_decay=0) with a MultiStepLR that halves at epochs {10,12,14}
(``lrepochs="10,12,14:2"``). We reproduce torch RMSprop exactly
(``sq = α·sq + (1-α)·g²; update = g / (sqrt(sq) + eps)``, eps outside the
sqrt) via ``optax.scale_by_rms(..., eps_in_sqrt=False)``.

The reference calls ``lr_scheduler.step()`` at the top of each epoch, which
under PyTorch >1.1 shifts every milestone one epoch early (SURVEY.md quirks);
we use the standard boundaries (milestone epoch -> halved from that epoch on).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    nan_steps: jnp.ndarray  # count of skipped non-finite-loss updates
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)


def make_lr_schedule(base_lr: float, milestones_epochs: list[int], gamma: float,
                     steps_per_epoch: int):
    boundaries = {int(e * steps_per_epoch): gamma for e in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(
    lr: float | Callable = 1e-3,
    alpha: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch.optim.RMSprop equivalent (train_whu.py:116)."""
    parts = []
    if weight_decay:
        # torch couples weight decay into the gradient before RMS scaling
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False))
    if callable(lr):
        parts.append(optax.scale_by_schedule(lr))
        parts.append(optax.scale(-1.0))
    else:
        parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def create_train_state(model, variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        nan_steps=jnp.zeros((), jnp.int32),
        tx=tx,
        apply_fn=model.apply,
    )


def apply_updates_if_finite(state: TrainState, grads, loss) -> TrainState:
    """Skip the optimizer step when the loss is non-finite, counting it — the
    reference silently skips (train_whu.py:285-287); we surface it as a metric."""
    finite = jnp.isfinite(loss)
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    def pick(new, old):
        return jax.tree_util.tree_map(lambda n, o: jnp.where(finite, n, o), new, old)

    return state.replace(
        step=state.step + 1,
        params=pick(new_params, state.params),
        opt_state=pick(new_opt_state, state.opt_state),
        nan_steps=state.nan_steps + jnp.where(finite, 0, 1),
    )
