"""Optimizer stack matching the reference's training semantics:

  * Adam with torch defaults (betas 0.9/0.999, eps=1e-8 added OUTSIDE the
    sqrt — optax's eps, with eps_root=0 — identical to torch.optim.Adam);
  * element-wise gradient clamp to ±grad_clip applied BEFORE Adam, exactly
    like the reference's clip_gradient() which clamps param.grad in place
    after backward and before step (train_xe.py:19-23, decoder.py:14-18);
  * mutable learning rate for the halve-on-plateau schedule
    (train_xe.py:234-238) via optax.inject_hyperparams.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import optax


def make_optimizer(lr: float, grad_clip: float = 0.1,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    @optax.inject_hyperparams
    def _make(learning_rate):
        steps = [optax.clip(grad_clip)]
        if weight_decay:
            # torch Adam's weight_decay adds wd*param to the gradient
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                         eps_root=0.0))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)
    return _make(learning_rate=lr)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """Functional lr update (used by plateau halving between epochs)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
    return opt_state._replace(hyperparams=hp)


def apply_updates(params, grads, opt_state,
                  tx: optax.GradientTransformation) -> Tuple[Any, Any]:
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state
