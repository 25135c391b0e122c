"""torch.optim-default-faithful optax factories.

The reference resolves ``--optim`` with ``getattr(torch.optim, name)(params,
lr=lr)`` (train.py:51) — i.e. every hyperparameter beyond lr is a TORCH
default.  Several optax defaults differ from torch's, so a bare
``optax.<name>(lr)`` would silently train a different optimizer:

  * AdamW: torch ``weight_decay=0.01`` vs optax ``1e-4``;
  * RMSprop: torch ``alpha=0.99`` vs optax ``decay=0.9``, and torch adds eps
    OUTSIDE the sqrt (``sqrt(v) + eps``) where optax's default is inside
    (``sqrt(v + eps)``, ``eps_in_sqrt=True``);
  * Adagrad: torch ``initial_accumulator_value=0``, ``eps=1e-10`` vs optax
    ``0.1`` / ``1e-7``;
  * NAdam: torch's NAdam (Dozat 2016 with the ``momentum_decay=4e-3``
    mu-product schedule) is a different algorithm from optax's ``nadam``
    (plain Nesterov-Adam); :func:`nadam_torch` implements torch's exactly.

Every factory here takes ``learning_rate`` only (matching the reference's
call) and pins the remaining hyperparameters to the torch defaults.  Parity
oracle: tests/test_optim_parity.py steps each entry against its torch
namesake on identical weights/grads and compares the parameter trees
elementwise.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class NAdamTorchState(NamedTuple):
    count: chex.Array      # scalar int32, number of completed steps
    mu_product: chex.Array # scalar f32, prod_t mu_t
    mu: optax.Updates
    nu: optax.Updates


def nadam_torch(learning_rate, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8,
                momentum_decay: float = 4e-3) -> optax.GradientTransformation:
    """torch.optim.NAdam with torch defaults (torch/optim/nadam.py):

        mu_t      = b1 * (1 - 0.5 * 0.96^(t * psi))        psi = momentum_decay
        mu_{t+1}  = b1 * (1 - 0.5 * 0.96^((t+1) * psi))
        m_t       = b1 m_{t-1} + (1-b1) g
        v_t       = b2 v_{t-1} + (1-b2) g^2
        denom     = sqrt(v_t / (1 - b2^t)) + eps
        p        -= lr [ (1-mu_t) g / (1 - prod mu) + mu_{t+1} m_t /
                         (1 - (prod mu) mu_{t+1}) ] / denom
    """

    def init_fn(params):
        return NAdamTorchState(
            count=jnp.zeros([], jnp.int32),
            mu_product=jnp.ones([], jnp.float32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        t = (state.count + 1).astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (t * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * momentum_decay))
        mu_prod = state.mu_product * mu_t
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                         state.mu, updates)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                         state.nu, updates)
        bc2 = 1.0 - b2 ** t

        def upd(m_, v_, g):
            denom = jnp.sqrt(v_ / bc2) + eps
            return ((1.0 - mu_t) * g / (1.0 - mu_prod)
                    + mu_next * m_ / (1.0 - mu_prod * mu_next)) / denom

        new_updates = jax.tree.map(upd, m, v, updates)
        return new_updates, NAdamTorchState(
            count=state.count + 1, mu_product=mu_prod, mu=m, nu=v)

    return optax.chain(
        optax.GradientTransformation(init_fn, update_fn),
        optax.scale_by_learning_rate(learning_rate))


#: torch.optim name -> factory(learning_rate) with torch-default
#: hyperparameters (the reference's --optim contract)
TORCH_DEFAULT_OPTIMIZERS = {
    "Adam": optax.adam,                       # b1/b2/eps defaults coincide
    "AdamW": lambda lr: optax.adamw(lr, weight_decay=0.01),
    "SGD": optax.sgd,                         # no momentum, like torch
    "RMSprop": lambda lr: optax.rmsprop(lr, decay=0.99, eps=1e-8,
                                        eps_in_sqrt=False),
    "Adagrad": lambda lr: optax.adagrad(lr, initial_accumulator_value=0.0,
                                        eps=1e-10),
    "Adadelta": optax.adadelta,               # rho=0.9 / eps=1e-6 coincide
    "Adamax": optax.adamax,                   # torch adds eps to |g| inside
    #                                           the max; optax adds it to the
    #                                           denominator — O(eps) apart
    "NAdam": nadam_torch,
    "RAdam": optax.radam,                     # same rectification, threshold 5
}
