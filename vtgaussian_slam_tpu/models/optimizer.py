"""Per-group Adam with torch semantics, as a pure JAX transform.

The reference builds a fresh torch.optim.Adam per tracking frame / mapping
phase with a learning rate per parameter name
(/root/reference/src/vtgaussian_slam.py:180-187). This reimplements exactly
that update rule (torch Adam: p -= lr * m_hat / (sqrt(v_hat) + eps)) over an
arbitrary pytree, with a matching pytree of per-leaf learning rates. Leaves
with lr == 0.0 still update their moments, like torch does — but callers may
zero those gradients upstream to skip computing them at all (a TPU-side
optimization the CUDA reference cannot do).

eps defaults: 1e-8 for tracking (torch default), 1e-15 for mapping (:187).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AdamState:
    mu: Any          # first moments (pytree like params)
    nu: Any          # second moments
    count: jnp.ndarray  # scalar int32 step count


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_step(
    params: Any,
    grads: Any,
    state: AdamState,
    lrs: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[Any, AdamState]:
    """One Adam step. `lrs` is a pytree of scalars matching `params`."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    def update(p, m, v, lr):
        m_hat = m / bc1
        v_hat = v / bc2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = jax.tree.map(update, params, mu, nu, lrs)
    return new_params, AdamState(mu=mu, nu=nu, count=count)
