"""Straight-through surrogate functions (reference Functions.py:5-26)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 1.0)


def proxy_sign(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, -1.0, 1.0)


def inv_exp(x: jnp.ndarray) -> jnp.ndarray:
    """2*sigmoid(x) - 1 == tanh(x/2), the smooth sign surrogate."""
    return 2.0 / (1.0 + jnp.exp(-x)) - 1.0


def round_through(x: jnp.ndarray) -> jnp.ndarray:
    """Forward round, backward hard-sigmoid gradient (reference Functions.py:18-20)."""
    approx = hard_sigmoid(x)
    return approx + jax.lax.stop_gradient(jnp.round(x) - approx)


def sign_through(x: jnp.ndarray) -> jnp.ndarray:
    """Forward sign, backward 2*sigmoid(x)-1 gradient (reference Functions.py:23-26).
    Used by the FER loss."""
    approx = inv_exp(x)
    return approx + jax.lax.stop_gradient(jnp.sign(x) - approx)
