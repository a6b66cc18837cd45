"""Proximal operators.

Reference: softthresh (code/solvers.py:9-12; rcpp-code .../solvers.cpp:29-34).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_threshold(z: jax.Array, lam: jax.Array) -> jax.Array:
    """sign(z) * max(|z| - lam, 0)."""
    return jnp.sign(z) * jnp.maximum(jnp.abs(z) - lam, 0.0)


def soft_threshold_blocks(blocks, lam):
    return tuple(soft_threshold(a, lam) for a in blocks)
