"""Metrics (reference mse/mbs_mse, solvers.cpp:167-175; code/solvers.py:85-89)."""

from __future__ import annotations

import jax.numpy as jnp


def mse(fits, y):
    fits = jnp.asarray(fits).reshape(-1)
    y = jnp.asarray(y).reshape(-1)
    return jnp.mean(jnp.square(fits - y))
