"""Scenario batching: many lambdas / many problems solved simultaneously.

The reference's lambda path is strictly sequential (warm starts,
solvers.cpp:212-219).  On TPU there is a second regime: solve every lambda
(or many independent denoising problems) *in parallel* as a leading batch
axis — cold starts cost more iterations per lambda, but the chip processes
the whole batch at once and batches shard across devices
(BASELINE config 3: 64-lambda sweep vmapped over one host).

All batched elements run until the slowest converges; converged elements
keep taking fixed-point iterations (harmless — see admm.py docstring).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from multivartv_tpu.config import PathConfig, SolverConfig
from multivartv_tpu.ops.interp import gather_fitted
from multivartv_tpu.solver.admm import (admm_solve, admm_solve_batched,
                                        fused_batched_available,
                                        initial_state)
from multivartv_tpu.solver.problem import Operators, Problem


def _broadcast_state(state, B: int):
    """Tile one ADMMState across a leading batch axis."""
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)


class SweepResult(NamedTuple):
    lambdas: jax.Array        # (B,)
    thetas: jax.Array         # (B, *m)
    mses: jax.Array           # (B,) fitted-vs-ftrue MSE per lambda
    iters: jax.Array          # (B,)


def solve_lambda_sweep(ops: Operators, problem: Problem, lambdas: jax.Array,
                       cfg: SolverConfig,
                       ftrue: Optional[jax.Array] = None,
                       rho0: Optional[jax.Array] = None) -> SweepResult:
    """Solve all lambdas of ONE problem in parallel (vmap over lambda).

    Inits mirror mbs_fit_optimal (solvers.cpp:261-274): theta = mean(y),
    u = 0, rho = lambda_max/5 (shared across the batch by default).
    """
    lambdas = jnp.asarray(lambdas).reshape(-1)
    if rho0 is None:
        rho0 = jnp.max(lambdas) / 5.0
    target = problem.y if ftrue is None else jnp.asarray(ftrue, problem.y.dtype)

    if fused_batched_available(ops, problem, cfg):
        # Shared-problem grid=(B,) fused kernel: counts/oty stay
        # VMEM-resident across the whole sweep, one problem per grid step.
        B = int(lambdas.shape[0])
        state = _broadcast_state(initial_state(ops, problem, rho0), B)
        state = admm_solve_batched(ops, problem, lambdas, state, cfg)
        fits = jax.vmap(gather_fitted, in_axes=(0, None))(
            state.theta, problem.flat_idx)
        mses = jnp.mean(jnp.square(fits - target[None, :]), axis=1)
        return SweepResult(lambdas=lambdas, thetas=state.theta, mses=mses,
                           iters=state.counter)

    def one(lam):
        state = initial_state(ops, problem, rho0)
        state = admm_solve(ops, problem, lam, state, cfg, batched=True)
        fits = gather_fitted(state.theta, problem.flat_idx)
        mse = jnp.mean(jnp.square(fits - target))
        return state.theta, mse, state.counter

    thetas, mses, iters = jax.vmap(one)(lambdas)
    return SweepResult(lambdas=lambdas, thetas=thetas, mses=mses, iters=iters)


def solve_problem_batch(ops: Operators, problems: Problem, lambdas: jax.Array,
                        cfg: SolverConfig) -> SweepResult:
    """Solve B independent problems (leading batch axis on every Problem
    leaf) at per-problem lambdas — the many-denoising-problems regime."""
    lambdas = jnp.asarray(lambdas).reshape(-1)

    if fused_batched_available(ops, problems, cfg):
        state = jax.vmap(
            lambda pr, lam: initial_state(ops, pr, lam / 5.0)
        )(problems, lambdas)
        state = admm_solve_batched(ops, problems, lambdas, state, cfg)
        fits = jax.vmap(gather_fitted)(state.theta, problems.flat_idx)
        mses = jnp.mean(jnp.square(fits - problems.y), axis=1)
        return SweepResult(lambdas=lambdas, thetas=state.theta, mses=mses,
                           iters=state.counter)

    def one(problem, lam):
        state = initial_state(ops, problem, lam / 5.0)
        state = admm_solve(ops, problem, lam, state, cfg, batched=True)
        fits = gather_fitted(state.theta, problem.flat_idx)
        mse = jnp.mean(jnp.square(fits - problem.y))
        return state.theta, mse, state.counter

    thetas, mses, iters = jax.vmap(one)(problems, lambdas)
    return SweepResult(lambdas=lambdas, thetas=thetas, mses=mses, iters=iters)
