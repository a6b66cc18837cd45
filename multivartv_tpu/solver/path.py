"""Lambda-max estimation and the warm-started lambda path.

Reference semantics:
  * lambda_max = 5 * ||D (D'D)^+ O'y||_inf in C++ (lam_max_pinv,
    utils.cpp:351-355, with the pinv approximated by truncated CG); the
    Python prototype returns ||.||_inf * prod(deltas) without the factor 5
    (code/solvers.py:116, code/utils.py:206-209).  Here the pinv is *exact*
    via the DCT diagonalization of D'D (ops/dct.py) — no CG.
  * Grid: n_lambda log-spaced values from 1e-4*lambda_max to lambda_max,
    descending (create_lambdas, solvers.cpp:186-200).
  * Path: warm-start theta/u/rho across lambdas, rho_init = lambdas[0]/5
    (mbs_path, solvers.cpp:204-222).  Here the path is a lax.scan whose
    carry is the ADMM state.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multivartv_tpu.config import PathConfig, SolverConfig
from multivartv_tpu.ops import dct as dct_ops
from multivartv_tpu.ops import diff as diff_ops
from multivartv_tpu.ops.interp import gather_fitted
from multivartv_tpu.solver.admm import ADMMState, admm_solve, initial_state
from multivartv_tpu.solver.problem import Operators, Problem


def lam_max(ops: Operators, problem: Problem, pcfg: PathConfig,
            deltas: Optional[jax.Array] = None) -> jax.Array:
    """Exact lambda_max estimate ||D (D'D)^+ O'y||_inf times the mode's
    scale ("cpp": x5, utils.cpp:354; "py": x prod(deltas),
    code/solvers.py:116)."""
    if ops.gram_eigs is None:
        # build_operators always keeps the Gram eigenvalues (the reference's
        # lambda_max is solver-independent, utils.cpp:343-355); only a
        # hand-constructed Operators can lack them.
        raise ValueError(
            "lam_max needs Operators.gram_eigs; use build_operators()")
    pinv_oty = dct_ops.gram_pinv_apply(problem.oty, ops.gram_eigs,
                                       ops.dct_mats)
    tune = diff_ops.blocks_abs_max(ops.apply_D(pinv_oty))
    if pcfg.lam_max_mode == "cpp":
        return pcfg.lam_max_scale * tune
    if deltas is None:
        raise ValueError("lam_max_mode='py' needs deltas")
    return tune * jnp.prod(deltas)


def create_lambdas(lambda_max: jax.Array, pcfg: PathConfig) -> jax.Array:
    """Descending log grid (create_lambdas, solvers.cpp:191)."""
    lo = jnp.log(lambda_max * pcfg.lambda_min_ratio)
    hi = jnp.log(lambda_max)
    return jnp.exp(jnp.linspace(lo, hi, pcfg.n_lambda))[::-1]


# Auto-degrade budget for PathConfig.store == "fitted": storing per-lambda
# thetas + fitted values beyond this many elements (1 GiB of f32) silently
# exhausts HBM at large lattices (2048^2 x 100 lambdas is ~1.7 GB of
# thetas alone), so the path falls back to store="mse" with a logged
# notice.  The reference keeps full models only because its meshes are
# tiny (listPATH, solvers.cpp:292-302).
STORE_BUDGET_ELEMS = 1 << 28


def _effective_store(ops: Operators, problem: Problem, lambdas: jax.Array,
                     pcfg: PathConfig, batch: int = 1) -> PathConfig:
    if pcfg.store != "fitted":
        return pcfg
    n_lambda = int(lambdas.shape[0])
    n = int(problem.y.shape[-1])
    elems = batch * n_lambda * (ops.ntheta + n)
    if elems > STORE_BUDGET_ELEMS:
        from multivartv_tpu.utils.logging import get_logger
        get_logger().warning(
            "store='fitted' would keep %.2f G elements (%d lambdas x "
            "(%d knots + %d samples) x batch %d); auto-degrading to "
            "store='mse'.  Pass PathConfig(store='mse') or solve fewer "
            "lambdas to silence this.",
            elems / 1e9, n_lambda, ops.ntheta, n, batch)
        return dataclasses.replace(pcfg, store="mse")
    return pcfg


class PathResult(NamedTuple):
    """Per-lambda outputs of a path solve (leading axis = lambda)."""

    lambdas: jax.Array
    train_mse: jax.Array       # MSE of fitted vs ftrue over train samples
    test_mse: jax.Array        # MSE over held-out samples (0 if no test set)
    iters: jax.Array           # ADMM iterations per lambda
    cg_iters: jax.Array        # total CG iterations per lambda
    thetas: Optional[jax.Array]    # (n_lambda, *m) if stored
    fitted: Optional[jax.Array]    # (n_lambda, n) if stored
    final_state: ADMMState


def _masked_mse(fits: jax.Array, target: jax.Array,
                mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(jnp.square(fits - target))
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.square(fits - target) * mask) / denom


def solve_path(ops: Operators, problem: Problem, lambdas: jax.Array,
               cfg: SolverConfig, pcfg: PathConfig,
               ftrue: Optional[jax.Array] = None,
               init_state: Optional[ADMMState] = None,
               batched: bool = False, progress: bool = False) -> PathResult:
    """Warm-started lambda path as a lax.scan.

    ftrue: per-sample prediction target for the train MSE (reference
    gen_ftrue, solvers.cpp:248-257; defaults to y).
    Held-out MSE (reference test_mse, solvers.cpp:278-288) is computed per
    lambda against samples where train_mask == 0.
    init_state: resume carry (checkpoint restore / chunked path solves).
    batched: set when this call runs under vmap (disables Pallas kernels,
        which do not batch).
    progress: print a per-lambda line from inside the scan (the reference's
        verbose per-solve counter, solvers.cpp:134) via jax.debug.print.
    """
    if ftrue is None:
        ftrue = problem.y
    ftrue = jnp.asarray(ftrue, problem.y.dtype).reshape(-1)
    train_mask = problem.train_mask
    test_mask = None if train_mask is None else (1.0 - train_mask)

    rho0 = lambdas[0] / 5.0
    state0 = initial_state(ops, problem, rho0) if init_state is None else init_state

    pcfg = _effective_store(ops, problem, lambdas, pcfg)
    store_theta = pcfg.store == "fitted"

    def step(state: ADMMState, lam):
        state = admm_solve(ops, problem, lam, state, cfg, batched=batched)
        if progress:
            from multivartv_tpu.utils.logging import jit_progress
            jit_progress(lam, state.counter)
        fits = gather_fitted(state.theta, problem.flat_idx)
        train_mse = _masked_mse(fits, ftrue, train_mask)
        test_mse = (
            _masked_mse(fits, problem.y, test_mask)
            if test_mask is not None else jnp.zeros((), fits.dtype)
        )
        out = dict(
            train_mse=train_mse,
            test_mse=test_mse,
            iters=state.counter,
            cg_iters=state.cg_iters,
        )
        if store_theta:
            out["theta"] = state.theta
            out["fitted"] = fits
        # Reset counters for the next lambda; keep theta/u/rho as warm
        # start.  dta/dtu adjoint carries are stripped so the scan carry
        # structure matches state0 (admm_solve re-seeds them per lambda
        # — one jnp adjoint pass, negligible against a full solve).
        carry = dataclasses.replace(
            state,
            counter=jnp.zeros((), jnp.int32),
            cg_iters=jnp.zeros((), jnp.int32),
            primal_norm=jnp.ones((), fits.dtype),
            dual_norm=jnp.ones((), fits.dtype),
            eps_primal=jnp.zeros((), fits.dtype),
            eps_dual=jnp.zeros((), fits.dtype),
            dta=None,
            dtu=None,
        )
        if not pcfg.warm_start:
            carry = initial_state(ops, problem, rho0)
        return carry, out

    final_state, outs = jax.lax.scan(step, state0, lambdas)
    return PathResult(
        lambdas=lambdas,
        train_mse=outs["train_mse"],
        test_mse=outs["test_mse"],
        iters=outs["iters"],
        cg_iters=outs["cg_iters"],
        thetas=outs.get("theta"),
        fitted=outs.get("fitted"),
        final_state=final_state,
    )


def _masked_mse_batch(fits: jax.Array, target: jax.Array,
                      mask: Optional[jax.Array]) -> jax.Array:
    """(B,) per-element masked MSE over trailing sample axis."""
    if mask is None:
        return jnp.mean(jnp.square(fits - target), axis=-1)
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return jnp.sum(jnp.square(fits - target) * mask, axis=-1) / denom


def solve_path_batch(ops: Operators, problems: Problem, lambdas: jax.Array,
                     cfg: SolverConfig, pcfg: PathConfig,
                     ftrue: Optional[jax.Array] = None) -> PathResult:
    """Warm-started lambda path over a leading problem-batch axis (CV
    folds / scenario batches) — the reference's product workload
    (mbs_impl fold loop, solvers.cpp:336-353) solved simultaneously.

    Routes through the grid=(B,) fused Pallas kernel (admm_solve_batched)
    when it applies, so the batched path runs at fused-kernel speed; falls
    back to jax.vmap over the jnp path otherwise (identical semantics —
    per-element freeze at convergence).  Every PathResult field carries a
    leading batch axis (B, n_lambda, ...).
    """
    from multivartv_tpu.solver.admm import (admm_solve_batched,
                                            fused_batched_available)

    if not fused_batched_available(ops, problems, cfg):
        return jax.vmap(
            lambda pr: solve_path(ops, pr, lambdas, cfg, pcfg, ftrue=ftrue,
                                  batched=True)
        )(problems)

    B = int(problems.counts.shape[0])
    dtype = problems.oty.dtype
    if ftrue is None:
        ftrue_b = problems.y
    else:
        ftrue_b = jnp.broadcast_to(
            jnp.asarray(ftrue, dtype).reshape(-1)[None, :],
            problems.y.shape)
    train_mask = problems.train_mask
    test_mask = None if train_mask is None else (1.0 - train_mask)

    rho0 = jnp.broadcast_to(lambdas[0] / 5.0, (B,))
    state0 = jax.vmap(
        lambda pr, r: initial_state(ops, pr, r))(problems, rho0)
    pcfg = _effective_store(ops, problems, lambdas, pcfg, batch=B)
    store_theta = pcfg.store == "fitted"
    gather_b = jax.vmap(gather_fitted)

    def step(state: ADMMState, lam):
        lam_b = jnp.broadcast_to(lam, (B,))
        state = admm_solve_batched(ops, problems, lam_b, state, cfg)
        fits = gather_b(state.theta, problems.flat_idx)
        train_mse = _masked_mse_batch(fits, ftrue_b, train_mask)
        test_mse = (
            _masked_mse_batch(fits, problems.y, test_mask)
            if test_mask is not None else jnp.zeros((B,), dtype)
        )
        out = dict(train_mse=train_mse, test_mse=test_mse,
                   iters=state.counter, cg_iters=state.cg_iters)
        if store_theta:
            out["theta"] = state.theta
            out["fitted"] = fits
        carry = dataclasses.replace(
            state,
            counter=jnp.zeros((B,), jnp.int32),
            cg_iters=jnp.zeros((B,), jnp.int32),
            primal_norm=jnp.ones((B,), dtype),
            dual_norm=jnp.ones((B,), dtype),
            eps_primal=jnp.zeros((B,), dtype),
            eps_dual=jnp.zeros((B,), dtype),
        )
        if not pcfg.warm_start:
            carry = state0
        return carry, out

    final_state, outs = jax.lax.scan(step, state0, lambdas)

    def to_batch_major(x):
        return None if x is None else jnp.moveaxis(x, 0, 1)

    return PathResult(
        lambdas=lambdas,
        train_mse=to_batch_major(outs["train_mse"]),
        test_mse=to_batch_major(outs["test_mse"]),
        iters=to_batch_major(outs["iters"]),
        cg_iters=to_batch_major(outs["cg_iters"]),
        thetas=to_batch_major(outs.get("theta")),
        fitted=to_batch_major(outs.get("fitted")),
        final_state=final_state,
    )


_PATH_RES_FIELDS = ("train_mse", "test_mse", "iters", "cg_iters",
                    "thetas", "fitted")


def solve_path_checkpointed(ops: Operators, problem: Problem,
                            lambdas: jax.Array, cfg: SolverConfig,
                            pcfg: PathConfig, checkpoint_dir: str,
                            checkpoint_every: int = 10,
                            ftrue: Optional[jax.Array] = None) -> PathResult:
    """Resumable lambda path: scan in chunks, persist the warm-start carry
    AND the chunk's per-lambda metrics after each chunk, resume from the
    newest checkpoint if one exists.

    A resumed run returns the FULL merged path (persisted prefix metrics
    + freshly solved suffix); a checkpoint that already covers every
    lambda returns the completed result as a no-op.  Only if the prefix
    metrics are unavailable (a checkpoint directory written before result
    persistence existed) does the result fall back to the remaining
    lambdas, with a logged warning."""
    from multivartv_tpu.utils import checkpoint as ckpt

    lambdas = jnp.asarray(lambdas).reshape(-1)
    n = int(lambdas.shape[0])
    state = initial_state(ops, problem, lambdas[0] / 5.0)
    start = 0
    restored = ckpt.load_path_state(checkpoint_dir, state)
    if restored is not None:
        state, done_idx = restored
        start = done_idx + 1

    prior = ckpt.load_path_results(checkpoint_dir, start)
    pieces = [] if prior is None else [
        {k: jnp.asarray(v) for k, v in chunk.items()} for chunk in prior]
    result_start = start if prior is None else 0
    if prior is None and start > 0:
        from multivartv_tpu.utils.logging import get_logger
        get_logger().warning(
            "checkpoint at %s has no persisted chunk metrics (pre-r5 "
            "format); the result covers only the remaining %d lambdas",
            checkpoint_dir, n - start)

    i = start
    while i < n:
        j = min(i + checkpoint_every, n)
        res = solve_path(ops, problem, lambdas[i:j], cfg, pcfg,
                         ftrue=ftrue, init_state=state)
        state = res.final_state
        ckpt.save_path_results(
            checkpoint_dir, i, j,
            {f: getattr(res, f) for f in _PATH_RES_FIELDS})
        ckpt.save_path_state(checkpoint_dir, state, j - 1,
                             meta={"n_lambda": n})
        pieces.append({f: getattr(res, f) for f in _PATH_RES_FIELDS})
        i = j

    if not pieces:
        # Fully covered with no recoverable metrics: nothing to merge.
        raise ValueError(
            f"checkpoint already covers all {n} lambdas but holds no "
            f"persisted metrics (pre-r5 format); delete {checkpoint_dir} "
            f"to re-solve")

    def cat(field):
        vals = [p.get(field) for p in pieces]
        if any(v is None for v in vals):
            return None
        return jnp.concatenate(vals, axis=0)

    return PathResult(
        lambdas=lambdas[result_start:],
        train_mse=cat("train_mse"),
        test_mse=cat("test_mse"),
        iters=cat("iters"),
        cg_iters=cat("cg_iters"),
        thetas=cat("thetas"),
        fitted=cat("fitted"),
        final_state=state,
    )
