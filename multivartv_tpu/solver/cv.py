"""K-fold cross-validation as a batched (vmapped) path solve.

The reference loops folds serially, rebuilding the sparse operators on each
train split (mbs_impl, rcpp-code .../solvers.cpp:336-353).  Matrix-free,
a fold is just a 0/1 sample mask: the fold-specific cached objects
(counts, O'y, ybar) are masked segment-sums, and all folds solve
*simultaneously* as a leading batch axis via vmap — the TPU sees one big
batched stencil/CG/DCT workload instead of k sequential solves.

Fold labels reproduce kfoldinds (utils.cpp:367-376): shuffled (i mod k).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multivartv_tpu.config import CVConfig, PathConfig, SolverConfig
from multivartv_tpu.mesh import MeshSpec
from multivartv_tpu.solver import path as path_lib
from multivartv_tpu.solver.problem import Operators, Problem, build_problem


def kfold_indices(n: int, k: int, seed: int) -> jax.Array:
    """Shuffled (i mod k) fold labels (kfoldinds, utils.cpp:367-376)."""
    key = jax.random.PRNGKey(seed)
    labels = jnp.arange(n, dtype=jnp.int32) % k
    return jax.random.permutation(key, labels)


class CVResult(NamedTuple):
    fold_test_mse: jax.Array   # (folds, n_lambda) held-out MSE matrix
    mean_mse: jax.Array        # (n_lambda,) mean over folds
    fold_iters: jax.Array      # (folds, n_lambda) ADMM iterations


def fold_problems(spec: MeshSpec, data, y, fold_labels: jax.Array,
                  folds: int, dtype=jnp.float32) -> Problem:
    """Build a fold-batched Problem (leading axis = fold) from masks."""
    masks = jnp.stack([
        (fold_labels != f).astype(dtype) for f in range(folds)
    ])

    def build(mask):
        return build_problem(spec, data, y, train_mask=mask, dtype=dtype)

    return jax.vmap(build, in_axes=0)(masks)


def cross_validate(ops: Operators, problems: Problem, lambdas: jax.Array,
                   cfg: SolverConfig, pcfg: PathConfig,
                   cvcfg: CVConfig) -> CVResult:
    """Solve the warm-started path for every fold; collect held-out MSE.

    The reference evaluates held-out MSE per lambda from the stored fold
    models (test_mse, solvers.cpp:278-288); here it is computed inside the
    path scan, so fold paths never store theta.
    """
    import dataclasses as _dc
    mse_only = _dc.replace(pcfg, store="mse")

    if cvcfg.vmap_folds:
        # All folds simultaneously: grid=(folds,) fused Pallas kernel on
        # TPU, vmap over the jnp path elsewhere (solve_path_batch).
        res = path_lib.solve_path_batch(ops, problems, lambdas, cfg,
                                        mse_only)
        test_mse, iters = res.test_mse, res.iters
    else:
        outs = [
            path_lib.solve_path(
                ops, jax.tree.map(lambda a: a[f], problems), lambdas, cfg,
                mse_only)
            for f in range(problems.counts.shape[0])
        ]
        test_mse = jnp.stack([o.test_mse for o in outs])
        iters = jnp.stack([o.iters for o in outs])

    return CVResult(
        fold_test_mse=test_mse,
        mean_mse=jnp.mean(test_mse, axis=0),
        fold_iters=iters,
    )
