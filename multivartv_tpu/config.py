"""Configuration dataclasses for the MultivarTV-TPU solver stack.

The reference exposes its knobs as plain function arguments plus
compile-time constants (EPS=1e-4 in rcpp-code/MultivarTV/src/utils.hpp:14,
TOL=1e-4 in solvers.hpp:19, max_counter=3000 in solvers.cpp:103).  Here they
are explicit, hashable config dataclasses so they can be closed over by
jitted functions as static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Single-lambda ADMM solver configuration.

    Mirrors the reference C++ behavior (the behavioral ground truth):
      * Boyd primal/dual residual stopping with TOL=1e-4
        (reference solvers.cpp:110-122).
      * Adaptive rho: tau=2, rescale when one residual exceeds 10x the
        other, dual variable rescaled inversely (solvers.cpp:77-94).
      * Iteration cap 3000 with warn+break (solvers.cpp:103,129-132).
    """

    tol: float = 1e-4
    max_iters: int = 3000
    adapt_rho: bool = True
    adapt_tau: float = 2.0
    adapt_band: float = 10.0
    # Shrink factor for adaptive rho (rho /= adapt_tau_shrink when the
    # dual residual exceeds band * primal).  None = adapt_tau (the
    # symmetric reference C++ rule, solvers.cpp:77-94).  The standalone
    # cpp-code sibling uses an ASYMMETRIC rule — grow x20, shrink /10,
    # band 20 (cpp-code/solvers.cpp:71-88) — expressible here as
    # adapt_tau=20, adapt_tau_shrink=10, adapt_band=20.
    adapt_tau_shrink: Optional[float] = None
    # x-update linear solve: "dct_pcg" (DCT-preconditioned CG, default),
    # "jacobi_pcg" (Jacobi-preconditioned CG, works under lattice sharding),
    # "dct_direct" (exact only when every knot has the same sample count),
    # "cg" (unpreconditioned).
    x_solver: str = "dct_pcg"
    cg_tol: float = 1e-6
    cg_max_iters: int = 100
    # When set, the x-update runs exactly this many PCG steps (no
    # convergence predicate) — deterministic cost, no while-loop overhead.
    cg_fixed_iters: Optional[int] = None
    # Fused Pallas kernels for the 2-D hot path (gram matvec + dual stage).
    # Auto-falls-back to the jnp path off-TPU, for p != 2, for lattices too
    # large for whole-block VMEM residency, or for the reduced block set.
    use_pallas: bool = True
    # Run the DCT preconditioner matmuls in bfloat16 (MXU runs 2-4x the
    # f32 rate).  Preconditioning quality is unaffected at CG level —
    # residuals and updates stay float32 — but M becomes slightly inexact,
    # so it is opt-in.
    precond_bf16: bool = False
    # The folded/packed-DCT fixed-step PCG x-update in plain XLA — the
    # production path for lattices above the whole-lattice-VMEM Pallas
    # gate (2048^2 / 4096^2 / 128^3).  Same numerics as the fused kernel
    # (bf16 MXU preconditioner matmuls, f32 weights and CG vectors).
    # False = the exact f32 tol-driven DCT-PCG (the independent
    # comparison arm of the matched-objective benchmark gate).
    xla_packed: bool = True
    # Run the packed-XLA x-update's CG in the SPECTRAL domain (D'D is the
    # diagonal eigenvalue array there): the Gram matvec and preconditioner
    # become diagonal multiplies, trading the stencil's HBM passes for
    # three extra MXU transforms per solve — the winning trade at 2048^2+
    # where the iteration is bandwidth-bound.  Only used where xla_packed
    # applies.
    spectral_cg: bool = True
    # Store the spectral-correction CG's block vectors (r, p, x-hat) in
    # bfloat16 (dot products still accumulate in float32; the initial
    # residual r0 stays exact f32 in the natural domain).  Halves the
    # elementwise HBM traffic of the CG loop — the measured wall at
    # 4096^2+ (docs/MATH.md 5; measured +20% at 4096^2, objective gap
    # 1.4e-7 vs f32 at Boyd convergence).  The iterative-refinement
    # structure keeps the storage error scaling with ||dx||, which
    # shrinks as ADMM converges, so Boyd residuals keep their f32 floor.
    # None = auto: on for lattices > 2^23 knots (bandwidth-bound regime;
    # at 2048^2 and below the extra converts measured slightly SLOWER),
    # off below.  Only used where spectral_cg runs.
    spectral_vec_bf16: Optional[bool] = None
    # Row-sharded tiled-kernel mode (parallel/tiled_shard.py): a small
    # static key from register_shard_mesh(mesh, axis) naming the device
    # mesh/axis the theta lattice's ROW axis is sharded over.  When set
    # (and the shapes qualify), the tiled dual/rhs/gram-residual stages
    # run per shard inside jax.shard_map with explicit ppermute halo
    # exchange, instead of falling back to unfused jnp stencils.  Set by
    # parallel/fit.py::_sharded_solver_config; None = unsharded.
    tiled_shard_key: Optional[int] = None
    # Auto-escape for the bf16-transform residual floor (unbatched
    # solves): extreme count density (counts >> 1/knot, m << sqrt(N))
    # floors the Boyd residuals ~2x above tol under the bf16 MXU
    # transforms, spinning the solve to the iteration cap with the
    # objective already exact to ~5e-7 (tests/test_xla_packed.py).  When
    # True, the solver detects the plateau in-loop (no improvement of
    # max(primal/eps, dual/eps) for ESCAPE_STALL_ITERS iterations) and
    # FINISHES with exact-f32 transforms within the same iteration cap.
    # Engaged only where an f32 dense-matrix preconditioner exists
    # (max(m) <= 2048 — exactly the dense-counts regime); beyond that,
    # xla_packed=False / jacobi_pcg remain the manual escapes.
    bf16_residual_escape: bool = True
    # Convergence-check cadence for the fused multi-iteration kernel: run
    # this many ADMM iterations per kernel launch between Boyd stopping
    # checks (state stays VMEM-resident in between).  1 = check every
    # iteration (exact reference stopping semantics); k > 1 may overshoot
    # convergence by up to k-1 iterations, which only polishes the
    # solution.  The reference iteration cap (max_iters, solvers.cpp:103)
    # is never overshot: the solver switches to per-iteration steps for
    # the final < k iterations before the cap.  None = auto: a small
    # chunk (solver/admm.py::AUTO_CHUNK) wherever the fused kernel
    # applies, 1 elsewhere.  Ignored where the fused kernel does not
    # apply.
    chunk_iters: Optional[int] = None
    # Include the all-ones (full mixed partial) difference block.  The
    # reference C++ includes it (utils.cpp:225-230); the reference Python
    # drops it when deltas are supplied (code/utils.py:145).
    include_full_mixed: bool = True
    # Stopping rule: "boyd" = relative primal/dual residuals (reference
    # C++, solvers.cpp:110-122); "theta_inf" = elementwise
    # |theta - theta_old| <= tol (reference Python prototype,
    # code/solvers.py:69).  The full prototype semantics are
    # SolverConfig(stop_rule="theta_inf", adapt_rho=False, tol=1e-3,
    # include_full_mixed=False, max_iters=5000) with rho0 = lambda and
    # initial_state(..., u_fill=1/lambda) (code/solvers.py:55-62).
    stop_rule: str = "boyd"

    def __post_init__(self):
        if self.x_solver not in ("dct_pcg", "jacobi_pcg", "dct_direct", "cg"):
            raise ValueError(f"unknown x_solver: {self.x_solver!r}")
        if self.stop_rule not in ("boyd", "theta_inf"):
            raise ValueError(f"unknown stop_rule: {self.stop_rule!r}")


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """Lambda-path configuration.

    The reference builds a decreasing log-spaced grid from lambda_max down
    to 1e-4*lambda_max (solvers.cpp:186-200) and warm-starts theta/u/rho
    across the path (solvers.cpp:212-219).
    """

    n_lambda: int = 100
    lambda_min_ratio: float = 1e-4
    # lambda_max estimate = scale * ||D (D'D)^+ O'y||_inf.
    # The C++ uses scale=5 (utils.cpp:354); the Python prototype instead
    # multiplies by prod(deltas) (code/solvers.py:116) -> mode "py".
    lam_max_mode: str = "cpp"
    lam_max_scale: float = 5.0
    # What to record along the path: "fitted" keeps per-lambda fitted values
    # and theta_hat (reference keeps full models, solvers.cpp:292-302);
    # "mse" keeps only per-lambda MSEs (cheap for huge meshes).
    store: str = "fitted"
    warm_start: bool = True

    def __post_init__(self):
        if self.lam_max_mode not in ("cpp", "py"):
            raise ValueError(f"unknown lam_max_mode: {self.lam_max_mode!r}")
        if self.store not in ("fitted", "mse"):
            raise ValueError(f"unknown store: {self.store!r}")


@dataclasses.dataclass(frozen=True)
class CVConfig:
    """K-fold cross-validation configuration.

    The reference shuffles fold labels i mod k (utils.cpp:367-376), solves
    the warm-started path per fold on the train split, evaluates held-out
    MSE per lambda, and refits the full data at the mean-CV-MSE-minimizing
    lambda (solvers.cpp:305-376).
    """

    folds: int = 5
    seed: int = 123
    # Solve all folds simultaneously as a batch axis (vmap) instead of a
    # Python loop.  Identical math; far better utilization.
    vmap_folds: bool = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh-generation configuration.

    eps: domain padding.  The reference C++ uses 1e-4 (utils.hpp:14), the
    Python prototype 0.01 (code/utils.py:183).
    delta_mode: per-axis delta (TV cell size) divisor.  The C++ computes
    (range+2*eps)/m (utils.cpp:260); the Python prototype uses the knot
    spacing (range+2*eps)/(m-1) (code/utils.py:187).
    """

    eps: float = 1e-4
    delta_mode: str = "cpp"

    def __post_init__(self):
        if self.delta_mode not in ("cpp", "py"):
            raise ValueError(f"unknown delta_mode: {self.delta_mode!r}")


DEFAULT_SOLVER = SolverConfig()
DEFAULT_PATH = PathConfig()
DEFAULT_CV = CVConfig()
DEFAULT_MESH = MeshConfig()


def sibling_profile(name: str):
    """Config bundles reproducing each reference sibling implementation's
    solver behavior (the four siblings differ in stopping rule, adaptive-
    rho constants, lambda grid and mesh EPS — SURVEY.md section 0).

    Returns (SolverConfig, PathConfig, MeshConfig).  Note rho0/u0 are
    runtime choices: the python/cpp_standalone siblings use rho0 = lambda
    and u_fill = 1/lambda (initial_state(..., u_fill=...)).

      "rcpp"           — the production R package (behavioral ground
                         truth): Boyd stopping TOL=1e-4, symmetric
                         adaptive rho tau=2/band=10, lam_max x5, grid
                         ratio 1e-4, EPS=1e-4 (rcpp-code .../solvers.cpp,
                         utils.hpp:14).
      "python"         — the scipy prototype: elementwise theta stopping
                         tol=1e-3, fixed rho, reduced block set, lam_max
                         x prod(deltas), EPS=0.01 (code/solvers.py:15-78,
                         code/utils.py:145,183).
      "cpp_standalone" — the standalone Armadillo port: elementwise
                         theta stopping tol=1e-3 (cpp-code/solvers.hpp:14),
                         ASYMMETRIC adaptive rho grow x20 / shrink /10 /
                         band 20 (cpp-code/solvers.cpp:71-88), unscaled
                         lam_max (cpp-code/utils.cpp lam_max_pinv), grid
                         ratio 1e-5 (cpp-code/solvers.cpp:187), cap 2000,
                         EPS=0.01 (cpp-code/utils.cpp:14).
    """
    if name == "rcpp":
        return SolverConfig(), PathConfig(), MeshConfig()
    if name == "python":
        return (
            SolverConfig(stop_rule="theta_inf", adapt_rho=False, tol=1e-3,
                         include_full_mixed=False, max_iters=5000),
            PathConfig(lam_max_mode="py"),
            MeshConfig(eps=0.01, delta_mode="py"),
        )
    if name == "cpp_standalone":
        return (
            SolverConfig(stop_rule="theta_inf", tol=1e-3, max_iters=2000,
                         adapt_rho=True, adapt_tau=20.0,
                         adapt_tau_shrink=10.0, adapt_band=20.0),
            PathConfig(lam_max_mode="cpp", lam_max_scale=1.0,
                       lambda_min_ratio=1e-5),
            MeshConfig(eps=0.01),
        )
    raise ValueError(f"unknown sibling profile: {name!r} "
                     "(expected rcpp | python | cpp_standalone)")
