"""MultivarTV-TPU: TPU-native multivariate total-variation denoising.

A ground-up JAX/XLA/Pallas re-design of the capability of the reference
MultivarTV package (mesh-based solutions to multivariate TV denoising via
ADMM; see reference rcpp-code/MultivarTV/src/solvers.cpp and code/solvers.py).

Design highlights (TPU-first, not a port):
  * theta lives as a p-dim array; index algebra dissolves into shapes.
  * The difference operator D (all 2^p-1 first/mixed partials) is a
    matrix-free stencil; its Gram D'D is *exactly* diagonalized by the
    p-dim DCT-II with closed-form eigenvalues.
  * O'O is exactly diagonal (per-knot sample counts); the ADMM x-update
    solves (diag(c) + rho*D'D) theta = b by DCT-preconditioned CG.
  * The ADMM loop is a single jitted lax.while_loop with Boyd residual
    stopping and adaptive rho; lambda paths are lax.scan with warm starts;
    CV folds and independent problems batch via vmap.
  * The lattice shards over a jax.sharding.Mesh for large problems
    (halo exchanges inserted by the XLA SPMD partitioner or explicitly
    via shard_map + ppermute in multivartv_tpu.parallel).
"""

from multivartv_tpu.config import SolverConfig, PathConfig, CVConfig
from multivartv_tpu.mesh import MeshSpec, make_mesh_spec, gen_mesh
from multivartv_tpu.api import MVTVModel, mvtv, mvtv_one, predict_mvtv

__version__ = "0.1.0"

__all__ = [
    "SolverConfig",
    "PathConfig",
    "CVConfig",
    "MeshSpec",
    "make_mesh_spec",
    "gen_mesh",
    "MVTVModel",
    "mvtv",
    "mvtv_one",
    "predict_mvtv",
]
