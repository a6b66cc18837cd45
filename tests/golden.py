"""Golden float64 NumPy/SciPy implementation of the reference math.

An independent re-derivation (Kronecker-product construction, exact sparse
solves) of the reference's ADMM — used to validate the TPU solver's
objective values and solutions.  This mirrors the *semantics* of
rcpp-code/MultivarTV/src/solvers.cpp (admm_update, adapt_step, Boyd
stopping) without sharing any code with it.

Lattice flat order here is C order (last axis fastest) to match the TPU
package's internal addressing; the reference's axis-0-fastest order only
matters at its API boundary, which tests cover separately via
mesh.flatten_ref_order.
"""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def diff_matrix(n):
    return sp.diags([[-1.0] * (n - 1), [1.0] * (n - 1)], [0, 1],
                    shape=(n - 1, n)).tocsr()


def build_block(m, b):
    """One D block as a Kronecker product, C-order flattening."""
    out = sp.identity(1, format="csr")
    for mj, bj in zip(m, b):
        f = diff_matrix(mj) if bj else sp.identity(mj, format="csr")
        out = sp.kron(out, f, format="csr")
    return out


def fd_binaries(p, include_full_mixed=True):
    ordered = [tuple((n >> (p - 1 - j)) & 1 for j in range(p))
               for n in range(1, (1 << p) - 1)]
    ones = tuple([1] * p)
    if include_full_mixed:
        return [ones] + ordered
    return ordered if p > 1 else [ones]


def build_D(m, deltas, include_full_mixed=True):
    blocks = []
    for b in fd_binaries(len(m), include_full_mixed):
        scale = np.prod([d ** (1 - bj) for d, bj in zip(deltas, b)])
        blocks.append(scale * build_block(m, b))
    return sp.vstack(blocks).tocsr()


def build_O(flat_idx, ntheta):
    n = len(flat_idx)
    return sp.csr_matrix(
        (np.ones(n), (np.arange(n), np.asarray(flat_idx))), shape=(n, ntheta))


def soft(z, lam):
    return np.sign(z) * np.maximum(np.abs(z) - lam, 0.0)


def admm_golden(flat_idx, y, m, deltas, lam, rho0=None, theta0=None,
                u0=None, tol=1e-4, max_iters=3000, adapt=True,
                include_full_mixed=True):
    """Reference-semantics ADMM with exact sparse solves (float64)."""
    ntheta = int(np.prod(m))
    O = build_O(flat_idx, ntheta)
    D = build_D(m, deltas, include_full_mixed)
    rows_d = D.shape[0]
    crossO = (O.T @ O).tocsc()
    crossD = (D.T @ D).tocsc()
    oty = O.T @ np.asarray(y, float)

    theta = np.full(ntheta, np.mean(y)) if theta0 is None else np.asarray(theta0, float).copy()
    u = np.zeros(rows_d) if u0 is None else np.asarray(u0, float).copy()
    rho = lam if rho0 is None else float(rho0)
    alpha = D @ theta

    dual_norm = primal_norm = 1.0
    eps_dual = eps_primal = tol
    counter = 0
    while dual_norm > eps_dual or primal_norm > eps_primal:
        uold = u.copy()
        b = oty + rho * (D.T @ (alpha + u))
        theta = spla.spsolve((crossO + rho * crossD).tocsc(), b)
        d_theta = D @ theta
        alpha = soft(d_theta - u, lam / rho)
        primal_res = alpha - d_theta
        u = u + primal_res
        dual_res = rho * (D.T @ (u - uold))
        dual_norm = np.linalg.norm(dual_res)
        primal_norm = np.linalg.norm(primal_res)
        eps_dual = tol * (np.sqrt(ntheta) + np.linalg.norm(D.T @ u))
        eps_primal = tol * (np.sqrt(rows_d) +
                            max(np.linalg.norm(d_theta), np.linalg.norm(alpha)))
        if adapt:
            if primal_norm > 10 * dual_norm:
                rho *= 2.0
                u /= 2.0
            elif dual_norm > 10 * primal_norm:
                rho /= 2.0
                u *= 2.0
        counter += 1
        if counter > max_iters:
            break
    return dict(theta=theta, u=u, rho=rho, counter=counter, O=O, D=D)


def admm_golden_py(flat_idx, y, m, deltas, lam, theta0=None, tol=1e-3,
                   max_iters=5000, include_full_mixed=False):
    """Reference *Python prototype* ADMM semantics (code/solvers.py:15-78):
    fixed rho = lambda, u0 = 1/lambda fill, elementwise |theta - thetaold|
    <= tol stopping, one LU factorization (rho never changes).  The
    prototype's create_D drops the all-ones block when deltas are supplied
    (code/utils.py:145), hence include_full_mixed=False by default."""
    ntheta = int(np.prod(m))
    O = build_O(flat_idx, ntheta)
    D = build_D(m, deltas, include_full_mixed)
    rows_d = D.shape[0]
    oty = O.T @ np.asarray(y, float)
    rho = float(lam)
    lu = spla.splu(((O.T @ O) + rho * (D.T @ D)).tocsc())

    theta = (np.full(ntheta, np.mean(y)) if theta0 is None
             else np.asarray(theta0, float).copy())
    alpha = D @ theta
    u = np.full(rows_d, 1.0 / float(lam))
    thetaold = theta - 1.0

    counter = 0
    while np.any(np.abs(theta - thetaold) > tol):
        thetaold = theta
        b = oty + rho * (D.T @ (alpha + u))
        theta = lu.solve(b)
        d_theta = D @ theta
        alpha = soft(d_theta - u, lam / rho)
        u = u + alpha - d_theta
        counter += 1
        if counter > max_iters:
            break
    return dict(theta=theta, u=u, rho=rho, counter=counter, O=O, D=D)


def objective(flat_idx, y, m, deltas, theta, lam, include_full_mixed=True):
    ntheta = int(np.prod(m))
    O = build_O(flat_idx, ntheta)
    D = build_D(m, deltas, include_full_mixed)
    r = np.asarray(y, float) - O @ np.asarray(theta, float).reshape(-1)
    return 0.5 * float(r @ r) + lam * float(np.abs(D @ theta.reshape(-1)).sum())


def lam_max_golden(flat_idx, y, m, deltas, mode="cpp", include_full_mixed=True):
    ntheta = int(np.prod(m))
    O = build_O(flat_idx, ntheta)
    D = build_D(m, deltas, include_full_mixed)
    oty = O.T @ np.asarray(y, float)
    gram = (D.T @ D).toarray()
    x = np.linalg.pinv(gram) @ oty
    tune = np.abs(D @ x).max()
    if mode == "cpp":
        return 5.0 * tune
    return tune * np.prod(deltas)


def myexp2(x1, x2):
    """The reference's bivariate demo function (code/test_solvers.py:6-11)."""
    z = 2 * np.maximum(0, x1 + x2)
    return np.exp(z) - (z + z ** 2 / 2 + z ** 3 / 6)
