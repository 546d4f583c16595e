"""Equivalence tests for ops/linalg.py and the bench-only blocked kernels.

``blocked_cholesky`` / ``blocked_tri_inverse`` (tools/blocked_linalg.py —
relocated out of the shipped package, they lost to refactor-on-demand and
the Pallas SPD inverse on the hot path) are the MXU-tiled alternatives to
XLA's monolithic batched factorizations, measured by
``tools/kkt_microbench.py`` and ``tools/solve_ablation.py``. Their
correctness is asserted here regardless so the microbenchmarks measure the
real operation.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.ops import linalg as lx

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import blocked_linalg as blx  # noqa: E402


def _spd_batch(key, batch, n, dtype=jnp.float32):
    A = jax.random.normal(key, (batch, n, n), dtype=dtype)
    return lx.mm(A, jnp.swapaxes(A, -1, -2)) + n * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize("n,block", [(192, 64), (128, 128), (64, 32)])
def test_blocked_cholesky_matches_xla(n, block):
    M = _spd_batch(jax.random.PRNGKey(0), 3, n)
    L_ref = jnp.linalg.cholesky(M)
    L_blk = blx.blocked_cholesky(M, block=block)
    scale = float(jnp.abs(L_ref).max())
    np.testing.assert_allclose(
        np.asarray(L_blk), np.asarray(L_ref), atol=2e-4 * scale
    )
    # strictly lower-triangular output (upper blocks exactly zero)
    iu = np.triu_indices(n, k=1)
    assert np.abs(np.asarray(L_blk)[:, iu[0], iu[1]]).max() == 0.0


@pytest.mark.parametrize("n,block", [(192, 64), (128, 64)])
def test_blocked_tri_inverse_matches_solve(n, block):
    M = _spd_batch(jax.random.PRNGKey(1), 3, n)
    L = jnp.linalg.cholesky(M)
    X = blx.blocked_tri_inverse(L, block=block)
    # X must satisfy L @ X = I to f32 working precision
    resid = lx.mm(L, X) - jnp.eye(n, dtype=L.dtype)
    assert float(jnp.abs(resid).max()) < 5e-5
    iu = np.triu_indices(n, k=1)
    assert np.abs(np.asarray(X)[:, iu[0], iu[1]]).max() == 0.0


def _go2_tick_matrices():
    """Real (M, A_step, J) from a perturbed Go2 config — the two matrices
    the arrow solver factors in production (leg.compute_torques,
    physics.step)."""
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.models import kinematics as K
    from convex_mpc_tpu.sim import physics as P

    dyn = D.build_dyn()
    plant = P.init_plant(dyn)
    q = plant.q.at[7:19].add(
        0.13 * jnp.sin(jnp.arange(12.0))
    )  # break symmetry
    M = D.mass_matrix(dyn, q)
    poses = K.fk(dyn.kin, q)
    J = jnp.stack(
        [K.point_jacobian(poses, poses.foot_w[l], 3 + 3 * l) for l in range(4)]
    )
    C = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (4, 3))) * 1e3
    A = M + 1e-3 * lx.ein("lij,li,lik->jk", J, C, J) + 0.01 * jnp.eye(18)
    return M, A, J


def test_tree_matrices_have_zero_cross_leg_blocks():
    # the structural premise of the arrow factorization: sibling legs never
    # couple, in M or in M + dt J'CJ
    M, A, _ = _go2_tick_matrices()
    scale = float(jnp.abs(M).max())
    for mat in (M, A):
        m = np.asarray(mat)
        for l1 in range(4):
            for l2 in range(4):
                if l1 == l2:
                    continue
                blk = m[6 + 3 * l1 : 9 + 3 * l1, 6 + 3 * l2 : 9 + 3 * l2]
                assert np.abs(blk).max() < 1e-5 * scale, (l1, l2)


def test_arrow_solve_matches_dense_cholesky():
    M, A, J = _go2_tick_matrices()
    rhs = J.reshape(12, 18).T  # (18, 12) — the controller's M^-1 J' solve
    for mat in (M, A):
        with jax.default_matmul_precision("highest"):
            chol = jnp.linalg.cholesky(mat)
            X_ref = jax.scipy.linalg.cho_solve((chol, True), rhs)
        X = lx.arrow_solve(lx.arrow_factor(mat), rhs)
        scale = float(jnp.abs(X_ref).max())
        np.testing.assert_allclose(
            np.asarray(X), np.asarray(X_ref), atol=5e-5 * scale
        )


def test_arrow_solve_batched_vector_rhs():
    M, A, _ = _go2_tick_matrices()
    Ab = jnp.stack([M, A])  # (2, 18, 18)
    r = jax.random.normal(jax.random.PRNGKey(4), (2, 18))
    x = jax.vmap(lambda a, ri: lx.arrow_solve(lx.arrow_factor(a), ri[:, None])[:, 0])(
        Ab, r
    )
    resid = jnp.einsum("bij,bj->bi", Ab, x) - r
    assert float(jnp.abs(resid).max()) < 1e-3


def test_inv3_exact():
    A = jax.random.normal(jax.random.PRNGKey(5), (7, 3, 3))
    A = lx.mm(A, jnp.swapaxes(A, -1, -2)) + 3 * jnp.eye(3)
    X = lx.inv3(A)
    resid = lx.mm(A, X) - jnp.eye(3)
    assert float(jnp.abs(resid).max()) < 1e-5


def test_blocked_kernels_compose_to_spd_inverse():
    # chol + tri-inverse compose to M^-1 = X' X — the KKT-setup identity the
    # microbench exercises (admm.py:245 uses the same Minv-as-matmul form).
    n = 192
    M = _spd_batch(jax.random.PRNGKey(2), 2, n)
    L = blx.blocked_cholesky(M, block=64)
    X = blx.blocked_tri_inverse(L, block=64)
    Minv = lx.mm(jnp.swapaxes(X, -1, -2), X)
    resid = lx.mm(M, Minv) - jnp.eye(n, dtype=M.dtype)
    assert float(jnp.abs(resid).max()) < 2e-3


def test_inv_small_unrolled_matches_linalg_inv():
    """Unrolled GJ inverse replaces jnp.linalg.inv for the polish's
    active-set Gram blocks (profiled ~57 ms/solve for the batched LU
    custom call vs ~0.1 ms unrolled).

    Two regimes:
    - well-conditioned blocks: GJ must match a f64 inverse tightly;
    - the polish's REAL structure — friction-face rows (+-1 / +-mu
      entries) + pinned box rows, rank <= 3 Grams + 1e-7*trace ridge:
      f32 is the limiting factor for ANY method there, so the criterion
      is parity with the f32 pivoted LU it replaces, on the quantities
      the polish consumes (C'(CC)^-1 v solves). The end-to-end gate is
      tests/test_polish_regression.py on real captured QPs.
    """
    from convex_mpc_tpu.ops.linalg import inv_small_unrolled

    rng = np.random.default_rng(3)
    # regime 1: SPD with bounded condition number
    M = rng.normal(size=(6, 32, 7, 7)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 3.0 * np.eye(7, dtype=np.float32))
    got = np.asarray(inv_small_unrolled(A))
    ref = np.linalg.inv(np.asarray(A, np.float64))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5

    # regime 2: real active-set structure (mu=0.8 friction faces, 0-2
    # pinned box rows per block), near-singular + polish ridge
    mu = 0.8
    faces = np.array([[1, 0, mu], [-1, 0, mu], [0, 1, mu], [0, -1, mu]],
                     np.float32)
    C = np.zeros((8, 64, 7, 3), np.float32)
    for b in range(8):
        for n in range(64):
            nact = rng.integers(1, 5)
            rows = rng.choice(4, size=nact, replace=False)
            C[b, n, :nact] = faces[rows]
            if rng.random() < 0.5:
                C[b, n, 4 + rng.integers(0, 3), rng.integers(0, 3)] = 1.0
    CC = np.einsum("bnkr,bnlr->bnkl", C, C)
    tr = np.maximum(np.einsum("bnkk->bn", CC), 1e-2)
    A = jnp.asarray(CC + (1e-7 * tr)[..., None, None] * np.eye(7, dtype=np.float32))
    ch = np.asarray(inv_small_unrolled(A))
    lu = np.asarray(jnp.linalg.inv(A))
    ref = np.linalg.inv(np.asarray(A, np.float64))
    v = rng.normal(size=(8, 64, 7)).astype(np.float32)
    s64 = np.einsum("bnkr,bnkl,bnl->bnr", C.astype(np.float64), ref, v)

    def err(Mi):
        s = np.einsum("bnkr,bnkl,bnl->bnr", C, Mi, v)
        return np.abs(s - s64).max()

    # near the ridge these blocks sit at the f32 limit for ANY method
    # (pivoted LU measures ~0.29 absolute on a ~4 scale); the criterion is
    # that the unrolled Cholesky stays in the same accuracy class as the
    # pivoted LU it replaces — unpivoted Gauss-Jordan fails this at ~3.3
    assert err(ch) < 1.5 * err(lu) + 1e-6, (err(ch), err(lu))


def test_inv_small_unrolled_non_spd_yields_nan():
    """An indefinite block must produce NaN rows (the explicit non-SPD
    signal the polish's certify() rejects), never a silently-wrong finite
    inverse from sqrt of a negative pivot."""
    from convex_mpc_tpu.ops.linalg import inv_small_unrolled

    A = np.eye(4, dtype=np.float32)[None].repeat(3, axis=0)
    A[1, 2, 2] = -1.0  # indefinite block
    out = np.asarray(inv_small_unrolled(jnp.asarray(A)))
    assert np.isfinite(out[0]).all() and np.isfinite(out[2]).all()
    assert np.isnan(out[1]).any()
