"""Pallas ADMM kernel vs a plain-jnp reference of the same iteration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def reference_iterations(A, Minv, q, l, u, rho, x, z, y, iters, sigma=1e-6, alpha=1.6):
    for _ in range(iters):
        t = rho * z - y
        rhs = sigma * x - q + np.einsum("bmn,bm->bn", A, t)
        xt = np.einsum("bnk,bk->bn", Minv, rhs)
        axt = np.einsum("bmn,bn->bm", A, xt)
        x = alpha * xt + (1 - alpha) * x
        ax_rel = alpha * axt + (1 - alpha) * z
        z_new = np.clip(ax_rel + y / np.where(rho > 0, rho, 1.0), l, u)
        y = y + rho * (ax_rel - z_new)
        z = z_new
    return x, z, y


def make_problem(b=3, m=56, n=24, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(b, m, n)).astype(np.float32) * 0.3
    Q = rng.normal(size=(b, n, n)).astype(np.float32) * 0.1
    Minv = np.einsum("bij,bkj->bik", Q, Q) + np.eye(n, dtype=np.float32) * 0.5
    q = rng.normal(size=(b, n)).astype(np.float32)
    l = -np.abs(rng.normal(size=(b, m)).astype(np.float32))
    u = np.abs(rng.normal(size=(b, m)).astype(np.float32))
    rho = np.abs(rng.normal(size=(b, m)).astype(np.float32)) + 0.1
    x = rng.normal(size=(b, n)).astype(np.float32) * 0.1
    z = np.clip(rng.normal(size=(b, m)).astype(np.float32) * 0.1, l, u)
    y = rng.normal(size=(b, m)).astype(np.float32) * 0.1
    return A, Minv, q, l, u, rho, x, z, y


@pytest.mark.parametrize("iters", [1, 7])
def test_kernel_matches_reference(iters):
    from convex_mpc_tpu.mpc import kernels

    args = make_problem()
    x_ref, z_ref, y_ref = reference_iterations(*[a.copy() for a in args], iters=iters)
    A, Minv, q, l, u, rho, x, z, y = [jnp.asarray(a) for a in args]
    x_k, z_k, y_k = kernels.admm_iterations(
        A, Minv, q, l, u, rho, x, z, y, iters=iters, block_k=2
    )
    np.testing.assert_allclose(np.asarray(x_k), x_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(z_k), z_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y_k), y_ref, rtol=2e-4, atol=2e-4)


def test_kernel_on_real_qp():
    """Kernel iterations on the actual condensed MPC QP reach the optimum."""
    import sys

    sys.path.insert(0, "tests")
    import qp_oracle as oracle
    from convex_mpc_tpu.control.srb import SrbDynamics
    from convex_mpc_tpu.mpc import admm, condensed

    Q_DIAG = np.array([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], float)
    sc = oracle.trot_scenario(t0=0.123, vx=0.5, wz=0.5, seed=3)
    dyn = SrbDynamics(
        Ad=jnp.asarray(sc["Ad"], jnp.float32),
        Bd=jnp.asarray(sc["Bd"], jnp.float32),
        gd=jnp.asarray(sc["gd"], jnp.float32),
    )
    data, _ = condensed.build_condensed(
        dyn,
        jnp.asarray(sc["x0"], jnp.float32),
        jnp.asarray(sc["x_ref"], jnp.float32),
        jnp.asarray(sc["contact"]),
        jnp.asarray(Q_DIAG, jnp.float32),
        1e-5, 0.8, 10.0,
    )
    sol_ref = admm.solve(
        data, admm.init_state(data), max_iter=400,
        scaled_termination=True, eps_abs=1e-4, eps_rel=1e-4,
    )
    sol_k = admm.solve(
        data, admm.init_state(data), max_iter=400,
        scaled_termination=True, eps_abs=1e-4, eps_rel=1e-4,
        use_pallas=True,
    )
    u_ref = np.asarray(sol_ref.x).reshape(16, 12)
    u_k = np.asarray(sol_k.x).reshape(16, 12)
    scale = max(np.abs(u_ref).max(), 1.0)
    assert np.abs(u_k - u_ref).max() / scale < 0.005


def test_spd_inverse_interpret_matches_xla():
    """The Pallas SPD-inverse kernel (ops/chol_kernel.py) agrees with the
    XLA Cholesky + triangular-solve path at the f32 reassociation level
    (interpret mode — the kernel itself, not the CPU fallback)."""
    from convex_mpc_tpu.ops.chol_kernel import spd_inverse

    rng = np.random.default_rng(7)
    B, n = 5, 96
    M = rng.normal(size=(B, n, n)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, -1, -2) / n + 3.0 * np.eye(n, dtype=np.float32))
    out_k = spd_inverse(A, blk=32, block_k=2, interpret=True)
    L = jnp.linalg.cholesky(A)
    Li = jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), L.shape), lower=True
    )
    ref = jnp.matmul(jnp.swapaxes(Li, -1, -2), Li, precision=jax.lax.Precision.HIGHEST)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(ref), atol=5e-5 * scale, rtol=0
    )
    # and it actually inverts: A @ out ~ I
    resid = jnp.matmul(A, out_k, precision=jax.lax.Precision.HIGHEST) - jnp.eye(n)
    assert float(jnp.max(jnp.abs(resid))) < 1e-4


def _structured_problem(B=4, nb=64, seed=11):
    """A convergent structured ADMM problem: C blocks shaped like friction
    pyramids, Minv the true KKT inverse — iterates stay finite (the bitwise
    XLA/Pallas equivalence is specified for finite trajectories only; see
    mpc/kernels.py docstring)."""
    rng = np.random.default_rng(seed)
    nz, m_fr = nb * 3, nb * 4
    m = m_fr + nz
    mu = 0.8
    base = np.array(
        [[1, 0, mu], [-1, 0, mu], [0, 1, mu], [0, -1, mu]], np.float32
    )
    C = np.broadcast_to(base, (B, nb, 4, 3)).copy()
    C += 0.05 * rng.standard_normal(C.shape).astype(np.float32)
    box = (1.0 + 0.2 * rng.standard_normal((B, nz))).astype(np.float32)
    Pm = rng.standard_normal((B, nz, nz)).astype(np.float32) * 0.05
    Pm = Pm @ np.swapaxes(Pm, -1, -2) + np.eye(nz, dtype=np.float32)
    rho = (0.1 * (1.0 + 0.5 * rng.random((B, m)))).astype(np.float32)
    # dense A only to form the exact KKT inverse (f64) — never fed to the paths
    A = np.zeros((B, m, nz), np.float32)
    for b in range(B):
        for n in range(nb):
            A[b, n * 4:(n + 1) * 4, n * 3:(n + 1) * 3] = C[b, n]
        A[b, m_fr:, :] = np.diag(box[b])
    K = Pm.astype(np.float64) + 1e-6 * np.eye(nz) + np.einsum(
        "bmn,bm,bmk->bnk", A.astype(np.float64), rho.astype(np.float64), A.astype(np.float64)
    )
    Minv = np.linalg.inv(K).astype(np.float32)
    q = rng.standard_normal((B, nz)).astype(np.float32)
    l = np.full((B, m), -np.inf, np.float32)
    l[:, m_fr:] = -2.0
    u = np.full((B, m), 5.0, np.float32)
    x = rng.standard_normal((B, nz)).astype(np.float32) * 0.1
    z = np.clip(rng.standard_normal((B, m)).astype(np.float32) * 0.1, l, u)
    y = rng.standard_normal((B, m)).astype(np.float32) * 0.1
    return [jnp.asarray(a) for a in (C, box, Minv, q, l, u, rho, x, z, y)]


@pytest.mark.parametrize("iters", [1, 25, 150])
def test_structured_pair_bitwise(iters):
    """admm_iterations_structured (Pallas) == admm_iterations_structured_xla
    bit-for-bit over long chunks: the property that lets closed-loop
    certification transfer between the paths.

    On TPU this exercises the real Mosaic kernel and asserts BITWISE
    equality (also checked standalone by tools/check_bitexact_tpu.py). On
    CPU the kernel runs in interpret mode — same op sequence, but XLA's CPU
    backend FMA-fuses the two separately-jitted programs differently, so
    ulp-level differences appear (measured ~1e-7 absolute, stable over 150
    iterations — the contraction keeps them bounded); assert tight allclose
    there.
    """
    from convex_mpc_tpu.mpc import kernels

    args = _structured_problem()
    ax = kernels.admm_iterations_structured_xla(*args, iters=iters)
    ap = kernels.admm_iterations_structured(*args, iters=iters)
    on_tpu = jax.default_backend() == "tpu"
    for name, a, b in zip("xzy", ax, ap):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), f"{name}: XLA twin produced non-finite"
        if on_tpu:
            assert np.array_equal(a.view(np.uint32), b.view(np.uint32)), (
                f"{name}: max|d|={np.abs(a - b).max():.3e} nbad={(a != b).sum()}"
            )
        else:
            np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)
