"""Float64 NumPy oracle for the centroidal MPC QP.

Independent (loop-based, readable) re-implementation of the QP the reference
builds in CasADi (reference centroidal_mpc.py), plus a high-accuracy solver:
long-run ADMM in float64 followed by an active-set "polish" (equality KKT
solve, like OSQP's polish step), and an independent KKT validator.

The KKT check breaks any circularity with the JAX solver under test: a point
satisfying stationarity + feasibility + complementarity to ~1e-9 IS the
unique optimum of this strictly convex QP, regardless of which algorithm
produced it.
"""

from __future__ import annotations

import numpy as np

NX, NU = 12, 12


# ----------------------------------------------------------------------------
# Assembly (independent of convex_mpc_tpu.mpc.qp — explicit loops, f64)
# ----------------------------------------------------------------------------
def assemble_qp(Ad, Bd, gd, x0, x_ref, contact, q_diag, r_value, mu, fz_min):
    """Returns dict(P, q, A, l, u) in float64, same row layout as mpc.qp."""
    n = x_ref.shape[0]
    nz = n * (NX + NU)
    Ad, Bd, gd, x0 = map(np.asarray, (Ad, Bd, gd, x0))
    x_ref = np.asarray(x_ref, dtype=float)
    contact = np.asarray(contact)

    P = np.zeros((nz, nz))
    for k in range(n):
        for i in range(NX):
            P[k * NX + i, k * NX + i] = 2.0 * q_diag[i]
    for k in range(n):
        base = n * NX + k * NU
        for i in range(NU):
            P[base + i, base + i] = 2.0 * r_value

    q = np.zeros(nz)
    for k in range(n):
        q[k * NX : (k + 1) * NX] = -2.0 * np.asarray(q_diag) * x_ref[k]

    # dynamics equalities
    A_eq = np.zeros((n * NX, nz))
    beq = np.zeros(n * NX)
    for k in range(n):
        A_eq[k * NX : (k + 1) * NX, k * NX : (k + 1) * NX] = np.eye(NX)
        if k > 0:
            A_eq[k * NX : (k + 1) * NX, (k - 1) * NX : k * NX] = -Ad
        A_eq[k * NX : (k + 1) * NX, n * NX + k * NU : n * NX + (k + 1) * NU] = -Bd[k]
        beq[k * NX : (k + 1) * NX] = gd.ravel()
    beq[0:NX] += Ad @ x0

    # friction pyramid
    n_fr = 4 * 4 * n
    A_fr = np.zeros((n_fr, nz))
    u_fr = np.full(n_fr, np.inf)
    l_fr = np.full(n_fr, -np.inf)
    r = 0
    for k in range(n):
        uk0 = n * NX + k * NU
        for leg in range(4):
            fx, fy, fz = 3 * leg, 3 * leg + 1, 3 * leg + 2
            for sgn, comp in [(1, fx), (-1, fx), (1, fy), (-1, fy)]:
                A_fr[r, uk0 + comp] = sgn
                A_fr[r, uk0 + fz] = -mu
                if contact[leg, k] == 1:
                    u_fr[r] = 0.0
                r += 1

    # box rows on U
    A_box = np.zeros((n * NU, nz))
    l_box = np.full(n * NU, -np.inf)
    u_box = np.full(n * NU, np.inf)
    for k in range(n):
        for leg in range(4):
            for axis in range(3):
                i = k * NU + 3 * leg + axis
                A_box[i, n * NX + i] = 1.0
                if contact[leg, k] == 0:
                    l_box[i] = 0.0
                    u_box[i] = 0.0
                elif axis == 2:
                    l_box[i] = fz_min

    A = np.vstack([A_eq, A_fr, A_box])
    l = np.concatenate([beq, l_fr, l_box])
    u = np.concatenate([beq, u_fr, u_box])
    return dict(P=P, q=q, A=A, l=l, u=u)


# ----------------------------------------------------------------------------
# High-accuracy solve: f64 ADMM + active-set polish
# ----------------------------------------------------------------------------
def solve_qp_f64(P, q, A, l, u, max_iter=20000, rho=0.1, eq_scale=1e3, sigma=1e-6, alpha=1.6):
    m, nz = A.shape
    is_eq = (u - l) < 1e-12
    rho_vec = np.where(is_eq, rho * eq_scale, rho)

    M = P + sigma * np.eye(nz) + A.T @ (rho_vec[:, None] * A)
    Minv = np.linalg.inv(M)

    x = np.zeros(nz)
    z = np.clip(np.zeros(m), l, u)
    y = np.zeros(m)
    for _ in range(max_iter):
        rhs = sigma * x - q + A.T @ (rho_vec * z - y)
        xt = Minv @ rhs
        axt = A @ xt
        x = alpha * xt + (1 - alpha) * x
        ax_rel = alpha * axt + (1 - alpha) * z
        z_new = np.clip(ax_rel + y / rho_vec, l, u)
        y = y + rho_vec * (ax_rel - z_new)
        z = z_new

    x, y = _polish(P, q, A, l, u, x, y)
    return x, y


def _polish(P, q, A, l, u, x, y, tol=1e-6):
    """Solve the equality-constrained QP on the active set implied by (x, y)."""
    ax = A @ x
    lower_active = (ax - l < tol) | (y < -tol)
    upper_active = (u - ax < tol) | (y > tol)
    active = lower_active | upper_active
    if not np.any(active):
        x_p = np.linalg.solve(P, -q)
        return x_p, np.zeros_like(y)
    A_act = A[active]
    b_act = np.where(upper_active, u, l)[active]
    n_act = A_act.shape[0]
    # regularized KKT (A_act may have dependent rows)
    K = np.block([[P, A_act.T], [A_act, -1e-12 * np.eye(n_act)]])
    rhs = np.concatenate([-q, b_act])
    sol = np.linalg.lstsq(K, rhs, rcond=None)[0]
    x_p = sol[: P.shape[0]]
    y_p = np.zeros_like(y)
    y_p[active] = sol[P.shape[0] :]
    # accept polish only if it satisfies KKT better than the input
    if kkt_residuals(P, q, A, l, u, x_p, y_p)[0] < kkt_residuals(P, q, A, l, u, x, y)[0]:
        return x_p, y_p
    return x, y


def kkt_residuals(P, q, A, l, u, x, y):
    """(max_residual, dict of parts). Small => (x, y) is the optimum."""
    ax = A @ x
    stat = np.max(np.abs(P @ x + q + A.T @ y))
    prim = np.max(np.maximum(ax - u, 0) + np.maximum(l - ax, 0))
    # complementarity: positive dual => at upper; negative dual => at lower
    finite_u = np.isfinite(u)
    finite_l = np.isfinite(l)
    comp_u = np.max(np.abs(np.maximum(y, 0) * np.where(finite_u, u - ax, 0.0))) if finite_u.any() else 0.0
    comp_l = np.max(np.abs(np.minimum(y, 0) * np.where(finite_l, ax - l, 0.0))) if finite_l.any() else 0.0
    dual_sign = np.max(np.abs(np.where(~finite_u, np.maximum(y, 0), 0.0))) + np.max(
        np.abs(np.where(~finite_l, np.minimum(y, 0), 0.0))
    )
    parts = dict(stat=stat, prim=prim, comp_u=comp_u, comp_l=comp_l, dual_sign=dual_sign)
    return max(parts.values()), parts


# ----------------------------------------------------------------------------
# Realistic trot scenario generator (shared test fixture data)
# ----------------------------------------------------------------------------
def trot_scenario(t0=0.0, n=16, vx=0.5, vy=0.0, wz=0.0, yaw0=0.0, seed=0):
    """Build (Ad, Bd, gd, x0, x_ref, contact) for a plausible trot instance."""
    from scipy.signal import cont2discrete

    rng = np.random.default_rng(seed)
    period, duty = 1 / 3.0, 0.6
    dt = period / n
    offsets = np.array([0.5, 0.0, 0.0, 0.5])
    t = t0 + np.arange(n) * dt + dt / 2
    phases = np.mod(offsets[:, None] + t[None, :] / period, 1.0)
    contact = (phases < duty).astype(np.int32)

    mass = 15.1
    inertia = np.diag([0.1, 0.25, 0.3])
    x0 = np.zeros(12)
    x0[2] = 0.27 + rng.normal() * 0.005
    x0[5] = yaw0
    x0[6] = vx + rng.normal() * 0.05
    x0[7] = vy + rng.normal() * 0.05

    x_ref = np.zeros((n, 12))
    tv = (np.arange(n) + 1) * dt
    x_ref[:, 0] = x0[0] + vx * tv
    x_ref[:, 1] = x0[1] + vy * tv
    x_ref[:, 2] = 0.27
    x_ref[:, 5] = yaw0 + wz * tv
    x_ref[:, 6] = vx
    x_ref[:, 7] = vy
    x_ref[:, 11] = wz

    hips = np.array(
        [[0.19, 0.14, -0.27], [0.19, -0.14, -0.27], [-0.19, 0.14, -0.27], [-0.19, -0.14, -0.27]]
    )
    r = np.zeros((n, 4, 3))
    for k in range(n):
        for leg in range(4):
            if contact[leg, k]:
                r[k, leg] = hips[leg] + rng.normal(size=3) * 0.01

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    yaw_avg = float(np.mean(x_ref[:, 5]))
    Rz = np.array(
        [[np.cos(yaw_avg), -np.sin(yaw_avg), 0], [np.sin(yaw_avg), np.cos(yaw_avg), 0], [0, 0, 1]]
    )
    Ac = np.zeros((12, 12))
    Ac[0:3, 6:9] = np.eye(3)
    Ac[3:6, 9:12] = Rz.T
    I_inv = np.linalg.inv(inertia)
    Bd = np.zeros((n, 12, 12))
    Ad = None
    for k in range(n):
        Bc = np.zeros((12, 12))
        for leg in range(4):
            Bc[6:9, 3 * leg : 3 * leg + 3] = np.eye(3) / mass
            Bc[9:12, 3 * leg : 3 * leg + 3] = I_inv @ skew(r[k, leg])
        Ad, Bd[k], *_ = cont2discrete((Ac, Bc, np.eye(12), np.zeros((12, 12))), dt, method="zoh")
    gc = np.zeros(12)
    gc[8] = -9.81
    E = np.eye(12) * dt + Ac * dt * dt / 2
    gd = E @ gc
    return dict(
        Ad=Ad, Bd=Bd, gd=gd, x0=x0, x_ref=x_ref, contact=contact, r=r, mass=mass,
        inertia=inertia, dt=dt, yaw_avg=yaw_avg,
    )
