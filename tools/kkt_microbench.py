"""Microbenchmark of KKT-setup primitive candidates on the real TPU.

The ADMM solver's setup (reference capability: OSQP's cached refactorization,
/root/reference/convex_mpc/centroidal_mpc.py:20-38) re-factorizes
M(rho) = P + sigma*I + rho*K per rho segment. This script measures, at the
production shape (B=512, n=192, f32), every way of producing M^-1 so the
engine can pick the fastest:

  a) current path: cholesky + monolithic triangular inverse + matmul
  b) blocked triangular inverse (ops.linalg.blocked_tri_inverse)
  c) blocked cholesky (ops.linalg.blocked_cholesky)
  d) batched eigh of the whitened K (one-time cost; per-segment refactor
     becomes diag-rescale + one matmul)

Run:  python tools/kkt_microbench.py [--batch 512] [--n 192]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from convex_mpc_tpu.ops import linalg as lx

sys.path.insert(0, str(Path(__file__).resolve().parent))
import blocked_linalg as blx  # noqa: E402


def best_of(fn, *args, n=5):
    fn(*args)  # compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    B, n = args.batch, args.n

    key = jax.random.PRNGKey(0)
    G = jax.random.normal(key, (B, n, n), jnp.float32)
    M = lx.mm(G, jnp.swapaxes(G, -1, -2)) + 10.0 * jnp.eye(n, dtype=jnp.float32)
    K = lx.mm(G, jnp.swapaxes(G, -1, -2))
    eye = jnp.eye(n, dtype=jnp.float32)

    chol = jax.jit(jnp.linalg.cholesky)
    L = chol(M)
    jax.block_until_ready(L)

    @jax.jit
    def tri_inv_mono(L):
        return jax.scipy.linalg.solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)

    @jax.jit
    def tri_inv_blocked(L):
        return blx.blocked_tri_inverse(L, block=64)

    @jax.jit
    def minv_from_linv(Linv):
        return jnp.matmul(jnp.swapaxes(Linv, -1, -2), Linv, precision=lax.Precision.HIGHEST)

    @jax.jit
    def current_setup(M):
        L = jnp.linalg.cholesky(M)
        Linv = jax.scipy.linalg.solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)
        return minv_from_linv(Linv)

    @jax.jit
    def blocked_setup(M):
        L = blx.blocked_cholesky(M, block=64)
        Linv = blx.blocked_tri_inverse(L, block=64)
        return minv_from_linv(Linv)

    @jax.jit
    def eigh_sym(K):
        return jnp.linalg.eigh(K)

    @jax.jit
    def eig_refactor(W, lam, rho):
        scale = 1.0 / (1.0 + rho[..., None] * lam)
        return jnp.matmul(W * scale[..., None, :], jnp.swapaxes(W, -1, -2),
                          precision=lax.Precision.HIGHEST)

    @jax.jit
    def mm_default(A, B):
        return jnp.matmul(A, B, precision=lax.Precision.DEFAULT)

    @jax.jit
    def mm_bf16(A, B):
        return jnp.matmul(A.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @jax.jit
    def trisolve_1rhs(L, b):
        return jax.scipy.linalg.solve_triangular(L, b, lower=True)

    with jax.default_matmul_precision("highest"):
        r = {}
        r["cholesky"] = best_of(chol, M, n=args.reps)
        r["tri_inv_monolithic"] = best_of(tri_inv_mono, L, n=args.reps)
        r["tri_inv_blocked64"] = best_of(tri_inv_blocked, L, n=args.reps)
        Linv = tri_inv_mono(L)
        r["minv_matmul"] = best_of(minv_from_linv, Linv, n=args.reps)
        r["matmul_default"] = best_of(mm_default, Linv, M, n=args.reps)
        r["matmul_bf16"] = best_of(mm_bf16, Linv, M, n=args.reps)
        b1 = jnp.ones((B, n), jnp.float32)
        r["trisolve_1rhs"] = best_of(trisolve_1rhs, L, b1, n=args.reps)
        r["setup_current(1seg)"] = best_of(current_setup, M, n=args.reps)
        r["setup_blocked(1seg)"] = best_of(blocked_setup, M, n=args.reps)
        try:
            r["blocked_cholesky"] = best_of(jax.jit(lambda M: blx.blocked_cholesky(M, 64)), M, n=args.reps)
        except Exception as exc:  # pragma: no cover
            print("blocked_cholesky failed:", exc)
        try:
            r["eigh"] = best_of(eigh_sym, K, n=args.reps)
            lam, W = eigh_sym(K)
            r["eig_refactor(1seg)"] = best_of(
                eig_refactor, W, lam, jnp.full((B,), 0.37, jnp.float32), n=args.reps
            )
        except Exception as exc:  # pragma: no cover
            print("eigh failed:", exc)

    print(f"\nB={B} n={n} f32, best of {args.reps} ({jax.devices()[0].platform})")
    for k, v in sorted(r.items(), key=lambda kv: kv[1]):
        print(f"  {k:24s} {v * 1e3:9.2f} ms")
    cur4 = 4 * r["setup_current(1seg)"]
    print(f"\n  4-segment current setup: {cur4 * 1e3:.1f} ms")
    if "eigh" in r:
        eig4 = (
            r["cholesky"] + r["tri_inv_blocked64"] + 2 * r["minv_matmul"]
            + r["eigh"] + 4 * r["eig_refactor(1seg)"]
        )
        print(f"  eig-path (chol+triinv+2mm+eigh+4 refac): {eig4 * 1e3:.1f} ms")
    blk4 = 4 * r["setup_blocked(1seg)"]
    print(f"  4-segment blocked setup: {blk4 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
