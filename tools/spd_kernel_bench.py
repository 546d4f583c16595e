"""Scan-chained microbench of ops.chol_kernel.spd_inverse vs block_k.

Standalone op timings lie on this backend (see STATUS.md measurement
discipline): reps are chained inside one jitted lax.scan with a
data-dependence (previous output's trace perturbs the next input's ridge)
so XLA cannot hoist the call and the ~25 ms tunnel dispatch is amortized.

Run: python tools/spd_kernel_bench.py [--batch 512] [--n 192] [--reps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from convex_mpc_tpu.ops.chol_kernel import spd_inverse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--block_k", type=int, nargs="+", default=[8])
    ap.add_argument("--blk", type=int, nargs="+", default=[32])
    args = ap.parse_args()
    B, n, reps = args.batch, args.n, args.reps

    key = jax.random.PRNGKey(0)
    G = jax.random.normal(key, (B, n, n), jnp.float32)
    M = jnp.matmul(G, jnp.swapaxes(G, -1, -2)) + 10.0 * jnp.eye(
        n, dtype=jnp.float32
    )
    eye = jnp.eye(n, dtype=jnp.float32)

    for blk in args.blk:
        for bk in args.block_k:
            @partial(jax.jit, static_argnames=())
            def run(A):
                def body(carry, _):
                    eps = carry * 1e-12
                    out = spd_inverse(A + eps * eye, blk=blk, block_k=bk)
                    return jnp.abs(out[0, 0, 0]), out[0, 0, 0]
                c, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
                return c, outs

            out = run(M)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(M)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            # residual check on one call
            inv = spd_inverse(M, blk=blk, block_k=bk)
            resid = float(jnp.max(jnp.abs(jnp.matmul(M, inv) - eye)))
            print(
                f"blk={blk:3d} block_k={bk:3d}: {1e3 * best / reps:8.3f} ms/call"
                f"  max|MA-I|={resid:.3e}"
            )


if __name__ == "__main__":
    main()
