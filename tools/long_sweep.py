"""Checkpointed, resumable long scenario sweep.

Runs a large randomized-command scenario batch for many seconds of sim time,
checkpointing the full batch state (utils.checkpoint) after every chunk so a
pod-scale sweep survives preemption: re-running the same command line picks
up from the last completed chunk. Per-chunk upright/tracking metrics are
appended to a JSONL next to the checkpoint.

Usage:
  python tools/long_sweep.py --batch 1024 --seconds 30 --out artifacts/sweep
  # interrupted? re-run the same command; it resumes from the checkpoint
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--chunk-cycles", type=int, default=50, help="cycles per chunk (1 s)")
    ap.add_argument("--solver-iters", type=int, default=400)
    ap.add_argument("--adaptive", action="store_true",
                    help="batch-global adaptive solver (production config; "
                    "--solver-iters becomes the escalation cap)")
    ap.add_argument("--out", default="artifacts/sweep")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.sim import scenarios as S
    from convex_mpc_tpu.utils import checkpoint as C

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    ckpt = out.with_suffix(".npz")
    meta_path = out.with_suffix(".meta.json")
    jsonl = out.with_suffix(".metrics.jsonl")

    dyn = D.build_dyn()
    batch = S.velocity_sweep(dyn, args.batch, seed=args.seed)
    total_chunks = int(round(args.seconds * 50)) // args.chunk_cycles

    start_chunk = 0
    if ckpt.exists() and meta_path.exists():
        meta = json.loads(meta_path.read_text())
        if meta.get("batch") == args.batch and meta.get("seed") == args.seed:
            batch = C.load_pytree(ckpt, batch)
            start_chunk = meta["chunks_done"]
            print(f"[long-sweep] resuming at chunk {start_chunk}/{total_chunks}")
        else:
            print("[long-sweep] checkpoint config mismatch; starting fresh")

    t_start = time.perf_counter()
    for chunk in range(start_chunk, total_chunks):
        t0 = time.perf_counter()
        batch, metrics, _ = S.simulate_batch(
            dyn, batch, n_cycles=args.chunk_cycles,
            solver_iters=args.solver_iters, adaptive=args.adaptive,
        )
        jax.block_until_ready(batch)
        dt = time.perf_counter() - t0
        up = float(np.asarray(metrics["upright"]).mean())
        rec = dict(
            chunk=chunk + 1,
            sim_s=round((chunk + 1) * args.chunk_cycles / 50.0, 1),
            upright_frac=round(up, 4),
            height_mean=round(float(np.asarray(metrics["height"]).mean()), 4),
            vx_err_mean=round(float(np.asarray(metrics["vx_err"]).mean()), 4),
            wall_s=round(dt, 1),
            solves_per_s=round(args.batch * args.chunk_cycles / dt, 1),
        )
        with jsonl.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        C.save_pytree(ckpt, batch)
        meta_path.write_text(json.dumps(dict(
            batch=args.batch, seed=args.seed, chunks_done=chunk + 1,
            chunk_cycles=args.chunk_cycles, solver_iters=args.solver_iters,
            adaptive=args.adaptive,
        )))
        print(f"[long-sweep] {json.dumps(rec)}")
    wall = time.perf_counter() - t_start
    print(f"[long-sweep] done: {total_chunks * args.chunk_cycles} cycles x "
          f"{args.batch} scenarios in {wall:.0f}s (this run)")


if __name__ == "__main__":
    main()
