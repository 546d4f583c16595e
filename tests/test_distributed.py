"""Two-process jax.distributed smoke test (multi-host path, CPU transport).

Exercises parallel.mesh.init_distributed end to end: two OS processes form a
jax.distributed cluster over a localhost coordinator, build the shared
global device view, and run a psum across process boundaries — the same
code path a multi-host TPU pod uses (SURVEY.md section 5.8), minus the ICI
transport. Runs as subprocesses so the parent test process's jax config is
untouched.
"""

from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from convex_mpc_tpu.parallel import mesh as M

proc = int(sys.argv[1])
M.init_distributed(coordinator={coord!r}, num_processes=2, process_id=proc)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == proc

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = M.make_mesh()  # global devices: one per process
assert mesh.devices.size == 2, mesh.devices

# each process contributes its local shard of a length-2 global array;
# psum inside shard_map must see BOTH shards (cross-process all-reduce)
local = jnp.asarray([float(proc + 1)])  # proc 0 -> [1], proc 1 -> [2]
glob = jax.make_array_from_single_device_arrays(
    (2,), NamedSharding(mesh, P(M.BATCH_AXIS)), [local]
)

def f(x):
    return jax.lax.psum(jnp.sum(x), M.BATCH_AXIS)

out = jax.jit(
    jax.shard_map(f, mesh=mesh, in_specs=P(M.BATCH_AXIS), out_specs=P(),
                  check_vma=False)
)(glob)
total = float(np.asarray(out))
assert abs(total - 3.0) < 1e-6, total
print(f"proc {{proc}} psum ok: {{total}}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO), coord=coord))
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "psum ok: 3.0" in out, out
