"""End-to-end: the full controller walks the Go2 in MuJoCo (reference setup).

Runs examples/mujoco_loop.py (controller at 48 Hz + MuJoCo at 1 kHz, the
reference test_MPC.py configuration) as a subprocess and checks the built-in
upright/tracking verdict. This is the strongest cross-validation: the whole
TPU control stack against an independent physics engine.
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_controller_walks_in_mujoco():
    res = subprocess.run(
        [
            sys.executable, str(ROOT / "examples" / "mujoco_loop.py"),
            "--cpu", "--seconds", "1.5", "--vx", "0.4",
        ],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-2000:]}"
    assert "upright: True" in res.stdout
