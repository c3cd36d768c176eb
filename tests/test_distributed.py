"""Two-process `jax.distributed` rehearsal as a CI test (VERDICT r3 #6).

Spawns two real OS processes (4 virtual CPU devices each), initializes the
distributed runtime, and runs the pair-sharded matcher + psum-reduced BA
over the 2x4 (dcn, ici) mesh — the actual multi-host code path
(parallel/mesh.py init_distributed), not the single-process virtual-mesh
approximation the rest of the suite uses.
"""

import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

ROOT = Path(__file__).resolve().parents[1]


def test_two_process_rehearsal():
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "distributed_rehearsal.py")],
        capture_output=True, text=True, timeout=560, cwd=str(ROOT),
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "REHEARSAL_OK procs=2" in out.stdout
