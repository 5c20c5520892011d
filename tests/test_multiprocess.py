"""Multi-controller (2-process) sharded matching == single-process.

Runs tools/multihost_check.py: two `jax.distributed`-initialized CPU
processes forming one global 8-device mesh, DB rows sharded across both,
one SPMD localization program launched from both controllers. This
exercises the true multi-process path that the in-process virtual-mesh
tests (test_sharded_match.py) cannot (SURVEY.md section 2.3; round-1
VERDICT missing #6).
"""

import pytest
import os
import subprocess
import sys


@pytest.mark.slow
def test_two_process_multicontroller_matches_single():
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "multihost_check.py",
    )
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=850,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "PASS" in proc.stdout
