"""Post-fix stress gate for the XLA:CPU collective-rendezvous hazard.

The r2/r3 order-dependent NaN was root-caused to in-process CPU
collectives rendezvousing on (run_id, op_id): a multi-trip `lax.scan`
re-executes the same collective instruction every trip, so all trips
share one rendezvous key and a straggler from trip i can be joined by
peers at trip i+1 (use_count CHECK, NaN, or a silently WRONG finite
loss). The fix (`ops/lanczos.py:_collective_safe_unroll`) fully unrolls
such loops on CPU. Because the hazard is load-dependent (thread
starvation on the 8-virtual-device mesh), a single green run proves
nothing — this gate re-runs the exact failing scenario many times via
`scripts/repro_ada_nan.py`, which now also fails on finite-but-wrong
losses against an unsharded reference (VERDICT r3 weak #6).

Runs in the default suite (marked `slow`; deselect with `-m "not
slow"`). One-command re-certification at higher iteration counts:

    env -u PYTHONPATH -u JAX_PLATFORMS python scripts/repro_ada_nan.py 150
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "repro_ada_nan.py")


@pytest.mark.slow
def test_rendezvous_stress_50_iterations():
    env = dict(os.environ)
    # The repro script pins its own backend config (JAX_PLATFORMS=cpu
    # pre-import); strip the axon sitecustomize so `import jax` cannot
    # wedge on the TPU tunnel.
    env.pop("PYTHONPATH", None)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, SCRIPT, "50"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-4000:]
    assert "RESULT: 50 iterations, 0 non-finite/wrong-loss hits" in res.stdout
