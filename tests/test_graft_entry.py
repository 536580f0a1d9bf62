"""Driver-contract regression tests for ``__graft_entry__``.

Round-1 regression: the driver ran ``dryrun_multichip`` WITHOUT exporting
``JAX_PLATFORMS=cpu`` and the axon sitecustomize (which force-sets
``jax_platforms="axon,cpu"`` in every interpreter) routed it onto the
remote TPU, where it died on a libtpu version mismatch.
``dryrun_multichip`` must therefore self-force the virtual CPU platform.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_forces_cpu_in_fresh_subprocess():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_PLATFORM_NAME")}
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"dryrun_multichip failed without JAX env vars:\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert "gs dp step ok" in proc.stdout
    for tag in ("plain", "warp", "pose_cond"):
        assert f"svd controlnet dp step [{tag}] ok" in proc.stdout


def test_force_cpu_platform_in_process():
    # Under conftest the CPU backend (8 virtual devices) is already live;
    # _force_cpu_platform must accept that state rather than re-exec.
    import __graft_entry__ as g

    assert g._force_cpu_platform(8) is True
