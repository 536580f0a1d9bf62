"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start; override it back so unit tests run on the virtual 8-device CPU host
# (fast, deterministic f32 matmuls) regardless of TPU tunnel state.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


# Smoke tier (`pytest -m smoke`): a <10-min subset covering the load-
# bearing contracts — rasterizer value+grad (tiled==oracle, pallas==xla,
# finite differences, overflow flags), the PLY byte contract, one real
# pipeline-chain link (train_gs on the toy workspace), and the
# multichip dryrun. The full suite stays the merge bar; this tier is
# for cheap gating while iterating.
_SMOKE = {
    "test_rasterizer.py::test_tiled_matches_oracle",
    "test_rasterizer.py::test_gradient_matches_finite_difference",
    "test_rasterizer.py::test_pallas_interpret_matches_xla",
    "test_rasterizer.py::test_pallas_backward_matches_xla_grads",
    "test_rasterizer.py::test_overflow_reporting",
    "test_gs_core.py::test_ply_roundtrip",
    "test_gs_core.py::test_ply_header_format",
    "test_pipelines.py::test_train_outputs",
    "test_graft_entry.py::test_dryrun_multichip_forces_cpu_in_fresh_subprocess",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        rel = nodeid.split("tests/")[-1].split("[")[0]
        if rel in _SMOKE:
            item.add_marker(pytest.mark.smoke)
