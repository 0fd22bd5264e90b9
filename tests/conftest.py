"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on virtual CPU devices (the real
environment has a single TPU chip); see SURVEY.md §4 for the test-strategy
rationale (the reference ships no tests at all).
"""

import os

# Force CPU for tests even when the session env points at a TPU platform:
# tests validate numerics at f32 and sharding on 8 virtual devices. The
# env var alone is not enough (the axon TPU plugin overrides it), so also
# set the config flag before any jax usage.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (dozens of
# distinct jit graphs on a 2-vCPU host); caching XLA executables across
# runs cuts repeat wall time by an order of magnitude. Safe to share
# across xdist workers (the cache is process-safe, keyed by HLO hash).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# --- quick tier -------------------------------------------------------------
# `pytest -m quick` is the CI/judge fast-signal tier (VERDICT.md round-2 #9):
# goldens, camera math, PLY round-trip, one rasterizer parity check, one
# nano train step. Auto-marked here so individual files stay unannotated.
import pytest  # noqa: E402

_QUICK_MODULES = {"test_camera", "test_golden_unet"}
_QUICK_TESTS = {
    "test_io_infer.py::test_ply_roundtrip",
    "test_io_infer.py::test_ply_prunes_low_opacity",
    "test_io_infer.py::test_rotvec_to_rotmat",
    "test_rasterizer.py::test_render_single_gaussian_analytic",
    "test_rasterizer.py::test_render_occlusion_order",
    "test_model.py::test_activations",
    "test_train.py::test_loss_decreases",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("/")[-1]
        mod = name.split("::")[0].removesuffix(".py")
        if mod in _QUICK_MODULES or name.split("[")[0] in _QUICK_TESTS:
            item.add_marker(pytest.mark.quick)
