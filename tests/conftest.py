"""Test harness: run everything on a virtual 8-device CPU backend.

Multi-device sharding tests exercise real pjit/shard_map collectives without
TPU hardware (SURVEY.md §4 "multi-device tests without hardware"); parity
tests compare against the TF reference, which is CPU-only here.  Env vars
must be set before jax initializes a backend, hence module scope.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize pins jax_platforms to "axon,cpu" at interpreter
# start, overriding the env var — force CPU at the config level (backends
# are created lazily, so this wins as long as no array op ran yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has a single CPU core, so repeat
# XLA compiles dominate suite runtime without it.
_CACHE_DIR = os.path.join(REPO_ROOT, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The TF reference package uses flat sibling imports (SURVEY.md §1), so the
# reference dir itself must be importable for parity tests.
REFERENCE_DIR = "/root/reference/vit_tensorflow"
if os.path.isdir(REFERENCE_DIR) and REFERENCE_DIR not in sys.path:
    sys.path.append(REFERENCE_DIR)


# ---- test tiers -------------------------------------------------------------
# quick tier (~2 min warm-cache on this box):
#     python -m pytest -m quick -q
# everything except the >40s-per-test interpret-mode kernel suites:
#     python -m pytest -m "not slow" -q
# Full suite: plain `python -m pytest tests/ -q` (unchanged).

# Model-level interpret-mode kernel fences: each test runs a whole
# hierarchical model through interpret-mode Pallas (43-128s measured).
_SLOW = (
    "tests/unit/test_windowed_fused.py",
    "tests/unit/test_twins_fused.py",
    "tests/unit/test_fused_cross_attention.py::"
    "test_scalable_vit_fused_matches_exact",
)

# <5-min re-run fence: ViT golden parity, the main fused-block kernel file
# at its (small) unit shapes, and one multidevice objective smoke.
_QUICK = (
    "tests/parity/test_vit_parity.py",
    "tests/unit/test_fused_attention_block.py",
    "tests/multidevice/test_sharded_train.py::"
    "test_self_supervised_loss_train_step_on_mesh",
    "tests/multidevice/test_sharded_train.py::test_dp8_train_step",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if any(nodeid.startswith(p) for p in _SLOW):
            item.add_marker(pytest.mark.slow)
        if any(nodeid.startswith(p) for p in _QUICK):
            item.add_marker(pytest.mark.quick)
