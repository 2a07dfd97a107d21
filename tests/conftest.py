"""Test env: force the CPU backend with 8 virtual devices.

Mirrors the multi-host test strategy from SURVEY.md §4: sharding/mesh tests run
against ``--xla_force_host_platform_device_count=8`` fake devices.

Note: this image's sitecustomize imports jax and registers the 'axon' TPU
backend before conftest runs, so env vars alone are too late — we force the
platform through ``jax.config`` (unless TTX_TEST_TPU=1 asks for real-HW runs).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("TTX_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    # persistent XLA compile cache: the suite's heavy tests are dominated by
    # CPU compiles of 8-device SPMD programs (measured: the zero-dp parity
    # test is 65 s cold / 24 s warm).  First run pays full compile cost;
    # re-runs (local dev, CI retries, the slow tier) reuse it.  Override the
    # location with TTX_TEST_CACHE_DIR; set TTX_TEST_CACHE_DIR=0 to disable.
    _cache = os.environ.get("TTX_TEST_CACHE_DIR", "")
    if _cache != "0":
        if not _cache:
            _cache = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-tier coverage (redundant-angle property sweeps and "
        "multi-minute smokes whose core behavior a cheaper default test "
        "already pins).  Run with TTX_TEST_SLOW=1 or -m slow.")


def pytest_collection_modifyitems(config, items):
    """Default suite = everything not marked slow (VERDICT r4 #7: hold the
    suite's wall-clock line).  The slow tier stays one env var away."""
    if os.environ.get("TTX_TEST_SLOW") == "1":
        return
    if "slow" in (config.getoption("-m") or ""):
        return   # explicit -m selection wins
    skip = pytest.mark.skip(
        reason="slow tier: set TTX_TEST_SLOW=1 (or -m slow) to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
