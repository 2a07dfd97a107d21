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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
