"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver's multichip dry-run uses the same mechanism
(xla_force_host_platform_device_count); real-TPU benchmarking lives in
bench.py, not in the unit tests.
"""
import os
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# WFA_TPU_TEST_HW=1 runs the suite against the real attached accelerator
# (used by the verify flow); default is the hermetic CPU mesh.
if not os.environ.get("WFA_TPU_TEST_HW"):
    jax.config.update("jax_platforms", "cpu")
