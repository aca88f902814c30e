"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax import (SURVEY.md §4: emulate N devices with
xla_force_host_platform_device_count for sharding tests without a pod).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Match TPU numerics choices deterministically on CPU.
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
