"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The surrounding environment registers the 'axon' real-TPU backend via a
sitecustomize hook and pins JAX_PLATFORMS=axon; tests must run on CPU with
8 virtual devices (SURVEY.md §4), so we both set the env vars *and* override
through jax.config (which beats the env var re-exported by sitecustomize).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu"
