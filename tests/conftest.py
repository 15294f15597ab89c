"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh — the TPU analogue of the
reference's `-DNCUDA` CPU build of the same kernel source (Makefile:57-58,
SURVEY.md §4): identical compute logic, no accelerator required.  The real
TPU is exercised by bench.py and the driver's compile checks.
"""

import os

# Force CPU even when the ambient environment points at a TPU platform: tests
# must be hermetic and provide the virtual 8-device mesh.  The environment's
# sitecustomize imports jax before this conftest runs, so the env var alone is
# too late — update the live jax config as well (safe: no backend has been
# initialised yet at collection time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
