"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic (fsdp/sp/dp axes) is exercised on CPU with
``xla_force_host_platform_device_count=8`` — the TPU-native answer to testing
multi-node code without a cluster (SURVEY.md §4).

Must run before jax is imported anywhere.
"""

import os

# Drop the axon TPU plugin registration (slow remote-compile tunnel) and force
# an 8-device virtual CPU platform for fast, deterministic tests.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
