"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); the real TPU is exercised by
bench.py and the driver's compile checks.

Note: the environment preloads JAX with a TPU backend at interpreter start
(sitecustomize), so the platform must be overridden via ``jax.config`` --
env vars set here would be read too late.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
