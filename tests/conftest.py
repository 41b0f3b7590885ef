"""Test configuration: force a virtual 8-device CPU mesh so sharding logic is
testable without TPU hardware (SURVEY.md §4: use
--xla_force_host_platform_device_count).

The host environment exports JAX_PLATFORMS=axon (a tunneled remote TPU) and a
sitecustomize registers that PJRT plugin at interpreter start — on that
backend every eager op is a network round trip. Tests must run on local CPU:
override both the env var and the already-initialized jax config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
