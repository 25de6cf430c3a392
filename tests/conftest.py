"""Test harness config: run everything on CPU with 8 virtual devices so
sharding logic is exercised without TPU hardware (SURVEY.md §4).

The environment may pin ``JAX_PLATFORMS`` to a tunneled TPU backend at
interpreter startup (sitecustomize), so the env var alone cannot force CPU;
``jax.config.update`` after import can.  Opt back into the real chip with
``ZONOS_TPU_TEST_ON_TPU=1`` (used only by explicit TPU benchmarks).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

if os.environ.get("ZONOS_TPU_TEST_ON_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
