"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding validated
without hardware) with x64 enabled so golden comparisons against
scipy/numpy float64 references are exact to tolerance.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # note: the axon plugin may override this...
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# ... so force the CPU backend through the config, which wins over the plugin.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
