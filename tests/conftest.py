"""Test configuration: force an 8-virtual-device CPU platform.

Tests never require TPU hardware — the pjit/shard_map/psum paths run on a
fake 8-device CPU mesh (the standard JAX answer to testing multi-chip
code in CI, SURVEY.md §4).

NOTE: this environment's sitecustomize registers the axon TPU PJRT
plugin and imports jax BEFORE pytest starts, so JAX_PLATFORMS/XLA_FLAGS
env vars are already consumed. `jax.config.update` still works because
no backend client has been created yet at conftest-import time.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
