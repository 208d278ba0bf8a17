"""Test harness: force the CPU backend with 8 virtual devices.

This is the JAX analogue of the reference's file://localhost multi-rank trick
(SURVEY.md §4): mesh/sharding tests run on 8 virtual CPU devices. Note the
axon sitecustomize force-registers the TPU backend regardless of
JAX_PLATFORMS, so the override must go through jax.config.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
