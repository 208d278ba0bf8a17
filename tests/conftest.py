"""Test harness: force the CPU backend with 8 virtual devices.

This is the JAX analogue of the reference's file://localhost multi-rank trick
(SURVEY.md §4): mesh/sharding tests run on 8 virtual CPU devices. Note the
axon sitecustomize force-registers the TPU backend regardless of
JAX_PLATFORMS, so the override must go through jax.config.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles thousands of XLA:CPU programs in one process;
    letting them accumulate eventually segfaults the compiler itself
    (deterministically, ~120 tests in, inside backend_compile_and_load —
    every test passes in isolation). Dropping the jit caches per module
    bounds live executables to one module's worth; correctness is
    unaffected (next call recompiles)."""
    yield
    jax.clear_caches()
