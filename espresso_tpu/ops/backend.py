"""Backend gate shared by the Pallas kernel families.

Every kernel's shape gate asks "is the default backend a TPU" before
turning on. ``ESPRESSO_AOT_TPU=1`` overrides the answer to yes so the
compile-only AOT harness (tools/aot_check.py) can lower + Mosaic-compile
the full TPU programs for a v5e topology from a machine with no TPU
attached (JAX topology AOT via a local libtpu) — the same gates that run
on the chip then select the same kernels during the harness compile.
"""

from __future__ import annotations

import os

import jax


def backend_is_tpu() -> bool:
    if os.environ.get("ESPRESSO_AOT_TPU", "0") == "1":
        return True
    return jax.default_backend() in ("tpu", "axon")
