"""Model base types.

Replaces the fairseq class grid (FairseqEncoderDecoderModel /
FairseqIncrementalDecoder, fairseq/models/fairseq_model.py) with a small
functional convention:

  * every model is a flax ``nn.Module`` whose ``__call__`` is the training
    forward (teacher-forced), returning logits;
  * encoders return an ``EncoderOut`` (pytree) with padded outputs + lengths;
  * decoders that support incremental decoding expose
    ``init_cache(batch, max_len, ...)`` and a ``step`` method taking/returning
    an explicit cache pytree (usable inside ``lax.while_loop`` beam search —
    the reference's mutable incremental_state dicts don't jit).

Model configs are plain dataclasses registered in ``registry.MODELS``; named
architectures (reference register_model_architecture) are preset functions in
``registry.ARCHITECTURES``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax.numpy as jnp


@dataclass
class EncoderOut:
    """Padded encoder output + validity info (pytree)."""

    encoder_out: jnp.ndarray  # [B, T, C]
    encoder_padding_mask: jnp.ndarray  # [B, T] True = valid
    src_lengths: jnp.ndarray  # [B]


import jax.tree_util

jax.tree_util.register_pytree_node(
    EncoderOut,
    lambda e: ((e.encoder_out, e.encoder_padding_mask, e.src_lengths), None),
    lambda _, c: EncoderOut(*c),
)


def bound_param_dtype(mod, default=jnp.float32):
    """Compute dtype of a bound module's float params.

    Under mixed precision the trainer passes a bf16-cast param tree; scan
    carries (LSTM hidden/cell state, input feed) must be initialized in the
    same dtype or the recurrent matmuls silently promote to fp32 (and
    lax.scan rejects a carry whose dtype changes). Returns ``default`` when
    the module is unbound or params are not yet created (init time)."""
    try:
        params = mod.variables.get("params", {})
    except Exception:
        return default
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return default
