"""Sequence masking utilities (jittable).

Rebuilds espresso/tools/utils.py helpers: ``sequence_mask`` (:116),
``chunk_streaming_mask`` (:131 — randomized chunk sizes during training for
streaming-capable encoders) and conv-subsampling length arithmetic
(espresso/models/speech_lstm.py ConvBNReLU.output_lengths /
speech_convolutions.py:61).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e8  # reference uses -1e8 attn fill to avoid NaNs
# (conformer_with_relative_positional_embedding_encoder_layer.py:104-111)


def sequence_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """[B] lengths -> [B, maxlen] bool mask (True = valid)."""
    return jnp.arange(maxlen)[None, :] < lengths[:, None]


def chunk_streaming_mask(
    T: int,
    chunk_size: int,
    left_window: int = 0,
    right_window: int = 0,
    always_partial_in_last: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """[T, T] additive attention mask for chunk-streaming encoders.

    Frames are grouped into chunks of ``chunk_size``; position i may attend to
    all frames in its own chunk plus ``left_window`` chunks to the left and
    ``right_window`` chunks to the right (reference espresso/tools/utils.py:131).
    When ``rng`` is given, the chunk size for this draw is sampled uniformly
    from [1, chunk_size] (randomized chunk sizes at train time, :131-196).

    Returns an additive mask: 0 where attention is allowed, NEG_INF elsewhere.
    """
    if rng is not None:
        size = jax.random.randint(rng, (), 1, chunk_size + 1)
    else:
        size = jnp.asarray(chunk_size)
    idx = jnp.arange(T)
    chunk_of = idx // size
    diff = chunk_of[None, :] - chunk_of[:, None]  # key_chunk - query_chunk
    allowed = (diff >= -left_window) & (diff <= right_window)
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


def limited_context_mask(
    T: int, left: Optional[int], right: Optional[int]
) -> jnp.ndarray:
    """[T, T] additive mask limiting attention to a fixed left/right window
    (reference transformer_context, speech_transformer_encoder.py:250-263)."""
    idx = jnp.arange(T)
    diff = idx[None, :] - idx[:, None]
    allowed = jnp.ones((T, T), dtype=bool)
    if left is not None:
        allowed &= diff >= -left
    if right is not None:
        allowed &= diff <= right
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


def conv_output_length(
    length: jnp.ndarray, kernel: int, stride: int, padding: int
) -> jnp.ndarray:
    return (length + 2 * padding - kernel) // stride + 1


def lengths_after_subsampling(
    lengths: jnp.ndarray, convs: Sequence[Tuple[int, int, int]]
) -> jnp.ndarray:
    """Apply conv length arithmetic for each (kernel, stride, padding) stage."""
    out = lengths
    for kernel, stride, padding in convs:
        out = conv_output_length(out, kernel, stride, padding)
    return out
