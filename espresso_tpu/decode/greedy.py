"""Batched greedy decoding for attention encoder-decoder models.

Rebuild of espresso/tools/simple_greedy_decoder.py (SimpleGreedyDecoder):
used for validation-time WER (speech_recognition.py:598-607). The per-token
Python loop becomes one ``lax.scan`` over max_len steps, jitted once per
bucket shape; EOS-finished rows freeze (emit pad).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.models.speech_lstm import SpeechLSTMModel
from espresso_tpu.models.speech_transformer import SpeechTransformerModel


class SimpleGreedyDecoder:
    def __init__(self, model, dictionary, max_len_a: float = 0.0, max_len_b: int = 200):
        self.model = model
        self.dict = dictionary
        self.eos = dictionary.eos()
        self.pad = dictionary.pad()
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self._jitted: Dict[Tuple, Any] = {}

    def _decode_fn(self, max_len: int):
        model, eos, pad = self.model, self.eos, self.pad
        is_transformer = isinstance(model, SpeechTransformerModel)

        @jax.jit
        def run(variables, src_frames, src_lengths):
            B = src_frames.shape[0]
            enc = model.apply(variables, src_frames, src_lengths, method="encode")
            if is_transformer:
                cache = model.apply(variables, enc, max_len, method="init_cache")
                state = cache
            else:
                state = model.apply(variables, B, method="init_decoder_carry")

            def step(carry, step_idx):
                tok, state, finished, score = carry
                if is_transformer:
                    logits, state, _ = model.apply(
                        variables, tok, step_idx, state, enc, method="decode_step"
                    )
                else:
                    logits, state, _ = model.apply(
                        variables, tok, state, enc, method="decode_step"
                    )
                lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                nxt = jnp.argmax(lprobs, axis=-1).astype(jnp.int32)
                tok_score = jnp.take_along_axis(lprobs, nxt[:, None], 1)[:, 0]
                nxt = jnp.where(finished, pad, nxt)
                score = score + jnp.where(finished, 0.0, tok_score)
                new_finished = finished | (nxt == eos)
                return (nxt, state, new_finished, score), nxt

            init_tok = jnp.full((B,), eos, jnp.int32)
            init = (
                init_tok,
                state,
                jnp.zeros((B,), bool),
                jnp.zeros((B,), jnp.float32),
            )
            carry_out, tokens = jax.lax.scan(step, init, jnp.arange(max_len))
            return jnp.moveaxis(tokens, 0, 1), carry_out[3]

        return run

    def decode(self, variables, batch) -> List[Dict[str, Any]]:
        """Returns per-utterance hypo dicts: {tokens, score} (reference
        ``finalized`` format, sequence_generator.py:657-767 shape)."""
        src_frames = jnp.asarray(batch["src_frames"])
        src_lengths = jnp.asarray(batch["src_lengths"])
        T = src_frames.shape[1]
        max_len = int(self.max_len_a * T + self.max_len_b)
        max_len = max(min(max_len, 1024), 2)
        key = (src_frames.shape, max_len)
        if key not in self._jitted:
            self._jitted[key] = self._decode_fn(max_len)
        tokens, scores = self._jitted[key](variables, src_frames, src_lengths)
        tokens = np.asarray(tokens)
        scores = np.asarray(scores)
        out = []
        for b in range(tokens.shape[0]):
            row = tokens[b]
            eos_pos = np.nonzero(row == self.eos)[0]
            end = int(eos_pos[0]) if len(eos_pos) else len(row)
            out.append(
                [{"tokens": row[:end], "score": float(scores[b])}]
            )
        return out
