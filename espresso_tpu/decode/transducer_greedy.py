"""Batched transducer greedy decoding.

Rebuild of espresso/tools/transducer_greedy_decoder.py:15: batched greedy
lattice walk with a bounded number of label expansions per encoder frame
(``max_num_expansions_per_step``, reference :147-149). The whole decode is
one ``lax.scan`` over encoder frames with a statically-unrolled expansion
loop inside — no host round-trips, no per-utterance Python.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TransducerGreedyDecoder:
    def __init__(
        self,
        model,
        dictionary,
        max_num_expansions_per_step: int = 2,
        max_out_factor: float = 1.0,
        model_predicts_eos: bool = False,
    ):
        self.model = model
        self.dict = dictionary
        self.blank = dictionary.blank()
        self.eos = dictionary.eos()
        self.max_expansions = max_num_expansions_per_step
        self.max_out_factor = max_out_factor
        self.model_predicts_eos = model_predicts_eos
        self._jitted: Dict[Tuple, Any] = {}

    def _decode_fn(self, T: int, L_max: int):
        model, blank = self.model, self.blank
        eos = self.eos
        predicts_eos = self.model_predicts_eos
        n_exp = self.max_expansions

        @jax.jit
        def run(variables, src_frames, src_lengths):
            B = src_frames.shape[0]
            enc = model.apply(variables, src_frames, src_lengths, method="encode")
            pdtype = jax.tree_util.tree_leaves(variables)[0].dtype
            carry0 = model.apply(
                variables, B, pdtype, method="init_pred_carry"
            )
            # prediction feature for the initial (blank-history) state: feed
            # blank once (the reference starts from bos/blank history)
            feat0, carry0 = model.apply(
                variables,
                jnp.full((B,), blank, jnp.int32),
                carry0,
                method="pred_step",
            )
            out_buf0 = jnp.zeros((B, L_max), jnp.int32)
            out_len0 = jnp.zeros((B,), jnp.int32)
            score0 = jnp.zeros((B,), jnp.float32)

            def frame_step(carry, t):
                pred_carry, pred_feat, out_buf, out_len, score = carry
                enc_t = enc_proj[:, t]
                active_t = t < enc.src_lengths

                expanding = active_t
                for _ in range(n_exp):
                    logits = model.apply(
                        variables, enc_t, pred_feat,
                        method="joint_step_precomputed",
                    )
                    lprobs = jax.nn.log_softmax(
                        logits.astype(jnp.float32), axis=-1
                    )
                    if predicts_eos:
                        # fold eos mass into blank to mitigate deletion
                        # errors (reference transducer_greedy_decoder.py:212)
                        lprobs = lprobs.at[:, blank].set(
                            jnp.logaddexp(lprobs[:, blank], lprobs[:, eos])
                        ).at[:, eos].set(-jnp.inf)
                    k = jnp.argmax(lprobs, axis=-1).astype(jnp.int32)
                    k_score = jnp.take_along_axis(lprobs, k[:, None], 1)[:, 0]
                    emit = (k != blank) & expanding & (out_len < L_max)
                    # append token where emitting
                    out_buf = out_buf.at[
                        jnp.arange(B), jnp.minimum(out_len, L_max - 1)
                    ].set(jnp.where(emit, k, out_buf[jnp.arange(B), jnp.minimum(out_len, L_max - 1)]))
                    out_len = out_len + emit.astype(jnp.int32)
                    score = score + jnp.where(expanding, k_score, 0.0)
                    # advance predictor for emitting rows
                    new_feat, new_carry = model.apply(
                        variables, k, pred_carry, method="pred_step"
                    )
                    pred_feat = jnp.where(emit[:, None], new_feat, pred_feat)

                    def _masked(new, old):
                        # carry leaves are [L,B,H], [B,*] or [B]
                        if new.ndim == 3:
                            m = emit.reshape(1, B, 1)
                        else:
                            m = emit.reshape((B,) + (1,) * (new.ndim - 1))
                        return jnp.where(m, new, old)

                    pred_carry = jax.tree_util.tree_map(
                        _masked, new_carry, pred_carry
                    )
                    expanding = emit
                return (pred_carry, pred_feat, out_buf, out_len, score), None

            # precompute the joint's encoder projection for all frames
            enc_proj = model.apply(
                variables, enc.encoder_out, method="joint_enc_proj"
            )
            # scan exactly the subsampled encoder frames (static under jit)
            T_enc = enc.encoder_out.shape[1]
            carry, _ = jax.lax.scan(
                frame_step,
                (carry0, feat0, out_buf0, out_len0, score0),
                jnp.arange(T_enc),
            )
            _, _, out_buf, out_len, score = carry
            # pack into ONE int32 array [B, 2 + L_max]: each device->host
            # transfer has a large fixed latency over the TPU tunnel
            packed = jnp.concatenate(
                [
                    jax.lax.bitcast_convert_type(
                        score.astype(jnp.float32), jnp.int32
                    )[:, None],
                    out_len[:, None],
                    out_buf,
                ],
                axis=1,
            )
            return packed

        return run

    def decode_async(self, variables, batch):
        """Launch the jitted greedy search; fetch deferred to ``collect``
        (depth-1 pipelining overlaps the host transfer with the next
        batch's device compute — see TransducerBeamSearchDecoder)."""
        src_frames = jnp.asarray(batch["src_frames"])
        src_lengths = jnp.asarray(batch["src_lengths"])
        T = src_frames.shape[1]
        L_max = max(int(T * self.max_out_factor), 8)
        key = (src_frames.shape, L_max)
        if key not in self._jitted:
            self._jitted[key] = self._decode_fn(T, L_max)
        return self._jitted[key](variables, src_frames, src_lengths)

    def collect(self, handle) -> List[Dict[str, Any]]:
        packed = np.asarray(handle)
        score = np.ascontiguousarray(packed[:, 0]).view(np.float32)
        out_len = packed[:, 1]
        out_buf = packed[:, 2:]
        return [
            [
                {
                    "tokens": out_buf[b, : out_len[b]].astype(np.int32),
                    "score": float(score[b]),
                }
            ]
            for b in range(out_buf.shape[0])
        ]

    def decode(self, variables, batch) -> List[Dict[str, Any]]:
        return self.collect(self.decode_async(variables, batch))
