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
