"""ARPA n-gram language model: parser + deterministic automaton view.

Backs the in-tree lattice rescoring (tools/lattice.lmrescore), rebuilding
what the reference delegates to Kaldi's ``lattice-lmrescore`` /
``lattice-lmrescore-const-arpa`` with a G.fst / const-arpa compiled from an
ARPA file (steps/lmrescore.sh, steps/lmrescore_const_arpa.sh, called from
examples/asr_wsj/run_chain_e2e.sh:228-231).

The automaton view matches Kaldi's G.fst contract: states are n-gram
histories (longest suffix that exists as a context in the model), arcs are
words with cost ``-ln p(word | hist)`` including backoff mass, finals carry
``-ln p(</s> | hist)``. ARPA stores log10 probabilities; costs here are in
nats (log10 * ln 10), the Kaldi semiring convention.
"""

from __future__ import annotations

import gzip
import logging
import math
from typing import Dict, Optional, Tuple

logger = logging.getLogger(__name__)

LN10 = math.log(10.0)


class ArpaLM:
    """Backoff n-gram LM over word strings.

    ``ngrams[order][(w1..wn)] = (log10 prob, log10 backoff)`` — backoff is
    0.0 when absent (including for highest-order entries).
    """

    def __init__(
        self,
        ngrams: Dict[int, Dict[Tuple[str, ...], Tuple[float, float]]],
        order: int,
        unk: Optional[str] = None,
    ):
        self.ngrams = ngrams
        self.order = order
        # contexts that can extend (have a continuation or explicit backoff):
        # a history state only exists if it appears as an n-gram itself
        self._unk = unk if unk is not None else (
            "<unk>" if (1 in ngrams and ("<unk>",) in ngrams[1]) else None
        )

    # --- parsing ---

    @classmethod
    def load(cls, path: str) -> "ArpaLM":
        opener = gzip.open if path.endswith(".gz") else open
        ngrams: Dict[int, Dict[Tuple[str, ...], Tuple[float, float]]] = {}
        order = 0
        cur: Optional[int] = None
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            section = None
            for raw in f:
                line = raw.strip()
                if not line:
                    continue
                if line == "\\data\\":
                    section = "data"
                    continue
                if line.startswith("\\") and line.endswith("-grams:"):
                    cur = int(line[1:].split("-")[0])
                    order = max(order, cur)
                    ngrams.setdefault(cur, {})
                    section = "ngrams"
                    continue
                if line == "\\end\\":
                    break
                if section == "data":
                    continue  # "ngram N=count" headers
                if section == "ngrams" and cur is not None:
                    parts = line.split()
                    # logp w1 ... wn [backoff]
                    if len(parts) < cur + 1:
                        continue
                    logp = float(parts[0])
                    words = tuple(parts[1 : 1 + cur])
                    bo = (
                        float(parts[1 + cur])
                        if len(parts) > 1 + cur
                        else 0.0
                    )
                    ngrams[cur][words] = (logp, bo)
        if not ngrams:
            raise ValueError(f"no n-gram sections in {path}")
        return cls(ngrams, order)

    # --- scoring ---

    def logprob(self, hist: Tuple[str, ...], word: str) -> float:
        """log10 p(word | hist) with standard backoff recursion; OOV words
        map to <unk> when present, else a -20 log10 floor (warned once)."""
        if (word,) not in self.ngrams.get(1, {}):
            if self._unk is not None and word != self._unk:
                return self.logprob(hist, self._unk)
            if not getattr(self, "_warned_oov", False):
                logger.warning(
                    "OOV word %r and no <unk> in the LM; flooring", word
                )
                self._warned_oov = True
            return -20.0
        hist = hist[-(self.order - 1) :] if self.order > 1 else ()
        while True:
            n = len(hist) + 1
            entry = self.ngrams.get(n, {}).get(hist + (word,))
            if entry is not None:
                return entry[0]
            if not hist:
                # unigram miss handled above; defensive
                return -20.0
            bo_entry = self.ngrams.get(len(hist), {}).get(hist)
            bo = bo_entry[1] if bo_entry is not None else 0.0
            return bo + self.logprob(hist[1:], word)

    # --- automaton view (for lattice composition) ---

    def initial_state(self) -> Tuple[str, ...]:
        return self._trim(("<s>",)) if (
            1 in self.ngrams and ("<s>",) in self.ngrams[1]
        ) else ()

    def _trim(self, hist: Tuple[str, ...]) -> Tuple[str, ...]:
        """Longest suffix of hist that exists as a context (an n-gram of
        its own length) — the canonical deterministic-FST state."""
        hist = hist[-(self.order - 1) :] if self.order > 1 else ()
        while hist and hist not in self.ngrams.get(len(hist), {}):
            hist = hist[1:]
        return hist

    def step_cost(
        self, hist: Tuple[str, ...], word: Optional[str]
    ) -> Tuple[float, Tuple[str, ...]]:
        """(cost in nats, next state) for consuming ``word`` from state
        ``hist``. ``word=None`` (unmapped id) costs the OOV floor and
        resets the history."""
        if word is None:
            return 20.0 * LN10, ()
        lp = self.logprob(hist, word)
        w_eff = (
            word
            if (word,) in self.ngrams.get(1, {})
            else (self._unk if self._unk else None)
        )
        nhist = self._trim(hist + (w_eff,)) if w_eff else ()
        return -lp * LN10, nhist

    def final_cost(self, hist: Tuple[str, ...]) -> float:
        """-ln p(</s> | hist); 0 when the LM has no </s> (cost-neutral)."""
        if 1 in self.ngrams and ("</s>",) in self.ngrams[1]:
            return -self.logprob(hist, "</s>") * LN10
        return 0.0

    def sentence_cost(self, words) -> float:
        """-ln p(<s> words </s>) — brute-force oracle for tests."""
        hist = self.initial_state()
        total = 0.0
        for w in words:
            c, hist = self.step_cost(hist, w)
            total += c
        return total + self.final_cost(hist)
