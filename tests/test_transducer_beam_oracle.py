"""Oracle test for the batched AES transducer beam search: a per-hypothesis
pure-Python reimplementation of the same semantics (expansion rounds with
beta/gamma pruning, per-round blank merge with exact duplicate logaddexp,
frame inactivity) must produce identical hypotheses and scores. Exercises
the device scan AND the host backpointer backtrace end to end."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder
from espresso_tpu.models.base import EncoderOut

D = 6  # pred feature dim
J = 5  # joint/enc dim


class TinyRNNT:
    """Deterministic stand-in exposing the TransducerModel decode API."""

    def __init__(self, V, seed=0):
        rng = np.random.default_rng(seed)
        self.V = V
        self.W_emb = rng.standard_normal((V, D)).astype(np.float32) * 0.7
        self.A = rng.standard_normal((J, V)).astype(np.float32) * 0.9
        self.Bm = rng.standard_normal((D, V)).astype(np.float32) * 0.9

    def apply(self, variables, *args, method=None):
        if method == "encode":
            frames, lengths = args
            return EncoderOut(
                encoder_out=frames,
                encoder_padding_mask=jnp.ones(frames.shape[:2], bool),
                src_lengths=lengths,
            )
        if method == "joint_enc_proj":
            (enc_out,) = args
            return enc_out  # [B, T, J]
        if method == "init_pred_carry":
            bk = args[0]
            return (jnp.zeros((bk, D), jnp.float32),)
        if method == "pred_step":
            tokens, carry = args
            (h,) = carry
            feat = jnp.tanh(jnp.asarray(self.W_emb)[tokens] + 0.5 * h)
            return feat, (feat,)
        if method == "joint_step_precomputed":
            enc_t, feat = args
            return enc_t @ jnp.asarray(self.A) + feat @ jnp.asarray(self.Bm)
        raise ValueError(method)

    # numpy twins for the oracle
    def np_pred_step(self, token, h):
        feat = np.tanh(self.W_emb[token] + 0.5 * h)
        return feat, feat

    def np_logits(self, enc_t, feat):
        return enc_t @ self.A + feat @ self.Bm


def _log_softmax(x):
    m = x.max()
    e = x - m
    return e - math.log(np.exp(e).sum())


def oracle_prefix_merge(beam, enc_t, model, alpha):
    """Reference prefix_search_and_merge semantics
    (transducer_beam_search_decoder.py:465-486): for each pair where i is a
    proper prefix of j (extension <= alpha), walk the joint over the
    extension tokens and logaddexp the mass into j. Sources always use
    pre-merge scores (the reference's sorted in-place loop guarantees it)."""
    beam = sorted(beam, key=lambda h: -len(h["seq"]))
    masses = [None] * len(beam)
    for jx, hj in enumerate(beam):
        for ix in range(jx + 1, len(beam)):
            hi = beam[ix]
            e = len(hj["seq"]) - len(hi["seq"])
            if e <= 0 or (alpha is not None and e > alpha):
                continue
            if hj["seq"][: len(hi["seq"])] != hi["seq"]:
                continue
            mass = hi["score"]
            feat, h = hi["feat"], hi["h"]
            for p in range(len(hi["seq"]), len(hj["seq"])):
                lp = _log_softmax(model.np_logits(enc_t, feat))
                mass += lp[hj["seq"][p]]
                feat, h = model.np_pred_step(hj["seq"][p], h)
            masses[jx] = (
                mass
                if masses[jx] is None
                else np.logaddexp(masses[jx], mass)
            )
    for jx, m in enumerate(masses):
        if m is not None:
            beam[jx]["score"] = float(np.logaddexp(beam[jx]["score"], m))
    return beam


def oracle_aes(
    model, frames, enc_len, K, beta, gamma, n_exp, blank=0, prefix_alpha=0
):
    """Reference AES for ONE utterance, mirroring the lockstep algorithm:
    per frame, an optional prefix-search-and-merge, then n_exp+1 rounds each
    ending in a (dedup'd) top-K blank merge, with label expansion (top
    K+beta, gamma prune, keep K) between rounds."""
    V = model.V
    feat0, h0 = model.np_pred_step(blank, np.zeros(D, np.float32))
    beam = [{"seq": (), "score": 0.0, "feat": feat0, "h": h0}]
    for t in range(enc_len):
        enc_t = frames[t]
        if prefix_alpha:
            beam = oracle_prefix_merge(beam, enc_t, model, prefix_alpha)
        pool = []  # list of hyp dicts, kept <= K
        exp = [dict(h) for h in beam]
        for j in range(n_exp + 1):
            lps = [
                _log_softmax(model.np_logits(enc_t, h["feat"])) for h in exp
            ]
            # blank merge into pool with exact duplicate logaddexp
            cands = [
                {
                    "seq": h["seq"],
                    "score": h["score"] + lp[blank],
                    "feat": h["feat"],
                    "h": h["h"],
                }
                for h, lp in zip(exp, lps)
            ]
            merged = {}
            for c in pool + cands:
                if c["seq"] in merged:
                    merged[c["seq"]]["score"] = np.logaddexp(
                        merged[c["seq"]]["score"], c["score"]
                    )
                else:
                    merged[c["seq"]] = dict(c)
            pool = sorted(
                merged.values(), key=lambda h: -h["score"]
            )[:K]
            if j == n_exp:
                break
            # label expansion: global top K+beta, gamma prune, keep K
            expansions = []
            for h, lp in zip(exp, lps):
                for v in range(V):
                    if v == blank:
                        continue
                    expansions.append((h["score"] + lp[v], h, v))
            expansions.sort(key=lambda x: -x[0])
            top = expansions[: K + beta]
            best = top[0][0]
            top = [e for e in top if e[0] >= best - gamma][:K]
            new_exp = []
            for score, h, v in top:
                feat, hh = model.np_pred_step(v, h["h"])
                new_exp.append(
                    {
                        "seq": h["seq"] + (v,),
                        "score": score,
                        "feat": feat,
                        "h": hh,
                    }
                )
            exp = new_exp
        beam = pool
    return sorted(beam, key=lambda h: -h["score"])


@pytest.mark.parametrize(
    "n_exp,prefix_alpha",
    [(1, 0), (1, 1), (2, 1), (2, 2), (2, 3)],
)
def test_aes_matches_bruteforce_oracle(n_exp, prefix_alpha):
    V, K, beta, gamma = 7, 3, 2, 6.0
    model = TinyRNNT(V, seed=3)
    rng = np.random.default_rng(5)
    B, T = 3, 5
    frames = rng.standard_normal((B, T, J)).astype(np.float32) * 1.5
    lengths = np.array([5, 4, 2])

    d = AsrDictionary(enable_bos=True)
    for i in range(V - 4):
        d.add_symbol(f"u{i}")
    assert len(d) >= V - 1  # enough symbols; indices used directly

    dec = TransducerBeamSearchDecoder(
        model,
        d,
        beam_size=K,
        expansion_beta=beta,
        expansion_gamma=gamma,
        max_num_expansions_per_step=n_exp,
        prefix_alpha=prefix_alpha,
    )
    out = dec.decode(
        {"params": {"dummy": jnp.zeros(1)}},
        {"src_frames": frames, "src_lengths": lengths},
    )

    for b in range(B):
        ref = oracle_aes(
            model, frames[b], int(lengths[b]), K, beta, gamma, n_exp,
            prefix_alpha=prefix_alpha,
        )
        got = out[b]
        assert len(got) == len(ref), (b, len(got), len(ref))
        for g, r in zip(got, ref):
            assert tuple(g["tokens"]) == r["seq"], (
                b, tuple(g["tokens"]), r["seq"],
            )
            assert abs(g["score"] - r["score"]) < 1e-3, (
                b, g["score"], r["score"],
            )
