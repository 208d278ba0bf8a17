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
    model, frames, enc_len, K, beta, gamma, n_exp, blank=0, prefix_alpha=0,
    init_state=None,
):
    """Reference AES for ONE utterance, mirroring the lockstep algorithm:
    per frame, an optional prefix-search-and-merge, then n_exp+1 rounds each
    ending in a (dedup'd) top-K blank merge, with label expansion (top
    K+beta, gamma prune, keep K) between rounds. ``init_state`` lets other
    tests (e.g. conversion hypothesis parity) plug in a torch prediction
    net whose state is not a flat D-vector."""
    V = model.V
    if init_state is None:
        init_state = np.zeros(D, np.float32)
    feat0, h0 = model.np_pred_step(blank, init_state)
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


# ---------------------------------------------------------------------------
# Shallow LM fusion oracle: the reference fuses lm_weight * LM log-probs
# into the non-blank columns and renormalizes so the total non-blank mass is
# unchanged (log_scaling_factor, transducer_beam_search_decoder.py:298-322);
# the prefix merge applies the same per-token fusion on extension tokens
# (:516-545 first token, :565-594 deeper tokens).
# ---------------------------------------------------------------------------

D2 = 4  # LM hidden dim


class TinyLM:
    """Deterministic LM stand-in implementing the decode adapter protocol
    (init_state/step/reorder) over the blank-less vocabulary."""

    def __init__(self, Vlm, seed=11):
        rng = np.random.default_rng(seed)
        self.Vlm = Vlm
        self.E = rng.standard_normal((Vlm, D2)).astype(np.float32) * 0.8
        self.O = rng.standard_normal((D2, Vlm)).astype(np.float32) * 0.9

    def init_state(self, variables, _ignored, bk, max_len):
        return (jnp.zeros((bk, D2), jnp.float32),)

    def step(self, variables, tokens, state):
        (h,) = state
        h2 = jnp.tanh(jnp.asarray(self.E)[tokens] + 0.6 * h)
        return h2 @ jnp.asarray(self.O), (h2,), None

    def reorder(self, state, order):
        return jax.tree_util.tree_map(
            lambda x: jnp.take(x, order, axis=0), state
        )

    def np_step(self, token, h):
        h2 = np.tanh(self.E[token] + 0.6 * h)
        return h2 @ self.O, h2


def _np_lse(x):
    m = x.max()
    return m + math.log(np.exp(x - m).sum())


def _fuse_row(lp, lm_lp, lam, blank=0):
    """Reference fusion of one row: shift LM right by 1 (blank-less),
    weight, add, renormalize non-blank mass. Returns the fused full-vocab
    row (blank column untouched)."""
    V = lp.shape[0]
    lab = lp.copy()
    lab[blank] = -1.0e9
    shifted = np.full(V, -1.0e9, np.float32)
    w = min(V - 1, lm_lp.shape[0])
    shifted[1 : 1 + w] = lm_lp[:w]
    fused = lab + lam * np.maximum(shifted, -1.0e9)
    fac = _np_lse(lab) - _np_lse(fused)
    out = lp.copy()
    out[1:] = fused[1:] + fac
    out[blank] = lp[blank]
    # column 0 is blank; fused[0] is dead anyway
    return out


def oracle_prefix_merge_lm(beam, enc_t, model, lm, lam, alpha):
    """Prefix merge with LM fusion: extension tokens score joint + weighted
    LM + per-row renormalization factor, walking both the prediction net
    and the LM along the extension."""
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
            lm_lp, lm_h = hi["lm_lp"], hi["lm_h"]
            for p in range(len(hi["seq"]), len(hj["seq"])):
                tok = hj["seq"][p]
                lp = _log_softmax(model.np_logits(enc_t, feat))
                fused = _fuse_row(lp, lm_lp, lam)
                mass += fused[tok]
                feat, h = model.np_pred_step(tok, h)
                lm_out, lm_h = lm.np_step(max(tok - 1, 0), lm_h)
                lm_lp = _log_softmax(lm_out)
            masses[jx] = (
                mass
                if masses[jx] is None
                else np.logaddexp(masses[jx], mass)
            )
    for jx, m in enumerate(masses):
        if m is not None:
            beam[jx]["score"] = float(np.logaddexp(beam[jx]["score"], m))
    return beam


def oracle_aes_lm(
    model, lm, lam, eos, frames, enc_len, K, beta, gamma, n_exp, blank=0,
    prefix_alpha=0,
):
    V = model.V
    feat0, h0 = model.np_pred_step(blank, np.zeros(D, np.float32))
    lm_out0, lm_h0 = lm.np_step(eos - 1, np.zeros(D2, np.float32))
    beam = [
        {
            "seq": (), "score": 0.0, "feat": feat0, "h": h0,
            "lm_lp": _log_softmax(lm_out0), "lm_h": lm_h0,
        }
    ]
    for t in range(enc_len):
        enc_t = frames[t]
        if prefix_alpha:
            beam = oracle_prefix_merge_lm(
                beam, enc_t, model, lm, lam, prefix_alpha
            )
        pool = []
        exp = [dict(h) for h in beam]
        for j in range(n_exp + 1):
            lps = [
                _log_softmax(model.np_logits(enc_t, h["feat"])) for h in exp
            ]
            fused_rows = [
                _fuse_row(lp, h["lm_lp"], lam)
                for h, lp in zip(exp, lps)
            ]
            cands = [
                {**h, "score": h["score"] + lp[blank]}
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
            pool = sorted(merged.values(), key=lambda h: -h["score"])[:K]
            if j == n_exp:
                break
            expansions = []
            for h, fused in zip(exp, fused_rows):
                for v in range(V):
                    if v == blank:
                        continue
                    expansions.append((h["score"] + fused[v], h, v))
            expansions.sort(key=lambda x: -x[0])
            top = expansions[: K + beta]
            best = top[0][0]
            top = [e for e in top if e[0] >= best - gamma][:K]
            new_exp = []
            for score, h, v in top:
                feat, hh = model.np_pred_step(v, h["h"])
                lm_out, lm_hh = lm.np_step(max(v - 1, 0), h["lm_h"])
                new_exp.append(
                    {
                        "seq": h["seq"] + (v,),
                        "score": score,
                        "feat": feat,
                        "h": hh,
                        "lm_lp": _log_softmax(lm_out),
                        "lm_h": lm_hh,
                    }
                )
            exp = new_exp
        beam = pool
    return sorted(beam, key=lambda h: -h["score"])


@pytest.mark.parametrize(
    "n_exp,prefix_alpha",
    [(1, 0), (1, 1), (2, 2)],
)
def test_aes_lm_fusion_matches_bruteforce_oracle(n_exp, prefix_alpha):
    """LM-fused AES (renormalized shallow fusion + LM-aware prefix merge,
    incl. depth-2 merges through the LM history ring) vs the oracle."""
    V, K, beta, gamma, lam = 7, 3, 2, 6.0, 0.45
    model = TinyRNNT(V, seed=3)
    lm = TinyLM(V - 1, seed=11)
    rng = np.random.default_rng(5)
    B, T = 3, 5
    frames = rng.standard_normal((B, T, J)).astype(np.float32) * 1.5
    lengths = np.array([5, 4, 2])

    d = AsrDictionary(enable_bos=True)
    for i in range(V - 4):
        d.add_symbol(f"u{i}")

    dec = TransducerBeamSearchDecoder(
        model,
        d,
        beam_size=K,
        expansion_beta=beta,
        expansion_gamma=gamma,
        max_num_expansions_per_step=n_exp,
        prefix_alpha=prefix_alpha,
        lm=lm,
        lm_weight=lam,
        lm_variables={},
    )
    out = dec.decode(
        {"params": {"dummy": jnp.zeros(1)}},
        {"src_frames": frames, "src_lengths": lengths},
    )

    for b in range(B):
        ref = oracle_aes_lm(
            model, lm, lam, d.eos(), frames[b], int(lengths[b]), K, beta,
            gamma, n_exp, prefix_alpha=prefix_alpha,
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
