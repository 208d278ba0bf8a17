"""Beam-search extras: no-repeat-ngram blocking, prefix-token forcing,
diverse beam groups (reference fairseq sequence_generator.py NGramRepeatBlock
/ _prefix_tokens, fairseq/search.py DiverseBeamSearch)."""

import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.decode.beam_search import BeamSearchDecoder
from espresso_tpu.models.base import EncoderOut


def _dict(n_units=4):
    d = AsrDictionary()
    for i in range(n_units):
        d.add_symbol(f"u{i}")
    return d


class _FixedLprobModel:
    """Deterministic dummy: every step emits the same log-prob row.
    Implements both the encode API and the adapter protocol (state is a
    dummy scalar per row so reorder is exercised)."""

    def __init__(self, lprow):
        self.lprow = jnp.asarray(lprow, jnp.float32)

    def apply(self, variables, frames, lengths, method=None):
        assert method == "encode"
        return EncoderOut(
            encoder_out=frames,
            encoder_padding_mask=jnp.zeros(frames.shape[:2], bool),
            src_lengths=lengths,
        )

    def init_state(self, variables, enc, batch_k, max_len):
        return jnp.zeros((batch_k,), jnp.float32)

    def step(self, variables, tokens, state, enc, step_idx):
        logits = jnp.broadcast_to(
            self.lprow[None, :], (tokens.shape[0], self.lprow.shape[0])
        )
        return logits, state + 1.0, None

    def reorder(self, state, idx):
        return jnp.take(state, idx, axis=0)


def _batch(B=1, T=5, F=4):
    return {
        "src_frames": np.zeros((B, T, F), np.float32),
        "src_lengths": np.full((B,), T, np.int64),
    }


def test_no_repeat_ngram_blocks_repeats():
    d = _dict()
    V = len(d)
    # strongly prefer token 'a' = first unit; eos mildly possible late
    row = np.full((V,), -10.0, np.float32)
    a = d.index("u0")
    b = d.index("u1")
    row[a] = 0.0
    row[b] = -1.0
    row[d.eos()] = -8.0
    model = _FixedLprobModel(row)

    # without blocking, greedy-ish beam emits a,a,a,... (repeated bigrams)
    dec = BeamSearchDecoder(model, d, beam_size=2, max_len_b=6, min_len=5)
    out = dec.decode({}, _batch())
    toks = list(out[0][0]["tokens"])
    assert toks[:3] == [a, a, a]

    dec2 = BeamSearchDecoder(
        model, d, beam_size=2, max_len_b=6, min_len=5, no_repeat_ngram_size=2
    )
    out2 = dec2.decode({}, _batch())
    toks2 = list(out2[0][0]["tokens"])
    # bigrams must be unique within the hypothesis (incl. the leading eos)
    seq = [d.eos()] + toks2
    bigrams = list(zip(seq, seq[1:]))
    assert len(bigrams) == len(set(bigrams)), toks2
    # the third 'a' (which would repeat bigram a,a) was banned
    assert toks2[:3] == [a, a, b]


def test_prefix_tokens_forced():
    d = _dict()
    V = len(d)
    a, b, c = d.index("u0"), d.index("u1"), d.index("u2")
    row = np.full((V,), -10.0, np.float32)
    row[a] = 0.0
    row[d.eos()] = -8.0
    model = _FixedLprobModel(row)
    dec = BeamSearchDecoder(model, d, beam_size=2, max_len_b=6, min_len=4)
    # force the unlikely prefix [c, b]; both rows of the batch
    prefix = np.array([[c, b], [b, c]], np.int32)
    out = dec.decode({}, _batch(B=2), prefix_tokens=prefix)
    assert list(out[0][0]["tokens"][:2]) == [c, b]
    assert list(out[1][0]["tokens"][:2]) == [b, c]
    # after the prefix the model preference resumes
    assert out[0][0]["tokens"][2] == a


def test_diverse_beam_groups_diversify():
    d = _dict()
    V = len(d)
    a, b = d.index("u0"), d.index("u1")
    row = np.full((V,), -10.0, np.float32)
    row[a] = 0.0
    row[b] = -0.1
    row[d.eos()] = -6.0
    model = _FixedLprobModel(row)
    dec = BeamSearchDecoder(
        model,
        d,
        beam_size=4,
        max_len_b=5,
        min_len=3,
        diverse_beam_groups=2,
        diverse_beam_strength=0.1,
    )
    out = dec.decode({}, _batch())
    seqs = [tuple(h["tokens"]) for h in out[0]]
    scores = [h["score"] for h in out[0]]
    # both groups independently find the argmax sequence; group 2's copy
    # carries the diversity penalty in its score (reference keeps penalized
    # scores too) — the duplicated sequence with distinct scores is the
    # fingerprint of per-group search
    best = seqs[0]
    dup = [i for i, s in enumerate(seqs) if s == best]
    assert len(dup) >= 2, out[0]
    assert scores[dup[0]] > scores[dup[1]]

    # sanity: plain beam search returns 4 distinct sequences instead
    dec1 = BeamSearchDecoder(model, d, beam_size=4, max_len_b=5, min_len=3)
    out1 = dec1.decode({}, _batch())
    seqs1 = [tuple(h["tokens"]) for h in out1[0]]
    assert len(set(seqs1)) == 4


def test_transducer_model_predicts_eos():
    # decoders with model_predicts_eos fold eos prob into blank: eos is
    # never emitted and decode still runs (reference
    # transducer_greedy_decoder.py:212 / transducer_beam_search_decoder:334)
    import jax

    from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder
    from espresso_tpu.decode.transducer_greedy import TransducerGreedyDecoder
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    d = AsrDictionary(enable_bos=True)  # blank = bos for transducer
    for i in range(6):
        d.add_symbol(f"u{i}")
    V = len(d)
    cfg = TransducerConfig(
        feat_dim=8,
        vocab_size=V,
        encoder=SpeechTransformerConfig(
            feat_dim=8,
            vocab_size=V,
            conv_channels=(4,),
            conv_kernel_sizes=((3, 3),),
            conv_strides=((2, 2),),
            encoder_embed_dim=16,
            encoder_ffn_dim=32,
            encoder_layers=1,
            encoder_heads=2,
            dropout=0.0,
        ),
        pred_embed_dim=8,
        pred_hidden_size=12,
        pred_layers=1,
        joint_dim=10,
    )
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((2, 21, 8)).astype(np.float32))
    lengths = jnp.asarray([21, 15])
    prev = jnp.asarray(rng.integers(0, V, (2, 4)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    batch = {"src_frames": np.asarray(frames), "src_lengths": np.asarray(lengths)}

    for dec in (
        TransducerGreedyDecoder(model, d, model_predicts_eos=True),
        TransducerBeamSearchDecoder(
            model, d, beam_size=3, model_predicts_eos=True
        ),
    ):
        out = dec.decode(variables, batch)
        for hyps in out:
            for h in hyps:
                assert d.eos() not in list(h["tokens"]), h


def test_diverse_groups_requires_divisible_beam():
    d = _dict()
    with pytest.raises(ValueError):
        BeamSearchDecoder(
            _FixedLprobModel(np.zeros(len(d))), d, beam_size=5,
            diverse_beam_groups=2,
        )


# ---------------------------------------------------------------------------
# lexically-constrained beam search (fairseq search.py
# LexicallyConstrainedBeamSearch + token_generation_constraints; Post&Vilar
# 2018 dynamic beam allocation)
# ---------------------------------------------------------------------------


def test_constrained_decoding_forces_rare_token():
    d = _dict()
    V = len(d)
    a, b = d.index("u0"), d.index("u1")
    row = np.full((V,), -10.0, np.float32)
    row[a] = -0.1
    row[b] = -6.0  # strongly dispreferred
    row[d.eos()] = -0.5
    model = _FixedLprobModel(row)
    dec = BeamSearchDecoder(model, d, beam_size=4, max_len_b=6, min_len=1)

    # unconstrained: never emits b
    out = dec.decode({}, _batch())
    assert b not in list(out[0][0]["tokens"])

    # constrained on b: top hypothesis must contain it
    cons = np.full((1, 1, 1), d.pad(), np.int32)
    cons[0, 0, 0] = b
    out_c = dec.decode({}, _batch(), constraints=cons)
    assert b in list(out_c[0][0]["tokens"])


def test_constrained_decoding_phrase_contiguous():
    d = _dict()
    V = len(d)
    a, b, c = d.index("u0"), d.index("u1"), d.index("u2")
    row = np.full((V,), -10.0, np.float32)
    row[a] = -0.1
    row[b] = -5.0
    row[c] = -5.0
    row[d.eos()] = -0.7
    model = _FixedLprobModel(row)
    dec = BeamSearchDecoder(model, d, beam_size=4, max_len_b=8, min_len=1)
    cons = np.full((1, 1, 2), d.pad(), np.int32)
    cons[0, 0, :] = [b, c]  # phrase "b c" must appear contiguously
    out = dec.decode({}, _batch(T=8), constraints=cons)
    toks = list(out[0][0]["tokens"])
    assert any(
        toks[i] == b and toks[i + 1] == c for i in range(len(toks) - 1)
    ), toks


def test_constrained_decoding_multiple_constraints_and_batch():
    d = _dict()
    V = len(d)
    a, b, c = d.index("u0"), d.index("u1"), d.index("u2")
    row = np.full((V,), -10.0, np.float32)
    row[a] = -0.1
    row[b] = -4.0
    row[c] = -4.5
    row[d.eos()] = -0.7
    model = _FixedLprobModel(row)
    dec = BeamSearchDecoder(model, d, beam_size=4, max_len_b=8, min_len=1)
    # sentence 0: require both b and c; sentence 1: unconstrained (all pad)
    cons = np.full((2, 2, 1), d.pad(), np.int32)
    cons[0, 0, 0] = b
    cons[0, 1, 0] = c
    out = dec.decode({}, _batch(B=2, T=8), constraints=cons)
    toks0 = list(out[0][0]["tokens"])
    assert b in toks0 and c in toks0
    toks1 = list(out[1][0]["tokens"])
    assert b not in toks1 and c not in toks1


def test_constraints_reject_sampling_combo():
    d = _dict()
    model = _FixedLprobModel(np.zeros(len(d), np.float32))
    dec = BeamSearchDecoder(model, d, beam_size=2, sampling=True)
    cons = np.zeros((1, 1, 1), np.int32)
    with pytest.raises(ValueError):
        dec.decode({}, _batch(), constraints=cons)


def test_beam_search_transformer_lm_fusion():
    """Attention beam search + transformer LM shallow fusion (lockstep
    positions; transformer LM carry = per-layer caches + per-row index)."""
    import jax

    from espresso_tpu.models.transformer_lm import (
        TransformerLanguageModel,
        TransformerLMConfig,
    )

    d = _dict()
    V = len(d)
    row = np.full((V,), -6.0, np.float32)
    row[d.index("u0")] = -0.5
    row[d.index("u1")] = -0.7
    row[d.eos()] = -2.0
    model = _FixedLprobModel(row)
    lm = TransformerLanguageModel(
        TransformerLMConfig(
            vocab_size=V, embed_dim=8, ffn_dim=16, layers=1, heads=2,
            dropout=0.0, max_target_positions=32,
        )
    )
    lm_vars = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 2), jnp.int32))
    base = BeamSearchDecoder(model, d, beam_size=2, max_len_b=5).decode(
        {}, _batch()
    )
    dec = BeamSearchDecoder(
        model, d, beam_size=2, max_len_b=5, lm=lm, lm_weight=0.5
    )
    dec.lm_variables = lm_vars
    fused = dec.decode({}, _batch())
    assert len(fused) == 1 and len(fused[0]) >= 1
    assert np.isfinite(fused[0][0]["score"])
    # fusion shifted the scores
    assert abs(fused[0][0]["score"] - base[0][0]["score"]) > 1e-4
