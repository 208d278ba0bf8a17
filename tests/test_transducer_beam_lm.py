"""AES transducer beam search with shallow LM fusion: the LM state rides the
per-round version stack (blank-less index shift, transducer_base_decoder.py:
85-104 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder
from espresso_tpu.models.lstm_lm import LSTMLanguageModel, LSTMLMConfig
from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

V = 9


def _setup(lm_kind="lstm"):
    d = AsrDictionary(enable_bos=True)
    for i in range(V - 5):
        d.add_symbol(f"u{i}")
    cfg = TransducerConfig(
        feat_dim=6,
        vocab_size=V,
        encoder=SpeechTransformerConfig(
            feat_dim=6,
            vocab_size=V,
            encoder_embed_dim=8,
            encoder_ffn_dim=16,
            encoder_layers=1,
            encoder_heads=2,
            conv_channels=(2,),
            conv_kernel_sizes=((3, 3),),
            conv_strides=((2, 2),),
            conv_norm_type="layer",
            dropout=0.0,
        ),
        pred_embed_dim=8,
        pred_hidden_size=8,
        pred_layers=1,
        pred_dropout=0.0,
        joint_dim=8,
    )
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((2, 16, 6)), jnp.float32)
    lengths = jnp.asarray([16, 12])
    prev = jnp.asarray(rng.integers(3, V, (2, 3)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    # LM over the blank-less vocabulary (size V-1, index shift -1)
    if lm_kind == "lstm":
        lm_cfg = LSTMLMConfig(
            vocab_size=V - 1, embed_dim=8, hidden_size=8, out_embed_dim=8,
            num_layers=1, dropout=0.0,
        )
        lm = LSTMLanguageModel(lm_cfg)
    else:
        from espresso_tpu.models.transformer_lm import (
            TransformerLanguageModel,
            TransformerLMConfig,
        )

        lm = TransformerLanguageModel(
            TransformerLMConfig(
                vocab_size=V - 1, embed_dim=8, ffn_dim=16, layers=1,
                heads=2, dropout=0.0, max_target_positions=32,
            )
        )
    lm_vars = lm.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 3), jnp.int32)
    )
    batch = {"src_frames": frames, "src_lengths": lengths}
    return d, model, variables, lm, lm_vars, batch


def _decode(d, model, variables, batch, lm=None, lm_vars=None, w=0.0):
    dec = TransducerBeamSearchDecoder(
        model,
        d,
        beam_size=3,
        expansion_beta=1,
        expansion_gamma=4.0,
        max_num_expansions_per_step=2,
        lm=lm,
        lm_weight=w,
        lm_variables=lm_vars,
    )
    return dec.decode(variables, batch)


import pytest


@pytest.mark.parametrize("lm_kind", ["lstm", "transformer"])
def test_lm_weight_zero_matches_no_lm(lm_kind):
    d, model, variables, lm, lm_vars, batch = _setup(lm_kind)
    base = _decode(d, model, variables, batch)
    zero = _decode(d, model, variables, batch, lm=lm, lm_vars=lm_vars, w=0.0)
    for b in range(len(base)):
        assert len(base[b]) == len(zero[b])
        for h0, h1 in zip(base[b], zero[b]):
            assert np.array_equal(h0["tokens"], h1["tokens"])
            assert abs(h0["score"] - h1["score"]) < 1e-4


@pytest.mark.parametrize("lm_kind", ["lstm", "transformer"])
def test_lm_fusion_changes_scores_and_stays_finite(lm_kind):
    d, model, variables, lm, lm_vars, batch = _setup(lm_kind)
    base = _decode(d, model, variables, batch)
    fused = _decode(d, model, variables, batch, lm=lm, lm_vars=lm_vars, w=0.7)
    assert all(len(hyps) >= 1 for hyps in fused)
    for hyps in fused:
        for h in hyps:
            assert np.isfinite(h["score"])
            assert (np.asarray(h["tokens"]) != d.blank()).all()
    # fusion actually influenced the search (scores differ)
    diffs = [
        abs(h0["score"] - h1["score"])
        for b in range(len(base))
        for h0, h1 in zip(base[b], fused[b])
    ]
    assert max(diffs) > 1e-3
