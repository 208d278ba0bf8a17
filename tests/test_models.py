import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.models.speech_lstm import SpeechLSTMConfig, SpeechLSTMModel
from espresso_tpu.models.speech_transformer import (
    SpeechTransformerConfig,
    SpeechTransformerModel,
)
from espresso_tpu.models.transducer import TransducerConfig, TransducerModel
from espresso_tpu.models.lstm_lm import LSTMLMConfig, LSTMLanguageModel
from espresso_tpu.models.speech_tdnn import SpeechTdnnConfig, SpeechTdnnModel
from espresso_tpu.models.encoder_models import (
    TransformerEncoderModelConfig,
    SpeechTransformerEncoderModel,
)
from espresso_tpu.models.speech_transformer import SpeechTransformerConfig as STC
from espresso_tpu.registry import ARCHITECTURES, MODELS, apply_architecture


B, T, F, U, V = 2, 37, 16, 7, 20


def _batch():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lengths = jnp.asarray([T, T - 10])
    prev = jnp.asarray(rng.integers(0, V, (B, U)).astype(np.int32))
    return frames, lengths, prev


def small_lstm_cfg(**kw):
    return SpeechLSTMConfig(
        feat_dim=F,
        vocab_size=V,
        conv_channels=(4, 4),
        conv_kernel_sizes=((3, 3), (3, 3)),
        conv_strides=((2, 2), (2, 2)),
        encoder_hidden_size=12,
        encoder_layers=2,
        decoder_embed_dim=8,
        decoder_hidden_size=12,
        decoder_out_embed_dim=10,
        decoder_layers=2,
        attention_dim=9,
        dropout=0.0,
        **kw,
    )


def small_transformer_cfg(**kw):
    return SpeechTransformerConfig(
        feat_dim=F,
        vocab_size=V,
        conv_channels=(4,),
        conv_kernel_sizes=((3, 3),),
        conv_strides=((2, 2),),
        encoder_embed_dim=16,
        encoder_ffn_dim=32,
        encoder_layers=2,
        encoder_heads=2,
        decoder_embed_dim=16,
        decoder_ffn_dim=32,
        decoder_layers=2,
        decoder_heads=2,
        dropout=0.0,
        **kw,
    )


def test_speech_lstm_forward_and_step_consistency():
    frames, lengths, prev = _batch()
    model = SpeechLSTMModel(small_lstm_cfg())
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    (logits, enc), _ = model.apply(
        variables, frames, lengths, prev, mutable=["batch_stats"]
    )
    assert logits.shape == (B, U, V)
    assert np.isfinite(np.asarray(logits)).all()

    # step-by-step decode must reproduce teacher-forced logits
    enc2 = model.apply(variables, frames, lengths, method="encode")
    carry = model.apply(
        variables, B, method="init_decoder_carry"
    )
    outs = []
    for u in range(U):
        step_logits, carry, _ = model.apply(
            variables, prev[:, u], carry, enc2, method="decode_step"
        )
        outs.append(np.asarray(step_logits))
    step_logits = np.stack(outs, axis=1)
    assert np.allclose(step_logits, np.asarray(logits), atol=1e-4)


def test_speech_lstm_scheduled_sampling_runs():
    frames, lengths, prev = _batch()
    model = SpeechLSTMModel(small_lstm_cfg())
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    (logits, _), _ = model.apply(
        variables,
        frames,
        lengths,
        prev,
        True,  # train
        0.5,  # ss_prob
        mutable=["batch_stats"],
        rngs={"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("layer_type,pos", [("transformer", "abs"), ("conformer", "relative")])
def test_speech_transformer_forward(layer_type, pos):
    frames, lengths, prev = _batch()
    cfg = small_transformer_cfg(
        encoder_layer_type=layer_type, encoder_pos_type=pos
    )
    model = SpeechTransformerModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    (logits, enc), _ = model.apply(
        variables, frames, lengths, prev, mutable=["batch_stats"]
    )
    assert logits.shape == (B, U, V)
    assert np.isfinite(np.asarray(logits)).all()


def test_speech_transformer_incremental_matches_teacher_forced():
    frames, lengths, prev = _batch()
    cfg = small_transformer_cfg()
    model = SpeechTransformerModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    (logits, enc), _ = model.apply(
        variables, frames, lengths, prev, mutable=["batch_stats"]
    )
    cache = model.apply(variables, enc, U, method="init_cache")
    outs = []
    for u in range(U):
        step_logits, cache, attn = model.apply(
            variables, prev[:, u], jnp.asarray(u), cache, enc, method="decode_step"
        )
        outs.append(np.asarray(step_logits))
    step_logits = np.stack(outs, axis=1)
    assert np.allclose(step_logits, np.asarray(logits), atol=1e-4)


def test_transducer_lattice_and_steps():
    frames, lengths, prev = _batch()
    cfg = TransducerConfig(
        feat_dim=F,
        vocab_size=V,
        encoder=small_transformer_cfg(
            encoder_layer_type="conformer", encoder_pos_type="relative"
        ),
        pred_embed_dim=8,
        pred_hidden_size=12,
        pred_layers=2,
        joint_dim=10,
    )
    model = TransducerModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    (lattice, enc), _ = model.apply(
        variables, frames, lengths, prev, mutable=["batch_stats"]
    )
    T_out = enc.encoder_out.shape[1]
    assert lattice.shape == (B, T_out, U, V)

    # pairwise joint must match the lattice at matched indices
    pred = model.apply(variables, prev, method="predict_sequence")
    pair = model.apply(
        variables, enc.encoder_out[:, 3], pred[:, 2], method="joint_step"
    )
    assert np.allclose(np.asarray(pair), np.asarray(lattice[:, 3, 2]), atol=1e-5)

    # incremental predictor matches sequence features
    carry = model.apply(variables, B, method="init_pred_carry")
    feats = []
    for u in range(U):
        f_u, carry = model.apply(variables, prev[:, u], carry, method="pred_step")
        feats.append(np.asarray(f_u))
    assert np.allclose(np.stack(feats, 1), np.asarray(pred), atol=1e-4)


def test_lstm_lm():
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, V, (B, U)).astype(np.int32))
    model = LSTMLanguageModel(
        LSTMLMConfig(vocab_size=V, embed_dim=8, hidden_size=12, out_embed_dim=12, num_layers=2, dropout=0.0)
    )
    variables = model.init(jax.random.PRNGKey(0), prev)
    logits = model.apply(variables, prev)
    assert logits.shape == (B, U, V)
    # incremental
    carry = model.apply(variables, B, method="init_carry")
    outs = []
    for u in range(U):
        lg, carry = model.apply(variables, prev[:, u], carry, method="decode_step")
        outs.append(np.asarray(lg))
    assert np.allclose(np.stack(outs, 1), np.asarray(logits), atol=1e-4)


def test_tdnn_model():
    frames, lengths, _ = _batch()
    cfg = SpeechTdnnConfig(
        feat_dim=F,
        vocab_size=30,
        hidden_sizes=(16, 16),
        kernel_sizes=(3, 3),
        strides=(1, 1),
        dilations=(1, 2),
        norm_type="layer",
    )
    model = SpeechTdnnModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), frames, lengths)
    logits, enc = model.apply(variables, frames, lengths)
    assert logits.shape[0] == B and logits.shape[2] == 30
    assert np.isfinite(np.asarray(logits)).all()


def test_encoder_model_ctc():
    frames, lengths, _ = _batch()
    cfg = TransformerEncoderModelConfig(
        feat_dim=F, vocab_size=V, encoder=small_transformer_cfg()
    )
    model = SpeechTransformerEncoderModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), frames, lengths)
    (logits, enc), _ = model.apply(
        variables, frames, lengths, mutable=["batch_stats"]
    )
    assert logits.shape[-1] == V


def test_architecture_presets():
    cfg = SpeechLSTMConfig()
    name = apply_architecture("speech_conv_lstm_librispeech", cfg)
    assert name == "speech_lstm"
    assert cfg.encoder_hidden_size == 1024
    assert "conformer_transducer_librispeech" in ARCHITECTURES
    assert "speech_transformer_librispeech" in ARCHITECTURES
    assert "speech_lstm" in MODELS and "speech_transformer_transducer" in MODELS


def test_dropout_training_paths():
    """dropout > 0 must work in all attention-bearing models (regression:
    MultiheadAttention once created Dropout outside setup)."""
    frames, lengths, prev = _batch()
    cfg = small_transformer_cfg(
        encoder_layer_type="conformer", encoder_pos_type="relative"
    )
    cfg.dropout = 0.1
    model = SpeechTransformerModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    (logits, _), _ = model.apply(
        variables,
        frames,
        lengths,
        prev,
        True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_layerdrop_gates_layers():
    """encoder/decoder LayerDrop (fairseq layer_drop.py): with rate 1.0 every
    layer is skipped, so the train forward must differ from rate 0.0 and the
    rate-1.0 encoder output must equal the pre-layer input path."""
    frames, lengths, prev = _batch()
    cfg0 = small_transformer_cfg()
    cfg1 = small_transformer_cfg(encoder_layerdrop=1.0, decoder_layerdrop=1.0)
    m0 = SpeechTransformerModel(cfg0)
    m1 = SpeechTransformerModel(cfg1)
    variables = m0.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        frames, lengths, prev,
    )
    rngs = {"dropout": jax.random.PRNGKey(2)}
    (y0, _), _ = m0.apply(variables, frames, lengths, prev, train=True,
                          rngs=rngs, mutable=["batch_stats"])
    (y1, _), _ = m1.apply(variables, frames, lengths, prev, train=True,
                          rngs=rngs, mutable=["batch_stats"])
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-4
    # eval path ignores layerdrop entirely
    (e0, _), _ = m0.apply(variables, frames, lengths, prev, mutable=["batch_stats"])
    (e1, _), _ = m1.apply(variables, frames, lengths, prev, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=1e-6)
