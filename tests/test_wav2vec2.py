"""wav2vec 2.0 / HuBERT family (fairseq/models/wav2vec/wav2vec2.py,
wav2vec2_asr.py, hubert/hubert.py equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np

import espresso_tpu.criterions  # noqa: F401 (registration)
from espresso_tpu.config import EspressoConfig
from espresso_tpu.models.wav2vec2 import (
    DEFAULT_CONV_LAYERS,
    HubertConfig,
    HubertModel,
    Wav2Vec2Config,
    Wav2Vec2CtcConfig,
    Wav2Vec2CtcModel,
    Wav2Vec2Model,
    compute_span_mask,
    extractor_output_lengths,
)
from espresso_tpu.registry import CRITERIONS

TINY_CONV = ((8, 10, 5), (8, 3, 2), (8, 2, 2))


def _w2v_cfg(**kw):
    base = dict(
        conv_layers=TINY_CONV,
        encoder_embed_dim=16,
        encoder_ffn_dim=32,
        encoder_layers=2,
        encoder_heads=2,
        conv_pos=8,
        conv_pos_groups=2,
        dropout=0.0,
        quantizer_groups=2,
        quantizer_entries=6,
        vq_dim=8,
        num_negatives=4,
        final_dim=8,
        mask_length=3,
    )
    base.update(kw)
    return Wav2Vec2Config(**base)


def test_span_mask_static_and_length_aware():
    rng = jax.random.PRNGKey(0)
    lengths = jnp.asarray([40, 10])
    mask = compute_span_mask(rng, 2, 40, lengths, mask_prob=0.5, mask_length=4)
    m = np.asarray(mask)
    assert m.shape == (2, 40)
    # nothing masked beyond each row's length
    assert not m[1, 10:].any()
    assert m[0].sum() > 0
    # coverage is in the right ballpark for the full row (0.5 +- wide slack)
    assert 0.2 <= m[0].mean() <= 0.8


def test_extractor_output_lengths_match_shapes():
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 800)), jnp.float32)
    model = Wav2Vec2Model(_w2v_cfg())
    lens = jnp.asarray([800, 400])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        wav,
        lens,
    )
    out = model.apply(
        variables, wav, lens, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    T = out["logits"].shape[1]
    # analytic length of the full row equals the conv output T
    assert int(extractor_output_lengths(TINY_CONV, jnp.asarray([800]))[0]) == T
    assert out["logits"].shape[2] == 1 + 4  # pos + negatives


def test_wav2vec2_criterion_trains():
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 800)), jnp.float32)
    lens = jnp.asarray([800, 800])
    model = Wav2Vec2Model(_w2v_cfg())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        wav,
        lens,
    )
    crit = CRITERIONS.build(
        "wav2vec2_criterion", EspressoConfig().criterion, None
    )
    batch = {
        "src_frames": wav,
        "src_lengths": lens,
        "weight": jnp.ones((2,)),
    }

    def loss_fn(params):
        loss, n, logging, _ = crit(
            model,
            {"params": params},
            batch,
            rngs={"dropout": jax.random.PRNGKey(3)},
            train=True,
        )
        return loss / n

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0
    )
    assert gnorm > 0  # gradients flow through quantizer + context


def test_wav2vec2_ctc_finetune_shapes():
    cfg = Wav2Vec2CtcConfig(vocab_size=11, w2v=_w2v_cfg())
    model = Wav2Vec2CtcModel(cfg)
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((2, 800)), jnp.float32)
    lens = jnp.asarray([800, 600])
    variables = model.init(jax.random.PRNGKey(0), wav, lens)
    logits, enc = model.apply(variables, wav, lens)
    assert logits.shape[0] == 2 and logits.shape[2] == 11
    assert logits.shape[1] == enc.encoder_out.shape[1]
    assert int(enc.src_lengths[1]) <= int(enc.src_lengths[0])


def test_hubert_masked_prediction():
    cfg = HubertConfig(
        vocab_size=7,
        conv_layers=TINY_CONV,
        encoder_embed_dim=16,
        encoder_ffn_dim=32,
        encoder_layers=2,
        encoder_heads=2,
        conv_pos=8,
        conv_pos_groups=2,
        dropout=0.0,
        final_dim=8,
        mask_length=3,
    )
    model = HubertModel(cfg)
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 800)), jnp.float32)
    lens = jnp.asarray([800, 800])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        wav,
        lens,
    )
    # label stream at a different rate than the latents (resampled in loss)
    target = jnp.asarray(rng.integers(0, 7, (2, 50)), jnp.int32)
    crit = CRITERIONS.build("hubert_criterion", EspressoConfig().criterion, None)
    batch = {
        "src_frames": wav,
        "src_lengths": lens,
        "target": target,
        "weight": jnp.ones((2,)),
    }
    loss, n, logging, _ = crit(
        model, variables, batch, rngs={"dropout": jax.random.PRNGKey(2)},
        train=True,
    )
    assert np.isfinite(float(loss)) and int(n) > 0
    assert 0 <= float(logging["correct"]) <= float(n)
