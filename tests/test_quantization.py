"""Quantization (fairseq/modules/quantization pq + scalar equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.ops.quantization import (
    dequantize_int8,
    dequantize_params_int8,
    int8_matmul,
    pq_dequantize,
    pq_dequantize_params,
    pq_quantize,
    pq_quantize_params,
    quantize_int8,
    quantize_params_int8,
)


def test_int8_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    q, s = quantize_int8(w, axis=-1)
    assert q.dtype == np.int8 and s.shape == (128,)
    back = dequantize_int8(q, s, axis=-1)
    # max error is half a quantization step per channel
    step = s[None, :]
    assert np.all(np.abs(back - w) <= step * 0.5 + 1e-6)


def test_int8_matmul_matches_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    w = rng.standard_normal((128, 128)).astype(np.float32)
    q, s = quantize_int8(w, axis=-1)
    out = int8_matmul(x, jnp.asarray(q), jnp.asarray(s), interpret=True)
    ref = np.asarray(x) @ w
    err = np.abs(np.asarray(out) - ref)
    # both activations and weights are 8-bit: tolerance scales with row norms
    tol = (
        np.abs(np.asarray(x)).max(1, keepdims=True)
        * np.abs(w).max(0, keepdims=True)
        * (2.0 / 127.0)
        * np.sqrt(128)
    )
    assert np.all(err <= tol + 1e-4)
    # correlation sanity: quantized result is essentially the dense result
    c = np.corrcoef(np.asarray(out).ravel(), ref.ravel())[0, 1]
    assert c > 0.999


def test_params_int8_walker_targets_large_kernels():
    params = {
        "layer": {
            "kernel": np.random.default_rng(2).standard_normal((64, 128)).astype(
                np.float32
            ),
            "bias": np.zeros(128, np.float32),
        },
        "tiny": {"kernel": np.ones((2, 2), np.float32)},
    }
    qtree, n_q, _ = quantize_params_int8(params, min_size=1024)
    assert n_q == 1
    assert qtree["layer"]["kernel"]["__int8__"]
    assert qtree["tiny"]["kernel"].shape == (2, 2)  # untouched
    back = dequantize_params_int8(qtree)
    err = np.abs(np.asarray(back["layer"]["kernel"]) - params["layer"]["kernel"])
    assert err.max() < 0.05


def test_pq_roundtrip_and_compression():
    rng = np.random.default_rng(3)
    # low-rank-ish weight so k-means has structure to exploit
    w = (rng.standard_normal((96, 16)) @ rng.standard_normal((16, 64))).astype(
        np.float32
    )
    cent, codes = pq_quantize(w, block_size=8, n_centroids=64, iters=10)
    assert codes.dtype == np.uint8
    back = pq_dequantize(cent, codes, w.shape)
    rel = np.linalg.norm(back - w) / np.linalg.norm(w)
    assert rel < 0.8  # lossy compression, signal preserved
    # more centroids -> strictly better reconstruction
    cent_s, codes_s = pq_quantize(w, block_size=8, n_centroids=8, iters=10)
    back_s = pq_dequantize(cent_s, codes_s, w.shape)
    rel_s = np.linalg.norm(back_s - w) / np.linalg.norm(w)
    assert rel < rel_s
    # compression: codes bytes + centroids << fp32 weights
    compressed = codes.nbytes + cent.nbytes
    assert compressed < w.nbytes // 3

    tree = pq_quantize_params({"m": {"kernel": w}}, block_size=8, n_centroids=64,
                              min_size=1024)
    assert tree["m"]["kernel"]["__pq__"]
    back2 = pq_dequantize_params(tree)
    np.testing.assert_allclose(np.asarray(back2["m"]["kernel"]), back, atol=1e-5)


def test_quantized_model_still_decodes():
    """Scalar-quantize a small transformer LM's kernels and check outputs
    stay close (the inference-compression use case)."""
    from espresso_tpu.models.transformer_lm import (
        TransformerLanguageModel,
        TransformerLMConfig,
    )

    cfg = TransformerLMConfig(
        vocab_size=20, embed_dim=32, ffn_dim=64, layers=2, heads=2, dropout=0.0
    )
    lm = TransformerLanguageModel(cfg)
    tokens = jnp.asarray(np.random.default_rng(4).integers(0, 20, (2, 6)))
    variables = lm.init(jax.random.PRNGKey(0), tokens)
    ref = lm.apply(variables, tokens)
    qtree, n_q, _ = quantize_params_int8(variables["params"], min_size=512)
    assert n_q > 0
    deq = dequantize_params_int8(qtree)
    out = lm.apply({"params": deq}, tokens)
    ref_lp = jax.nn.log_softmax(ref, -1)
    out_lp = jax.nn.log_softmax(out, -1)
    # top-1 predictions preserved
    assert (
        np.asarray(jnp.argmax(ref_lp, -1)) == np.asarray(jnp.argmax(out_lp, -1))
    ).mean() > 0.9


def test_quant_noise_masks_blocks_and_preserves_expectation():
    from espresso_tpu.ops.quantization import apply_quant_noise

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    params = {"layer": {"kernel": w}, "tiny": {"kernel": jnp.ones((2, 2))}}
    out = apply_quant_noise(params, jax.random.PRNGKey(0), p=0.25,
                            block_size=8, min_size=1024)
    noisy = np.asarray(out["layer"]["kernel"])
    # tiny kernels untouched
    np.testing.assert_array_equal(np.asarray(out["tiny"]["kernel"]),
                                  np.ones((2, 2)))
    # roughly a quarter of values zeroed, survivors rescaled by 1/(1-p)
    zero_frac = (noisy == 0).mean()
    assert 0.1 < zero_frac < 0.45
    surv = noisy[noisy != 0]
    ref = np.asarray(w)[noisy != 0]
    np.testing.assert_allclose(surv, ref / 0.75, rtol=1e-5)
    # p=0 is identity
    same = apply_quant_noise(params, jax.random.PRNGKey(0), p=0.0)
    assert same is params


def test_quant_noise_training_e2e(tmp_path):
    """Train briefly with quant noise on; loss stays finite and decreases."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from tests.utils import make_corpus

    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_corpus(d, "train", num_utts=12, feat_dim=8, seed=0)
    make_corpus(d, "valid", num_utts=4, feat_dim=8, seed=1)
    stats = train_main([
        f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt",
        "dataset.max_tokens=800", "dataset.num_batch_buckets=1",
        "dataset.required_batch_size_multiple=2", "dataset.feat_dim=8",
        "model.name=speech_lstm", "model.conv_channels=(4,)",
        "model.conv_kernel_sizes=((3,3),)", "model.conv_strides=((2,2),)",
        "model.encoder_hidden_size=16", "model.encoder_layers=1",
        "model.decoder_embed_dim=8", "model.decoder_hidden_size=16",
        "model.decoder_out_embed_dim=16", "model.decoder_layers=1",
        "model.attention_dim=16", "model.dropout=0.0",
        "optimization.lr=0.003", "optimization.max_epoch=1",
        "optimization.quant_noise_pq=0.1",
        "common.log_interval=10", "common.dtype=float32",
    ])
    assert np.isfinite(stats["loss"])
