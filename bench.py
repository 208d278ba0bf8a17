"""Benchmark: Conformer-Transducer decode throughput (RTFx) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (BASELINE.md): LibriSpeech-shaped synthetic load — batches of 80-dim
fbank utterances (~6.25 s each, the test-other average) through the
reference's conformer_transducer_librispeech operating point (16-layer
conformer d=512, 2-layer LSTM predictor, joint 512,
examples/asr_librispeech/config/conformer_transducer_librispeech.yaml:28-92).
RTFx = audio_seconds_decoded / wall_seconds; target >= 500x per chip
(vs_baseline = RTFx / 500).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from espresso_tpu.data.dictionary import AsrDictionary
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    VOCAB = 1024  # BPE-size vocab (reference librispeech recipe)
    FEAT_DIM = 80
    B = int(os.environ.get("ESPRESSO_BENCH_B", "256"))  # serving batch
    T = 624  # 6.24 s per utterance at 10 ms frames
    FRAME_SHIFT_S = 0.01

    cfg = TransducerConfig(
        feat_dim=FEAT_DIM,
        vocab_size=VOCAB,
        encoder=SpeechTransformerConfig(
            feat_dim=FEAT_DIM,
            vocab_size=VOCAB,
            encoder_layer_type="conformer",
            encoder_pos_type="relative",
            encoder_embed_dim=512,
            encoder_ffn_dim=2048,
            encoder_layers=16,
            encoder_heads=8,
            depthwise_conv_kernel_size=31,
            conv_norm_type=os.environ.get("ESPRESSO_BENCH_NORM", "batch"),
            conformer_norm_type=os.environ.get("ESPRESSO_BENCH_NORM", "batch"),
            dropout=0.0,
        ),
        pred_embed_dim=512,
        pred_hidden_size=512,
        pred_layers=2,
        pred_dropout=0.0,
        joint_dim=512,
    )
    model = TransducerModel(cfg)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((B, T, FEAT_DIM)).astype(np.float32)
    )
    lengths = jnp.asarray(np.full(B, T, np.int32))
    prev = jnp.asarray(rng.integers(4, VOCAB, size=(B, 2)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    # bf16 inference (score math stays fp32 inside the decoders)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )
    frames = frames.astype(jnp.bfloat16)

    from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder

    dic = AsrDictionary(enable_bos=True)
    decoder = TransducerBeamSearchDecoder(
        model,
        dic,
        beam_size=10,
        expansion_beta=2,
        expansion_gamma=2.3,
        max_num_expansions_per_step=2,
        max_out_factor=0.35,
    )
    batch = {"src_frames": frames, "src_lengths": lengths}

    # warmup / compile
    decoder.decode(variables, batch)

    # sustained throughput: batches launch back-to-back (the serving
    # pipeline), so each result's host fetch overlaps the next batch's
    # device compute; wall covers first launch -> last result unpacked
    iters = 5
    t0 = time.perf_counter()
    handles = [decoder.decode_async(variables, batch) for _ in range(iters)]
    out = [decoder.collect(h) for h in handles]
    wall = time.perf_counter() - t0

    audio_seconds = iters * B * T * FRAME_SHIFT_S
    rtfx = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "conformer_transducer_beam10_decode_RTFx",
                "value": round(rtfx, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtfx / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
