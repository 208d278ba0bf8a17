"""Decode benchmark at the reference's REAL operating points, one chip.

bench.py pins the driver metric (no-LM beam-10). This script pins the other
two points the reference's flagship recipes actually run, so the repo perf
table is honest about how decode behaves in production:

  beam_lm — AES beam=10 + LSTM-LM shallow fusion lm_weight=0.47 (the
            librispeech recipe's decode, examples/asr_librispeech/run.sh
            :266-290; LM: lstm_lm_librispeech 3x1024). The fused Pallas
            joint+topk kernel keeps running under fusion (the LM term rides
            in as a label-bias tile, ops/decode_kernels.py).
  greedy  — TransducerGreedyDecoder (the reference's
            transducer_greedy_decoder.py operating point).
  beam    — same as bench.py (for side-by-side runs).

Usage: python bench_decode.py [beam_lm|greedy|beam]   (default beam_lm)
Prints ONE JSON line per run.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from espresso_tpu.data.dictionary import AsrDictionary
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    point = sys.argv[1] if len(sys.argv) > 1 else "beam_lm"
    VOCAB = 1024
    FEAT_DIM = 80
    B = 256
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
            conv_norm_type="layer",
            conformer_norm_type="layer",
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
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )
    frames = frames.astype(jnp.bfloat16)
    dic = AsrDictionary(enable_bos=True)
    batch = {"src_frames": frames, "src_lengths": lengths}

    if point == "greedy":
        from espresso_tpu.decode.transducer_greedy import (
            TransducerGreedyDecoder,
        )

        decoder = TransducerGreedyDecoder(model, dic, max_out_factor=0.35)
        metric = "conformer_transducer_greedy_decode_RTFx"
    else:
        from espresso_tpu.decode.transducer_beam import (
            TransducerBeamSearchDecoder,
        )

        lm = None
        lm_vars = None
        lm_weight = 0.0
        if point == "beam_lm":
            # lstm_lm_librispeech shape (run.sh Stage 7: 3x1024 embed 512)
            from espresso_tpu.models.lstm_lm import (
                LSTMLanguageModel,
                LSTMLMConfig,
            )

            lm = LSTMLanguageModel(
                LSTMLMConfig(
                    vocab_size=VOCAB - 1,
                    embed_dim=512,
                    hidden_size=1024,
                    out_embed_dim=512,
                    num_layers=3,
                    dropout=0.0,
                )
            )
            lm_vars = lm.init(
                jax.random.PRNGKey(1), jnp.zeros((2, 3), jnp.int32)
            )
            lm_vars = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                lm_vars,
            )
            lm_weight = 0.47
            metric = "conformer_transducer_beam10_lstmlm_fused_decode_RTFx"
        else:
            metric = "conformer_transducer_beam10_decode_RTFx"

        decoder = TransducerBeamSearchDecoder(
            model,
            dic,
            beam_size=10,
            expansion_beta=2,
            expansion_gamma=2.3,
            max_num_expansions_per_step=2,
            max_out_factor=0.35,
            lm=lm,
            lm_weight=lm_weight,
            lm_variables=lm_vars,
        )

    decoder.decode(variables, batch)  # warmup / compile

    # sustained throughput (matches bench.py): back-to-back launches, host
    # fetches overlap the next batch's compute when the decoder pipelines
    iters = 5
    t0 = time.perf_counter()
    if hasattr(decoder, "decode_async"):
        handles = [decoder.decode_async(variables, batch) for _ in range(iters)]
        for h in handles:
            decoder.collect(h)
    else:
        for _ in range(iters):
            decoder.decode(variables, batch)
    wall = time.perf_counter() - t0

    audio_seconds = iters * B * T * FRAME_SHIFT_S
    rtfx = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(rtfx, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtfx / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
