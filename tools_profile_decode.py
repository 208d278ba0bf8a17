"""Scratch profiler: decompose AES decode wall time (not shipped API).

Times: encoder, full beam decode at several (K, n_exp), greedy decode, and
isolated joint/pred-step scans to locate the per-frame cost.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

VOCAB, FEAT_DIM, B, T = 1024, 80, 256, 624


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.2f} ms")
    return dt


def main():
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
    frames = jnp.asarray(rng.standard_normal((B, T, FEAT_DIM)).astype(np.float32))
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

    enc_fn = jax.jit(
        lambda v, f, l: model.apply(v, f, l, method="encode").encoder_out
    )
    timed("encoder fwd", enc_fn, variables, frames, lengths)

    from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder

    dic = AsrDictionary(enable_bos=True)
    batch = {"src_frames": frames, "src_lengths": lengths}
    for K, n_exp in ((10, 1), (10, 0), (5, 2)):
        dec = TransducerBeamSearchDecoder(
            model, dic, beam_size=K, expansion_beta=2, expansion_gamma=2.3,
            max_num_expansions_per_step=n_exp, max_out_factor=0.35,
        )
        dec.decode(variables, batch)  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            dec.decode(variables, batch)
        dt = (time.perf_counter() - t0) / 3
        print(f"AES K={K} n_exp={n_exp:28d} {dt*1e3:9.2f} ms")

    # isolated joint scan: T frames x 3 joint calls on [B*K, J]
    K = 10
    BK = B * K
    enc = model.apply(variables, frames, lengths, method="encode")
    enc_proj = model.apply(variables, enc.encoder_out, method="joint_enc_proj")
    pdtype = jnp.bfloat16
    carry0 = model.apply(variables, BK, pdtype, method="init_pred_carry")
    feat0, carry0 = model.apply(
        variables, jnp.full((BK,), 0, jnp.int32), carry0, method="pred_step"
    )

    def joint_scan(v, ep, feat):
        def step(c, t):
            enc_t = jnp.repeat(ep[:, t], K, axis=0)
            acc = 0.0
            for _ in range(3):
                logits = model.apply(
                    v, enc_t, feat, method="joint_step_precomputed"
                )
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                acc = acc + lp[:, 0]
            return c + acc.sum(), None
        s, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(T))
        return s

    return  # variants only this run
    timed("3x joint+softmax scan over T", jax.jit(joint_scan), variables, enc_proj, feat0)

    def pred_scan(v, carry):
        def step(c, t):
            feat, carry2 = model.apply(
                v, jnp.full((BK,), 3, jnp.int32), c, method="pred_step"
            )
            return carry2, feat[:, 0]
        c, f = jax.lax.scan(step, carry, jnp.arange(2 * T))
        return f.sum()

    timed("2T pred LSTM steps (2/frame)", jax.jit(pred_scan), variables, carry0)

    # topk scan
    from espresso_tpu.decode.transducer_beam import _exact_topk_rows

    def topk_scan(x):
        def step(c, t):
            v, i = _exact_topk_rows(x + c, 12)
            return c + v[:, 0].mean(), None
        s, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(2 * T))
        return s

    xs = jnp.asarray(rng.standard_normal((B, K * VOCAB)).astype(np.float32))
    timed("2T exact-topk [256,10240]", jax.jit(topk_scan), xs)

    # state-gather cost: pred carry reorder 2x/frame
    def gather_scan(c0):
        def step(c, t):
            idx = (jnp.arange(BK) + t) % BK
            c = jax.tree_util.tree_map(
                lambda x: jnp.take(x, idx, axis=1) if x.ndim == 3 else x, c
            )
            return c, None
        c, _ = jax.lax.scan(step, c0, jnp.arange(5 * T))
        return jax.tree_util.tree_leaves(c)[0].sum()

    timed("5T pred-carry gathers", jax.jit(gather_scan), carry0)


if __name__ == "__main__":
    main()
