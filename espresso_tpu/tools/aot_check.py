"""AOT compile-only validation of the TPU programs (no TPU needed).

JAX can lower and fully compile a program for a TPU *topology* using a
local libtpu without any attached device (``jax.experimental.topologies``
+ sharded ``ShapeDtypeStruct`` AOT). That turns "does Mosaic accept every
Pallas kernel at the flagship shapes, inside the full jitted program"
into a host-only check — the class of failure that previously could only
surface on a real chip (e.g. the round-2 RNNT backward rejection, the
aes_merge layout miscompile) now has a presubmit.

This validates *compilation* only: kernels still need on-chip A/B for
performance and a parity run for numerics (interpret mode covers the
semantics, tests/test_decode_kernels.py). The kernel shape gates check
``jax.default_backend()``, which is CPU here — ``ESPRESSO_AOT_TPU=1``
(ops/backend.py) makes them answer as if on TPU so the compiled program
contains the same kernels the chip would run.

Usage:  python -m espresso_tpu.tools.aot_check [beam beam_lm greedy train
        attention ...]          (default: all)
Prints one OK/FAIL line per program and exits nonzero on any FAIL.

The reference has no equivalent (its CUDA kernels compile at build time;
fairseq TPU support is runtime-only, fairseq/trainer.py:1534 merely logs
recompiles after the fact).
"""

from __future__ import annotations

import os
import sys
import traceback

# must happen before the first jax import: the axon sitecustomize leaves
# JAX_PLATFORMS=axon in the env, and with no TPU attached the axon client
# retries the (absent) device forever; "" lets JAX auto-pick (cpu) while
# the topology API below uses the local libtpu compile-only client
os.environ["JAX_PLATFORMS"] = ""
os.environ["ESPRESSO_AOT_TPU"] = "1"

TOPOLOGY = os.environ.get("ESPRESSO_AOT_TOPOLOGY", "v5e:2x2x1")

VOCAB, FEAT = 1024, 80
ENC = dict(
    encoder_layer_type="conformer",
    encoder_pos_type="relative",
    encoder_embed_dim=512,
    encoder_ffn_dim=2048,
    encoder_layers=16,
    encoder_heads=8,
    depthwise_conv_kernel_size=31,
    conv_norm_type="batch",
    conformer_norm_type="batch",
)


def _topology_sharding():
    import numpy as np
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    topo = topologies.get_topology_desc(platform="tpu", topology_name=TOPOLOGY)
    mesh = Mesh(np.array(topo.devices)[:1].reshape(1), ("aot",))
    return NamedSharding(mesh, PartitionSpec())


def _shape_tree(tree, sharding, cast_bf16=True):
    """Concrete/abstract pytree -> ShapeDtypeStructs on the topology."""
    import jax
    import jax.numpy as jnp

    def conv(x):
        dt = x.dtype
        if cast_bf16 and dt == jnp.float32:
            dt = jnp.bfloat16
        return jax.ShapeDtypeStruct(x.shape, dt, sharding=sharding)

    return jax.tree_util.tree_map(conv, tree)


def _flagship_model(dropout: float):
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    cfg = TransducerConfig(
        feat_dim=FEAT,
        vocab_size=VOCAB,
        encoder=SpeechTransformerConfig(
            feat_dim=FEAT, vocab_size=VOCAB, dropout=dropout, **ENC
        ),
        pred_embed_dim=512,
        pred_hidden_size=512,
        pred_layers=2,
        pred_dropout=dropout,
        joint_dim=512,
    )
    return TransducerModel(cfg)


def _decode_program(point: str):
    """Compile the flagship beam/greedy decode program (B=256, T=624)."""
    import jax
    import jax.numpy as jnp

    from espresso_tpu.data.dictionary import AsrDictionary

    s = _topology_sharding()
    model = _flagship_model(dropout=0.0)
    B, T = 256, 624
    frames = jax.ShapeDtypeStruct((B, T, FEAT), jnp.bfloat16, sharding=s)
    lengths = jax.ShapeDtypeStruct((B,), jnp.int32, sharding=s)
    var_shapes = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp.zeros((2, 8, FEAT), jnp.float32),
        jnp.full((2,), 8, jnp.int32),
        jnp.zeros((2, 3), jnp.int32),
    )
    variables = _shape_tree(var_shapes, s)
    dic = AsrDictionary(enable_bos=True)

    lm, lm_vars = None, None
    lm_weight = 0.0
    if point == "beam_lm":
        from espresso_tpu.models.lstm_lm import LSTMLanguageModel, LSTMLMConfig

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
        lm_shapes = jax.eval_shape(
            lm.init, jax.random.PRNGKey(1), jnp.zeros((2, 3), jnp.int32)
        )
        lm_vars = _shape_tree(lm_shapes, s)
        lm_weight = 0.47

    if point == "greedy":
        from espresso_tpu.decode.transducer_greedy import (
            TransducerGreedyDecoder,
        )

        dec = TransducerGreedyDecoder(model, dic, max_out_factor=0.35)
        Bg = 256  # bench_decode.py greedy point (B=256 since round 5)
        L_max = max(int(T * dec.max_out_factor), 8)
        fg = jax.ShapeDtypeStruct((Bg, T, FEAT), jnp.bfloat16, sharding=s)
        lg = jax.ShapeDtypeStruct((Bg,), jnp.int32, sharding=s)
        dec._decode_fn(T, L_max).lower(variables, fg, lg).compile()
        return

    from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder

    dec = TransducerBeamSearchDecoder(
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
    L_max = max(int(T * dec.max_out_factor), 8)
    jitted = dec._search_fn(T, L_max)
    jitted.lower(variables, lm_vars, frames, lengths).compile()


def check_beam():
    _decode_program("beam")


def check_beam_lm():
    _decode_program("beam_lm")


def check_greedy():
    _decode_program("greedy")


def check_train():
    """Compile the flagship train step (bench_train.py operating point):
    bf16 + fp32 masters, RNNT Pallas loss, grad clip, adam, overflow skip."""
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from espresso_tpu.config import EspressoConfig
    from espresso_tpu.criterions import build_criterion
    from espresso_tpu.train.trainer import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    s = _topology_sharding()
    model = _flagship_model(dropout=0.1)
    B, T, U = 16, 1024, 100

    cfg = EspressoConfig()
    cfg.common.dtype = "bfloat16"
    cfg.criterion.name = "transducer_loss"
    cfg.optimization.clip_norm = 2.0

    class _Dict:
        def pad(self):
            return 1

        def blank(self):
            return 0

    class _Task:
        dictionary = _Dict()

    criterion = build_criterion(cfg.criterion, _Task())
    optimizer, _ = build_optimizer(cfg)

    batch = {
        "src_frames": jnp.zeros((B, T, FEAT), jnp.float32),
        "src_lengths": jnp.full((B,), T, jnp.int32),
        "prev_output_tokens": jnp.zeros((B, U + 1), jnp.int32),
        "target": jnp.zeros((B, U), jnp.int32),
        "tgt_lengths": jnp.full((B,), U, jnp.int32),
        "weight": jnp.ones((B,), jnp.float32),
    }
    state_shapes = jax.eval_shape(
        lambda rng: create_train_state(model, optimizer, batch, rng),
        jax.random.PRNGKey(0),
    )
    state = _shape_tree(state_shapes, s, cast_bf16=False)
    stacked = _shape_tree(
        {k: v[None] for k, v in batch.items()}, s, cast_bf16=False
    )
    key = _shape_tree(
        jax.eval_shape(lambda: jax.random.PRNGKey(1)), s, cast_bf16=False
    )
    step = jax.jit(
        make_train_step(model, criterion, optimizer, cfg), donate_argnums=(0,)
    )
    step.lower(state, stacked, key).compile()


def check_attention():
    """Compile the fused rel-pos attention kernel at the decode shape."""
    import jax
    import jax.numpy as jnp

    from espresso_tpu.ops.attention_kernels import rel_attention_fused

    s = _topology_sharding()
    B, T, H, d = 256, 156, 8, 64
    D = H * d
    sh = lambda *dims: jax.ShapeDtypeStruct(dims, jnp.bfloat16, sharding=s)
    f = jax.jit(
        lambda qu, qv, k, v, p, kv: rel_attention_fused(
            qu, qv, k, v, p, kv, H, d ** -0.5
        )
    )
    f.lower(
        sh(B, T, D),
        sh(B, T, D),
        sh(B, T, D),
        sh(B, T, D),
        sh(2 * T - 1, D),
        jax.ShapeDtypeStruct((B, T), jnp.bool_, sharding=s),
    ).compile()


def check_encoder_fused():
    """Compile the full flagship encoder with the fused attention engaged
    (ESPRESSO_FUSED_ATTN=auto)."""
    import jax
    import jax.numpy as jnp

    os.environ["ESPRESSO_FUSED_ATTN"] = "auto"
    try:
        s = _topology_sharding()
        model = _flagship_model(dropout=0.0)
        B, T = 256, 624
        var_shapes = jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((2, 8, FEAT), jnp.float32),
            jnp.full((2,), 8, jnp.int32),
            jnp.zeros((2, 3), jnp.int32),
        )
        variables = _shape_tree(var_shapes, s)
        f = jax.jit(
            lambda v, fr, ln: model.apply(v, fr, ln, method="encode")
        )
        f.lower(
            variables,
            jax.ShapeDtypeStruct((B, T, FEAT), jnp.bfloat16, sharding=s),
            jax.ShapeDtypeStruct((B,), jnp.int32, sharding=s),
        ).compile()
    finally:
        os.environ.pop("ESPRESSO_FUSED_ATTN", None)


def check_train_fused():
    """Compile the flagship train step WITH the opt-in fused train-path
    attention kernel engaged (ESPRESSO_FUSED_ATTN_TRAIN=auto) — the Mosaic
    acceptance presubmit for ops/attention_kernels.rel_attention_train
    fwd+bwd inside the full jitted step."""
    os.environ["ESPRESSO_FUSED_ATTN_TRAIN"] = "auto"
    try:
        check_train()
    finally:
        os.environ.pop("ESPRESSO_FUSED_ATTN_TRAIN", None)


CHECKS = {
    "beam": check_beam,
    "beam_lm": check_beam_lm,
    "greedy": check_greedy,
    "train": check_train,
    "train_fused": check_train_fused,
    "attention": check_attention,
    "encoder_fused": check_encoder_fused,
}


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or list(CHECKS)
    failed = []
    for name in names:
        try:
            CHECKS[name]()
            print(f"AOT {name}: OK", flush=True)
        except Exception as e:
            traceback.print_exc()
            print(f"AOT {name}: FAIL ({type(e).__name__}: {e})", flush=True)
            failed.append(name)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
