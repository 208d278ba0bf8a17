"""Data-parallel sharded batch decode over a device mesh (serving path):
results must match unsharded decode exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.decode.api import shard_for_decode
from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder
from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
from espresso_tpu.models.transducer import TransducerConfig, TransducerModel
from espresso_tpu.parallel.mesh import make_mesh

V = 9


def test_sharded_beam_decode_matches_unsharded():
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
    B = 8
    frames = jnp.asarray(rng.standard_normal((B, 16, 6)), jnp.float32)
    lengths = jnp.asarray([16, 12, 16, 10, 16, 14, 16, 16])
    prev = jnp.asarray(rng.integers(3, V, (B, 3)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    d = AsrDictionary(enable_bos=True)
    for i in range(V - 5):
        d.add_symbol(f"u{i}")
    batch = {"src_frames": frames, "src_lengths": lengths}
    dec = TransducerBeamSearchDecoder(
        model, d, beam_size=3, expansion_beta=1, expansion_gamma=4.0,
        max_num_expansions_per_step=2,
    )
    base = dec.decode(variables, batch)

    mesh = make_mesh(data_parallel_size=8, model_parallel_size=1)
    sharded_vars, sharded_batch = shard_for_decode(mesh, variables, batch)
    dec2 = TransducerBeamSearchDecoder(
        model, d, beam_size=3, expansion_beta=1, expansion_gamma=4.0,
        max_num_expansions_per_step=2,
    )
    with mesh:
        out = dec2.decode(sharded_vars, sharded_batch)
    for b in range(B):
        assert len(base[b]) == len(out[b])
        for h0, h1 in zip(base[b], out[b]):
            assert np.array_equal(h0["tokens"], h1["tokens"])
            assert abs(h0["score"] - h1["score"]) < 1e-4
