"""Checkpoint-converter parity: plain-torch reimplementations of the
reference blocks (conv frontend / biLSTM / attention decoder step) must match
our modules after weight conversion. This validates every layout assumption
in cli/convert_espresso_checkpoint.py numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from espresso_tpu.cli.convert_espresso_checkpoint import (
    convert_conv_frontend,
    convert_encoder_lstm,
    convert_lstm_decoder,
)


def test_conv_frontend_parity():
    torch.manual_seed(0)
    convs = tnn.ModuleList(
        [
            tnn.Conv2d(1, 4, (3, 3), stride=(1, 1), padding=(1, 1)),
            tnn.Conv2d(4, 8, (3, 3), stride=(2, 2), padding=(1, 1)),
        ]
    )
    bns = tnn.ModuleList([tnn.BatchNorm2d(4), tnn.BatchNorm2d(8)])
    for bn in bns:
        bn.running_mean.uniform_(-0.5, 0.5)
        bn.running_var.uniform_(0.5, 1.5)
        bn.weight.data.uniform_(0.5, 1.5)
        bn.bias.data.uniform_(-0.5, 0.5)
    sd = {}
    for i, (c, b) in enumerate(zip(convs, bns)):
        sd[f"enc.convolutions.{i}.weight"] = c.weight
        sd[f"enc.convolutions.{i}.bias"] = c.bias
        sd[f"enc.batchnorms.{i}.weight"] = b.weight
        sd[f"enc.batchnorms.{i}.bias"] = b.bias
        sd[f"enc.batchnorms.{i}.running_mean"] = b.running_mean
        sd[f"enc.batchnorms.{i}.running_var"] = b.running_var

    B, T, F = 2, 12, 8
    x = torch.randn(B, T, F)
    # reference forward (speech_convolutions.py:78-103): NCHW conv+bn+relu,
    # then [B, C, T', F'] -> [B, T', C*F']
    h = x.view(B, T, 1, F).transpose(1, 2)
    with torch.no_grad():
        for c, b in zip(convs, bns):
            b.eval()
            h = tF.relu(b(c(h)))
    ref = h.transpose(1, 2).contiguous().view(B, h.size(2), -1).numpy()

    from espresso_tpu.modules.conv_frontend import ConvFrontend

    params, stats = convert_conv_frontend(sd, "enc")
    mod = ConvFrontend(
        out_channels=(4, 8),
        kernel_sizes=((3, 3), (3, 3)),
        strides=((1, 1), (2, 2)),
        norm_type="batch",
    )
    out, lengths = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy()),
        jnp.asarray([T, T]),
        train=False,
    )
    assert np.abs(np.asarray(out) - ref).max() < 1e-4


def test_bilstm_parity():
    torch.manual_seed(1)
    H, D, L = 6, 5, 2
    lstm = tnn.LSTM(D, H, num_layers=1, bidirectional=True, batch_first=False)
    sd = {f"enc.lstm.weight_ih_l0": lstm.weight_ih_l0,
          f"enc.lstm.weight_hh_l0": lstm.weight_hh_l0,
          f"enc.lstm.bias_ih_l0": lstm.bias_ih_l0,
          f"enc.lstm.bias_hh_l0": lstm.bias_hh_l0,
          f"enc.lstm.weight_ih_l0_reverse": lstm.weight_ih_l0_reverse,
          f"enc.lstm.weight_hh_l0_reverse": lstm.weight_hh_l0_reverse,
          f"enc.lstm.bias_ih_l0_reverse": lstm.bias_ih_l0_reverse,
          f"enc.lstm.bias_hh_l0_reverse": lstm.bias_hh_l0_reverse}
    B, T = 2, 7
    x = torch.randn(T, B, D)
    with torch.no_grad():
        ref, _ = lstm(x)
    ref = ref.transpose(0, 1).numpy()  # [B, T, 2H]

    from espresso_tpu.modules.lstm import LSTM as OurLSTM

    params = convert_encoder_lstm(sd, "enc.lstm", 1)
    mod = OurLSTM(hidden_size=H, num_layers=1, bidirectional=True, dropout=0.0)
    out, _ = mod.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 1).numpy()),
        jnp.asarray([T, T]),
    )
    assert np.abs(np.asarray(out) - ref).max() < 1e-4


def test_decoder_step_parity():
    """Reference decoder step (speech_lstm.py:838-887): input feeding,
    2 LSTMCells, Bahdanau attention on layer-0 hidden, [hidden, context]
    chained between layers, additional_fc + fc_out."""
    torch.manual_seed(2)
    V, E, H, C, A, OUT = 11, 4, 6, 5, 7, 8
    embed = tnn.Embedding(V, E, padding_idx=0)
    cell0 = tnn.LSTMCell(E + C, H)
    cell1 = tnn.LSTMCell(H + C, H)
    query_proj = tnn.Linear(H, A, bias=False)
    value_proj = tnn.Linear(C, A, bias=False)
    v = torch.randn(A)
    g = torch.randn(1).abs()
    b = torch.randn(A)
    additional_fc = tnn.Linear(H + C, OUT)
    fc_out = tnn.Linear(OUT, V)

    sd = {
        "dec.embed_tokens.weight": embed.weight,
        "dec.layers.0.weight_ih": cell0.weight_ih,
        "dec.layers.0.weight_hh": cell0.weight_hh,
        "dec.layers.0.bias_ih": cell0.bias_ih,
        "dec.layers.0.bias_hh": cell0.bias_hh,
        "dec.layers.1.weight_ih": cell1.weight_ih,
        "dec.layers.1.weight_hh": cell1.weight_hh,
        "dec.layers.1.bias_ih": cell1.bias_ih,
        "dec.layers.1.bias_hh": cell1.bias_hh,
        "dec.attention.query_proj.weight": query_proj.weight,
        "dec.attention.value_proj.weight": value_proj.weight,
        "dec.attention.v": v,
        "dec.attention.g": g,
        "dec.attention.b": b,
        "dec.additional_fc.weight": additional_fc.weight,
        "dec.additional_fc.bias": additional_fc.bias,
        "dec.fc_out.weight": fc_out.weight,
        "dec.fc_out.bias": fc_out.bias,
    }

    B, Tsrc = 2, 5
    enc_out = torch.randn(B, Tsrc, C)
    tokens = torch.tensor([3, 7])
    h = [torch.randn(B, H), torch.randn(B, H)]
    c = [torch.randn(B, H), torch.randn(B, H)]
    feed = torch.randn(B, C)

    with torch.no_grad():
        emb = embed(tokens)
        x = torch.cat([emb, feed], dim=1)
        h0, c0 = cell0(x, (h[0], c[0]))
        # attention on layer-0 hidden (value = enc_out, len-first)
        val = enc_out.transpose(0, 1)  # [T, B, C]
        pq = query_proj(h0).unsqueeze(0)
        key = value_proj(val)
        normed_v = g * v / torch.norm(v)
        scores = (normed_v * torch.tanh(pq + key + b)).sum(dim=2)  # [T, B]
        attn = tF.softmax(scores, dim=0)
        context = (attn.unsqueeze(2) * val).sum(dim=0)  # [B, C]
        x = torch.cat([h0, context], dim=1)
        h1, c1 = cell1(x, (h[1], c[1]))
        x = torch.cat([h1, context], dim=1)
        out = fc_out(additional_fc(x))
    ref_logits = out.numpy()

    from espresso_tpu.models.speech_lstm import SpeechLSTMConfig, SpeechLSTMModel
    from espresso_tpu.models.base import EncoderOut

    cfg = SpeechLSTMConfig(
        feat_dim=4,
        vocab_size=V,
        decoder_embed_dim=E,
        decoder_hidden_size=H,
        decoder_out_embed_dim=OUT,
        decoder_layers=2,
        attention_type="bahdanau",
        attention_dim=A,
        dropout=0.0,
        encoder_hidden_size=C // 2 if C % 2 == 0 else C,  # unused here
        encoder_bidirectional=False,
    )
    # decoder params only; drive decode_step directly
    dec_params = convert_lstm_decoder(sd, "dec")
    model = SpeechLSTMModel(cfg)
    # fake encoder output with C units: monkey via enc pytree
    enc = EncoderOut(
        encoder_out=jnp.asarray(enc_out.numpy()),
        encoder_padding_mask=jnp.ones((B, Tsrc), bool),
        src_lengths=jnp.asarray([Tsrc, Tsrc]),
    )
    carry = (
        jnp.asarray(torch.stack(h).numpy()),
        jnp.asarray(torch.stack(c).numpy()),
        jnp.asarray(feed.numpy()),
        jnp.zeros((B,), jnp.int32),
    )
    variables = {"params": {"decoder": dec_params}}
    logits, new_carry, attn_w = model.apply(
        variables,
        jnp.asarray(tokens.numpy()),
        carry,
        enc,
        method="decode_step",
    )
    assert np.abs(np.asarray(logits) - ref_logits).max() < 1e-4
