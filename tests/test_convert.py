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


def test_conformer_layer_parity():
    """Full conformer layer (macaron FFN + espnet rel-pos MHSA + conv module)
    reimplemented in plain torch (reference fairseq/modules/conformer_layer.py
    + espnet_multihead_attention.py semantics) must match our
    ConformerEncoderLayer after weight conversion."""
    torch.manual_seed(3)
    D, H, FFN, K = 16, 4, 32, 5
    dk = D // H
    B, T = 2, 9

    # --- torch modules with reference names ---
    ffn1_ln = tnn.LayerNorm(D); ffn1_w1 = tnn.Linear(D, FFN); ffn1_w2 = tnn.Linear(FFN, D)
    ffn2_ln = tnn.LayerNorm(D); ffn2_w1 = tnn.Linear(D, FFN); ffn2_w2 = tnn.Linear(FFN, D)
    attn_ln = tnn.LayerNorm(D)
    lq, lk, lv, lo = (tnn.Linear(D, D) for _ in range(4))
    lpos = tnn.Linear(D, D, bias=False)
    pos_u = torch.randn(H, dk) * 0.1
    pos_v = torch.randn(H, dk) * 0.1
    cm_ln = tnn.LayerNorm(D)
    pw1 = tnn.Conv1d(D, 2 * D, 1)
    dw = tnn.Conv1d(D, D, K, padding=(K - 1) // 2, groups=D)
    bn = tnn.BatchNorm1d(D)
    bn.running_mean.uniform_(-0.2, 0.2); bn.running_var.uniform_(0.8, 1.2)
    bn.weight.data.uniform_(0.8, 1.2); bn.bias.data.uniform_(-0.2, 0.2)
    pw2 = tnn.Conv1d(D, D, 1)
    final_ln = tnn.LayerNorm(D)

    sd = {}
    for name, lnm, w1, w2 in (("ffn1", ffn1_ln, ffn1_w1, ffn1_w2), ("ffn2", ffn2_ln, ffn2_w1, ffn2_w2)):
        sd[f"l.{name}.layer_norm.weight"] = lnm.weight; sd[f"l.{name}.layer_norm.bias"] = lnm.bias
        sd[f"l.{name}.w_1.weight"] = w1.weight; sd[f"l.{name}.w_1.bias"] = w1.bias
        sd[f"l.{name}.w_2.weight"] = w2.weight; sd[f"l.{name}.w_2.bias"] = w2.bias
    sd["l.self_attn_layer_norm.weight"] = attn_ln.weight; sd["l.self_attn_layer_norm.bias"] = attn_ln.bias
    for nm, m in (("linear_q", lq), ("linear_k", lk), ("linear_v", lv), ("linear_out", lo)):
        sd[f"l.self_attn.{nm}.weight"] = m.weight; sd[f"l.self_attn.{nm}.bias"] = m.bias
    sd["l.self_attn.linear_pos.weight"] = lpos.weight
    sd["l.self_attn.pos_bias_u"] = pos_u; sd["l.self_attn.pos_bias_v"] = pos_v
    sd["l.conv_module.layer_norm.weight"] = cm_ln.weight; sd["l.conv_module.layer_norm.bias"] = cm_ln.bias
    sd["l.conv_module.pointwise_conv1.weight"] = pw1.weight; sd["l.conv_module.pointwise_conv1.bias"] = pw1.bias
    sd["l.conv_module.depthwise_conv.weight"] = dw.weight; sd["l.conv_module.depthwise_conv.bias"] = dw.bias
    sd["l.conv_module.batch_norm.weight"] = bn.weight; sd["l.conv_module.batch_norm.bias"] = bn.bias
    sd["l.conv_module.batch_norm.running_mean"] = bn.running_mean
    sd["l.conv_module.batch_norm.running_var"] = bn.running_var
    sd["l.conv_module.pointwise_conv2.weight"] = pw2.weight; sd["l.conv_module.pointwise_conv2.bias"] = pw2.bias
    sd["l.final_layer_norm.weight"] = final_ln.weight; sd["l.final_layer_norm.bias"] = final_ln.bias

    # --- espnet relative positional table (torch, reference convention) ---
    import math
    pe_pos = torch.zeros(T, D)
    pe_neg = torch.zeros(T, D)
    position = torch.arange(0, T).unsqueeze(1).float()
    div = torch.exp(torch.arange(0, D, 2).float() * -(math.log(10000.0) / D))
    pe_pos[:, 0::2] = torch.sin(position * div)
    pe_pos[:, 1::2] = torch.cos(position * div)
    pe_neg[:, 0::2] = torch.sin(-1 * position * div)
    pe_neg[:, 1::2] = torch.cos(-1 * position * div)
    pe_pos = torch.flip(pe_pos, [0])  # T-1 .. 0
    pe_neg = pe_neg[1:]  # -1 .. -(T-1)
    pos_emb = torch.cat([pe_pos, pe_neg], dim=0)  # [2T-1, D]

    x = torch.randn(B, T, D)

    def rel_shift(m):
        zero_pad = torch.zeros((*m.size()[:3], 1))
        mp = torch.cat([zero_pad, m], dim=-1)
        mp = mp.view(*m.size()[:2], m.size(3) + 1, m.size(2))
        return mp[:, :, 1:].view_as(m)[:, :, :, : m.size(-1) // 2 + 1]

    with torch.no_grad():
        h = x + 0.5 * ffn2_w2(torch.nn.functional.silu(ffn1_w1(ffn1_ln(x)))) if False else x
        # macaron ffn1
        h = x + 0.5 * ffn1_w2(torch.nn.functional.silu(ffn1_w1(ffn1_ln(x))))
        # espnet rel-pos attention
        a_in = attn_ln(h)
        q = lq(a_in).view(B, T, H, dk)
        k = lk(a_in).view(B, T, H, dk).transpose(1, 2)
        v = lv(a_in).view(B, T, H, dk).transpose(1, 2)
        p = lpos(pos_emb).view(1, 2 * T - 1, H, dk).transpose(1, 2)
        q_u = (q + pos_u).transpose(1, 2)
        q_v = (q + pos_v).transpose(1, 2)
        ac = torch.matmul(q_u, k.transpose(-2, -1))
        bd = rel_shift(torch.matmul(q_v, p.transpose(-2, -1)))
        scores = (ac + bd) / math.sqrt(dk)
        attn = torch.softmax(scores, dim=-1)
        ao = torch.matmul(attn, v).transpose(1, 2).reshape(B, T, D)
        h = h + lo(ao)
        # conv module
        c = cm_ln(h).transpose(1, 2)
        c = torch.nn.functional.glu(pw1(c), dim=1)
        c = bn.eval()(dw(c))
        c = torch.nn.functional.silu(c)
        c = pw2(c).transpose(1, 2)
        h = h + c
        # macaron ffn2 + final LN
        h = h + 0.5 * ffn2_w2(torch.nn.functional.silu(ffn2_w1(ffn2_ln(h))))
        ref = final_ln(h).numpy()

    from espresso_tpu.cli.convert_espresso_checkpoint import convert_conformer_layer
    from espresso_tpu.modules.conformer import ConformerEncoderLayer
    from espresso_tpu.modules.positional import relative_sinusoidal_positions

    params, stats = convert_conformer_layer(sd, "l")
    layer = ConformerEncoderLayer(
        D, FFN, H, depthwise_kernel_size=K, use_relative_pos=True,
        conv_norm_type="batch", dropout=0.0,
    )
    rel = relative_sinusoidal_positions(T, D)
    # check our sinusoidal table matches espnet's
    assert np.abs(np.asarray(rel) - pos_emb.numpy()).max() < 1e-5
    out = layer.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy()),
        jnp.ones((B, T), bool),
        None,
        jnp.asarray(rel),
        train=False,
    )
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 1e-4, err


def _mk_torch_mha(D):
    lq, lk, lv, lo = (tnn.Linear(D, D) for _ in range(4))
    return lq, lk, lv, lo


def _mha_sd(sd, prefix, mods):
    lq, lk, lv, lo = mods
    for nm, m in (("q_proj", lq), ("k_proj", lk), ("v_proj", lv), ("out_proj", lo)):
        sd[f"{prefix}.{nm}.weight"] = m.weight
        sd[f"{prefix}.{nm}.bias"] = m.bias


def _torch_mha(mods, q_in, k_in, H, causal=False):
    import math

    lq, lk, lv, lo = mods
    B, Tq, D = q_in.shape
    Tk = k_in.shape[1]
    dk = D // H
    q = lq(q_in).view(B, Tq, H, dk).transpose(1, 2) / math.sqrt(dk)
    k = lk(k_in).view(B, Tk, H, dk).transpose(1, 2)
    v = lv(k_in).view(B, Tk, H, dk).transpose(1, 2)
    scores = torch.matmul(q, k.transpose(-2, -1))
    if causal:
        mask = torch.triu(torch.ones(Tq, Tk, dtype=torch.bool), 1)
        scores = scores.masked_fill(mask, float("-inf"))
    attn = torch.softmax(scores, dim=-1)
    out = torch.matmul(attn, v).transpose(1, 2).reshape(B, Tq, D)
    return lo(out)


def test_transformer_decoder_layer_parity():
    """fairseq pre-norm TransformerDecoderLayer reimplemented in torch must
    match our TransformerDecoderLayer after conversion."""
    torch.manual_seed(5)
    D, H, FFN = 16, 4, 32
    B, U, T = 2, 6, 9

    self_mods = _mk_torch_mha(D)
    cross_mods = _mk_torch_mha(D)
    ln_s, ln_c, ln_f = tnn.LayerNorm(D), tnn.LayerNorm(D), tnn.LayerNorm(D)
    fc1, fc2 = tnn.Linear(D, FFN), tnn.Linear(FFN, D)

    sd = {}
    _mha_sd(sd, "l.self_attn", self_mods)
    _mha_sd(sd, "l.encoder_attn", cross_mods)
    sd["l.self_attn_layer_norm.weight"] = ln_s.weight
    sd["l.self_attn_layer_norm.bias"] = ln_s.bias
    sd["l.encoder_attn_layer_norm.weight"] = ln_c.weight
    sd["l.encoder_attn_layer_norm.bias"] = ln_c.bias
    sd["l.final_layer_norm.weight"] = ln_f.weight
    sd["l.final_layer_norm.bias"] = ln_f.bias
    sd["l.fc1.weight"] = fc1.weight; sd["l.fc1.bias"] = fc1.bias
    sd["l.fc2.weight"] = fc2.weight; sd["l.fc2.bias"] = fc2.bias

    x = torch.randn(B, U, D)
    enc = torch.randn(B, T, D)
    with torch.no_grad():
        h = x + _torch_mha(self_mods, ln_s(x), ln_s(x), H, causal=True)
        h = h + _torch_mha(cross_mods, ln_c(h), enc, H)
        ref = (h + fc2(torch.relu(fc1(ln_f(h))))).numpy()

    from espresso_tpu.cli.convert_espresso_checkpoint import (
        convert_transformer_decoder_layer,
    )
    from espresso_tpu.models.speech_transformer import TransformerDecoderLayer
    from espresso_tpu.ops.masking import NEG_INF

    params = convert_transformer_decoder_layer(sd, "l")
    layer = TransformerDecoderLayer(D, FFN, H, dropout=0.0)
    causal = jnp.where(jnp.tril(jnp.ones((U, U), bool)), 0.0, NEG_INF)
    out, _, _ = layer.apply(
        {"params": params},
        jnp.asarray(x.numpy()),
        jnp.asarray(enc.numpy()),
        jnp.ones((B, T), bool),
        causal,
    )
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 1e-4, err


def _espnet_pos_emb(T, D):
    """espnet relative sinusoidal table [2T-1, D] (positions T-1 .. -(T-1))."""
    import math

    pe_pos = torch.zeros(T, D)
    pe_neg = torch.zeros(T, D)
    position = torch.arange(0, T).unsqueeze(1).float()
    div = torch.exp(torch.arange(0, D, 2).float() * -(math.log(10000.0) / D))
    pe_pos[:, 0::2] = torch.sin(position * div)
    pe_pos[:, 1::2] = torch.cos(position * div)
    pe_neg[:, 0::2] = torch.sin(-1 * position * div)
    pe_neg[:, 1::2] = torch.cos(-1 * position * div)
    return torch.cat([torch.flip(pe_pos, [0]), pe_neg[1:]], dim=0)


def _rel_shift(m):
    zero_pad = torch.zeros((*m.size()[:3], 1))
    mp = torch.cat([zero_pad, m], dim=-1)
    mp = mp.view(*m.size()[:2], m.size(3) + 1, m.size(2))
    return mp[:, :, 1:].view_as(m)[:, :, :, : m.size(-1) // 2 + 1]


class _TorchConformerLayer:
    """Plain-torch reference conformer layer (fairseq conformer_layer.py +
    espnet_multihead_attention.py semantics), eval mode, no padding."""

    def __init__(self, D, H, FFN, K):
        self.D, self.H, self.dk = D, H, D // H
        self.ffn1_ln, self.ffn1_w1, self.ffn1_w2 = (
            tnn.LayerNorm(D), tnn.Linear(D, FFN), tnn.Linear(FFN, D))
        self.ffn2_ln, self.ffn2_w1, self.ffn2_w2 = (
            tnn.LayerNorm(D), tnn.Linear(D, FFN), tnn.Linear(FFN, D))
        self.attn_ln = tnn.LayerNorm(D)
        self.lq, self.lk, self.lv, self.lo = (tnn.Linear(D, D) for _ in range(4))
        self.lpos = tnn.Linear(D, D, bias=False)
        self.pos_u = torch.randn(H, self.dk) * 0.1
        self.pos_v = torch.randn(H, self.dk) * 0.1
        self.cm_ln = tnn.LayerNorm(D)
        self.pw1 = tnn.Conv1d(D, 2 * D, 1)
        self.dw = tnn.Conv1d(D, D, K, padding=(K - 1) // 2, groups=D)
        self.bn = tnn.BatchNorm1d(D)
        self.bn.running_mean.uniform_(-0.2, 0.2)
        self.bn.running_var.uniform_(0.8, 1.2)
        self.bn.weight.data.uniform_(0.8, 1.2)
        self.bn.bias.data.uniform_(-0.2, 0.2)
        self.bn.eval()
        self.pw2 = tnn.Conv1d(D, D, 1)
        self.final_ln = tnn.LayerNorm(D)

    def state_into(self, sd, p):
        for name, lnm, w1, w2 in (
            ("ffn1", self.ffn1_ln, self.ffn1_w1, self.ffn1_w2),
            ("ffn2", self.ffn2_ln, self.ffn2_w1, self.ffn2_w2),
        ):
            sd[f"{p}.{name}.layer_norm.weight"] = lnm.weight
            sd[f"{p}.{name}.layer_norm.bias"] = lnm.bias
            sd[f"{p}.{name}.w_1.weight"] = w1.weight
            sd[f"{p}.{name}.w_1.bias"] = w1.bias
            sd[f"{p}.{name}.w_2.weight"] = w2.weight
            sd[f"{p}.{name}.w_2.bias"] = w2.bias
        sd[f"{p}.self_attn_layer_norm.weight"] = self.attn_ln.weight
        sd[f"{p}.self_attn_layer_norm.bias"] = self.attn_ln.bias
        for nm, m in (("linear_q", self.lq), ("linear_k", self.lk),
                      ("linear_v", self.lv), ("linear_out", self.lo)):
            sd[f"{p}.self_attn.{nm}.weight"] = m.weight
            sd[f"{p}.self_attn.{nm}.bias"] = m.bias
        sd[f"{p}.self_attn.linear_pos.weight"] = self.lpos.weight
        sd[f"{p}.self_attn.pos_bias_u"] = self.pos_u
        sd[f"{p}.self_attn.pos_bias_v"] = self.pos_v
        sd[f"{p}.conv_module.layer_norm.weight"] = self.cm_ln.weight
        sd[f"{p}.conv_module.layer_norm.bias"] = self.cm_ln.bias
        sd[f"{p}.conv_module.pointwise_conv1.weight"] = self.pw1.weight
        sd[f"{p}.conv_module.pointwise_conv1.bias"] = self.pw1.bias
        sd[f"{p}.conv_module.depthwise_conv.weight"] = self.dw.weight
        sd[f"{p}.conv_module.depthwise_conv.bias"] = self.dw.bias
        sd[f"{p}.conv_module.batch_norm.weight"] = self.bn.weight
        sd[f"{p}.conv_module.batch_norm.bias"] = self.bn.bias
        sd[f"{p}.conv_module.batch_norm.running_mean"] = self.bn.running_mean
        sd[f"{p}.conv_module.batch_norm.running_var"] = self.bn.running_var
        sd[f"{p}.conv_module.pointwise_conv2.weight"] = self.pw2.weight
        sd[f"{p}.conv_module.pointwise_conv2.bias"] = self.pw2.bias
        sd[f"{p}.final_layer_norm.weight"] = self.final_ln.weight
        sd[f"{p}.final_layer_norm.bias"] = self.final_ln.bias

    def forward(self, x, pos_emb):
        import math

        B, T, D = x.shape
        H, dk = self.H, self.dk
        h = x + 0.5 * self.ffn1_w2(tF.silu(self.ffn1_w1(self.ffn1_ln(x))))
        a_in = self.attn_ln(h)
        q = self.lq(a_in).view(B, T, H, dk)
        k = self.lk(a_in).view(B, T, H, dk).transpose(1, 2)
        v = self.lv(a_in).view(B, T, H, dk).transpose(1, 2)
        p = self.lpos(pos_emb).view(1, 2 * T - 1, H, dk).transpose(1, 2)
        ac = torch.matmul((q + self.pos_u).transpose(1, 2), k.transpose(-2, -1))
        bd = _rel_shift(
            torch.matmul((q + self.pos_v).transpose(1, 2), p.transpose(-2, -1))
        )
        attn = torch.softmax((ac + bd) / math.sqrt(dk), dim=-1)
        ao = torch.matmul(attn, v).transpose(1, 2).reshape(B, T, D)
        h = h + self.lo(ao)
        c = self.cm_ln(h).transpose(1, 2)
        c = tF.glu(self.pw1(c), dim=1)
        c = tF.silu(self.bn(self.dw(c)))
        c = self.pw2(c).transpose(1, 2)
        h = h + c
        h = h + 0.5 * self.ffn2_w2(tF.silu(self.ffn2_w1(self.ffn2_ln(h))))
        return self.final_ln(h)


def build_flagship_transducer(seed=7):
    """Fabricate a reference conformer-transducer (torch modules + espresso
    state_dict) and its converted espresso_tpu twin. Shared by the
    whole-model logits parity test and the hypothesis-level decode parity
    tests (VERDICT r2 item 5)."""
    from types import SimpleNamespace

    torch.manual_seed(seed)
    D, H, FFN, K, V, F, E, P, J = 16, 4, 32, 5, 11, 8, 8, 12, 10
    LAYERS = 2

    # --- torch reference modules ---
    conv = tnn.Conv2d(1, 4, (3, 3), stride=(2, 2), padding=(1, 1))
    bn0 = tnn.BatchNorm2d(4)
    bn0.running_mean.uniform_(-0.3, 0.3)
    bn0.running_var.uniform_(0.7, 1.3)
    bn0.weight.data.uniform_(0.7, 1.3)
    bn0.bias.data.uniform_(-0.3, 0.3)
    bn0.eval()
    fc0 = tnn.Linear(4 * ((F + 1) // 2), D)
    layers = [_TorchConformerLayer(D, H, FFN, K) for _ in range(LAYERS)]
    enc_ln = tnn.LayerNorm(D)
    embed = tnn.Embedding(V, E)
    cell0 = tnn.LSTMCell(E, P)
    cell1 = tnn.LSTMCell(P, P)
    proj_enc, proj_dec = tnn.Linear(D, J), tnn.Linear(P, J)
    ln_enc, ln_dec = tnn.LayerNorm(J), tnn.LayerNorm(J)
    wn_g = torch.randn(V, 1).abs() + 0.3
    wn_v = torch.randn(V, J) * 0.2
    wn_b = torch.randn(V) * 0.1

    sd = {
        "encoder.pre_encoder.convolutions.0.weight": conv.weight,
        "encoder.pre_encoder.convolutions.0.bias": conv.bias,
        "encoder.pre_encoder.batchnorms.0.weight": bn0.weight,
        "encoder.pre_encoder.batchnorms.0.bias": bn0.bias,
        "encoder.pre_encoder.batchnorms.0.running_mean": bn0.running_mean,
        "encoder.pre_encoder.batchnorms.0.running_var": bn0.running_var,
        "encoder.fc0.weight": fc0.weight,
        "encoder.fc0.bias": fc0.bias,
        "encoder.layer_norm.weight": enc_ln.weight,
        "encoder.layer_norm.bias": enc_ln.bias,
        "decoder.embed_tokens.weight": embed.weight,
        "proj_encoder.weight": proj_enc.weight,
        "proj_encoder.bias": proj_enc.bias,
        "laynorm_proj_encoder.weight": ln_enc.weight,
        "laynorm_proj_encoder.bias": ln_enc.bias,
        "proj_decoder.weight": proj_dec.weight,
        "proj_decoder.bias": proj_dec.bias,
        "laynorm_proj_decoder.weight": ln_dec.weight,
        "laynorm_proj_decoder.bias": ln_dec.bias,
        "fc_out.weight_g": wn_g,
        "fc_out.weight_v": wn_v,
        "fc_out.bias": wn_b,
    }
    for i, (cell, e_in) in enumerate(((cell0, E), (cell1, P))):
        sd[f"decoder.layers.{i}.weight_ih"] = cell.weight_ih
        sd[f"decoder.layers.{i}.weight_hh"] = cell.weight_hh
        sd[f"decoder.layers.{i}.bias_ih"] = cell.bias_ih
        sd[f"decoder.layers.{i}.bias_hh"] = cell.bias_hh
    for i, layer in enumerate(layers):
        layer.state_into(sd, f"encoder.layers.{i}")

    from espresso_tpu.cli.convert_espresso_checkpoint import (
        convert_speech_transformer_transducer,
    )
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    params, batch_stats = convert_speech_transformer_transducer(sd)
    cfg = TransducerConfig(
        feat_dim=F, vocab_size=V,
        encoder=SpeechTransformerConfig(
            feat_dim=F, vocab_size=V,
            conv_channels=(4,), conv_kernel_sizes=((3, 3),),
            conv_strides=((2, 2),), conv_norm_type="batch",
            encoder_layer_type="conformer", encoder_pos_type="relative",
            encoder_embed_dim=D, encoder_ffn_dim=FFN, encoder_layers=LAYERS,
            encoder_heads=H, depthwise_conv_kernel_size=K,
            conformer_norm_type="batch", dropout=0.0,
        ),
        pred_embed_dim=E, pred_hidden_size=P, pred_layers=LAYERS,
        joint_dim=J, pred_dropout=0.0,
    )
    model = TransducerModel(cfg)
    w_eff = wn_g * wn_v / torch.norm(wn_v, dim=1, keepdim=True)

    def torch_encode(x):
        """Reference encoder forward: conv frontend -> fc0 -> conformer
        stack -> final LN. Returns [B, Tc, D]."""
        with torch.no_grad():
            B_, T_ = x.shape[0], x.shape[1]
            h = tF.relu(bn0(conv(x.view(B_, T_, 1, F).transpose(1, 2))))
            Tc = h.size(2)
            h = h.transpose(1, 2).contiguous().view(B_, Tc, -1)
            h = fc0(h)  # embed_scale = 1.0 (fc0 present)
            pos_emb = _espnet_pos_emb(Tc, D)
            for layer in layers:
                h = layer.forward(h, pos_emb)
            return enc_ln(h)

    return SimpleNamespace(
        dims=dict(D=D, H=H, FFN=FFN, K=K, V=V, F=F, E=E, P=P, J=J,
                  LAYERS=LAYERS),
        conv=conv, bn0=bn0, fc0=fc0, layers=layers, enc_ln=enc_ln,
        embed=embed, cell0=cell0, cell1=cell1, proj_enc=proj_enc,
        proj_dec=proj_dec, ln_enc=ln_enc, ln_dec=ln_dec,
        wn_g=wn_g, wn_v=wn_v, wn_b=wn_b, w_eff=w_eff, sd=sd,
        params=params, batch_stats=batch_stats, cfg=cfg, model=model,
        torch_encode=torch_encode,
    )


def test_conformer_transducer_full_logits_parity():
    """VERDICT item 7: whole-model logits parity on the flagship path.
    Fabricate a reference conformer-transducer state_dict, run a plain-torch
    reimplementation of the FULL reference forward (conv frontend -> fc0 ->
    conformer stack -> final LN | embed -> LSTM prediction net | joint
    relu(LN(proj_enc)+LN(proj_dec)) -> weight-norm fc_out; reference
    speech_transformer_transducer_base.py:221-299,
    speech_transformer_encoder.py:298-400 with embed_scale=1.0 because fc0
    is present :81-86, speech_lstm.py:766-887 LM mode), and assert the
    converted model's B x T x U x V lattice matches elementwise."""
    fx = build_flagship_transducer(seed=7)
    d = fx.dims
    V, F, E, P, J = d["V"], d["F"], d["E"], d["P"], d["J"]
    B, T, U = 2, 13, 5

    x = torch.randn(B, T, F)
    prev = torch.randint(0, V, (B, U))

    with torch.no_grad():
        enc_out = fx.torch_encode(x)  # [B, Tc, D]
        # prediction net (LM mode: input chains through the cells)
        e = fx.embed(prev)  # [B, U, E]
        h0 = c0 = torch.zeros(B, P)
        h1 = c1 = torch.zeros(B, P)
        feats = []
        for j in range(U):
            h0, c0 = fx.cell0(e[:, j], (h0, c0))
            h1, c1 = fx.cell1(h0, (h1, c1))
            feats.append(h1)
        dec_out = torch.stack(feats, dim=1)  # [B, U, P]
        # joint + weight-norm output head
        ej = fx.ln_enc(fx.proj_enc(enc_out)).unsqueeze(2)  # [B, Tc, 1, J]
        dj = fx.ln_dec(fx.proj_dec(dec_out)).unsqueeze(1)  # [B, 1, U, J]
        ref = (
            tF.relu(ej + dj) @ fx.w_eff.t() + fx.wn_b
        ).numpy()  # [B, Tc, U, V]

    lattice, enc = fx.model.apply(
        {"params": fx.params, "batch_stats": fx.batch_stats},
        jnp.asarray(x.numpy()),
        jnp.asarray([T, T]),
        jnp.asarray(prev.numpy().astype(np.int32)),
        train=False,
    )
    got = np.asarray(lattice)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = np.abs(got - ref).max()
    assert err < 1e-3, err


def _rand_sd_like(shapes):
    torch.manual_seed(11)
    sd = {k: torch.randn(*v) * 0.05 for k, v in shapes.items()}
    for k in sd:
        if "running_var" in k:
            sd[k] = sd[k].abs() + 0.5
    return sd


def test_speech_transformer_full_structure():
    """Converted full speech_transformer tree must exactly match the tree
    our model initializes (catches any layout drift)."""
    from espresso_tpu.cli.convert_espresso_checkpoint import (
        convert_speech_transformer,
    )
    from espresso_tpu.models.speech_transformer import (
        SpeechTransformerConfig,
        SpeechTransformerModel,
    )

    D, FFN, H, V, F = 16, 32, 4, 11, 8
    shapes = {
        "encoder.pre_encoder.convolutions.0.weight": (4, 1, 3, 3),
        "encoder.pre_encoder.convolutions.0.bias": (4,),
        "encoder.pre_encoder.batchnorms.0.weight": (4,),
        "encoder.pre_encoder.batchnorms.0.bias": (4,),
        "encoder.pre_encoder.batchnorms.0.running_mean": (4,),
        "encoder.pre_encoder.batchnorms.0.running_var": (4,),
        "encoder.fc0.weight": (D, 4 * ((F + 1) // 2)),
        "encoder.fc0.bias": (D,),
        "encoder.layer_norm.weight": (D,),
        "encoder.layer_norm.bias": (D,),
        "decoder.embed_tokens.weight": (V, D),
        "decoder.layer_norm.weight": (D,),
        "decoder.layer_norm.bias": (D,),
    }
    for i in range(2):
        p = f"encoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            shapes[f"{p}.self_attn.{nm}.weight"] = (D, D)
            shapes[f"{p}.self_attn.{nm}.bias"] = (D,)
        shapes[f"{p}.self_attn_layer_norm.weight"] = (D,)
        shapes[f"{p}.self_attn_layer_norm.bias"] = (D,)
        shapes[f"{p}.fc1.weight"] = (FFN, D)
        shapes[f"{p}.fc1.bias"] = (FFN,)
        shapes[f"{p}.fc2.weight"] = (D, FFN)
        shapes[f"{p}.fc2.bias"] = (D,)
        shapes[f"{p}.final_layer_norm.weight"] = (D,)
        shapes[f"{p}.final_layer_norm.bias"] = (D,)
    p = "decoder.layers.0"
    for att in ("self_attn", "encoder_attn"):
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            shapes[f"{p}.{att}.{nm}.weight"] = (D, D)
            shapes[f"{p}.{att}.{nm}.bias"] = (D,)
    for ln in ("self_attn_layer_norm", "encoder_attn_layer_norm", "final_layer_norm"):
        shapes[f"{p}.{ln}.weight"] = (D,)
        shapes[f"{p}.{ln}.bias"] = (D,)
    shapes[f"{p}.fc1.weight"] = (FFN, D)
    shapes[f"{p}.fc1.bias"] = (FFN,)
    shapes[f"{p}.fc2.weight"] = (D, FFN)
    shapes[f"{p}.fc2.bias"] = (D,)
    sd = _rand_sd_like(shapes)
    # shared input/output embedding (no separate output_projection entry)
    sd["decoder.output_projection.weight"] = sd["decoder.embed_tokens.weight"]

    params, batch_stats = convert_speech_transformer(sd)

    cfg = SpeechTransformerConfig(
        feat_dim=F, vocab_size=V,
        conv_channels=(4,), conv_kernel_sizes=((3, 3),), conv_strides=((2, 2),),
        encoder_embed_dim=D, encoder_ffn_dim=FFN, encoder_layers=2,
        encoder_heads=H, decoder_embed_dim=D, decoder_ffn_dim=FFN,
        decoder_layers=1, decoder_heads=H, dropout=0.0,
    )
    model = SpeechTransformerModel(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((2, 13, F)).astype(np.float32))
    lengths = jnp.asarray([13, 9])
    prev = jnp.asarray(rng.integers(0, V, (2, 5)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)

    ref_tree = jax.tree_util.tree_structure(variables["params"])
    got_tree = jax.tree_util.tree_structure(params)
    assert ref_tree == got_tree, f"\nref={ref_tree}\ngot={got_tree}"
    # converted params must actually run
    logits, _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, frames, lengths, prev
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_transducer_full_structure():
    from espresso_tpu.cli.convert_espresso_checkpoint import (
        convert_speech_transformer_transducer,
    )
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    D, FFN, H, V, F, P = 16, 32, 4, 11, 8, 12
    shapes = {
        "encoder.pre_encoder.convolutions.0.weight": (4, 1, 3, 3),
        "encoder.pre_encoder.convolutions.0.bias": (4,),
        "encoder.fc0.weight": (D, 4 * ((F + 1) // 2)),
        "encoder.fc0.bias": (D,),
        "encoder.layer_norm.weight": (D,),
        "encoder.layer_norm.bias": (D,),
        "decoder.embed_tokens.weight": (V, 8),
        # 1-layer LSTMCell prediction net, hidden P
        "decoder.layers.0.weight_ih": (4 * P, 8),
        "decoder.layers.0.weight_hh": (4 * P, P),
        "decoder.layers.0.bias_ih": (4 * P,),
        "decoder.layers.0.bias_hh": (4 * P,),
        "proj_encoder.weight": (10, D),
        "proj_encoder.bias": (10,),
        "laynorm_proj_encoder.weight": (10,),
        "laynorm_proj_encoder.bias": (10,),
        "proj_decoder.weight": (10, P),
        "proj_decoder.bias": (10,),
        "laynorm_proj_decoder.weight": (10,),
        "laynorm_proj_decoder.bias": (10,),
        "fc_out.weight_g": (V, 1),
        "fc_out.weight_v": (V, 10),
        "fc_out.bias": (V,),
    }
    p = "encoder.layers.0"
    for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
        shapes[f"{p}.self_attn.{nm}.weight"] = (D, D)
        shapes[f"{p}.self_attn.{nm}.bias"] = (D,)
    shapes[f"{p}.self_attn_layer_norm.weight"] = (D,)
    shapes[f"{p}.self_attn_layer_norm.bias"] = (D,)
    shapes[f"{p}.fc1.weight"] = (FFN, D)
    shapes[f"{p}.fc1.bias"] = (FFN,)
    shapes[f"{p}.fc2.weight"] = (D, FFN)
    shapes[f"{p}.fc2.bias"] = (D,)
    shapes[f"{p}.final_layer_norm.weight"] = (D,)
    shapes[f"{p}.final_layer_norm.bias"] = (D,)
    sd = _rand_sd_like(shapes)

    params, batch_stats = convert_speech_transformer_transducer(sd)

    cfg = TransducerConfig(
        feat_dim=F, vocab_size=V,
        encoder=SpeechTransformerConfig(
            feat_dim=F, vocab_size=V,
            conv_channels=(4,), conv_kernel_sizes=((3, 3),),
            conv_strides=((2, 2),), conv_norm_type="none",
            encoder_embed_dim=D, encoder_ffn_dim=FFN, encoder_layers=1,
            encoder_heads=H, dropout=0.0,
        ),
        pred_embed_dim=8, pred_hidden_size=P, pred_layers=1,
        joint_dim=10, pred_dropout=0.0,
    )
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((2, 13, F)).astype(np.float32))
    lengths = jnp.asarray([13, 9])
    prev = jnp.asarray(rng.integers(0, V, (2, 5)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)

    ref_tree = jax.tree_util.tree_structure(variables["params"])
    got_tree = jax.tree_util.tree_structure(params)
    assert ref_tree == got_tree, f"\nref={ref_tree}\ngot={got_tree}"
    (lattice, _), _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        frames, lengths, prev, mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(lattice)).all()
    # weight-norm: effective fc_out kernel has the g-prescribed row norms
    g = sd["fc_out.weight_g"].numpy()
    kern = params["joint"]["fc_out"]["kernel"]
    assert np.allclose(np.linalg.norm(kern, axis=0), np.abs(g[:, 0]), atol=1e-5)


def test_conformer_transducer_decode_hypothesis_parity():
    """VERDICT r2 item 5: decode-level conversion parity. Fabricate a
    reference conformer-transducer checkpoint, convert it, and decode the
    same batch two ways:

      greedy — our TransducerGreedyDecoder vs a torch loop implementing the
               reference's greedy semantics (transducer_greedy_decoder.py
               :143-252: argmax per expansion, up to n_exp labels per
               frame, pred net advances only on label emissions);
      beam   — our AES beam search vs the brute-force oracle implementing
               the reference beam semantics (tests/test_transducer_beam_
               oracle.oracle_aes over the SAME torch forward).

    Token sequences must be identical, so the ≤0.1 WER-delta claim rests on
    decode behavior, not just logits parity
    (tests above check the lattice elementwise)."""
    torch.manual_seed(7)
    D, H, FFN, K, V, F, E, P, J = 16, 4, 32, 5, 11, 8, 8, 12, 16
    B, T, LAYERS = 3, 12, 1
    blank, n_exp = 0, 2

    conv = tnn.Conv2d(1, 4, (3, 3), stride=(2, 2), padding=(1, 1))
    bn0 = tnn.BatchNorm2d(4)
    bn0.running_mean.uniform_(-0.3, 0.3)
    bn0.running_var.uniform_(0.7, 1.3)
    bn0.weight.data.uniform_(0.7, 1.3)
    bn0.bias.data.uniform_(-0.3, 0.3)
    bn0.eval()
    fc0 = tnn.Linear(4 * ((F + 1) // 2), D)
    layers = [_TorchConformerLayer(D, H, FFN, K) for _ in range(LAYERS)]
    enc_ln = tnn.LayerNorm(D)
    embed = tnn.Embedding(V, E)
    cell0 = tnn.LSTMCell(E, P)
    cell1 = tnn.LSTMCell(P, P)
    proj_enc, proj_dec = tnn.Linear(D, J), tnn.Linear(P, J)
    ln_enc, ln_dec = tnn.LayerNorm(J), tnn.LayerNorm(J)
    wn_g = torch.randn(V, 1).abs() + 0.3
    wn_v = torch.randn(V, J) * 0.2
    wn_b = torch.randn(V) * 0.1

    sd = {
        "encoder.pre_encoder.convolutions.0.weight": conv.weight,
        "encoder.pre_encoder.convolutions.0.bias": conv.bias,
        "encoder.pre_encoder.batchnorms.0.weight": bn0.weight,
        "encoder.pre_encoder.batchnorms.0.bias": bn0.bias,
        "encoder.pre_encoder.batchnorms.0.running_mean": bn0.running_mean,
        "encoder.pre_encoder.batchnorms.0.running_var": bn0.running_var,
        "encoder.fc0.weight": fc0.weight,
        "encoder.fc0.bias": fc0.bias,
        "encoder.layer_norm.weight": enc_ln.weight,
        "encoder.layer_norm.bias": enc_ln.bias,
        "decoder.embed_tokens.weight": embed.weight,
        "proj_encoder.weight": proj_enc.weight,
        "proj_encoder.bias": proj_enc.bias,
        "laynorm_proj_encoder.weight": ln_enc.weight,
        "laynorm_proj_encoder.bias": ln_enc.bias,
        "proj_decoder.weight": proj_dec.weight,
        "proj_decoder.bias": proj_dec.bias,
        "laynorm_proj_decoder.weight": ln_dec.weight,
        "laynorm_proj_decoder.bias": ln_dec.bias,
        "fc_out.weight_g": wn_g,
        "fc_out.weight_v": wn_v,
        "fc_out.bias": wn_b,
    }
    for i, cell in enumerate((cell0, cell1)):
        sd[f"decoder.layers.{i}.weight_ih"] = cell.weight_ih
        sd[f"decoder.layers.{i}.weight_hh"] = cell.weight_hh
        sd[f"decoder.layers.{i}.bias_ih"] = cell.bias_ih
        sd[f"decoder.layers.{i}.bias_hh"] = cell.bias_hh
    for i, layer in enumerate(layers):
        layer.state_into(sd, f"encoder.layers.{i}")

    # full lengths for every row: the torch twin runs the conformer without
    # an attention padding mask (same constraint as the logits-parity test
    # above); varying-length decode is covered by the oracle tests
    x = torch.randn(B, T, F) * 1.5
    lengths = np.array([T, T, T])

    # ---- torch reference forward pieces ----
    with torch.no_grad():
        h = tF.relu(bn0(conv(x.view(B, T, 1, F).transpose(1, 2))))
        Tc = h.size(2)
        h = h.transpose(1, 2).contiguous().view(B, Tc, -1)
        h = fc0(h)
        pos_emb = _espnet_pos_emb(Tc, D)
        for layer in layers:
            h = layer.forward(h, pos_emb)
        enc_out = enc_ln(h).numpy()  # [B, Tc, D]
        w_eff = (wn_g * wn_v / torch.norm(wn_v, dim=1, keepdim=True)).numpy()
        wn_b_np = wn_b.numpy()
    # subsampled lengths (stride-2 conv, ceil)
    enc_lens = (lengths + 1) // 2

    class TorchTwin:
        """np_pred_step/np_logits shim over the torch modules for the
        oracle; state is the (h0, c0, h1, c1) LSTM tuple."""

        def np_pred_step(self, token, state):
            h0, c0, h1, c1 = state
            with torch.no_grad():
                e = embed(torch.tensor([token]))
                h0t, c0t = cell0(
                    e, (torch.tensor(h0[None]), torch.tensor(c0[None]))
                )
                h1t, c1t = cell1(
                    h0t, (torch.tensor(h1[None]), torch.tensor(c1[None]))
                )
            return h1t[0].numpy(), (
                h0t[0].numpy(), c0t[0].numpy(), h1t[0].numpy(), c1t[0].numpy(),
            )

        def np_logits(self, enc_t, feat):
            with torch.no_grad():
                ej = ln_enc(proj_enc(torch.tensor(enc_t)))
                dj = ln_dec(proj_dec(torch.tensor(feat)))
                pre = tF.relu(ej + dj).numpy()
            return pre @ w_eff.T + wn_b_np

    twin = TorchTwin()
    twin.V = V  # class bodies can't close over the enclosing scope
    zeros_state = tuple(np.zeros(P, np.float32) for _ in range(4))

    def ref_greedy(b):
        """Reference greedy loop (transducer_greedy_decoder.py:143-252),
        single utterance."""
        feat, state = twin.np_pred_step(blank, zeros_state)
        toks = []
        for t in range(int(enc_lens[b])):
            for _ in range(n_exp):
                lp = twin.np_logits(enc_out[b, t], feat)
                k = int(np.argmax(lp))
                if k == blank:
                    break
                toks.append(k)
                feat, state = twin.np_pred_step(k, state)
        return toks

    from espresso_tpu.cli.convert_espresso_checkpoint import (
        convert_speech_transformer_transducer,
    )
    from espresso_tpu.data.dictionary import AsrDictionary
    from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder
    from espresso_tpu.decode.transducer_greedy import TransducerGreedyDecoder
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    params, batch_stats = convert_speech_transformer_transducer(sd)
    cfg = TransducerConfig(
        feat_dim=F, vocab_size=V,
        encoder=SpeechTransformerConfig(
            feat_dim=F, vocab_size=V,
            conv_channels=(4,), conv_kernel_sizes=((3, 3),),
            conv_strides=((2, 2),), conv_norm_type="batch",
            encoder_layer_type="conformer", encoder_pos_type="relative",
            encoder_embed_dim=D, encoder_ffn_dim=FFN, encoder_layers=LAYERS,
            encoder_heads=H, depthwise_conv_kernel_size=K,
            conformer_norm_type="batch", dropout=0.0,
        ),
        pred_embed_dim=E, pred_hidden_size=P, pred_layers=2,
        joint_dim=J, pred_dropout=0.0,
    )
    model = TransducerModel(cfg)
    variables = {"params": params, "batch_stats": batch_stats}
    d = AsrDictionary(enable_bos=True)
    for i in range(V - 4):
        d.add_symbol(f"u{i}")
    batch = {
        "src_frames": jnp.asarray(x.numpy()),
        "src_lengths": jnp.asarray(lengths.astype(np.int32)),
    }

    # ---- greedy parity ----
    greedy = TransducerGreedyDecoder(
        model, d, max_num_expansions_per_step=n_exp, max_out_factor=1.0
    )
    got_g = greedy.decode(variables, batch)
    for b in range(B):
        assert list(got_g[b][0]["tokens"]) == ref_greedy(b), b

    # ---- beam parity (reference AES semantics via the oracle) ----
    from tests.test_transducer_beam_oracle import oracle_aes

    Kb, beta, gamma = 2, 1, 6.0
    beam = TransducerBeamSearchDecoder(
        model, d, beam_size=Kb, expansion_beta=beta, expansion_gamma=gamma,
        max_num_expansions_per_step=n_exp, prefix_alpha=1, max_out_factor=1.0,
    )
    got_b = beam.decode(variables, batch)
    for b in range(B):
        ref = oracle_aes(
            twin, enc_out[b], int(enc_lens[b]), Kb, beta, gamma, n_exp,
            prefix_alpha=1, init_state=zeros_state,
        )
        assert len(got_b[b]) == len(ref)
        for g, r in zip(got_b[b], ref):
            assert tuple(g["tokens"]) == r["seq"], (b, g["tokens"], r["seq"])
            assert abs(g["score"] - r["score"]) < 2e-3, (
                b, g["score"], r["score"],
            )
