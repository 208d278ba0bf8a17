"""Convert an Espresso (PyTorch) checkpoint into this framework's format.

Enables WER-parity validation against reference-trained models
(SURVEY.md §7 step 11). Supports ``speech_lstm`` encoder-decoder models and
``lstm_lm_espresso`` language models.

Layout mapping (verified block-by-block against plain-torch reimplementations
in tests/test_convert.py):
  * Conv2d OIHW -> flax HWIO; BatchNorm weight/bias/running stats ->
    scale/bias + batch_stats
  * nn.LSTM ``weight_ih_l{k}[_reverse]`` [4H, in] -> ``fwd_{k}/bwd_{k}`` ih
    kernel [in, 4H] (transposed); ``bias_ih + bias_hh`` -> single ih bias;
    ``weight_hh`` -> hh_kernel. Torch gate order (i, f, g, o) matches ours.
  * LSTMCell stacks -> ``cell{i}_ih`` / ``cell{i}_hh``
  * Bahdanau attention query_proj/value_proj/v/g/b -> query_proj/key_proj/
    v/g/b (g squeezed to a scalar)
  * nn.Linear [out, in] -> kernel [in, out]

Usage:
    python -m espresso_tpu.cli.convert_espresso_checkpoint \
        --input checkpoint_best.pt --arch speech_lstm --output ckpt_dir
"""

from __future__ import annotations

import argparse
import json
import logging

from espresso_tpu.cli.logging_utils import setup_logging
import os
import re
import sys
from typing import Any, Dict

import numpy as np

setup_logging()
logger = logging.getLogger("espresso_tpu.convert")


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(x.detach().cpu().numpy().astype(np.float32))


def convert_conv_frontend(sd: Dict[str, Any], prefix: str):
    """Espresso ConvBNReLU -> ConvFrontend params + batch_stats."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.convolutions.{i}.weight" in sd:
        w = _t(sd[f"{prefix}.convolutions.{i}.weight"])  # [O, I, kh, kw]
        params[f"Conv_{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{prefix}.convolutions.{i}.bias"]),
        }
        if f"{prefix}.batchnorms.{i}.weight" in sd:
            params[f"BatchNorm_{i}"] = {
                "scale": _t(sd[f"{prefix}.batchnorms.{i}.weight"]),
                "bias": _t(sd[f"{prefix}.batchnorms.{i}.bias"]),
            }
            stats[f"BatchNorm_{i}"] = {
                "mean": _t(sd[f"{prefix}.batchnorms.{i}.running_mean"]),
                "var": _t(sd[f"{prefix}.batchnorms.{i}.running_var"]),
            }
        i += 1
    return params, stats


def _lstm_dir(sd, key_w_ih, key_w_hh, key_b_ih, key_b_hh):
    w_ih = _t(sd[key_w_ih])  # [4H, in]
    w_hh = _t(sd[key_w_hh])  # [4H, H]
    bias = _t(sd[key_b_ih]) + _t(sd[key_b_hh])
    return {
        "ih": {"kernel": w_ih.T, "bias": bias},
        "hh_kernel": w_hh.T,
    }


def convert_encoder_lstm(sd: Dict[str, Any], prefix: str, num_layers: int):
    """nn.LSTM (single multi-layer module or ModuleList) -> LSTM params."""
    params: Dict[str, Any] = {}
    single = f"{prefix}.weight_ih_l0" in sd
    for k in range(num_layers):
        if single:
            base = prefix
            suffix = f"_l{k}"
        else:
            base = f"{prefix}.{k}"
            suffix = "_l0"
        params[f"fwd_{k}"] = _lstm_dir(
            sd,
            f"{base}.weight_ih{suffix}",
            f"{base}.weight_hh{suffix}",
            f"{base}.bias_ih{suffix}",
            f"{base}.bias_hh{suffix}",
        )
        rev = f"{base}.weight_ih{suffix}_reverse"
        if rev in sd:
            params[f"bwd_{k}"] = _lstm_dir(
                sd,
                f"{base}.weight_ih{suffix}_reverse",
                f"{base}.weight_hh{suffix}_reverse",
                f"{base}.bias_ih{suffix}_reverse",
                f"{base}.bias_hh{suffix}_reverse",
            )
    return params


def convert_lstm_decoder(sd: Dict[str, Any], prefix: str):
    """SpeechLSTMDecoder -> our scanned-decoder params."""
    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": _t(sd[f"{prefix}.embed_tokens.weight"])}
    }
    i = 0
    while f"{prefix}.layers.{i}.weight_ih" in sd:
        w_ih = _t(sd[f"{prefix}.layers.{i}.weight_ih"])
        w_hh = _t(sd[f"{prefix}.layers.{i}.weight_hh"])
        bias = _t(sd[f"{prefix}.layers.{i}.bias_ih"]) + _t(
            sd[f"{prefix}.layers.{i}.bias_hh"]
        )
        params[f"cell{i}_ih"] = {"kernel": w_ih.T, "bias": bias}
        params[f"cell{i}_hh"] = {"kernel": w_hh.T}
        i += 1
    if f"{prefix}.attention.query_proj.weight" in sd:
        attn = {
            "query_proj": {
                "kernel": _t(sd[f"{prefix}.attention.query_proj.weight"]).T
            },
            "key_proj": {
                "kernel": _t(sd[f"{prefix}.attention.value_proj.weight"]).T
            },
            "v": _t(sd[f"{prefix}.attention.v"]),
        }
        if f"{prefix}.attention.g" in sd:
            attn["g"] = _t(sd[f"{prefix}.attention.g"]).reshape(())
            attn["b"] = _t(sd[f"{prefix}.attention.b"])
        params["attention"] = attn
    if f"{prefix}.additional_fc.weight" in sd:
        params["additional_fc"] = {
            "kernel": _t(sd[f"{prefix}.additional_fc.weight"]).T,
            "bias": _t(sd[f"{prefix}.additional_fc.bias"]),
        }
    if f"{prefix}.fc_out.weight" in sd:
        params["fc_out"] = {
            "kernel": _t(sd[f"{prefix}.fc_out.weight"]).T,
            "bias": _t(sd[f"{prefix}.fc_out.bias"]),
        }
    return params


def convert_speech_lstm(sd: Dict[str, Any], num_encoder_layers: int):
    """Full speech_lstm model state dict -> (params, batch_stats)."""
    conv_params, conv_stats = convert_conv_frontend(sd, "encoder.pre_encoder")
    enc_lstm = convert_encoder_lstm(sd, "encoder.lstm", num_encoder_layers)
    params = {
        "encoder": {"conv": conv_params, "lstm": enc_lstm},
        "decoder": convert_lstm_decoder(sd, "decoder"),
    }
    batch_stats = {"encoder": {"conv": conv_stats}} if conv_stats else {}
    return params, batch_stats


def convert_lstm_lm(sd: Dict[str, Any]):
    return {"decoder": convert_lstm_decoder(sd, "decoder")}, {}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="espresso .pt checkpoint")
    p.add_argument(
        "--arch",
        required=True,
        choices=[
            "speech_lstm",
            "lstm_lm",
            "speech_transformer",
            "speech_transformer_transducer",
        ],
    )
    p.add_argument("--num-encoder-layers", type=int, default=3)
    p.add_argument("--output", required=True, help="output checkpoint dir")
    args = p.parse_args(argv)

    import torch

    blob = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob)
    if args.arch == "speech_lstm":
        params, batch_stats = convert_speech_lstm(sd, args.num_encoder_layers)
    elif args.arch == "speech_transformer":
        params, batch_stats = convert_speech_transformer(sd)
    elif args.arch == "speech_transformer_transducer":
        params, batch_stats = convert_speech_transformer_transducer(sd)
    else:
        params, batch_stats = convert_lstm_lm(sd)

    import orbax.checkpoint as ocp

    out = os.path.abspath(args.output)
    state = {
        "step": np.zeros((), np.int32),
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": {},
        "ema_params": None,
        "overflow_count": np.zeros((), np.int32),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(out, "checkpoint_last", "state"), state)
    with open(os.path.join(out, "checkpoint_last", "host_state.json"), "w") as f:
        json.dump({}, f)
    logger.info("converted %s -> %s", args.input, args.output)


if __name__ == "__main__":
    main()


def _linear(sd, key):
    out = {"kernel": _t(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _layernorm(sd, key):
    return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}


def convert_conformer_layer(sd: Dict[str, Any], prefix: str):
    """fairseq ConformerWithRelativePositionalEmbeddingEncoderLayer ->
    modules/conformer.ConformerEncoderLayer params (+ batch stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for ffn in ("ffn1", "ffn2"):
        params[ffn] = {
            "LayerNorm_0": _layernorm(sd, f"{prefix}.{ffn}.layer_norm"),
            "Dense_0": _linear(sd, f"{prefix}.{ffn}.w_1"),
            "Dense_1": _linear(sd, f"{prefix}.{ffn}.w_2"),
        }
    params["self_attn_layer_norm"] = _layernorm(sd, f"{prefix}.self_attn_layer_norm")
    attn = {
        "q_proj": _linear(sd, f"{prefix}.self_attn.linear_q"),
        "k_proj": _linear(sd, f"{prefix}.self_attn.linear_k"),
        "v_proj": _linear(sd, f"{prefix}.self_attn.linear_v"),
        "out_proj": _linear(sd, f"{prefix}.self_attn.linear_out"),
    }
    if f"{prefix}.self_attn.linear_pos.weight" in sd:
        attn["pos_proj"] = {
            "kernel": _t(sd[f"{prefix}.self_attn.linear_pos.weight"]).T
        }
        attn["pos_bias_u"] = _t(sd[f"{prefix}.self_attn.pos_bias_u"])
        attn["pos_bias_v"] = _t(sd[f"{prefix}.self_attn.pos_bias_v"])
    params["self_attn"] = attn
    cm = f"{prefix}.conv_module"
    pw1 = _t(sd[f"{cm}.pointwise_conv1.weight"])  # [2C, C, 1]
    pw2 = _t(sd[f"{cm}.pointwise_conv2.weight"])  # [C, C, 1]
    dw = _t(sd[f"{cm}.depthwise_conv.weight"])  # [C, 1, k]
    conv = {
        "LayerNorm_0": _layernorm(sd, f"{cm}.layer_norm"),
        "Dense_0": {"kernel": pw1[:, :, 0].T},
        "Conv_0": {"kernel": dw.transpose(2, 1, 0)},
        "Dense_1": {"kernel": pw2[:, :, 0].T},
    }
    if f"{cm}.pointwise_conv1.bias" in sd:
        conv["Dense_0"]["bias"] = _t(sd[f"{cm}.pointwise_conv1.bias"])
        conv["Conv_0"]["bias"] = _t(sd[f"{cm}.depthwise_conv.bias"])
        conv["Dense_1"]["bias"] = _t(sd[f"{cm}.pointwise_conv2.bias"])
    if f"{cm}.batch_norm.weight" in sd:
        conv["BatchNorm_0"] = {
            "scale": _t(sd[f"{cm}.batch_norm.weight"]),
            "bias": _t(sd[f"{cm}.batch_norm.bias"]),
        }
        stats["conv_module"] = {
            "BatchNorm_0": {
                "mean": _t(sd[f"{cm}.batch_norm.running_mean"]),
                "var": _t(sd[f"{cm}.batch_norm.running_var"]),
            }
        }
    params["conv_module"] = conv
    params["final_layer_norm"] = _layernorm(sd, f"{prefix}.final_layer_norm")
    return params, stats


def _mha(sd, prefix):
    """fairseq MultiheadAttention (separate q/k/v/out projections) -> ours."""
    out = {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }
    if f"{prefix}.linear_pos.weight" in sd:  # espnet rel-pos variant
        out["pos_proj"] = {"kernel": _t(sd[f"{prefix}.linear_pos.weight"]).T}
        out["pos_bias_u"] = _t(sd[f"{prefix}.pos_bias_u"])
        out["pos_bias_v"] = _t(sd[f"{prefix}.pos_bias_v"])
    return out


def convert_transformer_encoder_layer(sd: Dict[str, Any], prefix: str):
    """fairseq TransformerEncoderLayer (pre-norm) ->
    modules/conformer.TransformerEncoderLayer params."""
    return {
        "self_attn_layer_norm": _layernorm(sd, f"{prefix}.self_attn_layer_norm"),
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
        "Dense_0": _linear(sd, f"{prefix}.fc1"),
        "Dense_1": _linear(sd, f"{prefix}.fc2"),
    }


def convert_transformer_decoder_layer(sd: Dict[str, Any], prefix: str):
    """fairseq TransformerDecoderLayer -> models/speech_transformer
    TransformerDecoderLayer params (encoder_attn -> cross_attn)."""
    return {
        "self_attn_layer_norm": _layernorm(sd, f"{prefix}.self_attn_layer_norm"),
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "cross_attn_layer_norm": _layernorm(
            sd, f"{prefix}.encoder_attn_layer_norm"
        ),
        "cross_attn": _mha(sd, f"{prefix}.encoder_attn"),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
    }


def _count_layers(sd: Dict[str, Any], prefix: str) -> int:
    n = 0
    while any(k.startswith(f"{prefix}.{n}.") for k in sd):
        n += 1
    return n


def convert_transformer_encoder(sd: Dict[str, Any], prefix: str = "encoder"):
    """Espresso SpeechTransformerEncoder (speech_transformer_encoder.py:44):
    pre_encoder conv -> fc0 -> transformer/conformer layer stack ->
    layer_norm; maps onto our SpeechTransformerEncoder tree."""
    conv_params, conv_stats = convert_conv_frontend(sd, f"{prefix}.pre_encoder")
    params: Dict[str, Any] = {"conv": conv_params}
    stats: Dict[str, Any] = {"conv": conv_stats} if conv_stats else {}
    if f"{prefix}.fc0.weight" in sd:
        params["fc0"] = _linear(sd, f"{prefix}.fc0")
    n_layers = _count_layers(sd, f"{prefix}.layers")
    conformer = f"{prefix}.layers.0.ffn1.w_1.weight" in sd
    for i in range(n_layers):
        if conformer:
            lp, ls = convert_conformer_layer(sd, f"{prefix}.layers.{i}")
            params[f"layer{i}"] = lp
            if ls:
                stats[f"layer{i}"] = ls
        else:
            params[f"layer{i}"] = convert_transformer_encoder_layer(
                sd, f"{prefix}.layers.{i}"
            )
    if f"{prefix}.layer_norm.weight" in sd:
        params["final_norm"] = _layernorm(sd, f"{prefix}.layer_norm")
    return params, stats


def convert_speech_transformer(sd: Dict[str, Any]):
    """Full espresso speech_transformer model -> (params, batch_stats)."""
    enc_params, enc_stats = convert_transformer_encoder(sd, "encoder")
    params: Dict[str, Any] = {
        "encoder": enc_params,
        "embed_tokens": {"embedding": _t(sd["decoder.embed_tokens.weight"])},
    }
    n_dec = _count_layers(sd, "decoder.layers")
    for i in range(n_dec):
        params[f"declayer{i}"] = convert_transformer_decoder_layer(
            sd, f"decoder.layers.{i}"
        )
    params["decoder_norm"] = _layernorm(sd, "decoder.layer_norm")
    if "decoder.output_projection.weight" in sd:
        out_w = _t(sd["decoder.output_projection.weight"])
        emb = params["embed_tokens"]["embedding"]
        if out_w.shape != emb.shape or not np.array_equal(out_w, emb):
            params["fc_out"] = {"kernel": out_w.T}
            if "decoder.output_projection.bias" in sd:
                params["fc_out"]["bias"] = _t(
                    sd["decoder.output_projection.bias"]
                )
    batch_stats = {"encoder": enc_stats} if enc_stats else {}
    return params, batch_stats


def _weight_norm_linear(sd, key):
    """nn.utils.weight_norm'd Linear: weight = g * v / ||v|| (row-wise)."""
    if f"{key}.weight_g" in sd:
        g = _t(sd[f"{key}.weight_g"])  # [out, 1]
        v = _t(sd[f"{key}.weight_v"])  # [out, in]
        w = g * v / np.linalg.norm(v, axis=1, keepdims=True)
    else:
        w = _t(sd[f"{key}.weight"])
    out = {"kernel": w.T}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def convert_speech_transformer_transducer(sd: Dict[str, Any]):
    """Espresso speech_transformer_transducer
    (speech_transformer_transducer_base.py:44): conformer encoder +
    SpeechLSTMDecoder prediction net (LM mode) + joint projections."""
    enc_params, enc_stats = convert_transformer_encoder(sd, "encoder")
    pred = convert_lstm_decoder(sd, "decoder")
    # prediction net feeds features (not logits) into the joint; drop any
    # LM-style output head
    pred.pop("fc_out", None)
    params: Dict[str, Any] = {
        "encoder": enc_params,
        "predictor": pred,
        "joint": {
            "proj_enc": _linear(sd, "proj_encoder"),
            "ln_enc": _layernorm(sd, "laynorm_proj_encoder"),
            "proj_dec": _linear(sd, "proj_decoder"),
            "ln_dec": _layernorm(sd, "laynorm_proj_decoder"),
            "fc_out": _weight_norm_linear(sd, "fc_out"),
        },
    }
    batch_stats = {"encoder": enc_stats} if enc_stats else {}
    return params, batch_stats
