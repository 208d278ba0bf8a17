"""WER-parity protocol: reference espresso checkpoint vs this framework.

BASELINE.md quality target: <= 0.1 absolute WER delta at the same decode
operating point. This driver makes that claim ONE command once a reference
checkpoint + corpus exist (reference protocol:
/root/reference/examples/asr_librispeech/run.sh:266-290 — decode the test
sets and score WER):

  1. convert the reference ``.pt`` into this framework's format
     (``cli/convert_espresso_checkpoint``, layout parity tested per block,
     whole-model, and hypothesis-level in tests/test_convert.py);
  2. decode the manifest through ``cli/speech_recognize`` at the requested
     operating point;
  3. compare the WER against the reference stack's WER at the same point
     (``--ref-wer`` or ``--ref-results <decode-dir-or-wer-file>`` from the
     reference run — running the reference binaries needs its own torch
     environment, so its number arrives as an artifact), and assert the
     delta is within tolerance.

Real corpus:

    python examples/parity/run_parity.py \
        --ref-checkpoint checkpoint_best.pt --arch speech_transformer_transducer \
        --data /data/librispeech --gen-subset test_other \
        --model-override model.encoder.encoder_layers=16 ... \
        --gen-override generation.beam=10 generation.expansion_beta=2 ... \
        --ref-wer 5.62

Dry run (no corpus needed — fabricates the flagship-family conformer
transducer from tests/test_convert.py::build_flagship_transducer, decodes a
synthetic manifest through BOTH stacks — the torch reference twin via the
brute-force AES oracle implementing transducer_beam_search_decoder.py
semantics, and this framework via the real CLI — and asserts the hypotheses
agree and the WER delta is 0):

    python examples/parity/run_parity.py --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def parse_ref_wer(path: str) -> float:
    """Extract WER from a reference decode artifact (a ``wer`` file or a
    decode dir containing one; accepts 'WER: 5.62%' / 'WER 5.62' forms)."""
    if os.path.isdir(path):
        for name in ("wer", "wer.txt", "decode.log"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
    text = open(path).read()
    m = re.search(r"WER[:\s]+([0-9.]+)", text)
    if not m:
        raise ValueError(f"no WER found in {path}")
    return float(m.group(1))


def run_convert(ckpt: str, arch: str, out_dir: str, num_encoder_layers: int):
    from espresso_tpu.cli.convert_espresso_checkpoint import main as conv_main

    conv_main([
        "--input", ckpt, "--arch", arch, "--output", out_dir,
        "--num-encoder-layers", str(num_encoder_layers),
    ])


def run_recognize(data: str, subset: str, ckpt_dir: str, results: str,
                  overrides) -> float:
    from espresso_tpu.cli.speech_recognize import main as rec_main

    res = rec_main([
        f"dataset.data={data}",
        f"dataset.gen_subset={subset}",
        f"checkpoint.save_dir={ckpt_dir}",
        f"generation.results_path={results}",
        *overrides,
    ])
    return float(res["wer"])


def dry_run(tolerance: float) -> dict:
    """Fabricated-checkpoint parity: both stacks decode the same synthetic
    manifest; reference hypotheses come from the torch twin driven by the
    AES oracle (tests/test_transducer_beam_oracle.oracle_aes — the verified
    reimplementation of the reference's beam semantics)."""
    import jax

    # tiny fabricated model: CPU compiles in seconds (and the dry run must
    # not grab the single-process TPU from a real workload)
    jax.config.update("jax_platforms", "cpu")
    import torch

    sys.path.insert(0, REPO)  # tests/ package import
    from tests.test_convert import build_flagship_transducer
    from tests.test_transducer_beam_oracle import oracle_aes

    from espresso_tpu.data import kaldi_io

    fx = build_flagship_transducer(seed=7)
    d = fx.dims
    V, F, P = d["V"], d["F"], d["P"]
    n_utts, T = 6, 12
    Kb, beta, gamma, n_exp, alpha = 2, 1, 6.0, 2, 1
    blank = 0

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="parity_")
    data_dir = os.path.join(tmp, "data")
    os.makedirs(data_dir)

    # dictionary with exactly V - 4 symbols (bos/pad/eos/unk + a..g = V)
    syms = list("abcdefg")[: V - 4]
    with open(os.path.join(data_dir, "dict.txt"), "w") as f:
        for s in syms:
            f.write(f"{s} 10\n")

    # synthetic manifest: random features, single-word texts (no <space>)
    ark = os.path.join(data_dir, "test.ark")
    manifest = {}
    feats = []
    with open(ark, "wb") as f:
        for i in range(n_utts):
            utt = f"utt{i:03d}"
            mat = (rng.standard_normal((T, F)) * 3.0).astype(np.float32)
            feats.append(mat)
            f.write((utt + " ").encode())
            off = f.tell()
            kaldi_io.write_mat(f, mat)
            word = "".join(rng.choice(syms, size=int(rng.integers(2, 5))))
            manifest[utt] = {
                "feat": f"{ark}:{off}",
                "text": word,
                "utt2num_frames": str(T),
            }
    with open(os.path.join(data_dir, "test.json"), "w") as f:
        json.dump(manifest, f)

    # --- reference stack: torch twin + AES oracle --------------------------
    import torch.nn.functional as tF

    x = torch.tensor(np.stack(feats))
    with torch.no_grad():
        enc_out = fx.torch_encode(x).numpy()  # [B, Tc, D]
        w_eff = fx.w_eff.numpy()
        wn_b = fx.wn_b.numpy()
    enc_lens = np.full(n_utts, (T + 1) // 2)

    class TorchTwin:
        def np_pred_step(self, token, state):
            h0, c0, h1, c1 = state
            with torch.no_grad():
                e = fx.embed(torch.tensor([token]))
                h0t, c0t = fx.cell0(
                    e, (torch.tensor(h0[None]), torch.tensor(c0[None]))
                )
                h1t, c1t = fx.cell1(
                    h0t, (torch.tensor(h1[None]), torch.tensor(c1[None]))
                )
            return h1t[0].numpy(), (
                h0t[0].numpy(), c0t[0].numpy(),
                h1t[0].numpy(), c1t[0].numpy(),
            )

        def np_logits(self, enc_t, feat):
            with torch.no_grad():
                ej = fx.ln_enc(fx.proj_enc(torch.tensor(enc_t)))
                dj = fx.ln_dec(fx.proj_dec(torch.tensor(feat)))
                pre = tF.relu(ej + dj).numpy()
            return pre @ w_eff.T + wn_b

    from espresso_tpu.data.dictionary import AsrDictionary
    from espresso_tpu.tools.wer import Scorer

    dic = AsrDictionary.load(os.path.join(data_dir, "dict.txt"),
                             enable_bos=True)

    twin = TorchTwin()
    twin.V = V  # class bodies can't close over the enclosing scope
    zeros = tuple(np.zeros(P, np.float32) for _ in range(4))
    ref_hyps = []
    for b in range(n_utts):
        beam = oracle_aes(
            twin, enc_out[b], int(enc_lens[b]), Kb, beta, gamma, n_exp,
            blank=blank, prefix_alpha=alpha, init_state=zeros,
        )
        best = max(beam, key=lambda h: h["score"])
        # render with the SAME dictionary the CLI uses (unk -> '*', etc.)
        ref_hyps.append(
            dic.tokens_to_sentence(
                dic.string(np.asarray(best["seq"], np.int32))
            )
        )
    scorer = Scorer(dic)
    for utt, hyp in zip(manifest, ref_hyps):
        scorer.add_evaluation(utt, manifest[utt]["text"], hyp)
    ref_wer = scorer.wer()

    # --- this framework: convert -> real CLI decode ------------------------
    sd_torch = {k: (v if isinstance(v, torch.Tensor) else torch.tensor(v))
                for k, v in fx.sd.items()}
    pt = os.path.join(tmp, "ref_checkpoint.pt")
    torch.save({"model": sd_torch}, pt)
    ckpt_dir = os.path.join(tmp, "converted")
    run_convert(pt, "speech_transformer_transducer", ckpt_dir, 2)

    e = fx.cfg.encoder
    model_overrides = [
        "model.name=speech_transformer_transducer",
        f"dataset.feat_dim={F}",
        "model.encoder.conv_channels=(4,)",
        "model.encoder.conv_kernel_sizes=((3,3),)",
        "model.encoder.conv_strides=((2,2),)",
        "model.encoder.conv_norm_type=batch",
        "model.encoder.encoder_layer_type=conformer",
        "model.encoder.encoder_pos_type=relative",
        f"model.encoder.encoder_embed_dim={e.encoder_embed_dim}",
        f"model.encoder.encoder_ffn_dim={e.encoder_ffn_dim}",
        f"model.encoder.encoder_layers={e.encoder_layers}",
        f"model.encoder.encoder_heads={e.encoder_heads}",
        f"model.encoder.depthwise_conv_kernel_size={e.depthwise_conv_kernel_size}",
        "model.encoder.conformer_norm_type=batch",
        "model.encoder.dropout=0.0",
        f"model.pred_embed_dim={fx.cfg.pred_embed_dim}",
        f"model.pred_hidden_size={fx.cfg.pred_hidden_size}",
        f"model.pred_layers={fx.cfg.pred_layers}",
        f"model.joint_dim={fx.cfg.joint_dim}",
        "model.pred_dropout=0.0",
        "criterion.name=transducer_loss",
        "common.dtype=float32",
    ]
    gen_overrides = [
        f"generation.beam={Kb}",
        f"generation.expansion_beta={beta}",
        f"generation.expansion_gamma={gamma}",
        f"generation.max_num_expansions_per_step={n_exp}",
        f"generation.prefix_alpha={alpha}",
        "generation.max_out_factor=2.0",
    ]
    got_wer = run_recognize(
        data_dir, "test", ckpt_dir, os.path.join(tmp, "decode"),
        model_overrides + gen_overrides,
    )

    # hypothesis-level check on top of the WER diff
    hyp_lines = {}
    with open(os.path.join(tmp, "decode", "decoded_results.txt")) as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            if parts:
                hyp_lines[parts[0]] = parts[1] if len(parts) > 1 else ""
    mismatches = [
        (u, ref_hyps[i], hyp_lines.get(u, "<missing>"))
        for i, u in enumerate(manifest)
        if hyp_lines.get(u, "") != ref_hyps[i]
    ]
    return dict(
        ref_wer=ref_wer, got_wer=got_wer, delta=abs(got_wer - ref_wer),
        tolerance=tolerance, hypothesis_mismatches=len(mismatches),
        mismatch_detail=mismatches[:3], tmpdir=tmp,
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref-checkpoint", help="reference espresso .pt")
    ap.add_argument("--arch", default="speech_transformer_transducer")
    ap.add_argument("--num-encoder-layers", type=int, default=3)
    ap.add_argument("--data", help="manifest dir ({subset}.json + dict.txt)")
    ap.add_argument("--gen-subset", default="test")
    ap.add_argument("--ref-wer", type=float, help="reference stack WER")
    ap.add_argument("--ref-results", help="reference decode dir / wer file")
    ap.add_argument("--model-override", nargs="*", default=[])
    ap.add_argument("--gen-override", nargs="*", default=[])
    ap.add_argument("--out", default=None, help="work dir (default: temp)")
    ap.add_argument("--tolerance", type=float, default=0.1)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    if args.dry_run:
        res = dry_run(args.tolerance)
        ok = res["delta"] <= args.tolerance and not res["hypothesis_mismatches"]
        print(json.dumps({"mode": "dry_run", "ok": ok, **res}))
        return 0 if ok else 1

    if not (args.ref_checkpoint and args.data):
        ap.error("--ref-checkpoint and --data are required (or --dry-run)")
    if args.ref_wer is None and not args.ref_results:
        ap.error("provide --ref-wer or --ref-results")
    ref_wer = (args.ref_wer if args.ref_wer is not None
               else parse_ref_wer(args.ref_results))

    out = args.out or tempfile.mkdtemp(prefix="parity_")
    ckpt_dir = os.path.join(out, "converted")
    run_convert(args.ref_checkpoint, args.arch, ckpt_dir,
                args.num_encoder_layers)
    got_wer = run_recognize(
        args.data, args.gen_subset, ckpt_dir, os.path.join(out, "decode"),
        list(args.model_override) + list(args.gen_override),
    )
    delta = abs(got_wer - ref_wer)
    ok = delta <= args.tolerance
    print(json.dumps({
        "mode": "real", "ok": ok, "ref_wer": ref_wer, "got_wer": got_wer,
        "delta": round(delta, 4), "tolerance": args.tolerance,
        "decode_dir": os.path.join(out, "decode"),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
