"""Host input-pipeline feed-rate proof (VERDICT r3 task #5).

Measures host batch materialization (ark feature reads + collation, CMVN)
at the flagship train operating point — B=16 utterances of ~10.2 s
(T~1024 frames, 80-dim fbank from Kaldi ark archives, the librispeech
conformer_transducer point) — and compares batches/s against the measured
77 ms device train step (bench_train.py). The device needs ~13 batches/s;
the pipeline must show >= 2x headroom.

Reference mechanism: fairseq/data/iterators.py:481-532 (DataLoader worker
processes); here: espresso_tpu/data/iterators.py::parallel_collate_iter.

Usage: python bench_input.py [--utts 512] [--workers 0 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

DEVICE_STEP_MS = 77.3  # bench_train.py flagship step (STATUS.md)


def make_flagship_corpus(root: str, num_utts: int, feat_dim: int = 80,
                         frames: int = 1024, seed: int = 0,
                         scenario: str = "ark") -> None:
    from espresso_tpu.data import kaldi_io

    rng = np.random.default_rng(seed)
    manifest = {}
    words = ["".join(rng.choice(list("abcdefg"), size=3)) for _ in range(50)]
    if scenario == "ark":
        ark = os.path.join(root, "train.ark")
        with open(ark, "wb") as f:
            for i in range(num_utts):
                utt = f"utt{i:05d}"
                T = int(rng.integers(int(frames * 0.9), frames + 1))
                mat = rng.standard_normal((T, feat_dim)).astype(np.float32)
                f.write((utt + " ").encode())
                off = f.tell()
                kaldi_io.write_mat(f, mat)
                manifest[utt] = {
                    "feat": f"{ark}:{off}",
                    "text": " ".join(rng.choice(words, size=20)),
                    "utt2num_frames": str(T),
                }
    else:  # on-the-fly fbank from 16 kHz wave (the host-compute-heavy path)
        import wave as wavmod

        for i in range(num_utts):
            utt = f"utt{i:05d}"
            S = int(rng.integers(int(frames * 0.9), frames + 1)) * 160
            pcm = (rng.standard_normal(S) * 3000).astype("<i2")
            p = os.path.join(root, f"{utt}.wav")
            with wavmod.open(p, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            manifest[utt] = {
                "wave": p,
                "text": " ".join(rng.choice(words, size=20)),
                "utt2num_frames": str(S // 160),
            }
    with open(os.path.join(root, "train.json"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(root, "dict.txt"), "w") as f:
        for s in ["<space>"] + sorted("abcdefg"):
            f.write(f"{s} 10\n")
    # global CMVN stats (the flagship recipe applies global CMVN on host)
    np.savez(
        os.path.join(root, "gcmvn.npz"),
        mean=np.zeros(feat_dim, np.float32),
        std=np.ones(feat_dim, np.float32),
    )


def run(root: str, num_workers: int, backend: str, batches: int,
        scenario: str = "ark") -> float:
    from espresso_tpu.data.dataset import AsrDataset
    from espresso_tpu.data.dictionary import AsrDictionary
    from espresso_tpu.data.encoders import CharactersAsr
    from espresso_tpu.data.iterators import EpochBatchIterator
    from espresso_tpu.data.manifest import load_manifest

    entries = load_manifest(root, "train")
    dic = AsrDictionary.load(os.path.join(root, "dict.txt"), enable_bos=True)
    ds = AsrDataset(
        entries, dic, feat_dim=80, tokenizer=CharactersAsr(),
        feature_type="precomputed" if scenario == "ark" else "fbank",
        global_cmvn_stats_path=(
            os.path.join(root, "gcmvn.npz") if scenario != "device_fbank"
            else None
        ),
        speed_perturb_rates=[0.9, 1.0, 1.1] if scenario != "ark" else None,
        # device_fbank: host collates raw PCM; fbank runs fused on-TPU
        # inside the train step (features/pallas_fbank.py, 26108x RT)
        device_features=scenario == "device_fbank",
        is_train=True,
    )
    # defeat the LRU across runs: the 960h case never re-reads an utt
    ds._feat_cache = None
    specs = ds.make_batch_specs(
        max_tokens=None, max_sentences=16, num_buckets=3, shuffle=True,
        seed=1, epoch=1,
    )

    itr = EpochBatchIterator(
        lambda ep: [[s] for s in specs],
        ds.collate_group,
        seed=1,
        buffer_size=4,
        num_workers=num_workers,
        worker_backend=backend,
    )
    it = itr.next_epoch_itr()
    # warmup: pool startup (process spawn + imports can be seconds/worker)
    for _ in range(max(num_workers, 1)):
        next(it)
    n = 0
    t0 = time.perf_counter()
    for batch in it:
        n += 1
        if n >= batches:
            break
    wall = time.perf_counter() - t0
    return n / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=512)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4, 8])
    ap.add_argument("--backend", nargs="+", default=["thread", "process"])
    ap.add_argument(
        "--scenario", nargs="+", default=["ark", "fbank", "device_fbank"]
    )
    args = ap.parse_args()

    need = 1000.0 / DEVICE_STEP_MS
    summary = {}
    for scenario in args.scenario:
        with tempfile.TemporaryDirectory() as root:
            # enough batches that warmup + the in-flight window can never
            # pre-compute the measured stretch (else we time a queue drain)
            n_utts = max(args.utts,
                         (3 * max(args.workers) + args.batches + 8) * 16)
            make_flagship_corpus(
                root, n_utts,
                scenario="ark" if scenario == "ark" else "wave",
            )
            results = {}
            for w in args.workers:
                for backend in (args.backend if w else ["serial"]):
                    rate = run(root, w, backend, args.batches, scenario)
                    results[(w, backend)] = rate
                    print(
                        f"[{scenario:5s}] workers={w:2d} ({backend:7s}): "
                        f"{rate:6.1f} batches/s = {rate / need:5.2f}x the "
                        f"{DEVICE_STEP_MS} ms device step",
                        flush=True,
                    )
                    if w == 0:
                        break
            best = max(results, key=results.get)
            summary[scenario] = (best, results[best])
    # the flagship train point feeds from precomputed Kaldi arks
    # (reference run.sh stage: dump fbank -> feats.scp); that is the
    # headroom number that gates the 77 ms device step
    best, rate = summary.get("ark", summary[next(iter(summary))])
    print(json.dumps({
        "metric": "host_input_batches_per_s",
        "value": round(rate, 2),
        "unit": f"batches/s (ark B=16xT1024x80, workers={best[0]} {best[1]})",
        "vs_baseline": round(rate / need, 3),
    }))


if __name__ == "__main__":
    main()
