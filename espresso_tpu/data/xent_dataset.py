"""Hybrid HMM-DNN cross-entropy dataset: features + pdf-id alignments.

Rebuild of espresso/data/asr_xent_dataset.py (AsrXentDataset :377,
AliScpCachedDataset :251, chunk-wise collation :64-160): targets are Kaldi
frame-level alignments (pdf-ids) read from ali scp/ark; training is either
whole-utterance or chunk-wise with left/right context frames, replicate
padding at utterance edges, and ``label_delay`` shifting.

TPU-first: chunk mode is the natural fit — every chunk has the identical
shape [left_ctx + width + right_ctx, F] so XLA compiles exactly one train
program. Chunk start indices are per-(seed, epoch, utt) seeded like the
reference (:100-104).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from espresso_tpu.data import kaldi_io
from espresso_tpu.data.dataset import BatchSpec
from espresso_tpu.data.manifest import ManifestEntry

PAD_TARGET = -1  # pdf-id padding (masked in the criterion)


@dataclass
class XentEntry:
    utt_id: str
    feat: str  # feats rxfilename
    alignment: Optional[str]  # ali rxfilename
    num_frames: Optional[int]


class AsrXentDataset:
    def __init__(
        self,
        entries: Sequence[XentEntry],
        feat_dim: int,
        chunk_width: int = 0,
        chunk_left_context: int = 0,
        chunk_right_context: int = 0,
        label_delay: int = 0,
        seed: int = 1,
    ):
        self.entries = list(entries)
        self.feat_dim = feat_dim
        self.chunk_width = chunk_width
        self.left = chunk_left_context
        self.right = chunk_right_context
        self.label_delay = label_delay
        self.seed = seed
        self.src_sizes = np.array(
            [
                e.num_frames
                if e.num_frames is not None
                else kaldi_io.read_mat(e.feat).shape[0]
                for e in self.entries
            ],
            dtype=np.int64,
        )
        self.tgt_sizes = self.src_sizes

    @staticmethod
    def from_manifest(manifest_entries, ali_map: Dict[str, str], feat_dim, **kw):
        entries = [
            XentEntry(
                utt_id=e.utt_id,
                feat=e.audio,
                alignment=ali_map.get(e.utt_id),
                num_frames=e.num_frames,
            )
            for e in manifest_entries
        ]
        return AsrXentDataset(entries, feat_dim, **kw)

    def __len__(self):
        return len(self.entries)

    # -- batching --------------------------------------------------------------
    def make_batch_specs(
        self,
        max_tokens: Optional[int],
        max_sentences: Optional[int],
        num_buckets: int = 5,
        required_batch_size_multiple: int = 8,
        max_source_positions: int = 6000,
        max_target_positions: int = 6000,
        shuffle: bool = True,
        seed: int = 1,
        epoch: int = 1,
        tgt_pad_multiple: int = 32,
    ) -> List[BatchSpec]:
        if self.chunk_width > 0:
            # fixed-shape chunks: one chunk per utterance per epoch
            # (reference random_chunking), fixed batch size
            n = len(self)
            rng = np.random.default_rng([seed, epoch])
            order = rng.permutation(n) if shuffle else np.arange(n)
            src_len = self.left + self.chunk_width + self.right
            if max_sentences:
                bsz = max_sentences
            else:
                bsz = max(int(max_tokens or 8192) // src_len, 1)
                if bsz > required_batch_size_multiple:
                    bsz -= bsz % required_batch_size_multiple
            specs = []
            for s in range(0, n, bsz):
                chunk = order[s : s + bsz]
                num_real = len(chunk)
                if num_real < bsz:
                    chunk = np.concatenate(
                        [chunk, np.full(bsz - num_real, chunk[-1])]
                    )
                specs.append(
                    BatchSpec(
                        indices=chunk,
                        num_real=num_real,
                        src_bucket=src_len,
                        tgt_bucket=self.chunk_width,
                    )
                )
            return specs
        # whole-utterance mode: same bucketing as AsrDataset
        from espresso_tpu.data.batching import (
            bucket_batches,
            filter_by_size,
            quantile_buckets,
        )

        rng = np.random.default_rng([seed, epoch])
        indices = rng.permutation(len(self)) if shuffle else np.arange(len(self))
        indices = indices[np.argsort(self.src_sizes[indices], kind="stable")]
        indices, _ = filter_by_size(indices, self.src_sizes, max_source_positions)
        sizes = quantile_buckets(
            self.src_sizes[indices], min(num_buckets, len(indices))
        )
        raw = bucket_batches(
            indices,
            self.src_sizes,
            sizes,
            max_tokens=max_tokens,
            max_sentences=max_sentences,
            required_batch_size_multiple=required_batch_size_multiple,
        )
        specs = []
        for chunk, bucket_len in raw:
            num_real = len(chunk)
            for r in range(len(chunk) - 1, 0, -1):
                if chunk[r] == chunk[r - 1]:
                    num_real -= 1
                else:
                    break
            specs.append(
                BatchSpec(
                    indices=chunk,
                    num_real=num_real,
                    src_bucket=bucket_len,
                    tgt_bucket=bucket_len,
                )
            )
        return specs

    @staticmethod
    def group_specs(specs, update_freq):
        from espresso_tpu.data.dataset import AsrDataset

        return AsrDataset.group_specs(specs, update_freq)

    # -- collation ---------------------------------------------------------------
    def _chunk(self, feats: np.ndarray, ali: Optional[np.ndarray], start: int):
        """Reference chunking(:64-95): replicate-padded src window + tgt."""
        width, left, right, delay = (
            self.chunk_width,
            self.left,
            self.right,
            self.label_delay,
        )
        begin_src = max(0, start + delay - left)
        end_src = start + delay + width + right
        left_pad = max(0, left - start - delay)
        right_pad = max(0, end_src - len(feats))
        src = feats[begin_src:end_src]
        if left_pad or right_pad:
            src = np.concatenate(
                [np.repeat(src[:1], left_pad, 0), src, np.repeat(src[-1:], right_pad, 0)]
            )
        tgt = None
        if ali is not None:
            tgt = ali[start : start + width]
            if len(tgt) < width:
                tgt = np.concatenate(
                    [tgt, np.full(width - len(tgt), PAD_TARGET, tgt.dtype)]
                )
        return src, tgt

    def collate(self, spec: BatchSpec, epoch: int = 1) -> Dict[str, Any]:
        B = len(spec.indices)
        T = spec.src_bucket
        W = spec.tgt_bucket
        feats = np.zeros((B, T, self.feat_dim), dtype=np.float32)
        target = np.full((B, W), PAD_TARGET, dtype=np.int32)
        src_lengths = np.zeros(B, dtype=np.int32)
        tgt_lengths = np.zeros(B, dtype=np.int32)
        utt_ids = []
        for row, idx in enumerate(spec.indices):
            e = self.entries[int(idx)]
            mat = kaldi_io.read_mat(e.feat)
            ali = (
                kaldi_io.read_vec_int(e.alignment).astype(np.int32)
                if e.alignment
                else None
            )
            if self.chunk_width > 0:
                rng = np.random.default_rng([self.seed, epoch, int(idx)])
                hi = max(len(mat) - self.chunk_width + 1, 1)
                start = int(rng.integers(0, hi))
                src, tgt = self._chunk(mat, ali, start)
                L = min(len(src), T)
                feats[row, :L] = src[:L]
                src_lengths[row] = L
                if tgt is not None:
                    target[row, : len(tgt)] = tgt
                    tgt_lengths[row] = int((tgt != PAD_TARGET).sum())
            else:
                L = min(len(mat), T)
                feats[row, :L] = mat[:L]
                src_lengths[row] = L
                if ali is not None:
                    al = ali[:W]
                    target[row, : len(al)] = al
                    tgt_lengths[row] = len(al)
            utt_ids.append(e.utt_id)
        weight = (np.arange(B) < spec.num_real).astype(np.float32)
        return {
            "utt_ids": utt_ids,
            "src_frames": feats,
            "src_lengths": src_lengths,
            "target": target,
            "prev_output_tokens": target,  # parity field (unused by hybrid)
            "tgt_lengths": tgt_lengths,
            "weight": weight,
            "ntokens": int((tgt_lengths * weight).sum()),
            "nsentences": spec.num_real,
        }

    def collate_group(self, group: List[BatchSpec], epoch: int = 1) -> Dict[str, Any]:
        parts = [self.collate(s, epoch) for s in group]
        out: Dict[str, Any] = {}
        for key in (
            "src_frames",
            "src_lengths",
            "target",
            "prev_output_tokens",
            "tgt_lengths",
            "weight",
        ):
            out[key] = np.stack([p[key] for p in parts])
        out["utt_ids"] = [p["utt_ids"] for p in parts]
        out["ntokens"] = sum(p["ntokens"] for p in parts)
        out["nsentences"] = sum(p["nsentences"] for p in parts)
        return out
