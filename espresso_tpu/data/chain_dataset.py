"""LF-MMI chain dataset: features + per-utterance numerator FSTs.

Rebuild of espresso/data/asr_chain_dataset.py (AsrChainDataset,
NumeratorGraphDataset :92, read_fsts :102): each utterance's supervision is
a small acceptor FST over pdf-ids (produced by Kaldi's chain-supervision
pipeline and stored per-utterance, rxfilename ``path`` or ``path:offset``).
All numerator graphs are read into memory at construction like the
reference, then packed per batch into padded arc arrays
(ops/chain.pack_numerator_graphs) with DATASET-WIDE max arcs/states so XLA
compiles one train program per source bucket.

Whole-utterance training only (the reference chain dataset has no chunk
mode; chunked hybrid training is the xent path)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from espresso_tpu.data import kaldi_io
from espresso_tpu.data.dataset import BatchSpec
from espresso_tpu.data.xent_dataset import PAD_TARGET
from espresso_tpu.ops.chain import DenominatorGraph, pack_numerator_graphs


@dataclass
class ChainEntry:
    utt_id: str
    feat: str  # feats rxfilename
    numerator_fst: str  # fst rxfilename (path or path:offset)
    num_frames: Optional[int]


class AsrChainDataset:
    def __init__(self, entries: Sequence[ChainEntry], feat_dim: int):
        self.entries = list(entries)
        self.feat_dim = feat_dim
        self.graphs: List[DenominatorGraph] = [
            DenominatorGraph.load(e.numerator_fst) for e in self.entries
        ]
        self.max_arcs = max(
            (len(g.from_state) for g in self.graphs), default=1
        )
        self.max_states = max((g.num_states for g in self.graphs), default=1)
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
    def from_manifest(manifest_entries, feat_dim: int) -> "AsrChainDataset":
        entries = [
            ChainEntry(
                utt_id=e.utt_id,
                feat=e.audio,
                numerator_fst=e.numerator_fst,
                num_frames=e.num_frames,
            )
            for e in manifest_entries
        ]
        return AsrChainDataset(entries, feat_dim)

    def __len__(self):
        return len(self.entries)

    # -- batching (same whole-utterance bucketing as AsrXentDataset) ----------
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

    # -- collation -------------------------------------------------------------
    def collate(self, spec: BatchSpec, epoch: int = 1) -> Dict[str, Any]:
        B = len(spec.indices)
        T = spec.src_bucket
        feats = np.zeros((B, T, self.feat_dim), dtype=np.float32)
        src_lengths = np.zeros(B, dtype=np.int32)
        utt_ids = []
        graphs = []
        for row, idx in enumerate(spec.indices):
            e = self.entries[int(idx)]
            mat = kaldi_io.read_mat(e.feat)
            L = min(len(mat), T)
            feats[row, :L] = mat[:L]
            src_lengths[row] = L
            graphs.append(self.graphs[int(idx)])
            utt_ids.append(e.utt_id)
        weight = (np.arange(B) < spec.num_real).astype(np.float32)
        tgt_lengths = src_lengths.copy()  # supervision spans all output frames
        target = np.full((B, T), PAD_TARGET, dtype=np.int32)  # parity field
        batch = {
            "utt_ids": utt_ids,
            "src_frames": feats,
            "src_lengths": src_lengths,
            "target": target,
            "prev_output_tokens": target,
            "tgt_lengths": tgt_lengths,
            "weight": weight,
            "ntokens": int((tgt_lengths * weight).sum()),
            "nsentences": spec.num_real,
        }
        batch.update(
            pack_numerator_graphs(
                graphs, max_arcs=self.max_arcs, max_states=self.max_states
            )
        )
        return batch

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
            "num_from",
            "num_to",
            "num_pdf",
            "num_weight",
            "num_final",
        ):
            out[key] = np.stack([p[key] for p in parts])
        out["utt_ids"] = [p["utt_ids"] for p in parts]
        out["ntokens"] = sum(p["ntokens"] for p in parts)
        out["nsentences"] = sum(p["nsentences"] for p in parts)
        return out
