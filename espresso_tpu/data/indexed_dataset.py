"""Mmap-binarized token stream + token-block packing for LM training.

Rebuild of fairseq's binarized LM data path
(fairseq/data/indexed_dataset.py ``MMapIndexedDataset``,
fairseq/data/token_block_utils_fast.pyx:1-187, wrapped by
``TokenBlockDataset``/``MonolingualDataset``): text is binarized ONCE into
a flat little-endian int32 token stream (``{prefix}.bin``) with an int64
sentence-offset index (``{prefix}.idx``), memory-mapped at load, and packed
into fixed-length training blocks. Training memory is O(batch), not
O(corpus) — the reference's LibriSpeech-LM / wiki103 scale works.

TPU-first simplifications vs the reference: one dtype (int32) instead of
the 8-code dtype enum, numpy instead of Cython for block slicing (it runs
once per dataset load), and ``none``-mode blocks are all exactly
``block_size`` long so the batch shapes are static without bucketing.

Formats:
  ``{prefix}.bin``  raw int32 tokens, every sentence eos-terminated
  ``{prefix}.idx``  npz: magic, version, offsets (int64 [N+1] into .bin)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, List, Optional

import numpy as np

from espresso_tpu.data.dataset import BatchSpec

MAGIC = "ESPTPU-IDX"
VERSION = 1


def write_binarized(prefix: str, token_seqs: Iterable[np.ndarray]) -> int:
    """Stream token sequences to {prefix}.bin/.idx; returns #sentences.

    Constant memory in corpus size: tokens are appended to the .bin file as
    they arrive; only the int64 offset list stays in RAM."""
    offsets = [0]
    total = 0
    with open(prefix + ".bin", "wb") as f:
        for seq in token_seqs:
            arr = np.asarray(seq, dtype="<i4")
            f.write(arr.tobytes())
            total += len(arr)
            offsets.append(total)
    np.savez(
        prefix + ".idx",
        magic=MAGIC,
        version=VERSION,
        offsets=np.asarray(offsets, dtype=np.int64),
    )
    # np.savez appends .npz — keep the documented extension
    os.replace(prefix + ".idx.npz", prefix + ".idx")
    return len(offsets) - 1


class MMapTokenDataset:
    """Memory-mapped flat token stream with sentence offsets."""

    def __init__(self, prefix: str):
        with open(prefix + ".idx", "rb") as f:
            idx = np.load(f)
            assert str(idx["magic"]) == MAGIC, prefix
            self.offsets = idx["offsets"]
        self.tokens = np.memmap(prefix + ".bin", dtype="<i4", mode="r")
        assert len(self.tokens) == int(self.offsets[-1]), (
            len(self.tokens),
            int(self.offsets[-1]),
        )

    def __len__(self) -> int:
        return len(self.offsets) - 1

    @property
    def sizes(self) -> np.ndarray:
        return (self.offsets[1:] - self.offsets[:-1]).astype(np.int64)

    @property
    def total_tokens(self) -> int:
        return int(self.offsets[-1])

    def sentence(self, i: int) -> np.ndarray:
        return np.asarray(
            self.tokens[int(self.offsets[i]) : int(self.offsets[i + 1])]
        )


def token_block_slices(
    sizes: np.ndarray, block_size: int, break_mode: str = "none"
) -> np.ndarray:
    """[num_blocks, 2] (start, end) slices into the flat token stream.

    Reference semantics (token_block_utils_fast.pyx):
      ``none``      fixed ``block_size`` slices ignoring sentence bounds
      ``complete``  greedy whole-sentence packing up to ``block_size``
                    (an oversized sentence becomes its own block)
      ``eos``       one sentence per block
    (``complete_doc`` needs document boundaries espresso recipes don't
    produce; unsupported.)"""
    sizes = np.asarray(sizes, dtype=np.int64)
    total = int(sizes.sum())
    if break_mode == "none":
        assert block_size > 0
        starts = np.arange(0, total, block_size, dtype=np.int64)
        ends = np.minimum(starts + block_size, total)
        return np.stack([starts, ends], axis=1)
    if break_mode == "eos":
        ends = np.cumsum(sizes)
        starts = ends - sizes
        return np.stack([starts, ends], axis=1)
    if break_mode == "complete":
        assert block_size > 0
        slices: List[List[int]] = []
        cur_start = 0
        cur_len = 0
        pos = 0
        for sz in sizes:
            sz = int(sz)
            if cur_len > 0 and cur_len + sz > block_size:
                slices.append([cur_start, cur_start + cur_len])
                cur_start = pos
                cur_len = 0
            cur_len += sz
            pos += sz
        if cur_len > 0:
            slices.append([cur_start, cur_start + cur_len])
        return np.asarray(slices, dtype=np.int64).reshape(-1, 2)
    raise ValueError(f"unknown break_mode {break_mode!r}")


class LMBlockDataset:
    """Token-block LM dataset over an mmap stream (LMTextDataset interface).

    ``prev_output_tokens`` for a block [s, e) is the stream at [s-1, e-1)
    (eos for the very first position) — context flows across block
    boundaries exactly like the reference TokenBlockDataset's
    ``include_targets`` source (fairseq/data/token_block_dataset.py)."""

    def __init__(
        self,
        prefix: str,
        dictionary,
        block_size: int = 512,
        break_mode: str = "none",
    ):
        self.dict = dictionary
        self.data = MMapTokenDataset(prefix)
        self.block_size = block_size
        self.break_mode = break_mode
        self.slices = token_block_slices(
            self.data.sizes, block_size, break_mode
        )
        self.src_sizes = (self.slices[:, 1] - self.slices[:, 0]).astype(
            np.int64
        )
        self.tgt_sizes = self.src_sizes

    def __len__(self) -> int:
        return len(self.slices)

    def make_batch_specs(
        self,
        max_tokens: Optional[int],
        max_sentences: Optional[int],
        num_buckets: int = 5,
        required_batch_size_multiple: int = 8,
        max_source_positions: int = 1024,
        max_target_positions: int = 1024,
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

        if shuffle:
            rng = np.random.default_rng([seed, epoch])
            indices = rng.permutation(len(self))
        else:
            indices = np.arange(len(self))
        indices = indices[np.argsort(self.src_sizes[indices], kind="stable")]
        indices, _ = filter_by_size(
            indices, self.src_sizes, max_source_positions
        )
        # "none" blocks are all block_size long -> one bucket, one XLA shape
        sizes = quantile_buckets(
            self.src_sizes[indices], min(num_buckets, max(len(indices), 1))
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

    def collate(self, spec: BatchSpec, epoch: int = 1) -> Dict[str, Any]:
        B = len(spec.indices)
        U = spec.tgt_bucket
        pad, eos = self.dict.pad(), self.dict.eos()
        target = np.full((B, U), pad, dtype=np.int32)
        prev = np.full((B, U), pad, dtype=np.int32)
        tgt_lengths = np.zeros(B, dtype=np.int32)
        toks = self.data.tokens
        for row, idx in enumerate(spec.indices):
            s, e = (int(x) for x in self.slices[int(idx)])
            e = min(e, s + U)
            n = e - s
            target[row, :n] = toks[s:e]
            if s == 0:
                prev[row, 0] = eos
                prev[row, 1:n] = toks[: e - 1]
            else:
                prev[row, :n] = toks[s - 1 : e - 1]
            tgt_lengths[row] = n
        weight = (np.arange(B) < spec.num_real).astype(np.float32)
        return {
            "utt_ids": [str(int(i)) for i in spec.indices],
            "target": target,
            "prev_output_tokens": prev,
            "tgt_lengths": tgt_lengths,
            "src_lengths": tgt_lengths.copy(),
            "weight": weight,
            "ntokens": int((tgt_lengths * weight).sum()),
            "nsentences": spec.num_real,
        }

    def collate_group(self, group: List[BatchSpec], epoch: int = 1):
        parts = [self.collate(s, epoch) for s in group]
        out: Dict[str, Any] = {}
        for key in (
            "target",
            "prev_output_tokens",
            "tgt_lengths",
            "src_lengths",
            "weight",
        ):
            out[key] = np.stack([p[key] for p in parts])
        out["utt_ids"] = [p["utt_ids"] for p in parts]
        out["ntokens"] = sum(p["ntokens"] for p in parts)
        out["nsentences"] = sum(p["nsentences"] for p in parts)
        return out
