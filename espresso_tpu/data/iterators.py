"""Checkpointable epoch batch iterators with background prefetch.

Rebuild of fairseq/data/iterators.py semantics (CountingIterator:28,
EpochBatchIterator:264 incl. state_dict resume :441, GroupedIterator:573 for
update_freq, ShardedIterator:623, BufferedIterator:691) as a small
thread-based pipeline (this framework loads per-host shards; device placement
is done by the trainer via jax.device_put / make_array_from_process_local_data).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np


class CountingIterator:
    """Iterator wrapper counting elements consumed (fairseq iterators.py:28)."""

    def __init__(self, iterable: Iterable, start: int = 0, total: Optional[int] = None):
        self._itr = iter(iterable)
        self.n = start
        self.total = total if total is not None else start + _maybe_len(iterable)

    def __len__(self) -> int:
        return self.total

    def __iter__(self):
        return self

    def __next__(self):
        if self.n >= self.total:
            raise StopIteration
        try:
            x = next(self._itr)
        except StopIteration:
            raise IndexError(
                f"iterator expected {self.total} items but ran out at {self.n}"
            )
        self.n += 1
        return x

    def has_next(self) -> bool:
        return self.n < self.total

    def skip(self, n: int) -> "CountingIterator":
        for _ in range(n):
            next(self)
        return self


def _maybe_len(x) -> int:
    try:
        return len(x)
    except TypeError:
        return 0


class GroupedIterator(CountingIterator):
    """Yields lists of ``chunk_size`` elements (update_freq microbatching)."""

    def __init__(self, iterable, chunk_size: int, skip_remainder_batch: bool = False):
        self.chunk_size = chunk_size
        inner_len = _maybe_len(iterable)
        if skip_remainder_batch:
            total = inner_len // chunk_size
        else:
            total = -(-inner_len // chunk_size)
        self._inner = iter(iterable)
        self.n = 0
        self.total = total
        self.skip_remainder_batch = skip_remainder_batch

    def __next__(self):
        if self.n >= self.total:
            raise StopIteration
        chunk = []
        for _ in range(self.chunk_size):
            try:
                chunk.append(next(self._inner))
            except StopIteration:
                break
        if not chunk:
            raise StopIteration
        self.n += 1
        return chunk


class BufferedIterator:
    """Background-thread prefetch (fairseq iterators.py:691, data_buffer_size)."""

    _SENTINEL = object()

    def __init__(self, iterable, buffer_size: int = 4):
        self._len = _maybe_len(iterable)
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(buffer_size, 1))
        self._exc: Optional[BaseException] = None

        def worker():
            try:
                for item in iterable:
                    self._queue.put(item)
            except BaseException as e:  # propagate into consumer
                self._exc = e
            finally:
                self._queue.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __len__(self):
        return self._len

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item


class EpochBatchIterator:
    """Epoch-aware, shardable, checkpointable batch iterator.

    Parameters
    ----------
    make_batches:
        ``fn(epoch: int) -> List[batch_spec]`` — (re)computes the batch list
        for an epoch (bucketed fixed-shape specs from batching.bucket_batches).
        Recomputed per epoch so shuffling/transform seeds follow the epoch
        (reference iterators.py:264 + espresso per-epoch seeding).
    collate:
        ``fn(batch_spec, epoch: int) -> pytree`` — materializes one batch.
    """

    def __init__(
        self,
        make_batches: Callable[[int], List[Any]],
        collate: Callable[[Any, int], Any],
        seed: int = 1,
        num_shards: int = 1,
        shard_id: int = 0,
        buffer_size: int = 4,
        shuffle: bool = True,
        epoch: int = 1,
    ):
        self.make_batches = make_batches
        self.collate = collate
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.buffer_size = buffer_size
        self.shuffle = shuffle
        self.epoch = max(epoch, 1)
        self._cur_iterator: Optional[CountingIterator] = None
        self._iterations_consumed_on_load = 0
        self._started = False

    # -- epoch control ------------------------------------------------------
    @property
    def next_epoch_idx(self) -> int:
        if self._iterations_consumed_on_load > 0:
            return self.epoch  # mid-epoch resume stays on the loaded epoch
        if self._cur_iterator is not None and not self._cur_iterator.has_next():
            return self.epoch + 1
        if self._cur_iterator is None and self._started:
            return self.epoch + 1
        return self.epoch

    def next_epoch_itr(self, shuffle: Optional[bool] = None) -> CountingIterator:
        self.epoch = self.next_epoch_idx
        self._started = True
        if shuffle is not None:
            self.shuffle = shuffle
        batches = self._sharded_batches(self.epoch)
        skip = self._iterations_consumed_on_load
        self._iterations_consumed_on_load = 0
        epoch = self.epoch

        def gen() -> Iterator[Any]:
            for i, spec in enumerate(batches):
                if i < skip:
                    continue
                yield self.collate(spec, epoch)

        total = len(batches)
        inner: Iterable = gen()
        if self.buffer_size > 0:
            inner = BufferedIterator(inner, self.buffer_size)
        self._cur_iterator = CountingIterator(inner, start=skip, total=total)
        return self._cur_iterator

    def _sharded_batches(self, epoch: int) -> List[Any]:
        batches = self.make_batches(epoch)
        if self.shuffle:
            rng = np.random.default_rng([self.seed, epoch])
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        # shard across hosts, padding so every shard sees the same count
        n = len(batches)
        per = -(-n // self.num_shards)
        sharded = [
            batches[(i * self.num_shards + self.shard_id) % n]
            for i in range(per)
        ]
        return sharded

    # -- checkpointing -------------------------------------------------------
    def state_dict(self) -> Dict[str, Any]:
        if self._cur_iterator is not None and self._cur_iterator.has_next():
            return {
                "epoch": self.epoch,
                "iterations_in_epoch": self._cur_iterator.n,
                "shuffle": self.shuffle,
            }
        return {
            "epoch": self.next_epoch_idx,
            "iterations_in_epoch": 0,
            "shuffle": self.shuffle,
        }

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        """Restore position: next_epoch_itr() resumes the saved epoch, skipping
        the already-consumed batches (reference iterators.py:441 semantics)."""
        self.epoch = int(state.get("epoch", 1))
        self.shuffle = bool(state.get("shuffle", True))
        self._iterations_consumed_on_load = int(state.get("iterations_in_epoch", 0))
        self._cur_iterator = None
        self._started = False

    @property
    def iterations_in_epoch(self) -> int:
        return self._cur_iterator.n if self._cur_iterator is not None else 0
