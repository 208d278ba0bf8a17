import os

import numpy as np
import pytest

from espresso_tpu.data import kaldi_io
from espresso_tpu.data.batching import (
    batch_by_size,
    bucket_batches,
    quantile_buckets,
    filter_by_size,
)
from espresso_tpu.data.dataset import AsrDataset
from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.data.encoders import CharactersAsr
from espresso_tpu.data.iterators import (
    CountingIterator,
    EpochBatchIterator,
    GroupedIterator,
)
from espresso_tpu.data.manifest import load_manifest

from tests.utils import make_corpus


def test_kaldi_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "x.ark")
    m1 = rng.standard_normal((17, 13)).astype(np.float32)
    m2 = rng.standard_normal((5, 13)).astype(np.float32)
    with open(p, "wb") as f:
        f.write(b"utt1 ")
        off1 = f.tell()
        kaldi_io.write_mat(f, m1)
        f.write(b"utt2 ")
        off2 = f.tell()
        kaldi_io.write_mat(f, m2)
    got = dict(kaldi_io.read_mat_ark(p))
    assert np.allclose(got["utt1"], m1)
    assert np.allclose(got["utt2"], m2)
    assert np.allclose(kaldi_io.read_mat(f"{p}:{off2}"), m2)
    assert np.allclose(kaldi_io.read_mat(f"{p}:{off1}"), m1)


def test_kaldi_io_vectors(tmp_path):
    p = str(tmp_path / "v.ark")
    v = np.arange(7, dtype=np.float32)
    kaldi_io.write_vec_flt(p, v)
    assert np.allclose(kaldi_io.read_vec_flt(p), v)


def test_dictionary(tmp_path):
    p = str(tmp_path / "dict.txt")
    with open(p, "w") as f:
        f.write("<space> 10\na 5\nb 3\n")
    d = AsrDictionary.load(p)
    assert d.pad() == 0 and d.eos() == 1 and d.unk() == 2
    assert d.index("a") == 4
    assert d.index("zzz") == d.unk()
    assert d.space() == 3
    ids = d.encode_line("a b a")
    assert list(ids) == [4, 5, 4, d.eos()]
    assert d.string(ids) == "a b a"
    # blank=bos for CTC/transducer
    d2 = AsrDictionary.load(p, enable_bos=True)
    assert d2.blank() == d2.bos() == 0
    assert d2.pad() == 1


def test_characters_asr_tokenizer():
    tok = CharactersAsr()
    enc = tok.encode("HELLO WORLD")
    assert enc == "H E L L O <space> W O R L D <space>"
    assert tok.decode(enc) == "HELLO WORLD"


def test_batch_by_size():
    lengths = np.array([10, 10, 10, 20, 20, 40])
    idx = np.arange(6)
    batches = batch_by_size(idx, lengths, max_tokens=40)
    covered = np.concatenate(batches)
    assert sorted(covered.tolist()) == list(range(6))
    for b in batches:
        assert len(b) * lengths[b].max() <= 40 or len(b) == 1


def test_bucket_batches_fixed_shapes():
    rng = np.random.default_rng(0)
    lengths = rng.integers(10, 100, size=50)
    idx = np.arange(50)
    sizes = quantile_buckets(lengths, 4)
    batches = bucket_batches(
        idx, lengths, sizes, max_tokens=200, required_batch_size_multiple=2
    )
    # every index covered exactly once among the real (non-pad) slots
    seen = []
    shapes = set()
    for chunk, blen in batches:
        shapes.add((len(chunk), blen))
        seen.extend(chunk.tolist())
        assert lengths[chunk].max() <= blen
    assert set(seen) == set(range(50))
    # bounded number of distinct shapes
    assert len(shapes) <= len(sizes)


def test_filter_by_size():
    lengths = np.array([5, 500, 20])
    kept, ignored = filter_by_size(np.arange(3), lengths, 100)
    assert kept.tolist() == [0, 2] and ignored == [1]


def test_grouped_and_counting_iterators():
    itr = CountingIterator(iter(range(10)), total=10)
    assert len(itr) == 10
    assert next(itr) == 0
    itr.skip(3)
    assert next(itr) == 4
    g = GroupedIterator(list(range(7)), 2)
    chunks = list(g)
    assert chunks == [[0, 1], [2, 3], [4, 5], [6]]


def test_epoch_batch_iterator_resume():
    def make_batches(epoch):
        return [f"e{epoch}b{i}" for i in range(6)]

    collate = lambda spec, epoch: spec
    itr = EpochBatchIterator(make_batches, collate, seed=3, buffer_size=0)
    ep1 = itr.next_epoch_itr()
    batches1 = [next(ep1) for _ in range(4)]
    state = itr.state_dict()
    assert state["epoch"] == 1 and state["iterations_in_epoch"] == 4

    itr2 = EpochBatchIterator(make_batches, collate, seed=3, buffer_size=0)
    itr2.load_state_dict(state)
    ep1b = itr2.next_epoch_itr()
    rest = list(ep1b)
    assert rest == list(ep1)  # same remaining batches in same order
    # next epoch advances
    ep2 = itr2.next_epoch_itr()
    assert itr2.epoch == 2
    assert len(list(ep2)) == 6


def test_manifest_and_dataset(tmp_path):
    root = str(tmp_path)
    json_path, dict_path = make_corpus(root, "train", num_utts=20, feat_dim=8)
    entries = load_manifest(root, "train")
    assert len(entries) == 20
    d = AsrDictionary.load(dict_path, enable_bos=True)
    tok = CharactersAsr()
    ds = AsrDataset(entries, d, feat_dim=8, tokenizer=tok)
    assert len(ds) == 20
    assert (ds.src_sizes > 0).all()
    assert (ds.tgt_sizes > 0).all()

    specs = ds.make_batch_specs(
        max_tokens=400,
        max_sentences=None,
        num_buckets=3,
        required_batch_size_multiple=2,
        shuffle=True,
        seed=1,
        epoch=1,
    )
    seen = set()
    for spec in specs:
        batch = ds.collate(spec)
        B, T, F = batch["src_frames"].shape
        assert T == spec.src_bucket and F == 8
        assert batch["target"].shape == (B, spec.tgt_bucket)
        assert batch["prev_output_tokens"].shape == (B, spec.tgt_bucket)
        # prev_output starts with eos (input feeding convention)
        real = batch["weight"] > 0
        assert (batch["prev_output_tokens"][real][:, 0] == d.eos()).all()
        # frames sorted by descending length
        sl = batch["src_lengths"]
        assert (np.diff(sl) <= 0).all()
        for uid, w in zip(batch["utt_ids"], batch["weight"]):
            if w > 0:
                seen.add(uid)
    assert len(seen) == 20


def test_dataset_feature_read_matches_ark(tmp_path):
    root = str(tmp_path)
    json_path, dict_path = make_corpus(root, "valid", num_utts=3, feat_dim=6)
    entries = load_manifest(root, "valid")
    d = AsrDictionary.load(dict_path)
    ds = AsrDataset(entries, d, feat_dim=6, tokenizer=CharactersAsr())
    mat = ds.get_features(0)
    ref = kaldi_io.read_mat(entries[0].audio)
    assert np.allclose(mat, ref)


def test_batch_by_size_native_matches_python():
    """clib/batching.cpp must match the pure-Python loop exactly on random
    inputs (fairseq data_utils_fast.pyx semantics)."""
    import espresso_tpu.data.batching as bt
    from espresso_tpu.clib import batching_lib

    assert batching_lib() is not None, "native batching failed to build"
    rng = np.random.default_rng(0)
    for trial in range(30):
        n = int(rng.integers(1, 500))
        sizes = rng.integers(1, 300, n)
        idx = np.argsort(sizes, kind="stable")
        mt = [None, int(rng.integers(100, 3000))][trial % 2]
        ms = [None, int(rng.integers(1, 32))][(trial // 2) % 2]
        mult = int(rng.choice([1, 2, 8]))
        native = bt.batch_by_size(idx, sizes[idx], mt, ms, mult)
        # force the python path by monkeypatching the lib away
        import espresso_tpu.clib as clib

        saved = clib._cache.get("batching")
        clib._cache["batching"] = None
        try:
            ref = bt.batch_by_size(idx, sizes[idx], mt, ms, mult)
        finally:
            clib._cache["batching"] = saved
        assert len(native) == len(ref), (trial, len(native), len(ref))
        for a, b in zip(native, ref):
            assert np.array_equal(a, b), trial


def _batches_with_workers(root, num_workers, backend="thread", epoch_count=2):
    """All batches of epoch 1..epoch_count through EpochBatchIterator."""
    from espresso_tpu.data.encoders import CharactersAsr

    entries = load_manifest(root, "train")
    dic = AsrDictionary.load(os.path.join(root, "dict.txt"), enable_bos=True)
    ds = AsrDataset(
        entries,
        dic,
        feat_dim=13,
        feature_type="fbank",
        tokenizer=CharactersAsr(),
        speed_perturb_rates=[0.9, 1.0, 1.1],
        transforms_seed=7,
        is_train=True,
    )
    specs_fn = lambda ep: ds.make_batch_specs(
        max_tokens=None, max_sentences=3, num_buckets=2, shuffle=True,
        seed=3, epoch=ep, required_batch_size_multiple=1,
    )
    itr = EpochBatchIterator(
        lambda ep: [[s] for s in specs_fn(ep)],
        ds.collate_group,
        seed=3,
        buffer_size=2,
        num_workers=num_workers,
        worker_backend=backend,
    )
    out = []
    for _ in range(epoch_count):
        for batch in itr.next_epoch_itr():
            out.append(batch)
    return out


def test_parallel_workers_deterministic(tmp_path):
    """Worker-parallel collate must produce byte-identical batches in
    identical order vs the serial path, across epochs, including the
    stochastic speed-perturb transform (per-(seed,epoch,index) RNG —
    reference feat_text_dataset.py:151-153 determinism contract)."""
    from tests.test_device_features import make_wave_corpus

    root = str(tmp_path)
    make_wave_corpus(root, "train", num_utts=10, seed=1)
    serial = _batches_with_workers(root, 0)
    assert len(serial) > 2
    for backend in ("thread", "process"):
        par = _batches_with_workers(root, 2, backend=backend)
        assert len(par) == len(serial)
        for a, b in zip(serial, par):
            assert a["utt_ids"] == b["utt_ids"], backend
            for k in ("src_frames", "src_lengths", "target",
                      "prev_output_tokens", "weight"):
                assert np.array_equal(a[k], b[k]), (backend, k)


def test_parallel_workers_error_propagates(tmp_path):
    """A collate exception in a worker must surface to the consumer."""
    from espresso_tpu.data.iterators import parallel_collate_iter

    def boom(spec, epoch):
        if spec == 3:
            raise RuntimeError("bad spec")
        return spec * 10

    it = parallel_collate_iter(boom, [1, 2, 3, 4], 1, num_workers=2,
                               backend="thread")
    got = [next(it), next(it)]
    assert got == [10, 20]
    with pytest.raises(RuntimeError, match="bad spec"):
        list(it)
