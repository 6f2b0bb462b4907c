import numpy as np
import pytest

from diffsvc_tpu.data.batching import (batch_by_size, filter_divisible,
                                       ordered_indices, shard_batches)
from diffsvc_tpu.data.features import get_align_uniform
from diffsvc_tpu.data.indexed_datasets import (IndexedDataset,
                                               IndexedDatasetBuilder)


def test_indexed_dataset_roundtrip(tmp_path):
    path = str(tmp_path / "ds")
    rng = np.random.RandomState(0)
    items = [{"a": rng.normal(size=[100, 10]), "n": i} for i in range(20)]
    b = IndexedDatasetBuilder(path)
    for it in items:
        b.add_item(it)
    b.finalize()
    ds = IndexedDataset(path)
    assert len(ds) == 20
    for i in (0, 7, 19, 7):
        assert (ds[i]["a"] == items[i]["a"]).all()
        assert ds[i]["n"] == i
    with pytest.raises(IndexError):
        ds[20]


def test_indexed_dataset_reference_format(tmp_path):
    """The .idx file must be an npy dict {'offsets': [...]} (reference
    interchange format)."""
    path = str(tmp_path / "ds")
    b = IndexedDatasetBuilder(path)
    b.add_item({"x": 1})
    b.finalize()
    idx = np.load(path + ".idx", allow_pickle=True).item()
    assert "offsets" in idx and idx["offsets"][0] == 0


def test_get_align_uniform():
    mel2ph = get_align_uniform(10, 5)
    assert mel2ph.min() >= 1 and mel2ph.max() == 5
    assert len(mel2ph) == 10
    # monotone non-decreasing
    assert (np.diff(mel2ph) >= 0).all()


def test_ordered_indices_stable_sort():
    sizes = [5, 3, 5, 1, 3]
    rng = np.random.RandomState(0)
    idx = ordered_indices(sizes, shuffle=True, sort_by_len=True, rng=rng)
    got_sizes = [sizes[i] for i in idx]
    assert got_sizes == sorted(sizes)


def test_batch_by_size_token_budget():
    sizes = [10, 10, 10, 10, 10, 25, 25]
    batches = batch_by_size(list(range(7)), lambda i: sizes[i], max_tokens=30,
                            max_sentences=10)
    for b in batches:
        longest = max(sizes[i] for i in b)
        assert longest * len(b) <= 30 or len(b) == 1


def test_batch_by_size_max_sentences():
    batches = batch_by_size(list(range(10)), lambda i: 1, max_tokens=1000,
                            max_sentences=4)
    assert all(len(b) <= 4 for b in batches)
    assert sum(len(b) for b in batches) == 10


def test_shard_batches_rule():
    batches = [[0, 1, 2, 3], [4, 5, 6], [7, 8]]
    # indivisible batch [4,5,6] drops for world=2
    sharded0 = shard_batches(batches, 2, 0)
    sharded1 = shard_batches(batches, 2, 1)
    assert sharded0 == [[0, 2], [7]]
    assert sharded1 == [[1, 3], [8]]
    assert filter_divisible(batches, 2) == [[0, 1, 2, 3], [7, 8]]


def test_slicer_on_synthetic_audio():
    from diffsvc_tpu.infer.slicer import Slicer

    sr = 24000
    t = np.arange(sr * 12) / sr
    wav = 0.5 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
    wav[6 * sr: 7 * sr] = 0.0  # 1 s silence in the middle
    chunks = Slicer(sr=sr, db_threshold=-40).slice(wav)
    kinds = [v["slice"] for v in chunks.values()]
    assert True in kinds and False in kinds  # found both voiced + silence
    # split_time ranges must tile the audio in order
    spans = [tuple(map(int, v["split_time"].split(","))) for v in chunks.values()]
    assert spans[0][0] == 0
    assert spans[-1][1] == len(wav)
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c


def test_slicer_short_audio_passthrough():
    from diffsvc_tpu.infer.slicer import Slicer

    wav = np.zeros(1000, np.float32)
    chunks = Slicer(sr=24000).slice(wav)
    assert chunks == {"0": {"slice": False, "split_time": "0,1000"}}
