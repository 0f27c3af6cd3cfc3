import numpy as np
import pytest

from dicttts_tpu.data.recordio import (
    RecordReader,
    RecordWriter,
    convert_indexed_dataset,
    decode_record,
    encode_record,
    native_lib,
)
from dicttts_tpu.utils.indexed_dataset import IndexedDatasetBuilder


def _items(n=10, seed=0):
    rng = np.random.RandomState(seed)
    return [
        {
            "mel": rng.randn(rng.randint(5, 30), 80).astype(np.float32),
            "phone": rng.randint(0, 50, size=rng.randint(3, 12)).astype(np.int64),
            "item_name": f"it{i:03d}",
            "sec": float(i) * 0.5,
        }
        for i in range(n)
    ]


def test_encode_decode_roundtrip():
    it = _items(1)[0]
    rec = decode_record(memoryview(encode_record(it)))
    np.testing.assert_array_equal(rec["mel"], it["mel"])
    np.testing.assert_array_equal(rec["phone"], it["phone"])
    assert rec["item_name"] == it["item_name"] and rec["sec"] == it["sec"]


@pytest.mark.parametrize("use_native", [False, True])
def test_reader_roundtrip(tmp_path, use_native):
    if use_native and native_lib() is None:
        pytest.skip("librecordio.so not built")
    path = str(tmp_path / "corpus")
    items = _items(12)
    with RecordWriter(path) as w:
        for it in items:
            w.add(it)
    r = RecordReader(path, use_native=use_native)
    assert r.is_native == use_native
    assert len(r) == 12
    for i in [0, 7, 3, 11]:
        got = r[i]
        np.testing.assert_array_equal(got["mel"], items[i]["mel"])
        assert got["item_name"] == items[i]["item_name"]
    r.prefetch([1, 2, 3])  # no-op on fallback; async touch on native
    got = r[2]
    np.testing.assert_array_equal(got["phone"], items[2]["phone"])
    r.close()


def test_reader_out_of_range(tmp_path):
    path = str(tmp_path / "c")
    with RecordWriter(path) as w:
        w.add(_items(1)[0])
    r = RecordReader(path, use_native=False)
    with pytest.raises(IndexError):
        r[5]


def test_convert_indexed_dataset(tmp_path):
    src = str(tmp_path / "legacy")
    items = _items(5, seed=3)
    with IndexedDatasetBuilder(src) as b:
        for it in items:
            b.add_item(it)
    dst = str(tmp_path / "fast")
    n = convert_indexed_dataset(src, dst)
    assert n == 5
    r = RecordReader(dst)
    np.testing.assert_array_equal(r[4]["mel"], items[4]["mel"])


def test_tts_dataset_recordio_backend(tmp_path):
    """TTSBinaryDataset prefers a .rio corpus and yields identical items."""
    from dicttts_tpu.data.datasets import TTSBinaryDataset
    from dicttts_tpu.utils.indexed_dataset import IndexedDatasetBuilder

    rng = np.random.RandomState(0)
    items = []
    for i in range(4):
        T = 12 + i
        items.append({
            "item_name": f"i{i}",
            "txt": "x",
            "phone": rng.randint(3, 9, size=6).astype(np.int64),
            "mel": rng.randn(T, 80).astype(np.float32),
        })
    src = str(tmp_path / "train")
    with IndexedDatasetBuilder(src) as b:
        for it in items:
            b.add_item(it)
    np.save(str(tmp_path / "train_lengths.npy"), np.asarray([len(i["mel"]) for i in items]))
    cfg = {"max_frames": 64, "use_pitch_embed": False}
    ds_pickle = TTSBinaryDataset(str(tmp_path), "train", cfg, kind="base")
    convert_indexed_dataset(src, src)
    ds_rio = TTSBinaryDataset(str(tmp_path), "train", cfg, kind="base")
    assert ds_rio.ds.__class__.__name__ == "RecordReader"
    for i in range(4):
        np.testing.assert_array_equal(ds_rio[i]["mels"], ds_pickle[i]["mels"])
        np.testing.assert_array_equal(ds_rio[i]["txt_tokens"], ds_pickle[i]["txt_tokens"])
