import numpy as np

from dicttts_tpu.data.collate import (
    batch_by_size,
    collate_1d,
    collate_2d,
    collate_nd,
    ordered_indices,
    shape_bucket,
)
from dicttts_tpu.utils.indexed_dataset import IndexedDataset, IndexedDatasetBuilder
from dicttts_tpu.utils.text_encoder import EOS_ID, PAD_ID, UNK_ID, TokenTextEncoder


def test_text_encoder_reserved_ids():
    enc = TokenTextEncoder(["a", "b", "|", "c"])
    assert enc.pad_index == PAD_ID == 0
    assert enc.eos_index == EOS_ID == 1
    assert enc.unk_index == UNK_ID == 2
    assert enc.encode("a b c") == [3, 4, 6]
    assert enc.decode(enc.encode("a | b")) == "a | b"
    assert enc.seg_index == enc.token_to_id["|"]
    assert enc.vocab_size == 7


def test_text_encoder_oov_and_strip():
    enc = TokenTextEncoder(["a", "b"], replace_oov="b")
    assert enc.encode("a zz") == [3, 4]
    assert enc.decode([3, 0, 0], strip_padding=True) == "a"
    assert enc.decode([3, 1, 4], strip_eos=True) == "a"


def test_indexed_dataset_roundtrip(tmp_path):
    path = str(tmp_path / "ds")
    items = [{"x": np.random.randn(7, 3), "name": f"it{i}"} for i in range(20)]
    with IndexedDatasetBuilder(path) as b:
        for it in items:
            b.add_item(it)
    ds = IndexedDataset(path, num_cache=2)
    assert len(ds) == 20
    for i in [0, 13, 5, 13, 19]:
        np.testing.assert_array_equal(ds[i]["x"], items[i]["x"])
        assert ds[i]["name"] == items[i]["name"]
    # binary format parity: .idx is a numpy dict {'offsets': [...]}
    idx = np.load(path + ".idx", allow_pickle=True).item()
    assert idx["offsets"][0] == 0 and len(idx["offsets"]) == 21


def test_collate_1d_2d():
    out = collate_1d([np.array([1, 2]), np.array([3])], pad_value=0)
    np.testing.assert_array_equal(out, [[1, 2], [3, 0]])
    out = collate_1d([np.array([1, 2])], max_len=4, shift_right=True, shift_id=9)
    np.testing.assert_array_equal(out, [[9, 1, 0, 0]])
    out2 = collate_2d([np.ones((2, 3)), np.ones((1, 3))], pad_value=-1)
    assert out2.shape == (2, 2, 3) and out2[1, 1, 0] == -1


def test_collate_nd_4d_dict_bank():
    # keys: [T_w, L_k, C] ragged in both leading axes
    a = np.ones((2, 3, 4))
    b = 2 * np.ones((3, 1, 4))
    out = collate_nd([a, b])
    assert out.shape == (2, 3, 3, 4)
    assert out[0, 0, 0, 0] == 1 and out[1, 2, 0, 0] == 2 and out[0, 2, 0, 0] == 0


def test_batch_by_size_token_budget():
    sizes = {i: s for i, s in enumerate([10, 10, 10, 50, 50, 100])}
    batches = batch_by_size(list(range(6)), lambda i: sizes[i], max_tokens=100)
    # budget = batch_size * longest
    for b in batches:
        longest = max(sizes[i] for i in b)
        assert len(b) * longest <= 100
    assert sorted(i for b in batches for i in b) == list(range(6))


def test_batch_by_size_multiple():
    batches = batch_by_size(list(range(10)), lambda i: 10, max_tokens=70, required_batch_size_multiple=2)
    assert all(len(b) % 2 == 0 or len(b) < 2 for b in batches[:-1])


def test_shape_bucket():
    assert shape_bucket(100, multiple=32) == 128
    assert shape_bucket(128, multiple=32) == 128
    assert shape_bucket(5, buckets=(64, 128, 256)) == 64
    assert shape_bucket(300, buckets=(64, 128, 256)) == 256


def test_ordered_indices_sorted_by_len():
    sizes = [5, 1, 3, 2, 4]
    order = ordered_indices(sizes, shuffle=True, sort_by_len=True, seed=0)
    assert [sizes[i] for i in order] == sorted(sizes)
    order2 = ordered_indices(sizes, shuffle=False)
    np.testing.assert_array_equal(order2, np.arange(5))
