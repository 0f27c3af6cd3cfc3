import jax.numpy as jnp
import numpy as np

from dicttts_tpu.ops.seq import (
    build_word_mask,
    gather_expand,
    group_hidden_by_segs,
    intra_word_positions,
    length_regulate,
    masked_mean,
    mel2token_to_dur,
    pad_frames_multiple,
    scatter_sum_by_segs,
    sequence_mask,
)


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.array([2, 0, 3]), 4))
    np.testing.assert_array_equal(
        m, [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 0]]
    )


def test_length_regulate_basic():
    dur = jnp.array([[1, 2, 3, 0]])  # token4 is pad (dur 0)
    m2t = np.asarray(length_regulate(dur, 8))
    np.testing.assert_array_equal(m2t, [[1, 2, 2, 3, 3, 3, 0, 0]])


def test_length_regulate_zero_dur_token_skipped():
    dur = jnp.array([[2, 0, 1]])
    m2t = np.asarray(length_regulate(dur, 5))
    np.testing.assert_array_equal(m2t, [[1, 1, 3, 0, 0]])


def test_length_regulate_roundtrip_with_dur():
    rng = np.random.RandomState(0)
    dur = rng.randint(0, 4, size=(3, 6))
    m2t = length_regulate(jnp.array(dur), 32)
    back = np.asarray(mel2token_to_dur(m2t, 6))
    np.testing.assert_array_equal(back, dur)


def test_gather_expand_pads_zero():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2) + 1
    m2t = jnp.array([[1, 1, 3, 0]])
    out = np.asarray(gather_expand(x, m2t))
    np.testing.assert_array_equal(out[0, 0], [1, 2])
    np.testing.assert_array_equal(out[0, 2], [5, 6])
    np.testing.assert_array_equal(out[0, 3], [0, 0])


def test_group_hidden_by_segs_mean():
    h = jnp.array([[[2.0], [4.0], [6.0], [100.0]]])  # last is pad (seg 0)
    seg = jnp.array([[1, 1, 2, 0]])
    out = np.asarray(group_hidden_by_segs(h, seg, 3))
    np.testing.assert_allclose(out[0, :, 0], [3.0, 6.0, 0.0])


def test_scatter_sum_by_segs():
    v = jnp.array([[1.0, 2.0, 3.0, 9.0]])
    seg = jnp.array([[1, 1, 2, 0]])
    out = np.asarray(scatter_sum_by_segs(v, seg, 2))
    np.testing.assert_allclose(out, [[3.0, 3.0]])


def test_build_word_mask():
    m = np.asarray(build_word_mask(jnp.array([[1, 2]]), jnp.array([[1, 1, 2]])))
    np.testing.assert_array_equal(m[0], [[1, 1, 0], [0, 0, 1]])


def test_intra_word_positions():
    word2word = jnp.array([[1, 2]])
    x2word = jnp.array([[1, 1, 2, 0]])
    pos = np.asarray(intra_word_positions(word2word, x2word))
    np.testing.assert_allclose(pos[0], [0.5, 1.0, 1.0, 0.0])


def test_pad_frames_multiple_extends_last():
    m2t = jnp.array([[1, 2, 2, 0, 0, 0, 0, 0]])
    out = np.asarray(pad_frames_multiple(m2t, 4))
    np.testing.assert_array_equal(out, [[1, 2, 2, 2, 0, 0, 0, 0]])
    # already a multiple -> unchanged
    m2t2 = jnp.array([[1, 2, 2, 3, 0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(pad_frames_multiple(m2t2, 4)), np.asarray(m2t2))


def test_masked_mean():
    x = jnp.array([[1.0, 2.0], [3.0, 100.0]])
    mask = jnp.array([[1.0, 1.0], [1.0, 0.0]])
    assert float(masked_mean(x, mask)) == 2.0
