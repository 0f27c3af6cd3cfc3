import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.train import losses as L
from dicttts_tpu.utils.checkpoint import (
    get_all_ckpts,
    get_last_checkpoint,
    load_partial,
    restore_checkpoint,
    save_checkpoint,
)
from dicttts_tpu.utils.schedulers import rsqrt_schedule, step_decay_schedule


def test_parse_mel_loss_spec():
    assert L.parse_mel_loss_spec("l1:0.5|ssim:0.5") == {"l1": 0.5, "ssim": 0.5}
    assert L.parse_mel_loss_spec("mse") == {"mse": 1.0}


def test_masked_l1_ignores_pad_frames():
    target = jnp.zeros((1, 4, 3)).at[0, :2].set(1.0)
    pred = jnp.zeros((1, 4, 3)).at[0, :2].set(2.0).at[0, 2:].set(99.0)
    # only the first 2 frames count (nonzero target)
    assert float(L.masked_l1(pred, target)) == 1.0


def test_ssim_identical_is_zero():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 80).astype(np.float32) + 0.1)
    assert float(L.ssim_loss(x, x)) < 1e-5
    y = x + jnp.asarray(np.random.RandomState(1).randn(2, 32, 80).astype(np.float32))
    assert float(L.ssim_loss(y, x)) > 0.01


def test_ssim_banded_matmul_matches_conv2d():
    """The MXU-friendly SSIM blur (banded Toeplitz matmuls) must be an
    exact transform of the SAME-padded single-channel 11x11 conv2d."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.rand(2, 37, 80).astype(np.float32) * 8.0)
    x2 = jnp.asarray(rng.rand(2, 37, 80).astype(np.float32) * 8.0)

    win = jnp.asarray(L._gaussian_window(11))[:, :, None, None]

    def conv2d(x):
        return jax.lax.conv_general_dilated(
            x[:, :, :, None], win, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, :, :, 0]

    def ssim_map_conv2d(img1, img2):
        mu1, mu2 = conv2d(img1), conv2d(img2)
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = conv2d(img1 * img1) - mu1_sq
        s2 = conv2d(img2 * img2) - mu2_sq
        s12 = conv2d(img1 * img2) - mu12
        C1, C2 = 0.01**2, 0.03**2
        return ((2 * mu12 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
        )

    got = np.asarray(L._ssim_map(x1, x2))
    want = np.asarray(ssim_map_conv2d(x1, x2))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_word_dur_loss_zero_for_exact():
    mel2word = jnp.array([[1, 1, 2, 2, 2, 0]])
    # dur_gt = [2, 3]; log scale target = log(dur+1)
    dur_pred = jnp.log(jnp.array([[2.0, 3.0]]) + 1.0)
    loss = L.word_dur_loss(dur_pred, mel2word, jnp.array([2]))
    assert float(loss) < 1e-6


def test_lsgan_losses():
    ones = jnp.ones((2, 3))
    zeros = jnp.zeros((2, 3))
    assert float(L.lsgan_g_loss(ones)) == 0.0
    assert float(L.lsgan_d_loss(ones, zeros)) == 0.0
    assert float(L.lsgan_d_loss(zeros, ones)) == 2.0


def test_clamp_kl():
    np.testing.assert_allclose(float(L.clamp_kl(jnp.asarray(0.0001))), 0.002, rtol=1e-5)
    assert float(L.clamp_kl(jnp.asarray(1.0))) == 1.0


def test_rsqrt_schedule_shape():
    s = rsqrt_schedule(lr=1.0, warmup_updates=100, hidden_size=256)
    # linear warmup then rsqrt decay
    assert float(s(50)) < float(s(100))
    np.testing.assert_allclose(float(s(100)), 1.0 * 100**-0.5 * 256**-0.5, rtol=1e-5)
    np.testing.assert_allclose(float(s(400)), float(s(100)) / 2, rtol=1e-5)  # step^-0.5
    assert float(s(0)) >= 1e-7


def test_step_decay_schedule():
    s = step_decay_schedule(1e-4, step_size=100, gamma=0.5)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 5e-5, rtol=1e-5)
    np.testing.assert_allclose(float(s(250)), 2.5e-5, rtol=1e-5)


def _toy_state(val=1.0):
    return {
        "params_g": {"dense": {"kernel": np.full((3, 3), val, np.float32)}},
        "step": np.int32(0),
    }


def test_checkpoint_save_rotate_best(tmp_path):
    wd = str(tmp_path)
    for step, best in [(10, True), (20, False), (30, False), (40, True)]:
        save_checkpoint(wd, step, _toy_state(step), keep=2, is_best=best)
    ckpts = get_all_ckpts(wd)
    assert [c.split("_")[-1] for c in ckpts] == ["40.ckpt", "30.ckpt"]  # rotated
    assert get_last_checkpoint(wd).endswith("40.ckpt")
    step, state = restore_checkpoint(get_last_checkpoint(wd), _toy_state())
    assert step == 40
    np.testing.assert_allclose(state["params_g"]["dense"]["kernel"], 40.0)
    # best file survives rotation
    import os

    assert os.path.exists(os.path.join(wd, "model_ckpt_best.ckpt"))


def test_load_partial_shape_tolerant(tmp_path):
    wd = str(tmp_path)
    save_checkpoint(wd, 1, _toy_state(7.0), keep=1)
    target = {
        "dense": {"kernel": np.zeros((3, 3), np.float32)},
        "extra": {"kernel": np.zeros((2,), np.float32)},
    }
    loaded, skipped = load_partial(get_last_checkpoint(wd), target)
    np.testing.assert_allclose(loaded["dense"]["kernel"], 7.0)  # matched, loaded
    np.testing.assert_allclose(loaded["extra"]["kernel"], 0.0)  # missing, kept
    assert any("extra" in s for s in skipped)
