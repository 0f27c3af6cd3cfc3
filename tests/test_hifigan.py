import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.models.hifigan import (
    HifiGanGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_adv_loss,
    generator_adv_loss,
)
from dicttts_tpu.train.stft_loss import multi_resolution_stft_loss
from dicttts_tpu.vocoders import get_vocoder_cls
from dicttts_tpu.vocoders.hifigan import HifiGanVocoder, load_wav, save_wav

TINY_GEN = dict(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),),
)


def test_generator_upsamples_hop_256():
    gen = HifiGanGenerator(**TINY_GEN)
    mel = jnp.zeros((1, 12, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (1, 12 * 256)  # prod(8,8,2,2) = 256 = hop
    assert np.abs(np.asarray(wav)).max() <= 1.0  # tanh bounded


def test_mpd_msd_shapes():
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 2048).astype(np.float32) * 0.1)
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    p = mpd.init(jax.random.PRNGKey(0), wav)
    scores, fmaps = mpd.apply(p, wav)
    assert len(scores) == 2 and all(s.shape[0] == 2 for s in scores)
    msd = MultiScaleDiscriminator(n_scales=2)
    p = msd.init(jax.random.PRNGKey(1), wav)
    scores, fmaps = msd.apply(p, wav)
    assert len(scores) == 2


def test_lsgan_vocoder_losses():
    ones = [jnp.ones((2, 5))]
    zeros = [jnp.zeros((2, 5))]
    assert float(generator_adv_loss(ones)) == 0.0
    assert float(discriminator_adv_loss(ones, zeros)) == 0.0


def test_multi_res_stft_loss_zero_for_identical():
    wav = jnp.asarray(np.random.RandomState(1).randn(1, 4096).astype(np.float32))
    sc, mag = multi_resolution_stft_loss(wav, wav, resolutions=((512, 128, 512),))
    assert float(sc) < 1e-6 and float(mag) < 1e-6
    sc2, _ = multi_resolution_stft_loss(wav, wav * 0.5, resolutions=((512, 128, 512),))
    assert float(sc2) > 0.1


def test_vocoder_registry():
    assert get_vocoder_cls("HifiGanVocoder") is HifiGanVocoder
    assert get_vocoder_cls("hifiganvocoder") is HifiGanVocoder
    assert get_vocoder_cls("dicttts_tpu.vocoders.hifigan.HifiGanVocoder") is HifiGanVocoder


def test_vocoder_spec2wav_and_wav_io(tmp_path):
    cfg = {"hop_size": 256, **{k: v for k, v in TINY_GEN.items() if k != "resblock_dilation_sizes"}}
    voc = HifiGanVocoder(cfg)  # random params (no ckpt dir)
    mel = np.random.RandomState(0).randn(10, 80).astype(np.float32)
    wav = voc.spec2wav(mel)
    assert wav.shape == (10 * 256,)
    path = str(tmp_path / "o.wav")
    save_wav(path, wav)
    back, sr = load_wav(path)
    assert sr == 22050 and len(back) == len(wav)
    np.testing.assert_allclose(back, np.clip(wav, -1, 1), atol=1e-4)


def test_wav2spec_formula():
    cfg = {"audio_sample_rate": 22050, "fft_size": 1024, "hop_size": 256, "win_size": 1024,
           "audio_num_mel_bins": 80, "fmin": 80, "fmax": 7600}
    wav_in = np.random.RandomState(2).randn(22050).astype(np.float32) * 0.1
    wav, mel = HifiGanVocoder.wav2spec(wav_in, cfg)
    assert mel.shape[1] == 80
    assert len(wav) == mel.shape[0] * 256  # exact frame alignment


def test_upsample_conv_matches_conv_transpose():
    """Subpixel upsampling must be numerically identical to the cropped
    VALID transposed conv it replaces."""
    import flax.linen as nn
    from dicttts_tpu.models.hifigan import UpsampleConv

    k, s, Cin, Cout, T = 16, 8, 12, 6, 10
    up = UpsampleConv(Cout, k, s)
    x = jnp.asarray(np.random.RandomState(0).randn(2, T, Cin).astype(np.float32))
    params = up.init(jax.random.PRNGKey(0), x)
    y_sub = up.apply(params, x)
    ct = nn.ConvTranspose(Cout, (k,), strides=(s,), padding="VALID")
    ct_params = {"params": {"kernel": params["params"]["kernel"],
                            "bias": params["params"]["bias"]}}
    y_ref = ct.apply(ct_params, x)
    crop = (k - s) // 2
    y_ref = y_ref[:, crop:-crop]
    assert y_sub.shape == y_ref.shape == (2, T * s, Cout)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_ref), atol=2e-5)


def test_upsample_conv_odd_ratio():
    from dicttts_tpu.models.hifigan import UpsampleConv

    for k, s in [(4, 2), (16, 16), (9, 3)]:
        up = UpsampleConv(4, k, s)
        x = jnp.ones((1, 6, 3))
        params = up.init(jax.random.PRNGKey(1), x)
        y = up.apply(params, x)
        assert y.shape == (1, 6 * s, 4), (k, s, y.shape)


def test_fold_lanes_exact_equivalence():
    """Generator with lane folding must produce identical wavs to unfolded."""
    from dicttts_tpu.models.hifigan import HifiGanGenerator

    kw = dict(
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=64,  # stages: 32, 16, 8, 4 -> folds engage
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    )
    g_fold = HifiGanGenerator(fold_lanes=True, lane_width=32, **kw)
    g_plain = HifiGanGenerator(fold_lanes=False, **kw)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 16, 80).astype(np.float32))
    params = g_fold.init(jax.random.PRNGKey(0), mel)
    y1 = g_fold.apply(params, mel)
    y2 = g_plain.apply(params, mel)  # same param tree
    assert y1.shape == y2.shape == (2, 16 * 64)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-6)


def test_bf16_inference_close_to_f32():
    """vocoder_infer_dtype='bfloat16' (serving fast path) must track the f32
    output within a small fraction of the signal rms, and share weights
    (same init) with the f32 instance."""
    cfg = {"hop_size": 256, **{k: v for k, v in TINY_GEN.items() if k != "resblock_dilation_sizes"}}
    voc32 = HifiGanVocoder(cfg)
    voc16 = HifiGanVocoder({**cfg, "vocoder_infer_dtype": "bfloat16"}, params=voc32.params)
    mel = (np.random.RandomState(0).randn(24, 80) * 1.5 - 5.5).astype(np.float32)
    w32 = voc32.spec2wav(mel)
    w16 = voc16.spec2wav(mel)
    assert w16.dtype == np.float32 and w16.shape == w32.shape
    rms_sig = np.sqrt((w32**2).mean())
    rms_err = np.sqrt(((w16 - w32) ** 2).mean())
    assert rms_err < 0.05 * rms_sig, (rms_err, rms_sig)
