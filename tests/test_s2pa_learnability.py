"""The paper's core claim, in CI: S2PA learns pronunciation from glosses.

A toy corpus contains a heteronym H with two senses whose correct reading is
determined by the neighboring context character (A -> sense 1, B -> sense 2).
Supervision is mel-only (the sense-dependent mel pattern at H's frames), as
in the real model — pinyin is never a training target. After a few hundred
tiny-model steps the decoded pron_attn argmax must pick the context-correct
sense well above the 50% chance level (VERDICT round-1 next #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dicttts_tpu.train.tasks.dict_tts import DictTTSTask

E = 16  # dict embed dim
CTX_A, CTX_B, HET = 3, 4, 5
D_FRAMES = 4  # frames per word
TW = 2  # [ctx, H]
TM = TW * D_FRAMES


def _mel_pattern(seed, scale=1.0):
    rng = np.random.RandomState(seed)
    return (scale * rng.randn(80)).astype(np.float32)


ANCHOR_1, ANCHOR_2 = 6, 7  # single-reading chars sharing H's pinyin tokens


class HeteronymProvider:
    """Batches of [ctx, H] heteronym sentences plus anchor sentences.

    Two mechanisms under test, mirroring the real model:
    - context routing: BOTH context chars share one gloss vector, so the
      only route from the context identity (word tokens -> semantic encoder
      -> q) to the mel at H's frames is the S2PA attention over H's sense
      keys — the architecture has no word-token bypass into the linguistic
      encoder (x = context + pron, models/dict_encoder.py S2PATextEncoder);
    - polarity grounding: anchor chars X1/X2 have a single reading with the
      SAME pinyin tokens as H's senses and the matching mel pattern, so the
      pinyin embeddings tie readings to acoustics across the vocabulary
      (the tones-shared-across-chars mechanism) and "which sense is which"
      is not an arbitrary relabeling.
    """

    def __init__(self, batch_size=8, seed=0):
        rng = np.random.RandomState(seed)
        self.batch_size = batch_size
        self.u1 = rng.randn(E).astype(np.float32)
        self.u2 = rng.randn(E).astype(np.float32)
        shared = rng.randn(E).astype(np.float32)
        self.ctx_keys = {CTX_A: shared, CTX_B: shared}
        self.anchor_keys = {ANCHOR_1: rng.randn(E).astype(np.float32),
                            ANCHOR_2: rng.randn(E).astype(np.float32)}
        self.pat = {CTX_A: _mel_pattern(1), CTX_B: _mel_pattern(2),
                    "H1": _mel_pattern(3), "H2": _mel_pattern(4)}

    def _base(self, words):
        keys = np.zeros((TW, 4, E), np.float32)
        key_map = np.zeros((TW, 4), np.int32)
        pinyin = np.zeros((TW, 4), np.int32)
        pinyin_map = np.zeros((TW, 4), np.int32)
        mel2word = np.repeat(np.arange(1, TW + 1), D_FRAMES).astype(np.int32)
        mels = np.zeros((TM, 80), np.float32)
        return keys, key_map, pinyin, pinyin_map, mel2word, mels

    def _fill_single(self, keys, key_map, pinyin, pinyin_map, slot, vec, toks):
        keys[slot, :2] = vec
        key_map[slot, :2] = 1
        pinyin[slot, :2] = toks
        pinyin_map[slot, :2] = 1

    def _het_item(self, ctx):
        words = np.array([ctx, HET], np.int32)
        keys, key_map, pinyin, pinyin_map, mel2word, mels = self._base(words)
        self._fill_single(keys, key_map, pinyin, pinyin_map, 0, self.ctx_keys[ctx], [5, 6])
        keys[1, :2] = self.u1
        keys[1, 2:] = self.u2
        key_map[1] = [1, 1, 2, 2]
        pinyin[1] = [1, 2, 3, 4]
        pinyin_map[1] = [1, 1, 2, 2]
        mels[:D_FRAMES] = self.pat[ctx]
        mels[D_FRAMES:] = self.pat["H1"] if ctx == CTX_A else self.pat["H2"]
        return self._pack(words, keys, key_map, pinyin, pinyin_map, mel2word, mels)

    def _anchor_item(self, first):
        second = ANCHOR_2 if first == ANCHOR_1 else ANCHOR_1
        words = np.array([first, second], np.int32)
        keys, key_map, pinyin, pinyin_map, mel2word, mels = self._base(words)
        for slot, tok in enumerate((first, second)):
            toks = [1, 2] if tok == ANCHOR_1 else [3, 4]  # H's sense pinyins
            self._fill_single(keys, key_map, pinyin, pinyin_map, slot, self.anchor_keys[tok], toks)
            mels[slot * D_FRAMES : (slot + 1) * D_FRAMES] = (
                self.pat["H1"] if tok == ANCHOR_1 else self.pat["H2"]
            )
        return self._pack(words, keys, key_map, pinyin, pinyin_map, mel2word, mels)

    def _pack(self, words, keys, key_map, pinyin, pinyin_map, mel2word, mels):
        return dict(
            word_tokens=words, keys=keys, values=keys, key_map=key_map,
            pinyin=pinyin, pinyin_map=pinyin_map,
            pron_modified=np.zeros(TW, np.int32),
            mel2word=mel2word, mels=mels,
            word_lengths=np.int32(TW), mel_lengths=np.int32(TM),
        )

    def batch(self):
        items = [
            self._het_item(CTX_A), self._het_item(CTX_B),
            self._het_item(CTX_A), self._het_item(CTX_B),
            self._anchor_item(ANCHOR_1), self._anchor_item(ANCHOR_2),
            self._anchor_item(ANCHOR_1), self._anchor_item(ANCHOR_2),
        ]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def train_batches(self):
        yield self.batch()

    val_batches = train_batches
    test_batches = train_batches


@pytest.mark.slow
def test_s2pa_learns_context_dependent_pronunciation():
    cfg = {
        "word_size": 8, "hidden_size": 16, "num_heads": 2, "enc_ffn_kernel_size": 3,
        "dropout": 0.0, "value_embedding_size": 8, "dict_embed_dim": E,
        "latent_size": 4, "fvae_enc_dec_hidden": 16, "fvae_enc_n_layers": 1,
        "fvae_dec_n_layers": 1, "use_prior_glow": False,
        "mel_disc_hidden_size": 8, "disc_win_num": 1,
        "lambda_mel_adv": 0.0,  # pure mel objective — no GAN in this probe
        "warmup_updates": 50, "lr": 1.0,
        "mel_loss": "l1:1.0", "dur_predictor_layers": 2, "max_frames": TM,
        "frames_multiple": 4, "lambda_kl": 0.1,
    }
    provider = HeteronymProvider()
    task = DictTTSTask(cfg, provider)
    state = task.build_state(jax.random.PRNGKey(0))
    batch = provider.batch()
    step = jax.jit(task.train_step)

    def scan_steps(state, rng, n):
        def body(st, r):
            st, m = task.train_step(st, batch, r)
            return st, m["l1"]
        rngs = jax.random.split(rng, n)
        return jax.lax.scan(body, state, rngs)

    scan = jax.jit(scan_steps, static_argnums=(2,))
    state, l1s = scan(state, jax.random.PRNGKey(1), 400)
    l1s = np.asarray(l1s)
    assert l1s[-1] < l1s[0] * 0.5, f"mel loss did not train: {l1s[0]} -> {l1s[-1]}"

    out = jax.device_get(jax.jit(task.test_step)(state, batch, jax.random.PRNGKey(2)))
    # pron_attn [B, Tw, Lp]: mass per pinyin position; sense 1 = positions
    # 0-1, sense 2 = positions 2-3 on the heteronym row. Rows 0-3 are the
    # heteronym sentences (A, B, A, B).
    pa = out["pron_attn"][:4, 1]  # [4 heteronym rows, 4]
    sense1 = pa[:, :2].sum(-1)
    sense2 = pa[:, 2:].sum(-1)
    want_sense1 = np.asarray([True, False, True, False])
    picked_sense1 = sense1 > sense2
    acc = float((picked_sense1 == want_sense1).mean())
    assert acc >= 0.75, f"S2PA pronunciation accuracy {acc} not above chance: {pa}"
    # the emitted 2-token window must be the winning sense's (initial, final)
    ids = out["pinyin_pred"][:4, 1]  # [4, 2]
    for b in range(ids.shape[0]):
        expect = [1, 2] if picked_sense1[b] else [3, 4]
        assert ids[b].tolist() == expect
