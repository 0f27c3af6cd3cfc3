"""DictTTS training task: adversarial VAE training with two optimizers.

Capability parity with the reference DictTTSTask
(/root/reference/tasks/tts/dict_tts.py:24-177): generator losses = KL
(clamped >= 0.002) * lambda_kl + composite mel loss + word-duration loss +
LSGAN adversarial-to-1 * lambda_mel_adv; the discriminator trains on
independent random crops of the same batch's (detached) generator output.
GAN plumbing lives in AdversarialTTSTask (one jitted step, masked disc
gating); see train/tasks/adv_base.py.

Batch keys: word_tokens [B,Tw], keys/values [B,Tw,Lk,E], key_map, pinyin,
pinyin_map, pron_modified, mel2word [B,Tm], mels [B,Tm,80],
word_lengths [B], mel_lengths [B].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dicttts_tpu.models.dict_encoder import DictMsg
from dicttts_tpu.models.dict_tts import DictTTS
from dicttts_tpu.train import losses as L
from dicttts_tpu.train.tasks.adv_base import AdversarialTTSTask


def _dict_msg(batch, bank_fused: bool = False) -> DictMsg:
    """Per-utterance dict-bank tensors: either pre-collated host arrays or,
    with the device-resident bank (use_device_dict_bank), an on-device
    gather of the [V, ...] vocab bank by word id — the bank uploads ONCE
    and batches carry only word_tokens, replacing the dominant host->device
    byte volume ([B, Tw, L_k, 768] per step) with an HBM gather.

    bank_fused (s2pa_bank_fused config): the float bank is NOT gathered
    here — it passes through as [V, L, E] and the Pallas kernel gathers
    rows in VMEM (ops/s2pa_bank_pallas.py), skipping the ~566 MB [B,Tw,L,E]
    materialization; only the small int maps are gathered."""
    if "_bank" in batch:
        bank = batch["_bank"]
        wt = batch["word_tokens"]
        if bank_fused:
            return DictMsg(
                bank["keys"], bank["keys"], bank["key_map"][wt],
                bank["pinyin"][wt], bank["pinyin_map"][wt])
        # keep the bank's storage dtype through the gather: under amp the
        # bank is bf16 and S2PA consumes it in the activation dtype anyway —
        # upcasting here would materialize an extra [B,Tw,L,768] f32 copy
        # (~1.1 GB at 60x64x96) that XLA then casts straight back down
        keys = bank["keys"][wt]
        return DictMsg(keys, keys, bank["key_map"][wt], bank["pinyin"][wt], bank["pinyin_map"][wt])
    return DictMsg(
        batch["keys"], batch["values"], batch["key_map"], batch["pinyin"], batch["pinyin_map"]
    )


class DictTTSTask(AdversarialTTSTask):
    def __init__(self, cfg, data=None):
        self._init_adv(cfg)
        self.data = data
        self.use_device_bank = bool(cfg.get("use_device_dict_bank")) and hasattr(
            data, "ds"
        ) and hasattr(getattr(data, "ds", None), "device_bank")
        if bool(cfg.get("use_device_dict_bank")) and data is not None and not self.use_device_bank:
            # the collater already skips the per-batch keys/values when the
            # flag is set (data/datasets.py), so silently running without
            # the bank would KeyError inside jit — fail at construction
            raise ValueError(
                "use_device_dict_bank=true but the data provider exposes no "
                ".ds.device_bank (wrap providers like run.py's _Splits with "
                "a .ds alias, or unset the flag)"
            )
        self.mel_loss_spec = L.parse_mel_loss_spec(cfg.get("mel_loss", "ssim:0.5|l1:0.5"))
        # gather-fused S2PA (Pallas): needs the device bank; the kernel
        # gathers bank rows itself (ops/s2pa_bank_pallas.py). TPU-only:
        # off-TPU the kernel would run in the (very slow) interpreter, so
        # CPU runs (tests, the DCN rehearsal) silently use the equivalent
        # XLA gather path instead — same math, equivalence-tested.
        self.bank_fused = (
            bool(cfg.get("s2pa_bank_fused"))
            and self.use_device_bank
            and jax.default_backend() == "tpu"
        )
        self.lambda_kl = cfg.get("lambda_kl", 1.0)
        self.kl_min = cfg.get("kl_min", 0.002)
        self.infer_max_frames = cfg.get("max_frames", 1548)
        self.model = DictTTS(
            word_vocab=cfg.get("word_size", 8000),
            hidden_size=cfg.get("hidden_size", 192),
            num_heads=cfg.get("num_heads", 2),
            enc_ffn_kernel_size=cfg.get("enc_ffn_kernel_size", 5),
            dropout=cfg.get("dropout", 0.1),
            pinyin_vocab=cfg.get("value_embedding_size", 185),
            dur_predictor_layers=cfg.get("dur_predictor_layers", 3),
            dur_predictor_kernel=cfg.get("dur_predictor_kernel", 5),
            predictor_dropout=cfg.get("predictor_dropout", 0.2),
            predictor_grad=cfg.get("predictor_grad", 0.1),
            frames_multiple=cfg.get("frames_multiple", 4),
            out_dims=cfg.get("audio_num_mel_bins", 80),
            latent_size=cfg.get("latent_size", 16),
            fvae_enc_dec_hidden=cfg.get("fvae_enc_dec_hidden", 192),
            fvae_kernel_size=cfg.get("fvae_kernel_size", 5),
            fvae_enc_n_layers=cfg.get("fvae_enc_n_layers", 8),
            fvae_dec_n_layers=cfg.get("fvae_dec_n_layers", 4),
            use_prior_flow=cfg.get("use_prior_glow", True),
            prior_flow_hidden=cfg.get("prior_glow_hidden", 64),
            prior_flow_kernel_size=cfg.get("glow_kernel_size", 3),
            prior_flow_n_blocks=cfg.get("prior_glow_n_blocks", 4),
            num_spk=cfg.get("num_spk", 0) if cfg.get("use_spk_id") else 0,
            use_pallas_s2pa=cfg.get("use_pallas_s2pa", False),
            s2pa_sense_mode=cfg.get("s2pa_sense_mode", "token"),
            s2pa_max_senses=cfg.get("s2pa_max_senses", 10),
        )

    def build_state(self, rng) -> dict:
        cfg = self.cfg
        Tw, Tm = cfg.get("_init_tw", 8), cfg.get("_init_tm", 32)
        Lk, Lp = cfg.get("_init_lk", 8), cfg.get("_init_lp", 6)
        E = cfg.get("dict_embed_dim", 768)
        z = jnp.zeros
        dm = DictMsg(
            z((1, Tw, Lk, E)), z((1, Tw, Lk, E)),
            z((1, Tw, Lk), jnp.int32), z((1, Tw, Lp), jnp.int32), z((1, Tw, Lp), jnp.int32),
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        params_g = self.model.init(
            {"params": r1, "sample": r2},
            jnp.ones((1, Tw), jnp.int32), dm, z((1, Tw), jnp.int32),
            mel2word=jnp.ones((1, Tm), jnp.int32),
            spk_ids=z((1,), jnp.int32) if self.model.num_spk > 0 else None,
            tgt_mels=z((1, Tm, 80)),
        )["params"]
        params_d = self._init_disc_params(r3)
        state = {
            "params_g": params_g,
            "params_d": params_d,
            "opt_g": self.tx_g.init(params_g),
            "opt_d": self.tx_d.init(params_d),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.use_device_bank:
            # _const_ prefix: carried through steps untouched (donation
            # aliases it in place) and excluded from checkpoints. Under bf16
            # activations the float banks (gloss keys/values) are stored
            # bf16: the S2PA einsums consume them in bf16 anyway, and the
            # [B,Tw,L,768] per-step HBM gather halves its byte volume.
            def _bank_dtype(v):
                v = jnp.asarray(v)
                if self.act_dtype is not None and v.dtype == jnp.float32:
                    return v.astype(self.act_dtype)
                return v

            state["_const_dict_bank"] = {
                k: _bank_dtype(v)
                for k, v in self.data.ds.device_bank(
                    max_gloss=cfg.get("device_bank_max_gloss"),
                    max_pinyin=cfg.get("device_bank_max_pinyin"),
                ).items()
            }
        return self.attach_device_frame_cache(state)

    def prepare_batch(self, state, batch):
        batch = super().prepare_batch(state, batch)
        if "_const_dict_bank" in state:
            batch = {**batch, "_bank": state["_const_dict_bank"]}
        return batch

    def _gen_losses(self, params_g, params_d, batch, rng, train: bool, adv_w=1.0):
        rngs = {"sample": jax.random.fold_in(rng, 0), "dropout": jax.random.fold_in(rng, 1)}
        out = self.model.apply(
            {"params": params_g},
            batch["word_tokens"],
            _dict_msg(batch, self.bank_fused),
            batch.get("pron_modified"),
            mel2word=batch["mel2word"],
            spk_ids=batch.get("spk_ids"),
            tgt_mels=batch["mels"],
            deterministic=not train,
            rngs=rngs,
        )
        losses = {"kl": L.clamp_kl(out["kl"] * self.lambda_kl, self.kl_min)}
        L.add_mel_losses(self.mel_loss_spec, out["mel_out"], batch["mels"], losses)
        losses["wdur"] = L.word_dur_loss(
            out["dur"], batch["mel2word"], batch["word_lengths"], self.cfg.get("dur_scale", "log")
        )
        if train and self.lambda_adv > 0:
            # adv_w gates the term on step >= disc_start_steps (reference
            # ps_adv.py:61-66 only adds 'a' once the disc has started)
            losses["a"] = (
                self._adv_gen_loss(params_d, out["mel_out"], batch["mel_lengths"], rng)
                * self.lambda_adv
                * adv_w
            )
        total = sum(losses.values())
        return total, (losses, out)

    def after_test_step(self, batch_idx, batch, out):
        """Persist inference outputs: wav (when a vocoder ckpt is set), mel
        npy, and the meta.csv row with predicted pinyin for PER scoring
        (reference test scaffold, tasks/tts/tts_base.py:247-376 +
        dict_tts.py:294-311)."""
        import csv
        import os

        import numpy as np

        from dicttts_tpu.eval.per import decode_pinyin_ids

        out_dir = os.path.join(self.cfg.get("work_dir", "infer_out") or "infer_out", "generated")
        os.makedirs(out_dir, exist_ok=True)
        if not hasattr(self, "_pinyin_list"):
            import pickle

            pe = os.path.join(self.cfg.get("binary_data_dir", ""), "pinyin_encoder.pkl")
            self._pinyin_list = pickle.load(open(pe, "rb")) if os.path.exists(pe) else None
            self._vocoder = None
            if self.cfg.get("vocoder_ckpt"):
                from dicttts_tpu.vocoders import get_vocoder_cls

                self._vocoder = get_vocoder_cls(self.cfg.get("vocoder", "HifiGanVocoder"))(self.cfg)
        rows = []
        metas = batch.get("_meta", [{}] * out["mel_out"].shape[0])
        for b, meta in enumerate(metas):
            name = meta.get("item_name", f"b{batch_idx}_{b}")
            n = int((out["mel2word"][b] > 0).sum())
            mel = out["mel_out"][b][:n]
            np.save(os.path.join(out_dir, f"{name}.mel.npy"), mel)
            if self._vocoder is not None:
                from dicttts_tpu.vocoders.hifigan import save_wav

                save_wav(
                    os.path.join(out_dir, f"{name}.wav"),
                    self._vocoder.spec2wav(mel),
                    self.cfg.get("audio_sample_rate", 22050),
                )
            pinyin = ""
            if self._pinyin_list is not None:
                n_words = int((np.asarray(batch["word_tokens"])[b] > 0).sum())
                # chars 1..n-2 (skip BOS/EOS rows), two tokens per char —
                # the shared decode convention (eval/per.decode_pinyin_ids)
                pinyin = " ".join(
                    decode_pinyin_ids(
                        out["pinyin_pred"][b], max(n_words - 2, 0), self._pinyin_list
                    )
                )
            txt = meta.get("txt", "").replace(",", "，").replace(".", "。")
            rows.append([name, txt, pinyin,
                         os.path.join(out_dir, f"{name}.wav"), meta.get("wav_fn_gt", "")])
        return {"rows": rows, "out_dir": out_dir}

    def test_end(self, outputs):
        """Aggregate meta.csv in the reference layout (tts_base.py:372,
        pd.DataFrame(outputs).to_csv with index): header + columns
        [idx, item_name, text, pinyin_tokens, wav_fn_pred, wav_fn_gt] — the
        PER scorer reads column 3 (scripts/get_pron_error.py:35)."""
        import csv
        import os

        if not outputs:
            return
        out_dir = outputs[0].get("out_dir", "infer_out")
        with open(os.path.join(out_dir, "meta.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["", "item_name", "text", "pinyin_tokens", "wav_fn_pred", "wav_fn_gt"])
            i = 0
            for o in outputs:
                for row in o.get("rows", []):
                    w.writerow([i] + list(row))
                    i += 1

    def validation_artifacts(self, state, batch, rng):
        """TB audio + figures every validation (reference dict_tts.py
        validation logging: wav, mel compare, dict-attention)."""
        import numpy as np

        from dicttts_tpu.utils import plot

        # cache the jitted infer fn on the task: a fresh jax.jit wrapper per
        # validation misses the in-process executable cache and re-loads the
        # compiled graph through the relay (~1 min per validation, measured
        # in the r3 soak)
        if not hasattr(self, "_jit_artifact_step"):
            self._jit_artifact_step = jax.jit(self.test_step)
        out = jax.device_get(self._jit_artifact_step(state, batch, rng))
        batch = jax.device_get(batch)
        n = int(np.asarray(batch["mel_lengths"])[0])
        n_pred = int((out["mel2word"][0] > 0).sum())
        arts = {"figures": {}, "audio": {}}
        arts["figures"]["mel_gt_vs_pred"] = plot.spec_figure(
            out["mel_out"][0][:n_pred], np.asarray(batch["mels"])[0][:n]
        )
        arts["figures"]["pron_attn"] = plot.attn_figure(out["pron_attn"][0], "pron attention")
        if self.cfg.get("vocoder_ckpt") or self.cfg.get("log_val_audio", False):
            try:
                from dicttts_tpu.vocoders import get_vocoder_cls

                voc = get_vocoder_cls(self.cfg.get("vocoder", "HifiGanVocoder"))(self.cfg)
                sr = self.cfg.get("audio_sample_rate", 22050)
                arts["audio"]["pred"] = (voc.spec2wav(out["mel_out"][0][:n_pred]), sr)
                arts["audio"]["gt_mel_vocoded"] = (
                    voc.spec2wav(np.asarray(batch["mels"])[0][:n]), sr,
                )
            except Exception:
                pass
        return arts

    def test_step(self, state, batch, rng):
        """Inference: predicted durations, sampled prior, argmax pinyin ids
        for PER scoring (reference dict_tts.py:294-311)."""
        batch = self.prepare_batch(state, batch)
        dm = _dict_msg(batch, self.bank_fused)
        with self._amp_scope():
            out = self.model.apply(
                {"params": state["params_g"]},
                batch["word_tokens"],
                dm,
                batch.get("pron_modified"),
                spk_ids=batch.get("spk_ids"),
                infer=True,
                max_frames=self.infer_max_frames,
                rngs={"sample": rng},
            )
        # reference decode (tasks/tts/dict_tts.py:300-304): argmax position
        # over the pinyin axis, then emit the TWO tokens [max_idx:max_idx+2]
        # — the (initial, final) pair of the winning sense (every sense
        # contributes exactly 2 pinyin tokens, binarizer invariant)
        pron_idx = jnp.argmax(out["pron_attn"], axis=-1)  # [B, Tw]
        idx2 = jnp.stack([pron_idx, jnp.minimum(pron_idx + 1, dm.pinyin.shape[2] - 1)], -1)
        pinyin_ids = jnp.take_along_axis(dm.pinyin, idx2, axis=2)  # [B, Tw, 2]
        return {
            "mel_out": out["mel_out"],
            "mel2word": out["mel2word"],
            "pron_attn": out["pron_attn"],
            "pinyin_pred": pinyin_ids,
        }
