"""dicttts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-synthesis framework.

A from-scratch rebuild of the capabilities of Dict-TTS (NeurIPS 2022,
arXiv:2206.02147; reference implementation Zain-Jiang/Dict-TTS):

- Dict-TTS acoustic model: semantics-to-pronunciation attention (S2PA) over a
  Chinese dictionary's gloss entries (RoFormer-embedded), on a PortaSpeech
  stack (relative-position transformer encoders, word-level duration +
  length regulation, WaveNet-based VAE mel decoder with a residual-coupling
  prior flow) trained adversarially with a multi-window mel discriminator.
- FastSpeech2 and PortaSpeech baseline acoustic models.
- HiFi-GAN vocoder (generator + MPD/MSD discriminators).
- Framework: YAML-inheritance config system, max-updates trainer with GAN
  multi-optimizer stepping, checkpoint rotate/best/resume, data-parallel
  training over a `jax.sharding.Mesh`, offline preprocessing pipeline, and
  evaluation suite (PER, f0 DTW, duration error, RTF profiling).

All compute paths are JAX/XLA with static padded shapes; hot kernels use
Pallas. Tensors are feature-last ([B, T, C]) throughout — the TPU-friendly
layout — unlike the reference's torch [B, C, T].
"""

__version__ = "0.1.0"
