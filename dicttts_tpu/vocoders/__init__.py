from dicttts_tpu.vocoders.base_vocoder import BaseVocoder, get_vocoder_cls, register_vocoder  # noqa: F401
from dicttts_tpu.vocoders.hifigan import HifiGanVocoder  # noqa: F401
