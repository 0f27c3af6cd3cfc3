"""PortaSpeech flow task (reference tasks/tts/ps_flow.py): the non-
adversarial variant — KL + mel + word-duration losses, single optimizer.
(The reference's second-stage post-glow training is gated behind a broken
import upstream, SURVEY.md §2.11; the FVAE prior flow is the active path.)"""

from __future__ import annotations

from dicttts_tpu.train.tasks.ps_adv import PortaSpeechAdvTask


class PortaSpeechFlowTask(PortaSpeechAdvTask):
    def __init__(self, cfg, data=None):
        cfg = dict(cfg)
        cfg["lambda_mel_adv"] = 0.0  # disable the adversarial term & disc updates
        super().__init__(cfg, data)
