"""Import the ACTUAL reference wenet package from /root/reference.

The reference's import chain needs a few packages absent from this image
(librosa, langid, torchaudio, openai-whisper) plus a shim for a bad
torch-internal import in wenet/models/squeezeformer/conv2d.py (it pulls
`Union`/`Optional`/`Tensor`/`_size_2_t` out of torch.nn.modules.conv,
which newer torch no longer re-exports).  Everything stubbed here is only
touched at *call* time by data-pipeline code the parity tests never run;
the model math itself is pure torch.

Used by tests/test_reference_parity.py to assert golden parity against
the real reference code rather than a test-local mirror (VERDICT.md #2).
"""

import functools
import sys
import types

REF_PATH = '/root/reference'


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for key, val in attrs.items():
        setattr(mod, key, val)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    # langid: processor.py imports LanguageIdentifier/model at module scope
    class _LanguageIdentifier:

        @classmethod
        def from_modelstring(cls, *a, **k):
            return cls()

        def classify(self, text):
            return ('en', 0.0)

    pkg = _stub('langid')
    pkg.__path__ = []
    _stub('langid.langid', LanguageIdentifier=_LanguageIdentifier,
          model=None)

    _stub('librosa')

    ta = _stub('torchaudio')
    ta.__path__ = []
    tac = _stub('torchaudio.compliance')
    tac.__path__ = []
    # paraformer/cif.py does `from torchaudio.compliance.kaldi import Tuple`
    # (a latent bug in the reference — it just wants typing.Tuple)
    import typing as _typing
    tak = _stub('torchaudio.compliance.kaldi', Tuple=_typing.Tuple)
    taf = _stub('torchaudio.functional')
    ta.compliance = tac
    ta.functional = taf
    tac.kaldi = tak

    # openai-whisper: wenet/utils/common.py needs whisper.tokenizer.LANGUAGES
    # (only the *key order* matters — it indexes language ids off `sot`).
    from wenet_tpu.models.whisper.tokens import WHISPER_LANGS
    wh = _stub('whisper')
    wh.__path__ = []
    _stub('whisper.tokenizer',
          LANGUAGES={lang: lang for lang in WHISPER_LANGS})

    # squeezeformer/conv2d.py pulls typing/Tensor names out of
    # torch.nn.modules.conv, which no longer re-exports them.
    import typing

    import torch
    import torch.nn.modules.conv as _conv
    from torch.nn.common_types import _size_2_t
    for name, val in [('Union', typing.Union), ('Optional', typing.Optional),
                      ('Tensor', torch.Tensor), ('_size_2_t', _size_2_t)]:
        if not hasattr(_conv, name):
            setattr(_conv, name, val)


@functools.lru_cache(maxsize=1)
def load():
    """Import and return the reference `wenet` package (cached)."""
    _install_stubs()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import wenet  # noqa: F401
    return wenet
