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


def _oracle_rnnt_loss(logits, targets, logit_lengths, target_lengths,
                      blank=-1, clamp=-1.0, reduction='mean'):
    """Brute-force log-semiring RNNT DP with torchaudio's semantics.

    An *independent oracle* (O(B·T·U) python loops, no shared code with
    wenet_tpu/ops/rnnt_loss.py's wavefront scan) so that reference-model
    loss parity in test_reference_parity_zoo.py compares two unrelated
    implementations.  Signature matches torchaudio.functional.rnnt_loss
    as called by the reference (transducer.py:180,495)."""
    import torch
    logp = torch.log_softmax(logits.float(), dim=-1)
    if blank < 0:
        blank = logits.shape[-1] + blank
    losses = []
    for b in range(logits.shape[0]):
        T = int(logit_lengths[b])
        U = int(target_lengths[b])
        lp = logp[b]
        neg_inf = torch.tensor(float('-inf'))
        alpha = torch.full((T, U + 1), float('-inf'))
        alpha[0, 0] = 0.0
        for t in range(T):
            for u in range(U + 1):
                if t == 0 and u == 0:
                    continue
                emit = (alpha[t, u - 1] +
                        lp[t, u - 1, int(targets[b, u - 1])]
                        ) if u > 0 else neg_inf
                step = (alpha[t - 1, u] + lp[t - 1, u, blank]
                        ) if t > 0 else neg_inf
                alpha[t, u] = torch.logsumexp(
                    torch.stack([emit, step]), 0)
        losses.append(-(alpha[T - 1, U] + lp[T - 1, U, blank]))
    losses = torch.stack(losses)
    if reduction == 'mean':
        return losses.mean()
    if reduction == 'sum':
        return losses.sum()
    return losses


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
    taf = _stub('torchaudio.functional', rnnt_loss=_oracle_rnnt_loss)
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


def _patch_grouped_attention_cache():
    """The reference's GroupedRelPositionMultiHeadedAttention.forward
    (efficient_conformer/attention.py:180-258) still takes the OLD
    tensor-style kv cache, but the shared ConformerEncoderLayer passes
    the new tuple T_CACHE (transformer/encoder_layer.py:79,114) — the
    reference's own EfficientConformer full forward crashes at this
    snapshot.  Adapt tuple<->tensor at the boundary so the (otherwise
    untouched) reference math can run for parity tests."""
    import torch
    from wenet.models.efficient_conformer.attention import (
        GroupedRelPositionMultiHeadedAttention as G)
    orig = G.forward

    def forward(self, query, key, value,
                mask=torch.ones((0, 0, 0), dtype=torch.bool),
                pos_emb=torch.empty(0),
                cache=torch.zeros((0, 0, 0, 0))):
        tupled = isinstance(cache, tuple)
        if tupled:
            k_cache, v_cache = cache
            cache = (torch.cat([k_cache, v_cache], dim=-1)
                     if k_cache.size(0) > 0 else
                     torch.zeros((0, 0, 0, 0)))
        out, new_cache = orig(self, query, key, value, mask, pos_emb,
                              cache)
        if tupled:
            new_cache = tuple(
                torch.split(new_cache, new_cache.size(-1) // 2, dim=-1))
        return out, new_cache

    G.forward = forward

    # The efficient encoder's own forward_chunk passes the OLD
    # tensor-style cache into the SHARED RelPositionMultiHeadedAttention
    # too (efficient_conformer/encoder.py:404-412), which now expects
    # the tuple T_CACHE — its streaming crashes upstream.  Adapt
    # tensor<->tuple at that boundary as well so reference streaming
    # can run for parity tests.
    from wenet.models.transformer.attention import (
        RelPositionMultiHeadedAttention as R)
    r_orig = R.forward

    def r_forward(self, query, key, value,
                  mask=torch.ones((0, 0, 0), dtype=torch.bool),
                  pos_emb=torch.empty(0), cache=None):
        if cache is None:
            cache = (torch.zeros((0, 0, 0, 0)),
                     torch.zeros((0, 0, 0, 0)))
        tensor_style = torch.is_tensor(cache)
        if tensor_style:
            if cache.size(0) > 0:
                cache = tuple(
                    torch.split(cache, cache.size(-1) // 2, dim=-1))
            else:
                cache = (torch.zeros((0, 0, 0, 0)),
                         torch.zeros((0, 0, 0, 0)))
        out, new_cache = r_orig(self, query, key, value, mask, pos_emb,
                                cache)
        if tensor_style:
            new_cache = torch.cat(new_cache, dim=-1)
        return out, new_cache

    R.forward = r_forward


def _patch_branchformer_streaming_mask():
    """BaseEncoder.forward_chunk passes the FAKE empty mask_pad
    (transformer/encoder.py:279-284 leaves the (0,0,0) default), and
    the branchformer learned_ave merge masked_fills the pooling scores
    with it (branchformer/encoder_layer.py:156) — shape mismatch, so
    the reference's own learned_ave streaming crashes upstream.
    Substitute a real all-ones mask (the chunk is fully valid in the
    reference's true-length chunking) so the otherwise-untouched math
    can run for parity tests."""
    import torch
    from wenet.models.branchformer.encoder_layer import (
        BranchformerEncoderLayer as BL)
    orig = BL._forward

    def _forward(self, x, mask, pos_emb,
                 mask_pad=torch.ones((0, 0, 0), dtype=torch.bool),
                 att_cache=(torch.zeros((0, 0, 0, 0)),
                            torch.zeros((0, 0, 0, 0))),
                 cnn_cache=torch.zeros((0, 0, 0, 0)),
                 stoch_layer_coeff: float = 1.0):
        if mask_pad.numel() == 0:
            mask_pad = torch.ones((x.size(0), 1, x.size(1)),
                                  dtype=torch.bool, device=x.device)
        return orig(self, x, mask, pos_emb, mask_pad, att_cache,
                    cnn_cache, stoch_layer_coeff)

    BL._forward = _forward


@functools.lru_cache(maxsize=1)
def load():
    """Import and return the reference `wenet` package (cached)."""
    _install_stubs()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import wenet  # noqa: F401
    _patch_grouped_attention_cache()
    _patch_branchformer_streaming_mask()
    return wenet
