"""OpenAI-checkpoint CONVERTER coverage (distinct from
tests/test_reference_parity.py, which checks whisper parity against the
real reference wenet.models.whisper package in its converted layout):
a faithful torch re-implementation of the OpenAI
whisper architecture is built here, converted via
wenet_tpu.models.whisper.convert, and encoder/decoder outputs compared.

Mirrors the reference's test_whisper.py equivalence strategy
(SURVEY.md §4)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

torch.manual_seed(7)

MELS, D, H, LAYERS, VOCAB, N_AUDIO_CTX, N_TEXT_CTX = 40, 32, 2, 2, 120, 64, 24


# ------------------------- torch mini-whisper -----------------------------
class TMHA(nn.Module):

    def __init__(self):
        super().__init__()
        self.query = nn.Linear(D, D)
        self.key = nn.Linear(D, D, bias=False)
        self.value = nn.Linear(D, D)
        self.out = nn.Linear(D, D)

    def forward(self, x, xa=None, mask=None):
        q = self.query(x)
        k = self.key(x if xa is None else xa)
        v = self.value(x if xa is None else xa)
        B, T, _ = q.shape
        S = k.shape[1]
        scale = (D // H)**-0.25
        q = q.view(B, T, H, -1).permute(0, 2, 1, 3) * scale
        k = k.view(B, S, H, -1).permute(0, 2, 3, 1) * scale
        v = v.view(B, S, H, -1).permute(0, 2, 1, 3)
        qk = q @ k
        if mask is not None:
            qk = qk + mask[:T, :S]
        w = qk.softmax(dim=-1)
        return self.out((w @ v).permute(0, 2, 1,
                                        3).flatten(start_dim=2))


class TBlock(nn.Module):

    def __init__(self, cross=False):
        super().__init__()
        self.attn = TMHA()
        self.attn_ln = nn.LayerNorm(D)
        self.cross_attn = TMHA() if cross else None
        self.cross_attn_ln = nn.LayerNorm(D) if cross else None
        self.mlp = nn.Sequential(nn.Linear(D, D * 4), nn.GELU(),
                                 nn.Linear(D * 4, D))
        self.mlp_ln = nn.LayerNorm(D)

    def forward(self, x, xa=None, mask=None):
        x = x + self.attn(self.attn_ln(x), mask=mask)
        if self.cross_attn is not None:
            x = x + self.cross_attn(self.cross_attn_ln(x), xa)
        x = x + self.mlp(self.mlp_ln(x))
        return x


def sinusoids(length, channels):
    import math
    log_inc = math.log(10000) / (channels // 2 - 1)
    inv = torch.exp(-log_inc * torch.arange(channels // 2))
    t = torch.arange(length)[:, None] * inv[None, :]
    return torch.cat([t.sin(), t.cos()], dim=1)


class TWhisper(nn.Module):

    def __init__(self):
        super().__init__()
        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv1d(MELS, D, 3, padding=1)
                self.conv2 = nn.Conv1d(D, D, 3, stride=2, padding=1)
                self.blocks = nn.ModuleList([TBlock() for _ in
                                             range(LAYERS)])
                self.ln_post = nn.LayerNorm(D)
        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                self.token_embedding = nn.Embedding(VOCAB, D)
                self.positional_embedding = nn.Parameter(
                    torch.randn(N_TEXT_CTX, D) * 0.02)
                self.blocks = nn.ModuleList([TBlock(cross=True)
                                             for _ in range(LAYERS)])
                self.ln = nn.LayerNorm(D)
        self.encoder = Enc()
        self.decoder = Dec()

    def embed_audio(self, mel):
        e = self.encoder
        x = F.gelu(e.conv1(mel))
        x = F.gelu(e.conv2(x))
        x = x.permute(0, 2, 1)
        x = x + sinusoids(x.shape[1], D)
        for block in e.blocks:
            x = block(x)
        return e.ln_post(x)

    def logits(self, tokens, audio):
        d = self.decoder
        x = (d.token_embedding(tokens) +
             d.positional_embedding[:tokens.shape[1]])
        mask = torch.full((N_TEXT_CTX, N_TEXT_CTX), float('-inf')
                          ).triu_(1)
        for block in d.blocks:
            x = block(x, xa=audio, mask=mask)
        x = d.ln(x)
        return x @ d.token_embedding.weight.T


@pytest.fixture(scope='module')
def models():
    tmodel = TWhisper().eval()
    from wenet_tpu.models.whisper.convert import (build_config,
                                                  convert_state_dict)
    dims = {'n_mels': MELS, 'n_vocab': VOCAB, 'n_audio_state': D,
            'n_audio_head': H, 'n_audio_layer': LAYERS,
            'n_text_state': D, 'n_text_head': H, 'n_text_layer': LAYERS,
            'n_audio_ctx': N_AUDIO_CTX, 'n_text_ctx': N_TEXT_CTX}
    st = {'sot': VOCAB - 10, 'eot': VOCAB - 11, 'sot_prev': VOCAB - 9,
          'transcribe': VOCAB - 8, 'translate': VOCAB - 7,
          'no_timestamps': VOCAB - 6, 'no_speech': VOCAB - 5,
          'timestamp_begin': VOCAB - 4}
    configs = build_config(dims, st)
    configs['model_conf']['ctc_weight'] = 0.0
    sd = convert_state_dict(tmodel.state_dict())

    from wenet_tpu.utils.checkpoint import convert_torch_state_dict
    from wenet_tpu.utils.init_model import init_model, init_variables
    model, configs = init_model(None, configs)
    variables, configs = init_variables(model, configs)
    variables = convert_torch_state_dict(sd, variables)
    return tmodel, model, variables


def test_whisper_encoder_parity(models):
    tmodel, model, variables = models
    rng = np.random.RandomState(0)
    mel = rng.randn(2, MELS, 64).astype(np.float32)
    with torch.no_grad():
        tout = tmodel.embed_audio(torch.tensor(mel)).numpy()
    feats = jnp.asarray(mel.transpose(0, 2, 1))  # (B, T, mel)
    lens = jnp.asarray([64, 64])
    jout, _ = model.apply(variables, feats, lens,
                          method=model.forward_encoder)
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4,
                               rtol=2e-4)


def test_whisper_decoder_parity(models):
    tmodel, model, variables = models
    rng = np.random.RandomState(1)
    mel = rng.randn(1, MELS, 64).astype(np.float32)
    tokens = rng.randint(0, VOCAB - 20, (1, 8))
    with torch.no_grad():
        audio = tmodel.embed_audio(torch.tensor(mel))
        tlogits = tmodel.logits(torch.tensor(tokens), audio).numpy()
    feats = jnp.asarray(mel.transpose(0, 2, 1))
    enc, mask = model.apply(variables, feats, jnp.asarray([64]),
                            method=model.forward_encoder)
    dec_out, _, _ = model.decoder.apply(
        {'params': variables['params']['decoder']}, enc, mask,
        jnp.asarray(tokens), jnp.asarray([8]))
    np.testing.assert_allclose(np.asarray(dec_out), tlogits, atol=2e-3,
                               rtol=2e-3)


def test_whisper_loss_runs(models):
    _, model, variables = models
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(2, 64, MELS), jnp.float32)
    lens = jnp.asarray([64, 50])
    tgt = jnp.asarray(rng.randint(0, VOCAB - 20, (2, 6)), jnp.int32)
    tl = jnp.asarray([6, 4])
    tgt = jnp.where(jnp.arange(6)[None] < tl[:, None], tgt, -1)
    out = model.apply(variables, feats, lens, tgt, tl,
                      lang_ids=jnp.asarray([0, 1]),
                      task_ids=jnp.asarray([0, 0]))
    assert np.isfinite(float(out['loss']))


def test_whisper_attention_rescoring_uses_prompt(models):
    """Whisper-style rescoring must condition on the 4-token special
    prompt, not a bare sos (ref search.py:403-419)."""
    import numpy as np
    from wenet_tpu.models.transformer.search import (DecodeResult,
                                                     attention_rescoring)
    _, model, variables = models
    assert model.special_tokens is not None
    rng = np.random.RandomState(0)
    B, T = 2, 12
    enc = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    enc_lens = jnp.asarray([T, T])
    ctc_results = [
        DecodeResult(tokens=[3, 5], nbest=[[3, 5], [3]],
                     nbest_scores=[-1.0, -2.0],
                     nbest_times=[[0, 1], [0]]),
        DecodeResult(tokens=[7], nbest=[[7], [7, 8]],
                     nbest_scores=[-0.5, -1.5],
                     nbest_times=[[0], [0, 1]]),
    ]
    out = attention_rescoring(
        model, variables, ctc_results, enc, enc_lens, ctc_weight=0.3,
        reverse_weight=0.0,
        infos={'tasks': ['transcribe'] * B, 'langs': ['en'] * B})
    assert len(out) == B
    for b, r in enumerate(out):
        assert list(r.tokens) in [list(h)
                                  for h in ctc_results[b].nbest]
        assert np.isfinite(r.score)
    # the P=4 program variant must have been compiled (prompt in use)
    from wenet_tpu.models.transformer.search import _RESCORE_CACHE
    assert any(k[-1] == 4 for k in _RESCORE_CACHE)


def test_whisper_attention_pipelined_matches_sequential(models):
    """decode_attention_batches with whisper task/lang prompt infos
    must match the sequential runner.decode(['attention']) results —
    covers the prompt-prefix path through the pipelined branch."""
    from wenet_tpu.models.runner import AsrRunner
    _, model, variables = models
    runner = AsrRunner(model, variables)
    rng = np.random.RandomState(3)
    batches = []
    for i in range(2):
        mel = rng.randn(2, 64, MELS).astype(np.float32)
        lens = np.asarray([64, 64])
        infos = {'tasks': ['transcribe', 'translate'],
                 'langs': ['en', 'zh']}
        batches.append((mel, lens, infos))
    piped = list(runner.decode_attention_batches(batches, beam_size=2))
    assert len(piped) == 2
    for (mel, lens, infos), got in zip(batches, piped):
        ref = runner.decode(['attention'], mel, lens, beam_size=2,
                            infos=infos)['attention']
        assert [list(r.tokens) for r in got] == \
            [list(r.tokens) for r in ref]
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a.score, b.score, rtol=1e-5)
