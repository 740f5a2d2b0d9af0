"""Whisper timestamp decoding — a capability the reference leaves
unimplemented (ref wenet/utils/common.py:211-217 raises
NotImplementedError for no_timestamp=False).

Covers: the <|0.00|>-anchored prompt, the vectorized timestamp-grammar
logit filter (vs an independent numpy oracle of the published rules),
segment extraction, and the grammar holding end-to-end through the
jitted attention beam program on a tiny whisper model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

VOCAB = 100
EOT = 50
SOT = 51
TS_BEGIN = 60  # 40 timestamp tokens: 60..99; text tokens: 0..49

ST = {'sot': SOT, 'eot': EOT, 'sot_prev': 56, 'transcribe': 52,
      'translate': 53, 'no_timestamps': 54, 'no_speech': 55,
      'timestamp_begin': TS_BEGIN}


def test_build_prefix_timestamp_mode():
    from wenet_tpu.models.whisper.tokens import build_whisper_prefix
    p = build_whisper_prefix(ST, 'transcribe', 'en', no_timestamp=False)
    assert p == [SOT, SOT + 1, ST['transcribe'], TS_BEGIN]
    p = build_whisper_prefix(ST, 'transcribe', 'en', no_timestamp=True)
    assert p[-1] == ST['no_timestamps']


def _oracle(logp, seq, ts_max):
    """Independent numpy restatement of the documented filter
    semantics (OpenAI ApplyTimestampRules + the always-on special-token
    suppression): seq is the sampled suffix INCLUDING the <|0.00|>
    anchor, ts_max the latest timestamp in it."""
    NEG = -1e30
    out = np.array(logp, np.float32).copy()
    V = out.shape[0]
    ids = np.arange(V)
    out[(ids > EOT) & (ids < TS_BEGIN)] = NEG
    last_is_ts = seq[-1] >= TS_BEGIN
    pen_is_ts = len(seq) < 2 or seq[-2] >= TS_BEGIN
    if last_is_ts and pen_is_ts:
        out[ids >= TS_BEGIN] = NEG
    if last_is_ts and not pen_is_ts:
        out[(ids < TS_BEGIN) & (ids != EOT)] = NEG
    min_allowed = ts_max if (last_is_ts and not pen_is_ts) else ts_max + 1
    out[(ids >= TS_BEGIN) & (ids < min_allowed)] = NEG
    ts_mass = np.logaddexp.reduce(out[ids >= TS_BEGIN])
    text_best = out[ids < TS_BEGIN].max()
    if ts_mass > text_best:
        out[ids < TS_BEGIN] = NEG
    return out


def test_timestamp_filter_matches_oracle():
    from wenet_tpu.models.transformer.search import (
        _apply_timestamp_rules)
    rng = np.random.RandomState(7)
    # states: (suffix, ts_max) covering every rule branch
    cases = [
        ([TS_BEGIN], TS_BEGIN),                      # anchor only
        ([TS_BEGIN, 3], TS_BEGIN),                   # text after anchor
        ([TS_BEGIN, 3, 7], TS_BEGIN),                # mid-text
        ([TS_BEGIN, 3, 62], 62),                     # single closing ts
        ([TS_BEGIN, 3, 62, 62], 62),                 # paired ts
        ([TS_BEGIN, 3, 62, 65], 65),                 # paired, jumped
        ([TS_BEGIN, 3, 62, 65, 9], 65),              # text in 2nd seg
        ([TS_BEGIN, 3, 99], 99),                     # ts ceiling
    ]
    for seq, ts_max in cases:
        logp_np = rng.randn(3, VOCAB).astype(np.float32)
        logp_np = logp_np - np.log(
            np.exp(logp_np).sum(-1, keepdims=True))
        want = np.stack([_oracle(row, seq, ts_max) for row in logp_np])
        R = logp_np.shape[0]
        got = _apply_timestamp_rules(
            jnp.asarray(logp_np),
            jnp.full((R,), seq[-1], jnp.int32),
            jnp.full((R,), seq[-2] if len(seq) >= 2 else 0, jnp.int32),
            jnp.asarray(len(seq) >= 2),
            jnp.full((R,), ts_max, jnp.int32),
            TS_BEGIN, EOT)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   err_msg=f'seq={seq}')


def test_tokens_to_segments():
    from wenet_tpu.models.whisper.tokens import (
        whisper_tokens_to_segments)
    # anchored stream (prompt's <|0.00|> stripped):
    #   a b <|0.24|> <|0.30|> c <|0.50|>  (ts step 0.02)
    toks = [1, 2, TS_BEGIN + 12, TS_BEGIN + 15, 3, TS_BEGIN + 25]
    text, segs = whisper_tokens_to_segments(toks, TS_BEGIN)
    assert text == [1, 2, 3]
    assert segs == [(0.0, 0.24, [1, 2]), (0.3, 0.5, [3])]
    # decode ended inside the first segment -> open end at 0.00
    text, segs = whisper_tokens_to_segments([5], TS_BEGIN)
    assert segs == [(0.0, None, [5])]
    # ... and inside a later segment
    text, segs = whisper_tokens_to_segments(
        [1, TS_BEGIN + 12, TS_BEGIN + 20, 7], TS_BEGIN)
    assert segs == [(0.0, 0.24, [1]), (0.4, None, [7])]


@pytest.fixture(scope='module')
def tiny_whisper():
    from wenet_tpu.models.whisper.convert import build_config
    from wenet_tpu.utils.init_model import init_model, init_variables
    dims = {'n_mels': 8, 'n_vocab': VOCAB, 'n_audio_state': 32,
            'n_audio_head': 2, 'n_audio_layer': 1, 'n_text_state': 32,
            'n_text_head': 2, 'n_text_layer': 1, 'n_audio_ctx': 48,
            'n_text_ctx': 64}
    configs = build_config(dims, ST)
    configs['model_conf']['ctc_weight'] = 0.0
    model, configs = init_model(None, configs)
    variables, configs = init_variables(model, configs)
    return model, variables


def _check_grammar(hyp, msg=''):
    """Assert rules 1-3 hold over the emitted stream (anchor-seeded);
    eot never appears (finalize strips it)."""
    seq = [TS_BEGIN] + list(hyp)
    ts_max = TS_BEGIN
    for j in range(1, len(seq)):
        t = seq[j]
        last = seq[j - 1]
        pen_is_ts = (j - 1) < 1 or seq[j - 2] >= TS_BEGIN
        last_is_ts = last >= TS_BEGIN
        assert not (EOT < t < TS_BEGIN), f'{msg}: special {t} emitted'
        assert t != EOT, f'{msg}: finalize should strip eot'
        if last_is_ts and pen_is_ts:
            assert t < TS_BEGIN, f'{msg}: ts after paired ts at {j}'
        if last_is_ts and not pen_is_ts:
            assert t >= TS_BEGIN, f'{msg}: text after single ts at {j}'
        if t >= TS_BEGIN:
            lo = ts_max if (last_is_ts and not pen_is_ts) else ts_max + 1
            assert t >= lo, f'{msg}: ts decreased at {j}: {t} < {lo}'
            ts_max = max(ts_max, t)


def test_attention_beam_timestamp_grammar(tiny_whisper):
    from wenet_tpu.models.transformer.search import (
        attention_beam_search)
    model, variables = tiny_whisper
    rng = np.random.RandomState(0)
    B, T, MELS = 2, 32, 8
    feats = jnp.asarray(rng.randn(B, T, MELS), jnp.float32)
    lens = jnp.asarray([T, T])
    enc, enc_mask = model.apply(variables, feats, lens,
                                method=model.forward_encoder)
    infos = {'tasks': ['transcribe'] * B, 'langs': ['en'] * B,
             'no_timestamp': False}
    results = attention_beam_search(model, variables, enc, enc_mask,
                                    beam_size=3, infos=infos)
    assert len(results) == B
    for b, r in enumerate(results):
        _check_grammar(r.tokens, msg=f'utt {b}: {r.tokens}')
    # the timestamped run must actually emit timestamps (the anchored
    # prompt + mass rule make an all-text random-weight decode
    # astronomically unlikely across every step of both utterances)
    assert any(t >= TS_BEGIN for r in results for t in r.tokens)

    # no-timestamp mode on the same model: a distinct program whose
    # prompt ends with <|notimestamps|>; just runs and returns hyps
    infos_nt = {'tasks': ['transcribe'] * B, 'langs': ['en'] * B}
    results_nt = attention_beam_search(model, variables, enc, enc_mask,
                                       beam_size=3, infos=infos_nt)
    assert len(results_nt) == B
