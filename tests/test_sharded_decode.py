"""Data-parallel sharded batch decode (AsrRunner mesh=...): hypothesis
identity vs the single-device runner on the 8-virtual-CPU mesh.

No reference analog — the ref C++ runtime decodes per-connection on
host CPUs (runtime/core/decoder/asr_decoder.cc); sharding ONE fused
decode program over the `data` mesh axis is the TPU-native scale-out
path (VERDICT r3 next-round item #8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from wenet_tpu.utils.init_model import init_model, init_variables


@pytest.fixture(scope='module')
def tiny_model():
    configs = {
        'input_dim': 80, 'output_dim': 31,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7,
                         'cnn_module_norm': 'layer_norm'},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1, 'r_num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3, 'reverse_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    return model, variables


@pytest.fixture(scope='module')
def runners(tiny_model):
    from wenet_tpu.models.runner import AsrRunner
    model, variables = tiny_model
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ('data',))
    return (AsrRunner(model, variables),
            AsrRunner(model, variables, mesh=mesh))


def _batches(n=2, b=8, t=96):
    rng = np.random.RandomState(0)
    out = []
    for i in range(n):
        feats = rng.randn(b, t, 80).astype(np.float32)
        lens = np.full((b,), t, np.int32)
        lens[0] = t - 17  # ragged rows must shard identically
        out.append((feats, lens))
    return out


def test_sharded_greedy_identical(runners):
    single, sharded = runners
    batches = _batches()
    a = [r for br in single.decode_ctc_greedy_batches(batches)
         for r in br]
    b = [r for br in sharded.decode_ctc_greedy_batches(batches)
         for r in br]
    assert [x.tokens for x in a] == [x.tokens for x in b]


def test_sharded_inputs_actually_sharded(runners):
    """The committed input sharding must survive into the program:
    the batch upload places shards on all 8 devices."""
    _, sharded = runners
    feats, lens = _batches(n=1)[0]
    df, dl = sharded._put_batch(feats, lens)
    assert len(set(d.device for d in df.addressable_shards)) == 8
    assert df.sharding.spec[0] == 'data'


def test_sharded_prefix_beam_identical(runners):
    single, sharded = runners
    batches = _batches()
    a = [r for br in single.decode_prefix_beam_batches(
        batches, beam_size=4) for r in br]
    b = [r for br in sharded.decode_prefix_beam_batches(
        batches, beam_size=4) for r in br]
    assert [x.tokens for x in a] == [x.tokens for x in b]
    for x, y in zip(a, b):
        np.testing.assert_allclose(x.score, y.score, rtol=1e-5)


def test_sharded_attention_beam_identical(runners):
    single, sharded = runners
    batches = _batches()
    a = [r for br in single.decode_attention_batches(
        batches, beam_size=2) for r in br]
    b = [r for br in sharded.decode_attention_batches(
        batches, beam_size=2) for r in br]
    assert [x.tokens for x in a] == [x.tokens for x in b]


def test_sharded_ragged_batch_padded_and_trimmed(runners):
    """A final batch whose B is NOT a multiple of the data-axis size
    (here 3 over 8 devices) must decode identically: `_put_batch` pads
    by repeating the last row, `_pipeline` trims the pad rows
    (ADVICE r4: ragged final dataset batch must not kill the job)."""
    single, sharded = runners
    full = _batches(n=1)[0]
    ragged = (full[0][:3], full[1][:3])
    batches = [full, ragged]
    a = [br for br in single.decode_ctc_greedy_batches(batches)]
    b = [br for br in sharded.decode_ctc_greedy_batches(batches)]
    assert [len(br) for br in b] == [8, 3]
    assert [[x.tokens for x in br] for br in a] \
        == [[x.tokens for x in br] for br in b]
    # attention path with per-row infos survives padding too
    infos = {'tasks': ['transcribe'] * 3, 'langs': ['zh'] * 3}
    c = list(sharded.decode_attention_batches(
        [(ragged[0], ragged[1], infos)], beam_size=2))
    d = list(single.decode_attention_batches(
        [(ragged[0], ragged[1], infos)], beam_size=2))
    assert [x.tokens for x in c[0]] == [x.tokens for x in d[0]]
    assert len(c[0]) == 3


def test_sharded_rescoring_identical(runners):
    single, sharded = runners
    batches = _batches()
    a = [r for br in single.decode_rescoring_batches(
        batches, beam_size=4, ctc_weight=0.3, reverse_weight=0.3)
        for r in br]
    b = [r for br in sharded.decode_rescoring_batches(
        batches, beam_size=4, ctc_weight=0.3, reverse_weight=0.3)
        for r in br]
    assert [x.tokens for x in a] == [x.tokens for x in b]
