"""Ragged-tail batch padding: dummy rows must not bias the loss.

ADVICE r1: target rows must pad with IGNORE_ID (-1) so add_sos_eos sees
zero-length labels; a 0-padded row looks like a full-length token-0
sequence and pollutes the attention loss / th_accuracy.
"""

import jax
import numpy as np

from wenet_tpu.utils.executor import _to_device_batch


def _mesh():
    from wenet_tpu.parallel.mesh import make_mesh
    return make_mesh({'data': 8})


def test_tail_padding_uses_ignore_id():
    mesh = _mesh()
    batch = {
        'feats': np.random.RandomState(0).randn(3, 20, 8).astype('f'),
        'feats_lengths': np.array([20, 18, 15], np.int32),
        'target': np.array([[5, 6, 7], [8, 9, -1], [4, -1, -1]], np.int32),
        'target_lengths': np.array([3, 2, 1], np.int32),
    }
    out = _to_device_batch(batch, mesh)
    assert out['feats'].shape[0] == 8
    tgt = np.asarray(out['target'])
    assert (tgt[3:] == -1).all(), tgt[3:]
    assert (np.asarray(out['feats_lengths'])[3:] == 0).all()
    assert (np.asarray(out['target_lengths'])[3:] == 0).all()


def test_dummy_rows_keep_loss_finite_and_scaled():
    """loss over (B real + pad) == loss over B real, rescaled by the batch
    denominator; grads stay finite."""
    from tests.test_smoke_core import batch, tiny_conformer, tiny_model
    from wenet_tpu.utils.train_utils import (create_train_state,
                                             init_optimizer_and_scheduler,
                                             make_train_step)
    # dropout off: dropout masks are batch-shape dependent, which would
    # add noise between the padded and unpadded runs
    from wenet_tpu.models.transformer.decoder import BiTransformerDecoder
    decoder = BiTransformerDecoder(
        vocab_size=50, encoder_output_size=32, attention_heads=2,
        linear_units=64, num_blocks=2, r_num_blocks=1,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0)
    # layer_norm conv module: batch_norm stats would see the dummy rows'
    # zero frames (exactly like the reference's padded frames do), which
    # breaks exact equality without being a correctness issue
    model = tiny_model(encoder=tiny_conformer(
        dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, cnn_module_norm='layer_norm'),
        decoder=decoder)
    feats, fl, tgt, tl = batch()
    B = feats.shape[0]
    variables = model.init(jax.random.PRNGKey(0), feats, fl, tgt, tl)
    configs = {'optim': 'adam', 'optim_conf': {'lr': 1e-3},
               'scheduler': 'warmuplr',
               'scheduler_conf': {'warmup_steps': 5}, 'grad_clip': 0.0}
    tx, _ = init_optimizer_and_scheduler(configs)

    def losses(b):
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(model, tx))
        _, m = step(state, b, jax.random.PRNGKey(0))
        return {k: float(v) for k, v in m.items()}

    real = {'feats': np.asarray(feats), 'feats_lengths': np.asarray(fl),
            'target': np.asarray(tgt, np.int32),
            'target_lengths': np.asarray(tl)}
    pad = 2
    padded = {
        'feats': np.pad(real['feats'], [(0, pad), (0, 0), (0, 0)]),
        'feats_lengths': np.pad(real['feats_lengths'], (0, pad)),
        'target': np.pad(real['target'], [(0, pad), (0, 0)],
                         constant_values=-1),
        'target_lengths': np.pad(real['target_lengths'], (0, pad)),
    }
    m_real = losses(real)
    m_pad = losses(padded)
    for k in ('loss', 'loss_att', 'loss_ctc', 'grad_norm'):
        assert np.isfinite(m_pad[k]), (k, m_pad)
    # dummy rows (feats_lengths == 0) are excluded from numerator AND
    # denominator of both losses -> padded batch loss is unbiased
    del B, pad
    for k in ('loss', 'loss_att', 'loss_ctc', 'th_accuracy'):
        assert np.isclose(m_pad[k], m_real[k], rtol=2e-3), \
            (k, m_pad, m_real)
