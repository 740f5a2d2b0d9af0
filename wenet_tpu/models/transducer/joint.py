"""Transducer joint network. ref: wenet/models/transducer/joint.py:8-106."""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.activations import get_activation


class TransducerJoint(nn.Module):
    vocab_size: int
    enc_output_size: int
    pred_output_size: int
    join_dim: int
    prejoin_linear: bool = True
    postjoin_linear: bool = False
    joint_mode: str = 'add'
    activation: str = 'tanh'
    hat_joint: bool = False
    dropout_rate: float = 0.1
    hat_activation: str = 'tanh'

    def setup(self):
        assert self.joint_mode in ['add']
        if not self.prejoin_linear and not self.postjoin_linear:
            assert (self.enc_output_size == self.pred_output_size ==
                    self.join_dim)
        if self.prejoin_linear:
            self.enc_ffn = nn.Dense(self.join_dim, name='enc_ffn')
            self.pred_ffn = nn.Dense(self.join_dim, name='pred_ffn')
        if self.postjoin_linear:
            self.post_ffn = nn.Dense(self.join_dim, name='post_ffn')
        if not self.hat_joint:
            self.ffn_out = nn.Dense(self.vocab_size, name='ffn_out')
        else:
            self.blank_pred_lin = nn.Dense(1, name='blank_pred_2')
            self.token_pred_lin = nn.Dense(self.vocab_size - 1,
                                           name='token_pred_2')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, enc_out: jax.Array, pred_out: jax.Array,
                 pre_project: bool = True,
                 train: bool = False) -> jax.Array:
        """enc_out: (B, T, E) or (B, T, 1, D); pred_out: (B, U, P) ->
        (B, T, U, V)."""
        if pre_project and self.prejoin_linear:
            enc_out = self.enc_ffn(enc_out)
            pred_out = self.pred_ffn(pred_out)
        if enc_out.ndim != 4:
            enc_out = enc_out[:, :, None, :]
        if pred_out.ndim != 4:
            pred_out = pred_out[:, None, :, :]
        out = enc_out + pred_out
        if self.postjoin_linear:
            out = self.post_ffn(out)
        if not self.hat_joint:
            out = get_activation(self.activation)(out)
            return self.ffn_out(out)
        # HAT factorization (ref joint.py:96-106)
        det = not train
        blank_logp = jax.nn.log_sigmoid(
            self.blank_pred_lin(
                self.dropout(jnp.tanh(out), deterministic=det)))
        scale_logp = jnp.clip(1 - jnp.exp(blank_logp), 1e-6, None)
        label_logp = jax.nn.log_softmax(
            self.token_pred_lin(
                self.dropout(get_activation(self.hat_activation)(out),
                             deterministic=det)), axis=-1)
        label_logp = jnp.log(scale_logp) + label_logp
        return jnp.concatenate([blank_logp, label_logp], axis=-1)
