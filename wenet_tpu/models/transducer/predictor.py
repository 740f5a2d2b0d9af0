"""Transducer predictors. ref: wenet/models/transducer/predictor.py:60-495.

The LSTM keeps the torch parameter layout (weight_ih_l{k} (4H, in) with
[i, f, g, o] gate order) so reference checkpoints import directly; the
recurrence is a lax.scan with one fused gate matmul per step (MXU).
All predictors expose:
  __call__(input, cache=None) -> (B, U, P)         (training)
  init_state(batch_size)      -> state pytree
  forward_step(input, padding, state) -> (out (B,1,P), new state)
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.activations import get_activation


class _KernelHolder(nn.Module):
    """Bare kernel parameter stored under a Dense-compatible path."""
    shape: Tuple[int, ...]

    def setup(self):
        self.kernel = self.param('kernel',
                                 nn.initializers.lecun_normal(),
                                 self.shape)


class TorchLSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM with torch-compatible
    parameters."""
    input_size: int
    hidden_size: int
    num_layers: int
    bias: bool = True
    dropout: float = 0.0
    bidirectional: bool = False

    def _make_layer(self, k, in_dim, suffix=''):
        return {
            'weight_ih': self.param(f'weight_ih_l{k}{suffix}',
                                    nn.initializers.lecun_normal(),
                                    (4 * self.hidden_size, in_dim)),
            'weight_hh': self.param(f'weight_hh_l{k}{suffix}',
                                    nn.initializers.orthogonal(),
                                    (4 * self.hidden_size,
                                     self.hidden_size)),
            'bias_ih': self.param(f'bias_ih_l{k}{suffix}',
                                  nn.initializers.zeros,
                                  (4 * self.hidden_size,))
            if self.bias else None,
            'bias_hh': self.param(f'bias_hh_l{k}{suffix}',
                                  nn.initializers.zeros,
                                  (4 * self.hidden_size,))
            if self.bias else None,
        }

    def setup(self):
        dirs = 2 if self.bidirectional else 1
        ks, rks = [], []
        for k in range(self.num_layers):
            in_dim = (self.input_size
                      if k == 0 else self.hidden_size * dirs)
            ks.append(self._make_layer(k, in_dim))
            if self.bidirectional:
                rks.append(self._make_layer(k, in_dim, '_reverse'))
        self.layers = ks
        self.rlayers = rks
        self.interlayer_dropout = Dropout(self.dropout)

    def _cell(self, p, x, h, c):
        gates = x @ p['weight_ih'].T + h @ p['weight_hh'].T
        if self.bias:
            gates = gates + p['bias_ih'] + p['bias_hh']
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    def _run_dir(self, p, xs, h0, c0, reverse=False):
        def step(carry, xt):
            h, c = carry
            h, c = self._cell(p, xt, h, c)
            return (h, c), h

        (h, c), ys = jax.lax.scan(step, (h0, c0),
                                  jnp.swapaxes(xs, 0, 1),
                                  reverse=reverse)
        return jnp.swapaxes(ys, 0, 1), h, c

    def __call__(self, x, state, train: bool = False):
        """x: (B, L, E); state: (h, c) each (num_layers*dirs, B, H).

        train: applies torch nn.LSTM's inter-layer dropout (after
        every layer except the last) when self.dropout > 0."""
        h0, c0 = state
        dirs = 2 if self.bidirectional else 1
        hs, cs = [], []
        for k in range(self.num_layers):
            fwd, h, c = self._run_dir(self.layers[k], x,
                                      h0[k * dirs], c0[k * dirs])
            hs.append(h)
            cs.append(c)
            if self.bidirectional:
                bwd, hr, cr = self._run_dir(self.rlayers[k], x,
                                            h0[k * dirs + 1],
                                            c0[k * dirs + 1],
                                            reverse=True)
                hs.append(hr)
                cs.append(cr)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
            if self.dropout > 0 and k < self.num_layers - 1:
                x = self.interlayer_dropout(x, deterministic=not train)
        return x, (jnp.stack(hs), jnp.stack(cs))

    def step(self, x, state):
        """x: (B, E) single step (unidirectional only)."""
        assert not self.bidirectional
        h0, c0 = state
        hs, cs = [], []
        for k in range(self.num_layers):
            h, c = self._cell(self.layers[k], x, h0[k], c0[k])
            x = h
            hs.append(h)
            cs.append(c)
        return x, (jnp.stack(hs), jnp.stack(cs))


class RNNPredictor(nn.Module):
    """ref: predictor.py:60-230."""
    voca_size: int
    embed_size: int
    output_size: int
    embed_dropout: float
    hidden_size: int
    num_layers: int
    bias: bool = True
    rnn_type: str = 'lstm'
    dropout: float = 0.1

    def setup(self):
        assert self.rnn_type == 'lstm', 'only lstm predictor for now'
        self.embed = nn.Embed(self.voca_size, self.embed_size,
                              name='embed')
        self.dropout_layer = Dropout(self.embed_dropout)
        self.rnn = TorchLSTM(input_size=self.embed_size,
                             hidden_size=self.hidden_size,
                             num_layers=self.num_layers, bias=self.bias,
                             dropout=self.dropout, name='rnn')
        self.projection = nn.Dense(self.output_size, name='projection')

    def init_state(self, batch_size: int, dtype=jnp.float32):
        z = jnp.zeros((self.num_layers, batch_size, self.hidden_size),
                      dtype)
        return (z, z)

    def __call__(self, input: jax.Array, cache=None,
                 train: bool = False) -> jax.Array:
        emb = self.dropout_layer(self.embed(input),
                                 deterministic=not train)
        state = cache if cache is not None else self.init_state(
            input.shape[0], emb.dtype)
        out, _ = self.rnn(emb, state, train=train)
        return self.projection(out)

    def select_state(self, new_state, old_state, keep_new: jax.Array):
        """Per-row state select; keep_new: (B,) bool (batch on axis 1)."""
        m = keep_new[None, :, None]
        return tuple(jnp.where(m, n, o)
                     for n, o in zip(new_state, old_state))

    def forward_step(self, input: jax.Array, padding: jax.Array,
                     cache) -> Tuple[jax.Array, Tuple]:
        """input (B, 1); padding (B, 1) 1==pad."""
        emb = self.embed(input)[:, 0]  # (B, E)
        h, (m, c) = self.rnn.step(emb, cache)
        out = self.projection(h)[:, None, :]
        keep = (1.0 - padding.reshape(1, -1, 1))
        m = cache[0] * (1 - keep) + m * keep
        c = cache[1] * (1 - keep) + c * keep
        return out, (m, c)


class EmbeddingPredictor(nn.Module):
    """Stateless n-gram attention predictor. ref: predictor.py:222-378."""
    voca_size: int
    embed_size: int
    output_size: int
    embed_dropout: float
    n_head: int
    history_size: int = 2
    activation: str = 'swish'
    bias: bool = False
    layer_norm_epsilon: float = 1e-5

    @property
    def context_size(self) -> int:
        return self.history_size + 1

    def setup(self):
        assert self.output_size == self.embed_size
        # torch keeps an (unused-as-layer) Linear whose weight matrix is
        # read directly (ref predictor.py:235-238, 309-312); store the
        # kernel under the same Dense-style path for ckpt import
        self.pos_embed = _KernelHolder(
            shape=(self.context_size * self.embed_size, self.n_head),
            name='pos_embed')
        self.embed = nn.Embed(self.voca_size, self.embed_size,
                              name='embed')
        self.embed_dropout_layer = Dropout(self.embed_dropout)
        self.ffn = nn.Dense(self.embed_size, name='ffn')
        self.norm = nn.LayerNorm(epsilon=self.layer_norm_epsilon,
                                 name='norm')

    def init_state(self, batch_size: int, dtype=jnp.float32):
        return (jnp.zeros(
            (batch_size, self.context_size - 1, self.embed_size),
            dtype),)

    def __call__(self, input: jax.Array, cache=None,
                 train: bool = False) -> jax.Array:
        emb = self.embed_dropout_layer(self.embed(input),
                                       deterministic=not train)
        B, L, E = emb.shape
        zeros = cache[0] if cache is not None else self.init_state(
            B, emb.dtype)[0]
        x = jnp.concatenate([zeros, emb], axis=1)  # (B, C-1+L, E)
        C = self.context_size
        idx = jnp.arange(L)[:, None] + jnp.arange(C)[None, :]
        windows = x[:, idx]  # (B, L, C, E)
        # multi-head position weights: torch pos_embed.weight (H, C*E)
        # viewed as (H, E, C) then permuted to (H, C, E)
        kernel = self.pos_embed_kernel()  # (H, C, E)
        weight = jnp.einsum('blce,hce->blhc', windows, kernel)
        out = jnp.einsum('blhc,blce->blhe', weight, windows)
        out = jnp.sum(out, axis=2) / (self.n_head * C)
        out = self.ffn(out)
        out = self.norm(out)
        return get_activation(self.activation)(out)

    def pos_embed_kernel(self):
        # flax kernel (C*E, H) <-> torch weight (H, C*E) viewed as
        # (H, E, C) then permuted to (H, C, E) (ref predictor.py:309-316)
        k = self.pos_embed.kernel
        H = self.n_head
        C, E = self.context_size, self.embed_size
        return jnp.transpose(k, (1, 0)).reshape(H, E, C).transpose(
            0, 2, 1)

    def select_state(self, new_state, old_state, keep_new: jax.Array):
        m = keep_new[:, None, None]
        return tuple(jnp.where(m, n, o)
                     for n, o in zip(new_state, old_state))

    def forward_step(self, input: jax.Array, padding: jax.Array,
                     cache) -> Tuple[jax.Array, Tuple]:
        history = cache[0]
        emb = self.embed(input)  # (B, 1, E)
        context = jnp.concatenate([history, emb], axis=1)  # (B, C, E)
        windows = context[:, None, :, :]  # (B, 1, C, E)
        kernel = self.pos_embed_kernel()
        weight = jnp.einsum('blce,hce->blhc', windows, kernel)
        out = jnp.einsum('blhc,blce->blhe', weight, windows)
        out = jnp.sum(out, axis=2) / (self.n_head * self.context_size)
        out = self.ffn(out)
        out = self.norm(out)
        out = get_activation(self.activation)(out)
        return out, (context[:, 1:, :],)


class ConvPredictor(nn.Module):
    """Depthwise-conv predictor. ref: predictor.py:380-495."""
    voca_size: int
    embed_size: int
    output_size: int
    embed_dropout: float
    history_size: int = 2
    activation: str = 'relu'
    bias: bool = False
    layer_norm_epsilon: float = 1e-5

    @property
    def context_size(self) -> int:
        return self.history_size + 1

    def setup(self):
        assert self.embed_size == self.output_size
        self.embed = nn.Embed(self.voca_size, self.embed_size,
                              name='embed')
        self.embed_dropout_layer = Dropout(self.embed_dropout)
        self.conv = nn.Conv(self.embed_size, (self.context_size,),
                            padding='VALID',
                            feature_group_count=self.embed_size,
                            use_bias=self.bias, name='conv')
        self.norm = nn.LayerNorm(epsilon=self.layer_norm_epsilon,
                                 name='norm')

    def init_state(self, batch_size: int, dtype=jnp.float32):
        return (jnp.zeros(
            (batch_size, self.context_size - 1, self.embed_size),
            dtype),)

    def __call__(self, input: jax.Array, cache=None,
                 train: bool = False) -> jax.Array:
        emb = self.embed_dropout_layer(self.embed(input),
                                       deterministic=not train)
        zeros = cache[0] if cache is not None else self.init_state(
            input.shape[0], emb.dtype)[0]
        x = jnp.concatenate([zeros, emb], axis=1)
        out = self.conv(x)
        return get_activation(self.activation)(self.norm(out))

    def select_state(self, new_state, old_state, keep_new: jax.Array):
        m = keep_new[:, None, None]
        return tuple(jnp.where(m, n, o)
                     for n, o in zip(new_state, old_state))

    def forward_step(self, input: jax.Array, padding: jax.Array,
                     cache) -> Tuple[jax.Array, Tuple]:
        history = cache[0]
        emb = self.embed(input)
        context = jnp.concatenate([history, emb], axis=1)
        out = self.conv(context)
        out = get_activation(self.activation)(self.norm(out))
        return out, (context[:, 1:, :],)


PREDICTOR_CLASSES = {
    'rnn': RNNPredictor,
    'embedding': EmbeddingPredictor,
    'conv': ConvPredictor,
}
