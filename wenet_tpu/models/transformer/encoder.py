"""Transformer / Conformer encoders with streaming chunk forward.

TPU-native rebuild of ref wenet/models/transformer/encoder.py:34-553.
Differences from the reference:

* `forward_chunk` is a pure function over a fixed-shape cache pytree
  (right-aligned KV window + conv left context + validity handled by the
  caller's att_mask).  The reference grows caches dynamically
  (encoder.py:255-298); fixed shapes mean the chunk step jit-compiles
  exactly once per (batch, chunk, cache) config.
* Dynamic-chunk training draws the chunk size from a jax PRNG inside the
  traced step (utils/mask.py), keeping the whole train step one XLA
  program.
"""

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.transformer.cmvn import GlobalCMVN
from wenet_tpu.models.transformer.embedding import (
    NoPositionalEncoding, PositionalEncoding, RelPositionalEncoding,
    RopePositionalEncoding, WhisperPositionalEncoding)
from wenet_tpu.models.transformer.encoder_layer import (
    ConformerEncoderLayer, TransformerEncoderLayer)
from wenet_tpu.models.transformer.norm import get_norm
from wenet_tpu.models.transformer.subsampling import SUBSAMPLE_CLASSES
from wenet_tpu.utils.mask import (add_optional_chunk_mask, make_pad_mask)

IntLike = Union[int, jax.Array]

# encoder streaming cache: (k, v) stacked over layers + conv state
#   att_k/att_v: (num_blocks, B, h_kv, cache_t1, d_k)
#   cnn:         (num_blocks, B, lorder, size)   (absent for transformer)
EncoderCache = Tuple[Optional[Tuple[jax.Array, jax.Array]],
                     Optional[jax.Array]]


def make_pos_enc(pos_enc_layer_type: str, output_size: int,
                 positional_dropout_rate: float, attention_heads: int,
                 name: str = 'pos_enc'):
    if pos_enc_layer_type == 'abs_pos':
        return PositionalEncoding(output_size, positional_dropout_rate,
                                  name=name)
    if pos_enc_layer_type == 'rel_pos':
        return RelPositionalEncoding(output_size, positional_dropout_rate,
                                     name=name)
    if pos_enc_layer_type == 'abs_pos_whisper':
        return WhisperPositionalEncoding(output_size,
                                         positional_dropout_rate, name=name)
    if pos_enc_layer_type == 'rope_pos':
        return RopePositionalEncoding(output_size,
                                      output_size // attention_heads,
                                      positional_dropout_rate, name=name)
    if pos_enc_layer_type == 'no_pos':
        return NoPositionalEncoding(output_size, positional_dropout_rate,
                                    name=name)
    raise ValueError(pos_enc_layer_type)


class BaseEncoder(nn.Module):
    """Shared encoder trunk config. ref: encoder.py:34-118."""
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = 'conv2d'
    pos_enc_layer_type: str = 'abs_pos'
    normalize_before: bool = True
    static_chunk_size: int = 0
    use_dynamic_chunk: bool = False
    use_cmvn: bool = False
    cmvn_norm_var: bool = True
    use_dynamic_left_chunk: bool = False
    # False | True (full per-layer remat, ref encoder.py
    # gradient_checkpointing) | 'selective' (save everything EXCEPT the
    # (T, T) attention scores/softmax, which are recomputed in backward
    # — Megatron-style selective activation recomputation; costs ~2
    # extra (T, T) einsums per layer, removes the largest train
    # residuals from HBM)
    gradient_checkpointing: Union[bool, str] = False
    layer_norm_type: str = 'layer_norm'
    norm_eps: float = 1e-5
    final_norm: bool = True
    query_bias: bool = True
    key_bias: bool = True
    value_bias: bool = True
    activation_type: str = 'relu'
    n_kv_head: Optional[int] = None
    head_dim: Optional[int] = None
    lora_conf: Optional[Tuple] = None
    mlp_type: str = 'position_wise_feed_forward'
    mlp_bias: bool = True
    n_expert: int = 8
    n_expert_activated: int = 2

    def make_layers(self):
        raise NotImplementedError

    # static streaming geometry, usable without binding the module
    _SUBSAMPLE_PROPS = {
        'linear': (1, 0), 'embed': (1, 0), 'conv1d2': (2, 4),
        'conv2d': (4, 6), 'conv2d6': (6, 10), 'conv2d8': (8, 14),
        'stack_n_frames': (2, 0),
    }

    @property
    def subsampling_rate(self) -> int:
        return self._SUBSAMPLE_PROPS[self.input_layer][0]

    @property
    def right_context(self) -> int:
        return self._SUBSAMPLE_PROPS[self.input_layer][1]

    def setup(self):
        if self.use_cmvn:
            self.global_cmvn = GlobalCMVN(self.input_size,
                                          self.cmvn_norm_var,
                                          name='global_cmvn')
        pos_enc = make_pos_enc(self.pos_enc_layer_type, self.output_size,
                               self.positional_dropout_rate,
                               self.attention_heads)
        self.embed = SUBSAMPLE_CLASSES[self.input_layer](
            idim=self.input_size, odim=self.output_size,
            dropout_rate=self.dropout_rate, pos_enc=pos_enc, name='embed')
        self.after_norm = get_norm(self.layer_norm_type, self.output_size,
                                   self.norm_eps, name='after_norm')
        self.encoders = self.make_layers()

    # ------------------------------------------------------------------
    def __call__(self,
                 xs: jax.Array,
                 xs_lens: jax.Array,
                 decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None,
                 full_context: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """Full (padded-batch) forward. ref: encoder.py:122-181.

        `full_context=True` bypasses dynamic/static chunk masking — the
        analog of the reference Dual*Encoder.forward_full
        (ctl_model/encoder.py:77-108), which is the only reference path
        that ignores static_chunk_size.

        Returns (xs (B, T', D), masks (B, 1, T'))."""
        T = xs.shape[1]
        masks = ~make_pad_mask(xs_lens, T)[:, None, :]  # (B, 1, T)
        if self.use_cmvn:
            xs = self.global_cmvn(xs)
        xs, pos_emb, masks = self.embed(xs, masks,
                                        deterministic=not train)
        mask_pad = masks
        if full_context:
            chunk_masks = masks * jnp.swapaxes(masks, 1, 2)
        else:
            chunk_masks = add_optional_chunk_mask(
                masks, self.use_dynamic_chunk,
                self.use_dynamic_left_chunk,
                decoding_chunk_size, self.static_chunk_size,
                num_decoding_left_chunks,
                max_chunk_size=int(100.0 / self.embed.subsampling_rate),
                rng=chunk_rng)
        for layer in self.encoders:
            # full positional call so nn.remat's static_argnums can pin
            # `train` (kwargs don't reach jax.checkpoint statics)
            xs, chunk_masks, _, _ = layer(xs, chunk_masks, pos_emb,
                                          mask_pad, None, None, train)
        if self.normalize_before and self.final_norm:
            xs = self.after_norm(xs)
        return xs, masks

    # ------------------------------------------------------------------
    def forward_chunk(
        self,
        xs: jax.Array,
        offset: IntLike,
        att_cache: Tuple[jax.Array, jax.Array],
        cnn_cache: Optional[jax.Array],
        att_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array], Optional[jax.Array]]:
        """One streaming chunk with fixed-size right-aligned caches.

        ref: encoder.py:204-300.  Args:
          xs: (B, time, mel) raw-feature chunk
            (time == (chunk-1)*subsample + right_context + 1)
          offset: encoder-frame offset of this chunk's first output
          att_cache: (k, v), each (num_blocks, B, h_kv, cache_t1, d_k);
            cache_t1 is the *static* required_cache_size; slots whose
            att_mask bit is 0 are padding (early chunks)
          cnn_cache: (num_blocks, B, lorder, size) or None
          att_mask: (B, 1, cache_t1 + chunk_out) bool marking valid cache
            slots followed by the current chunk (all True)
        Returns (ys (B, chunk_out, D), new att_cache, new cnn_cache) with
        identical shapes — ready for the next call.
        """
        B = xs.shape[0]
        tmp_mask = jnp.ones((B, 1, xs.shape[1]), bool)
        if self.use_cmvn:
            xs = self.global_cmvn(xs)
        xs, _, _ = self.embed(xs, tmp_mask, offset)
        k_cache, v_cache = att_cache
        cache_t1 = k_cache.shape[-2]
        chunk_size = xs.shape[1]
        attention_key_size = cache_t1 + chunk_size
        pos_emb = self.embed.position_encoding(
            jnp.asarray(offset, jnp.int32) - cache_t1, attention_key_size)
        new_k, new_v, new_cnn = [], [], []
        # chunk-validity mask: a padded TAIL chunk (driver keeps shapes
        # static) must not leak garbage into conv windows or pooling —
        # the reference runs the tail chunk at its true shorter length
        mask_pad = (att_mask[:, :, cache_t1:]
                    if att_mask is not None else None)
        for i, layer in enumerate(self.encoders):
            kv = (k_cache[i], v_cache[i])
            layer_cnn_in = None
            if cnn_cache is not None:
                layer_cnn_in = jax.tree_util.tree_map(
                    lambda x, i=i: x[i], cnn_cache)
            xs, _, new_kv, layer_cnn = layer(
                xs, att_mask, pos_emb,
                mask_pad=mask_pad,
                att_cache=kv,
                cnn_cache=layer_cnn_in)
            # right-aligned fixed window (ref keeps [next_cache_start:])
            new_k.append(new_kv[0][:, :, -cache_t1:, :])
            new_v.append(new_kv[1][:, :, -cache_t1:, :])
            if layer_cnn is not None:
                new_cnn.append(layer_cnn)
        if self.normalize_before and self.final_norm:
            xs = self.after_norm(xs)
        r_att = (jnp.stack(new_k, 0), jnp.stack(new_v, 0))
        r_cnn = (jax.tree_util.tree_map(lambda *x: jnp.stack(x, 0),
                                        *new_cnn) if new_cnn else None)
        return xs, r_att, r_cnn

    # ------------------------------------------------------------------
    def zero_cache(self, batch_size: int, required_cache_size: int,
                   dtype=jnp.float32):
        """Build an all-invalid streaming cache (used before chunk 0)."""
        d_k = (self.output_size // self.attention_heads
               if self.head_dim is None else self.head_dim)
        h_kv = (self.attention_heads
                if self.n_kv_head is None else self.n_kv_head)
        k = jnp.zeros((self.num_blocks, batch_size, h_kv,
                       required_cache_size, d_k), dtype)
        cnn = self.zero_cnn_cache(batch_size, dtype)
        return (k, k), cnn

    def zero_cnn_cache(self, batch_size: int, dtype=jnp.float32):
        lorder = getattr(self, 'cnn_lorder', 0)
        if not lorder:
            return None
        channels = getattr(self, 'cnn_cache_channels', self.output_size)
        return jnp.zeros((self.num_blocks, batch_size, lorder, channels),
                         dtype)


def _remat_layer(layer_cls, mode):
    """Per-layer remat wrapper.  mode True: full recompute (ref
    gradient_checkpointing).  mode 'selective': save every residual
    EXCEPT values tagged 'attn_scores' (the (T, T) fp32 score/softmax
    tensors, attention.py) — backward re-derives them from the saved
    q/k/p projections at the cost of ~2 (T, T) einsums per layer."""
    if mode == 'selective':
        # save_anything_except_these_names: every residual is saveable
        # EXCEPT the tagged scores.  (save_any_names_but_these would
        # save ONLY named values — with just one tag in the model that
        # degenerates to full recompute: measured 3.56 TFLOP/step, the
        # same as gradient_checkpointing=True.)
        policy = jax.checkpoint_policies.save_anything_except_these_names(
            'attn_scores')
        return nn.remat(layer_cls, static_argnums=(7,), policy=policy)
    return nn.remat(layer_cls, static_argnums=(7,))


class TransformerEncoder(BaseEncoder):
    """ref: encoder.py:365-436."""
    selfattention_layer_type: str = 'selfattn'

    cnn_lorder: int = 0

    def make_layers(self):
        layer_cls = TransformerEncoderLayer
        if self.gradient_checkpointing:
            layer_cls = _remat_layer(layer_cls,
                                     self.gradient_checkpointing)
        return [
            layer_cls(
                size=self.output_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                normalize_before=self.normalize_before,
                layer_norm_type=self.layer_norm_type,
                norm_eps=self.norm_eps,
                selfattention_layer_type=self.selfattention_layer_type,
                activation_type=self.activation_type,
                mlp_type=self.mlp_type, mlp_bias=self.mlp_bias,
                n_expert=self.n_expert,
                n_expert_activated=self.n_expert_activated,
                query_bias=self.query_bias, key_bias=self.key_bias,
                value_bias=self.value_bias, n_kv_head=self.n_kv_head,
                head_dim=self.head_dim, lora_conf=self.lora_conf,
            ) for _ in range(self.num_blocks)
        ]


class ConformerEncoder(BaseEncoder):
    """ref: encoder.py:438-553."""
    pos_enc_layer_type: str = 'rel_pos'
    selfattention_layer_type: str = 'rel_selfattn'
    activation_type: str = 'swish'
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    cnn_module_norm: str = 'batch_norm'
    conv_bias: bool = True
    conv_norm_eps: float = 1e-5
    conv_inner_factor: int = 2

    @property
    def cnn_lorder(self) -> int:
        if self.use_cnn_module and self.causal:
            return self.cnn_module_kernel - 1
        return 0

    def make_layers(self):
        layer_cls = ConformerEncoderLayer
        if self.gradient_checkpointing:
            layer_cls = _remat_layer(layer_cls,
                                     self.gradient_checkpointing)
        return [
            layer_cls(
                size=self.output_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                normalize_before=self.normalize_before,
                layer_norm_type=self.layer_norm_type,
                norm_eps=self.norm_eps,
                selfattention_layer_type=self.selfattention_layer_type,
                activation_type=self.activation_type,
                macaron_style=self.macaron_style,
                use_cnn_module=self.use_cnn_module,
                cnn_module_kernel=self.cnn_module_kernel,
                causal=self.causal,
                cnn_module_norm=self.cnn_module_norm,
                conv_bias=self.conv_bias,
                conv_norm_eps=self.conv_norm_eps,
                conv_inner_factor=self.conv_inner_factor,
                mlp_type=self.mlp_type, mlp_bias=self.mlp_bias,
                n_expert=self.n_expert,
                n_expert_activated=self.n_expert_activated,
                query_bias=self.query_bias, key_bias=self.key_bias,
                value_bias=self.value_bias, n_kv_head=self.n_kv_head,
                head_dim=self.head_dim, lora_conf=self.lora_conf,
            ) for _ in range(self.num_blocks)
        ]
