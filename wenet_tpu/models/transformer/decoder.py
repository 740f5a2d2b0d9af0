"""AR transformer decoder (+ U2++ bidirectional). ref: wenet/models/transformer/decoder.py:33-495.

The incremental path (`init_decode_state` / `forward_step`) replaces the
reference's dict-of-growing-tensors cache (decoder.py:226-281) with a
fixed-size per-layer ring cache + precomputed cross-attention kv, so
attention_beam_search runs as a single lax.scan.
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.transformer.attention import T_CACHE
from wenet_tpu.models.transformer.decoder_layer import DecoderLayer
from wenet_tpu.models.transformer.embedding import (
    LearnablePositionalEncoding, NoPositionalEncoding, PositionalEncoding)
from wenet_tpu.models.transformer.norm import get_norm
from wenet_tpu.utils.mask import make_pad_mask, subsequent_mask

# decode state: list of per-layer self kv ring buffers + cross kv
DecodeState = Tuple[List[T_CACHE], List[Optional[T_CACHE]]]


class _OutputBias(nn.Module):
    """Bias of a weight-tied output projection (torch key
    `output_layer.bias`; the tied Linear's weight is the embedding)."""
    vocab_size: int

    @nn.compact
    def __call__(self, logits):
        bias = self.param('bias', nn.initializers.zeros,
                          (self.vocab_size,))
        return logits + bias.astype(logits.dtype)


class TransformerDecoder(nn.Module):
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    input_layer: str = 'embed'
    use_output_layer: bool = True
    normalize_before: bool = True
    src_attention: bool = True
    query_bias: bool = True
    key_bias: bool = True
    value_bias: bool = True
    activation_type: str = 'relu'
    gradient_checkpointing: bool = False
    tie_word_embedding: bool = False
    layer_norm_type: str = 'layer_norm'
    norm_eps: float = 1e-5
    n_kv_head: Optional[int] = None
    head_dim: Optional[int] = None
    lora_conf: Optional[Tuple] = None
    mlp_type: str = 'position_wise_feed_forward'
    mlp_bias: bool = True
    n_expert: int = 8
    n_expert_activated: int = 2
    src_query_bias: bool = True
    src_key_bias: bool = True
    src_value_bias: bool = True
    learnable_pe_max_len: int = 448  # whisper n_text_ctx

    def setup(self):
        dim = self.encoder_output_size
        if self.input_layer != 'no_pos':
            self.embed_tokens = nn.Embed(self.vocab_size, dim, name='embed')
        if self.input_layer == 'embed_learnable_pe':
            self.pos_enc = LearnablePositionalEncoding(
                dim, self.positional_dropout_rate,
                max_len=self.learnable_pe_max_len, name='pos_enc')
        elif self.input_layer == 'no_pos':
            self.pos_enc = NoPositionalEncoding(
                dim, self.positional_dropout_rate, name='pos_enc')
        else:
            self.pos_enc = PositionalEncoding(
                dim, self.positional_dropout_rate, name='pos_enc')
        self.after_norm = get_norm(self.layer_norm_type, dim, self.norm_eps,
                                   name='after_norm')
        if self.use_output_layer and not self.tie_word_embedding:
            self.output_layer = nn.Dense(self.vocab_size,
                                         name='output_layer')
        elif self.use_output_layer:
            # tied embedding shares the WEIGHT only — the reference's
            # output_layer keeps its own bias (decoder.py:111 +
            # tie_or_clone_weights, asr_model.py); firered checkpoints
            # carry a trained bias, whisper ones leave it at zero
            self.output_layer = _OutputBias(vocab_size=self.vocab_size,
                                            name='output_layer')
        layer_cls = DecoderLayer
        if self.gradient_checkpointing:
            layer_cls = nn.remat(layer_cls, static_argnums=(5,))
        self.decoders = [
            layer_cls(
                size=dim,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                self_attention_dropout_rate=self.self_attention_dropout_rate,
                src_attention_dropout_rate=self.src_attention_dropout_rate,
                normalize_before=self.normalize_before,
                src_attention=self.src_attention,
                layer_norm_type=self.layer_norm_type,
                norm_eps=self.norm_eps,
                activation_type=self.activation_type,
                mlp_type=self.mlp_type, mlp_bias=self.mlp_bias,
                n_expert=self.n_expert,
                n_expert_activated=self.n_expert_activated,
                query_bias=self.query_bias, key_bias=self.key_bias,
                value_bias=self.value_bias,
                src_query_bias=self.src_query_bias,
                src_key_bias=self.src_key_bias,
                src_value_bias=self.src_value_bias,
                n_kv_head=self.n_kv_head, head_dim=self.head_dim,
                lora_conf=self.lora_conf,
            ) for _ in range(self.num_blocks)
        ]

    # ------------------------------------------------------------------
    def _embed(self, tgt, offset=0, deterministic=True):
        if self.input_layer == 'no_pos':
            x = tgt
        else:
            x = self.embed_tokens(tgt)
        x, _ = self.pos_enc(x, offset, deterministic=deterministic)
        return x

    def _output(self, x):
        if not self.use_output_layer:
            return x
        if self.tie_word_embedding:
            return self.output_layer(self.embed_tokens.attend(x))
        return self.output_layer(x)

    # ------------------------------------------------------------------
    def __call__(self,
                 memory: jax.Array,
                 memory_mask: jax.Array,
                 ys_in_pad: jax.Array,
                 ys_in_lens: jax.Array,
                 r_ys_in_pad: Optional[jax.Array] = None,
                 reverse_weight: float = 0.0,
                 train: bool = False):
        """ref: decoder.py:146-201.  Returns (logits, 0.0, olens)."""
        del r_ys_in_pad, reverse_weight
        tgt = ys_in_pad
        maxlen = tgt.shape[1]
        tgt_mask = (~make_pad_mask(ys_in_lens, maxlen))[:, None, :]
        m = subsequent_mask(maxlen)[None, :, :]
        tgt_mask = tgt_mask & m
        x = self._embed(tgt, deterministic=not train)
        for layer in self.decoders:
            x, tgt_mask, memory, memory_mask = layer(x, tgt_mask, memory,
                                                     memory_mask, train)
        if self.normalize_before:
            x = self.after_norm(x)
        x = self._output(x)
        # valid output lengths (row 0 of the causal mask is always
        # [1,0,...] — summing it would give the constant 1)
        olens = ys_in_lens
        return x, jnp.asarray(0.0), olens

    # -- scan-friendly incremental decoding ----------------------------
    def init_state(self, memory: jax.Array, max_len: int) -> DecodeState:
        """Allocate ring caches + precompute cross kv for `memory`."""
        B = memory.shape[0]
        d_k = (self.encoder_output_size // self.attention_heads
               if self.head_dim is None else self.head_dim)
        h_kv = (self.attention_heads
                if self.n_kv_head is None else self.n_kv_head)
        self_caches = []
        cross_kv = []
        for layer in self.decoders:
            z = jnp.zeros((B, h_kv, max_len, d_k), memory.dtype)
            self_caches.append((z, z))
            cross_kv.append(layer.precompute_cross_kv(memory))
        return self_caches, cross_kv

    def forward_step(self,
                     tokens: jax.Array,
                     step: jax.Array,
                     state: DecodeState,
                     memory_mask: Optional[jax.Array]
                     ) -> Tuple[jax.Array, DecodeState]:
        """One AR step: tokens (B, 1) int32 -> log-probs (B, V).

        `step` is the 0-based position of `tokens` in the sequence."""
        self_caches, cross_kv = state
        x = self._embed(tokens, offset=step)
        new_self = []
        for i, layer in enumerate(self.decoders):
            x, c = layer.step(x, step, self_caches[i], cross_kv[i],
                              memory_mask)
            new_self.append(c)
        y = self.after_norm(x[:, -1]) if self.normalize_before else x[:, -1]
        y = self._output(y)
        return jax.nn.log_softmax(y, axis=-1), (new_self, cross_kv)


class BiTransformerDecoder(nn.Module):
    """L2R + R2L decoder pair for U2++. ref: decoder.py:314-495."""
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    r_num_blocks: int = 0
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    input_layer: str = 'embed'
    use_output_layer: bool = True
    normalize_before: bool = True
    src_attention: bool = True
    query_bias: bool = True
    key_bias: bool = True
    value_bias: bool = True
    activation_type: str = 'relu'
    gradient_checkpointing: bool = False
    tie_word_embedding: bool = False
    layer_norm_type: str = 'layer_norm'
    norm_eps: float = 1e-5
    n_kv_head: Optional[int] = None
    head_dim: Optional[int] = None
    lora_conf: Optional[Tuple] = None
    mlp_type: str = 'position_wise_feed_forward'
    mlp_bias: bool = True
    n_expert: int = 8
    n_expert_activated: int = 2

    def _decoder_kwargs(self, num_blocks):
        return dict(
            vocab_size=self.vocab_size,
            encoder_output_size=self.encoder_output_size,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            num_blocks=num_blocks,
            dropout_rate=self.dropout_rate,
            positional_dropout_rate=self.positional_dropout_rate,
            self_attention_dropout_rate=self.self_attention_dropout_rate,
            src_attention_dropout_rate=self.src_attention_dropout_rate,
            input_layer=self.input_layer,
            use_output_layer=self.use_output_layer,
            normalize_before=self.normalize_before,
            src_attention=self.src_attention,
            query_bias=self.query_bias, key_bias=self.key_bias,
            value_bias=self.value_bias,
            activation_type=self.activation_type,
            gradient_checkpointing=self.gradient_checkpointing,
            tie_word_embedding=self.tie_word_embedding,
            layer_norm_type=self.layer_norm_type, norm_eps=self.norm_eps,
            n_kv_head=self.n_kv_head, head_dim=self.head_dim,
            mlp_type=self.mlp_type, mlp_bias=self.mlp_bias,
            n_expert=self.n_expert,
            n_expert_activated=self.n_expert_activated,
            lora_conf=self.lora_conf,
        )

    def setup(self):
        self.left_decoder = TransformerDecoder(
            **self._decoder_kwargs(self.num_blocks), name='left_decoder')
        self.right_decoder = TransformerDecoder(
            **self._decoder_kwargs(self.r_num_blocks), name='right_decoder')

    def __call__(self, memory, memory_mask, ys_in_pad, ys_in_lens,
                 r_ys_in_pad=None, reverse_weight: float = 0.0,
                 train: bool = False):
        l_x, _, olens = self.left_decoder(memory, memory_mask, ys_in_pad,
                                          ys_in_lens, train=train)
        r_x = jnp.asarray(0.0)
        if reverse_weight > 0.0:
            r_x, _, olens = self.right_decoder(memory, memory_mask,
                                               r_ys_in_pad, ys_in_lens,
                                               train=train)
        return l_x, r_x, olens

    def init_state(self, memory, max_len):
        return self.left_decoder.init_state(memory, max_len)

    def forward_step(self, tokens, step, state, memory_mask):
        return self.left_decoder.forward_step(tokens, step, state,
                                              memory_mask)
