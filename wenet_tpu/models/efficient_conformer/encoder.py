"""Efficient Conformer encoder (progressive downsampling + grouped attention).

ref: wenet/models/efficient_conformer/{encoder.py:38-560,
encoder_layer.py:24-180, attention.py:28-258, convolution.py:23-140,
subsampling.py:25-80}.
"""

import math
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.activations import get_activation
from wenet_tpu.models.transformer.attention import (
    ATTENTION_CLASSES, attention_core)
from wenet_tpu.models.transformer.cmvn import GlobalCMVN
from wenet_tpu.models.transformer.embedding import (
    sinusoidal_position_encoding)
from wenet_tpu.models.transformer.positionwise_feed_forward import (
    PositionwiseFeedForward)
from wenet_tpu.utils.mask import add_optional_chunk_mask, make_pad_mask


class GroupedRelPosAttention(nn.Module):
    """Grouped rel-pos attention: frames grouped by `group_size` before
    attention (keys/queries of d_k*group). ref: attention.py:28-258."""
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    group_size: int = 3

    @property
    def d_k(self):
        return self.n_feat // self.n_head

    @nn.compact
    def __call__(self, x, mask=None, pos_emb=None, cache=None):
        B, T, _ = x.shape
        g = self.group_size
        q = nn.Dense(self.n_feat, name='linear_q')(x)
        k = nn.Dense(self.n_feat, name='linear_k')(x)
        v = nn.Dense(self.n_feat, name='linear_v')(x)
        p = nn.Dense(self.n_feat, use_bias=False,
                     name='linear_pos')(pos_emb)

        def heads(t):
            return jnp.swapaxes(
                t.reshape(t.shape[0], -1, self.n_head, self.d_k), 1, 2)

        q, k, v = heads(q), heads(k), heads(v)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=-2)
            v = jnp.concatenate([cache[1], v], axis=-2)
        new_cache = (k, v)
        if mask is not None and mask.shape[1] == 1:
            # streaming (broadcast key-validity mask): grouping CONCATS
            # g neighbouring frames into one row, so a pad frame's
            # content leaks into its group-mates.  The reference's
            # dynamic-shape streaming zero-pads instead — zero the
            # k/v/q/p of invalid slots so half-valid groups match it
            # exactly (full-forward (B,T,T) masks keep the reference's
            # own data-pad dilution)
            kvalid = mask[:, 0, :].astype(k.dtype)
            k = k * kvalid[:, None, :, None]
            v = v * kvalid[:, None, :, None]
            q = q * kvalid[:, None, -T:, None]
            p = p * mask[:, 0, :, None].astype(p.dtype)

        def pad_group(t):
            # (B, h, T, d) -> (B, h, ceil(T/g), d*g)
            L = t.shape[2]
            padl = (-L) % g
            t = jnp.pad(t, ((0, 0), (0, 0), (0, padl), (0, 0)))
            t = jnp.swapaxes(t, 1, 2).reshape(
                t.shape[0], -1, self.n_head, self.d_k * g)
            return jnp.swapaxes(t, 1, 2), padl

        qg, padding_q = pad_group(q)
        kg, _ = pad_group(k)
        vg, _ = pad_group(v)
        Pb = p.shape[0]
        padp = (-p.shape[1]) % g
        p = jnp.pad(p, ((0, 0), (0, padp), (0, 0)))
        pg = jnp.swapaxes(
            p.reshape(Pb, -1, self.n_head, self.d_k * g), 1, 2)
        gmask = None
        if mask is not None:
            gmask = mask[:, ::g, ::g]
            gmask = gmask[..., None, :, :]

        u = self.param('pos_bias_u', nn.initializers.xavier_uniform(),
                       (self.n_head, self.d_k * g)).astype(qg.dtype)
        w = self.param('pos_bias_v', nn.initializers.xavier_uniform(),
                       (self.n_head, self.d_k * g)).astype(qg.dtype)
        ac = jnp.einsum('bhqd,bhkd->bhqk', qg + u[None, :, None, :], kg,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum('bhqd,bhkd->bhqk', qg + w[None, :, None, :], pg,
                        preferred_element_type=jnp.float32)
        scores = (ac + bd) / math.sqrt(self.d_k * g)
        if gmask is not None:
            scores = jnp.where(gmask, scores, -1.0e30)
        attn = jax.nn.softmax(scores, axis=-1)
        if gmask is not None:
            attn = jnp.where(gmask, attn, 0.0)
        ctx = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(vg.dtype), vg)
        ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, -1, self.n_feat)
        ctx = ctx[:, :ctx.shape[1] - padding_q] if padding_q else ctx
        return nn.Dense(self.n_feat, name='linear_out')(ctx), new_cache


class StrideConvModule(nn.Module):
    """Conformer conv with strided depthwise conv. ref: convolution.py:23-140."""
    channels: int
    kernel_size: int = 15
    activation: str = 'swish'
    norm: str = 'batch_norm'
    causal: bool = False
    stride: int = 1

    @property
    def lorder(self):
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(self, x, mask_pad=None, cache=None, train: bool = False):
        if mask_pad is not None:
            x = jnp.where(jnp.swapaxes(mask_pad, 1, 2), x, 0.0)
        new_cache = None
        if self.lorder > 0:
            if cache is None:
                x = jnp.pad(x, ((0, 0), (self.lorder, 0), (0, 0)))
            else:
                x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            new_cache = x[:, -self.lorder:, :]
        h = nn.Dense(2 * self.channels, name='pointwise_conv1')(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)
        h = nn.Conv(self.channels, (self.kernel_size,),
                    strides=(self.stride,),
                    padding='VALID' if self.causal else
                    [(self.kernel_size // 2, self.kernel_size // 2)],
                    feature_group_count=self.channels,
                    name='depthwise_conv')(h)
        if self.norm == 'batch_norm':
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name='norm')(h)
        else:
            h = nn.LayerNorm(name='norm')(h)
        h = get_activation(self.activation)(h)
        out = nn.Dense(self.channels, name='pointwise_conv2')(h)
        if mask_pad is not None and self.stride > 1:
            mp = jnp.swapaxes(mask_pad[:, :, ::self.stride], 1, 2)
            out = jnp.where(mp[:, :out.shape[1]], out, 0.0)
        elif mask_pad is not None:
            out = jnp.where(jnp.swapaxes(mask_pad, 1, 2), out, 0.0)
        return out, new_cache


def avg_pool_ceil(x: jax.Array, stride: int,
                  mask=None) -> jax.Array:
    """AvgPool1d(ceil_mode=True, count_include_pad=False) over (B,T,C).

    `mask` (B, T) bool marks frames that EXIST (streaming tail chunks
    are padded to a static window; the reference's dynamic-shape
    streaming never sees those frames, so they must not enter the
    window averages).  Without a mask, data pads count as data — the
    reference's own full-forward AvgPool1d semantics."""
    B, T, C = x.shape
    padl = (-T) % stride
    xp = jnp.pad(x, ((0, 0), (0, padl), (0, 0)))
    xp = xp.reshape(B, -1, stride, C)
    if mask is None:
        counts = jnp.minimum(
            T - jnp.arange(xp.shape[1]) * stride,
            stride).astype(x.dtype)[None, :, None]
    else:
        m = jnp.pad(mask.astype(x.dtype), ((0, 0), (0, padl)))
        m = m.reshape(B, -1, stride)
        xp = xp * m[..., None]
        counts = jnp.maximum(jnp.sum(m, axis=2), 1.0)[..., None]
    return jnp.sum(xp, axis=2) / counts


class StrideConformerEncoderLayer(nn.Module):
    """Conformer layer whose conv downsamples time. ref: encoder_layer.py:24-180."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    use_grouped_attn: bool = False
    group_size: int = 3
    cnn_module_kernel: int = 15
    cnn_module_norm: str = 'batch_norm'
    causal: bool = False
    stride: int = 2
    macaron_style: bool = True
    activation_type: str = 'swish'
    normalize_before: bool = True
    pos_enc_layer_type: str = 'rel_pos'

    def setup(self):
        if self.use_grouped_attn:
            self.self_attn = GroupedRelPosAttention(
                n_head=self.attention_heads, n_feat=self.size,
                dropout_rate=self.attention_dropout_rate,
                group_size=self.group_size, name='self_attn')
        else:
            kind = ('rel_selfattn' if self.pos_enc_layer_type != 'no_pos'
                    else 'selfattn')
            self.self_attn = ATTENTION_CLASSES[kind](
                n_head=self.attention_heads, n_feat=self.size,
                dropout_rate=self.attention_dropout_rate,
                name='self_attn')
        ff = dict(idim=self.size, hidden_units=self.linear_units,
                  dropout_rate=self.dropout_rate,
                  activation=self.activation_type)
        self.feed_forward = PositionwiseFeedForward(**ff,
                                                    name='feed_forward')
        if self.macaron_style:
            self.feed_forward_macaron = PositionwiseFeedForward(
                **ff, name='feed_forward_macaron')
            self.norm_ff_macaron = nn.LayerNorm(epsilon=1e-5,
                                                name='norm_ff_macaron')
        self.conv_module = StrideConvModule(
            channels=self.size, kernel_size=self.cnn_module_kernel,
            activation=self.activation_type, norm=self.cnn_module_norm,
            causal=self.causal, stride=self.stride, name='conv_module')
        self.norm_ff = nn.LayerNorm(epsilon=1e-5, name='norm_ff')
        self.norm_mha = nn.LayerNorm(epsilon=1e-5, name='norm_mha')
        self.norm_conv = nn.LayerNorm(epsilon=1e-5, name='norm_conv')
        self.norm_final = nn.LayerNorm(epsilon=1e-5, name='norm_final')
        self.dropout = Dropout(self.dropout_rate)

    @property
    def ff_scale(self):
        return 0.5 if self.macaron_style else 1.0

    def __call__(self, x, mask=None, pos_emb=None, mask_pad=None,
                 att_cache=None, cnn_cache=None, train: bool = False,
                 pool_mask=None):
        det = not train
        if self.macaron_style:
            residual = x
            if self.normalize_before:
                x = self.norm_ff_macaron(x)
            x = residual + self.ff_scale * self.dropout(
                self.feed_forward_macaron(x, deterministic=det),
                deterministic=det)

        residual = x
        if self.normalize_before:
            x = self.norm_mha(x)
        if self.use_grouped_attn:
            x_att, new_att_cache = self.self_attn(x, mask, pos_emb,
                                                  cache=att_cache)
        else:
            x_att, new_att_cache = self.self_attn(x, x, x, mask, pos_emb,
                                                  cache=att_cache)
        x = residual + self.dropout(x_att, deterministic=det)

        # strided conv; residual through avg-pool (ref encoder_layer.py:129-150)
        residual = x
        if self.normalize_before:
            x = self.norm_conv(x)
        x, new_cnn_cache = self.conv_module(x, mask_pad, cnn_cache,
                                            train=train)
        residual = avg_pool_ceil(residual, self.stride, pool_mask)
        x = residual[:, :x.shape[1]] + self.dropout(x,
                                                    deterministic=det)

        residual = x
        if self.normalize_before:
            x = self.norm_ff(x)
        x = residual + self.ff_scale * self.dropout(
            self.feed_forward(x, deterministic=det), deterministic=det)
        x = self.norm_final(x)
        return x, mask, new_att_cache, new_cnn_cache


class EfficientConformerEncoder(nn.Module):
    """ref: encoder.py:38-560."""
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = 'conv2d'
    pos_enc_layer_type: str = 'rel_pos'
    normalize_before: bool = True
    static_chunk_size: int = 0
    use_dynamic_chunk: bool = False
    use_cmvn: bool = False
    cmvn_norm_var: bool = True
    use_dynamic_left_chunk: bool = False
    macaron_style: bool = True
    activation_type: str = 'swish'
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    cnn_module_norm: str = 'batch_norm'
    stride_layer_idx: Union[int, List[int]] = 3
    stride: Union[int, List[int]] = 2
    group_layer_idx: Union[int, List[int], tuple] = (0, 1, 2, 3)
    group_size: int = 3
    stride_kernel: bool = True

    @property
    def _strides(self):
        s = self.stride
        return [s] if isinstance(s, int) else list(s)

    @property
    def _stride_layers(self):
        s = self.stride_layer_idx
        return [s] if isinstance(s, int) else list(s)

    @property
    def _group_layers(self):
        g = self.group_layer_idx
        return [g] if isinstance(g, int) else list(g)

    @property
    def subsampling_rate(self):
        return {'conv2d2': 2, 'conv2d': 4, 'conv2d6': 6,
                'conv2d8': 8}[self.input_layer]

    @property
    def right_context(self):
        return {'conv2d2': 2, 'conv2d': 6, 'conv2d6': 10,
                'conv2d8': 14}[self.input_layer]

    def setup(self):
        if self.use_cmvn:
            self.global_cmvn = GlobalCMVN(self.input_size,
                                          self.cmvn_norm_var,
                                          name='global_cmvn')
        from wenet_tpu.models.transformer.encoder import make_pos_enc
        from wenet_tpu.models.transformer.subsampling import (
            SUBSAMPLE_CLASSES)
        pos_enc = make_pos_enc(self.pos_enc_layer_type, self.output_size,
                               self.positional_dropout_rate,
                               self.attention_heads)
        self.embed = SUBSAMPLE_CLASSES[self.input_layer](
            idim=self.input_size, odim=self.output_size,
            dropout_rate=self.dropout_rate, pos_enc=pos_enc, name='embed')
        self.after_norm = nn.LayerNorm(epsilon=1e-5, name='after_norm')
        layers = []
        index = 0
        kernels = []
        k = self.cnn_module_kernel
        for s in self._strides:
            kernels.append(k)
            if self.stride_kernel:
                k = max(k // s, 3)
        kernels.append(k)
        for i in range(self.num_blocks):
            grouped = i in self._group_layers
            if i in self._stride_layers:
                layers.append(
                    StrideConformerEncoderLayer(
                        size=self.output_size,
                        attention_heads=self.attention_heads,
                        linear_units=self.linear_units,
                        dropout_rate=self.dropout_rate,
                        attention_dropout_rate=self.
                        attention_dropout_rate,
                        use_grouped_attn=grouped,
                        group_size=self.group_size,
                        cnn_module_kernel=kernels[index],
                        cnn_module_norm=self.cnn_module_norm,
                        causal=self.causal,
                        stride=self._strides[index],
                        macaron_style=self.macaron_style,
                        activation_type=self.activation_type,
                        normalize_before=self.normalize_before,
                        pos_enc_layer_type=self.pos_enc_layer_type,
                    ))
                index += 1
            else:
                from wenet_tpu.models.transformer.encoder_layer import (
                    ConformerEncoderLayer)
                layers.append(
                    ConformerEncoderLayer(
                        size=self.output_size,
                        attention_heads=self.attention_heads,
                        linear_units=self.linear_units,
                        dropout_rate=self.dropout_rate,
                        attention_dropout_rate=self.
                        attention_dropout_rate,
                        normalize_before=self.normalize_before,
                        selfattention_layer_type='rel_selfattn'
                        if self.pos_enc_layer_type != 'no_pos'
                        else 'selfattn',
                        activation_type=self.activation_type,
                        macaron_style=self.macaron_style,
                        use_cnn_module=self.use_cnn_module,
                        cnn_module_kernel=kernels[min(
                            index, len(kernels) - 1)],
                        causal=self.causal,
                        cnn_module_norm=self.cnn_module_norm,
                    ) if not grouped else _GroupedConformerLayer(
                        size=self.output_size,
                        attention_heads=self.attention_heads,
                        linear_units=self.linear_units,
                        dropout_rate=self.dropout_rate,
                        attention_dropout_rate=self.
                        attention_dropout_rate,
                        group_size=self.group_size,
                        cnn_module_kernel=kernels[min(
                            index, len(kernels) - 1)],
                        cnn_module_norm=self.cnn_module_norm,
                        causal=self.causal,
                        macaron_style=self.macaron_style,
                        activation_type=self.activation_type,
                        normalize_before=self.normalize_before,
                    ))
        self.encoders = layers

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, train: bool = False,
                 chunk_rng=None):
        T = xs.shape[1]
        masks = ~make_pad_mask(xs_lens, T)[:, None, :]
        if self.use_cmvn:
            xs = self.global_cmvn(xs)
        xs, pos_emb, masks = self.embed(xs, masks,
                                        deterministic=not train)
        mask_pad = masks
        chunk_masks = add_optional_chunk_mask(
            masks, self.use_dynamic_chunk, self.use_dynamic_left_chunk,
            decoding_chunk_size, self.static_chunk_size,
            num_decoding_left_chunks, rng=chunk_rng)
        index = 0
        for i, layer in enumerate(self.encoders):
            xs, chunk_masks, _, _ = layer(xs, chunk_masks, pos_emb,
                                          mask_pad, train=train)
            if i in self._stride_layers:
                s = self._strides[index]
                masks = masks[:, :, ::s]
                chunk_masks = chunk_masks[:, ::s, ::s]
                mask_pad = masks
                pos_emb = pos_emb[:, ::s, :]
                index += 1
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks

    # ------------------------------------------------------------------
    # streaming (ref encoder.py:297-460)
    # ------------------------------------------------------------------
    @property
    def output_downsampling_factor(self) -> int:
        f = 1
        for s in self._strides:
            f *= s
        return f

    def _layer_factor(self, i: int) -> int:
        """Cumulative downsampling seen at layer i's INPUT (the stride
        layer itself still attends at pre-stride resolution).
        ref: encoder.py calculate_downsampling_factor."""
        f = 1
        for idx, s in zip(self._stride_layers, self._strides):
            if i > idx:
                f *= s
        return f

    def forward_chunk(self, xs, offset, att_cache, cnn_cache,
                      att_mask=None):
        """One streaming chunk with fixed-size right-aligned caches.

        TPU redesign of ref encoder.py:297-460: the kv cache is stored
        at the LAYER-0 (base) time resolution for every layer — the
        reference's repeat_interleave trick — so one fixed
        (num_blocks, B, h, cache_t1, d_k) tensor serves all layers;
        layer i reads every `factor`-th slot (a static slice) and its
        fresh kv is re-expanded by `factor` before being right-aligned
        back into the window.  Requires cache_t1 (and the chunk size)
        divisible by the total stride product.

        `offset` counts FINAL-resolution output frames (the reference
        multiplies by the total downsampling factor the same way,
        encoder.py:336); early-chunk invalid cache slots are masked at
        group granularity for grouped-attention layers (a group whose
        first slot is invalid is dropped entirely — conservative; at
        steady state the windows match the reference exactly when
        cache/chunk are multiples of group_size)."""
        B = xs.shape[0]
        total = self.output_downsampling_factor
        base_offset = jnp.asarray(offset, jnp.int32) * total
        tmp_mask = jnp.ones((B, 1, xs.shape[1]), bool)
        if self.use_cmvn:
            xs = self.global_cmvn(xs)
        xs, _, _ = self.embed(xs, tmp_mask, base_offset)
        k_cache, v_cache = att_cache
        cache_t1 = k_cache.shape[-2]
        chunk_size = xs.shape[1]  # base resolution
        assert cache_t1 % total == 0 and chunk_size % total == 0, (
            'cache/chunk must divide the total stride for fixed-shape '
            'streaming', cache_t1, chunk_size, total)
        pos_emb = self.embed.position_encoding(
            base_offset - cache_t1, cache_t1 + chunk_size)
        if att_mask is None:
            att_mask = jnp.ones((B, 1, cache_t1 + chunk_size), bool)
        new_k, new_v, new_cnn = [], [], []
        max_lorder = cnn_cache.shape[-2] if cnn_cache is not None else 0
        for i, layer in enumerate(self.encoders):
            f = self._layer_factor(i)
            kv = (k_cache[i][:, :, ::f, :], v_cache[i][:, :, ::f, :])
            layer_mask = att_mask[:, :, ::f]
            layer_pos = pos_emb[:, ::f, :]
            layer_cnn_in = None
            if cnn_cache is not None:
                lorder = getattr(layer.conv_module, 'lorder', 0) \
                    if hasattr(layer, 'conv_module') else 0
                if lorder:
                    layer_cnn_in = cnn_cache[i][:, -lorder:, :]
            layer_kwargs = {}
            if isinstance(layer, StrideConformerEncoderLayer):
                # the reference's dynamic-shape streaming never pools
                # the static tail padding — mask it out of the windows
                layer_kwargs['pool_mask'] = att_mask[:, 0,
                                                     cache_t1:][:, ::f]
            xs, _, new_kv, layer_cnn = layer(
                xs, layer_mask, layer_pos, mask_pad=None,
                att_cache=kv, cnn_cache=layer_cnn_in, **layer_kwargs)
            # fresh kv at layer res -> re-expand to base res, keep the
            # right-aligned fixed window (ref repeat_interleave,
            # encoder.py:430-436)
            nk = jnp.repeat(new_kv[0][:, :, -(cache_t1 // f):, :], f,
                            axis=-2)
            nv = jnp.repeat(new_kv[1][:, :, -(cache_t1 // f):, :], f,
                            axis=-2)
            new_k.append(nk)
            new_v.append(nv)
            if cnn_cache is not None:
                if layer_cnn is None:
                    layer_cnn = jnp.zeros(
                        (B, 0, self.output_size), xs.dtype)
                pad = max_lorder - layer_cnn.shape[1]
                new_cnn.append(jnp.pad(layer_cnn,
                                       ((0, 0), (pad, 0), (0, 0))))
        if self.normalize_before:
            xs = self.after_norm(xs)
        r_att = (jnp.stack(new_k, 0), jnp.stack(new_v, 0))
        r_cnn = jnp.stack(new_cnn, 0) if cnn_cache is not None else None
        return xs, r_att, r_cnn

    def zero_cache(self, batch_size: int, required_cache_size: int,
                   dtype=jnp.float32):
        """All-invalid streaming cache at base resolution."""
        d_k = self.output_size // self.attention_heads
        k = jnp.zeros((self.num_blocks, batch_size,
                       self.attention_heads, required_cache_size, d_k),
                      dtype)
        return (k, k), self.zero_cnn_cache(batch_size, dtype)

    def zero_cnn_cache(self, batch_size: int, dtype=jnp.float32):
        if not self.causal:
            return None
        max_lorder = self.cnn_module_kernel - 1
        return jnp.zeros((self.num_blocks, batch_size, max_lorder,
                          self.output_size), dtype)


class _GroupedConformerLayer(nn.Module):
    """Standard conformer layer but with grouped attention."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    group_size: int = 3
    cnn_module_kernel: int = 15
    cnn_module_norm: str = 'batch_norm'
    causal: bool = False
    macaron_style: bool = True
    activation_type: str = 'swish'
    normalize_before: bool = True

    def setup(self):
        from wenet_tpu.models.transformer.convolution import (
            ConvolutionModule)
        self.self_attn = GroupedRelPosAttention(
            n_head=self.attention_heads, n_feat=self.size,
            dropout_rate=self.attention_dropout_rate,
            group_size=self.group_size, name='self_attn')
        ff = dict(idim=self.size, hidden_units=self.linear_units,
                  dropout_rate=self.dropout_rate,
                  activation=self.activation_type)
        self.feed_forward = PositionwiseFeedForward(**ff,
                                                    name='feed_forward')
        if self.macaron_style:
            self.feed_forward_macaron = PositionwiseFeedForward(
                **ff, name='feed_forward_macaron')
            self.norm_ff_macaron = nn.LayerNorm(epsilon=1e-5,
                                                name='norm_ff_macaron')
        self.conv_module = ConvolutionModule(
            channels=self.size, kernel_size=self.cnn_module_kernel,
            activation=self.activation_type, norm=self.cnn_module_norm,
            causal=self.causal, name='conv_module')
        self.norm_ff = nn.LayerNorm(epsilon=1e-5, name='norm_ff')
        self.norm_mha = nn.LayerNorm(epsilon=1e-5, name='norm_mha')
        self.norm_conv = nn.LayerNorm(epsilon=1e-5, name='norm_conv')
        self.norm_final = nn.LayerNorm(epsilon=1e-5, name='norm_final')
        self.dropout = Dropout(self.dropout_rate)

    @property
    def ff_scale(self):
        return 0.5 if self.macaron_style else 1.0

    def __call__(self, x, mask=None, pos_emb=None, mask_pad=None,
                 att_cache=None, cnn_cache=None, train: bool = False):
        det = not train
        if self.macaron_style:
            residual = x
            if self.normalize_before:
                x = self.norm_ff_macaron(x)
            x = residual + self.ff_scale * self.dropout(
                self.feed_forward_macaron(x, deterministic=det),
                deterministic=det)
        residual = x
        if self.normalize_before:
            x = self.norm_mha(x)
        x_att, new_att_cache = self.self_attn(x, mask, pos_emb,
                                              cache=att_cache)
        x = residual + self.dropout(x_att, deterministic=det)

        residual = x
        if self.normalize_before:
            x = self.norm_conv(x)
        x, new_cnn_cache = self.conv_module(x, mask_pad, cnn_cache,
                                            train=train)
        x = residual + self.dropout(x, deterministic=det)

        residual = x
        if self.normalize_before:
            x = self.norm_ff(x)
        x = residual + self.ff_scale * self.dropout(
            self.feed_forward(x, deterministic=det), deterministic=det)
        x = self.norm_final(x)
        return x, mask, new_att_cache, new_cnn_cache
