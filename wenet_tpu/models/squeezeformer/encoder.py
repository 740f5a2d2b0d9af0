"""Squeezeformer encoder (time reduce/recover U-net trunk).

ref: wenet/models/squeezeformer/{encoder.py:38-330, encoder_layer.py:21-140,
subsampling.py:29-340, attention.py:28-235, convolution.py:24-175,
positionwise_feed_forward.py:21-80}.
"""

import math
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.activations import get_activation
from wenet_tpu.models.transformer.embedding import (
    sinusoidal_position_encoding)
from wenet_tpu.utils.mask import add_optional_chunk_mask, make_pad_mask


def _ada_params(mod, size, adaptive):
    scale = mod.param('ada_scale', nn.initializers.ones, (1, 1, size))
    bias = mod.param('ada_bias', nn.initializers.zeros, (1, 1, size))
    return scale, bias


def rel_shift(x: jax.Array) -> jax.Array:
    """XL-style relative shift. ref: attention.py:74-99."""
    B, H, T1, T2 = x.shape
    zero_pad = jnp.zeros((B, H, T1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(B, H, T2 + 1, T1)
    return x_padded[:, :, 1:].reshape(B, H, T1, T2)


def rel_shift_window(x: jax.Array, valid_cache, valid_chunk,
                     cache_len: int) -> jax.Array:
    """`rel_shift` emulated at the reference's dynamic window geometry.

    The legacy zero-pad/reshape shift (ref attention.py:74-99) mixes
    rows *and* columns in a way that depends on the score matrix's
    exact (T1, T2).  The reference's streaming window grows with the
    cache (encoder.py:318-330) and its tail chunk runs at its true
    shorter length, so its shift runs at ``t1_eff = valid_chunk``,
    ``t2_eff = valid_cache + valid_chunk`` — smaller than our static
    padded (T1, T2).  This gather reproduces the reference geometry on
    our fixed-width matrix: its window occupies columns
    [cache_len - valid_cache, cache_len + valid_chunk); pad columns
    are zeroed (they are masked out of the softmax anyway).  With a
    full cache and full chunk it equals ``rel_shift(x)`` exactly.

    x: (B, H, T1, T2); valid_cache/valid_chunk: int scalar or (B,)
    int32 (may be traced); cache_len: static cache width (T2 - T1).
    """
    B, H, T1, T2 = x.shape
    vcache = jnp.broadcast_to(jnp.asarray(valid_cache, jnp.int32),
                              (B,))[:, None, None, None]
    vchunk = jnp.broadcast_to(jnp.asarray(valid_chunk, jnp.int32),
                              (B,))[:, None, None, None]
    pad = cache_len - vcache
    t1 = vchunk
    t2 = vcache + vchunk
    i = jnp.arange(T1, dtype=jnp.int32)[None, None, :, None]
    m = jnp.arange(T2, dtype=jnp.int32)[None, None, None, :]
    j = m - pad  # column index inside the reference window
    flat = i * t2 + j + t1
    ip = flat // (t2 + 1)
    jp = flat - ip * (t2 + 1)
    src = jp - 1 + pad
    gather = (jnp.clip(ip, 0, T1 - 1) * T2 +
              jnp.clip(src, 0, T2 - 1))  # (B,1,T1,T2)
    gather = jnp.broadcast_to(gather, (B, H, T1, T2)).reshape(B, H, -1)
    val = jnp.take_along_axis(x.reshape(B, H, -1), gather,
                              axis=-1).reshape(B, H, T1, T2)
    bad = (jp <= 0) | (j < 0) | (j >= t2)
    return jnp.where(bad, jnp.zeros((), x.dtype), val)


class SqueezeRelPosAttention(nn.Module):
    """rel-pos MHA with adaptive scale + rel_shift. ref: attention.py:28-235."""
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    do_rel_shift: bool = True
    adaptive_scale: bool = True

    @property
    def d_k(self):
        return self.n_feat // self.n_head

    @nn.compact
    def __call__(self, x, mask=None, pos_emb=None, cache=None):
        if self.adaptive_scale:
            scale, bias = _ada_params(self, self.n_feat, True)
            x = scale * x + bias
        B, T, _ = x.shape

        def heads(t):
            return jnp.swapaxes(
                t.reshape(t.shape[0], -1, self.n_head, self.d_k), 1, 2)

        q = heads(nn.Dense(self.n_feat, name='linear_q')(x))
        k = heads(nn.Dense(self.n_feat, name='linear_k')(x))
        v = heads(nn.Dense(self.n_feat, name='linear_v')(x))
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=-2)
            v = jnp.concatenate([cache[1], v], axis=-2)
        new_cache = (k, v)
        p = heads(nn.Dense(self.n_feat, use_bias=False,
                           name='linear_pos')(pos_emb))
        u = self.param('pos_bias_u', nn.initializers.xavier_uniform(),
                       (self.n_head, self.d_k)).astype(q.dtype)
        w = self.param('pos_bias_v', nn.initializers.xavier_uniform(),
                       (self.n_head, self.d_k)).astype(q.dtype)
        ac = jnp.einsum('bhqd,bhkd->bhqk', q + u[None, :, None, :], k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum('bhqd,bhkd->bhqk', q + w[None, :, None, :], p,
                        preferred_element_type=jnp.float32)
        if self.do_rel_shift:
            if cache is not None and mask is not None:
                # streaming: emulate the reference's dynamically-grown
                # window (valid cache slots + true chunk length) so
                # early chunks AND the padded tail chunk match the
                # reference exactly (ref encoder.py:318-330)
                cache_len = k.shape[-2] - T
                valid_cache = jnp.sum(
                    mask[:, 0, :cache_len].astype(jnp.int32), axis=-1)
                valid_chunk = jnp.sum(
                    mask[:, 0, cache_len:].astype(jnp.int32), axis=-1)
                bd = rel_shift_window(bd, valid_cache, valid_chunk,
                                      cache_len)
            else:
                bd = rel_shift(bd)
        scores = (ac + bd) / math.sqrt(self.d_k)
        if mask is not None:
            m = mask[..., None, :, :]
            scores = jnp.where(m, scores, -1.0e30)
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(m, attn, 0.0)
        ctx = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v)
        ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, T, self.n_feat)
        return nn.Dense(self.n_feat, name='linear_out')(ctx), new_cache


class SqueezeFFN(nn.Module):
    """ref: positionwise_feed_forward.py:21-80."""
    idim: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: str = 'swish'
    adaptive_scale: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.adaptive_scale:
            scale, bias = _ada_params(self, self.idim, True)
            x = scale * x + bias
        h = nn.Dense(self.hidden_units, name='w_1')(x)
        h = Dropout(self.dropout_rate)(
            get_activation(self.activation)(h),
            deterministic=deterministic)
        return nn.Dense(self.idim, name='w_2')(h)


class SqueezeConvModule(nn.Module):
    """conformer conv with adaptive scale. ref: convolution.py:24-175."""
    channels: int
    kernel_size: int = 31
    activation: str = 'swish'
    norm: str = 'batch_norm'
    causal: bool = False
    adaptive_scale: bool = True

    @property
    def lorder(self):
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(self, x, mask_pad=None, cache=None, train: bool = False):
        if self.adaptive_scale:
            scale, bias = _ada_params(self, self.channels, True)
            x = scale * x + bias
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
        if mask_pad is not None:
            out = jnp.where(jnp.swapaxes(mask_pad, 1, 2), out, 0.0)
        return out, new_cache


class DepthwiseConv2dSubsampling4(nn.Module):
    """ref: subsampling.py:29-96."""
    idim: int  # conv channels (== encoder_dim)
    input_size: int
    dw_stride: bool = False
    input_dropout_rate: float = 0.1
    pos_enc_dim: int = 256

    @nn.compact
    def __call__(self, x, x_mask, offset=0, deterministic: bool = True):
        x = x[..., None]  # (B, T, F, 1)
        x = nn.Conv(self.idim, (3, 3), strides=(2, 2), padding='VALID',
                    name='pw_conv')(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.idim, (3, 3), strides=(2, 2), padding='VALID',
                    feature_group_count=self.idim if self.dw_stride else 1,
                    name='dw_conv')(x)
        x = jax.nn.relu(x)
        b, t, f, c = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        pos_emb = sinusoidal_position_encoding(
            offset, t, self.pos_enc_dim).astype(x.dtype)
        # RelPositionalEncoding.xscale (ref embedding.py:145): the
        # flattened conv features are scaled by sqrt(d_model) BEFORE
        # input_proj — omitting it makes every activation ~16x small
        # and breaks checkpoint import
        x = x * math.sqrt(self.pos_enc_dim)
        x = nn.Dense(self.idim, name='input_proj')(x)
        x = Dropout(self.input_dropout_rate)(
            x, deterministic=deterministic)
        return x, pos_emb, x_mask[:, :, :-2:2][:, :, :-2:2]


class TimeReductionLayer1D(nn.Module):
    """ref: subsampling.py:97-180."""
    channel: int
    out_dim: int
    kernel_size: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, xs, xs_lens, mask, mask_pad):
        if mask_pad is not None:
            xs = jnp.where(jnp.swapaxes(mask_pad, 1, 2), xs, 0.0)
        pad = max(0, self.kernel_size - self.stride)
        # torch Conv1d(padding=pad) pads both sides
        x = jnp.pad(xs, ((0, 0), (pad, pad), (0, 0)))
        x = nn.Conv(self.channel, (self.kernel_size,),
                    strides=(self.stride,), padding='VALID',
                    feature_group_count=self.channel, name='dw_conv')(x)
        x = nn.Dense(self.out_dim, name='pw_conv')(x)
        mask = mask[:, ::self.stride, ::self.stride]
        mask_pad = mask_pad[:, :, ::self.stride]
        L = mask_pad.shape[-1]
        T = x.shape[1]
        if T > L:
            x = x[:, :L]
        elif T < L:
            x = jnp.pad(x, ((0, 0), (0, L - T), (0, 0)))
        xs_lens = (xs_lens + 1) // 2
        return x, xs_lens, mask, mask_pad


class SqueezeformerEncoderLayer(nn.Module):
    """MHSA -> FFN -> conv -> FFN, post-norm. ref: encoder_layer.py:21-140."""
    size: int
    attention_heads: int
    feed_forward_expansion_factor: int = 4
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    feed_forward_dropout_rate: float = 0.1
    cnn_module_kernel: int = 31
    cnn_norm_type: str = 'batch_norm'
    causal: bool = False
    adaptive_scale: bool = True
    activation_type: str = 'swish'
    do_rel_shift: bool = True
    normalize_before: bool = False
    concat_after: bool = False

    def setup(self):
        self.self_attn = SqueezeRelPosAttention(
            n_head=self.attention_heads, n_feat=self.size,
            dropout_rate=self.attention_dropout_rate,
            do_rel_shift=self.do_rel_shift,
            adaptive_scale=self.adaptive_scale, name='self_attn')
        hidden = self.size * self.feed_forward_expansion_factor
        self.ffn1 = SqueezeFFN(idim=self.size, hidden_units=hidden,
                               dropout_rate=self.feed_forward_dropout_rate,
                               activation=self.activation_type,
                               adaptive_scale=self.adaptive_scale,
                               name='ffn1')
        self.ffn2 = SqueezeFFN(idim=self.size, hidden_units=hidden,
                               dropout_rate=self.feed_forward_dropout_rate,
                               activation=self.activation_type,
                               adaptive_scale=self.adaptive_scale,
                               name='ffn2')
        self.conv_module = SqueezeConvModule(
            channels=self.size, kernel_size=self.cnn_module_kernel,
            activation=self.activation_type, norm=self.cnn_norm_type,
            causal=self.causal, adaptive_scale=self.adaptive_scale,
            name='conv_module')
        self.layer_norm1 = nn.LayerNorm(name='layer_norm1')
        self.layer_norm2 = nn.LayerNorm(name='layer_norm2')
        self.layer_norm3 = nn.LayerNorm(name='layer_norm3')
        self.layer_norm4 = nn.LayerNorm(name='layer_norm4')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, x, mask=None, pos_emb=None, mask_pad=None,
                 att_cache=None, cnn_cache=None, train: bool = False):
        det = not train
        residual = x
        if self.normalize_before:
            x = self.layer_norm1(x)
        x_att, new_att_cache = self.self_attn(x, mask, pos_emb,
                                              cache=att_cache)
        x = residual + self.dropout(x_att, deterministic=det)
        if not self.normalize_before:
            x = self.layer_norm1(x)

        residual = x
        if self.normalize_before:
            x = self.layer_norm2(x)
        x = residual + self.dropout(self.ffn1(x, deterministic=det),
                                    deterministic=det)
        if not self.normalize_before:
            x = self.layer_norm2(x)

        residual = x
        if self.normalize_before:
            x = self.layer_norm3(x)
        x, new_cnn_cache = self.conv_module(x, mask_pad, cnn_cache,
                                            train=train)
        x = residual + self.dropout(x, deterministic=det)
        if not self.normalize_before:
            x = self.layer_norm3(x)

        residual = x
        if self.normalize_before:
            x = self.layer_norm4(x)
        x = residual + self.dropout(self.ffn2(x, deterministic=det),
                                    deterministic=det)
        if not self.normalize_before:
            x = self.layer_norm4(x)
        return x, mask, new_att_cache, new_cnn_cache


class SqueezeformerEncoder(nn.Module):
    """ref: encoder.py:38-330."""
    input_size: int = 80
    encoder_dim: int = 256
    output_size: int = 256
    attention_heads: int = 4
    num_blocks: int = 12
    reduce_idx: Union[int, List[int], None] = 5
    recover_idx: Union[int, List[int], None] = 11
    feed_forward_expansion_factor: int = 4
    dw_stride: bool = False
    input_dropout_rate: float = 0.1
    pos_enc_layer_type: str = 'rel_pos'
    time_reduction_layer_type: str = 'conv1d'
    do_rel_shift: bool = True
    feed_forward_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    cnn_module_kernel: int = 31
    cnn_norm_type: str = 'batch_norm'
    dropout: float = 0.1
    causal: bool = False
    adaptive_scale: bool = True
    activation_type: str = 'swish'
    use_cmvn: bool = False
    cmvn_norm_var: bool = True
    normalize_before: bool = False
    use_dynamic_chunk: bool = False
    concat_after: bool = False
    static_chunk_size: int = 0
    use_dynamic_left_chunk: bool = False

    subsampling_rate: int = 4
    right_context: int = 6

    @property
    def _reduce_idx(self):
        r = self.reduce_idx
        return [r] if isinstance(r, int) else r

    @property
    def _recover_idx(self):
        r = self.recover_idx
        return [r] if isinstance(r, int) else r

    def setup(self):
        if self.use_cmvn:
            from wenet_tpu.models.transformer.cmvn import GlobalCMVN
            self.global_cmvn = GlobalCMVN(self.input_size,
                                          self.cmvn_norm_var,
                                          name='global_cmvn')
        self.embed = DepthwiseConv2dSubsampling4(
            idim=self.encoder_dim, input_size=self.input_size,
            dw_stride=self.dw_stride,
            input_dropout_rate=self.input_dropout_rate,
            pos_enc_dim=self.encoder_dim, name='embed')
        self.preln = nn.LayerNorm(name='preln')
        self.encoders = [
            SqueezeformerEncoderLayer(
                size=self.encoder_dim,
                attention_heads=self.attention_heads,
                feed_forward_expansion_factor=self.
                feed_forward_expansion_factor,
                dropout_rate=self.dropout,
                attention_dropout_rate=self.attention_dropout_rate,
                feed_forward_dropout_rate=self.feed_forward_dropout_rate,
                cnn_module_kernel=self.cnn_module_kernel,
                cnn_norm_type=self.cnn_norm_type, causal=self.causal,
                adaptive_scale=self.adaptive_scale,
                activation_type=self.activation_type,
                do_rel_shift=self.do_rel_shift,
                normalize_before=self.normalize_before,
                concat_after=self.concat_after,
            ) for _ in range(self.num_blocks)
        ]
        self.time_reduction_layer = TimeReductionLayer1D(
            channel=self.encoder_dim, out_dim=self.encoder_dim,
            name='time_reduction_layer')
        self.time_recover_layer = nn.Dense(self.encoder_dim,
                                           name='time_recover_layer')
        if self.output_size != self.encoder_dim:
            self.final_proj = nn.Dense(self.output_size,
                                       name='final_proj')

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
        lens = jnp.sum(mask_pad[:, 0, :], -1)
        xs = self.preln(xs)
        recover: List = []
        index = 0
        for i, layer in enumerate(self.encoders):
            if self._reduce_idx is not None and i in self._reduce_idx:
                recover.append((xs, chunk_masks, pos_emb, mask_pad))
                xs, lens, chunk_masks, mask_pad = \
                    self.time_reduction_layer(xs, lens, chunk_masks,
                                              mask_pad)
                pos_emb = pos_emb[:, ::2, :]
                index += 1
            if self._recover_idx is not None and \
                    self.reduce_idx is not None and \
                    i in self._recover_idx:
                index -= 1
                (rec_t, rec_cm, rec_pe, rec_mp) = recover[index]
                xs = jnp.repeat(xs, 2, axis=1)
                xs = self.time_recover_layer(xs)
                recoverd_t = rec_t.shape[1]
                xs = rec_t + xs[:, :recoverd_t, :]
                chunk_masks, pos_emb, mask_pad = rec_cm, rec_pe, rec_mp
                xs = jnp.where(mask_pad[:, 0, :, None], xs, 0.0)
                lens = jnp.sum(mask_pad[:, 0, :], -1)
            xs, chunk_masks, _, _ = layer(xs, chunk_masks, pos_emb,
                                          mask_pad, train=train)
        if self.output_size != self.encoder_dim:
            xs = self.final_proj(xs)
        return xs, masks

    # ------------------------------------------------------------------
    # streaming (ref squeezeformer/encoder.py:268-407)
    # ------------------------------------------------------------------
    def _layer_factor(self, i: int) -> int:
        """Time-resolution factor at layer i's input: doubles at each
        reduce_idx, halves back at each recover_idx (U-net trunk,
        ref calculate_downsampling_factor)."""
        f = 1
        for r in (self._reduce_idx or []):
            if i >= r:
                f *= 2
        for r in (self._recover_idx or []):
            if i >= r:
                f //= 2
        return max(f, 1)

    def forward_chunk(self, xs, offset, att_cache, cnn_cache,
                      att_mask=None):
        """One streaming chunk with fixed-size right-aligned caches.

        Same design as the efficient-conformer streaming: the kv cache
        lives at BASE time resolution for every layer (the reference
        repeat-expands reduced-resolution caches the same way,
        encoder.py:389-399); reduced layers read every 2nd slot.
        reduce/recover is chunk-local exactly as in the reference
        (saved activations never cross chunks).  Requires cache_t1 and
        the chunk size divisible by 2**len(reduce_idx)."""
        B = xs.shape[0]
        tmp_mask = jnp.ones((B, 1, xs.shape[1]), bool)
        if self.use_cmvn:
            xs = self.global_cmvn(xs)
        xs, _, _ = self.embed(xs, tmp_mask, offset)
        k_cache, v_cache = att_cache
        cache_t1 = k_cache.shape[-2]
        chunk = xs.shape[1]
        max_f = 2 ** len(self._reduce_idx or [])
        assert cache_t1 % max_f == 0 and chunk % max_f == 0, (
            cache_t1, chunk, max_f)
        base_pos = sinusoidal_position_encoding(
            jnp.asarray(offset, jnp.int32) - cache_t1, cache_t1 + chunk,
            self.embed.pos_enc_dim).astype(xs.dtype)
        if att_mask is None:
            att_mask = jnp.ones((B, 1, cache_t1 + chunk), bool)
        xs = self.preln(xs)
        new_k, new_v, new_cnn = [], [], []
        recover: List = []
        index = 0
        lens = jnp.full((B,), chunk, jnp.int32)
        # chunk-validity (padded tail chunk): the reduction conv pads
        # symmetrically, so garbage at static-pad positions would leak
        # into valid outputs — zero them first (the reference runs the
        # tail chunk at its true shorter length instead)
        chunk_mask = att_mask[:, :, cache_t1:]  # (B, 1, chunk)
        cur_f = 1  # time-resolution factor of xs entering layer i
        for i, layer in enumerate(self.encoders):
            if self._reduce_idx is not None and i in self._reduce_idx:
                recover.append(xs)
                mask_pad = chunk_mask[:, :, ::cur_f]
                xs, lens, _, _ = self.time_reduction_layer(
                    xs, lens, mask_pad, mask_pad)
                cur_f *= 2
                index += 1
            if (self._recover_idx is not None
                    and self.reduce_idx is not None
                    and i in self._recover_idx):
                index -= 1
                cur_f //= 2
                rec_t = recover[index]
                xs = jnp.repeat(xs, 2, axis=1)
                xs = self.time_recover_layer(xs)
                xs = rec_t + xs[:, :rec_t.shape[1], :]
                # mask the static pad tail of the chunk
                # (ref encoder.py:373-375 masks by att_mask)
                xs = jnp.where(
                    chunk_mask[:, 0, ::cur_f, None], xs, 0.0)
            f = cur_f
            assert f == self._layer_factor(i)
            kv = (k_cache[i][:, :, ::f, :], v_cache[i][:, :, ::f, :])
            layer_cnn_in = None
            if cnn_cache is not None:
                layer_cnn_in = cnn_cache[i]
            xs, _, new_kv, layer_cnn = layer(
                xs, att_mask[:, :, ::f], base_pos[:, ::f, :],
                mask_pad=chunk_mask[:, :, ::f], att_cache=kv,
                cnn_cache=layer_cnn_in)
            nk = jnp.repeat(new_kv[0][:, :, -(cache_t1 // f):, :], f,
                            axis=-2)
            nv = jnp.repeat(new_kv[1][:, :, -(cache_t1 // f):, :], f,
                            axis=-2)
            new_k.append(nk)
            new_v.append(nv)
            if cnn_cache is not None:
                new_cnn.append(layer_cnn)
        if self.output_size != self.encoder_dim:
            xs = self.final_proj(xs)
        r_att = (jnp.stack(new_k, 0), jnp.stack(new_v, 0))
        r_cnn = jnp.stack(new_cnn, 0) if cnn_cache is not None else None
        return xs, r_att, r_cnn

    def zero_cache(self, batch_size: int, required_cache_size: int,
                   dtype=jnp.float32):
        d_k = self.encoder_dim // self.attention_heads
        k = jnp.zeros((self.num_blocks, batch_size,
                       self.attention_heads, required_cache_size, d_k),
                      dtype)
        return (k, k), self.zero_cnn_cache(batch_size, dtype)

    def zero_cnn_cache(self, batch_size: int, dtype=jnp.float32):
        if not self.causal:
            return None
        return jnp.zeros((self.num_blocks, batch_size,
                          self.cnn_module_kernel - 1, self.encoder_dim),
                         dtype)
