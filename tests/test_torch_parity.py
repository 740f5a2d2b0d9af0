"""Golden-parity: a faithful torch re-implementation of the reference
conformer encoder (same state-dict names/layouts as wenet) is built here,
its weights imported through the checkpoint mapper, and outputs compared.

This mirrors the reference's equivalence-testing strategy (SURVEY.md §4:
test_whisper.py checks against the installed whisper package)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from wenet_tpu.models.transformer.encoder import ConformerEncoder
from wenet_tpu.utils.checkpoint import convert_torch_state_dict

torch.manual_seed(0)

H, D, FF, K_CNN, IDIM, LAYERS = 2, 32, 64, 7, 80, 2
DK = D // H


# --------------------------- torch reference ------------------------------
class TRelPosMHA(nn.Module):
    """ref math: wenet/models/transformer/attention.py:307-438."""

    def __init__(self):
        super().__init__()
        self.linear_q = nn.Linear(D, D)
        self.linear_k = nn.Linear(D, D)
        self.linear_v = nn.Linear(D, D)
        self.linear_out = nn.Linear(D, D)
        self.linear_pos = nn.Linear(D, D, bias=False)
        self.pos_bias_u = nn.Parameter(torch.randn(H, DK) * 0.1)
        self.pos_bias_v = nn.Parameter(torch.randn(H, DK) * 0.1)

    def forward(self, x, mask, pos_emb):
        B, T, _ = x.shape
        q = self.linear_q(x).view(B, T, H, DK).transpose(1, 2)
        k = self.linear_k(x).view(B, T, H, DK).transpose(1, 2)
        v = self.linear_v(x).view(B, T, H, DK).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(pos_emb.size(0), -1, H, DK)
        p = p.transpose(1, 2)
        q_u = q + self.pos_bias_u.unsqueeze(0).unsqueeze(2)
        q_v = q + self.pos_bias_v.unsqueeze(0).unsqueeze(2)
        matrix_ac = torch.matmul(q_u, k.transpose(-2, -1))
        matrix_bd = torch.matmul(q_v, p.transpose(-2, -1))
        scores = (matrix_ac + matrix_bd) / math.sqrt(DK)
        m = mask.unsqueeze(1).eq(0)
        scores = scores.masked_fill(m, -float('inf'))
        attn = torch.softmax(scores, dim=-1).masked_fill(m, 0.0)
        x = torch.matmul(attn, v).transpose(1, 2).reshape(B, T, D)
        return self.linear_out(x)


class TConvModule(nn.Module):
    """ref math: wenet/models/transformer/convolution.py:24-153."""

    def __init__(self):
        super().__init__()
        self.pointwise_conv1 = nn.Conv1d(D, 2 * D, 1)
        self.depthwise_conv = nn.Conv1d(D, D, K_CNN,
                                        padding=(K_CNN - 1) // 2,
                                        groups=D)
        self.norm = nn.BatchNorm1d(D)
        self.pointwise_conv2 = nn.Conv1d(D, D, 1)

    def forward(self, x, mask_pad):
        x = x.transpose(1, 2)
        x = x.masked_fill(~mask_pad, 0.0)
        x = self.pointwise_conv1(x)
        x = nn.functional.glu(x, dim=1)
        x = self.depthwise_conv(x)
        x = torch.nn.functional.silu(self.norm(x))
        x = self.pointwise_conv2(x)
        x = x.masked_fill(~mask_pad, 0.0)
        return x.transpose(1, 2)


class TFFN(nn.Module):

    def __init__(self):
        super().__init__()
        self.w_1 = nn.Linear(D, FF)
        self.w_2 = nn.Linear(FF, D)

    def forward(self, x):
        return self.w_2(torch.nn.functional.silu(self.w_1(x)))


class TConformerLayer(nn.Module):
    """ref math: wenet/models/transformer/encoder_layer.py:130-265."""

    def __init__(self):
        super().__init__()
        self.self_attn = TRelPosMHA()
        self.feed_forward = TFFN()
        self.feed_forward_macaron = TFFN()
        self.conv_module = TConvModule()
        self.norm_ff = nn.LayerNorm(D, eps=1e-5)
        self.norm_mha = nn.LayerNorm(D, eps=1e-5)
        self.norm_ff_macaron = nn.LayerNorm(D, eps=1e-5)
        self.norm_conv = nn.LayerNorm(D, eps=1e-5)
        self.norm_final = nn.LayerNorm(D, eps=1e-5)

    def forward(self, x, mask, pos_emb, mask_pad):
        x = x + 0.5 * self.feed_forward_macaron(self.norm_ff_macaron(x))
        x = x + self.self_attn(self.norm_mha(x), mask, pos_emb)
        x = x + self.conv_module(self.norm_conv(x), mask_pad)
        x = x + 0.5 * self.feed_forward(self.norm_ff(x))
        return self.norm_final(x)


class TSubsampling(nn.Module):
    """ref math: wenet/models/transformer/subsampling.py:174-229."""

    def __init__(self):
        super().__init__()
        self.conv = nn.Sequential(nn.Conv2d(1, D, 3, 2), nn.ReLU(),
                                  nn.Conv2d(D, D, 3, 2), nn.ReLU())
        self.out = nn.Sequential(
            nn.Linear(D * (((IDIM - 1) // 2 - 1) // 2), D))

    def forward(self, x, mask):
        x = x.unsqueeze(1)
        x = self.conv(x)
        b, c, t, f = x.size()
        x = self.out(x.transpose(1, 2).contiguous().view(b, t, c * f))
        return x, mask[:, :, 2::2][:, :, 2::2]


def sinusoid_pe(T):
    pe = torch.zeros(T, D)
    position = torch.arange(0, T, dtype=torch.float32).unsqueeze(1)
    div = torch.exp(
        torch.arange(0, D, 2, dtype=torch.float32) *
        -(math.log(10000.0) / D))
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    return pe.unsqueeze(0)


class TConformerEncoder(nn.Module):

    def __init__(self):
        super().__init__()
        self.embed = TSubsampling()
        self.encoders = nn.ModuleList(
            [TConformerLayer() for _ in range(LAYERS)])
        self.after_norm = nn.LayerNorm(D, eps=1e-5)

    def forward(self, xs, masks):
        xs, masks = self.embed(xs, masks)
        pos_emb = sinusoid_pe(xs.size(1))
        xs = xs * math.sqrt(D)
        for layer in self.encoders:
            xs = layer(xs, masks, pos_emb, masks)
        return self.after_norm(xs), masks


def prefixed_state_dict(tmod, prefix):
    return {prefix + k: v for k, v in tmod.state_dict().items()}


@pytest.fixture(scope='module')
def torch_encoder():
    m = TConformerEncoder()
    # randomize batchnorm running stats to exercise the stats transfer
    for layer in m.encoders:
        bn = layer.conv_module.norm
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
    m.eval()
    return m


def test_conformer_encoder_parity(torch_encoder):
    B, T = 2, 64
    rng = np.random.RandomState(1)
    feats = rng.randn(B, T, IDIM).astype(np.float32)
    lens = np.asarray([T, T - 11])

    with torch.no_grad():
        tmask = (torch.arange(T)[None, :] <
                 torch.tensor(lens)[:, None]).unsqueeze(1)
        tout, _ = torch_encoder(torch.tensor(feats), tmask)
    tout = tout.numpy()

    enc = ConformerEncoder(input_size=IDIM, output_size=D,
                           attention_heads=H, linear_units=FF,
                           num_blocks=LAYERS, cnn_module_kernel=K_CNN,
                           dropout_rate=0.0, positional_dropout_rate=0.0)
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.asarray(feats), jnp.asarray(lens))
    sd = prefixed_state_dict(torch_encoder, 'encoder.')
    # our encoder module is the root here, so strip the prefix the
    # mapper expects from full ASRModel checkpoints
    sd = {k.removeprefix('encoder.'): v for k, v in sd.items()}
    variables = convert_torch_state_dict(sd, variables, strict=True)
    jout, jmask = enc.apply(variables, jnp.asarray(feats),
                            jnp.asarray(lens))
    jout = np.asarray(jout)

    valid = np.asarray(jmask[:, 0, :])
    for b in range(B):
        n = valid[b].sum()
        np.testing.assert_allclose(jout[b, :n], tout[b, :n], atol=2e-4,
                                   rtol=2e-4)


def test_torch_export_roundtrip():
    """flax -> torch state dict -> flax must be the identity (the
    migration path back to the reference's runtimes)."""
    from wenet_tpu.utils.checkpoint import (convert_to_torch_state_dict,
                                            convert_torch_state_dict)
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': IDIM, 'output_dim': 11,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': D, 'attention_heads': H,
                         'linear_units': FF, 'num_blocks': 2,
                         'cnn_module_kernel': K_CNN,
                         'cnn_module_norm': 'batch_norm'},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': H, 'linear_units': FF,
                         'num_blocks': 1, 'r_num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    rng = np.random.RandomState(7)
    variables, _ = init_variables(model, configs)
    # randomize so transposition bugs can't hide behind zeros
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    variables = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.randn(*l.shape), l.dtype)
                  if hasattr(l, 'shape') and l.ndim > 0 else l
                  for l in leaves])
    sd = convert_to_torch_state_dict(variables)
    assert len(sd) > 50, f'suspiciously small export: {len(sd)}'
    restored = convert_torch_state_dict(sd, variables, strict=True)
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_leaves(restored)
    for (kp, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-6, err_msg=str(kp))
