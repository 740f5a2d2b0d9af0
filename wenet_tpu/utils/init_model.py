"""Config-driven model construction registry.

ref: wenet/utils/init_model.py:52-217.  Consumes the same train.yaml
schema as the reference (encoder/decoder/ctc/model + *_conf sections) so
existing configs and exported model dirs work unchanged.

Because linen modules are pure config containers, `init_model` returns
the module; `init_variables` materializes the param pytree (optionally
loading a PyTorch reference checkpoint or an orbax checkpoint).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.models.transformer.ctc import CTC
from wenet_tpu.models.transformer.decoder import (BiTransformerDecoder,
                                                  TransformerDecoder)
from wenet_tpu.models.transformer.encoder import (ConformerEncoder,
                                                  TransformerEncoder)
from wenet_tpu.models.transducer.joint import TransducerJoint
from wenet_tpu.models.transducer.predictor import (ConvPredictor,
                                                   EmbeddingPredictor,
                                                   RNNPredictor)
from wenet_tpu.models.transducer.transducer import Transducer
from wenet_tpu.models.branchformer.encoder import BranchformerEncoder
from wenet_tpu.models.ctl_model.asr_model_ctl import CTLModel
from wenet_tpu.models.k2.model import K2Model
from wenet_tpu.models.firered.model import (FireRedConformerEncoder,
                                            FireRedModel)
from wenet_tpu.models.sensevoice.sensevoice_small_model import (
    SanmEncoderWithTp, SenseVoiceSmall)
from wenet_tpu.models.e_branchformer.encoder import EBranchformerEncoder
from wenet_tpu.models.efficient_conformer.encoder import (
    EfficientConformerEncoder)
from wenet_tpu.models.paraformer.layers import SanmDecoder, SanmEncoder
from wenet_tpu.models.squeezeformer.encoder import SqueezeformerEncoder
from wenet_tpu.models.ssl.w2vbert_model import SSL_MODEL_CLASSES
from wenet_tpu.models.paraformer.paraformer import Paraformer, Predictor
from wenet_tpu.models.whisper.whisper import Whisper

ENCODER_CLASSES = {
    'transformer': TransformerEncoder,
    'conformer': ConformerEncoder,
    'sanm_encoder': SanmEncoder,
    'branchformer': BranchformerEncoder,
    'e_branchformer': EBranchformerEncoder,
    'squeezeformer': SqueezeformerEncoder,
    'efficientConformer': EfficientConformerEncoder,
    'dual_transformer': TransformerEncoder,
    'dual_conformer': ConformerEncoder,
    'sanm_encoder_with_tp': SanmEncoderWithTp,
    'firered_conformer': FireRedConformerEncoder,
}

DECODER_CLASSES = {
    'transformer': TransformerDecoder,
    'bitransformer': BiTransformerDecoder,
    'sanm_decoder': SanmDecoder,
}

CTC_CLASSES = {
    'ctc': CTC,
}

MODEL_CLASSES = {
    'asr_model': ASRModel,
    'whisper': Whisper,
    'transducer': Transducer,
    'paraformer': Paraformer,
    'ctl_model': CTLModel,
    'sensevoice_small': SenseVoiceSmall,
    'firered': FireRedModel,
    'k2_model': K2Model,
}

PREDICTOR_CLASSES: Dict[str, Any] = {
    'rnn': RNNPredictor,
    'embedding': EmbeddingPredictor,
    'conv': ConvPredictor,
}
JOINT_CLASSES: Dict[str, Any] = {
    'transducer_joint': TransducerJoint,
}


def register_model(name, cls):
    MODEL_CLASSES[name] = cls


def register_encoder(name, cls):
    ENCODER_CLASSES[name] = cls


def register_decoder(name, cls):
    DECODER_CLASSES[name] = cls


# config keys the torch reference accepts but that are implicit or
# renamed here
_ENCODER_DROP_KEYS = {'use_sdpa', 'selfattention_layer_type_checked'}
_DECODER_DROP_KEYS = {'use_sdpa'}


def _filter_conf(conf: dict, cls, drop) -> dict:
    fields = {f.name for f in cls.__dataclass_fields__.values()}
    out = {}
    for k, v in conf.items():
        if k in drop:
            continue
        if k in fields:
            out[k] = v
    return out


def init_model(args, configs) -> Tuple[Any, dict]:
    """Build the (unbound) model module from a wenet-style config.

    ref: init_model.py:100-217.  When args.use_lora (or configs has a
    lora_conf with use_lora), attention projections are built as
    LoRADense (ref init_model.py:190-191 inject_lora_to_model)."""
    lora_conf = None
    if getattr(args, 'use_lora', False) or \
            configs.get('lora_conf', {}).get('use_lora', False):
        lc = configs.get('lora_conf', {})
        lora_conf = {
            'lora_rank': lc.get('lora_rank', 8),
            'lora_alpha': lc.get('lora_alpha', 8),
            'lora_dropout': lc.get('lora_dropout', 0.0),
            'lora_list': tuple(lc.get('lora_list',
                                      ['o', 'q', 'k', 'v'])),
        }
    if lora_conf is not None:
        # attention projections become LoRADense via the lora_conf field
        # (linen setup() is lazy, so the conf must travel in the module)
        packed = tuple(sorted(lora_conf.items()))
        configs.setdefault('encoder_conf', {})['lora_conf'] = packed
        if configs.get('lora_conf', {}).get('lora_decoder', False):
            configs.setdefault('decoder_conf', {})['lora_conf'] = packed
    return _init_model_inner(args, configs)


def _init_model_inner(args, configs) -> Tuple[Any, dict]:
    input_dim = configs['input_dim']
    vocab_size = configs['output_dim']

    encoder_type = configs.get('encoder', 'conformer')
    decoder_type = configs.get('decoder', 'bitransformer')
    ctc_type = configs.get('ctc', 'ctc')
    model_type = configs.get('model', 'asr_model')
    configs['model'] = model_type
    if model_type in SSL_MODEL_CLASSES:
        decoder_type = None

    use_cmvn = configs.get('cmvn', None) == 'global_cmvn'
    if model_type == 'sensevoice_small':
        # sensevoice owns its cmvn at the MODEL level (applied after
        # LFR, before the context tokens are prepended) — the reference
        # moves it out of the encoder (sensevoice_small_model.py:180-182)
        use_cmvn = False

    enc_cls = ENCODER_CLASSES[encoder_type]
    raw_enc_conf = dict(configs['encoder_conf'])
    raw_enc_conf.update(raw_enc_conf.pop('efficient_conf', {}))
    enc_conf = _filter_conf(raw_enc_conf, enc_cls, _ENCODER_DROP_KEYS)
    encoder = enc_cls(input_size=input_dim, use_cmvn=use_cmvn,
                      name='encoder', **enc_conf)

    decoder = None
    if decoder_type is not None:
        dec_cls = DECODER_CLASSES[decoder_type]
        dec_conf = _filter_conf(configs.get('decoder_conf', {}), dec_cls,
                                _DECODER_DROP_KEYS)
        decoder = dec_cls(vocab_size=vocab_size,
                          encoder_output_size=encoder.output_size,
                          name='decoder', **dec_conf)

    blank_id = configs.get('ctc_conf', {}).get('ctc_blank_id', 0)
    ctc = CTC_CLASSES[ctc_type](odim=vocab_size,
                                encoder_output_size=encoder.output_size,
                                blank_id=blank_id, name='ctc')

    special_tokens = configs.get('tokenizer_conf',
                                 {}).get('special_tokens', None)
    if special_tokens is None and model_type == 'whisper':
        # the whisper tokenizer's special ids are implied by vocab
        # layout (ref train_utils.py check_modify_and_save_config
        # injects them from the tokenizer; here derived directly)
        from wenet_tpu.models.whisper.convert import (
            default_special_tokens)
        special_tokens = default_special_tokens(vocab_size)
    model_conf = dict(configs.get('model_conf', {}))
    if model_type in SSL_MODEL_CLASSES:
        # ref: wenet/models/ssl/init_model.py:12-19
        ssl_cls = SSL_MODEL_CLASSES[model_type]
        ssl_conf = _filter_conf(model_conf, ssl_cls, set())
        return ssl_cls(encoder=encoder, **ssl_conf), configs
    model_cls = MODEL_CLASSES[model_type]
    extra = {}
    if model_type == 'transducer':
        # ref: init_model.py:137-154
        predictor_type = configs.get('predictor', 'rnn')
        joint_type = configs.get('joint', 'transducer_joint')
        pred_cls = PREDICTOR_CLASSES[predictor_type]
        pred_conf = _filter_conf(configs.get('predictor_conf', {}),
                                 pred_cls, set())
        predictor = pred_cls(voca_size=vocab_size, name='predictor',
                             **pred_conf)
        joint_cls = JOINT_CLASSES[joint_type]
        joint_conf = _filter_conf(configs.get('joint_conf', {}),
                                  joint_cls, set())
        joint_conf.setdefault('enc_output_size', encoder.output_size)
        joint_conf.setdefault('pred_output_size',
                              pred_conf.get('output_size', 256))
        joint_conf.setdefault('join_dim', 256)
        joint = joint_cls(vocab_size=vocab_size, name='joint',
                          **joint_conf)
        extra = {'predictor': predictor, 'joint': joint, 'blank': 0}
    elif model_type == 'paraformer':
        # ref: init_model.py:155-168
        pred_conf = _filter_conf(configs.get('predictor_conf', {}),
                                 Predictor, set())
        pred_conf.setdefault('idim', encoder.output_size
                             if hasattr(encoder, 'output_size') else 256)
        pred_conf.setdefault('l_order', 1)
        pred_conf.setdefault('r_order', 1)
        extra = {'predictor': Predictor(name='predictor', **pred_conf)}
    model_conf = _filter_conf(model_conf, model_cls, set())
    model = model_cls(vocab_size=vocab_size, encoder=encoder,
                      decoder=decoder, ctc=ctc,
                      special_tokens=special_tokens, **extra,
                      **model_conf)
    return model, configs


def init_variables(model, configs, rng: Optional[jax.Array] = None,
                   checkpoint: Optional[str] = None,
                   dtype=jnp.float32):
    """Materialize variables; optionally load cmvn stats + checkpoint.

    `checkpoint` may be a torch .pt state dict (reference format) or an
    orbax checkpoint directory."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    input_dim = configs['input_dim']
    if 'lfr_conf' in configs:
        # paraformer: model input is pre-LFR features
        input_dim = input_dim // configs['lfr_conf'].get('lfr_m', 7)
    feats = jnp.zeros((1, 16, input_dim), dtype)
    feats_lengths = jnp.asarray([16])
    target = jnp.zeros((1, 4), jnp.int32)
    target_lengths = jnp.asarray([4])
    # jit the init AND pin it to the host CPU backend: eager flax init
    # dispatches the whole forward op by op (one link RTT each on a
    # remote-TPU setup — measured 148 s for the flagship model), and
    # even jitted, fetching ~185 MB of freshly-initialized params back
    # through the tunnel costs minutes.  Init values are either
    # overwritten by a checkpoint or re-uploaded to the device by the
    # executor/runner with their proper shardings, so computing them
    # on-host is free of both the device compile and the transfer.
    orbax_ckpt = checkpoint is not None and not checkpoint.endswith(
        ('.pt', '.pth', '.bin', '.zip'))
    if orbax_ckpt:
        # an orbax checkpoint restores EVERY leaf, so the init values
        # are never read — build the tree abstractly (no compile, no
        # execution, no transfer: a flagship server cold-starts in
        # seconds instead of minutes)
        variables = jax.eval_shape(model.init, rng, feats,
                                   feats_lengths, target,
                                   target_lengths)
    else:
        cpu0 = jax.devices('cpu')[0]
        with jax.default_device(cpu0):
            variables = jax.jit(model.init)(rng, feats, feats_lengths,
                                            target, target_lengths)
        variables = jax.device_get(variables)

    if configs.get('cmvn', None) == 'global_cmvn' and \
            configs.get('cmvn_conf', {}).get('cmvn_file'):
        from wenet_tpu.utils.cmvn import load_cmvn
        mean, istd = load_cmvn(configs['cmvn_conf']['cmvn_file'],
                               configs['cmvn_conf'].get(
                                   'is_json_cmvn', True))
        cmvn = variables.get('cmvn', {})
        if 'encoder' in cmvn and 'global_cmvn' in cmvn['encoder']:
            cmvn['encoder']['global_cmvn']['mean'] = jnp.asarray(mean)
            cmvn['encoder']['global_cmvn']['istd'] = jnp.asarray(istd)
        elif 'global_cmvn' in cmvn:
            # model-level cmvn (sensevoice, ref :180-182)
            cmvn['global_cmvn']['mean'] = jnp.asarray(mean)
            cmvn['global_cmvn']['istd'] = jnp.asarray(istd)

    infos = {}
    if checkpoint is not None:
        from wenet_tpu.utils.checkpoint import load_checkpoint
        variables, infos = load_checkpoint(model, variables, checkpoint)
    configs['init_infos'] = infos
    return variables, configs
