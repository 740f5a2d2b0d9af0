"""Training entry. ref: wenet/bin/train.py:42-190.

Same CLI surface (config / data lists / model_dir / checkpoint /
override_config); engine flags (deepspeed/fsdp) are replaced by mesh
options (--mesh data=8,model=1)."""

import argparse
import datetime
import logging
import os

import jax
import jax.numpy as jnp
import yaml

from wenet_tpu.dataset.dataset import Dataset
from wenet_tpu.parallel.mesh import make_mesh, replicated
from wenet_tpu.utils.checkpoint import save_checkpoint
from wenet_tpu.utils.config import load_config, save_config
from wenet_tpu.utils.executor import Executor
from wenet_tpu.utils.init_model import init_model, init_variables
from wenet_tpu.utils.init_tokenizer import init_tokenizer
from wenet_tpu.utils.train_utils import (compile_train_step,
                                         create_train_state,
                                         init_optimizer_and_scheduler,
                                         make_cv_step)


def get_args():
    parser = argparse.ArgumentParser(description='training your network')
    parser.add_argument('--config', required=True)
    parser.add_argument('--train_data', required=True)
    parser.add_argument('--cv_data', required=True)
    parser.add_argument('--data_type', default='raw',
                        choices=['raw', 'shard'])
    parser.add_argument('--model_dir', required=True)
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--tensorboard_dir', default='tensorboard')
    parser.add_argument('--override_config', action='append', default=[])
    parser.add_argument('--mesh', default=None,
                        help='e.g. data=8 or data=4,model=2')
    parser.add_argument('--num_workers', type=int, default=0,
                        help='unused (thread prefetch built in)')
    parser.add_argument('--prefetch', type=int, default=2)
    parser.add_argument('--seed', type=int, default=777)
    parser.add_argument('--prng_impl', default='unsafe_rbg',
                        choices=['unsafe_rbg', 'rbg', 'threefry2x32'],
                        help='PRNG for dropout/chunk masks. threefry '
                             'bit-generation costs ~45%% of a conformer '
                             'train step on TPU; unsafe_rbg uses the '
                             'hardware RNG path (+79%% step throughput '
                             'measured, BENCH_NOTES.md) and is the '
                             'standard choice for TPU training')
    parser.add_argument('--no_flash_train', action='store_true',
                        help='disable the pallas flash rel-pos '
                             'attention kernels (in-kernel dropout) '
                             'for training.  Default ON on TPU: the '
                             'XLA train path\'s (B,h,T,T) fp32 score/'
                             'mask HBM traffic is the measured step '
                             'bound (BENCH_NOTES.md trace analysis); '
                             'the flash dropout stream differs from '
                             'flax nn.Dropout (same rate, '
                             'deterministic per seed)')
    parser.add_argument('--profile_dir', default=None,
                        help='write a jax.profiler trace (xplane, '
                             'viewable in tensorboard/xprof) covering '
                             '--profile_steps steps of epoch 0')
    parser.add_argument('--profile_start_step', type=int, default=10)
    parser.add_argument('--profile_steps', type=int, default=5)
    return parser.parse_args()


def parse_mesh(spec):
    if not spec:
        return None
    return {k: int(v) for k, v in
            (kv.split('=') for kv in spec.split(','))}


def main():
    args = get_args()
    jax.config.update('jax_default_prng_impl', args.prng_impl)
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    if not args.no_flash_train:
        # no-op off-TPU (_flash_train_eligible checks the backend)
        from wenet_tpu.models.transformer.attention import (
            enable_flash_attention)
        enable_flash_attention(True, train_dropout=True)
        # record which dropout-mask stream produced the checkpoint:
        # flash-train's in-kernel counter-hash stream differs from
        # flax nn.Dropout (same rate), and numerics differ TPU vs
        # other backends because eligibility gates on the backend
        if jax.default_backend() == 'tpu':
            logging.info('flash-train ACTIVE: rel-pos attention rides '
                         'the pallas flash kernels with in-kernel '
                         'counter-hash dropout (mask stream differs '
                         'from flax nn.Dropout; --no_flash_train to '
                         'disable)')
        else:
            logging.info('flash-train requested but SKIPPED: backend '
                         'is %s, not tpu — training uses the XLA '
                         'attention path with flax nn.Dropout masks',
                         jax.default_backend())
    configs = load_config(args.config, args.override_config)
    configs['seed'] = args.seed

    # `dataset: ssl` = untranscribed-audio pretraining (BEST-RQ/
    # wav2vec2/w2vbert): no tokenizer, wav-only data.list entries
    # (ref wenet/utils/init_dataset.py:16-23 +
    # wenet/models/ssl/init_dataset.py:156)
    dataset_type = configs.get('dataset', 'asr')
    tokenizer = None if dataset_type == 'ssl' else \
        init_tokenizer(configs)
    configs['input_dim'] = configs['dataset_conf'].get(
        'fbank_conf', configs['dataset_conf'].get(
            'mfcc_conf', configs['dataset_conf'].get(
                'log_mel_spectrogram_conf', {}))).get(
                    'num_mel_bins', 80)
    if 'lfr_conf' in configs:
        # paraformer convention: input_dim is the post-LFR dim
        # (mel * lfr_m), matching check_modify_and_save_config in the
        # reference (ref train_utils.py:289-296)
        configs['input_dim'] *= configs['lfr_conf'].get('lfr_m', 7)
    if tokenizer is not None:
        configs['output_dim'] = tokenizer.vocab_size()
    else:
        configs.setdefault('output_dim', 1)  # SSL heads don't use it

    # multi-host: initialize the jax distributed runtime when launched
    # with coordinator env (replaces torchrun env://,
    # ref train_utils.py:252-270)
    if 'JAX_COORDINATOR' in os.environ:
        jax.distributed.initialize(
            os.environ['JAX_COORDINATOR'],
            int(os.environ.get('JAX_NUM_PROCESSES', 1)),
            int(os.environ.get('JAX_PROCESS_ID', 0)))
    num_hosts = jax.process_count()
    host_id = jax.process_index()

    train_conf = configs['dataset_conf']
    cv_conf = dict(train_conf)
    cv_conf['speed_perturb'] = False
    cv_conf['spec_aug'] = False
    cv_conf['spec_sub'] = False
    cv_conf['spec_trim'] = False
    cv_conf['on_device_frontend'] = False  # CV uses host features
    cv_conf['shuffle'] = False
    cv_conf['list_shuffle'] = False
    cv_conf['cycle'] = 1

    train_dataset = Dataset(args.data_type, args.train_data, tokenizer,
                            train_conf, partition=True,
                            num_shards=num_hosts, shard_id=host_id)
    cv_dataset = Dataset(args.data_type, args.cv_data, tokenizer,
                         cv_conf, partition=False)

    model, configs = init_model(args, configs)
    variables, configs = init_variables(model, configs,
                                        jax.random.PRNGKey(args.seed),
                                        checkpoint=args.checkpoint)
    tx, schedule = init_optimizer_and_scheduler(configs)
    state = create_train_state(variables, tx)
    resume_step = int(configs.get('init_infos', {}).get('step', 0))
    if resume_step > 0:
        # restore the schedule position on resume — the checkpoint
        # sidecar stores int(state.step)
        from wenet_tpu.utils.train_utils import restore_optimizer_step
        state = restore_optimizer_step(
            state, resume_step, int(configs.get('accum_grad', 1)))

    mesh = make_mesh(parse_mesh(args.mesh))
    # mixed precision: configs['dtype'] in {'fp32','bf16'}
    # (ref train.py --dtype / autocast)
    compute_dtype = {'bf16': jnp.bfloat16}.get(
        configs.get('dtype', 'fp32'))
    # sharding_conf: {model_axis: bool, zero2: bool, min_dim: int}
    # (tp / expert-parallel / ZeRO-2 layouts, docs/parallel.md)
    sh_conf = configs.get('sharding_conf', {})
    state_sharding = None
    if sh_conf.get('model_axis') or sh_conf.get('zero2'):
        from wenet_tpu.parallel.mesh import state_shardings
        state_sharding = state_shardings(
            state, mesh,
            shard_model_axis=sh_conf.get('model_axis', False),
            min_dim=sh_conf.get('min_dim', 512),
            zero2=sh_conf.get('zero2', False))
    frontend_conf = None
    if configs['dataset_conf'].get('on_device_frontend', False):
        dc = configs['dataset_conf']
        frontend_conf = dict(dc.get('fbank_conf', {}))
        frontend_conf['sample_rate'] = dc.get('resample_conf', {}).get(
            'resample_rate', 16000)
        frontend_conf['spec_aug'] = dc.get('spec_aug', True)
        frontend_conf['spec_aug_conf'] = dc.get('spec_aug_conf', {})
        frontend_conf['spec_sub'] = dc.get('spec_sub', False)
        frontend_conf['spec_sub_conf'] = dc.get('spec_sub_conf', {})
        # traced spec_aug has no time-warp; drop host-only keys
        frontend_conf['spec_aug_conf'] = {
            k: v for k, v in frontend_conf['spec_aug_conf'].items()
            if k in ('num_t_mask', 'num_f_mask', 'max_t', 'max_f')}
    train_step = compile_train_step(model, tx, mesh, schedule,
                                    compute_dtype=compute_dtype,
                                    state_sharding=state_sharding,
                                    frontend_conf=frontend_conf,
                                    accum_grad=configs.get('accum_grad', 1))
    cv_step = jax.jit(make_cv_step(model))

    if host_id == 0:
        os.makedirs(args.model_dir, exist_ok=True)
        save_config(configs, os.path.join(args.model_dir, 'train.yaml'))
    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        if host_id == 0:
            writer = SummaryWriter(
                os.path.join(args.tensorboard_dir,
                             os.path.basename(args.model_dir)))
    except ImportError:
        pass

    executor = Executor(
        global_step=int(configs.get('init_infos', {}).get('step', 0)))
    start_epoch = int(configs.get('init_infos', {}).get('epoch', -1)) + 1
    max_epoch = configs.get('max_epoch', 100)
    # put state on the mesh
    state = jax.device_put(state, state_sharding
                           if state_sharding is not None
                           else replicated(mesh))
    if args.profile_dir and host_id == 0:
        # device-level tracing (the reference has no profiler at all;
        # on TPU xprof shows per-op MXU/HBM utilization)
        configs['profile'] = dict(dir=args.profile_dir,
                                  start=args.profile_start_step,
                                  steps=args.profile_steps)
    for epoch in range(start_epoch, max_epoch):
        configs['epoch'] = epoch
        logging.info('Epoch %d TRAIN info lr %s', epoch,
                     float(schedule(state.step //
                                    max(configs.get('accum_grad', 1), 1))))
        state = executor.train(train_step, state, train_dataset,
                               cv_dataset, cv_step, writer, configs,
                               mesh=mesh, model_dir=args.model_dir)
        loss_dict = executor.cv(cv_step, state, cv_dataset, configs)
        logging.info('Epoch %d CV info %s', epoch, loss_dict)
        if host_id == 0:
            info = dict(epoch=epoch, step=int(state.step),
                        tag=f'epoch_{epoch}',
                        cv_loss=float(loss_dict.get('loss', 0.0)),
                        save_time=datetime.datetime.now().strftime(
                            '%d/%m/%Y %H:%M:%S'))
            save_checkpoint(state.variables(),
                            os.path.join(args.model_dir,
                                         f'epoch_{epoch}'), info)
            final = os.path.join(args.model_dir, 'final')
            if os.path.islink(final):
                os.unlink(final)
            if not os.path.exists(final):
                os.symlink(f'epoch_{epoch}', final)


if __name__ == '__main__':
    main()
