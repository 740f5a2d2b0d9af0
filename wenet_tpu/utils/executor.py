"""Epoch train/cv loops. ref: wenet/utils/executor.py:41-161.

The reference threads DDP no_sync/join and AMP scalers through the loop;
here those collapse into the compiled train step — the executor is pure
host orchestration: step the iterator, feed the chip, log, trigger
step-interval CV + checkpointing.
"""

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wenet_tpu.utils.checkpoint import save_checkpoint
from wenet_tpu.utils.common import StepTimer


def _pad_rows(x, n, value=0):
    if n <= 0:
        return x
    pad = [(0, n)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, constant_values=value)


def _to_device_batch(batch, mesh=None):
    keep = ('feats', 'feats_lengths', 'target', 'target_lengths')
    out = {k: np.asarray(batch[k]) for k in keep}
    out['target'] = out['target'].astype(np.int32)
    if mesh is not None:
        from wenet_tpu.parallel.mesh import DATA_AXIS, shard_batch
        dsize = mesh.shape.get(DATA_AXIS, 1)
        B = out['feats'].shape[0]
        rem = (-B) % dsize
        if rem:
            # pad ragged tail batches with zero-length dummies so the
            # batch dim shards evenly; target must pad with IGNORE_ID so
            # add_sos_eos sees zero-length labels (0-padded rows would
            # look like full-length token-0 sequences and pollute the
            # attention loss / th_accuracy)
            out = {k: _pad_rows(v, rem, -1 if k == 'target' else 0)
                   for k, v in out.items()}
        return shard_batch(out, mesh)
    return {k: jnp.asarray(v) for k, v in out.items()}


class Executor:

    def __init__(self, global_step: int = 0, device=None):
        self.step = global_step
        self.train_step_timer: Optional[StepTimer] = None
        self._prof_active = False

    def train(self, train_step_fn, state, train_data_loader,
              cv_data_loader, cv_step_fn, writer, configs,
              group_join=None, mesh=None, model_dir: Optional[str] = None,
              tag: str = ''):
        """One epoch. ref: executor.py:41-118."""
        log_interval = configs.get('log_interval', 100)
        save_interval = configs.get('save_interval', None)
        epoch = configs.get('epoch', 0)
        accum = configs.get('accum_grad', 1)
        if self.train_step_timer is None:
            self.train_step_timer = StepTimer(self.step)
        rng = jax.random.PRNGKey(configs.get('seed', 777) + epoch)
        prof = configs.get('profile')
        from wenet_tpu.utils.train_utils import wenet_join
        data_iter = iter(train_data_loader)
        while True:
            # pull the next non-empty local batch, then reach all-hosts
            # consensus BEFORE entering the collective step program
            # (uneven shards would otherwise deadlock multi-host pjit;
            # ref train_utils.py:640-666 wenet_join)
            batch = next(data_iter, None)
            while batch is not None and \
                    batch['target_lengths'].size == 0:
                batch = next(data_iter, None)
            if wenet_join(batch is not None):
                break
            if prof is not None and self.step == prof['start']:
                jax.profiler.start_trace(prof['dir'])
                self._prof_active = True
            if prof is not None and self._prof_active and \
                    self.step == prof['start'] + prof['steps']:
                jax.profiler.stop_trace()
                self._prof_active = False
                prof = None
            dbatch = _to_device_batch(batch, mesh)
            state, metrics = train_step_fn(state, dbatch, rng)
            self.step += 1
            if self.step % log_interval == 0:
                metrics = {k: float(v) for k, v in
                           jax.device_get(metrics).items()}
                sps = self.train_step_timer.steps_per_second(self.step)
                logging.info(
                    'TRAIN | epoch %d step %d | %s | %.2f steps/s',
                    epoch, self.step,
                    ' '.join(f'{k} {v:.6f}' for k, v in
                             metrics.items()), sps)
                if writer is not None:
                    for k, v in metrics.items():
                        writer.add_scalar(f'train/{k}', v, self.step)
            if (save_interval is not None and self.step > 0
                    and self.step % save_interval == 0):
                loss_dict = self.cv(cv_step_fn, state, cv_data_loader,
                                    configs)
                logging.info('CV @step %d: %s', self.step, loss_dict)
                # rank guard: only host 0 writes (same as the epoch-end
                # save in bin/train.py; concurrent orbax saves to one
                # path race destructively)
                if model_dir is not None and jax.process_index() == 0:
                    info = dict(tag=f'step_{self.step}', step=self.step,
                                epoch=epoch,
                                cv_loss=loss_dict.get('loss'))
                    save_checkpoint(
                        state.variables(),
                        os.path.join(model_dir, f'step_{self.step}'),
                        info)
                if writer is not None:
                    for k, v in loss_dict.items():
                        writer.add_scalar(f'cv/{k}', v, self.step)
        # the data can run out before start+steps profiled steps have
        # executed — flush the trace rather than dropping it
        if self._prof_active:
            jax.profiler.stop_trace()
            self._prof_active = False
        return state

    def cv(self, cv_step_fn, state, cv_data_loader, configs):
        """ref: executor.py:120-161."""
        total = {}
        num_seen = 0
        for batch in cv_data_loader:
            if batch['target_lengths'].size == 0:
                continue
            dbatch = _to_device_batch(batch)
            out, num_utts = cv_step_fn(state, dbatch)
            out = jax.device_get(out)
            num_seen += int(num_utts)
            for k, v in out.items():
                if v is None:
                    continue
                total[k] = total.get(k, 0.0) + float(v) * int(num_utts)
        return {k: v / max(num_seen, 1) for k, v in total.items()}
