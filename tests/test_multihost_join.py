"""Multi-host uneven-data epoch alignment.

Spawns a REAL 2-process jax.distributed local cluster (CPU backend,
4 virtual devices per process) whose two workers feed the Executor
deliberately UNEVEN shard sizes (5 vs 3 batches) while the train step
performs a cross-process collective every step.  Without the
`wenet_join` consensus (wenet_tpu/utils/train_utils.py, analog of ref
wenet/utils/train_utils.py:640-666 monitored_barrier), the longer host
would enter the collective alone at step 4 and the test would hang —
both workers must complete the epoch with EXACTLY min(5,3)=3 steps.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r'''
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from wenet_tpu.utils.executor import Executor

n_batches = 5 if pid == 0 else 3  # deliberately uneven shards


def loader():
    for _ in range(n_batches):
        yield {'feats': np.zeros((2, 8, 4), np.float32),
               'feats_lengths': np.asarray([8, 8]),
               'target': np.asarray([[1], [1]], np.int32),
               'target_lengths': np.asarray([1, 1])}


steps = []


def fake_step(state, batch, rng):
    # a real cross-process collective: hangs forever if the hosts
    # ever step an unequal number of times
    s = multihost_utils.process_allgather(jnp.asarray([1.0]))
    steps.append(float(np.sum(np.asarray(s))))
    return state, {'loss': jnp.sum(batch['feats'])}


ex = Executor()
ex.train(fake_step, None, loader(), None, None, None,
         {'log_interval': 10 ** 9})
assert len(steps) == 3, f'worker {pid} took {len(steps)} steps'
print(f'WORKER{pid} OK steps={len(steps)}', flush=True)
'''


@pytest.mark.slow
def test_two_process_uneven_epoch(tmp_path):
    script = tmp_path / 'worker.py'
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    coordinator = f'localhost:{port}'
    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                        ' --xla_force_host_platform_device_count=4'
                        ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    procs = [subprocess.Popen(
        [sys.executable, str(script), coordinator, str(i)],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('multi-host epoch deadlocked (join guard broken)')
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert f'WORKER{i} OK steps=3' in out, out
