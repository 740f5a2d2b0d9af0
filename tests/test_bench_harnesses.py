"""Fast-tier smoke coverage for the two measurement harnesses round 4
wrote but never ran (VERDICT r4 item #6): unrun harness code rots.

Each runs the ACTUAL harness CLI in a subprocess on CPU with the small
config: bench_serving.py boots the real websocket server subprocess,
builds an orbax checkpoint, ramps real clients and reports latency
percentiles; bench.py --mode attention builds the pipelined AR
beam-search program and reports throughput JSON.  Assertions cover the
JSON contract the BENCH_NOTES rows are filled from.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_env():
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    return env


def last_json_line(stdout):
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith('{'):
            return json.loads(line)
    raise AssertionError(f'no JSON line in output:\n{stdout[-2000:]}')


def test_bench_attention_small_smoke():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'bench.py'),
         '--mode', 'attention', '--small', '--batch', '2'],
        capture_output=True, text=True, timeout=420, env=cpu_env(),
        cwd=REPO)
    sys.stdout.write(proc.stdout[-2000:])
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0
    out = last_json_line(proc.stdout)
    assert out['metric'] == 'attention_beam_throughput'
    assert out['value'] > 0
    assert out['ar_steps_per_sec'] > 0
    assert out['beam'] == 3 and out['batch'] == 2


def test_bench_serving_small_smoke():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'bench_serving.py'),
         '--small', '--steps', '2', '--audio_sec', '1.2',
         '--max_batch', '2', '--port', '10981'],
        capture_output=True, text=True, timeout=540, env=cpu_env(),
        cwd=REPO)
    sys.stdout.write(proc.stdout[-2000:])
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0
    out = last_json_line(proc.stdout)
    assert out['metric'] == 'websocket_realtime_streams'
    assert len(out['steps']) == 1
    step = out['steps'][0]
    assert step['clients'] == 2
    assert step['errors'] == 0
    # percentile plumbing produced real latencies
    assert step['n_partials'] > 0
    assert step['partial_p50'] is not None and step['partial_p50'] >= 0
    assert step['final_p50'] is not None
