"""tools/parity_decode.py beyond the 4 shared U2 modes (VERDICT r4
item #7): the PRODUCT decode paths of the non-U2 families — transducer
rnnt_greedy_search (ref Transducer.greedy_search, transducer.py:398)
and paraformer_greedy_search (ref paraformer.py:387-392) — through the
actual CLI against the actual reference stack, on the reference's own
real wavs, zero hypothesis delta required."""

import json
import os
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, 'tools', 'parity_decode.py')
WAVS = [
    '/root/reference/test/resources/aishell-BAC009S0724W0121.wav',
    '/root/reference/test/resources/librispeech-1995-1837-0001.wav',
]
VOCAB = 30


def run_tool(tmp_path, config, modes):
    config_path = tmp_path / 'train.yaml'
    with open(config_path, 'w') as f:
        yaml.safe_dump(config, f)
    wav_list = tmp_path / 'wav.scp'
    with open(wav_list, 'w') as f:
        for w in WAVS:
            f.write(f'{os.path.basename(w)[:-4]} {w}\n')
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    result_dir = tmp_path / 'out'
    proc = subprocess.run(
        [sys.executable, TOOL,
         '--config', str(config_path),
         '--wav_list', str(wav_list),
         '--modes', modes,
         '--result_dir', str(result_dir)],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=REPO)
    sys.stdout.write(proc.stdout[-3000:])
    sys.stderr.write(proc.stderr[-3000:])
    assert proc.returncode == 0, f'parity_decode delta in {modes}'
    return json.loads((result_dir / 'report.json').read_text())


@pytest.mark.slow
def test_parity_decode_transducer_greedy(tmp_path):
    if not all(os.path.exists(w) for w in WAVS):
        pytest.skip('reference wav fixtures not present')
    from tests.test_reference_parity_zoo import TD_CFG
    import copy
    config = copy.deepcopy(TD_CFG)
    config['dataset_conf'] = {
        'fbank_conf': {'num_mel_bins': config['input_dim'],
                       'frame_shift': 10, 'frame_length': 25}}
    report = run_tool(tmp_path, config, 'rnnt_greedy_search')
    row = report['rnnt_greedy_search']
    assert row['utts'] == 2 and row['identical'] == 2


@pytest.mark.slow
def test_parity_decode_paraformer_greedy(tmp_path):
    if not all(os.path.exists(w) for w in WAVS):
        pytest.skip('reference wav fixtures not present')
    from tests.test_reference_parity_zoo import PARA_CFG
    import copy
    config = copy.deepcopy(PARA_CFG)
    # raw 20-mel fbank: BOTH stacks apply LFR inside the model
    # (ref paraformer.py:288, ours models/paraformer/paraformer.py:105)
    config['dataset_conf'] = {
        'fbank_conf': {'num_mel_bins': 20, 'frame_shift': 10,
                       'frame_length': 25}}
    report = run_tool(tmp_path, config, 'paraformer_greedy_search')
    row = report['paraformer_greedy_search']
    assert row['utts'] == 2 and row['identical'] == 2
