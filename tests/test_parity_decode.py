"""tools/parity_decode.py: the WER-delta harness for the trained-
checkpoint north star (SURVEY §7 stage 10; VERDICT r3 missing #2).

Runs the actual CLI in a subprocess: a random-weight FLAGSHIP
(256d/12L/4233-vocab U2++) torch checkpoint is decoded through the
reference python stack AND wenet_tpu on the reference's own real wavs
(/root/reference/test/resources), in every shared decode mode, and
the tool must report zero hypothesis delta (exit code 0).
"""

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


@pytest.mark.slow
def test_parity_decode_zero_delta_flagship(tmp_path):
    if not all(os.path.exists(w) for w in WAVS):
        pytest.skip('reference wav fixtures not present')
    import __graft_entry__
    config = __graft_entry__._flagship_config()
    config_path = tmp_path / 'train.yaml'
    with open(config_path, 'w') as f:
        yaml.safe_dump(config, f)

    # a real torch checkpoint file exercises the --checkpoint load path
    import copy
    from types import SimpleNamespace

    import torch

    import refwenet
    refwenet.load()
    from wenet.utils.init_model import init_model as ref_init_model
    torch.manual_seed(1234)
    tmodel, _ = ref_init_model(SimpleNamespace(), copy.deepcopy(config))
    ckpt = tmp_path / 'final.pt'
    torch.save(tmodel.state_dict(), str(ckpt))

    wav_list = tmp_path / 'wav.scp'
    with open(wav_list, 'w') as f:
        for w in WAVS:
            f.write(f'{os.path.basename(w)[:-4]} {w}\n')
    # ground-truth path too (token-level WER vs truth columns)
    text = tmp_path / 'text'
    with open(text, 'w') as f:
        f.write('aishell-BAC009S0724W0121 广 州 市 房 地 产 中 介 协 会 分 析\n')
        f.write('librispeech-1995-1837-0001 hello world\n')

    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    result_dir = tmp_path / 'out'
    proc = subprocess.run(
        [sys.executable, TOOL,
         '--config', str(config_path),
         '--checkpoint', str(ckpt),
         '--wav_list', str(wav_list),
         '--text', str(text),
         '--result_dir', str(result_dir)],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=REPO)
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-4000:])
    assert proc.returncode == 0, 'parity_decode reported a delta'

    report = json.loads((result_dir / 'report.json').read_text())
    assert set(report) == {'ctc_greedy_search', 'ctc_prefix_beam_search',
                           'attention', 'attention_rescoring'}
    for mode, row in report.items():
        assert row['utts'] == 2, mode
        assert row['identical'] == 2, (mode, row)
        assert row['wer_delta'] == 0.0, (mode, row)
        assert row['wer_diff'] == 0.0, (mode, row)
    # hypothesis files written for both stacks
    for mode in report:
        for side in ('ref', 'tpu'):
            path = result_dir / f'{mode}.{side}.text'
            assert path.exists()
            assert len(path.read_text().splitlines()) == 2
