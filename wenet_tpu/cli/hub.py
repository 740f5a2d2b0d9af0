"""Pretrained model hub. ref: wenet/cli/hub.py:24-123.

Resolution order: an explicit dir, then WENET_TPU_MODEL_HOME
(default ~/.wenet), then — when the host has network egress — the same
modelscope OSS listing the reference uses.  In air-gapped environments
the download step fails with a clear provisioning message."""

import json
import os
import tarfile
import urllib.request

MODEL_HOME = os.environ.get('WENET_TPU_MODEL_HOME',
                            os.path.expanduser('~/.wenet'))

# same model-name table as ref cli/hub.py Hub.Assets
ASSETS = {
    'aishell': 'aishell_u2pp_conformer_libtorch.tar.gz',
    'aishell2': 'aishell2_u2pp_conformer_libtorch.tar.gz',
    'gigaspeech': 'gigaspeech_u2pp_conformer_libtorch.tar.gz',
    'librispeech': 'librispeech_u2pp_conformer_libtorch.tar.gz',
    'multi_cn': 'multi_cn_unified_conformer_libtorch.tar.gz',
    'wenetspeech': 'wenetspeech_u2pp_conformer_libtorch.tar.gz',
    'paraformer': 'paraformer.tar.gz',
    'whisper': 'whisper.tar.gz',
}


class Hub:

    @staticmethod
    def get_model_by_lang(lang: str) -> str:
        mapping = {'chinese': 'wenetspeech', 'english': 'gigaspeech'}
        if lang not in mapping:
            raise ValueError(f'unsupported language {lang}')
        return Hub.download_model(mapping[lang])

    LISTING_URL = ('https://modelscope.cn/api/v1/datasets/wenet/'
                   'wenet_pretrained_models/oss/tree')

    @staticmethod
    def download_model(name: str) -> str:
        if os.path.isdir(name):
            return name
        model_dir = os.path.join(MODEL_HOME, name)
        if os.path.isdir(model_dir) and                 os.path.exists(os.path.join(model_dir, 'train.yaml')):
            return model_dir
        try:
            return Hub._fetch(name, model_dir)
        except Exception as e:  # noqa: BLE001 — egress/HTTP failures
            raise FileNotFoundError(
                f'model "{name}" not found under {MODEL_HOME} and '
                f'download failed ({e}); place the extracted model dir '
                f'(train.yaml + checkpoint) at {model_dir}') from e

    @staticmethod
    def _fetch(name: str, model_dir: str) -> str:
        """Download + extract from the reference model zoo listing."""
        asset = ASSETS[name]
        with urllib.request.urlopen(Hub.LISTING_URL,
                                    timeout=30) as resp:
            listing = json.load(resp)
        info = next(d for d in listing['Data'] if d['Key'] == asset)
        os.makedirs(model_dir, exist_ok=True)
        tar_path = os.path.join(model_dir, asset)
        urllib.request.urlretrieve(info['Url'], tar_path)
        with tarfile.open(tar_path) as tf:
            members = tf.getmembers()
            root = os.path.commonpath([m.name for m in members])                 if len(members) > 1 else ''
            tf.extractall(model_dir, filter='data')
        os.remove(tar_path)
        # flatten a single top-level dir (the tars wrap one folder)
        inner = os.path.join(model_dir, root) if root else model_dir
        if root and os.path.isdir(inner):
            for f in os.listdir(inner):
                os.replace(os.path.join(inner, f),
                           os.path.join(model_dir, f))
            os.rmdir(inner)
        return model_dir
