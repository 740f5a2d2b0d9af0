"""Pretrained model hub. ref: wenet/cli/hub.py:24-123.

The reference downloads tars from modelscope OSS; this environment is
zero-egress, so download is gated: models found in WENET_TPU_MODEL_HOME
(default ~/.wenet) are used directly, otherwise a clear error explains
how to provision them."""

import os

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

    @staticmethod
    def download_model(name: str) -> str:
        if os.path.isdir(name):
            return name
        model_dir = os.path.join(MODEL_HOME, name)
        if os.path.isdir(model_dir):
            return model_dir
        raise FileNotFoundError(
            f'model "{name}" not found under {MODEL_HOME}; this '
            'environment has no network egress — place the extracted '
            f'model dir (train.yaml + checkpoint) at {model_dir}')
