"""wenet_tpu: TPU-native end-to-end speech recognition framework.

Public API mirrors the reference (ref wenet/__init__.py:1):
    import wenet_tpu
    model = wenet_tpu.load_model(model_dir='...')
    result = model.transcribe('audio.wav')
"""

__version__ = '0.1.0'


def __getattr__(name):
    # Lazy: `import wenet_tpu.dataset.kaldi_io` from a data-prep tool
    # must not pay the jax import that cli.model pulls in.
    if name == 'load_model':
        from wenet_tpu.cli.model import load_model
        return load_model
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
