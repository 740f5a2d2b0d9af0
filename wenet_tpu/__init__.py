"""wenet_tpu: TPU-native end-to-end speech recognition framework.

Public API mirrors the reference (ref wenet/__init__.py:1):
    import wenet_tpu
    model = wenet_tpu.load_model(model_dir='...')
    result = model.transcribe('audio.wav')
"""

from wenet_tpu.cli.model import load_model  # noqa: F401

__version__ = '0.1.0'
