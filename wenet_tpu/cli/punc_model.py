"""Punctuation restoration model loader.

ref: wenet/cli/punc_model.py — a torchscript punctuation model
(final.zip + units.txt + jieba user dict) applied after transcription.
torch (cpu) is in the image so the scripted model runs as-is; jieba is
an optional dep gated with a clear error.
"""

import os
from typing import Callable, List


def load_punc_model(model_dir: str) -> Callable[[str], str]:
    try:
        import jieba
    except ImportError as e:
        raise ImportError(
            'punctuation restoration needs jieba (pip install jieba) '
            'plus a punc model dir (final.zip + units.txt), as in the '
            'reference cli/punc_model.py') from e
    import logging
    import torch
    from wenet_tpu.text.char_tokenizer import CharTokenizer
    logging.getLogger('jieba').disabled = True
    model = torch.jit.load(os.path.join(model_dir, 'final.zip'))
    tokenizer = CharTokenizer(os.path.join(model_dir, 'units.txt'))
    usr_dict = os.path.join(model_dir, 'jieba_usr_dict')
    if os.path.exists(usr_dict):
        jieba.load_userdict(usr_dict)
    punc_table = ['<unk>', '', '，', '。', '？', '、']

    def apply(text: str) -> str:
        words: List[str] = list(jieba.cut(text))
        ids = tokenizer.tokens2ids(words)
        x = torch.tensor([ids], dtype=torch.int64)
        log_probs = model(x)
        if isinstance(log_probs, tuple):
            log_probs = log_probs[0]
        preds = log_probs.argmax(-1)[0].tolist()
        out = []
        for w, p in zip(words, preds):
            out.append(w)
            if 0 <= p < len(punc_table):
                out.append(punc_table[p])
        return ''.join(out)

    return apply
