"""Whisper tiktoken tokenizer.

ref: wenet/text/whisper_tokenizer.py:8-95 (delegates to the openai
whisper package).  Rebuilt directly on tiktoken: loads a local
*.tiktoken BPE rank file (bundled with whisper checkpoints; zero-egress
environments must provide the file path) and reconstructs whisper's
special-token layout."""

import base64
import os
from typing import Dict, List, Optional

from wenet_tpu.models.whisper.tokens import WHISPER_LANGS
from wenet_tpu.text.base_tokenizer import BaseTokenizer


def _special_tokens(n_vocab_base: int, num_languages: int,
                    multilingual: bool) -> Dict[str, int]:
    """Same layout as whisper.tokenizer.get_encoding's specials."""
    del multilingual  # whisper adds the full special set either way
    specials = [
        '<|endoftext|>',
        '<|startoftranscript|>',
        *[f'<|{lang}|>' for lang in WHISPER_LANGS[:num_languages]],
        '<|translate|>', '<|transcribe|>', '<|startoflm|>',
        '<|startofprev|>', '<|nospeech|>', '<|notimestamps|>',
        *[f'<|{i * 0.02:.2f}|>' for i in range(1501)],
    ]
    return {tok: n_vocab_base + i for i, tok in enumerate(specials)}


class WhisperTokenizer(BaseTokenizer):

    def __init__(self,
                 multilingual: bool = True,
                 num_languages: int = 100,
                 language: Optional[str] = None,
                 task: Optional[str] = None,
                 vocab_path: Optional[str] = None) -> None:
        self.multilingual = multilingual
        self.num_languages = num_languages
        self.language = language
        self.task = task
        if vocab_path is None:
            name = ('multilingual.tiktoken'
                    if multilingual else 'gpt2.tiktoken')
            for base in (os.environ.get('WENET_WHISPER_ASSETS', ''),
                         os.path.expanduser('~/.wenet/whisper_assets')):
                cand = os.path.join(base, name) if base else None
                if cand and os.path.exists(cand):
                    vocab_path = cand
                    break
        self._vocab_path = vocab_path
        self.tokenizer = None
        self._t2i: Dict[str, int] = {}

    def _build(self):
        if self.tokenizer is not None:
            return
        if self._vocab_path is None or not os.path.exists(
                self._vocab_path):
            raise FileNotFoundError(
                'whisper tiktoken vocab not found; set '
                'WENET_WHISPER_ASSETS or pass vocab_path '
                '(ship multilingual.tiktoken next to the checkpoint)')
        import tiktoken
        ranks = {}
        with open(self._vocab_path, 'rb') as f:
            for line in f:
                if not line.strip():
                    continue
                token, rank = line.split()
                ranks[base64.b64decode(token)] = int(rank)
        specials = _special_tokens(len(ranks), self.num_languages,
                                   self.multilingual)
        self.tokenizer = tiktoken.Encoding(
            name=os.path.basename(self._vocab_path),
            explicit_n_vocab=len(ranks) + len(specials),
            pat_str=(r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"""
                     r"""| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""),
            mergeable_ranks=ranks,
            special_tokens=specials,
        )
        self._t2i = dict(specials)

    def __getstate__(self):
        state = self.__dict__.copy()
        state['tokenizer'] = None
        state['_t2i'] = {}
        return state

    @property
    def special_tokens(self) -> Dict[str, int]:
        """sot/eot/task ids for prompt assembly (ref whisper.py:28-64)."""
        self._build()
        t = self._t2i
        return {
            'sot': t['<|startoftranscript|>'],
            'eot': t['<|endoftext|>'],
            'transcribe': t['<|transcribe|>'],
            'translate': t['<|translate|>'],
            'sot_prev': t['<|startofprev|>'],
            'no_speech': t['<|nospeech|>'],
            'no_timestamps': t['<|notimestamps|>'],
            'timestamp_begin': t['<|0.00|>'],
        }

    def text2tokens(self, line: str) -> List[int]:
        self._build()
        return self.tokenizer.encode(line,
                                     disallowed_special=())

    def tokens2text(self, tokens: List[int]) -> str:
        self._build()
        return self.tokenizer.decode(tokens)

    def tokens2ids(self, tokens: List[int]) -> List[int]:
        # whisper "tokens" are already ids
        return list(tokens)

    def ids2tokens(self, ids: List[int]) -> List[int]:
        return list(ids)

    def detokenize(self, ids: List[int]):
        self._build()
        n_base = self.tokenizer.n_vocab - len(self._t2i)
        content = [i for i in ids if i < n_base]
        text = self.tokenizer.decode(content)
        return text, content

    def vocab_size(self) -> int:
        self._build()
        return self.tokenizer.n_vocab

    @property
    def symbol_table(self) -> Dict[str, int]:
        self._build()
        return dict(self._t2i)
