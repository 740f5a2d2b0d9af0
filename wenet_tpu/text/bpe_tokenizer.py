"""Char+BPE hybrid tokenizer (CJK chars + sentencepiece for latin).

ref: wenet/text/bpe_tokenizer.py:7-60.  sentencepiece is an optional
dependency (not in the base image); the tokenizer raises a clear error
at first use when absent."""

from os import PathLike
from typing import Dict, List, Optional, Union

from wenet_tpu.text.char_tokenizer import CharTokenizer
from wenet_tpu.text.tokenize_utils import tokenize_by_bpe_model


class BpeTokenizer(CharTokenizer):

    def __init__(self,
                 bpe_model: Union[str, PathLike],
                 symbol_table: Union[str, PathLike, Dict],
                 non_lang_syms: Optional[Union[str, PathLike,
                                               List]] = None,
                 split_with_space: bool = False,
                 connect_symbol: str = '',
                 unk: str = '<unk>') -> None:
        super().__init__(symbol_table, non_lang_syms, split_with_space,
                         connect_symbol, unk)
        self._model_path = str(bpe_model)
        self.bpe_model = None  # lazy + picklable for worker processes

    def _build_sp(self):
        if self.bpe_model is None:
            try:
                import sentencepiece as spm
            except ImportError as e:
                raise ImportError(
                    'BpeTokenizer requires sentencepiece; install it or '
                    'use the char/whisper/huggingface tokenizers'
                ) from e
            self.bpe_model = spm.SentencePieceProcessor()
            self.bpe_model.load(self._model_path)

    def __getstate__(self):
        state = self.__dict__.copy()
        state['bpe_model'] = None
        return state

    def text2tokens(self, line: str) -> List[str]:
        self._build_sp()
        line = line.strip()
        if self.non_lang_syms_pattern is not None:
            parts = self.non_lang_syms_pattern.split(line.upper())
            parts = [w.strip() for w in parts if len(w.strip()) > 0]
        else:
            parts = [line]
        tokens = []
        for part in parts:
            if part in self.non_lang_syms:
                tokens.append(part)
            else:
                tokens.extend(tokenize_by_bpe_model(self.bpe_model, part))
        return tokens

    def tokens2text(self, tokens: List[str]) -> str:
        return ''.join(tokens).replace('▁', ' ').strip()
