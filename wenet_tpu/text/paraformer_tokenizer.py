"""Paraformer seg-dict tokenizer. ref: wenet/text/paraformer_tokenizer.py:19-77."""

from os import PathLike
from typing import Dict, List, Optional, Union

from wenet_tpu.text.char_tokenizer import CharTokenizer
from wenet_tpu.text.tokenize_utils import tokenize_by_seg_dict


def read_seg_dict(path):
    seg_table = {}
    with open(path, encoding='utf8') as fin:
        for line in fin:
            arr = line.strip().split('\t')
            assert len(arr) == 2
            seg_table[arr[0]] = arr[1]
    return seg_table


class ParaformerTokenizer(CharTokenizer):

    def __init__(self,
                 symbol_table: Union[str, PathLike, Dict],
                 seg_dict: Optional[Union[str, PathLike, Dict]] = None,
                 split_with_space: bool = False,
                 connect_symbol: str = '',
                 unk: str = '<unk>') -> None:
        super().__init__(symbol_table, None, split_with_space,
                         connect_symbol, unk)
        if seg_dict is not None and not isinstance(seg_dict, Dict):
            seg_dict = read_seg_dict(seg_dict)
        self.seg_dict = seg_dict

    def text2tokens(self, line: str) -> List[str]:
        assert self.seg_dict is not None
        return tokenize_by_seg_dict(self.seg_dict, line.strip())

    def tokens2text(self, tokens: List[str]) -> str:
        return super().tokens2text(tokens)
