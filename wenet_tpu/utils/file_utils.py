"""Symbol table / list file readers. ref: wenet/utils/file_utils.py."""

import re
from typing import Dict, List, Optional


def read_lists(list_file: str) -> List[str]:
    lists = []
    with open(list_file, encoding='utf8') as fin:
        for line in fin:
            lists.append(line.strip())
    return lists


def read_non_lang_symbols(non_lang_sym_path: Optional[str]):
    """ref: file_utils.py (validates {x}/<x>/[x] bracket formats)."""
    if non_lang_sym_path is None:
        return []
    syms = read_lists(non_lang_sym_path)
    non_lang_syms_pattern = re.compile(r"(\[[^\[\]]+\]|<[^<>]+>|{[^{}]+})")
    for sym in syms:
        if non_lang_syms_pattern.fullmatch(sym) is None:
            class BadSymbolFormat(Exception):
                pass
            raise BadSymbolFormat(
                "Non-linguistic symbols should be "
                "formatted in {xxx}/<xxx>/[xxx], consider"
                " modify '%s' to meet the requirment. "
                "More details can be found in discussions here : "
                "https://github.com/wenet-e2e/wenet/pull/819" % (sym))
    return syms


def read_symbol_table(symbol_table_file: str) -> Dict[str, int]:
    symbol_table = {}
    with open(symbol_table_file, encoding='utf8') as fin:
        for line in fin:
            arr = line.strip().split()
            assert len(arr) == 2
            symbol_table[arr[0]] = int(arr[1])
    return symbol_table
