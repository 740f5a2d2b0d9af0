"""Whisper special-token prompt assembly. ref: wenet/utils/common.py:159-239."""

from typing import Dict, List, Optional

# language order must match whisper.tokenizer.LANGUAGES key order
WHISPER_LANGS = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl",
    "ca", "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk",
    "el", "ms", "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr",
    "bg", "lt", "la", "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn",
    "sr", "az", "sl", "kn", "et", "mk", "br", "eu", "is", "hy", "ne",
    "mn", "bs", "kk", "sq", "sw", "gl", "mr", "pa", "si", "km", "sn",
    "yo", "so", "af", "oc", "ka", "be", "tg", "sd", "gu", "am", "yi",
    "lo", "uz", "fo", "ht", "ps", "tk", "nn", "mt", "sa", "lb", "my",
    "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha", "ba", "jw", "su",
    "yue",
)


def build_whisper_prefix(special_tokens: Dict[str, int], task: str,
                         lang: str, no_timestamp: bool = True) -> List[int]:
    """[sot, lang_id, task_id, (no_timestamps | <|0.00|>)] prompt prefix.

    With ``no_timestamp=False`` the prefix ends with the
    ``timestamp_begin`` anchor token (<|0.00|>) and the beam search
    applies the whisper timestamp grammar to every generated step
    (search.py ``_apply_timestamp_rules``).  The reference declares
    this prefix shape but leaves the decode unimplemented
    (ref wenet/utils/common.py:211-217 raises NotImplementedError);
    here the full timestamp decode is supported.
    """
    if task == 'transcribe':
        task_id = special_tokens['transcribe']
    elif task == 'translate':
        task_id = special_tokens['translate']
    elif task == 'vad':
        task_id = special_tokens['no_speech']
    else:
        raise NotImplementedError(f'unsupported task {task}')
    language_id = special_tokens['sot'] + 1 + WHISPER_LANGS.index(lang)
    prefix = [special_tokens['sot'], language_id, task_id]
    if task in ('transcribe', 'translate'):
        if no_timestamp:
            prefix.append(special_tokens['no_timestamps'])
        else:
            prefix.append(special_tokens['timestamp_begin'])
    else:
        prefix.append(special_tokens['no_speech'])
    return prefix


def whisper_tokens_to_segments(tokens: List[int], timestamp_begin: int,
                               precision: float = 0.02):
    """Split a timestamp-decoded token stream into timed segments.

    ``tokens`` is the prompt-stripped hypothesis of an anchored decode
    (the prompt ended with <|0.00|>, which OPENS the first segment), so
    the grammar guarantees the stream looks like
    ``text+ t_close (t_open text+ t_close)*`` — each ``t_*`` a token
    >= timestamp_begin encoding ``(tok - timestamp_begin) * precision``
    seconds, and consecutive timestamp pairs are (close, open).
    Returns ``(text_tokens, segments)`` where ``text_tokens`` is the
    stream with timestamps stripped and ``segments`` is a list of
    ``(start_sec, end_sec, [token ids])`` (``end_sec`` is None for a
    segment the decode ended inside).
    """
    segments = []
    text: List[int] = []
    cur: List[int] = []
    cur_start: Optional[float] = 0.0  # the prompt's <|0.00|> anchor
    for t in tokens:
        t = int(t)
        if t >= timestamp_begin:
            sec = round((t - timestamp_begin) * precision, 4)
            if cur_start is None:  # opening timestamp
                cur_start = sec
            else:  # closing timestamp
                segments.append((cur_start, sec, cur))
                cur, cur_start = [], None
        else:
            cur.append(t)
            text.append(t)
    if cur and cur_start is not None:
        segments.append((cur_start, None, cur))
    return text, segments
