"""Whisper special-token prompt assembly. ref: wenet/utils/common.py:159-239."""

from typing import Dict, List

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
    """[sot, lang_id, task_id, (no_timestamps)] prompt prefix."""
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
            raise NotImplementedError('timestamp decoding')
    else:
        prefix.append(special_tokens['no_speech'])
    return prefix
