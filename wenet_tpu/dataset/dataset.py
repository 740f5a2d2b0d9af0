"""Declarative dataset builder from YAML dataset_conf.

ref: wenet/dataset/dataset.py:26-155.  Same conf schema; adds
`pad_conf` (pad_to_multiple / label_pad_to_multiple) so padded batch
shapes land in a bounded bucket set for XLA.
"""

import sys
from functools import partial
from typing import Optional

from wenet_tpu.dataset import processor
from wenet_tpu.dataset.datapipes import (DataPipe, parse_json_line,
                                         tar_source, text_line_source)
from wenet_tpu.text.base_tokenizer import BaseTokenizer
from wenet_tpu.utils.file_utils import read_symbol_table


def Dataset(data_type: str,
            data_list_file,
            tokenizer: Optional[BaseTokenizer] = None,
            conf: Optional[dict] = None,
            partition: bool = True,
            num_shards: int = 1,
            shard_id: int = 0) -> DataPipe:
    """Two-stage-shuffled pipeline yielding padded numpy batch dicts.

    num_shards/shard_id: (host x worker) partition of the *source lists*
    (CV uses partition=False to replicate, ref datapipes.py:293-303)."""
    assert conf is not None
    assert data_type in ['raw', 'shard']
    cycle = conf.get('cycle', 1)
    list_shuffle = conf.get('list_shuffle', True)
    list_shuffle_size = conf.get('list_shuffle_conf',
                                 {}).get('shuffle_size', sys.maxsize)

    files = (data_list_file if isinstance(data_list_file, list) else
             [data_list_file])
    dataset = text_line_source(files)
    if list_shuffle:
        # deterministic seed: this shuffle runs BEFORE the host shard
        # split, so every host must produce the same permutation or
        # shards overlap/miss data (the reference seeds every rank's
        # DataLoader generator identically, train_utils.py:367-368);
        # per-epoch ordering variation comes from the post-shard
        # sample shuffle below. No silent size cap — the reference
        # default is a full-list shuffle (ref dataset.py:48-52).
        dataset = dataset.shuffle(list_shuffle_size,
                                  seed=conf.get('seed', 777))
    dataset = dataset.repeat(cycle)
    dataset = dataset.shard(num_shards, shard_id, partition)
    if data_type == 'raw':
        dataset = dataset.map(parse_json_line)
    else:
        dataset = tar_source(dataset)
    dataset = dataset.map_ignore_error(processor.decode_wav)

    dataset = dataset.map(
        partial(processor.single_channel,
                **conf.get('singal_channel_conf', {})))

    speaker_conf = conf.get('speaker_conf', None)
    if speaker_conf is not None:
        table = read_symbol_table(speaker_conf['speaker_table_path'])

        def parse_speaker(sample):
            # unknown speakers -> 0 (ref processor.py:98); -1 would
            # gather the LAST embedding row
            sample['speaker'] = table.get(sample.get('speaker'), 0)
            return sample

        dataset = dataset.map(parse_speaker)

    if tokenizer is not None:
        dataset = dataset.map(
            partial(processor.tokenize, tokenizer=tokenizer))

    dataset = dataset.filter(
        partial(processor.filter, **conf.get('filter_conf', {})))
    dataset = dataset.map(
        partial(processor.resample, **conf.get('resample_conf', {})))
    if conf.get('speed_perturb', False):
        dataset = dataset.map(processor.speed_perturb)

    on_device_frontend = conf.get('on_device_frontend', False)
    feats_type = conf.get('feats_type', 'fbank')
    assert feats_type in ['fbank', 'mfcc', 'log_mel_spectrogram']
    if on_device_frontend:
        # featurization + SpecAug happen inside the jitted train step
        dataset = dataset.map(processor.raw_wav_feats)
    elif feats_type == 'fbank':
        dataset = dataset.map(
            partial(processor.compute_fbank,
                    **conf.get('fbank_conf', {})))
    elif feats_type == 'mfcc':
        dataset = dataset.map(
            partial(processor.compute_mfcc, **conf.get('mfcc_conf', {})))
    else:
        dataset = dataset.map(
            partial(processor.compute_log_mel_spectrogram,
                    **conf.get('log_mel_spectrogram_conf', {})))

    if conf.get('spec_aug', True) and not on_device_frontend:
        dataset = dataset.map(
            partial(processor.spec_aug, **conf.get('spec_aug_conf', {})))
    if conf.get('spec_sub', False) and not on_device_frontend:
        dataset = dataset.map(
            partial(processor.spec_sub, **conf.get('spec_sub_conf', {})))
    if conf.get('spec_trim', False) and not on_device_frontend:
        dataset = dataset.map(
            partial(processor.spec_trim,
                    **conf.get('spec_trim_conf', {})))

    dataset = dataset.map(
        partial(processor.detect_language,
                **conf.get('language_conf',
                           {'limited_langs': ['zh', 'en']})))
    dataset = dataset.map(processor.detect_task)

    if conf.get('shuffle', True):
        dataset = dataset.shuffle(
            conf.get('shuffle_conf', {}).get('shuffle_size', 1500))
    if conf.get('sort', True):
        dataset = dataset.sort(
            conf.get('sort_conf', {}).get('sort_size', 500),
            key_func=processor.sort_by_feats)

    pad_conf = conf.get('pad_conf', {})
    pad = partial(processor.padding,
                  pad_to_multiple=pad_conf.get('pad_to_multiple', 1),
                  label_pad_to_multiple=pad_conf.get(
                      'label_pad_to_multiple', 1))

    batch_conf = conf.get('batch_conf', {})
    batch_type = batch_conf.get('batch_type', 'static')
    assert batch_type in ['static', 'bucket', 'dynamic']
    if batch_type == 'static':
        dataset = dataset.batch(batch_conf.get('batch_size', 16),
                                wrapper=pad)
    elif batch_type == 'bucket':
        dataset = dataset.bucket_by_sequence_length(
            processor.feats_length_fn,
            batch_conf['bucket_boundaries'],
            batch_conf['bucket_batch_sizes']).map(pad)
    else:
        dataset = dataset.dynamic_batch(
            processor.DynamicBatchWindow(
                batch_conf.get('max_frames_in_batch', 12000)),
            wrapper=pad)

    prefetch = conf.get('prefetch', 2)
    if prefetch:
        dataset = dataset.prefetch(prefetch)
    return dataset
