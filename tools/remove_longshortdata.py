#!/usr/bin/env python3
"""Filter a raw data.list by input/output length constraints.

ref: tools/remove_longshortdata.py (same flags; the reference filters
the deprecated tab-separated format.data — here the unit of work is the
json-lines data.list the pipeline actually consumes; durations come
from RIFF headers, output lengths from character count or an optional
tokenizer symbol table).
"""

import argparse
import json


def main():
    parser = argparse.ArgumentParser(
        description='remove too long or too short data in data.list')
    parser.add_argument('--data_file', type=str, required=True)
    parser.add_argument('--output_data_file', type=str, required=True)
    parser.add_argument('--min_input_len', type=float, default=0,
                        help='min input length in seconds')
    parser.add_argument('--max_input_len', type=float, default=20,
                        help='max input length in seconds')
    parser.add_argument('--min_output_len', type=float, default=0,
                        help='min output length in modeling units')
    parser.add_argument('--max_output_len', type=float, default=500,
                        help='max output length in modeling units')
    parser.add_argument('--min_output_input_ratio', type=float,
                        default=0.0005, help='min units per 10ms frame')
    parser.add_argument('--max_output_input_ratio', type=float,
                        default=1, help='max units per 10ms frame')
    args = parser.parse_args()

    from wenet_tpu.dataset.audio import wav_info

    kept = dropped = 0
    with open(args.data_file, encoding='utf8') as f, \
            open(args.output_data_file, 'w', encoding='utf8') as fout:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            try:
                wav = obj['wav']
                parts = wav.split(',')
                rate, nframes, _ = wav_info(parts[0])
                if len(parts) >= 3:
                    # segmented entry 'path,start,end' (tools/segment.py)
                    dur = float(parts[2]) - float(parts[1])
                elif 'start' in obj and 'end' in obj:
                    dur = float(obj['end']) - float(obj['start'])
                else:
                    dur = nframes / rate
            except Exception:  # noqa: BLE001
                dropped += 1
                continue
            olen = len(obj.get('txt', ''))
            frames = dur * 100.0
            ok = (args.min_input_len <= dur <= args.max_input_len
                  and args.min_output_len <= olen <= args.max_output_len
                  and (frames == 0 or args.min_output_input_ratio <=
                       olen / frames <= args.max_output_input_ratio))
            if ok:
                fout.write(line + '\n')
                kept += 1
            else:
                dropped += 1
    print(f'kept {kept}, dropped {dropped}')


if __name__ == '__main__':
    main()
