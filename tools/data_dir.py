#!/usr/bin/env python3
"""Kaldi-style data-directory utilities (pure python).

ref: tools/{combine_data.sh, copy_data_dir.sh, fix_data_dir.sh,
subset_data_dir.sh, reduce_data_dir.sh, validate_data_dir.sh,
filter_scp.pl, subset_scp.pl, sym2int.pl, spk2utt_to_utt2spk.pl,
utt2spk_to_spk2utt.pl} — the kaldi shell/perl helpers the recipes'
data-prep stages use. One python module with subcommands replaces the
zoo; thin .sh shims with the reference names forward here.

A "data dir" is a directory of first-field-keyed text tables:
wav.scp, text, utt2spk, segments, utt2dur, ... plus spk2utt.
"""

import argparse
import os
import random
import sys

UTT_TABLES = ('wav.scp', 'text', 'utt2spk', 'segments', 'utt2dur',
              'feats.scp', 'utt2lang')
ALL_TABLES = UTT_TABLES + ('spk2utt',)


def _read_table(path):
    rows = []
    with open(path, encoding='utf8') as f:
        for line in f:
            line = line.rstrip('\n')
            if not line.strip():
                continue
            arr = line.split(maxsplit=1)
            rows.append((arr[0], arr[1] if len(arr) > 1 else ''))
    return rows


def _write_table(path, rows):
    with open(path, 'w', encoding='utf8') as f:
        for key, rest in rows:
            f.write(f'{key} {rest}\n' if rest else f'{key}\n')


def _tables(d, names=UTT_TABLES):
    return [n for n in names if os.path.exists(os.path.join(d, n))]


def _utt_tables(d):
    """Tables keyed by utterance id.  In a segments-based dir (kaldi
    convention) wav.scp is keyed by RECORDING id — segment lines are
    `utt-id recording-id start end` — so it must not participate in
    utt-key intersection/validation."""
    tabs = _tables(d)
    if 'segments' in tabs and 'wav.scp' in tabs:
        tabs.remove('wav.scp')
    return tabs


def _utt2spk_to_spk2utt(rows):
    spk = {}
    for utt, s in rows:
        spk.setdefault(s, []).append(utt)
    return [(s, ' '.join(us)) for s, us in sorted(spk.items())]


def _spk2utt_to_utt2spk(rows):
    out = []
    for s, us in rows:
        out.extend((u, s) for u in us.split())
    return sorted(out)


def cmd_validate(args):
    d = args.dir
    errs = []
    tabs = _tables(d)
    if 'wav.scp' not in tabs and 'feats.scp' not in tabs:
        errs.append('no wav.scp or feats.scp')
    utt_tabs = set(_utt_tables(d))
    keysets = {}
    for name in tabs:
        rows = _read_table(os.path.join(d, name))
        keys = [k for k, _ in rows]
        if keys != sorted(keys):
            errs.append(f'{name} is not sorted')
        if len(keys) != len(set(keys)):
            errs.append(f'{name} has duplicate keys')
        if name in utt_tabs:
            keysets[name] = set(keys)
    if len(keysets) > 1:
        base_name = ('wav.scp' if 'wav.scp' in keysets
                     else sorted(keysets)[0])
        base = keysets[base_name]
        for name, ks in keysets.items():
            if ks != base:
                errs.append(f'{name} keys differ from {base_name} '
                            f'({len(ks ^ base)} mismatched)')
    # segments must reference existing recordings
    if 'segments' in tabs and 'wav.scp' in tabs:
        recs = {k for k, _ in
                _read_table(os.path.join(d, 'wav.scp'))}
        for utt, rest in _read_table(os.path.join(d, 'segments')):
            rec = rest.split()[0] if rest.split() else ''
            if rec not in recs:
                errs.append(f'segments: {utt} references unknown '
                            f'recording {rec}')
                break
    u2s = os.path.join(d, 'utt2spk')
    s2u = os.path.join(d, 'spk2utt')
    if os.path.exists(u2s) and os.path.exists(s2u):
        if _utt2spk_to_spk2utt(_read_table(u2s)) != \
                sorted(_read_table(s2u)):
            errs.append('spk2utt does not match utt2spk')
    if errs:
        print('\n'.join(f'validate_data_dir: {e}' for e in errs),
              file=sys.stderr)
        if not args.no_strict:
            sys.exit(1)
    else:
        print(f'{d} ok')


def cmd_fix(args):
    d = args.dir
    utt_tabs = _utt_tables(d)
    tables = {n: dict(_read_table(os.path.join(d, n)))
              for n in utt_tabs}
    if not tables:
        return
    common = None
    for rows in tables.values():
        ks = set(rows)
        common = ks if common is None else common & ks
    for name, rows in tables.items():
        _write_table(os.path.join(d, name),
                     [(k, rows[k]) for k in sorted(common)])
    if 'utt2spk' in tables:
        _write_table(os.path.join(d, 'spk2utt'), _utt2spk_to_spk2utt(
            [(k, tables['utt2spk'][k]) for k in sorted(common)]))
    # segments dir: restrict wav.scp to recordings still referenced
    if 'segments' in tables and os.path.exists(
            os.path.join(d, 'wav.scp')):
        recs = {tables['segments'][k].split()[0] for k in common
                if tables['segments'][k].split()}
        wav = _read_table(os.path.join(d, 'wav.scp'))
        _write_table(os.path.join(d, 'wav.scp'),
                     [(k, v) for k, v in wav if k in recs])
    print(f'fixed {d}: {len(common)} utts')


def cmd_copy(args):
    os.makedirs(args.dst, exist_ok=True)
    for name in ALL_TABLES:
        src = os.path.join(args.src, name)
        if os.path.exists(src):
            _write_table(os.path.join(args.dst, name), _read_table(src))


def cmd_combine(args):
    os.makedirs(args.dst, exist_ok=True)
    for name in UTT_TABLES:
        rows = []
        for src in args.srcs:
            p = os.path.join(src, name)
            if os.path.exists(p):
                rows.extend(_read_table(p))
        if rows:
            _write_table(os.path.join(args.dst, name), sorted(rows))
    u2s = os.path.join(args.dst, 'utt2spk')
    if os.path.exists(u2s):
        _write_table(os.path.join(args.dst, 'spk2utt'),
                     _utt2spk_to_spk2utt(_read_table(u2s)))


def cmd_subset(args):
    utt_tabs = _utt_tables(args.src)
    tabs = _tables(args.src)
    base = _read_table(os.path.join(args.src, utt_tabs[0]))
    keys = [k for k, _ in base]
    if args.utt_list:
        want = {k for k, _ in _read_table(args.utt_list)}
        keep = [k for k in keys if k in want]
    elif args.first:
        keep = keys[:args.n]
    elif args.last:
        keep = keys[-args.n:]
    else:
        rng = random.Random(args.seed)
        keep = sorted(rng.sample(keys, min(args.n, len(keys))))
    keep_set = set(keep)
    os.makedirs(args.dst, exist_ok=True)
    seg_dir = 'segments' in tabs and 'wav.scp' in tabs
    rec_keep = None
    if seg_dir:
        segs = _read_table(os.path.join(args.src, 'segments'))
        rec_keep = {v.split()[0] for k, v in segs
                    if k in keep_set and v.split()}
    for name in tabs:
        rows = _read_table(os.path.join(args.src, name))
        want = rec_keep if (seg_dir and name == 'wav.scp') \
            else keep_set
        _write_table(os.path.join(args.dst, name),
                     [(k, v) for k, v in rows if k in want])
    u2s = os.path.join(args.dst, 'utt2spk')
    if os.path.exists(u2s):
        _write_table(os.path.join(args.dst, 'spk2utt'),
                     _utt2spk_to_spk2utt(_read_table(u2s)))
    print(f'subset {args.src} -> {args.dst}: {len(keep)} utts')


def cmd_filter_scp(args):
    want = {k for k, _ in _read_table(args.id_list)}
    fin = open(args.scp, encoding='utf8') if args.scp != '-' else sys.stdin
    field = args.field - 1
    for line in fin:
        arr = line.split()
        if len(arr) > field and ((arr[field] in want) != args.exclude):
            sys.stdout.write(line)


def cmd_sym2int(args):
    table = {}
    with open(args.symtab, encoding='utf8') as f:
        for line in f:
            arr = line.split()
            if len(arr) >= 2:
                table[arr[0]] = arr[1]
    oov = table.get(args.map_oov)
    fin = open(args.input, encoding='utf8') if args.input != '-' \
        else sys.stdin
    skip = args.field - 1
    for line in fin:
        arr = line.split()
        head, toks = arr[:skip], arr[skip:]
        mapped = []
        for t in toks:
            if t in table:
                mapped.append(table[t])
            elif oov is not None:
                mapped.append(oov)
            else:
                print(f'sym2int: OOV symbol {t}', file=sys.stderr)
                sys.exit(1)
        print(' '.join(head + mapped))


def cmd_spk2utt_to_utt2spk(args):
    for utt, spk in _spk2utt_to_utt2spk(_read_table(args.input)):
        print(f'{utt} {spk}')


def cmd_utt2spk_to_spk2utt(args):
    for spk, utts in _utt2spk_to_spk2utt(_read_table(args.input)):
        print(f'{spk} {utts}')


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    sub = p.add_subparsers(dest='cmd', required=True)

    sp = sub.add_parser('validate')
    sp.add_argument('dir')
    sp.add_argument('--no_strict', action='store_true')
    sp.set_defaults(fn=cmd_validate)

    sp = sub.add_parser('fix')
    sp.add_argument('dir')
    sp.set_defaults(fn=cmd_fix)

    sp = sub.add_parser('copy')
    sp.add_argument('src')
    sp.add_argument('dst')
    sp.set_defaults(fn=cmd_copy)

    sp = sub.add_parser('combine')
    sp.add_argument('dst')
    sp.add_argument('srcs', nargs='+')
    sp.set_defaults(fn=cmd_combine)

    sp = sub.add_parser('subset')
    sp.add_argument('src')
    sp.add_argument('dst')
    sp.add_argument('--n', type=int, default=1000)
    sp.add_argument('--first', action='store_true')
    sp.add_argument('--last', action='store_true')
    sp.add_argument('--utt_list', default=None)
    sp.add_argument('--seed', type=int, default=777)
    sp.set_defaults(fn=cmd_subset)

    sp = sub.add_parser('filter_scp')
    sp.add_argument('id_list')
    sp.add_argument('scp', nargs='?', default='-')
    sp.add_argument('--field', type=int, default=1)
    sp.add_argument('--exclude', action='store_true')
    sp.set_defaults(fn=cmd_filter_scp)

    sp = sub.add_parser('sym2int')
    sp.add_argument('symtab')
    sp.add_argument('input', nargs='?', default='-')
    sp.add_argument('--field', type=int, default=1,
                    help='1-based first field to map (earlier kept)')
    sp.add_argument('--map_oov', default=None)
    sp.set_defaults(fn=cmd_sym2int)

    sp = sub.add_parser('spk2utt_to_utt2spk')
    sp.add_argument('input')
    sp.set_defaults(fn=cmd_spk2utt_to_utt2spk)

    sp = sub.add_parser('utt2spk_to_spk2utt')
    sp.add_argument('input')
    sp.set_defaults(fn=cmd_utt2spk_to_spk2utt)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == '__main__':
    main()
