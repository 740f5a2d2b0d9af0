#!/usr/bin/env bash
# ref: tools/sph2wav.sh <sph.scp> <segments> <out.scp>
# Native python SPHERE decode (tools/sph2wav.py); sph2pipe only needed
# for shorten-compressed inputs.
nj=1
. "$(dirname "$0")/parse_options.sh" || exit 1
[ $# -lt 3 ] && echo "usage: $0 <sph.scp> <segments> <out.scp>" >&2 && exit 1
inscp=$1; segments=$2; outscp=$3
data=$(dirname "$inscp")
exec python3 "$(dirname "$0")/sph2wav.py" --scp "$inscp" \
    --segments "$segments" --wav_dir "$data/wavs" --outscp "$outscp"
