#!/usr/bin/env bash
# Download + extract one OpenSLR part (data_aishell / resource_aishell).
# usage: download_and_untar.sh [--remove-archive] <data-base> <url-base> <part>
# Skips work when <data-base>/<part>/.complete exists (same contract as
# the ref local/download_and_untar.sh).
set -eo pipefail

remove_archive=false
if [ "$1" == --remove-archive ]; then
  remove_archive=true
  shift
fi
if [ $# -ne 3 ]; then
  echo "usage: $0 [--remove-archive] <data-base> <url-base> <part>" >&2
  echo "e.g.: $0 /export/a05/aishell https://www.openslr.org/resources/33 data_aishell" >&2
  exit 1
fi
data=$1
url=$2
part=$3

[ -d "$data" ] || { echo "$0: no such directory $data" >&2; exit 1; }

if [ -f $data/$part/.complete ]; then
  echo "$0: $part already downloaded and extracted"
  exit 0
fi

archive=$data/$part.tgz
if [ ! -f $archive ]; then
  command -v wget >/dev/null || { echo "$0: wget not found" >&2; exit 1; }
  echo "$0: downloading $url/$part.tgz (large; openslr mirrors are slow)"
  wget --no-check-certificate -O $archive $url/$part.tgz
fi

echo "$0: extracting $archive"
tar -xzf $archive -C $data

# aishell nests per-speaker tarballs inside data_aishell/wav
if [ -d $data/$part/wav ] && \
   ls $data/$part/wav/*.tar.gz >/dev/null 2>&1; then
  echo "$0: extracting inner speaker archives"
  for t in $data/$part/wav/*.tar.gz; do
    tar -xzf $t -C $data/$part/wav
    rm -f $t
  done
fi

touch $data/$part/.complete
$remove_archive && rm -f $archive
echo "$0: done with $part"
