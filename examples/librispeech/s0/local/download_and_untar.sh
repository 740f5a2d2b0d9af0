#!/usr/bin/env bash
# Download + extract one LibriSpeech part from OpenSLR (resources/12).
# usage: download_and_untar.sh [--remove-archive] <data-base> <url-base> <part>
# parts: dev-clean dev-other test-clean test-other train-clean-100
#        train-clean-360 train-other-500
set -eo pipefail

remove_archive=false
if [ "$1" == --remove-archive ]; then
  remove_archive=true
  shift
fi
if [ $# -ne 3 ]; then
  echo "usage: $0 [--remove-archive] <data-base> <url-base> <part>" >&2
  echo "e.g.: $0 /export/data https://www.openslr.org/resources/12 dev-clean" >&2
  exit 1
fi
data=$1
url=$2
part=$3

case $part in
  dev-clean|dev-other|test-clean|test-other|train-clean-100|\
  train-clean-360|train-other-500) ;;
  *) echo "$0: unknown LibriSpeech part $part" >&2; exit 1 ;;
esac

[ -d "$data" ] || { echo "$0: no such directory $data" >&2; exit 1; }

if [ -f $data/LibriSpeech/$part/.complete ]; then
  echo "$0: $part already downloaded and extracted"
  exit 0
fi

archive=$data/$part.tar.gz
if [ ! -f $archive ]; then
  command -v wget >/dev/null || { echo "$0: wget not found" >&2; exit 1; }
  echo "$0: downloading $url/$part.tar.gz"
  wget --no-check-certificate -O $archive $url/$part.tar.gz
fi

echo "$0: extracting $archive"
tar -xzf $archive -C $data

touch $data/LibriSpeech/$part/.complete
$remove_archive && rm -f $archive
echo "$0: done with $part"
