#!/usr/bin/env bash
# Kaldi-style option parsing (from scratch): every "--opt_name value"
# pair on the command line overrides a shell variable "opt_name" that
# the calling script has already declared. "--opt-name" dashes map to
# underscores. Stops at the first non-option argument.
while true; do
  case "${1:-}" in
    --*)
      name=$(echo "$1" | sed -e 's/^--//' -e 's/-/_/g')
      if ! eval '[ -n "${'"$name"'+set}" ]'; then
        echo "$0: unknown option $1" >&2
        exit 1
      fi
      [ $# -ge 2 ] || { echo "$0: missing value for $1" >&2; exit 1; }
      eval "$name=\"\$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
true
