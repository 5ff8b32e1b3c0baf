#!/usr/bin/env bash
# Shell flag parser: rewrites `--name value` pairs into shell variables
# that were pre-declared with defaults. Own minimal implementation of
# the kaldi-style option parser the reference recipes rely on
# (reference tools/parse_options.sh behavior: --foo_bar 3 sets foo_bar=3,
# unknown options abort, `--help` prints usage).

while true; do
  case "${1:-}" in
    --help|-h)
      echo "usage: $0 [--option value]..." 1>&2
      exit 0
      ;;
    --*)
      name=$(echo "$1" | sed 's/^--//' | tr '-' '_')
      if [ -z "${2:-}" ]; then
        echo "parse_options.sh: missing value for $1" 1>&2
        exit 1
      fi
      if ! eval '[ -n "${'"$name"'+x}" ]'; then
        echo "parse_options.sh: unknown option $1" 1>&2
        exit 1
      fi
      eval "$name=\"\$2\""
      shift 2
      ;;
    *)
      break
      ;;
  esac
done
true
