#!/usr/bin/env bash
# Driver-parseable benchmark entry point.
#
# `sbt "runMain graft.Bench"` prefixes every stdout line with [info], which
# breaks JSON parsers that tail-scrape the output. graft.Bench therefore
# also writes the bare JSON line to /tmp/bench.json; this script runs the
# benchmark and then emits that file's contents as the FINAL line of
# stdout, unprefixed, so `tail -n 1` of this script's output is always the
# one-line JSON result.
#
# Usage: scripts/bench.sh [SF_DIR]   (default /root/testdata/sf0.1)
set -uo pipefail
cd "$(dirname "$0")/.."

export SPARK_GRAFT_SF_DIR="${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
rm -f /tmp/bench.json

# sbt noise goes to stderr so stdout stays parseable
sbt -batch "runMain graft.Bench" 1>&2
status=$?

if [[ -s /tmp/bench.json ]]; then
  # final stdout line = the bare JSON
  cat /tmp/bench.json
  exit 0
fi
echo '{"metric":"total","value":null,"unit":"sec","queries":{},"sf":"'"$SPARK_GRAFT_SF_DIR"'","error_count":1,"errors":{"bench":"no /tmp/bench.json produced (sbt exit '"$status"')"}}'
exit 1
