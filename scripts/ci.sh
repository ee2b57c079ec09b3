#!/usr/bin/env bash
# Local CI gate — one command reproducing the full quality bar, mirroring
# the reference's CI pipeline (/root/reference/.github/workflows/ci.yml:
# fmt/clippy → test → coverage) with this repo's equivalents:
#
#   1. formatting gate (`scripts/fmtcheck.py` — the `cargo fmt --check`
#      analog; sbt-scalafmt cannot resolve in the zero-egress sandbox, so
#      the mechanical invariants are checked directly)
#   2. compile warnings-clean (`sbt compile` — scalac lint flags in build.sbt
#      are the clippy analog available offline; no new deps)
#      + full ScalaTest suite (`sbt test`)
#   3. correctness gate: graft.Verify at sf0.001 + the DuckDB oracle compare
#      (scripts/check_oracle.py — the driver-side replica of the round gate)
#
# Usage: scripts/ci.sh [sfDir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.001}"

echo "[ci] 1/4 formatting gate"
python3 scripts/fmtcheck.py

echo "[ci] 2/4 compile + test"
sbt -batch compile test

echo "[ci] 3/4 verify dump at $SF"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OUT="$(mktemp -d /tmp/graft-ci.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT
java -Xmx8g -cp "$CP" --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  graft.Verify "$SF" "$OUT"

echo "[ci] 4/4 DuckDB oracle compare"
python3 scripts/check_oracle.py "$SF" "$OUT"

echo "[ci] all gates green"
