#!/usr/bin/env bash
# Security-monitor launcher (reference: scripts/run_security_monitor.sh):
# scans an audio file or directory for security incidents and writes
# reports to security_incidents/. With no argument, scans examples/.
set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(dirname "$SCRIPT_DIR")"
PYTHON="${PYTHON:-python}"
OUT_DIR="${SECURITY_DIR:-$REPO_ROOT/security_incidents}"
mkdir -p "$OUT_DIR"

INPUT="${1:-$REPO_ROOT/examples}"
if [[ ! -e "$INPUT" ]]; then
  echo "input not found: $INPUT" >&2
  exit 1
fi

echo "security monitor: scanning $INPUT -> $OUT_DIR"
exec "$PYTHON" -m turbo_whisper_workspace_tpu security \
  --input "$INPUT" --output "$OUT_DIR" "${@:2}"
