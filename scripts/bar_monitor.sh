#!/usr/bin/env bash
# Bar security batch monitor (reference: scripts/bar_monitor.sh): run the
# bar-specific monitor over a directory of recordings and produce a
# combined text + HTML report from the incident artifacts.
set -euo pipefail

INPUT_DIR="${1:?usage: bar_monitor.sh <audio-dir> [output-dir]}"
OUTPUT_DIR="${2:-bar_analysis}"
PYTHON="${PYTHON:-python}"

"$PYTHON" -m turbo_whisper_workspace_tpu security --bar \
    -i "$INPUT_DIR" -o "$OUTPUT_DIR"

REPORT="$OUTPUT_DIR/report.html"
{
  echo "<html><body style='background:#121212;color:#ddd;font-family:sans-serif'>"
  echo "<h1>Bar security report — $(date)</h1>"
  shopt -s nullglob
  count=0
  for f in "$OUTPUT_DIR"/incident_*.txt; do
    count=$((count+1))
    echo "<pre style='background:#1e1e1e;padding:1em;border-radius:8px'>"
    sed 's/&/\&amp;/g; s/</\&lt;/g' "$f"
    echo "</pre>"
  done
  echo "<p>$count incident(s).</p></body></html>"
} > "$REPORT"
echo "report: $REPORT"
