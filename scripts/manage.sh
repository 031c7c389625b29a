#!/usr/bin/env bash
# Service manager (reference: scripts/manage.sh / manage.sh.vocalis):
# start/stop/restart/status/logs for the API and UI servers, venv
# bootstrap, dev install, test runner.
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
PID_DIR="${REPO_ROOT}/.run"
LOG_DIR="${REPO_ROOT}/logs"
PYTHON="${PYTHON:-python}"
API_PORT="${API_PORT:-8000}"
UI_PORT="${UI_PORT:-7860}"

mkdir -p "$PID_DIR" "$LOG_DIR"

start_service() { # name, args...
  local name="$1"; shift
  local pidfile="$PID_DIR/$name.pid"
  if [[ -f "$pidfile" ]] && kill -0 "$(cat "$pidfile")" 2>/dev/null; then
    echo "$name already running (pid $(cat "$pidfile"))"; return
  fi
  (cd "$REPO_ROOT" && nohup "$PYTHON" -m turbo_whisper_workspace_tpu "$@" \
      >"$LOG_DIR/$name.log" 2>&1 & echo $! >"$pidfile")
  echo "$name started (pid $(cat "$pidfile"), log $LOG_DIR/$name.log)"
}

stop_service() { # name
  local pidfile="$PID_DIR/$1.pid"
  if [[ -f "$pidfile" ]]; then
    # kill the exact recorded pid only — never by pattern
    kill "$(cat "$pidfile")" 2>/dev/null && echo "$1 stopped" || true
    rm -f "$pidfile"
  else
    echo "$1 not running"
  fi
}

status_service() { # name
  local pidfile="$PID_DIR/$1.pid"
  if [[ -f "$pidfile" ]] && kill -0 "$(cat "$pidfile")" 2>/dev/null; then
    echo "$1: running (pid $(cat "$pidfile"))"
  else
    echo "$1: stopped"
  fi
}

case "${1:-help}" in
  start)       start_service api api --port "$API_PORT"
               start_service ui ui --port "$UI_PORT" ;;
  start-api)   start_service api api --port "$API_PORT" ;;
  start-ui)    start_service ui ui --port "$UI_PORT" ;;
  stop)        stop_service api; stop_service ui ;;
  restart)     "$0" stop; sleep 1; "$0" start ;;
  status)      status_service api; status_service ui ;;
  logs)        tail -n 50 -f "$LOG_DIR"/*.log ;;
  test)        (cd "$REPO_ROOT" && "$PYTHON" -m pytest tests/ -q) ;;
  bench)       (cd "$REPO_ROOT" && "$PYTHON" bench.py) ;;
  check)       # mechanical pre-commit gate for perf changes (VERDICT r3
               # #9): full suite + a CPU smoke of every bench path, so a
               # broken decode program can never ship unnoticed again.
               (cd "$REPO_ROOT" && "$PYTHON" scripts/check_status_claims.py) || exit 1
               (cd "$REPO_ROOT" && "$PYTHON" -m pytest tests/ -q) || exit 1
               (cd "$REPO_ROOT" && BENCH_MODEL=tiny BENCH_BATCH=2 \
                  BENCH_DECODE_LEN=8 BENCH_ITERS=1 \
                  BENCH_LLM_MODEL=test-tiny BENCH_LLM_LEN=4 \
                  BENCH_E2E_FILES=2 BENCH_E2E_FILE_S=30 \
                  "$PYTHON" -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import bench
bench.main()
") || exit 1
               echo 'check: suite green, all bench paths run end-to-end' ;;
  install-dev) "$PYTHON" -m pip install -e "$REPO_ROOT[dev]" ;;
  *) echo "usage: $0 {start|start-api|start-ui|stop|restart|status|logs|test|bench|check|install-dev}" ;;
esac
