#!/bin/bash
# Watchdog for long TPU runs over a flaky remote link: start the command,
# restart it with resume semantics whenever it stops making progress for
# STALL_S seconds (a wedged RPC never returns and burns the whole budget
# otherwise). The wrapped command must be idempotent/resumable — both
# quality gates take a 'continue' token for exactly this reason.
#
# Progress = ANY of:
#   * the log grew (trainers print per epoch),
#   * a file under WATCHDIR changed (checkpoint saves land mid-epoch,
#     long before the epoch print),
#   * the process burned >5s of CPU in the window (client-side XLA
#     compiles run for many minutes with no output at all).
# A truly wedged tunnel RPC shows none of these: no output, no files,
# ~zero CPU — which is exactly the state we want to kill and resume.
#
# Usage: gate_watchdog.sh LOGFILE WATCHDIR STALL_S MAX_RESTARTS -- cmd args...
set -u
LOG=$1; WATCHDIR=$2; STALL=$3; MAX=$4; shift 5   # consumes the trailing '--'

cpu_ticks() {  # utime+stime of the process tree root (compile runs in-process)
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0
}
newest_mtime() {
  find "$WATCHDIR" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1
}

tries=0
while true; do
  stdbuf -oL -eL "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "[watchdog] started pid=$PID try=$tries cmd: $*" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sz1=$(stat -c %s "$LOG"); mt1=$(newest_mtime); cpu1=$(cpu_ticks "$PID")
    slept=0
    while [ "$slept" -lt "$STALL" ]; do
      sleep 30; slept=$((slept+30))
      kill -0 "$PID" 2>/dev/null || break
      [ "$(stat -c %s "$LOG")" != "$sz1" ] && break
      [ "$(newest_mtime)" != "$mt1" ] && break
    done
    kill -0 "$PID" 2>/dev/null || break
    cpu2=$(cpu_ticks "$PID")
    if [ "$slept" -ge "$STALL" ] && [ "$(stat -c %s "$LOG")" == "$sz1" ] \
       && [ "$(newest_mtime)" == "$mt1" ] && [ $((cpu2 - cpu1)) -lt 500 ]; then
      echo "[watchdog] stalled ${STALL}s (log static, no files, cpu +$((cpu2 - cpu1)) ticks): killing $PID" >> "$LOG"
      kill "$PID"; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"; rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[watchdog] command finished rc=0" >> "$LOG"; exit 0
  fi
  tries=$((tries+1))
  if [ "$tries" -gt "$MAX" ]; then
    echo "[watchdog] giving up after $tries tries (rc=$rc)" >> "$LOG"; exit "$rc"
  fi
  echo "[watchdog] restart #$tries (rc=$rc)" >> "$LOG"
  sleep 10
done
