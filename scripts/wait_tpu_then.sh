#!/bin/bash
# Poll the (flaky) remote-TPU tunnel; when a real computation completes,
# exec the given command. Usage: wait_tpu_then.sh <poll_s> -- cmd args...
set -u
POLL=${1:-120}
shift
[ "${1:-}" = "--" ] && shift
while true; do
  if timeout 60 python -c "import jax, jax.numpy as jnp; assert float(jnp.ones((8,8)).sum())==64.0" >/dev/null 2>&1; then
    echo "[wait_tpu] backend answered at $(date -u +%H:%M:%S); launching: $*"
    exec "$@"
  fi
  echo "[wait_tpu] backend still unreachable at $(date -u +%H:%M:%S); retry in ${POLL}s"
  sleep "$POLL"
done
