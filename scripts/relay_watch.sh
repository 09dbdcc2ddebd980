#!/bin/bash
# Poll the axon relay until jax device init succeeds, then exit 0.
# Safe to kill: probes only do jax.devices() (no compile), so a timeout
# kill cannot wedge the remote worker mid-compile.
while true; do
  if timeout 90 python -c "import jax; d=jax.devices(); print('UP', d)" \
      >> /tmp/relay_watch.log 2>&1; then
    echo "relay up at $(date)" >> /tmp/relay_watch.log
    exit 0
  fi
  echo "down at $(date)" >> /tmp/relay_watch.log
  sleep 120
done
