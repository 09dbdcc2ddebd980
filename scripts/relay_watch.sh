#!/bin/bash
# Poll the axon relay until a REAL device execution succeeds, then exit 0.
# Device init alone is not enough: a wedged relay worker still answers
# jax.devices() while hanging every dispatch (observed round 4), so the
# probe runs a tiny matmul end to end. The op is milliseconds on a healthy
# relay; a 120 s timeout kill on a hung dispatch cannot make a wedged worker
# more wedged (and a healthy one never sees it).
while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(jnp.sum(x @ x)) == 128.0 * 128 * 128
print('UP', jax.devices())" >> /tmp/relay_watch.log 2>&1; then
    echo "relay up at $(date)" >> /tmp/relay_watch.log
    exit 0
  fi
  echo "down at $(date)" >> /tmp/relay_watch.log
  sleep 120
done
