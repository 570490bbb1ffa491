#!/bin/bash
# Probe the TPU tunnel until it answers (it wedges for ~5 min after a client
# is killed mid-RPC), then exec the given command.
set -u
for i in $(seq 1 12); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((8,8)) @ jnp.ones((8,8)))" >/dev/null 2>&1; then
        exec "$@"
    fi
    echo "tpu probe $i failed; sleeping 60s" >&2
    sleep 60
done
echo "TPU tunnel did not recover" >&2
exit 1
