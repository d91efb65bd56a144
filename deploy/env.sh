# Per-shell environment for the TPU runtime (the reference's domainID.sh
# equivalent, /root/reference/scripts/domainID.sh:1).  `source deploy/env.sh`.

# Persistent XLA compilation cache: first TPU compiles are 20-300 s; cached
# reloads are milliseconds.  bench.py and the tests set this themselves, but
# interactive shells want it too.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

# Bus namespace: isolates this deployment's topics from other processes
# sharing a bus bridge — the ROS_DOMAIN_ID=22 equivalent.
export OFC_BUS_NAMESPACE="${OFC_BUS_NAMESPACE:-of22}"

# CPU test runs use 8 virtual devices for the sharding suites
# (tests/conftest.py sets this itself; exported here for ad-hoc runs).
alias ofc-cpu-test='XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu python -m pytest tests/ -q'

echo "OFC_BUS_NAMESPACE=$OFC_BUS_NAMESPACE  JAX_COMPILATION_CACHE_DIR=$JAX_COMPILATION_CACHE_DIR"
