"""Test configuration: force an 8-device virtual CPU platform so the
multi-chip sharding paths (jax.sharding.Mesh / shard_map) are exercised
without TPU hardware. Must run before jax is imported anywhere."""

import os

# PANSVR_ONCHIP_TESTS=1 runs the on-chip parity gate against the REAL
# backend (tests/test_onchip.py); everything else still forces the
# virtual CPU mesh below.
_ONCHIP = bool(os.environ.get("PANSVR_ONCHIP_TESTS"))

# Force the CPU backend: the ambient environment presets
# JAX_PLATFORMS=axon (remote TPU tunnel), which would route every tiny
# test transfer over the network, and a sitecustomize hook imports jax
# BEFORE this file runs — so setting the env var here is too late; we
# must go through jax.config. Tests exercise multi-chip paths on the
# virtual CPU mesh; the real chip is for benchmarks only.
if not _ONCHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ONCHIP:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, not the TPU tunnel"
    )
# persistent jit cache so repeated test runs skip recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pansvr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
