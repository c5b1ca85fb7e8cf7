"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding logic
(visma_tpu.dist) is exercised without TPU hardware. These env vars must be set
before jax is imported anywhere.
"""
import os

# Force CPU: the session env may point JAX_PLATFORMS at real TPU hardware,
# but tests exercise sharding on virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU
# plugin in every interpreter and rewrites jax_platforms to "axon,cpu",
# which makes jax prefer the TPU again. Override the config itself —
# backends initialize lazily, so this sticks as long as it runs before any
# jax.devices()/jit call, which importing this conftest guarantees.
# Persistent compilation cache: the suite is compile-dominated on CPU;
# repeat runs (local dev, CI reruns) skip straight to execution.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
