"""Test config: run on CPU with 8 virtual devices and float64 enabled.

Multi-chip sharding is exercised on a virtual CPU mesh (the driver
separately dry-runs the multichip path); physics validation uses float64
so discretisation error, not dtype, dominates.

Note: the environment may pre-register a TPU platform at interpreter
startup (sitecustomize imports jax), so JAX_PLATFORMS cannot be changed
here.  Instead the CPU backend (always registered) is made the default
device; XLA_FLAGS is still read lazily at first CPU-client creation, so
the 8 virtual host devices take effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # forbid FMA instructions so LLVM cannot contract mul+add chains:
    # jitted CPU arithmetic then reproduces the reference's plain
    # mul/add double arithmetic bitwise (golden-parity contract)
    flags = (flags + " --xla_cpu_max_isa=SSE4_2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

CPUS = jax.devices("cpu")
jax.config.update("jax_default_device", CPUS[0])
jax.config.update("jax_enable_x64", True)
