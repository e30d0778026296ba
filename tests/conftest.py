"""Test env: force CPU JAX with 8 virtual devices for multi-chip sharding tests.

Must run before jax is imported anywhere (SURVEY §7.4). The environment pre-sets
JAX_PLATFORMS=axon (one real TPU chip behind a tunnel) — tests must override it,
not setdefault, to run hermetically on the host CPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# default matmul/conv precision rounds through bf16 even on CPU — tests compare
# against f32 oracles, so pin full precision. Set via jax.config (not env): a
# pytest plugin (jaxtyping) imports jax before this conftest runs, so the env
# var would be read too late. Device selection is still lazy, so JAX_PLATFORMS
# above is honored.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
# something in the pytest bootstrap imports jax before this conftest, freezing
# the JAX_PLATFORMS env default at 'axon' (the real TPU) — override via config,
# which is honored until the first backend initialization
jax.config.update("jax_platforms", "cpu")
