"""Parameter initializers matching torch defaults.

The reference relies on PyTorch's default Linear/Conv init (kaiming_uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights, and
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for biases — networks.py leaves the commented-out
He init disabled). Flax defaults (lecun_normal / zeros) differ; for training-dynamics
parity we reproduce the torch distributions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    """Flax Dense kernel shape is (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense_bias_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Flax Conv kernel shape is (*kernel_spatial, fan_in, fan_out)."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = shape[-2] * receptive
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in_total: int):
    bound = 1.0 / float(fan_in_total) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
