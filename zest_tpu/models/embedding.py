"""NeRF positional encoding — pure function (no module state needed under JAX).

Output layout matches the reference ``Embedding`` exactly
(``/root/reference/networks.py:29-65``): ``[x, sin(f_0 x), cos(f_0 x), sin(f_1 x), ...]``
concatenated on the channel axis, log-scale bands f_k = 2^k.

out_channels = in_channels * (2 * N_freqs + 1); e.g. xyz: 3→63 @ N=10, dir: 3→27 @ N=4,
xyzt: 4→84 @ N=10.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def embedding_out_channels(in_channels: int, n_freqs: int) -> int:
    return in_channels * (2 * n_freqs + 1)


def positional_encoding(x: jnp.ndarray, n_freqs: int, logscale: bool = True) -> jnp.ndarray:
    """Embed x to (x, sin(2^k x), cos(2^k x), ...).

    Computed as ONE batched sin + cos over the stacked frequency axis (the
    per-frequency python loop produced 2N separate transcendental ops that XLA
    scheduled as distinct HBM round trips); the reshape reproduces the
    reference's interleaved [sin(f_k x), cos(f_k x)] block layout exactly.

    Args:
        x: [..., C]
    Returns: [..., C * (2 * n_freqs + 1)]
    """
    if n_freqs == 0:
        return x
    if logscale:
        freqs = 2.0 ** np.linspace(0, n_freqs - 1, n_freqs)
    else:
        freqs = np.linspace(1, 2 ** (n_freqs - 1), n_freqs)
    C = x.shape[-1]
    scaled = x[..., None, :] * jnp.asarray(freqs, x.dtype)[:, None]  # [..., F, C]
    sc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)      # [..., F, 2, C]
    flat = sc.reshape(*x.shape[:-1], 2 * len(freqs) * C)
    return jnp.concatenate([x, flat], axis=-1)
