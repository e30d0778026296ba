"""DMA-pipelined row gather vs jnp.take (values + VJP), interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np

from zest_tpu.kernels.dma_gather import take_rows


def test_take_rows_matches_take():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, size=(3, 97)).astype(np.int32))
    got = take_rows(tab, idx)
    ref = jnp.take(tab, idx, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_take_rows_bf16_and_grad():
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 256, size=(300,)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))

    got_b = take_rows(tab.astype(jnp.bfloat16), idx)
    ref_b = jnp.take(tab.astype(jnp.bfloat16), idx, axis=0)
    np.testing.assert_array_equal(np.asarray(got_b.astype(jnp.float32)),
                                  np.asarray(ref_b.astype(jnp.float32)))

    # VJP = row scatter-add, identical to jnp.take's (collisions included)
    gk = jax.grad(lambda t: jnp.vdot(take_rows(t, idx), g))(tab)
    gx = jax.grad(lambda t: jnp.vdot(jnp.take(t, idx, axis=0), g))(tab)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=1e-6)
