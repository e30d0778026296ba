"""Depth-folded 3D conv reformulations vs the direct XLA conv3d oracle.

Conv3dZ2D and _UpConvBn's phase-split are claimed exactly equivalent to
`lax.conv_general_dilated` 3D (stride 1/2, and lhs-dilated transposed conv) —
these tests pin that equivalence directly (the torch-oracle parity test covers
it end-to-end through the whole encoder)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zest_tpu.models.cost_reg import Conv3dZ2D, _UpConvBn


def _conv3d_oracle(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, (stride,) * 3, [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("stride,D,H,W,cin,cout", [
    (1, 16, 12, 20, 6, 4),
    (2, 16, 12, 20, 6, 8),
    (2, 32, 8, 16, 5, 3),
])
def test_conv3d_z2d_matches_conv3d(stride, D, H, W, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, D, H, W, cin)).astype(np.float32))
    mod = Conv3dZ2D(cout, stride=stride)
    with jax.default_matmul_precision("highest"):
        variables = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(variables, x)
        ref = _conv3d_oracle(x, variables["params"]["kernel"], stride)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_upconv_phase_split_matches_lhs_dilated_conv3d():
    """_UpConvBn's z phase split == ConvTranspose3d(k3,s2,p1,op1) semantics
    (lhs-dilated conv, padding (1,2), pre-flipped kernel)."""
    rng = np.random.default_rng(1)
    D, H, W, cin, cout = 8, 6, 10, 5, 4
    x = jnp.asarray(rng.normal(size=(1, D, H, W, cin)).astype(np.float32))
    mod = _UpConvBn(cout)
    with jax.default_matmul_precision("highest"):
        variables = mod.init(jax.random.PRNGKey(0), x)
        k = variables["params"]["deconv_kernel"]
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        # compare pre-BN output: re-run the conv part by calling apply and
        # inverting is awkward — instead apply BN to the oracle with the same
        # (freshly initialized) BN params for an apples-to-apples comparison
        out = mod.apply(variables, x)
        from zest_tpu.models.feature_net import BatchNormAct
        bn = BatchNormAct()
        bn_vars = {"params": variables["params"]["bn"]} \
            if "bn" in variables["params"] else {}
        ref_bn = bn.apply(bn_vars, ref)
    assert out.shape == (1, 2 * D, 2 * H, 2 * W, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_bn),
                               rtol=2e-4, atol=2e-4)
