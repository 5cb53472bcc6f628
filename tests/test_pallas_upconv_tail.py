"""Tests for the fused Pallas upconv-tail kernel (ops/pallas_upconv_tail.py).

On CPU the kernel runs in interpreter mode. The contract: the kernel's flat
act output + lane statistics must match (a) the pure-JAX oracle and (b) the
production XLA span it replaces — ops/upconv.upsample_conv_phase (folded
conv + zero-pad border fix) followed by models/layers._groupnorm_affine —
so mc_fused_summaries(use_pallas=True) stays bit-near the XLA tail.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlidarunc_tpu.models.layers import _groupnorm_affine, gn_groups
from semanticlidarunc_tpu.ops import pallas_upconv_tail as put
from semanticlidarunc_tpu.ops import upconv


@pytest.mark.parametrize("tb,h2,w2,c,cout", [
    (3, 8, 32, 16, 8), (2, 6, 48, 8, 4), (1, 4, 16, 32, 16),
])
def test_kernel_matches_oracle_and_production(tb, h2, w2, c, cout):
    rng = np.random.default_rng(h2 * w2)
    z = jnp.asarray(rng.standard_normal((tb, h2, w2, c)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.3,
                       jnp.float32)
    slabs = put.border_correction_slabs(kern, z[:, 0], z[:, -1],
                                        z[:, :, 0], z[:, :, -1])
    act_k, st_k = put.upconv_act_pallas(z, kern, *slabs, interpret=True)
    act_o, st_o = put.upconv_act_reference(z, kern, *slabs)
    np.testing.assert_allclose(act_k, act_o, atol=1e-5)
    np.testing.assert_allclose(st_k, st_o, rtol=1e-4, atol=1e-3)

    # production span: phase-form fused upsample-conv with border fix
    y_prod = upconv.upsample_conv_phase(z, kern, 2)       # [TB,h,w,2,2,C']
    np.testing.assert_allclose(
        np.asarray(act_k).reshape(tb, h2, w2, 2, 2, cout),
        np.asarray(y_prod), atol=1e-5)

    g = gn_groups(cout, 8)
    scale = jnp.asarray(rng.standard_normal(cout) * 0.2 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    a_p, b_p = _groupnorm_affine(y_prod, g, scale, bias)
    a_k, b_k = put.lane_stats_to_affine(st_k, h2 * w2, g, scale, bias)
    np.testing.assert_allclose(a_k, a_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(b_k, b_p, rtol=1e-4, atol=1e-4)


def test_dec2_stage_matches_flax():
    """dec2_act_pallas == GroupNorm(affine-folded) + ReLU + nn.Conv SAME,
    and its lane stats reproduce the GNConv GroupNorm affine."""
    import flax.linen as nn

    tb, h2, w2, c, c2 = 3, 8, 32, 16, 24
    rng = np.random.default_rng(5)
    y1 = jnp.asarray(rng.standard_normal((tb, h2, w2, c)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((3, 3, c, c2)) * 0.2, jnp.float32)
    scale1 = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    bias1 = jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32)

    import math
    g1 = math.gcd(min(32, c), c)
    a1, b1 = _groupnorm_affine(y1, g1, scale1, bias1)
    z_k, ls_k = put.dec2_act_pallas(y1, kern, a1, b1, interpret=True)

    # oracle: flax GroupNorm -> ReLU -> nn.Conv(SAME, no bias)
    gn = nn.GroupNorm(num_groups=g1)
    zn = gn.apply({"params": {"scale": scale1, "bias": bias1}}, y1)
    z1 = nn.relu(zn)
    z_o = jax.lax.conv_general_dilated(
        z1, kern, (1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(
        np.asarray(z_k).reshape(tb, h2, w2, c2), np.asarray(z_o),
        atol=1e-4)

    g2 = gn_groups(c2, 32)
    scale2 = jnp.asarray(rng.standard_normal(c2) * 0.1 + 1, jnp.float32)
    bias2 = jnp.asarray(rng.standard_normal(c2), jnp.float32)
    a_p, b_p = _groupnorm_affine(z_o, g2, scale2, bias2)
    a_k, b_k = put.lane_stats_to_affine(ls_k, h2 * w2, g2, scale2, bias2,
                                        phases=1)
    np.testing.assert_allclose(a_k, a_p, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(b_k, b_p, rtol=1e-4, atol=1e-4)
