"""Exactness tests for the phase-decomposed upsample+conv (ops/upconv.py).

The fused kernel must reproduce `jax.image.resize(bilinear) -> 3x3 SAME conv`
bit-for-bit up to float reassociation, including the zero-padded border rows
and columns, for every integer scale the FPN uses (2, 4, 8) plus an odd one.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlidarunc_tpu.ops import upconv


def _reference(x, k, s):
    b, h, w, c = x.shape
    up = jax.image.resize(x, (b, h * s, w * s, c), method="bilinear")
    return jax.lax.conv_general_dilated(
        up, k, (1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("s,h,w,cin,cout", [
    (2, 5, 7, 3, 4), (2, 32, 64, 8, 6), (4, 4, 8, 5, 3),
    (8, 4, 16, 3, 2), (3, 6, 10, 4, 4), (2, 2, 2, 1, 1),
    (8, 1, 1, 3, 2), (2, 1, 4, 2, 2), (4, 3, 1, 2, 2),
])
def test_upsample_conv_matches_resize_conv(s, h, w, cin, cout):
    rng = np.random.default_rng(s * 100 + h)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32) * 0.3
    ref = _reference(x, k, s)
    got = upconv.upsample_conv(x, k, s)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_phase_form_layout():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 2)), jnp.float32)
    ph = upconv.upsample_conv_phase(x, k, 2)
    assert ph.shape == (1, 4, 6, 2, 2, 2)
    full = upconv.depth_to_space(ph)
    # phase (i, j, dr, dc) holds full-res (2i+dr, 2j+dc)
    np.testing.assert_array_equal(np.asarray(full[0, 5, 3]),
                                  np.asarray(ph[0, 2, 1, 1, 1]))


def test_upsample_block_unchanged_and_phase_equivalent():
    """The rebuilt UpsampleBlock == old resize->conv->GN->relu composition,
    and phase_form=True produces the same values in phase layout."""
    import flax.linen as nn
    from semanticlidarunc_tpu.models.layers import UpsampleBlock, gn_groups

    class OldBlock(nn.Module):
        features: int
        scale: int

        @nn.compact
        def __call__(self, x):
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, h * self.scale, w * self.scale, c), method="bilinear")
            x = nn.Conv(self.features, (3, 3), use_bias=False)(x)
            x = nn.GroupNorm(num_groups=gn_groups(self.features, 8))(x)
            return nn.relu(x)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 12)), jnp.float32)
    new = UpsampleBlock(features=8, scale=2)
    old = OldBlock(features=8, scale=2)
    v_new = new.init(jax.random.PRNGKey(0), x)
    # identical param tree -> old params load into the new block verbatim
    v_old = old.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_new) == \
        jax.tree_util.tree_structure(v_old)
    out_old = old.apply(v_old, x)
    out_new = new.apply(v_old, x)
    np.testing.assert_allclose(out_new, out_old, atol=2e-5, rtol=1e-5)

    ph = new.apply(v_old, x, phase_form=True)
    np.testing.assert_allclose(upconv.depth_to_space(ph), out_old,
                               atol=2e-5, rtol=1e-5)


def test_border_strips_match_reference_frame():
    """border_strips return the TRUE zero-pad border values of
    conv3x3(upsample(x)) — the exactness contract _border_fix builds on."""
    rng = np.random.default_rng(5)
    s, h, w = 2, 8, 16
    x = jnp.asarray(rng.standard_normal((2, h, w, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 4)), jnp.float32) * 0.3
    ref = _reference(x, k, s)
    row0, rowl, col0, coll = upconv.border_strips(x, k, s)
    np.testing.assert_allclose(row0, ref[:, :s], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(rowl, ref[:, -s:], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(col0, ref[:, :, :s], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(coll, ref[:, :, -s:], atol=2e-5, rtol=1e-5)
