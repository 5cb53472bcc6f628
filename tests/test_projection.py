"""Golden tests for the spherical projection against reference numpy semantics."""
import numpy as np
import pytest

from semanticlidarunc_tpu.ops import projection as proj


def _reference_spherical_projection(pc, height, width, theta_range=None):
    """Literal re-statement of the reference algorithm semantics
    (np.digitize on descending bins, descending-range overwrite), used only as
    the test oracle."""
    r = np.sqrt(pc[:, 0] ** 2 + pc[:, 1] ** 2 + pc[:, 2] ** 2)
    order = np.argsort(r, kind="stable")[::-1]
    pc = pc[order]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    p = np.sqrt(x ** 2 + y ** 2)
    phi = np.arctan2(y, x)
    theta = -np.arctan2(p, z) + np.pi / 2
    if theta_range is None:
        theta_min, theta_max = theta.min(), theta.max()
    else:
        theta_min, theta_max = theta_range
    bins_h = np.linspace(theta_min, theta_max, height)[::-1]
    bins_w = np.linspace(-np.pi, np.pi, width)[::-1]
    idx_h = np.digitize(theta, bins_h) - 1
    idx_w = np.digitize(phi, bins_w) - 1
    img = np.zeros((height, width, pc.shape[1]), dtype=np.float32)
    img[idx_h, idx_w, :] = pc
    return img


def test_digitize_desc_matches_numpy(rng):
    bins_asc = np.sort(rng.uniform(-1, 1, size=64)).astype(np.float64)
    bins_desc = bins_asc[::-1]
    x = np.concatenate([
        rng.uniform(-1.5, 1.5, size=4096),
        bins_asc,  # exactly-on-edge values
        [bins_asc[0], bins_asc[-1], -2.0, 2.0],
    ])
    expected = np.digitize(x, bins_desc)
    got = len(bins_asc) - np.searchsorted(bins_asc, x, side="right")
    np.testing.assert_array_equal(got, expected)


def test_numpy_projection_matches_reference_semantics(synthetic_scan):
    img, _, _, _ = proj.spherical_projection_np(synthetic_scan, 64, 512)
    ref = _reference_spherical_projection(synthetic_scan, 64, 512)
    np.testing.assert_array_equal(img, ref)


@pytest.mark.parametrize("theta_range", [None, (-0.45, 0.05)])
def test_jax_projection_matches_numpy(synthetic_scan, theta_range):
    import jax.numpy as jnp

    h, w = 64, 512
    img_np, _, _, _ = proj.spherical_projection_np(
        synthetic_scan, h, w, theta_range=theta_range)

    cap = 1 << int(np.ceil(np.log2(synthetic_scan.shape[0])))
    pts, valid = proj.pad_points(synthetic_scan, cap)
    tr = None if theta_range is None else jnp.asarray(theta_range, jnp.float32)
    img_jax = np.asarray(proj.spherical_projection(
        jnp.asarray(pts), jnp.asarray(valid), h, w, theta_range=tr))

    # numpy golden uses float64 bin edges (numpy linspace default), JAX uses
    # float32; points within ~1 ulp of a bin edge may land one row/col apart.
    mismatch = np.abs(img_jax - img_np) > 1e-5
    frac_bad = mismatch.any(axis=-1).mean()
    assert frac_bad < 2e-3, f"pixel mismatch fraction {frac_bad}"


def test_jax_projection_handles_padding(synthetic_scan):
    import jax.numpy as jnp

    # note: H must not equal the synthetic scan's beam count, else every theta
    # sits exactly on a bin edge and f32-vs-f64 edge rounding dominates.
    h, w = 48, 512
    pts, valid = proj.pad_points(synthetic_scan, synthetic_scan.shape[0] + 777)
    img = np.asarray(proj.spherical_projection(jnp.asarray(pts), jnp.asarray(valid), h, w))
    # padding rows are zeros at the origin; they must not claim pixel (?, ?)
    img2_np, _, _, _ = proj.spherical_projection_np(synthetic_scan, h, w)
    mismatch = (np.abs(img - img2_np) > 1e-5).any(axis=-1).mean()
    assert mismatch < 2e-3


def test_nearest_point_wins():
    import jax.numpy as jnp

    # two points in the same pixel: nearer one must win
    pc = np.array([
        [10.0, 0.0, 0.0, 0.5, 1.0],
        [5.0, 0.0, 0.0, 0.9, 2.0],
    ], dtype=np.float32)
    img_np, _, _, _ = proj.spherical_projection_np(pc, 4, 8, theta_range=(-0.1, 0.1))
    nz = img_np[..., 4][img_np[..., 4] != 0]
    assert nz.tolist() == [2.0]

    pts, valid = proj.pad_points(pc, 8)
    img = np.asarray(proj.spherical_projection(
        jnp.asarray(pts), jnp.asarray(valid), 4, 8,
        theta_range=jnp.asarray([-0.1, 0.1], jnp.float32)))
    np.testing.assert_allclose(img, img_np, atol=1e-6)


def test_rotate_z_matches_reference_convention():
    pts = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 1.0]])
    got = proj.rotate_z_np(pts, 90.0)
    # reference right-multiplies: (1,0,0) @ R(90) = (cos90, -sin90, 0) = (0,-1,0)
    np.testing.assert_allclose(got[0], [0.0, -1.0, 0.0], atol=1e-12)

    import jax.numpy as jnp
    got_j = np.asarray(proj.rotate_z(jnp.asarray(pts, jnp.float32),
                                     jnp.asarray(np.radians(90.0), jnp.float32)))
    np.testing.assert_allclose(got_j, got, atol=1e-6)
