"""Scharr-derivative normals: JAX vs numpy golden vs OpenCV (when available).

Note: at the first/last rows and columns, REFLECT_101 padding makes the
derivative across that border exactly zero, so the cross product has ~zero
norm and the *normalized* normal is numerically undefined (in the reference
implementation too). Comparisons therefore mask out ill-conditioned pixels.
"""
import numpy as np
import pytest

from semanticlidarunc_tpu.ops import normals as nrm


def _xyz_image(rng, h=16, w=32):
    return rng.standard_normal((h, w, 3)).astype(np.float32)


def _cross_norm(xyz, norm_factor=0.25):
    g = np.asarray(nrm.scharr_uv(xyz, norm_factor))
    cx = g[..., 1, 0] * g[..., 2, 1] - g[..., 2, 0] * g[..., 1, 1]
    cy = g[..., 2, 0] * g[..., 0, 1] - g[..., 2, 1] * g[..., 0, 0]
    cz = g[..., 0, 0] * g[..., 1, 1] - g[..., 1, 0] * g[..., 0, 1]
    return np.sqrt(cx ** 2 + cy ** 2 + cz ** 2)


def test_jax_matches_numpy_golden(rng):
    xyz = _xyz_image(rng)
    got = np.asarray(nrm.build_normal_xyz(xyz))
    want = nrm.build_normal_xyz_np(xyz)
    ok = _cross_norm(xyz) > 1e-2
    assert ok.mean() > 0.5
    np.testing.assert_allclose(got[ok], want[ok], atol=1e-3)


def test_matches_opencv_reference(rng):
    cv2 = pytest.importorskip("cv2")
    xyz = _xyz_image(rng)
    norm_factor = 0.25

    def scharr(c, dx, dy):
        return cv2.Scharr(xyz[..., c].astype(np.float32), cv2.CV_32FC1, dx, dy,
                          scale=1.0 / norm_factor)

    sxx, sxy = scharr(0, 1, 0), scharr(0, 0, 1)
    syx, syy = scharr(1, 1, 0), scharr(1, 0, 1)
    szx, szy = scharr(2, 1, 0), scharr(2, 0, 1)
    normal = -np.dstack((syx * szy - szx * syy,
                         szx * sxy - szy * sxx,
                         sxx * syy - syx * sxy))
    n = np.linalg.norm(normal, axis=2) + 1e-10
    want = normal / n[..., None]

    got = np.asarray(nrm.build_normal_xyz(xyz, norm_factor))
    ok = _cross_norm(xyz, norm_factor) > 1e-2
    np.testing.assert_allclose(got[ok], want[ok], atol=1e-3)


def test_scharr_matches_opencv_exactly(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.standard_normal((12, 20, 1)).astype(np.float32)
    g = np.asarray(nrm.scharr_uv(img, norm_factor=0.25))
    du = cv2.Scharr(img[..., 0], cv2.CV_32FC1, 1, 0, scale=4.0)
    dv = cv2.Scharr(img[..., 0], cv2.CV_32FC1, 0, 1, scale=4.0)
    np.testing.assert_allclose(g[..., 0, 0], du, atol=1e-3)
    np.testing.assert_allclose(g[..., 0, 1], dv, atol=1e-3)


def test_flat_plane_normal_is_up():
    # xyz image of a flat ground plane z = const: normal should be +/- z
    h, w = 8, 16
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    xyz = np.stack([u, v, np.zeros_like(u)], axis=-1)
    n = np.asarray(nrm.build_normal_xyz(xyz))
    nz = n[2:-2, 2:-2, 2]  # away from borders
    assert np.all(np.abs(np.abs(nz) - 1.0) < 1e-4)
