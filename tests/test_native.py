"""Native C++ host kernels vs the numpy goldens.

The .so is built on first use with the system g++ (skipped if no compiler).
Projection must be pixel-exact up to atan2/sqrt libm-vs-numpy ulp effects at
bin edges (bounded mismatch count, same bound the device projection tests
use); normals agree to float tolerance (different summation order).
"""
import numpy as np
import pytest

from semanticlidarunc_tpu import native
from semanticlidarunc_tpu.dataset.synthetic import make_scan
from semanticlidarunc_tpu.ops.projection import spherical_projection_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not buildable")


def test_native_projection_matches_numpy_golden():
    pc = make_scan(seed=3, n_beams=64, n_azimuth=512)
    h, w = 63, 512
    got = native.spherical_projection(pc, h, w)
    want, _, _, _ = spherical_projection_np(pc, h, w)
    # identical up to libm-vs-numpy trig rounding flipping bin assignment
    # for points within 1 ulp of an edge
    mism = np.any(got != want, axis=-1).sum()
    assert mism <= max(4, int(2e-4 * h * w)), f"{mism} mismatched pixels"


def test_native_projection_fixed_theta_range():
    pc = make_scan(seed=5, n_beams=32, n_azimuth=256)
    h, w = 48, 256
    tr = (-0.45, 0.05)
    got = native.spherical_projection(pc, h, w, theta_range=tr)
    want, _, _, _ = spherical_projection_np(pc, h, w, theta_range=tr)
    mism = np.any(got != want, axis=-1).sum()
    assert mism <= max(4, int(2e-4 * h * w)), f"{mism} mismatched pixels"


def test_native_projection_nearest_wins_and_ties():
    # two points in the same pixel: nearer wins; exact ties -> smaller index
    base = np.array([[10.0, 0.0, 0.0, 0.5, 1.0],
                     [5.0, 0.0, 0.0, 0.7, 2.0],
                     [5.0, 0.0, 0.0, 0.9, 3.0]], np.float32)
    # give the projection a spread so theta/phi edges are well-defined
    # (h != n_beams: equal values put every elevation exactly on a bin edge
    # where libm-vs-numpy 1-ulp trig differences scatter rows)
    spread = make_scan(seed=0, n_beams=8, n_azimuth=16)[:, :5]
    pc = np.concatenate([base, spread], axis=0)
    h, w = 7, 16
    got = native.spherical_projection(pc, h, w)
    want, _, _, _ = spherical_projection_np(pc, h, w)
    np.testing.assert_array_equal(got, want)
    # the winning point for the duplicated pixel is the r=5, index-1 row
    iy, ix = np.argwhere(got[..., 4] == 2.0)[0]
    assert got[iy, ix, 3] == np.float32(0.7)


def test_native_normals_match_numpy_golden():
    from semanticlidarunc_tpu.ops.normals import build_normal_xyz_np
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((32, 64, 3)).astype(np.float32)
    got = native.scharr_normals(xyz)
    want = build_normal_xyz_np(xyz)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_reader_uses_native_and_matches_python_path(tmp_path, monkeypatch):
    """ProjectedDataset output must be identical (up to edge-ulp pixels)
    with the native path on and off."""
    from semanticlidarunc_tpu.dataset import readers

    pc = make_scan(seed=1, n_beams=32, n_azimuth=128)
    xyzi = pc[:, :4]
    labels = pc[:, 4].astype(np.uint32)
    fbin = tmp_path / "000000.bin"
    flab = tmp_path / "000000.label"
    xyzi.astype(np.float32).tofile(fbin)
    labels.astype(np.uint32).tofile(flab)

    def load(native_on):
        monkeypatch.setenv("SLU_NATIVE", "1" if native_on else "0")
        ds = readers.ProjectedDataset([(str(fbin), str(flab))],
                                      projection=(31, 128))
        return ds[0]

    a = load(True)
    b = load(False)
    assert set(a) == set(b)
    mism = (a["labels"] != b["labels"]).sum()
    assert mism <= max(4, int(2e-4 * a["labels"].size))
