// Native host kernels for the training input pipeline.
//
// The reference's host-side per-scan work (spherical projection + Scharr
// normals, /root/reference/src/dataset/utils.py:288-349 and :30-59) runs in
// torch DataLoader worker *processes*; this framework's loader is a thread
// pool (dataset/pipeline.py), so the hot per-scan ops live here in C++ —
// called through ctypes, which releases the GIL for the whole call, making
// the thread-pool loader genuinely parallel on multi-core hosts.
//
// Semantics are the exact twins of the numpy goldens:
//   - spherical_projection: descending-bin np.digitize edge behavior
//     (ascending linspace edges with both endpoints pinned, searchsorted
//     'right'), range-descending stable overwrite order so the NEAREST
//     point wins each pixel and ties go to the smaller original index
//     (ops/projection.py:spherical_projection_np).
//   - scharr_normals: cv2.Scharr (BORDER_REFLECT_101) derivatives along u,v
//     with scale 1/0.25, cross product, normalize + 1e-10
//     (dataset/readers.py:_build_normals).
//
// Build: g++ -O3 -shared -fPIC -o libslu_host_ops.so host_ops.cpp
// (done automatically on first import by native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// descending-bin digitize against numpy-linspace edges
// ---------------------------------------------------------------------------

// numpy linspace(lo, hi, n): edge[j] = lo + j*step in float64 with the last
// endpoint pinned to hi exactly.
static void make_edges(double lo, double hi, int n, std::vector<double>& e) {
    e.resize(n);
    const double step = (hi - lo) / (n - 1);
    for (int j = 0; j < n; ++j) e[j] = lo + j * step;
    e[n - 1] = hi;
}

// np.digitize(x, bins_desc) - 1 where bins_desc = ascending edges reversed:
// returns (#edges strictly greater than x) - 1, i.e.
// n - searchsorted_right(edges_asc, x) - 1.
static inline int digitize_desc_m1(const std::vector<double>& e, double x) {
    // upper_bound: first edge > x  ==  searchsorted(..., 'right')
    const int sr = (int)(std::upper_bound(e.begin(), e.end(), x) - e.begin());
    return (int)e.size() - sr - 1;
}

// ---------------------------------------------------------------------------
// spherical projection (nearest-wins scatter)
// ---------------------------------------------------------------------------

// pc: [n, cols] float32 row-major, cols >= 3 (xyz first).
// theta_mode: 0 = from data min/max (reference default), 1 = explicit range.
// img: [height, width, cols] float32, zero-initialized by this function.
// Returns 0 on success.
int slu_spherical_projection(const float* pc, int64_t n, int cols,
                             int height, int width, int theta_mode,
                             double theta_min, double theta_max,
                             float* img) {
    if (n <= 0) {
        std::memset(img, 0, sizeof(float) * height * width * cols);
        return 0;
    }
    std::vector<float> r(n), phi(n), theta(n);
    for (int64_t i = 0; i < n; ++i) {
        const float x = pc[i * cols + 0];
        const float y = pc[i * cols + 1];
        const float z = pc[i * cols + 2];
        // float32 arithmetic to mirror numpy's float32 ufuncs
        const float p = std::sqrt(x * x + y * y);
        r[i] = std::sqrt(x * x + y * y + z * z);
        phi[i] = std::atan2(y, x);
        theta[i] = -std::atan2(p, z) + (float)(M_PI / 2);
    }
    if (theta_mode == 0) {
        float tmin = theta[0], tmax = theta[0];
        for (int64_t i = 1; i < n; ++i) {
            tmin = std::min(tmin, theta[i]);
            tmax = std::max(tmax, theta[i]);
        }
        theta_min = (double)tmin;
        theta_max = (double)tmax;
    }
    std::vector<double> eh, ew;
    make_edges(theta_min, theta_max, height, eh);
    make_edges(-M_PI, M_PI, width, ew);

    std::vector<int32_t> ih(n), iw(n);
    for (int64_t i = 0; i < n; ++i) {
        int a = digitize_desc_m1(eh, (double)theta[i]);
        int b = digitize_desc_m1(ew, (double)phi[i]);
        // numpy wraps index -1 to the last row/col; clamp overflow the same
        // way the fancy-index write would fault-free wrap: digitize yields
        // [-1, height-1]; -1 means above the top edge -> wraps to last row.
        if (a < 0) a += height;
        if (b < 0) b += width;
        ih[i] = a;
        iw[i] = b;
    }

    // stable argsort by r ascending, then iterate REVERSED (far -> near):
    // nearest point wins; ties go to the smaller original index.
    std::vector<int64_t> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return r[a] < r[b]; });

    std::memset(img, 0, sizeof(float) * height * width * cols);
    for (int64_t k = n - 1; k >= 0; --k) {
        const int64_t i = order[k];
        float* dst = img + ((int64_t)ih[i] * width + iw[i]) * cols;
        const float* src = pc + i * cols;
        for (int c = 0; c < cols; ++c) dst[c] = src[c];
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Scharr normals
// ---------------------------------------------------------------------------

// BORDER_REFLECT_101 index: reflect without repeating the edge pixel.
static inline int refl101(int i, int nmax) {
    if (nmax == 1) return 0;
    const int period = 2 * (nmax - 1);
    i = ((i % period) + period) % period;
    return i < nmax ? i : period - i;
}

// xyz: [h, w, 3] float32. out: [h, w, 3] float32 normalized normals.
// Matches dataset/readers.py:_build_normals (cv2.Scharr, scale=1/0.25).
int slu_scharr_normals(const float* xyz, int h, int w, float* out) {
    const float scale = 4.0f;  // 1 / nf, nf = 0.25
    // Scharr dx kernel: [-3 0 3; -10 0 10; -3 0 3] (row-major, y down)
    // Scharr dy kernel: its transpose.
    std::vector<float> gx(3 * (int64_t)h * w), gy(3 * (int64_t)h * w);
    for (int c = 0; c < 3; ++c) {
        for (int i = 0; i < h; ++i) {
            const int im = refl101(i - 1, h), ip = refl101(i + 1, h);
            for (int j = 0; j < w; ++j) {
                const int jm = refl101(j - 1, w), jp = refl101(j + 1, w);
                auto at = [&](int r, int cc) {
                    return xyz[((int64_t)r * w + cc) * 3 + c];
                };
                const float dx =
                    -3.f * at(im, jm) + 3.f * at(im, jp)
                    - 10.f * at(i, jm) + 10.f * at(i, jp)
                    - 3.f * at(ip, jm) + 3.f * at(ip, jp);
                const float dy =
                    -3.f * at(im, jm) - 10.f * at(im, j) - 3.f * at(im, jp)
                    + 3.f * at(ip, jm) + 10.f * at(ip, j) + 3.f * at(ip, jp);
                gx[((int64_t)c * h + i) * w + j] = dx * scale;
                gy[((int64_t)c * h + i) * w + j] = dy * scale;
            }
        }
    }
    for (int64_t i = 0; i < (int64_t)h * w; ++i) {
        const float sxx = gx[i], sxy = gy[i];
        const float syx = gx[(int64_t)h * w + i], syy = gy[(int64_t)h * w + i];
        const float szx = gx[2 * (int64_t)h * w + i],
                    szy = gy[2 * (int64_t)h * w + i];
        float nx = -(syx * szy - szx * syy);
        float ny = -(szx * sxy - szy * sxx);
        float nz = -(sxx * syy - syx * sxy);
        const float norm =
            std::sqrt(nx * nx + ny * ny + nz * nz) + 1e-10f;
        out[i * 3 + 0] = nx / norm;
        out[i * 3 + 1] = ny / norm;
        out[i * 3 + 2] = nz / norm;
    }
    return 0;
}

}  // extern "C"
