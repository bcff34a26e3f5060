// Native host-side ray pipeline.
//
// The reference delegates its per-item host work to torch's C++ DataLoader
// machinery; this library is the equivalent native core for our loader:
// per-pixel ray generation (OpenCV pinhole convention, reference
// core/utils/camera_util.py:133-160) fused with the slab-test ray/bbox
// intersection (camera_util.py:163-212) in one cache-friendly pass —
// the hottest numeric loop of Dataset.__getitem__.
//
// Built with: g++ -O3 -march=native -shared -fPIC -o libray_sampler.so
// Exposed via ctypes (no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// 3x3 inverse (row major)
inline bool invert3(const double* m, double* inv) {
    const double a = m[0], b = m[1], c = m[2];
    const double d = m[3], e = m[4], f = m[5];
    const double g = m[6], h = m[7], i = m[8];
    const double A = e * i - f * h;
    const double B = -(d * i - f * g);
    const double C = d * h - e * g;
    const double det = a * A + b * B + c * C;
    if (std::fabs(det) < 1e-30) return false;
    const double r = 1.0 / det;
    inv[0] = A * r;
    inv[1] = -(b * i - c * h) * r;
    inv[2] = (b * f - c * e) * r;
    inv[3] = B * r;
    inv[4] = (a * i - c * g) * r;
    inv[5] = -(a * f - c * d) * r;
    inv[6] = C * r;
    inv[7] = -(a * h - b * g) * r;
    inv[8] = (a * e - b * d) * r;
    return true;
}

}  // namespace

extern "C" {

// Fused ray generation + bbox intersection.
//
//   K:    (9)  row-major intrinsics
//   R:    (9)  row-major rotation (world->cam)
//   T:    (3)  translation
//   bbox: (6)  min_xyz, max_xyz
// Outputs (caller-allocated):
//   rays_o: (H*W*3) float32 — constant camera center, broadcast
//   rays_d: (H*W*3) float32 — UNNORMALIZED directions with the reference's
//           in-place 1e-5 clamp of near-zero components
//   near/far: (H*W) float32 — 0 where the ray misses the bbox
//   mask:   (H*W) uint8 — 1 iff the ray hits exactly two expanded faces
//
// Returns 0 on success.
int build_rays(int H, int W, const double* K, const double* R,
               const double* T, const double* bbox, float* rays_o,
               float* rays_d, float* near_out, float* far_out,
               uint8_t* mask) {
    double Kinv[9];
    if (!invert3(K, Kinv)) return 1;

    // camera origin: -R^T T
    double o[3];
    for (int a = 0; a < 3; ++a)
        o[a] = -(R[0 * 3 + a] * T[0] + R[1 * 3 + a] * T[1]
                 + R[2 * 3 + a] * T[2]);

    // margin-expanded bounds (camera_util.py:137: -+0.01)
    double lo[3], hi[3];
    for (int a = 0; a < 3; ++a) {
        lo[a] = bbox[a] - 0.01;
        hi[a] = bbox[3 + a] + 0.01;
    }
    const double eps = 1e-6;

    for (int y = 0; y < H; ++y) {
        for (int x = 0; x < W; ++x) {
            const int64_t p = (int64_t)y * W + x;
            // pixel -> camera ray: Kinv @ [x, y, 1]
            double pc[3];
            for (int a = 0; a < 3; ++a)
                pc[a] = Kinv[a * 3 + 0] * x + Kinv[a * 3 + 1] * y
                        + Kinv[a * 3 + 2];
            // world dir: (pc - T) @ R - o  == R^T (pc - T) - o
            double d[3];
            for (int a = 0; a < 3; ++a) {
                d[a] = R[0 * 3 + a] * (pc[0] - T[0])
                       + R[1 * 3 + a] * (pc[1] - T[1])
                       + R[2 * 3 + a] * (pc[2] - T[2]) - o[a];
                if (std::fabs(d[a]) < 1e-5) d[a] = 1e-5;  // reference clamp
                rays_o[p * 3 + a] = (float)o[a];
                rays_d[p * 3 + a] = (float)d[a];
            }

            // slab test: intersect the 6 face planes, count hits whose
            // point lies inside the expanded box (exactly 2 = valid)
            int hits = 0;
            double t_hit[6];
            for (int face = 0; face < 6; ++face) {
                const int axis = face % 3;
                const double plane = (face < 3) ? lo[axis] : hi[axis];
                const double t = (plane - o[axis]) / d[axis];
                double q[3];
                bool inside = true;
                for (int a = 0; a < 3; ++a) {
                    q[a] = o[a] + t * d[a];
                    if (q[a] < lo[a] - eps || q[a] > hi[a] + eps) {
                        inside = false;
                        break;
                    }
                }
                if (inside && hits < 6) t_hit[hits++] = t;
            }
            if (hits == 2) {
                const double norm = std::sqrt(d[0] * d[0] + d[1] * d[1]
                                              + d[2] * d[2]);
                // the reference computes near/far as |p_hit - o| / |d|,
                // which equals |t| (t can be negative behind the camera;
                // the distance formulation keeps it positive)
                double n0 = std::fabs(t_hit[0]) * norm / norm;
                double n1 = std::fabs(t_hit[1]) * norm / norm;
                // |p - o| = |t| * |d|; divided by |d| -> |t|
                n0 = std::fabs(t_hit[0]);
                n1 = std::fabs(t_hit[1]);
                near_out[p] = (float)(n0 < n1 ? n0 : n1);
                far_out[p] = (float)(n0 < n1 ? n1 : n0);
                mask[p] = 1;
            } else {
                near_out[p] = 0.0f;
                far_out[p] = 0.0f;
                mask[p] = 0;
            }
        }
    }
    return 0;
}

}  // extern "C"
