// vrt_native — host-side native components of volumeraytracer_tpu.
//
// TPU-native framework's analogue of the reference's host/native layer:
//
//  * vrt_march_float: the float eikonal march as plain scalar C++ — the
//    same role the reference's -DNCUDA build of cuda_volume_raytracer.cu
//    plays (Makefile:57-58): an independent host implementation of the
//    identical kernel semantics (trace_ray_function,
//    cuda_volume_raytracer.cu:317-374, float instantiation) used as a
//    test oracle against the XLA/Pallas paths.  OpenMP over rays mirrors
//    trace_rays_cpu (.cu:376-394).
//
//  * vrt_solve_harmonic: damped Jacobi sweeps of the edge-weighted grid
//    Laplacian (≙ solveHarmonic, solve_harmonic.cpp:54-117), OpenMP.
//
//  * vrt_pack_rays / vrt_unpack_rays: SoA↔AoS ray marshalling
//    (≙ fill_struct/read_struct, cuda_volume_raytracer.cu:468-516).
//
// Build: make -C native   (g++ -O2 -march=native -fopenmp -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Trilinear interpolation of a channels-last (X, Y, Z, C) float field at a
// float voxel position (corner-anchored, matching ops/interp.py
// interp_linear and the reference interpolatef float semantics,
// cuda_volume_raytracer.cu:130-166).
static inline void interp4(const float* f, int X, int Y, int Z, int C,
                           float x, float y, float z, float* out) {
    int ix = (int)std::floor(x), iy = (int)std::floor(y), iz = (int)std::floor(z);
    ix = std::min(std::max(ix, 0), X - 2);
    iy = std::min(std::max(iy, 0), Y - 2);
    iz = std::min(std::max(iz, 0), Z - 2);
    float fx = x - (float)ix, fy = y - (float)iy, fz = z - (float)iz;
    const float gx = 1.f - fx, gy = 1.f - fy, gz = 1.f - fz;
    const float w[8] = {gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
                        fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz};
    const long sx = (long)Y * Z * C, sy = (long)Z * C, sz = C;
    const float* base = f + (long)ix * sx + (long)iy * sy + (long)iz * sz;
    for (int c = 0; c < C; ++c) out[c] = 0.f;
    int o = 0;
    for (int dx = 0; dx <= 1; ++dx)
        for (int dy = 0; dy <= 1; ++dy)
            for (int dz = 0; dz <= 1; ++dz, ++o) {
                const float* p = base + dx * sx + dy * sy + dz * sz;
                for (int c = 0; c < C; ++c) out[c] += w[o] * p[c];
            }
}

// Float eikonal march over a packed (X, Y, Z, 4) field.  Per-ray state is
// updated in place; iters[i] returns executed steps.  Semantics identical
// to ops/march.py _float_step with opaque_when_positive=true, nearest=false
// (which itself mirrors trace_ray_function, cuda_volume_raytracer.cu:
// 335-349: interp, break on opacity channel > 0, bend, inverse-speed step).
void vrt_march_float(const float* packed, int X, int Y, int Z,
                     float* pos, float* dir, uint32_t* iters, int n_rays,
                     uint32_t budget, const float* bend, const float* step_scale,
                     int nthreads) {
#if defined(_OPENMP)
    if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel for schedule(dynamic, 64)
#endif
    for (int i = 0; i < n_rays; ++i) {
        float px = pos[3 * i], py = pos[3 * i + 1], pz = pos[3 * i + 2];
        float dx = dir[3 * i], dy = dir[3 * i + 1], dz = dir[3 * i + 2];
        // budget-1: the reference consumes one slot for the start path
        // entry (cuda_volume_raytracer.cu:333)
        uint32_t remaining = budget > 0 ? budget - 1 : 0;
        float interp[4];
        while (remaining > 0 &&
               px >= 0.f && px < (float)(X - 1) &&
               py >= 0.f && py < (float)(Y - 1) &&
               pz >= 0.f && pz < (float)(Z - 1)) {
            interp4(packed, X, Y, Z, 4, px, py, pz, interp);
            if (interp[3] > 0.f) break;  // opaque-surface hit (.cu:343)
            dx += interp[0] * bend[0];
            dy += interp[1] * bend[1];
            dz += interp[2] * bend[2];
            const float ilen = 1.0f / (dx * dx + dy * dy + dz * dz);
            px += dx * step_scale[0] * ilen;
            py += dy * step_scale[1] * ilen;
            pz += dz * step_scale[2] * ilen;
            --remaining;
        }
        pos[3 * i] = px; pos[3 * i + 1] = py; pos[3 * i + 2] = pz;
        dir[3 * i] = dx; dir[3 * i + 1] = dy; dir[3 * i + 2] = dz;
        iters[i] = budget - remaining;
    }
}

// Damped Jacobi harmonic solve on an N-D grid flattened to (n, ) with
// row-major strides; edge weight 1/(1+dd²) (≙ solve_harmonic.cpp:54-62).
// values/divisor/fixed are length n; dims/strides length ndim.  Returns the
// number of sweeps executed.
int vrt_solve_harmonic(double* values, const double* divisor,
                       const uint8_t* fixed_mask, const int64_t* dims,
                       int ndim, int64_t n, int max_iterations,
                       double max_error, int nthreads) {
#if defined(_OPENMP)
    if (nthreads > 0) omp_set_num_threads(nthreads);
#endif
    int64_t strides[8];
    strides[ndim - 1] = 1;
    for (int a = ndim - 2; a >= 0; --a) strides[a] = strides[a + 1] * dims[a + 1];
    double* next = new double[n];
    int it = 0;
    for (; it < max_iterations; ++it) {
        double err = 0.0;
#if defined(_OPENMP)
#pragma omp parallel for reduction(+ : err) schedule(static)
#endif
        for (int64_t idx = 0; idx < n; ++idx) {
            if (fixed_mask[idx]) { next[idx] = values[idx]; continue; }
            double acc = 0.0, wsum = 0.0;
            int64_t rem = idx;
            for (int a = 0; a < ndim; ++a) {
                const int64_t coord = rem / strides[a];
                rem %= strides[a];
                if (coord > 0) {
                    const int64_t j = idx - strides[a];
                    const double dd = divisor[idx] - divisor[j];
                    const double w = 1.0 / (1.0 + dd * dd);
                    acc += w * values[j]; wsum += w;
                }
                if (coord < dims[a] - 1) {
                    const int64_t j = idx + strides[a];
                    const double dd = divisor[idx] - divisor[j];
                    const double w = 1.0 / (1.0 + dd * dd);
                    acc += w * values[j]; wsum += w;
                }
            }
            if (wsum <= 0.0) { next[idx] = values[idx]; continue; }
            // damped update: average with the middle value
            // (erg += add_middle; erg /= div_sum * 2, solve_harmonic.cpp:89-97)
            const double add_middle = wsum * values[idx];
            const double v = (acc + add_middle) / (2.0 * wsum);
            const double d = v - add_middle;  // reference error metric (:101-104)
            err += d * d;
            next[idx] = v;
        }
        std::memcpy(values, next, (size_t)n * sizeof(double));
        if (err < max_error) { ++it; break; }
    }
    delete[] next;
    return it;
}

// SoA -> AoS ray packing (≙ fill_struct, cuda_volume_raytracer.cu:468-488):
// out[i] = {pos[3], dir[3], brightness, iterations} as 8 floats/uints.
void vrt_pack_rays(const float* pos, const float* dir,
                   const uint32_t* brightness, const uint32_t* iterations,
                   int n, float* out) {
    for (int i = 0; i < n; ++i) {
        float* o = out + 8 * i;
        std::memcpy(o, pos + 3 * i, 3 * sizeof(float));
        std::memcpy(o + 3, dir + 3 * i, 3 * sizeof(float));
        std::memcpy(o + 6, brightness + i, sizeof(uint32_t));
        std::memcpy(o + 7, iterations + i, sizeof(uint32_t));
    }
}

// AoS -> SoA (≙ read_struct, cuda_volume_raytracer.cu:490-516)
void vrt_unpack_rays(const float* in, int n, float* pos, float* dir,
                     uint32_t* brightness, uint32_t* iterations) {
    for (int i = 0; i < n; ++i) {
        const float* o = in + 8 * i;
        std::memcpy(pos + 3 * i, o, 3 * sizeof(float));
        std::memcpy(dir + 3 * i, o + 3, 3 * sizeof(float));
        std::memcpy(brightness + i, o + 6, sizeof(uint32_t));
        std::memcpy(iterations + i, o + 7, sizeof(uint32_t));
    }
}

}  // extern "C"
