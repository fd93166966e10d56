// Native scene-compilation kernels (C++/OpenMP).
//
// Role: the host-side geometry baking that MetaDrive delegates to Bullet's
// C++ raycaster (SURVEY.md §2.4) — here run once per scene at compile time
// to produce the static-lidar distance field consumed by the jitted engine.
// The numpy fallback in envs/geometry.py computes the same field ~20-50x
// slower; this kernel makes dense fields (0.5 m cells, 144+ angles) cheap.
//
// Built either via setup.py (setuptools Extension) or directly:
//   g++ -O3 -march=native -fopenmp -shared -fPIC scenebake.cpp -o _scenebake.so

#include <cmath>
#include <cstdint>

extern "C" {

// walls: (num_walls, 4) float32 [x1,y1,x2,y2]
// out:   (H, W, A) float32 — min ray distance per cell center per angle,
//        capped at max_dist. Cell centers at (xmin+(j+.5)*cell, ymin+(i+.5)*cell);
//        angle a = 2*pi*k/A.
void bake_lidar_field(const float* walls, int num_walls,
                      float xmin, float ymin, float cell,
                      int H, int W, int A, float max_dist,
                      float* out) {
    // Precompute per-wall data.
    float* px = new float[num_walls];
    float* py = new float[num_walls];
    float* ex = new float[num_walls];
    float* ey = new float[num_walls];
    for (int w = 0; w < num_walls; ++w) {
        px[w] = walls[4 * w + 0];
        py[w] = walls[4 * w + 1];
        ex[w] = walls[4 * w + 2] - px[w];
        ey[w] = walls[4 * w + 3] - py[w];
    }
    float* dx = new float[A];
    float* dy = new float[A];
    for (int a = 0; a < A; ++a) {
        double ang = 2.0 * M_PI * a / A;
        dx[a] = (float)std::cos(ang);
        dy[a] = (float)std::sin(ang);
    }

#pragma omp parallel for schedule(static)
    for (int i = 0; i < H; ++i) {
        float oy = ymin + (i + 0.5f) * cell;
        for (int j = 0; j < W; ++j) {
            float ox = xmin + (j + 0.5f) * cell;
            float* row = out + ((size_t)i * W + j) * A;
            for (int a = 0; a < A; ++a) {
                float best = max_dist;
                float ddx = dx[a], ddy = dy[a];
                for (int w = 0; w < num_walls; ++w) {
                    float pox = px[w] - ox;
                    float poy = py[w] - oy;
                    float denom = ddx * ey[w] - ddy * ex[w];
                    if (std::fabs(denom) < 1e-9f) continue;
                    float inv = 1.0f / denom;
                    float t = (pox * ey[w] - poy * ex[w]) * inv;
                    if (t < 0.0f || t >= best) continue;
                    float u = (pox * ddy - poy * ddx) * inv;
                    if (u < 0.0f || u > 1.0f) continue;
                    best = t;
                }
                row[a] = best;
            }
        }
    }
    delete[] px; delete[] py; delete[] ex; delete[] ey;
    delete[] dx; delete[] dy;
}

// Batched min ray->segment distances for arbitrary origin/angle pairs
// (used by tests to cross-check the field and by future host tooling).
void ray_distances(const float* walls, int num_walls,
                   const float* origins, int num_origins,  // (C,2)
                   const float* angles, int num_angles,    // (A,)
                   float max_dist, float* out) {           // (C,A)
#pragma omp parallel for schedule(static)
    for (int c = 0; c < num_origins; ++c) {
        float ox = origins[2 * c], oy = origins[2 * c + 1];
        for (int a = 0; a < num_angles; ++a) {
            float ddx = std::cos(angles[a]);
            float ddy = std::sin(angles[a]);
            float best = max_dist;
            for (int w = 0; w < num_walls; ++w) {
                float pox = walls[4 * w] - ox;
                float poy = walls[4 * w + 1] - oy;
                float ex = walls[4 * w + 2] - walls[4 * w];
                float ey = walls[4 * w + 3] - walls[4 * w + 1];
                float denom = ddx * ey - ddy * ex;
                if (std::fabs(denom) < 1e-9f) continue;
                float inv = 1.0f / denom;
                float t = (pox * ey - poy * ex) * inv;
                if (t < 0.0f || t >= best) continue;
                float u = (pox * ddy - poy * ddx) * inv;
                if (u < 0.0f || u > 1.0f) continue;
                best = t;
            }
            out[(size_t)c * num_angles + a] = best;
        }
    }
}

}  // extern "C"
