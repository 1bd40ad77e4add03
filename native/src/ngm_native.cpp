// Native host-side geometry kernels for neural_graph_mapping_tpu.
//
// TPU-native replacements for the reference's native deps:
//  - marching_tetrahedra: isosurface extraction from a density block
//    (replaces pytorch3d.ops.marching_cubes, reference run_mapping.py:2294).
//    Marching tetrahedra (6 tets per cube) instead of marching cubes: tiny
//    exact case tables, no ambiguous configurations, watertight output.
//  - rasterize_depth: double-sided z-buffer depth rasterization of a mesh
//    from a pinhole camera (replaces pyrender/EGL offscreen rendering in
//    reference mesh_culling.py:41-120) for occlusion culling.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libngm_native.so ngm_native.cpp
// Consumed via ctypes (neural_graph_mapping_tpu/ops/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// The 6-tetrahedra decomposition of a cube. Cube corners indexed 0..7 with
// corner c at offset ((c>>2)&1, (c>>1)&1, c&1) in (x, y, z).
static const int TETS[6][4] = {
    {0, 5, 1, 3}, {0, 5, 3, 7}, {0, 5, 7, 4},
    {0, 7, 3, 2}, {0, 7, 2, 6}, {0, 7, 6, 4},
};

struct EdgeKey {
    int64_t a, b;
    bool operator==(const EdgeKey& o) const { return a == o.a && b == o.b; }
};
struct EdgeKeyHash {
    size_t operator()(const EdgeKey& k) const {
        return std::hash<int64_t>()(k.a * 1000003 ^ k.b);
    }
};

}  // namespace

extern "C" {

// Extract the isosurface `grid == iso` from an (nx, ny, nz) float grid laid
// out x-major (index = (x*ny + y)*nz + z). Vertices are emitted in grid
// coordinates (continuous indices). Returns 0 on success, 1 on overflow of
// the provided buffers. Counts are written to n_verts_out / n_tris_out.
int marching_tetrahedra(const float* grid, int nx, int ny, int nz, float iso,
                        float* verts_out, int max_verts, int* tris_out,
                        int max_tris, int* n_verts_out, int* n_tris_out) {
    std::unordered_map<EdgeKey, int, EdgeKeyHash> edge_to_vertex;
    int n_verts = 0, n_tris = 0;

    auto gidx = [&](int x, int y, int z) -> int64_t {
        return (static_cast<int64_t>(x) * ny + y) * nz + z;
    };

    auto interp_vertex = [&](int64_t ia, int64_t ib, float va, float vb) -> int {
        EdgeKey key{ia < ib ? ia : ib, ia < ib ? ib : ia};
        auto it = edge_to_vertex.find(key);
        if (it != edge_to_vertex.end()) return it->second;
        if (n_verts >= max_verts) return -1;
        float t = (iso - va) / (vb - va + 1e-30f);
        if (t < 0.f) t = 0.f;
        if (t > 1.f) t = 1.f;
        // decode grid coords from linear indices
        int az = static_cast<int>(ia % nz), ay = static_cast<int>((ia / nz) % ny),
            ax = static_cast<int>(ia / (static_cast<int64_t>(ny) * nz));
        int bz = static_cast<int>(ib % nz), by = static_cast<int>((ib / nz) % ny),
            bx = static_cast<int>(ib / (static_cast<int64_t>(ny) * nz));
        verts_out[3 * n_verts + 0] = ax + t * (bx - ax);
        verts_out[3 * n_verts + 1] = ay + t * (by - ay);
        verts_out[3 * n_verts + 2] = az + t * (bz - az);
        edge_to_vertex.emplace(key, n_verts);
        return n_verts++;
    };

    auto emit_tri = [&](int a, int b, int c) -> bool {
        if (a < 0 || b < 0 || c < 0) return false;
        if (n_tris >= max_tris) return false;
        tris_out[3 * n_tris + 0] = a;
        tris_out[3 * n_tris + 1] = b;
        tris_out[3 * n_tris + 2] = c;
        ++n_tris;
        return true;
    };

    bool overflow = false;
    for (int x = 0; x + 1 < nx && !overflow; ++x) {
        for (int y = 0; y + 1 < ny && !overflow; ++y) {
            for (int z = 0; z + 1 < nz; ++z) {
                int64_t corner_idx[8];
                float corner_val[8];
                bool any_below = false, any_above = false;
                for (int c = 0; c < 8; ++c) {
                    int cx = x + ((c >> 2) & 1);
                    int cy = y + ((c >> 1) & 1);
                    int cz = z + (c & 1);
                    corner_idx[c] = gidx(cx, cy, cz);
                    corner_val[c] = grid[corner_idx[c]];
                    (corner_val[c] < iso ? any_below : any_above) = true;
                }
                if (!any_below || !any_above) continue;

                for (const auto& tet : TETS) {
                    int inside_mask = 0;
                    for (int v = 0; v < 4; ++v)
                        if (corner_val[tet[v]] < iso) inside_mask |= 1 << v;
                    if (inside_mask == 0 || inside_mask == 15) continue;

                    // collect crossing edges of the tetrahedron
                    int vids[4];
                    int nv = 0;
                    static const int TET_EDGES[6][2] = {
                        {0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
                    // order edges so the emitted fan is consistent per case
                    int count_inside = __builtin_popcount(inside_mask);
                    for (const auto& e : TET_EDGES) {
                        bool ia = (inside_mask >> e[0]) & 1;
                        bool ib = (inside_mask >> e[1]) & 1;
                        if (ia == ib) continue;
                        int va = tet[e[0]], vb = tet[e[1]];
                        vids[nv++] = interp_vertex(corner_idx[va], corner_idx[vb],
                                                   corner_val[va], corner_val[vb]);
                    }
                    bool ok = true;
                    if (count_inside == 1 || count_inside == 3) {
                        // single triangle
                        ok = emit_tri(vids[0], vids[1], vids[2]);
                    } else {  // 2 inside: quad -> two triangles.
                        // Edge enumeration order for the 2-in cases yields a
                        // "Z" ordering; (0,1,3) + (0,3,2) forms the quad.
                        ok = emit_tri(vids[0], vids[1], vids[3]) &&
                             emit_tri(vids[0], vids[3], vids[2]);
                    }
                    if (!ok) {
                        overflow = true;
                        break;
                    }
                }
                if (overflow) break;
            }
        }
    }
    *n_verts_out = n_verts;
    *n_tris_out = n_tris;
    return overflow ? 1 : 0;
}

// Depth-only rasterization (double-sided) of a triangle mesh into a z-buffer.
// Camera: OpenCV pinhole (x right, y down, z forward), pose given as w2c 4x4
// row-major. Pixels with no surface keep depth 0. Used for occlusion culling
// (reference mesh_culling.py:41-120 renders with pyrender/EGL).
void rasterize_depth(const float* verts, int n_verts, const int32_t* tris,
                     int n_tris, const float* w2c, float fx, float fy, float cx,
                     float cy, int width, int height, float* depth_out) {
    std::vector<float> cam(3 * static_cast<size_t>(n_verts));
    for (int i = 0; i < n_verts; ++i) {
        const float* p = verts + 3 * i;
        for (int r = 0; r < 3; ++r) {
            cam[3 * i + r] = w2c[4 * r + 0] * p[0] + w2c[4 * r + 1] * p[1] +
                             w2c[4 * r + 2] * p[2] + w2c[4 * r + 3];
        }
    }
    std::fill(depth_out, depth_out + static_cast<size_t>(width) * height, 0.0f);
    std::vector<float> zbuf(static_cast<size_t>(width) * height, 1e30f);

    for (int t = 0; t < n_tris; ++t) {
        const float* a = &cam[3 * tris[3 * t + 0]];
        const float* b = &cam[3 * tris[3 * t + 1]];
        const float* c = &cam[3 * tris[3 * t + 2]];
        if (a[2] <= 1e-6f || b[2] <= 1e-6f || c[2] <= 1e-6f) continue;  // clip

        float ax = fx * a[0] / a[2] + cx, ay = fy * a[1] / a[2] + cy;
        float bx = fx * b[0] / b[2] + cx, by = fy * b[1] / b[2] + cy;
        float cxp = fx * c[0] / c[2] + cx, cyp = fy * c[1] / c[2] + cy;

        int min_x = static_cast<int>(std::floor(std::fmin(ax, std::fmin(bx, cxp))));
        int max_x = static_cast<int>(std::ceil(std::fmax(ax, std::fmax(bx, cxp))));
        int min_y = static_cast<int>(std::floor(std::fmin(ay, std::fmin(by, cyp))));
        int max_y = static_cast<int>(std::ceil(std::fmax(ay, std::fmax(by, cyp))));
        if (min_x < 0) min_x = 0;
        if (min_y < 0) min_y = 0;
        if (max_x >= width) max_x = width - 1;
        if (max_y >= height) max_y = height - 1;
        if (min_x > max_x || min_y > max_y) continue;

        float denom = (by - cyp) * (ax - cxp) + (cxp - bx) * (ay - cyp);
        if (std::fabs(denom) < 1e-12f) continue;
        float inv_za = 1.0f / a[2], inv_zb = 1.0f / b[2], inv_zc = 1.0f / c[2];

        for (int py = min_y; py <= max_y; ++py) {
            for (int px = min_x; px <= max_x; ++px) {
                float sx = px + 0.5f, sy = py + 0.5f;
                float w0 = ((by - cyp) * (sx - cxp) + (cxp - bx) * (sy - cyp)) / denom;
                float w1 = ((cyp - ay) * (sx - cxp) + (ax - cxp) * (sy - cyp)) / denom;
                float w2 = 1.0f - w0 - w1;
                // double-sided: denom sign normalizes winding so positive
                // barycentrics cover both orientations. Small negative
                // tolerance so pixel centers exactly on shared edges are not
                // rejected by both neighbors (pinholes).
                const float kEdgeEps = -1e-5f;
                if (w0 < kEdgeEps || w1 < kEdgeEps || w2 < kEdgeEps) continue;
                float inv_z = w0 * inv_za + w1 * inv_zb + w2 * inv_zc;
                float z = 1.0f / inv_z;
                size_t idx = static_cast<size_t>(py) * width + px;
                if (z < zbuf[idx]) {
                    zbuf[idx] = z;
                    depth_out[idx] = z;
                }
            }
        }
    }
}

}  // extern "C"
