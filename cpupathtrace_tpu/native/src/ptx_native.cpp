// Native runtime components for cpupathtrace_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library provides the
// host-side runtime pieces that the C++ reference also implements natively
// and that dominate scene-build time for multi-million-triangle meshes:
//
//   * ptx_build_bvh  — flat-array BVH construction with the reference's
//     policy (median split on box minima, split axis minimizing summed
//     child surface area, left<=2*right rebalance; behavioral spec:
//     reference src/scene/scene.cpp:12-102) — same tree as the Python
//     builder in accel/build.py, ~50x faster.
//   * ptx_parse_obj  — OBJ v/f parser with the reference's tolerant
//     semantics (spec: reference src/scene/mesh.cpp:11-271).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
#include <algorithm>
#include <atomic>
#include <cctype>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// BVH builder
// ---------------------------------------------------------------------------
// prim_lo/prim_hi: [n,3] float32 primitive bounds.
// Outputs (caller-allocated, capacity 2n-1 nodes):
//   lo/hi: [2n-1,3] f32, left/right/prim: [2n-1] i32.
// Returns node count; *out_depth receives the max depth (root = 1).
int ptx_build_bvh(const float* prim_lo, const float* prim_hi, int n,
                  float* lo, float* hi, int32_t* left, int32_t* right,
                  int32_t* prim, int32_t* out_depth) {
    if (n <= 0) return 0;

    struct Task { int node; int begin; int end; int depth; };

    std::vector<int32_t> idx(n);
    for (int i = 0; i < n; i++) idx[i] = i;
    std::vector<float> axmin(n);  // scratch for the active range's minima

    int next_node = 0;
    int max_depth = 0;
    std::vector<Task> stack;
    stack.push_back({next_node++, 0, n, 1});

    while (!stack.empty()) {
        Task t = stack.back();
        stack.pop_back();
        max_depth = std::max(max_depth, t.depth);
        const int k = t.end - t.begin;

        // Node bounds over the range.
        float blo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
        float bhi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        for (int i = t.begin; i < t.end; i++) {
            const float* l = prim_lo + 3 * idx[i];
            const float* h = prim_hi + 3 * idx[i];
            for (int a = 0; a < 3; a++) {
                blo[a] = std::min(blo[a], l[a]);
                bhi[a] = std::max(bhi[a], h[a]);
            }
        }
        std::memcpy(lo + 3 * t.node, blo, sizeof blo);
        std::memcpy(hi + 3 * t.node, bhi, sizeof bhi);

        if (k == 1) {
            prim[t.node] = idx[t.begin];
            left[t.node] = right[t.node] = -1;
            continue;
        }
        prim[t.node] = -1;

        // Median of box minima per axis ((k/2-1)-th order statistic,
        // reference nth_element policy), then pick the axis whose
        // low<=median partition minimizes summed child surface areas.
        double best_cost = 0.0;
        int best_axis = -1;
        float best_median = 0.0f;
        for (int axis = 0; axis < 3; axis++) {
            for (int i = 0; i < k; i++)
                axmin[i] = prim_lo[3 * idx[t.begin + i] + axis];
            const int m_pos = std::max(k / 2 - 1, 0);
            std::nth_element(axmin.begin(), axmin.begin() + m_pos,
                             axmin.begin() + k);
            const float median = axmin[m_pos];

            float l_lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
            float l_hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
            float r_lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
            float r_hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
            int n_l = 0;
            for (int i = t.begin; i < t.end; i++) {
                const float* l = prim_lo + 3 * idx[i];
                const float* h = prim_hi + 3 * idx[i];
                const bool go_left = l[axis] <= median;
                float* tlo = go_left ? l_lo : r_lo;
                float* thi = go_left ? l_hi : r_hi;
                for (int a = 0; a < 3; a++) {
                    tlo[a] = std::min(tlo[a], l[a]);
                    thi[a] = std::max(thi[a], h[a]);
                }
                n_l += go_left;
            }
            double cost;
            if (n_l == 0 || n_l == k) {
                cost = HUGE_VAL;  // degenerate split; avoid
            } else {
                const double dl0 = l_hi[0] - l_lo[0], dl1 = l_hi[1] - l_lo[1],
                             dl2 = l_hi[2] - l_lo[2];
                const double dr0 = r_hi[0] - r_lo[0], dr1 = r_hi[1] - r_lo[1],
                             dr2 = r_hi[2] - r_lo[2];
                cost = 2.0 * (dl0 * dl1 + dl1 * dl2 + dl0 * dl2) +
                       2.0 * (dr0 * dr1 + dr1 * dr2 + dr0 * dr2);
            }
            if (best_axis < 0 || cost < best_cost) {
                best_cost = cost;
                best_axis = axis;
                best_median = median;
            }
        }

        // Stable partition by low[axis] <= median (reference stable_partition).
        std::stable_partition(
            idx.begin() + t.begin, idx.begin() + t.end,
            [&](int32_t p) { return prim_lo[3 * p + best_axis] <= best_median; });
        int n_left = 0;
        for (int i = t.begin; i < t.end; i++)
            n_left += prim_lo[3 * idx[i] + best_axis] <= best_median;

        // n_left >= 1 always (the median is one of the lows); n_left == k
        // is handled by the rebalance below, exactly like the Python path.

        // Rebalance: move trailing-left entries right until left <= 2*right.
        // Exactly replicates the Python builder (accel/build.py:112-119):
        // the moved block is appended at the END of the right range,
        // reversed.
        int move = 0;
        while (n_left - move > 1 &&
               (n_left - move) > 2 * ((k - n_left) + move))
            move++;
        if (move) {
            auto s = idx.begin() + t.begin + n_left - move;
            auto m = idx.begin() + t.begin + n_left;
            auto e = idx.begin() + t.end;
            std::rotate(s, m, e);           // block now at the end, in order
            std::reverse(e - move, e);      // ... reversed, like Python
            n_left -= move;
        }

        const int cl = next_node++;
        const int cr = next_node++;
        left[t.node] = cl;
        right[t.node] = cr;
        stack.push_back({cr, t.begin + n_left, t.end, t.depth + 1});
        stack.push_back({cl, t.begin, t.begin + n_left, t.depth + 1});
    }

    *out_depth = max_depth;
    return next_node;
}

// ---------------------------------------------------------------------------
// OBJ parser
// ---------------------------------------------------------------------------
// Parses `v`/`f` records from text[0..len). Face tokens keep only the
// position index before any '/'. Outputs are caller-allocated with
// capacities n_verts_cap*3 and n_faces_cap*3 obtained from ptx_count_obj.
// Unparseable floats become NaN; unparseable/short faces get index -1
// (the Python layer then applies the reference's face-validation rules).
void ptx_count_obj(const char* text, int64_t len, int64_t* n_verts,
                   int64_t* n_faces) {
    int64_t v = 0, f = 0;
    int64_t i = 0;
    while (i < len) {
        while (i < len && text[i] == ' ') i++;
        if (i + 1 < len && text[i + 1] == ' ') {
            if (text[i] == 'v') v++;
            else if (text[i] == 'f') f++;
        }
        while (i < len && text[i] != '\n') i++;
        i++;
    }
    *n_verts = v;
    *n_faces = f;
}

// Space-only skip: MUST match ptx_count_obj's whitespace predicate (and the
// reference's space-only eatSpace, ref: src/scene/mesh.cpp:31-36) so the
// count pass and the parse pass agree on which lines are records. A tab- or
// CR-indented line is neither counted nor parsed.
static inline const char* skip_spaces(const char* p, const char* end) {
    while (p < end && *p == ' ') p++;
    return p;
}

void ptx_parse_obj(const char* text, int64_t len, float* verts,
                   int64_t n_verts_cap, int64_t* faces, int64_t n_faces_cap) {
    const char* p = text;
    const char* end = text + len;
    int64_t vi = 0, fi = 0;
    while (p < end) {
        const char* line_end = static_cast<const char*>(
            memchr(p, '\n', static_cast<size_t>(end - p)));
        if (!line_end) line_end = end;
        const char* q = skip_spaces(p, line_end);
        if (q + 1 < line_end && q[1] == ' ') {
            // Defense in depth: never write past the counted capacities even
            // if the two passes ever disagree again.
            if (*q == 'v' && vi >= n_verts_cap) {
            } else if (*q == 'f' && fi >= n_faces_cap) {
            } else if (*q == 'v') {
                q += 2;
                for (int c = 0; c < 3; c++) {
                    q = skip_spaces(q, line_end);
                    char* after = nullptr;
                    float val = strtof(q, &after);
                    if (after == q || after > line_end) {
                        val = NAN;
                        while (q < line_end && *q != ' ') q++;
                    } else {
                        q = after;
                    }
                    verts[3 * vi + c] = val;
                }
                vi++;
            } else if (*q == 'f') {
                q += 2;
                for (int c = 0; c < 3; c++) {
                    q = skip_spaces(q, line_end);
                    char* after = nullptr;
                    long val = strtol(q, &after, 10);
                    if (after == q || after > line_end) {
                        val = 0;  // becomes -1 after the 1-based shift
                        while (q < line_end && *q != ' ' && *q != '/') q++;
                    } else {
                        q = after;
                    }
                    // Skip texture/normal refs: a/b/c -> a.
                    while (q < line_end && *q != ' ') q++;
                    faces[3 * fi + c] = val - 1;
                }
                fi++;
            }
        }
        p = line_end + 1;
    }
}

}  // extern "C"
