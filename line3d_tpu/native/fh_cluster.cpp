// Native runtime kernels for line3d_tpu: the inherently-sequential host-side
// stages that the reference also runs natively (C++), exposed through a plain
// C ABI for ctypes.
//
// fh_cluster: Felzenszwalb-Huttenlocher graph clustering with the exact merge
// semantics of the reference (clustering.cc:6-47, universe.h:60-115).  The
// caller passes edges pre-sorted ascending by weight (stable).
//
// sweep_events: the open/close camera-count sweep of projectToLine
// (line3D.cc:1554-1596) for one cluster; events pre-sorted by distance.

#include <cmath>
#include <cstdint>
#include <vector>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

extern "C" {

struct UF {
    std::vector<int64_t> parent;
    std::vector<int32_t> rank;
    std::vector<int64_t> size;
    explicit UF(int64_t n) : parent(n), rank(n, 0), size(n, 1) {
        for (int64_t i = 0; i < n; ++i) parent[i] = i;
    }
    int64_t find(int64_t x) {
        int64_t root = x;
        while (parent[root] != root) root = parent[root];
        parent[x] = root;  // single-node compression, as the reference does
        return root;
    }
    // returns new root
    int64_t join(int64_t a, int64_t b) {
        if (rank[a] > rank[b]) {
            parent[b] = a;
            size[a] += size[b];
            return a;
        }
        parent[a] = b;
        size[b] += size[a];
        if (rank[a] == rank[b]) rank[b] += 1;
        return b;
    }
};

void fh_cluster(const int64_t* edges_i, const int64_t* edges_j,
                const double* edges_w, int64_t num_edges,
                int64_t num_nodes, double c, int64_t* labels_out) {
    UF uf(num_nodes);
    std::vector<double> threshold(num_nodes, c);
    for (int64_t k = 0; k < num_edges; ++k) {
        int64_t a = uf.find(edges_i[k]);
        int64_t b = uf.find(edges_j[k]);
        if (a == b) continue;
        double w = edges_w[k];
        if (w <= threshold[a] && w <= threshold[b]) {
            int64_t root = uf.join(a, b);
            threshold[root] = w + c / static_cast<double>(uf.size[root]);
        }
    }
    for (int64_t i = 0; i < num_nodes; ++i) labels_out[i] = uf.find(i);
}

// Sweep over 2*n sorted endpoint events.  seg_id[e] identifies the member
// segment of event e, cam_id[e] its camera.  Emits up to n (start,end) event
// index pairs where the number of distinct open cameras is >= min_open.
// Returns the number of emitted sub-segments.
int64_t sweep_events(const int64_t* seg_id, const int64_t* cam_id,
                     int64_t num_events, int64_t min_open,
                     int64_t max_cam, int64_t* out_start, int64_t* out_end) {
    std::vector<int8_t> open_seg(num_events, 0);
    std::vector<int32_t> open_cam(max_cam + 1, 0);
    int64_t open_cams = 0;
    bool opened = false;
    int64_t current_start = -1;
    int64_t count = 0;
    for (int64_t e = 0; e < num_events; ++e) {
        int64_t s = seg_id[e];
        int64_t cam = cam_id[e];
        if (!open_seg[s]) {
            open_seg[s] = 1;
            if (open_cam[cam]++ == 0) ++open_cams;
        } else {
            open_seg[s] = 0;
            if (--open_cam[cam] == 0) --open_cams;
        }
        if (opened && open_cams < min_open) {
            out_start[count] = current_start;
            out_end[count] = e;
            ++count;
            opened = false;
        } else if (!opened && open_cams >= min_open) {
            current_start = e;
            opened = true;
        }
    }
    return count;
}

// Batched sweep: sweep_events over C clusters in one call.  Events of
// cluster c live at [cluster_ptr[c], cluster_ptr[c+1]); seg ids are local
// to the cluster (0..n_c-1).  Emits (start, end) event indices GLOBAL to
// the concatenated array plus the owning cluster id.  Returns the total
// number of sub-segments.
int64_t sweep_events_batched(const int64_t* seg_id, const int64_t* cam_id,
                             const int64_t* cluster_ptr, int64_t num_clusters,
                             int64_t min_open, int64_t max_cam,
                             int64_t* out_start, int64_t* out_end,
                             int64_t* out_cluster) {
    std::vector<int8_t> open_seg;
    std::vector<int32_t> open_cam(max_cam + 1, 0);
    int64_t count = 0;
    for (int64_t c = 0; c < num_clusters; ++c) {
        const int64_t lo = cluster_ptr[c], hi = cluster_ptr[c + 1];
        const int64_t n = hi - lo;
        if (static_cast<int64_t>(open_seg.size()) < n) open_seg.resize(n);
        for (int64_t i = 0; i < n; ++i) open_seg[i] = 0;
        int64_t open_cams = 0;
        bool opened = false;
        int64_t current_start = -1;
        for (int64_t e = lo; e < hi; ++e) {
            const int64_t s = seg_id[e];
            const int64_t cam = cam_id[e];
            if (!open_seg[s]) {
                open_seg[s] = 1;
                if (open_cam[cam]++ == 0) ++open_cams;
            } else {
                open_seg[s] = 0;
                if (--open_cam[cam] == 0) --open_cams;
            }
            if (opened && open_cams < min_open) {
                out_start[count] = current_start;
                out_end[count] = e;
                out_cluster[count] = c;
                ++count;
                opened = false;
            } else if (!opened && open_cams >= min_open) {
                current_start = e;
                opened = true;
            }
        }
        // reset touched cam counters for the next cluster
        for (int64_t e = lo; e < hi; ++e) open_cam[cam_id[e]] = 0;
    }
    return count;
}

// ---------------------------------------------------------------------
// Detection support: connected components over the pixel grid with a
// pairwise gradient-angle gate (the line-support regions of the vectorized
// LSD, detect/vectorized_lsd.py), plus per-component moment statistics and
// axis-extent reductions.  These are host-sequential-friendly (exactly like
// the reference's C++ LSD) and ~10x faster here than gather-based label
// propagation on an accelerator.

static inline double angle_diff(double a, double b) {
    double d = a - b;
    while (d > M_PI) d -= 2.0 * M_PI;
    while (d < -M_PI) d += 2.0 * M_PI;
    return d < 0 ? -d : d;
}

// 8-connected union-find CC where both pixels are defined and their angles
// agree within min(tol_a, tol_b).  Writes compact component ids (or -1) and
// returns the number of components.
int64_t grid_cc_compact(const float* angle, const uint8_t* defined,
                        const float* tol, int64_t H, int64_t W,
                        int32_t* labels_out) {
    const int64_t N = H * W;
    std::vector<int32_t> parent(N);
    for (int64_t i = 0; i < N; ++i) parent[i] = static_cast<int32_t>(i);

    struct Find {
        std::vector<int32_t>& p;
        int32_t operator()(int32_t x) {
            int32_t root = x;
            while (p[root] != root) root = p[root];
            while (p[x] != root) { int32_t nxt = p[x]; p[x] = root; x = nxt; }
            return root;
        }
    } find{parent};

    // forward neighbors: W, NW, N, NE (each undirected edge visited once)
    const int64_t dy[4] = {0, -1, -1, -1};
    const int64_t dx[4] = {-1, -1, 0, 1};
    for (int64_t y = 0; y < H; ++y) {
        for (int64_t x = 0; x < W; ++x) {
            const int64_t i = y * W + x;
            if (!defined[i]) continue;
            const double ai = angle[i];
            const double ti = tol[i];
            for (int k = 0; k < 4; ++k) {
                const int64_t ny = y + dy[k], nx = x + dx[k];
                if (ny < 0 || nx < 0 || nx >= W) continue;
                const int64_t j = ny * W + nx;
                if (!defined[j]) continue;
                const double t = ti < tol[j] ? ti : tol[j];
                if (angle_diff(ai, angle[j]) <= t) {
                    int32_t ra = find(static_cast<int32_t>(i));
                    int32_t rb = find(static_cast<int32_t>(j));
                    if (ra != rb) parent[rb] = ra;
                }
            }
        }
    }

    // compact ids
    std::vector<int32_t> compact(N, -1);
    int32_t next_id = 0;
    for (int64_t i = 0; i < N; ++i) {
        if (!defined[i]) { labels_out[i] = -1; continue; }
        int32_t r = find(static_cast<int32_t>(i));
        if (compact[r] < 0) compact[r] = next_id++;
        labels_out[i] = compact[r];
    }
    return next_id;
}

// per-component moments: count, sw, swx, swy, swxx, swyy, swxy, sca, ssa
// (region2rect/get_theta inputs).  out: [C x 9] doubles, zero-initialized
// by the caller.
void region_moments(const int32_t* labels, const float* w,
                    const float* angle, int64_t H, int64_t W,
                    double* out) {
    for (int64_t y = 0; y < H; ++y) {
        for (int64_t x = 0; x < W; ++x) {
            const int64_t i = y * W + x;
            const int32_t c = labels[i];
            if (c < 0) continue;
            double* o = out + static_cast<int64_t>(c) * 9;
            const double wi = w[i];
            const double fx = static_cast<double>(x);
            const double fy = static_cast<double>(y);
            o[0] += 1.0;
            o[1] += wi;
            o[2] += wi * fx;
            o[3] += wi * fy;
            o[4] += wi * fx * fx;
            o[5] += wi * fy * fy;
            o[6] += wi * fx * fy;
            o[7] += std::cos(static_cast<double>(angle[i]));
            o[8] += std::sin(static_cast<double>(angle[i]));
        }
    }
}

// per-component extents along (dx, dy) through (cx, cy):
// out [C x 4] = l_min, l_max, w_min, w_max; caller initializes to
// +inf/-inf/+inf/-inf.
void region_extents(const int32_t* labels, int64_t H, int64_t W,
                    const double* cx, const double* cy,
                    const double* dx, const double* dy,
                    double* out) {
    for (int64_t y = 0; y < H; ++y) {
        for (int64_t x = 0; x < W; ++x) {
            const int64_t i = y * W + x;
            const int32_t c = labels[i];
            if (c < 0) continue;
            const double rx = static_cast<double>(x) - cx[c];
            const double ry = static_cast<double>(y) - cy[c];
            const double l = rx * dx[c] + ry * dy[c];
            const double wd = -rx * dy[c] + ry * dx[c];
            double* o = out + static_cast<int64_t>(c) * 4;
            if (l < o[0]) o[0] = l;
            if (l > o[1]) o[1] = l;
            if (wd < o[2]) o[2] = wd;
            if (wd > o[3]) o[3] = wd;
        }
    }
}

}  // extern "C"
