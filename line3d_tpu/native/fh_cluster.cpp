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

#include <cstdint>
#include <vector>

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

}  // extern "C"
