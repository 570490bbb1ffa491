// Native track-graph builder: disjoint-set union over feature match edges.
//
// This is the framework's native runtime piece for the host-side data path —
// the analog of the reference's C++ track construction
// (src/mve/sfm/bundler_tracks.cc:24-118, src/matching/matching.cpp:233-283).
// Device code (JAX/XLA) handles all numeric work; this handles the irregular
// pointer-chasing the host does between device stages, where Python loops
// would dominate the wall clock on large match sets.
//
// Build: g++ -O3 -shared -fPIC -o libtrackgraph.so trackgraph.cpp
// Plain C ABI, consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <vector>

namespace {

struct DSU {
    std::vector<int64_t> parent;
    explicit DSU(int64_t n) : parent(n) {
        for (int64_t i = 0; i < n; ++i) parent[i] = i;
    }
    int64_t find(int64_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];  // path halving
            x = parent[x];
        }
        return x;
    }
    void unite(int64_t a, int64_t b) {
        int64_t ra = find(a), rb = find(b);
        if (ra != rb) parent[rb] = ra;
    }
};

}  // namespace

extern "C" {

// Union all m edges (ea[i], eb[i]) over n nodes; writes the fully-compressed
// root of every node into out_root (length n).
void osfm_union_find(const int64_t* ea, const int64_t* eb, int64_t m,
                     int64_t n, int64_t* out_root) {
    DSU dsu(n);
    for (int64_t i = 0; i < m; ++i) dsu.unite(ea[i], eb[i]);
    for (int64_t i = 0; i < n; ++i) out_root[i] = dsu.find(i);
}

// Merge-by-key accumulation used for pairwise-track merging: given sorted
// (key, value) pairs, writes segment start offsets. Kept minimal; heavier
// aggregation stays in vectorized NumPy.
int64_t osfm_version() { return 1; }

}  // extern "C"
