// Gather-scatter setup: global node numbering by quantized-coordinate dedup.
//
// Native (C++) equivalent of the *setup* phase of Nek5000's gslib
// gather-scatter library (the C component of the reference's compute core,
// SURVEY.md section 2.2: "Gather-scatter dssum/dsavg + multiplicity vmult").
// The runtime exchange itself is an XLA segment-sum + psum on device
// (ops/core.py dssum); what the device cannot do cheaply is the one-time
// host-side construction of the global numbering for large 3-D meshes —
// numpy's lexicographic np.unique is O(N log N) with large constants, this
// hash-map pass is O(N) and ~10x faster at 10^7 nodes.
//
// Exposed via ctypes (no pybind11 in the image): plain C ABI.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Key3 {
    int64_t a, b, c;
    bool operator==(const Key3 &o) const { return a == o.a && b == o.b && c == o.c; }
};

struct Key3Hash {
    size_t operator()(const Key3 &k) const {
        // splitmix64-style mixing of the three coordinates
        uint64_t h = 0x9e3779b97f4a7c15ULL;
        for (uint64_t v : {(uint64_t)k.a, (uint64_t)k.b, (uint64_t)k.c}) {
            v += h;
            v = (v ^ (v >> 30)) * 0xbf58476d1ce4e5b9ULL;
            v = (v ^ (v >> 27)) * 0x94d049bb133111ebULL;
            h = v ^ (v >> 31);
        }
        return (size_t)h;
    }
};

}  // namespace

extern "C" {

// keys: (nkeys, nd) row-major int64 quantized coordinates (nd <= 3).
// gid:  out, nkeys int32 global ids (first-occurrence order, deterministic).
// counts: out, nkeys int32 — multiplicity per *global id* is written to the
//         first nglobal entries.
// returns nglobal (number of distinct keys), or -1 on bad input.
int64_t gs_number(const int64_t *keys, int64_t nkeys, int32_t nd,
                  int32_t *gid, int32_t *counts) {
    if (nd < 1 || nd > 3 || nkeys < 0) return -1;
    std::unordered_map<Key3, int32_t, Key3Hash> map;
    map.reserve((size_t)(nkeys * 13 / 10) + 16);
    std::vector<int32_t> mult;
    mult.reserve((size_t)nkeys / 4 + 16);

    int32_t next = 0;
    for (int64_t i = 0; i < nkeys; ++i) {
        Key3 k{keys[i * nd], nd > 1 ? keys[i * nd + 1] : 0,
               nd > 2 ? keys[i * nd + 2] : 0};
        auto it = map.find(k);
        if (it == map.end()) {
            map.emplace(k, next);
            gid[i] = next;
            mult.push_back(1);
            ++next;
        } else {
            gid[i] = it->second;
            ++mult[(size_t)it->second];
        }
    }
    std::memcpy(counts, mult.data(), mult.size() * sizeof(int32_t));
    return (int64_t)next;
}

}  // extern "C"
