// Native mdBG GFA writer: S lines, (k-1)-overlap edge enumeration with the
// four orientation cases, presimp filtering and deferred symmetric L lines.
//
// Semantics parity: /root/reference/src/main.rs:1006-1121 (see
// core/graph.py, whose Python implementation this replaces on the hot path;
// both are kept and tested against each other).  Overlap equality is tested
// on 128-bit fingerprints of the raw/reversed prefix & suffix vectors,
// supplied by the caller.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct U128 {
    uint64_t lo, hi;
    bool operator==(const U128& o) const { return lo == o.lo && hi == o.hi; }
};
struct U128Hash {
    size_t operator()(const U128& k) const {
        return k.lo ^ (k.hi * 0x9E3779B97F4A7C15ULL);
    }
};
struct PairHash {
    size_t operator()(const std::pair<uint32_t, uint32_t>& p) const {
        return ((uint64_t)p.first << 32 | p.second) * 0x9E3779B97F4A7C15ULL;
    }
};

}  // namespace

extern "C" {

// fp arrays are [n, 2] u64 (lo, hi): fs = F(suffix), fp_ = F(prefix),
// fsr = F(rev suffix), fpr = F(rev prefix), ksuf/kpre = normalized keys.
// Returns number of edges written, or -1 on error.
int64_t gfa_write(const char* path, int64_t n,
                  const uint32_t* index, const uint32_t* abundance,
                  const uint32_t* seqlen,
                  const uint16_t* shift0, const uint16_t* shift1,
                  const uint64_t* fs, const uint64_t* fp_,
                  const uint64_t* fsr, const uint64_t* fpr,
                  const uint64_t* ksuf, const uint64_t* kpre,
                  double presimp, int64_t* out_presimp_removed) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    std::string buf;
    buf.reserve(16 << 20);
    buf += "H\tVN:Z:1.0\n";
    char line[128];
    for (int64_t i = 0; i < n; i++) {
        snprintf(line, sizeof line, "S\t%u\t*\tLN:i:%u\tKC:i:%u\n",
                 index[i], seqlen[i], abundance[i]);
        buf += line;
        if (buf.size() > (8u << 20)) { fwrite(buf.data(), 1, buf.size(), f); buf.clear(); }
    }

    auto get = [](const uint64_t* a, int64_t i) {
        return U128{a[2 * i], a[2 * i + 1]};
    };

    std::unordered_map<U128, std::vector<uint32_t>, U128Hash> km_index;
    km_index.reserve(2 * n);
    for (int64_t i = 0; i < n; i++) {  // insertion order: pre then suf per node
        km_index[get(kpre, i)].push_back((uint32_t)i);
        km_index[get(ksuf, i)].push_back((uint32_t)i);
    }

    struct Edge { uint32_t a, b; char oa, ob; uint32_t ov; };
    std::vector<Edge> edges;
    std::unordered_set<std::pair<uint32_t, uint32_t>, PairHash> removed;
    int64_t presimp_removed = 0;
    int64_t nb_edges = 0;

    struct Pot { uint32_t j; char oa, ob; };
    std::vector<Pot> pot;
    for (int64_t i = 0; i < n; i++) {
        U128 fs1 = get(fs, i), fpr1 = get(fpr, i);
        U128 keys[2] = {get(ksuf, i), get(kpre, i)};
        for (int ki = 0; ki < 2; ki++) {
            auto it = km_index.find(keys[ki]);
            if (it == km_index.end()) continue;
            pot.clear();
            for (uint32_t j : it->second) {
                U128 fp2 = get(fp_, j), fsr2 = get(fsr, j);
                if (fs1 == fp2) pot.push_back({j, '+', '+'});
                if (fs1 == fsr2) pot.push_back({j, '+', '-'});
                if (fpr1 == fp2) pot.push_back({j, '-', '+'});
                if (fpr1 == fsr2) pot.push_back({j, '-', '-'});
            }
            if (pot.empty()) continue;
            uint32_t ab_max = 0;
            for (const Pot& p : pot)
                if (abundance[p.j] > ab_max) ab_max = abundance[p.j];
            uint32_t ab_ref = ab_max < abundance[i] ? ab_max : abundance[i];
            for (const Pot& p : pot) {
                if (presimp > 0.0 && pot.size() >= 2 &&
                    (double)abundance[p.j] < presimp * (double)ab_ref) {
                    presimp_removed++;
                    removed.insert({index[i], index[p.j]});
                    continue;
                }
                uint32_t sh = p.oa == '+' ? shift0[i] : shift1[i];
                uint32_t ov1 = seqlen[i] - sh;  // u32 wrap like the reference
                uint32_t ov2 = seqlen[p.j] - 1;
                uint32_t ov = ov1 < ov2 ? ov1 : ov2;
                if (presimp == 0.0) {
                    snprintf(line, sizeof line, "L\t%u\t%c\t%u\t%c\t%uM\n",
                             index[i], p.oa, index[p.j], p.ob, ov);
                    buf += line;
                    nb_edges++;
                    if (buf.size() > (8u << 20)) {
                        fwrite(buf.data(), 1, buf.size(), f); buf.clear();
                    }
                } else {
                    edges.push_back({(uint32_t)index[i], index[p.j], p.oa,
                                     p.ob, ov});
                }
            }
        }
    }
    if (presimp > 0.0) {
        for (const Edge& e : edges) {
            if (removed.count({e.a, e.b}) || removed.count({e.b, e.a}))
                continue;
            snprintf(line, sizeof line, "L\t%u\t%c\t%u\t%c\t%uM\n",
                     e.a, e.oa, e.b, e.ob, e.ov);
            buf += line;
            nb_edges++;
            if (buf.size() > (8u << 20)) {
                fwrite(buf.data(), 1, buf.size(), f); buf.clear();
            }
        }
    }
    fwrite(buf.data(), 1, buf.size(), f);
    fclose(f);
    *out_presimp_removed = presimp_removed;
    return nb_edges;
}

}  // extern "C"
