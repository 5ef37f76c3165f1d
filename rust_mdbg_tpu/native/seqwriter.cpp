// Native .sequences sidecar writer.
//
// Formats and LZ4F-compresses the per-node records (format contract:
// /root/reference/src/main.rs:696-707, see io/sequences.py) directly from the
// raw read buffer: slice [start, end), reverse-complement when the crossing
// occurrence was reversed, emit
//   <index>\t[h0, h1, ...]\t<seq>\t*\t*\t(s0, s1)\n
// The Python loop doing this was ~50 us/node; this does the whole table in
// one pass at memory speed.

#include "lz4f.cpp"  // self-contained codec (extern "C" but distinct .so)

#include <cstdio>
#include <cinttypes>
#include <string>
#include <vector>

namespace {

char comp_table[256];
struct CompInit {
    CompInit() {
        for (int i = 0; i < 256; i++) comp_table[i] = 'N';
        comp_table['A'] = 'T'; comp_table['C'] = 'G';
        comp_table['G'] = 'C'; comp_table['T'] = 'A';
        comp_table['a'] = 't'; comp_table['c'] = 'g';
        comp_table['g'] = 'c'; comp_table['t'] = 'a';
        comp_table['U'] = 'A'; comp_table['u'] = 'a';
    }
} comp_init;

void flush_frame(FILE* f, std::string& buf, std::vector<uint8_t>& scratch) {
    if (buf.empty()) return;
    size_t cap = buf.size() + buf.size() / 255 + 4096;
    if (scratch.size() < cap) scratch.resize(cap);
    int64_t n = lz4f_compress_frame(
        reinterpret_cast<const uint8_t*>(buf.data()), buf.size(),
        scratch.data(), cap);
    if (n > 0) fwrite(scratch.data(), 1, n, f);
    buf.clear();
}

}  // namespace

extern "C" {

// Writes n node records to `path` (appending after a header). Returns 0 on
// success.  reads_buf holds raw ASCII bases; per node the slice is
// [abs_start[i], abs_end[i]).
int64_t seqs_write(const char* path, int64_t n, int k, int header_k,
                   int header_l,
                   const uint32_t* index, const uint64_t* vecs,
                   const uint8_t* reads_buf,
                   const int64_t* abs_start, const int64_t* abs_end,
                   const uint8_t* rev,
                   const uint16_t* s0, const uint16_t* s1) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    std::string buf;
    buf.reserve(8 << 20);
    std::vector<uint8_t> scratch;
    char tmp[32];
    snprintf(tmp, sizeof tmp, "# k = %d\n", header_k);
    buf += tmp;
    snprintf(tmp, sizeof tmp, "# l = %d\n", header_l);
    buf += tmp;
    buf += "# Structure of remaining of the file:\n";
    buf += "# [node name]\t[list of minimizers]\t[sequence of node]\t"
           "[abundance]\t[origin]\t[shift]\n";
    for (int64_t i = 0; i < n; i++) {
        char head[32];
        snprintf(head, sizeof head, "%u\t[", index[i]);
        buf += head;
        for (int j = 0; j < k; j++) {
            char num[24];
            snprintf(num, sizeof num, "%" PRIu64, vecs[i * k + j]);
            buf += num;
            if (j + 1 < k) buf += ", ";
        }
        buf += "]\t";
        int64_t a = abs_start[i], b = abs_end[i];
        if (rev[i]) {
            size_t off = buf.size();
            buf.resize(off + (b - a));
            char* dst = &buf[off];
            for (int64_t p = b - 1; p >= a; p--)
                *dst++ = comp_table[reads_buf[p]];
        } else {
            buf.append(reinterpret_cast<const char*>(reads_buf) + a, b - a);
        }
        char tail[48];
        snprintf(tail, sizeof tail, "\t*\t*\t(%u, %u)\n",
                 (unsigned)s0[i], (unsigned)s1[i]);
        buf += tail;
        if (buf.size() >= (4u << 20)) flush_frame(f, buf, scratch);
    }
    flush_frame(f, buf, scratch);
    fclose(f);
    return 0;
}

}  // extern "C"
