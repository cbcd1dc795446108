// 2-bit sequence packing, native path.
//
// Role-equivalent of the reference's packing kernel
// (lib/kernels/sequence_packing_kernel.cu:28-116), run on the host: each
// base is (ascii & 6) >> 1, 16 bases per u32 word, first base in the
// highest bits (big-endian base order), so the device LCP extension is
// xor + clz with no swizzle.  One pass per sequence fuses packing with the
// ACGT validity check; OpenMP over rows, GIL released by the ctypes call.
// Semantics match wfa_tpu/ops/packing.pack_batch exactly (the NumPy
// fallback): bases past the buffer are dropped unchecked, zero padding,
// valid = all-ACGT-in-buffer && len < max_seq_len && len <= out_words*16.
#include <cstdint>

namespace {

struct AcgtLut {
    bool t[256] = {};
    AcgtLut() {
        const char* ok = "ACGTacgt";
        for (int i = 0; ok[i]; ++i)
            t[static_cast<unsigned char>(ok[i])] = true;
    }
};
const AcgtLut LUT;

}  // namespace

extern "C" {

void wfa_pack_batch(const uint8_t* flat, const int64_t* starts,
                    const int32_t* lengths, int32_t b, int32_t out_words,
                    int32_t max_seq_len, uint32_t* out, uint8_t* valid) {
    const int64_t full_cap = static_cast<int64_t>(out_words) * 16;
#pragma omp parallel for schedule(static)
    for (int32_t i = 0; i < b; ++i) {
        const uint8_t* s = flat + starts[i];
        const int64_t n = lengths[i];
        uint32_t* o = out + static_cast<int64_t>(i) * out_words;
        const int64_t use = n < full_cap ? n : full_cap;
        bool ok = n < max_seq_len && n <= full_cap;
        int64_t w = 0, j = 0;
        for (; j + 16 <= use; j += 16, ++w) {
            uint32_t word = 0;
            for (int k = 0; k < 16; ++k) {
                const uint8_t c = s[j + k];
                ok &= LUT.t[c];
                word = (word << 2) | ((c & 6u) >> 1);
            }
            o[w] = word;
        }
        if (j < use) {
            uint32_t word = 0;
            for (int k = 0; k < 16; ++k) {
                uint32_t code = 0;
                if (j + k < use) {
                    const uint8_t c = s[j + k];
                    ok &= LUT.t[c];
                    code = (c & 6u) >> 1;
                }
                word = (word << 2) | code;
            }
            o[w++] = word;
        }
        for (; w < out_words; ++w) o[w] = 0;
        valid[i] = ok ? 1 : 0;
    }
}

}  // extern "C"
