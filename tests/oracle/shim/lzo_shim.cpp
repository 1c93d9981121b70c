/* liblzo2 shim backed by lrzip_next_tpu's from-scratch LZO1X codec
 * (runtime/csrc/hostops.cpp, compiled into this oracle binary). */
#include "lzo/lzo1x.h"

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" int64_t lzo1x_encode(const uint8_t *in, int64_t n,
                                uint8_t *out, int64_t out_cap,
                                int32_t *work);
extern "C" int64_t lzo1x_decode(const uint8_t *in, int64_t n,
                                uint8_t *out, int64_t out_cap);

extern "C" int shim_lzo_init(void) { return LZO_E_OK; }

static int compress_common(const unsigned char *src, lzo_uint src_len,
                           unsigned char *dst, lzo_uint *dst_len) {
    // dst is sized in_len + in_len/16 + 64 + 3 by the caller
    // (reference src/stream.c:499); our encoder needs similar slack
    int64_t cap = (int64_t)src_len + src_len / 16 + 64 + 3;
    std::vector<int32_t> work(1 << 17);
    int64_t r = lzo1x_encode(src, (int64_t)src_len, dst, cap,
                             work.data());
    if (r < 0) {
        // tiny or incompressible input: signal expansion so the caller
        // stores the block raw (it discards when c_len >= s_len)
        *dst_len = src_len + 64;
        return LZO_E_OK;
    }
    *dst_len = (lzo_uint)r;
    return LZO_E_OK;
}

extern "C" int lzo1x_1_compress(const unsigned char *src,
                                lzo_uint src_len, unsigned char *dst,
                                lzo_uint *dst_len, lzo_voidp) {
    return compress_common(src, src_len, dst, dst_len);
}

extern "C" int lzo1x_999_compress(const unsigned char *src,
                                  lzo_uint src_len, unsigned char *dst,
                                  lzo_uint *dst_len, lzo_voidp) {
    return compress_common(src, src_len, dst, dst_len);
}

extern "C" int lzo1x_decompress_safe(const unsigned char *src,
                                     lzo_uint src_len,
                                     unsigned char *dst,
                                     lzo_uint *dst_len, lzo_voidp) {
    int64_t r = lzo1x_decode(src, (int64_t)src_len, dst,
                             (int64_t)*dst_len);
    if (r < 0) return LZO_E_ERROR;
    *dst_len = (lzo_uint)r;
    return LZO_E_OK;
}
