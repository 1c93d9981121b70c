#ifndef SHIM_LZO1X_H
#define SHIM_LZO1X_H

#include "lzoconf.h"

#ifdef __cplusplus
extern "C" {
#endif

#define LZO1X_1_MEM_COMPRESS (16384 * sizeof(unsigned char *))
#define LZO1X_999_MEM_COMPRESS (14 * 16384 * sizeof(short))

int lzo1x_1_compress(const unsigned char *src, lzo_uint src_len,
                     unsigned char *dst, lzo_uint *dst_len,
                     lzo_voidp wrkmem);
int lzo1x_999_compress(const unsigned char *src, lzo_uint src_len,
                       unsigned char *dst, lzo_uint *dst_len,
                       lzo_voidp wrkmem);
int lzo1x_decompress_safe(const unsigned char *src, lzo_uint src_len,
                          unsigned char *dst, lzo_uint *dst_len,
                          lzo_voidp wrkmem);

#ifdef __cplusplus
}
#endif
#endif
