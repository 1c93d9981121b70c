/* Minimal liblzo2 shim for the oracle build: types + error codes.
 * Backed by lrzip_next_tpu's from-scratch LZO1X codec (lzo_shim.c). */
#ifndef SHIM_LZOCONF_H
#define SHIM_LZOCONF_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef size_t lzo_uint;
typedef unsigned char *lzo_bytep;
typedef const unsigned char *lzo_cbytep;
typedef void *lzo_voidp;

#define LZO_E_OK 0
#define LZO_E_ERROR (-1)
#define LZO_E_INPUT_OVERRUN (-4)
#define LZO_E_OUTPUT_OVERRUN (-5)
#define LZO_E_LOOKBEHIND_OVERRUN (-6)
#define LZO_E_INPUT_NOT_CONSUMED (-8)

int shim_lzo_init(void);
#define lzo_init() shim_lzo_init()

#ifdef __cplusplus
}
#endif
#endif

#ifdef __cplusplus
extern "C" {
#endif
typedef int (*lzo_compress_t)(const unsigned char *, lzo_uint,
                              unsigned char *, lzo_uint *, lzo_voidp);
typedef int (*lzo_decompress_t)(const unsigned char *, lzo_uint,
                                unsigned char *, lzo_uint *, lzo_voidp);
#ifdef __cplusplus
}
#endif
