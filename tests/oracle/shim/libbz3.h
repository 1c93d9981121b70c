/* bzip3 stub for the oracle build: no libbz3 exists on this system, so
 * -B in the oracle fails cleanly at bz3_new().  Never used in interop
 * tests (our framework's bzip3 slot is its own codec; see
 * lrzip_next_tpu/backends/bzip3_codec.py). */
#ifndef SHIM_LIBBZ3_H
#define SHIM_LIBBZ3_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

#define BZ3_OK 0
#define BZ3_ERR_OUT_OF_BOUNDS (-1)

struct bz3_state;

static inline struct bz3_state *bz3_new(int32_t block_size) {
    (void)block_size;
    return 0;
}
static inline void bz3_free(struct bz3_state *s) { (void)s; }
static inline int32_t bz3_encode_block(struct bz3_state *s, uint8_t *b,
                                       int32_t n) {
    (void)s; (void)b; (void)n;
    return -1;
}
static inline int32_t bz3_decode_block(struct bz3_state *s, uint8_t *b,
                                       int32_t n, int32_t orig) {
    (void)s; (void)b; (void)n; (void)orig;
    return -1;
}
static inline int8_t bz3_last_error(struct bz3_state *s) {
    (void)s;
    return -1;
}
static inline const char *bz3_strerror(struct bz3_state *s) {
    (void)s;
    return "bz3 stub: libbz3 not available in oracle build";
}
static inline int32_t bz3_bound(int32_t n) { return n + n / 50 + 32; }

#ifdef __cplusplus
}
#endif
#endif
