/* Minimal bzip2 shim header: libbz2.so.1.0 exists on this system but
 * ships no header.  Only the two buffer APIs lrzip-next calls. */
#ifndef SHIM_BZLIB_H
#define SHIM_BZLIB_H

#ifdef __cplusplus
extern "C" {
#endif

#define BZ_OK 0
#define BZ_RUN_OK 1
#define BZ_STREAM_END 4
#define BZ_OUTBUFF_FULL (-8)

int BZ2_bzBuffToBuffCompress(char *dest, unsigned int *destLen,
                             char *source, unsigned int sourceLen,
                             int blockSize100k, int verbosity,
                             int workFactor);
int BZ2_bzBuffToBuffDecompress(char *dest, unsigned int *destLen,
                               char *source, unsigned int sourceLen,
                               int small, int verbosity);

#ifdef __cplusplus
}
#endif
#endif
