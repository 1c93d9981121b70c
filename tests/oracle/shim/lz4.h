/* Minimal lz4 shim header: liblz4.so.1 exists, no header shipped. */
#ifndef SHIM_LZ4_H
#define SHIM_LZ4_H

#ifdef __cplusplus
extern "C" {
#endif

int LZ4_compress_default(const char *src, char *dst, int srcSize,
                         int dstCapacity);
int LZ4_compressBound(int inputSize);

#ifdef __cplusplus
}
#endif
#endif
