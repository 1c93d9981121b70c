#!/bin/bash
# Build the lrzip-next reference binary (from the read-only tree at
# /root/reference) as an end-to-end interop oracle.
#
# The reference's external deps are shimmed from what this system has:
#   libgcrypt -> shim/gcrypt.h + gcrypt_shim.c (libcrypto EVP, zlib crc32)
#   liblzo2   -> shim/lzo* backed by our from-scratch LZO1X codec
#   libbz3    -> stub (no libbz3 anywhere on this system; -B unusable)
#   lz4/bz2   -> system .so linked directly (no dev headers shipped)
#   zlib/zstd -> real system headers + libs
# Cipher/KDF are stubbed: the oracle cannot do -e (no -e interop tests).
#
# Usage: build_oracle.sh <out_dir>   (binary lands at <out_dir>/lrzip-next)
set -e
OUT="${1:?usage: build_oracle.sh <out_dir>}"
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference

mkdir -p "$OUT"
rm -rf "$OUT/src"
cp -r "$REF/src" "$OUT/src"
chmod -R u+w "$OUT/src"
rm -rf "$OUT/shim"
cp -r "$HERE/shim" "$OUT/shim"
cp -f "$HERE/config.h" "$OUT/config.h"
cd "$OUT"

CFLAGS="-O2 -w -DHAVE_CONFIG_H -I. -Ishim -Isrc/include -Isrc/lzma/include -pthread"
LZMA_SRCS="src/lzma/C/Alloc.c src/lzma/C/Bra.c src/lzma/C/Bra86.c \
  src/lzma/C/BraIA64.c src/lzma/C/CpuArch.c src/lzma/C/Delta.c \
  src/lzma/C/LzFind.c src/lzma/C/LzFindMt.c src/lzma/C/LzFindOpt.c \
  src/lzma/C/LzmaDec.c src/lzma/C/LzmaEnc.c src/lzma/C/LzmaLib.c \
  src/lzma/C/Threads.c"
CORE_SRCS="src/main.c src/lrzip.c src/rzip.c src/runzip.c src/stream.c src/util.c"

gcc $CFLAGS -c $CORE_SRCS $LZMA_SRCS shim/gcrypt_shim.c
g++ $CFLAGS -DNOJIT -Dunix -std=gnu++14 -c src/lib/libzpaq/libzpaq.cpp \
  shim/lzo_shim.cpp /root/repo/lrzip_next_tpu/runtime/csrc/hostops.cpp
g++ -O2 -pthread -o lrzip-next *.o \
  -lz -lzstd -lm \
  -l:libbz2.so.1.0 -l:liblz4.so.1 -l:libcrypto.so.3
rm -f ./*.o
echo "built: $OUT/lrzip-next"
