/* libgcrypt shim implementation: EVP (libcrypto, hand-declared ABI) +
 * zlib crc32.  See gcrypt.h in this directory. */
#include "gcrypt.h"

#include <stdlib.h>
#include <string.h>
#include <stdio.h>
#include <zlib.h>
#include <sys/random.h>

/* ---- hand-declared OpenSSL 3 EVP ABI ---- */
typedef struct evp_md_ctx_st EVP_MD_CTX;
typedef struct evp_md_st EVP_MD;
extern EVP_MD_CTX *EVP_MD_CTX_new(void);
extern void EVP_MD_CTX_free(EVP_MD_CTX *);
extern const EVP_MD *EVP_get_digestbyname(const char *);
extern int EVP_DigestInit_ex(EVP_MD_CTX *, const EVP_MD *, void *);
extern int EVP_DigestUpdate(EVP_MD_CTX *, const void *, size_t);
extern int EVP_DigestFinal_ex(EVP_MD_CTX *, unsigned char *,
                              unsigned int *);
extern int EVP_DigestFinalXOF(EVP_MD_CTX *, unsigned char *, size_t);
extern int EVP_MD_CTX_copy_ex(EVP_MD_CTX *, const EVP_MD_CTX *);

struct shim_md_handle {
    int algo;
    int is_crc;
    int is_xof;
    unsigned long crc;
    EVP_MD_CTX *ctx;
    const EVP_MD *md;
    unsigned char digest[64];
};

static const char *algo_name(int algo) {
    switch (algo) {
    case GCRY_MD_MD5: return "MD5";
    case GCRY_MD_RMD160: return "RIPEMD160";
    case GCRY_MD_SHA256: return "SHA256";
    case GCRY_MD_SHA384: return "SHA384";
    case GCRY_MD_SHA512: return "SHA512";
    case GCRY_MD_SHA3_256: return "SHA3-256";
    case GCRY_MD_SHA3_512: return "SHA3-512";
    case GCRY_MD_SHAKE128: return "SHAKE128";
    case GCRY_MD_SHAKE256: return "SHAKE256";
    default: return 0;
    }
}

unsigned int gcry_md_get_algo_dlen(int algo) {
    switch (algo) {
    case GCRY_MD_CRC32: return 4;
    case GCRY_MD_MD5: return 16;
    case GCRY_MD_RMD160: return 20;
    case GCRY_MD_SHA256: case GCRY_MD_SHA3_256: return 32;
    case GCRY_MD_SHA384: return 48;
    case GCRY_MD_SHA512: case GCRY_MD_SHA3_512: return 64;
    default: return 0; /* XOFs report 0, as gcrypt does */
    }
}

gcry_error_t gcry_md_open(gcry_md_hd_t *h, int algo, unsigned int flags) {
    (void)flags;
    struct shim_md_handle *m = calloc(1, sizeof *m);
    if (!m) return 1;
    m->algo = algo;
    if (algo == GCRY_MD_CRC32) {
        m->is_crc = 1;
        m->crc = crc32(0L, 0, 0);
    } else {
        const char *name = algo_name(algo);
        if (!name) { free(m); return 1; }
        m->md = EVP_get_digestbyname(name);
        if (!m->md) { free(m); return 1; }
        m->ctx = EVP_MD_CTX_new();
        if (!m->ctx || !EVP_DigestInit_ex(m->ctx, m->md, 0)) {
            free(m);
            return 1;
        }
        m->is_xof = (algo == GCRY_MD_SHAKE128 ||
                     algo == GCRY_MD_SHAKE256);
    }
    *h = m;
    return 0;
}

void gcry_md_close(gcry_md_hd_t h) {
    if (!h) return;
    if (h->ctx) EVP_MD_CTX_free(h->ctx);
    free(h);
}

void gcry_md_reset(gcry_md_hd_t h) {
    if (!h) return;
    if (h->is_crc)
        h->crc = crc32(0L, 0, 0);
    else
        EVP_DigestInit_ex(h->ctx, h->md, 0);
}

void gcry_md_write(gcry_md_hd_t h, const void *buffer, size_t length) {
    if (!h) return;
    if (h->is_crc)
        h->crc = crc32(h->crc, buffer, (unsigned int)length);
    else
        EVP_DigestUpdate(h->ctx, buffer, length);
}

unsigned char *gcry_md_read(gcry_md_hd_t h, int algo) {
    (void)algo;
    if (!h) return 0;
    if (h->is_crc) {
        /* gcrypt returns the CRC32 digest MSB-first */
        h->digest[0] = (unsigned char)(h->crc >> 24);
        h->digest[1] = (unsigned char)(h->crc >> 16);
        h->digest[2] = (unsigned char)(h->crc >> 8);
        h->digest[3] = (unsigned char)h->crc;
        return h->digest;
    }
    /* finalize a copy so the stream can continue (gcrypt semantics) */
    EVP_MD_CTX *cp = EVP_MD_CTX_new();
    if (!cp) return 0;
    unsigned int n = 0;
    if (!EVP_MD_CTX_copy_ex(cp, h->ctx)) { EVP_MD_CTX_free(cp); return 0; }
    if (h->is_xof)
        EVP_DigestFinalXOF(cp, h->digest, 32);
    else
        EVP_DigestFinal_ex(cp, h->digest, &n);
    EVP_MD_CTX_free(cp);
    return h->digest;
}

gcry_error_t gcry_md_extract(gcry_md_hd_t h, int algo, void *buffer,
                             size_t length) {
    (void)algo;
    if (!h || !h->is_xof) return 1;
    EVP_MD_CTX *cp = EVP_MD_CTX_new();
    if (!cp) return 1;
    if (!EVP_MD_CTX_copy_ex(cp, h->ctx)) { EVP_MD_CTX_free(cp); return 1; }
    int ok = EVP_DigestFinalXOF(cp, buffer, length);
    EVP_MD_CTX_free(cp);
    return ok ? 0 : 1;
}

void gcry_create_nonce(void *buffer, size_t length) {
    size_t off = 0;
    while (off < length) {
        ssize_t r = getrandom((char *)buffer + off, length - off, 0);
        if (r <= 0) break;
        off += (size_t)r;
    }
}

/* ---- cipher / KDF: not needed by the oracle (no -e tests) ---- */
struct shim_cipher_handle { int dummy; };

gcry_error_t gcry_cipher_open(gcry_cipher_hd_t *h, int algo, int mode,
                              unsigned int flags) {
    (void)h; (void)algo; (void)mode; (void)flags;
    return 1;
}
void gcry_cipher_close(gcry_cipher_hd_t h) { (void)h; }
gcry_error_t gcry_cipher_setkey(gcry_cipher_hd_t h, const void *k,
                                size_t l) { (void)h; (void)k; (void)l;
    return 1; }
gcry_error_t gcry_cipher_setiv(gcry_cipher_hd_t h, const void *iv,
                               size_t l) { (void)h; (void)iv; (void)l;
    return 1; }
gcry_error_t gcry_cipher_encrypt(gcry_cipher_hd_t h, void *o, size_t os,
                                 const void *i, size_t il) {
    (void)h; (void)o; (void)os; (void)i; (void)il; return 1; }
gcry_error_t gcry_cipher_decrypt(gcry_cipher_hd_t h, void *o, size_t os,
                                 const void *i, size_t il) {
    (void)h; (void)o; (void)os; (void)i; (void)il; return 1; }
gcry_error_t gcry_kdf_derive(const void *p, size_t pl, int a, int sa,
                             const void *s, size_t sl, unsigned long it,
                             size_t ks, void *kb) {
    (void)p; (void)pl; (void)a; (void)sa; (void)s; (void)sl; (void)it;
    (void)ks; (void)kb; return 1;
}
int gpg_strerror_r(gpg_err_code_t code, char *buf, size_t buflen) {
    (void)code;
    snprintf(buf, buflen, "gcrypt shim error");
    return 0;
}

const char *gcry_strerror(gcry_error_t err) {
    (void)err;
    return "gcrypt shim: not implemented";
}
