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

/* ---- cipher: AES-CBC with ciphertext stealing --------------------
 * Same CTS scheme as lrzip_next_tpu/crypto/aes.py (Kerberos-style:
 * always steal when len > one block, last two ciphertext blocks
 * swapped, final truncated).  Primitive-level equivalence with real
 * libgcrypt cannot be checked on this system; what the oracle proves
 * is that the reference's container-level encryption plumbing
 * (lrz_keygen layout, header/block salting, rewrite_encrypted) interops
 * with ours. */
typedef struct evp_cipher_ctx_st EVP_CIPHER_CTX;
typedef struct evp_cipher_st EVP_CIPHER;
extern EVP_CIPHER_CTX *EVP_CIPHER_CTX_new(void);
extern void EVP_CIPHER_CTX_free(EVP_CIPHER_CTX *);
extern const EVP_CIPHER *EVP_aes_128_cbc(void);
extern const EVP_CIPHER *EVP_aes_256_cbc(void);
extern const EVP_CIPHER *EVP_aes_128_ecb(void);
extern const EVP_CIPHER *EVP_aes_256_ecb(void);
extern int EVP_CipherInit_ex(EVP_CIPHER_CTX *, const EVP_CIPHER *,
                             void *, const unsigned char *,
                             const unsigned char *, int);
extern int EVP_CipherUpdate(EVP_CIPHER_CTX *, unsigned char *, int *,
                            const unsigned char *, int);
extern int EVP_CIPHER_CTX_set_padding(EVP_CIPHER_CTX *, int);
extern int EVP_PBE_scrypt(const char *pass, size_t passlen,
                          const unsigned char *salt, size_t saltlen,
                          unsigned long long N, unsigned long long r,
                          unsigned long long p,
                          unsigned long long maxmem,
                          unsigned char *key, size_t keylen);

struct shim_cipher_handle {
    int keylen;
    unsigned char key[32];
    unsigned char iv[16];
};

static int evp_once(const unsigned char *key, int keylen,
                    const unsigned char *iv, int cbc,
                    const unsigned char *in, unsigned char *out,
                    size_t len, int enc) {
    const EVP_CIPHER *c = cbc
        ? (keylen == 16 ? EVP_aes_128_cbc() : EVP_aes_256_cbc())
        : (keylen == 16 ? EVP_aes_128_ecb() : EVP_aes_256_ecb());
    EVP_CIPHER_CTX *ctx = EVP_CIPHER_CTX_new();
    int outl = 0, ok;
    if (!ctx) return 0;
    ok = EVP_CipherInit_ex(ctx, c, 0, key, iv, enc);
    if (ok) EVP_CIPHER_CTX_set_padding(ctx, 0);
    if (ok) ok = EVP_CipherUpdate(ctx, out, &outl, in, (int)len);
    EVP_CIPHER_CTX_free(ctx);
    return ok && (size_t)outl == len;
}

gcry_error_t gcry_cipher_open(gcry_cipher_hd_t *h, int algo, int mode,
                              unsigned int flags) {
    (void)mode; (void)flags;
    struct shim_cipher_handle *c = calloc(1, sizeof *c);
    if (!c) return 1;
    c->keylen = (algo == GCRY_CIPHER_AES128) ? 16 : 32;
    *h = c;
    return 0;
}
void gcry_cipher_close(gcry_cipher_hd_t h) { free(h); }
gcry_error_t gcry_cipher_setkey(gcry_cipher_hd_t h, const void *k,
                                size_t l) {
    if (!h || (int)l != h->keylen) return 1;
    memcpy(h->key, k, l);
    return 0;
}
gcry_error_t gcry_cipher_setiv(gcry_cipher_hd_t h, const void *iv,
                               size_t l) {
    if (!h || l != 16) return 1;
    memcpy(h->iv, iv, l);
    return 0;
}

static gcry_error_t cts_crypt(gcry_cipher_hd_t h, unsigned char *buf,
                              size_t len, int enc) {
    if (len < 16) return 1;
    if (len == 16)
        return evp_once(h->key, h->keylen, h->iv, 1, buf, buf, 16, enc)
            ? 0 : 1;
    size_t rest = len % 16 ? len % 16 : 16;
    size_t lead = (len - rest) / 16;  /* >= 1 leading full blocks */
    unsigned char tmp[16], cn[16], cn_1[16], dn[16];
    if (enc) {
        if (!evp_once(h->key, h->keylen, h->iv, 1, buf, buf,
                      lead * 16, 1))
            return 1;
        memcpy(cn_1, buf + lead * 16 - 16, 16);
        memset(tmp, 0, 16);
        memcpy(tmp, buf + lead * 16, rest);  /* Pn padded */
        for (int i = 0; i < 16; i++) tmp[i] ^= cn_1[i];
        if (!evp_once(h->key, h->keylen, 0, 0, tmp, cn, 16, 1))
            return 1;
        memcpy(buf + lead * 16 - 16, cn, 16);  /* Cn replaces Cn-1 */
        memcpy(buf + lead * 16, cn_1, rest);   /* truncated Cn-1 last */
        return 0;
    }
    /* decrypt: reconstruct the stolen block, then one CBC pass */
    memcpy(cn, buf + lead * 16 - 16, 16);
    if (!evp_once(h->key, h->keylen, 0, 0, cn, dn, 16, 0))
        return 1;
    unsigned char tail[16];
    memcpy(tail, buf + lead * 16, rest);       /* truncated Cn-1 */
    memcpy(cn_1, tail, rest);
    memcpy(cn_1 + rest, dn + rest, 16 - rest);
    memcpy(buf + lead * 16 - 16, cn_1, 16);    /* restore chain */
    if (!evp_once(h->key, h->keylen, h->iv, 1, buf, buf,
                  lead * 16, 0))
        return 1;
    for (size_t i = 0; i < rest; i++)
        buf[lead * 16 + i] = dn[i] ^ tail[i];  /* Pn */
    return 0;
}

gcry_error_t gcry_cipher_encrypt(gcry_cipher_hd_t h, void *o, size_t os,
                                 const void *i, size_t il) {
    if (i != 0 || il != 0) return 1;  /* in-place only, as lrzip uses */
    return cts_crypt(h, (unsigned char *)o, os, 1);
}
gcry_error_t gcry_cipher_decrypt(gcry_cipher_hd_t h, void *o, size_t os,
                                 const void *i, size_t il) {
    if (i != 0 || il != 0) return 1;
    return cts_crypt(h, (unsigned char *)o, os, 0);
}

/* gcrypt scrypt: subalgo = N (cost), iterations = p, r fixed at 8 */
gcry_error_t gcry_kdf_derive(const void *p, size_t pl, int a, int sa,
                             const void *s, size_t sl, unsigned long it,
                             size_t ks, void *kb) {
    if (a != GCRY_KDF_SCRYPT) return 1;
    unsigned long long maxmem = (unsigned long long)1 << 31;
    return EVP_PBE_scrypt((const char *)p, pl,
                          (const unsigned char *)s, sl,
                          (unsigned long long)sa, 8,
                          (unsigned long long)it, maxmem,
                          (unsigned char *)kb, ks) ? 0 : 1;
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
