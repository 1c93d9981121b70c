/* Minimal libgcrypt API shim for building the lrzip-next reference
 * binary as an interop oracle (no libgcrypt headers on this system).
 * Hashes are backed by OpenSSL libcrypto's EVP (declared by hand; the
 * ABI is stable) and zlib CRC32.  Cipher/KDF entry points return
 * not-implemented: the oracle is used without -e. */
#ifndef SHIM_GCRYPT_H
#define SHIM_GCRYPT_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef unsigned int gcry_error_t;
typedef struct shim_md_handle *gcry_md_hd_t;
typedef struct shim_cipher_handle *gcry_cipher_hd_t;

#define GPG_ERR_NO_ERROR 0

/* algo ids (values arbitrary but stable within this build) */
enum {
    GCRY_MD_NONE = 0,
    GCRY_MD_MD5 = 1,
    GCRY_MD_RMD160 = 3,
    GCRY_MD_SHA256 = 8,
    GCRY_MD_SHA384 = 9,
    GCRY_MD_SHA512 = 10,
    GCRY_MD_SHA3_256 = 313,
    GCRY_MD_SHA3_512 = 315,
    GCRY_MD_SHAKE128 = 316,
    GCRY_MD_SHAKE256 = 317,
    GCRY_MD_CRC32 = 302,
};

#define GCRY_MD_FLAG_SECURE 1

enum {
    GCRY_CIPHER_AES128 = 7,
    GCRY_CIPHER_AES256 = 9,
};
#define GCRY_CIPHER_MODE_CBC 3
#define GCRY_CIPHER_SECURE 1
#define GCRY_CIPHER_CBC_CTS 8

#define GCRY_KDF_SCRYPT 48

gcry_error_t gcry_md_open(gcry_md_hd_t *h, int algo, unsigned int flags);
void gcry_md_close(gcry_md_hd_t h);
void gcry_md_reset(gcry_md_hd_t h);
void gcry_md_write(gcry_md_hd_t h, const void *buffer, size_t length);
unsigned char *gcry_md_read(gcry_md_hd_t h, int algo);
gcry_error_t gcry_md_extract(gcry_md_hd_t h, int algo, void *buffer,
                             size_t length);
unsigned int gcry_md_get_algo_dlen(int algo);
void gcry_create_nonce(void *buffer, size_t length);

gcry_error_t gcry_cipher_open(gcry_cipher_hd_t *h, int algo, int mode,
                              unsigned int flags);
void gcry_cipher_close(gcry_cipher_hd_t h);
gcry_error_t gcry_cipher_setkey(gcry_cipher_hd_t h, const void *key,
                                size_t keylen);
gcry_error_t gcry_cipher_setiv(gcry_cipher_hd_t h, const void *iv,
                               size_t ivlen);
gcry_error_t gcry_cipher_encrypt(gcry_cipher_hd_t h, void *out,
                                 size_t outsize, const void *in,
                                 size_t inlen);
gcry_error_t gcry_cipher_decrypt(gcry_cipher_hd_t h, void *out,
                                 size_t outsize, const void *in,
                                 size_t inlen);
gcry_error_t gcry_kdf_derive(const void *passphrase,
                             size_t passphraselen, int algo, int subalgo,
                             const void *salt, size_t saltlen,
                             unsigned long iterations, size_t keysize,
                             void *keybuffer);
const char *gcry_strerror(gcry_error_t err);

/* gpg-error subset */
typedef unsigned int gpg_error_t;
typedef unsigned int gpg_err_code_t;
#define gpg_err_code(e) ((gpg_err_code_t)(e))
int gpg_strerror_r(gpg_err_code_t code, char *buf, size_t buflen);

#ifdef __cplusplus
}
#endif
#endif
