/* Minimal declaration of the google/snappy C ABI, written from the public
 * interface contract so that the reference codec (/root/reference/source/
 * hap.c:32 `#include "snappy-c.h"`) can be compiled in this environment and
 * linked against the system /lib/x86_64-linux-gnu/libsnappy.so.1, whose
 * dynamic symbol table exports exactly these five functions.
 *
 * This header is test infrastructure for the differential oracle
 * (hap_tpu/oracle.py); it is not part of the framework's runtime.
 */
#ifndef HAP_TPU_ORACLE_SNAPPY_C_H
#define HAP_TPU_ORACLE_SNAPPY_C_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
    SNAPPY_OK = 0,
    SNAPPY_INVALID_INPUT = 1,
    SNAPPY_BUFFER_TOO_SMALL = 2
} snappy_status;

snappy_status snappy_compress(const char *input, size_t input_length,
                              char *compressed, size_t *compressed_length);

snappy_status snappy_uncompress(const char *compressed,
                                size_t compressed_length,
                                char *uncompressed,
                                size_t *uncompressed_length);

size_t snappy_max_compressed_length(size_t source_length);

snappy_status snappy_uncompressed_length(const char *compressed,
                                         size_t compressed_length,
                                         size_t *result);

snappy_status snappy_validate_compressed_buffer(const char *compressed,
                                                size_t compressed_length);

#ifdef __cplusplus
}
#endif

#endif /* HAP_TPU_ORACLE_SNAPPY_C_H */
