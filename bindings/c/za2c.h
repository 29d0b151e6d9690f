/* C ABI for libza2c: setup / prove / verify / verbose.
 *
 * Error codes: 0 = ok, 1 = buffer too small, 2 = verification failed,
 * 100 = custom error (message in error_buffer).
 * Set ZA_TPU_ROOT to the za-tpu repo/install path before first call if
 * the package is not importable from the default interpreter path.
 */
#ifndef ZA2C_H
#define ZA2C_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

void verbose(int on);

int setup(const char* circuit_path, const char* pk_path,
          const char* verifier_type, char* verifier_buffer,
          size_t verifier_buffer_size, char* error_buffer,
          size_t error_buffer_size);

int prove(const char* pk_path, const char* inputs, char* proof_buffer,
          size_t proof_buffer_size, char* error_buffer,
          size_t error_buffer_size);

int verify(const char* verifying_key, const char* proof_with_inputs,
           char* error_buffer, size_t error_buffer_size);

#ifdef __cplusplus
}
#endif

#endif /* ZA2C_H */
