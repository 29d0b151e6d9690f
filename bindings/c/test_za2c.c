/* Smoke test: the same p*q=r circuit the reference pushes through every
 * FFI surface (binding/c, binding/go, binding/js tests). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "za2c.h"

static const char* CIRCUIT =
    "template Factor() {\n"
    "  signal private input p;\n"
    "  signal private input q;\n"
    "  signal input r;\n"
    "  p * q === r;\n"
    "}\n"
    "component main = Factor();\n";

int main(void) {
  char verifier[16384];
  char proof[8192];
  char err[4096];

  FILE* f = fopen("/tmp/za2c_circuit.za", "w");
  fputs(CIRCUIT, f);
  fclose(f);

  verbose(0);

  int rc = setup("/tmp/za2c_circuit.za", "/tmp/za2c_pk", "json", verifier,
                 sizeof(verifier), err, sizeof(err));
  if (rc != 0) {
    fprintf(stderr, "setup failed rc=%d err=%s\n", rc, err);
    return 1;
  }
  printf("setup ok (%zu bytes verifier)\n", strlen(verifier));

  rc = prove("/tmp/za2c_pk", "{\"p\":\"2\",\"q\":\"3\",\"r\":\"6\"}", proof,
             sizeof(proof), err, sizeof(err));
  if (rc != 0) {
    fprintf(stderr, "prove failed rc=%d err=%s\n", rc, err);
    return 1;
  }
  printf("prove ok (%zu bytes proof)\n", strlen(proof));

  rc = verify(verifier, proof, err, sizeof(err));
  if (rc != 0) {
    fprintf(stderr, "verify failed rc=%d err=%s\n", rc, err);
    return 1;
  }
  printf("verify ok\n");

  /* negative path: tamper with the proof's public input */
  char* pos = strstr(proof, "\"6\"");
  if (pos != NULL) {
    pos[1] = '7';
    rc = verify(verifier, proof, err, sizeof(err));
    if (rc != 2) {
      fprintf(stderr, "tampered proof not rejected rc=%d\n", rc);
      return 1;
    }
    printf("tampered proof rejected ok\n");
  }
  printf("ALL C BINDING TESTS PASS\n");
  return 0;
}
