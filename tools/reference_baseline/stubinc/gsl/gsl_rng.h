/* Minimal GSL RNG stub (xorshift64*; Gadget only needs uniforms). */
#ifndef GSL_RNG_STUB_H
#define GSL_RNG_STUB_H
#include <stddef.h>

typedef struct { unsigned long long s; } gsl_rng;
typedef int gsl_rng_type;
extern const gsl_rng_type *gsl_rng_ranlxd1;
extern const gsl_rng_type *gsl_rng_ranlxd2;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_set(gsl_rng *r, unsigned long seed);
double gsl_rng_uniform(gsl_rng *r);
void *gsl_rng_state(const gsl_rng *r);
size_t gsl_rng_size(const gsl_rng *r);
void gsl_rng_free(gsl_rng *r);
#endif
