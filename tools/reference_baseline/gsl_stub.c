/* GSL stubs: xorshift RNG + adaptive-Simpson qag (driftfac tables). */
#include "stubinc/gsl/gsl_rng.h"
#include "stubinc/gsl/gsl_integration.h"
#include <stdlib.h>

static gsl_rng_type the_type;
const gsl_rng_type *gsl_rng_ranlxd1 = &the_type;
const gsl_rng_type *gsl_rng_ranlxd2 = &the_type;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T) {
    (void)T;
    gsl_rng *r = (gsl_rng *)malloc(sizeof(gsl_rng));
    r->s = 88172645463325252ULL;
    return r;
}
void gsl_rng_set(gsl_rng *r, unsigned long seed) {
    r->s = seed * 2685821657736338717ULL + 1442695040888963407ULL;
}
double gsl_rng_uniform(gsl_rng *r) {
    unsigned long long x = r->s;
    x ^= x << 13; x ^= x >> 7; x ^= x << 17;
    r->s = x;
    return (double)(x >> 11) / 9007199254740992.0;  /* [0,1) at 53 bits */
}
void *gsl_rng_state(const gsl_rng *r) { return (void *)&((gsl_rng *)r)->s; }
size_t gsl_rng_size(const gsl_rng *r) { (void)r; return sizeof(r->s); }
void gsl_rng_free(gsl_rng *r) { free(r); }

gsl_integration_workspace *gsl_integration_workspace_alloc(size_t n)
{ (void)n; return (gsl_integration_workspace *)malloc(sizeof(int)); }
void gsl_integration_workspace_free(gsl_integration_workspace *w) { free(w); }

static double simpson(const gsl_function *f, double a, double b, int n) {
    double h = (b - a) / n, s = GSL_FN_EVAL(f, a) + GSL_FN_EVAL(f, b);
    int i;
    for (i = 1; i < n; i++)
        s += (i & 1 ? 4.0 : 2.0) * GSL_FN_EVAL(f, a + i * h);
    return s * h / 3.0;
}
int gsl_integration_qag(const gsl_function *f, double a, double b,
                        double epsabs, double epsrel, size_t limit, int key,
                        gsl_integration_workspace *w, double *result,
                        double *abserr) {
    (void)epsabs; (void)epsrel; (void)limit; (void)key; (void)w;
    /* fixed-refinement Simpson with Richardson check */
    int n = 64;
    double s1 = simpson(f, a, b, n), s2 = simpson(f, a, b, 2 * n);
    while (n < 1 << 20) {
        if (s1 != 0 && (s2 - s1) / s2 < 1e-10 && (s1 - s2) / s2 > -1e-10)
            break;
        n *= 2; s1 = s2; s2 = simpson(f, a, b, 2 * n);
    }
    *result = s2;
    if (abserr) *abserr = s2 - s1;
    return 0;
}
