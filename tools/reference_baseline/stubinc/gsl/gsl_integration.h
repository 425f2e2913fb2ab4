#ifndef GSL_INTEGRATION_STUB_H
#define GSL_INTEGRATION_STUB_H
#include <stddef.h>
#include "gsl_math.h"
typedef struct { int dummy; } gsl_integration_workspace;
#define GSL_INTEG_GAUSS41 4
gsl_integration_workspace *gsl_integration_workspace_alloc(size_t n);
void gsl_integration_workspace_free(gsl_integration_workspace *w);
int gsl_integration_qag(const gsl_function *f, double a, double b,
                        double epsabs, double epsrel, size_t limit, int key,
                        gsl_integration_workspace *workspace, double *result,
                        double *abserr);
#endif
