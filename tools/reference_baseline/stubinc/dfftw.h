/* FFTW-2 serial stub: types + abort-if-called (tree-only builds never call;
   the TreePM transition tabulation is PMGRID-guarded). */
#ifndef DFFTW_STUB_H
#define DFFTW_STUB_H
#include <stdio.h>
#include <stdlib.h>

typedef double fftw_real;
typedef struct { fftw_real re, im; } fftw_complex;
typedef void *fftw_plan;
#define FFTW_BACKWARD 1
#define FFTW_FORWARD (-1)
#define FFTW_ESTIMATE 0
#define FFTW_IN_PLACE 8

static fftw_plan fftw_create_plan(int n, int dir, int flags)
{ (void)n; (void)dir; (void)flags; return (fftw_plan)1; }
static void fftw_destroy_plan(fftw_plan p) { (void)p; }
static void fftw_one(fftw_plan p, fftw_complex *in, fftw_complex *out)
{ (void)p; (void)in; (void)out;
  fprintf(stderr, "fftw stub: fftw_one called in a tree-only build\n");
  abort(); }
#endif
