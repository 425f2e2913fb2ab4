/* Single-rank MPI-1 implementation: collectives become memcpy. */
#include "stubinc/mpi.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>

static size_t dtsize(MPI_Datatype dt) {
    switch (dt) {
    case MPI_BYTE: case MPI_CHAR: return 1;
    case MPI_INT: case MPI_FLOAT: return 4;
    case MPI_DOUBLE: case MPI_LONG: case MPI_LONG_LONG: return 8;
    default: fprintf(stderr, "mpi_stub: unknown dtype %d\n", dt); abort();
    }
}

int MPI_Init(int *argc, char ***argv) { (void)argc; (void)argv; return 0; }
int MPI_Finalize(void) { return 0; }
int MPI_Abort(MPI_Comm c, int e) { (void)c; exit(e); }
int MPI_Comm_rank(MPI_Comm c, int *r) { (void)c; *r = 0; return 0; }
int MPI_Comm_size(MPI_Comm c, int *s) { (void)c; *s = 1; return 0; }
int MPI_Barrier(MPI_Comm c) { (void)c; return 0; }

double MPI_Wtime(void) {
    struct timeval tv;
    gettimeofday(&tv, 0);
    return tv.tv_sec + 1e-6 * tv.tv_usec;
}

int MPI_Bcast(void *b, int n, MPI_Datatype dt, int root, MPI_Comm c)
{ (void)b; (void)n; (void)dt; (void)root; (void)c; return 0; }

int MPI_Allreduce(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op op,
                  MPI_Comm c)
{ (void)op; (void)c; memcpy(r, s, n * dtsize(dt)); return 0; }

int MPI_Reduce(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op op,
               int root, MPI_Comm c)
{ (void)op; (void)root; (void)c; memcpy(r, s, n * dtsize(dt)); return 0; }

int MPI_Allgather(const void *s, int sn, MPI_Datatype st, void *r, int rn,
                  MPI_Datatype rt, MPI_Comm c)
{ (void)rn; (void)rt; (void)c; memcpy(r, s, sn * dtsize(st)); return 0; }

int MPI_Allgatherv(const void *s, int sn, MPI_Datatype st, void *r,
                   const int *rns, const int *displs, MPI_Datatype rt,
                   MPI_Comm c)
{ (void)rns; (void)c;
  memcpy((char *)r + displs[0] * dtsize(rt), s, sn * dtsize(st)); return 0; }

int MPI_Gather(const void *s, int sn, MPI_Datatype st, void *r, int rn,
               MPI_Datatype rt, int root, MPI_Comm c)
{ (void)rn; (void)rt; (void)root; (void)c;
  memcpy(r, s, sn * dtsize(st)); return 0; }

int MPI_Sendrecv(const void *sb, int sn, MPI_Datatype st, int dest, int stag,
                 void *rb, int rn, MPI_Datatype rt, int src, int rtag,
                 MPI_Comm c, MPI_Status *status)
{ (void)rn; (void)rt; (void)stag; (void)rtag; (void)c; (void)status;
  if (dest != 0 || src != 0) { fprintf(stderr, "mpi_stub: nonlocal sendrecv\n"); abort(); }
  memcpy(rb, sb, sn * dtsize(st)); return 0; }

int MPI_Send(const void *b, int n, MPI_Datatype dt, int dest, int tag, MPI_Comm c)
{ (void)b; (void)n; (void)dt; (void)dest; (void)tag; (void)c;
  fprintf(stderr, "mpi_stub: MPI_Send unsupported\n"); abort(); }
int MPI_Ssend(const void *b, int n, MPI_Datatype dt, int dest, int tag, MPI_Comm c)
{ (void)b; (void)n; (void)dt; (void)dest; (void)tag; (void)c;
  fprintf(stderr, "mpi_stub: MPI_Ssend unsupported\n"); abort(); }
int MPI_Recv(void *b, int n, MPI_Datatype dt, int src, int tag, MPI_Comm c,
             MPI_Status *st)
{ (void)b; (void)n; (void)dt; (void)src; (void)tag; (void)c; (void)st;
  fprintf(stderr, "mpi_stub: MPI_Recv unsupported\n"); abort(); }
