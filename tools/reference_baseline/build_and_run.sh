#!/bin/sh
# Build and run the C reference (kcroker/Gadget-2.0.7-ngravs) single-rank
# for measured CPU baselines, without MPI/GSL/FFTW installed:
#  - mpi_stub.c      : single-rank MPI-1 (collectives = memcpy)
#  - gsl_stub.c      : xorshift RNG + Simpson qag (comoving tables)
#  - stubinc/*fftw.h : types only; the TreePM tabulation is PMGRID-guarded
# Usage: sh build_and_run.sh [REF_DIR] [WORK_DIR] [TIMEOUT_S]
set -e
REF=${1:-/root/reference}
WORK=${2:-/tmp/refbuild}
T=${3:-3000}
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$WORK/out"
cp "$REF"/*.c "$REF"/*.h "$WORK"/
cp "$HERE"/mpi_stub.c "$HERE"/gsl_stub.c "$WORK"/
cp -r "$HERE"/stubinc "$WORK"/
cd "$WORK"
# the shipped stock options (Makefile.reference:51-99), tree-only
gcc -O3 -g -w -std=gnu89 -fcommon -Istubinc \
  -DN_GRAVS=2 -DNTAB=2048 -DNGRAVS_EN=64 -DNGRAVS_TIMESTEP_SCALE=1.0 \
  -DNGRAVS_STOCK_TESTING -DUNEQUALSOFTENINGS -DPEANOHILBERT -DWALLCLOCK \
  -DDOUBLEPRECISION -DSYNCHRONIZATION \
  -o Gadget2 main.c run.c predict.c begrun.c endrun.c global.c timestep.c \
  init.c restart.c io.c accel.c read_ic.c ngb.c system.c allocate.c \
  density.c gravtree.c hydra.c driftfac.c domain.c allvars.c potential.c \
  forcetree.c peano.c gravtree_forcetest.c pm_periodic.c pm_nonperiodic.c \
  longrange.c ngravs.c ngravs_core.c mpi_stub.c gsl_stub.c -lm
sed -e "s#^InitCondFile.*#InitCondFile $REF/GalaxyCollision.IC#" \
    -e "s#^OutputDir.*#OutputDir $WORK/out/#" \
    -e "s#^TimeLimitCPU.*#TimeLimitCPU 100000#" \
    "$REF/Configuration.reference" > "$WORK/param.txt"
timeout "$T" ./Gadget2 "$WORK/param.txt" || true
echo "--- timings.txt throughput lines:"
grep "part/sec" "$WORK/out/timings.txt" | tail -5
