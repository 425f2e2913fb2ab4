"""Diagnose the end-to-end bench: per-segment wall time, steps, updates.

Mirrors bench.py's configuration but prints one line per Simulation.step()
call so compile events, cap regrows, and per-segment throughput are
visible instead of folded into one number.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ngravs_tpu.config import read_parameter_file
from ngravs_tpu.integrate.runner import Simulation

cfg = read_parameter_file(
    "/root/reference/Configuration.reference",
    init_cond_file="/root/reference/GalaxyCollision.IC",
    output_dir="", time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
    time_bet_statistics=0.0,
    direct_crossover=1000, tree_depth=12,
    walk_ent_cap=512, walk_chunk_cap=1024, walk_frontier_cap=1024)
sim = Simulation(cfg, log_dir="", segment_steps=64)

NCALL = int(os.environ.get("NCALL", 40))
for i in range(NCALL):
    s0, u0 = sim.step_count, sim.num_force_updates
    t0 = time.time()
    sim.step()
    dt = time.time() - t0
    ds = sim.step_count - s0
    du = sim.num_force_updates - u0
    print(f"call {i}: {dt*1e3:8.1f} ms  steps={ds:3d}  updates={du:6d}  "
          f"-> {du/max(dt,1e-9):8.0f} part-steps/s  caps={sim.solver.fcaps}",
          flush=True)
