"""Stage-timed probe of the exact bench.py workload: where does the
first compile go?  Prints wall time after every stage, flushing, so a
supervising shell can see progress even if a later stage wedges."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
T0 = time.time()


def mark(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


mark("importing")
from ngravs_tpu.config import read_parameter_file
from ngravs_tpu.integrate.runner import Simulation

mark("imports done; reading config")
cfg = read_parameter_file(
    "/root/reference/Configuration.reference",
    init_cond_file="/root/reference/GalaxyCollision.IC",
    output_dir="", time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
    time_bet_statistics=0.0,
    direct_crossover=1000, tree_depth=12,
    walk_ent_cap=512, walk_chunk_cap=1024, walk_frontier_cap=1024)
seg = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mark(f"config read; building Simulation (segment_steps={seg})")
sim = Simulation(cfg, log_dir="", segment_steps=seg)
sim.solver.fcaps["chunk"] = 16384
sim.solver.fcaps["frontier"] = (
    1, 8, 64, 256, 1024, 4096, 2048, 2048, 2048, 1024, 64, 64, 64)
sim.solver.octet_caps = (
    1, 1, 8, 64, 192, 384, 320, 320, 320, 128, 8, 8, 8)
sim.solver._tightened = True
mark("Simulation built; step 1 (compile)")
sim.step()
mark(f"step 1 done (steps={sim.step_count}, upd={sim.num_force_updates})")
sim.step()
mark(f"step 2 done (steps={sim.step_count}, upd={sim.num_force_updates})")
t0 = time.time()
n0 = sim.num_force_updates
s0 = sim.step_count
while sim.step_count - s0 < 8:
    sim.step()
dt = time.time() - t0
upd = sim.num_force_updates - n0
mark(f"8 more step() calls: {dt:.2f}s, {upd} updates "
     f"-> {upd/max(dt,1e-9):.0f} part-steps/s")
