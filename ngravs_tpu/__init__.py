"""ngravs_tpu — TPU-native N-body + SPH simulation framework.

A ground-up JAX/XLA/Pallas rebuild of GADGET-2.0.7-ngravs (Springel's
cosmological TreePM/SPH code with Kevin Croker's N-gravities extension).
Reference: kcroker/Gadget-2.0.7-ngravs, mounted read-only at /root/reference.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the walk/build kernels take minutes
    to compile on TPU; caching makes that a once-per-machine cost.  Disable
    with NGRAVS_TPU_NO_CACHE=1."""
    if _os.environ.get("NGRAVS_TPU_NO_CACHE"):
        return
    try:
        import jax
        base = _os.environ.get(
            "NGRAVS_TPU_CACHE_DIR",
            _os.path.expanduser("~/.cache/ngravs_tpu_jax"))
        # Key the cache by host machine + CPU feature set: XLA:CPU AOT
        # executables are machine-specific, and loading an entry compiled
        # on a different host emits cpu_aot_loader feature-mismatch errors
        # and risks SIGILL.  (TPU entries are host-independent but a
        # per-host subdir costs only a recompile.)
        import hashlib
        import platform as _plat
        tag = _plat.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        tag += "-" + hashlib.sha1(
                            line.encode()).hexdigest()[:12]
                        break
        except OSError:
            pass
        path = _os.path.join(base, tag)
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .config import SimulationConfig, read_parameter_file
from .particles import Particles, SphState
from .units import set_units
