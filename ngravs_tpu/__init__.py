"""ngravs_tpu — TPU-native N-body + SPH simulation framework.

A ground-up JAX/XLA/Pallas rebuild of GADGET-2.0.7-ngravs (Springel's
cosmological TreePM/SPH code with Kevin Croker's N-gravities extension).
Reference: kcroker/Gadget-2.0.7-ngravs, mounted read-only at /root/reference.
"""

__version__ = "0.1.0"

from .config import SimulationConfig, read_parameter_file
from .particles import Particles, SphState
from .units import set_units
