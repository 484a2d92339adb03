"""ludwig_tpu: a TPU-native lattice Boltzmann framework for complex fluids.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the
Edinburgh "Ludwig" code (LB hydrodynamics with free-energy order-parameter
coupling, colloids, walls, Lees-Edwards shear, electrokinetics), built
for TPU device meshes: sharded lattices, collective-permute halos, fused
collide-stream kernels.
"""

__version__ = "0.1.0"

from ludwig_tpu.lattice import LatticeModel, lb_model, model_from_name
from ludwig_tpu.lb import LBConfig, initial_rest, initial_from_hydro, make_step
from ludwig_tpu.ops.collide import CollisionParams, RelaxationScheme, collide, equilibrium
from ludwig_tpu.ops.stream import stream, stream_bounce_back
from ludwig_tpu.runtime import RunTime
