"""Free-energy framework: the TPU-native fe_t protocol.

Each free energy is a frozen dataclass with pure-array methods
(ref: src/free_energy.h:54-77 vtable -> Python protocol):

  fed(fields)    -> free-energy density        (X, Y, Z)
  mu(fields)     -> chemical potential(s)      per order parameter
  stress(fields) -> symmetric stress P_ab      (3, 3, X, Y, Z)

``fields`` is a dict of precomputed arrays (order parameter plus its
gradients), so the expensive stencils are computed once per step and
shared between mu / stress / statistics.
"""

from ludwig_tpu.fe.symmetric import SymmetricFE  # noqa: F401
