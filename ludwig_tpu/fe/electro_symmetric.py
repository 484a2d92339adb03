"""Electro-symmetric free energy: binary fluid + electrolyte coupling.

TPU-native equivalent of the reference (ref: src/fe_electro_symmetric.c:
epsilon(r) = epsilonbar (1 - gamma phi), gamma = (e1-e2)/(e1+e2) :314-330,
mu_ion_solv = 1/2 deltamu_k (1 + phi) :298-307, phi-potential terms
mu += 1/2 sum_k rho_k deltamu_k + 1/2 gamma epsilonbar E^2 :267-281).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ludwig_tpu.electro import ElectroConfig, electric_field
from ludwig_tpu.fe.symmetric import SymmetricFE


@dataclasses.dataclass(frozen=True)
class ElectroSymmetricFE:
    symm: SymmetricFE
    electro: ElectroConfig
    epsilon1: float               # permittivity in phase phi = +1
    epsilon2: float               # permittivity in phase phi = -1
    deltamu: Tuple[float, ...] = (0.0, 0.0)   # solvation contrast / species

    @property
    def epsilonbar(self) -> float:
        return 0.5 * (self.epsilon1 + self.epsilon2)

    @property
    def gamma(self) -> float:
        return (self.epsilon1 - self.epsilon2) / (self.epsilon1
                                                  + self.epsilon2)

    def var_epsilon(self, phi):
        """epsilon(r) (ref: fe_es_var_epsilon)."""
        return self.epsilonbar * (1.0 - self.gamma * phi)

    def mu_solv(self, phi):
        """Per-species solvation potentials (already /e as the NP fluxes
        expect reduced potentials when e = 1)."""
        return [0.5 * dk * (1.0 + phi) for dk in self.deltamu]

    def mu_phi(self, fields, rho, psi):
        """Binary chemical potential with electro coupling terms."""
        e = electric_field(psi, self.electro)
        e2 = e[0] ** 2 + e[1] ** 2 + e[2] ** 2
        return self.mu_phi_coupled(fields, rho, e2)

    def mu_phi_coupled(self, fields, rho, e2):
        """mu_phi = mu_mix + mu_solv + mu_el with a precomputed E^2
        (physical units; ref: fe_electro_symmetric.c fe_es_mu_phi)."""
        mu = self.symm.mu(fields)
        for k, dk in enumerate(self.deltamu):
            if dk:
                mu = mu + 0.5 * rho[k] * dk
        return mu + 0.5 * self.gamma * self.epsilonbar * e2

    def stress_coupled(self, fields, rho, e, e2):
        """Full coupled stress S = S_symm + S_elec + S_couple (ref:
        fe_electro_symmetric.c fe_es_stress_ex):

          S_elec_ab   = -eps(phi) (E_a E_b - d_ab E^2/2)
          S_couple_ab = d_ab (1/2) phi [eps_bar gamma E^2
                                        + sum_k rho_k deltamu_k]
        """
        import jax.numpy as jnp
        phi = fields["phi"]
        s = self.symm.stress(fields)
        epsloc = self.var_epsilon(phi)
        s_couple = 0.5 * phi * self.epsilonbar * self.gamma * e2
        for k, dk in enumerate(self.deltamu):
            if dk:
                s_couple = s_couple + 0.5 * phi * rho[k] * dk
        rows = []
        for a in range(3):
            row = []
            for b in range(3):
                v = s[a, b] - epsloc * (e[a] * e[b]
                                        - (0.5 * e2 if a == b else 0.0))
                if a == b:
                    v = v + s_couple
                row.append(v)
            rows.append(jnp.stack(row))
        return jnp.stack(rows)

    def fed_coupled(self, fields, rho, psi):
        """fed = f_electro + f_symm + sum_k rho_k mu_solv_k (ref:
        fe_electro_symmetric.c fe_es_fed)."""
        from ludwig_tpu.electro import fe_electro_fed
        fed = fe_electro_fed(rho, self.electro, psi)
        fed = fed + self.symm.fed(fields)
        ms = self.mu_solv(fields["phi"])
        for k in range(len(self.deltamu)):
            fed = fed + rho[k] * ms[k]
        return fed


def poisson_sor_var_epsilon(psi0: jnp.ndarray, rho_el: jnp.ndarray,
                            eps_field: jnp.ndarray, cfg: ElectroConfig,
                            max_its: int = None):
    """Red/black SOR for div(eps grad psi) = -(e beta) rho_el with
    face-averaged permittivities (ref: psi_sor.c variable-epsilon
    variant)."""
    import jax
    import numpy as np
    from ludwig_tpu.ops.stencil import roll3

    shape = psi0.shape
    rhs = cfg.e * cfg.beta * rho_el
    ii, jj, kk = np.indices(shape)
    red = jnp.asarray((ii + jj + kk) % 2 == 0)
    max_its = max_its or cfg.max_its

    # face permittivities (average of the two adjacent sites)
    faces = []
    for ax in range(3):
        s_up = [0, 0, 0]
        s_up[ax] = -1
        s_dn = [0, 0, 0]
        s_dn[ax] = 1
        e_up = 0.5 * (eps_field + roll3(eps_field, tuple(s_up)))
        e_dn = 0.5 * (eps_field + roll3(eps_field, tuple(s_dn)))
        faces.append((e_up, e_dn, tuple(s_up), tuple(s_dn)))

    esum = sum(eu + ed for (eu, ed, _, _) in faces)

    def sweep(p, mask, omega):
        acc = rhs
        for (eu, ed, s_up, s_dn) in faces:
            acc = acc + eu * roll3(p, s_up) + ed * roll3(p, s_dn)
        dpsi = acc / esum - p
        return jnp.where(mask, p + omega * dpsi, p)

    radius = 1.0 - 0.5 * (np.pi / max(shape)) ** 2

    def body(carry, _):
        p, omega = carry
        p = sweep(p, red, omega)
        omega1 = 1.0 / (1.0 - 0.25 * radius * radius * omega)
        p = sweep(p, jnp.logical_not(red), omega1)
        omega2 = 1.0 / (1.0 - 0.25 * radius * radius * omega1)
        return (p, omega2), ()

    (p, _), _ = jax.lax.scan(body, (psi0, 1.0), None, length=max_its)
    return p - jnp.mean(p)
