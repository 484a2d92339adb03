"""Landau-de Gennes liquid-crystal free energy (blue phase / cholesteric).

TPU-native equivalent of the reference blue-phase free energy (ref:
src/blue_phase.c: fe_lc_compute_fed :309, fe_lc_compute_h :~700,
fe_lc_compute_stress :~790, fe_lc_compute_stress_active,
fe_lc_amplitude_compute :1376):

  f = A0/2 (1 - gamma/3) Q^2 - A0 gamma/3 Q^3 + A0 gamma/4 (Q^2)^2
    + kappa0/2 (d_b Q_ab)^2 + kappa1/2 (eps_acd d_c Q_db + 2 q0 Q_ab)^2
    - epsilon E_a Q_ab E_b

with redshifted elastic constants (q0 -> q0/r, kappa -> kappa r^2).

The Q tensor is carried as 5 components (XX, XY, XZ, YY, YZ) like the
reference; all 3x3 contractions (incl. the Levi-Civita chirality sums)
are unrolled at trace time into fused element-wise VPU work.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp

# component order (ref: QXX..QYZ)
XX, XY, XZ, YY, YZ = range(5)

_EPS = {}  # Levi-Civita nonzeros
for (i, j, k, s) in [(0, 1, 2, 1), (1, 2, 0, 1), (2, 0, 1, 1),
                     (0, 2, 1, -1), (2, 1, 0, -1), (1, 0, 2, -1)]:
    _EPS[(i, j, k)] = s


def eps(i, j, k):
    return _EPS.get((i, j, k), 0)


def q5_to_q33(q5):
    """5-component field -> symmetric traceless 3x3 of arrays."""
    qxx, qxy, qxz, qyy, qyz = (q5[i] for i in range(5))
    qzz = -qxx - qyy
    return [[qxx, qxy, qxz], [qxy, qyy, qyz], [qxz, qyz, qzz]]


def q33_to_q5(q33):
    return jnp.stack([q33[0][0], q33[0][1], q33[0][2],
                      q33[1][1], q33[1][2]])


def dq_tensor(grad_q5):
    """grad_q5 (3, 5, X, Y, Z) -> dq[c][a][b] = d_c Q_ab."""
    dq = [[[None] * 3 for _ in range(3)] for _ in range(3)]
    for c in range(3):
        g = grad_q5[c]
        row = q5_to_q33([g[i] for i in range(5)])
        for a in range(3):
            for b in range(3):
                dq[c][a][b] = row[a][b]
    return dq


@dataclasses.dataclass(frozen=True)
class BluePhaseFE:
    """Parameters (ref: fe_lc_param_t; input keys lc_a0, lc_gamma, lc_q0,
    lc_kappa0, lc_kappa1, lc_xi, lc_Gamma, lc_active_zeta, ...)."""

    a0: float
    gamma: float
    q0: float
    kappa0: float
    kappa1: float
    xi: float = 0.0          # flow-alignment
    redshift: float = 1.0
    zeta0: float = 0.0       # active stress (isotropic)
    zeta1: float = 0.0       # active stress ~ Q
    zeta2: float = 0.0       # active stress ~ grad P
    epsilon: float = 0.0     # dielectric anisotropy (includes 1/12pi)
    e0: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def amplitude0(self) -> float:
        """Equilibrium nematic amplitude (ref: fe_lc_amplitude_compute)."""
        return (2.0 / 3.0) * (0.25 + 0.75 * math.sqrt(
            1.0 - 8.0 / (3.0 * self.gamma)))

    @property
    def _rr(self):
        """(q0_redshifted, kappa0_r, kappa1_r)."""
        r = self.redshift
        return (self.q0 / r, self.kappa0 * r * r, self.kappa1 * r * r)

    # fields: {"q": (5,X,Y,Z), "grad_q": (3,5,X,Y,Z), "delsq_q": (5,X,Y,Z)}

    def fed(self, fields):
        """Free energy density (ref: fe_lc_compute_fed)."""
        q = q5_to_q33(fields["q"])
        dq = dq_tensor(fields["grad_q"])
        q0, k0, k1 = self._rr

        q2 = sum(q[a][b] * q[a][b] for a in range(3) for b in range(3))
        q3 = sum(q[a][b] * q[b][c] * q[a][c]
                 for a in range(3) for b in range(3) for c in range(3))

        dq0 = 0.0
        for a in range(3):
            s = sum(dq[b][a][b] for b in range(3))
            dq0 = dq0 + s * s

        dq1 = 0.0
        for a in range(3):
            for b in range(3):
                s = 0.0
                for c in range(3):
                    for d in range(3):
                        e = eps(a, c, d)
                        if e:
                            s = s + e * dq[c][b][d]
                s = s + 2.0 * q0 * q[a][b]
                dq1 = dq1 + s * s

        r3 = 1.0 / 3.0
        out = (0.5 * self.a0 * (1.0 - r3 * self.gamma) * q2
               - r3 * self.a0 * self.gamma * q3
               + 0.25 * self.a0 * self.gamma * q2 * q2
               + 0.5 * k0 * dq0 + 0.5 * k1 * dq1)
        if any(self.e0) and self.epsilon:
            ef = sum(self.e0[a] * q[a][b] * self.e0[b]
                     for a in range(3) for b in range(3))
            out = out - self.epsilon * ef
        return out

    def fed_bulk_grad(self, fields):
        """(bulk, gradient) free energy densities for the LC statistics
        split (ref: fe_lc_stats.c blue_phase_fbg)."""
        q = q5_to_q33(fields["q"])
        dq = dq_tensor(fields["grad_q"])
        q0, k0, k1 = self._rr
        r3 = 1.0 / 3.0

        q2 = sum(q[a][b] * q[a][b] for a in range(3) for b in range(3))
        q3 = sum(q[a][b] * q[b][c] * q[a][c]
                 for a in range(3) for b in range(3) for c in range(3))
        bulk = (0.5 * self.a0 * (1.0 - r3 * self.gamma) * q2
                - r3 * self.a0 * self.gamma * q3
                + 0.25 * self.a0 * self.gamma * q2 * q2)

        dq0 = 0.0
        for a in range(3):
            s = sum(dq[b][a][b] for b in range(3))
            dq0 = dq0 + s * s
        dq1 = 0.0
        for a in range(3):
            for b in range(3):
                s = 0.0
                for c in range(3):
                    for d in range(3):
                        e = eps(a, c, d)
                        if e:
                            s = s + e * dq[c][b][d]
                s = s + 2.0 * q0 * q[a][b]
                dq1 = dq1 + s * s
        grad = 0.5 * k0 * dq0 + 0.5 * k1 * dq1
        return bulk, grad

    def surface_fs(self, qs, nhat, anchor: str, w1: float, w2: float,
                   nfix=(0.0, 1.0, 0.0)):
        """Anchoring surface free energy density at one boundary face,
        f_s = w1/2 (Q-Q0)^2 + w2/2 sum_ab (Qt_ab^2 - S0^2)^2
        (ref: fe_lc_stats.c blue_phase_fs, colloids_q_boundary).

        qs: 3x3 nested list of arrays; nhat: outward normal (3 scalars
        or arrays)."""
        amp = self.amplitude0
        s0 = 1.5 * amp
        if anchor == "fixed":
            nh = nfix
        else:
            nh = nhat
        if anchor in ("normal", "fixed"):
            q0b = [[0.5 * amp * (3.0 * nh[a] * nh[b] - (a == b))
                    for b in range(3)] for a in range(3)]
        elif anchor == "planar":
            qt = [[qs[a][b] + (0.5 * amp if a == b else 0.0)
                   for b in range(3)] for a in range(3)]
            q0b = [[sum(((a == g) - nhat[a] * nhat[g]) * qt[g][h]
                        * ((h == b) - nhat[h] * nhat[b])
                        for g in range(3) for h in range(3))
                    - (0.5 * amp if a == b else 0.0)
                    for b in range(3)] for a in range(3)]
        else:
            q0b = [[0.0 * qs[0][0] for _ in range(3)] for _ in range(3)]
        f1 = sum((qs[a][b] - q0b[a][b]) ** 2
                 for a in range(3) for b in range(3))
        f2 = 0.0
        for a in range(3):
            for b in range(3):
                qt = qs[a][b] + (0.5 * amp if a == b else 0.0)
                f2 = f2 + (qt * qt - s0 * s0) ** 2
        return 0.5 * w1 * f1 + 0.5 * w2 * f2

    def molecular_field(self, fields):
        """h[a][b] 3x3 list of arrays (ref: fe_lc_compute_h)."""
        q = q5_to_q33(fields["q"])
        dq = dq_tensor(fields["grad_q"])
        dsq = q5_to_q33(fields["delsq_q"])
        q0, k0, k1 = self._rr
        a0, gamma = self.a0, self.gamma
        r3 = 1.0 / 3.0

        q2 = sum(q[a][b] * q[a][b] for a in range(3) for b in range(3))

        h = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                s = sum(q[a][c] * q[b][c] for c in range(3))
                val = (-a0 * (1.0 - r3 * gamma) * q[a][b]
                       + a0 * gamma * (s - (r3 * q2 if a == b else 0.0))
                       - a0 * gamma * q2 * q[a][b])
                h[a][b] = val

        # gradient terms
        eq = 0.0
        for b in range(3):
            for c in range(3):
                for a in range(3):
                    e = eps(b, c, a)
                    if e:
                        eq = eq + e * dq[b][c][a]

        for a in range(3):
            for b in range(3):
                s = 0.0
                for c in range(3):
                    for d in range(3):
                        e1 = eps(a, c, d)
                        if e1:
                            s = s + e1 * dq[c][b][d]
                        e2 = eps(b, c, d)
                        if e2:
                            s = s + e2 * dq[c][a][d]
                val = (h[a][b] + k0 * dsq[a][b] - 2.0 * k1 * q0 * s
                       - 4.0 * k1 * q0 * q0 * q[a][b])
                if a == b:
                    val = val + 4.0 * r3 * k1 * q0 * eq
                h[a][b] = val

        if any(self.e0) and self.epsilon:
            e2t = sum(v * v for v in self.e0)
            for a in range(3):
                for b in range(3):
                    h[a][b] = h[a][b] + self.epsilon * (
                        self.e0[a] * self.e0[b] - (r3 * e2t if a == b else 0.0))
        return h

    def stress(self, fields, h=None):
        """Full (symmetric + antisymmetric) thermodynamic stress
        (3, 3, X, Y, Z)  (ref: fe_lc_compute_stress)."""
        q = q5_to_q33(fields["q"])
        dq = dq_tensor(fields["grad_q"])
        if h is None:
            h = self.molecular_field(fields)
        q0, k0, k1 = self._rr
        xi = self.xi
        r3 = 1.0 / 3.0

        p0 = -self.fed(fields)
        qh = sum(q[a][b] * h[a][b] for a in range(3) for b in range(3))

        sth = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                val = 2.0 * xi * (q[a][b] + (r3 if a == b else 0.0)) * qh
                if a == b:
                    val = val - p0
                for c in range(3):
                    val = val - xi * h[a][c] * (q[b][c]
                                                + (r3 if b == c else 0.0))
                    val = val - xi * (q[a][c]
                                      + (r3 if a == c else 0.0)) * h[b][c]
                # gradient term
                for c in range(3):
                    for d in range(3):
                        val = val - k0 * dq[a][b][c] * dq[d][c][d] \
                            - k1 * dq[a][c][d] * dq[b][c][d] \
                            + k1 * dq[a][c][d] * dq[c][b][d]
                        for ee in range(3):
                            ev = eps(b, c, ee)
                            if ev:
                                val = val - 2.0 * k1 * q0 * ev \
                                    * dq[a][c][d] * q[d][ee]
                # antisymmetric part
                for c in range(3):
                    val = val + q[a][c] * h[b][c] - h[a][c] * q[b][c]
                sth[a][b] = -val
        return jnp.stack([jnp.stack(row) for row in sth])

    def active_stress(self, fields):
        """Active contribution (ref: fe_lc_compute_stress_active,
        documented branch), already sign-flipped for the divergence."""
        if self.zeta0 == 0.0 and self.zeta1 == 0.0:
            return None
        q = q5_to_q33(fields["q"])
        rows = []
        for a in range(3):
            row = []
            for b in range(3):
                val = -self.zeta0 if a == b else 0.0
                val = val + self.zeta1 * q[a][b]
                row.append(val + jnp.zeros_like(q[0][0]))
            rows.append(jnp.stack(row))
        return jnp.stack(rows)

def redshift_compute(fe, fields, redshift_old):
    """New redshift from the current Q configuration (ref:
    blue_phase.c:1443 fe_lc_redshift_compute, enabled by
    lc_redshift_update): minimise the gradient free energy over the
    redshift r, with kappa(r) = kappa r^2 and q0(r) = q0/r:

      r_new = -egrad_linear / (2 egrad_square)

    egrad_linear = sum_sites 2 q0 kappa1 sum_ab Q_ab e_agd d_g Q_db
    egrad_square = sum_sites (kappa1 |dQ|^2 - kappa1 dQ:dQ^T
                              + kappa0 (div Q)^2) / 2

    using the UNREDSHIFTED input parameters.  Falls back to the old
    value when |r_new| < 1e-11 or the square term vanishes."""
    import jax.numpy as jnp
    q = q5_to_q33(fields["q"])
    dq = dq_tensor(fields["grad_q"])  # dq[c][a][b] = d_c Q_ab

    dq0 = 0.0
    for a in range(3):
        s = sum(dq[b][a][b] for b in range(3))
        dq0 = dq0 + s * s
    dq1 = 0.0
    dq2 = 0.0
    dq3 = 0.0
    for a in range(3):
        for b in range(3):
            for g in range(3):
                dq1 = dq1 + dq[g][a][b] * dq[g][a][b]
                dq2 = dq2 + dq[a][b][g] * dq[b][a][g]
            s = 0.0
            for g in range(3):
                for d in range(3):
                    e = eps(a, g, d)
                    if e:
                        s = s + e * dq[g][d][b]
            dq3 = dq3 + q[a][b] * s
    e0 = jnp.sum(2.0 * fe.q0 * fe.kappa1 * dq3)
    e1 = jnp.sum(0.5 * (fe.kappa1 * dq1 - fe.kappa1 * dq2
                        + fe.kappa0 * dq0))
    rnew = jnp.where(e1 != 0.0, -0.5 * e0 / jnp.where(e1 != 0.0, e1, 1.0),
                     redshift_old)
    return jnp.where(jnp.abs(rnew) < 1e-11, redshift_old, rnew)
