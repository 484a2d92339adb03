"""Top-level orchestration: run a simulation from a reference-format
input file.

TPU-native equivalent of the reference main loop (ref: src/ludwig.c:443
ludwig_run, src/main.c:30-46 reads a file named "input" in the cwd).
Parses the same key-value input surface (size, viscosity, free_energy,
A/B/K, mobility, phi_initialisation, boundary_walls, freq_statistics,
...), builds the system, runs the time loop, and writes the statistics
blocks to the log in the reference's exact formats so reference-style
FP-tolerant diffs apply.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import ludwig_tpu
from ludwig_tpu.binary import (BinaryConfig, initial_binary,
                               make_binary_step, fe_fields, spinodal_phi)
from ludwig_tpu.fe.blue_phase import BluePhaseFE
from ludwig_tpu.fe import lc_init
from ludwig_tpu.fe.symmetric import SymmetricFE
from ludwig_tpu.lb import (LBConfig, initial_rest, make_step, solid_mask)
from ludwig_tpu.lc import LCConfig, initial_lc, lc_fields, make_lc_step
from ludwig_tpu.ops.collide import RelaxationScheme
from ludwig_tpu.runtime import RunTime, RunTimeError
from ludwig_tpu import stats


def _fused_plan(size):
    """Largest (BX <= 16, BY <= 32 with BY % 8 == 0) fused-kernel block
    plan that divides the lattice, or None."""
    from ludwig_tpu.ops.fused import FusedPlan
    bx = next((b for b in (16, 8, 4, 2, 1) if size[0] % b == 0), None)
    by = next((b for b in (32, 24, 16, 8) if size[1] % b == 0), None)
    if bx is None or by is None:
        return None
    return FusedPlan(bx, by)


@dataclasses.dataclass
class System:
    """A configured simulation: state + step + reporting."""

    rt: RunTime
    lb_cfg: LBConfig
    binary_cfg: Optional[BinaryConfig]
    solid: Optional[jnp.ndarray]
    state: tuple                 # (f,) or (f, phi|q, u)
    step_fn: object
    lc_cfg: Optional[LCConfig] = None
    two_field_cfg: Optional[object] = None
    droplet_cfg: Optional[object] = None
    polar_cfg: Optional[object] = None
    colloid_params: Optional[object] = None
    electro_cfg: Optional[object] = None
    lb2_cfg: Optional[object] = None           # symmetric_lb (ndist = 2)
    wallspec: Optional[object] = None          # plain-fluid halo walls
    le_cfg: Optional[object] = None            # Lees-Edwards planes
    n_start: int = 0
    hydro_on: bool = True
    vol_flux: bool = False
    fe_solid_ops: Optional[object] = None      # two-field wetting stencils
    has_kiss: bool = False    # per-site KISS noise state rides the state
    colloid_charge: Optional[tuple] = None     # (N, 2) input charges
    es_cfg: Optional[object] = None   # fe_electro_symmetric coupled run
    # 'plain' | 'lc' | 'binary' | 'droplet': Pallas production fast path
    fused_mode: Optional[str] = None
    step_nfn: Optional[object] = None  # sharded fused n-step (f, n) -> f
    fused_unpadded: bool = False       # sharded fused state is unpadded

    @property
    def is_binary(self) -> bool:
        return self.binary_cfg is not None

    @property
    def is_lc(self) -> bool:
        return self.lc_cfg is not None

    @property
    def is_two_field(self) -> bool:
        return self.two_field_cfg is not None

    @property
    def is_droplet(self) -> bool:
        return self.droplet_cfg is not None

    @property
    def is_colloid(self) -> bool:
        return self.colloid_params is not None

    @property
    def is_polar(self) -> bool:
        return self.polar_cfg is not None

    @property
    def is_electro(self) -> bool:
        return self.electro_cfg is not None

    @property
    def is_binary_lb(self) -> bool:
        return self.lb2_cfg is not None

    @property
    def fluid_mask(self):
        if self.solid is None:
            return None
        return jnp.logical_not(self.solid)


_FORCE_METHODS = ("no_force", "stress_divergence", "phi_gradmu",
                  "phi_gradmu_correction", "relaxation_symmetric",
                  "relaxation_antisymmetric")


def _force_method(rt: RunTime, default: str) -> str:
    """Validated fe_force_method (ref: fe_force_method.h enum;
    fe_force_method_rt.c 'not recognised')."""
    m = rt.string("fe_force_method", default)
    if m not in _FORCE_METHODS:
        raise ValueError(f"fe_force_method '{m}' not recognised")
    return m


def _relaxation(rt: RunTime) -> RelaxationScheme:
    name = rt.string("lb_relaxation_scheme", "m10").lower()
    return {"m10": RelaxationScheme.M10, "bgk": RelaxationScheme.BGK,
            "trt": RelaxationScheme.TRT}[name]


def _symm_fe(rt: RunTime) -> SymmetricFE:
    """Symmetric FE parameters; both the legacy A/B/K spellings and the
    preferred symmetric_a/b/kappa names are accepted (ref:
    symmetric_rt.c:45-86)."""
    if rt.has_key("symmetric_a"):
        return SymmetricFE(a=rt.double_required("symmetric_a"),
                           b=rt.double_required("symmetric_b"),
                           kappa=rt.double_required("symmetric_kappa"))
    return SymmetricFE(a=rt.double_required("A"),
                       b=rt.double_required("B"),
                       kappa=rt.double_required("K"))


def _phi_init(rt: RunTime, size, fe) -> np.ndarray:
    """phi initialisation modes (ref: src/phi_rt.c / field_phi_init.c).
    fe may be None (non-symmetric FEs); interface-width-based modes then
    use the phi_init_width key."""
    class _W:
        xi0 = rt.double("phi_init_width", 1.0)
    if fe is None:
        fe = _W()
    mode = rt.string("phi_initialisation", "spinodal")
    phi0 = rt.double("phi0", 0.0)
    seed = rt.int("random_seed", 13)
    if mode == "spinodal":
        from ludwig_tpu.ref_rng import spinodal_ref
        return spinodal_ref(size, seed, phi0,
                            amp=rt.double("noise", 0.1))
    if mode == "patches":
        from ludwig_tpu.ref_rng import patches_ref
        return patches_ref(size, seed,
                           patch=rt.int("phi_init_patch_size", 1),
                           volminus1=rt.double("phi_init_patch_vol", 0.5))
    if mode == "uniform":
        return np.full(size, phi0)
    if mode in ("drop",):
        # centre at 0.5 L in 1-based site coordinates (ref:
        # field_phi_init.c:60-75, is_centred = 0 default)
        radius = rt.double("phi_init_drop_radius", 0.25 * size[0])
        amp = rt.double("phi_init_drop_amplitude", 1.0)
        centred = 0.5 if rt.switch("phi_init_drop_centred") else 0.0
        x = np.arange(1, size[0] + 1) - centred - 0.5 * size[0]
        y = np.arange(1, size[1] + 1) - centred - 0.5 * size[1]
        z = np.arange(1, size[2] + 1) - centred - 0.5 * size[2]
        r = np.sqrt(x[:, None, None] ** 2 + y[None, :, None] ** 2
                    + z[None, None, :] ** 2)
        return amp * np.tanh((r - radius) / fe.xi0)
    if mode == "block":
        # slab with interfaces at z = L/4 and 3L/4
        # (ref: field_phi_init.c field_phi_init_block)
        z = np.arange(1, size[2] + 1, dtype=np.float64)
        lz = float(size[2])
        xi = fe.xi0
        prof = np.where(z > 0.5 * lz, np.tanh((z - 0.75 * lz) / xi),
                        -np.tanh((z - 0.25 * lz) / xi))
        return np.broadcast_to(prof[None, None, :], size).copy()
    if mode in ("block_X", "block_Y", "block_Z"):
        # central block of given width along one axis (ref:
        # field_phi_init.c field_phi_init_block_X/Y/Z; coordinate is
        # the plain 1-based global index, no 0.5 offset)
        axis = {"block_X": 0, "block_Y": 1, "block_Z": 2}[mode]
        width = rt.double("phi_init_block_dimension", 10.0)
        ln = float(size[axis])
        x = np.arange(1, size[axis] + 1, dtype=np.float64)
        x1 = 0.5 * (ln - width)
        x2 = 0.5 * (ln + width)
        prof = np.where(x > 0.5 * ln, np.tanh((x - x2) / fe.xi0),
                        -np.tanh((x - x1) / fe.xi0))
        shape = [1, 1, 1]
        shape[axis] = size[axis]
        return np.broadcast_to(prof.reshape(shape), size).copy()
    raise ValueError(f"phi_initialisation '{mode}' not implemented")


def _distribution_init(rt: RunTime, lb_cfg: LBConfig):
    """distribution_initialisation modes (ref: src/distribution_rt.c:
    lb_init_poiseuille :lb_init_poiseuille, 2d Kelvin-Helmholtz :303-330,
    2d shear wave).  Site coordinates are x = i + 0.5 (ref lmin = 0.5)."""
    from ludwig_tpu.lb import initial_from_hydro
    mode = rt.string("distribution_initialisation", "rest")
    size = lb_cfg.size
    if mode == "rest" or mode is None:
        return initial_rest(lb_cfg)

    x = (np.arange(size[0]) + 0.5) / 1.0
    y = (np.arange(size[1]) + 0.5) / 1.0
    z = (np.arange(size[2]) + 0.5) / 1.0
    rho = np.full(size, lb_cfg.rho0)
    u = np.zeros((3,) + size)

    if mode == "1d_poiseuille":
        umax = rt.double_vector("distribution_poiseuille_umax",
                                (0.0, 0.0, 0.0))
        L = np.array(size, float)
        u[0] += (umax[0] * x * (L[0] - x) * 4.0 / L[0] ** 2)[:, None, None]
        u[1] += (umax[1] * y * (L[1] - y) * 4.0 / L[1] ** 2)[None, :, None]
        u[2] += (umax[2] * z * (L[2] - z) * 4.0 / L[2] ** 2)[None, None, :]
    elif mode == "2d_kelvin_helmholtz":
        u0 = rt.double_required("2d_kelvin_helmholtz_u0")
        delta = rt.double_required("2d_kelvin_helmholtz_delta")
        kappa = rt.double_required("2d_kelvin_helmholtz_kappa")
        xs = x / size[0]
        ys = y / size[1]
        ux = np.where(ys > 0.5, u0 * np.tanh(kappa * (0.75 - ys)),
                      u0 * np.tanh(kappa * (ys - 0.25)))
        u[0] += ux[None, :, None]
        u[1] += (u0 * delta * np.sin(2.0 * np.pi * (xs + 0.25)))[:, None,
                                                                 None]
    elif mode == "2d_shear_wave":
        u0 = rt.double("distribution_uniform_u0", 0.04)
        kappa = 2.0 * np.pi
        u[0] += (u0 * np.sin(kappa * y / size[1]))[None, :, None]
    elif mode == "3d_uniform_u":
        u0 = rt.double_vector("distribution_uniform_u", (0.0, 0.0, 0.0))
        for a in range(3):
            u[a] += u0[a]
    else:
        raise ValueError(f"distribution_initialisation '{mode}'"
                         " not implemented")
    return initial_from_hydro(lb_cfg, rho, u)


def _ternary_init(rt: RunTime, size):
    """(phi0, psi0) ternary composition fields (ref:
    src/fe_ternary_rt.c:102-160, src/field_ternary_init.c; components
    c1=(phi +1, psi 0), c2=(-1, 0), c3=(0, 1))."""
    mode = rt.string("ternary_initialisation", "")
    nx, ny = size[0], size[1]
    x = np.arange(1, nx + 1, dtype=np.float64)[:, None, None] \
        + np.zeros(size)
    y = np.arange(1, ny + 1, dtype=np.float64)[None, :, None] \
        + np.zeros(size)
    if mode == "2d_double_emulsion":
        x1 = rt.double("2d_double_emulsion_xf1", 0.2) * nx
        x2 = rt.double("2d_double_emulsion_xf2", 0.5) * nx
        x3 = rt.double("2d_double_emulsion_xf3", 0.8) * nx
        y1 = rt.double("2d_double_emulsion_yf1", 0.3) * ny
        y2 = rt.double("2d_double_emulsion_yf2", 0.7) * ny
        iny = (y1 < y) & (y < y2)
        c1 = (x1 < x) & (x < x2) & iny
        c2 = (x2 <= x) & (x < x3) & iny
        phi = np.where(c1, 1.0, np.where(c2, -1.0, 0.0))
        psi = np.where(c1 | c2, 0.0, 1.0)
        return phi, psi
    if mode == "2d_tee":
        x1 = rt.double("ternary_2d_tee_xf1", 0.50) * nx
        y1 = rt.double("tarnary_2d_tee_yf1", 0.33) * ny  # (sic)
        c3 = y < y1
        c1 = ~c3 & (x < x1)
        phi = np.where(c3, 0.0, np.where(c1, 1.0, -1.0))
        psi = np.where(c3, 1.0, 0.0)
        return phi, psi
    return None


def _lc_anchoring_params(rt: RunTime, fe):
    """Anchoring key parsing, both 'two' (older) and 's7' styles
    (ref: src/blue_phase_rt.c:192-380)."""
    from ludwig_tpu.ops.lc_anchor import AnchoringParams
    method = rt.string("lc_anchoring_method", "s7")
    nfix = rt.double_vector("lc_wall_fixed_orientation", (0.0, 1.0, 0.0))
    nrm = np.sqrt(sum(c * c for c in nfix)) or 1.0
    nfix = tuple(c / nrm for c in nfix)
    if method == "two":
        coll = rt.string("lc_coll_anchoring", "none")
        wall = rt.string("lc_wall_anchoring", coll)
        w1 = rt.double("lc_anchoring_strength", 0.0)
        w2 = rt.double("lc_anchoring_strength_2", 0.0)
        w1_wall, w2_wall = w1, (w2 if wall == "planar" else 0.0)
        w1_coll, w2_coll = w1, w2
        if coll in ("normal", "fixed"):
            w2_coll = 0.0
        wc = rt.double("lc_anchoring_strength_colloid", None)
        if wc is not None:
            w1_coll = wc
            w2_coll = wc if coll == "planar" else 0.0
        ww = rt.double("lc_anchoring_strength_wall", None)
        if ww is not None:
            w1_wall = ww
            w2_wall = ww if wall == "planar" else 0.0
    else:
        wall = rt.string("lc_wall_anchoring", "none")
        coll = rt.string("lc_coll_anchoring", "none")
        w1_wall = rt.double("lc_wall_anchoring_w1", 0.0)
        w2_wall = rt.double("lc_wall_anchoring_w2", 0.0)
        w1_coll = rt.double("lc_coll_anchoring_w1", 0.0)
        w2_coll = rt.double("lc_coll_anchoring_w2", 0.0)
    return AnchoringParams(
        kappa0=fe.kappa0, kappa1=fe.kappa1, q0=fe.q0,
        amplitude=fe.amplitude0,
        wall=wall, wall_w1=w1_wall, wall_w2=w2_wall, wall_nfix=nfix,
        coll=coll, coll_w1=w1_coll, coll_w2=w2_coll,
        method="s7" if method == "s7" else "two")


def _parse_colloids(rt, size, rho0, eta):
    """Parse the colloid_* input keys into (ColloidParams, r0,
    v0, types, al, force_fn), or None when no colloids are
    requested (ref: colloids_rt.c colloids_init_rt,
    interaction.c interact_compute).
    """
    cinit = rt.string("colloid_init", "none")
    if not (cinit.startswith("input_") or cinit == "from_file"):
        return None
    qq = []
    angles = []
    rngs = []
    fixedr = []
    ss = []
    drs, ws = [], []     # from_file deferred move + angular velocity
    from ludwig_tpu.colloids import ColloidParams, make_colloid_step
    a0, ah, rr, vv = [], [], [], []
    b1, b2, mm, typ = [], [], [], []
    al, bonds, itypes = [], [], []
    if cinit == "input_random":
        # serial random placement (ref: colloids_init.c:82-123
        # colloids_init_random_set; ran.c serial stream seeded by
        # random_seed).  Positions are 1-based lattice coords there;
        # ours are 0-based (shift by lmin = 0.5 ... +1).
        from ludwig_tpu.ref_rng import RanSerial
        nc = rt.int("colloid_random_no", 0)
        dh = rt.double("colloid_random_dh", 0.0)
        ra0 = rt.double_required("colloid_random_a0")
        rah = rt.double("colloid_random_ah", ra0)
        rng = RanSerial(rt.int("random_seed", 7361237))
        amax = rah + dh
        lex = [amax * (0.0 if p else 1.0)
               for p in rt.int_vector("periodicity", (1, 1, 1))]
        for _ in range(nc):
            r0 = [0.5 + lex[a] + rng.uniform() * (size[a] - 2.0 * lex[a])
                  for a in range(3)]
            rr.append([c - 1.0 for c in r0])
            a0.append(ra0)
            ah.append(rah)
            vv.append((0.0, 0.0, 0.0))
            b1.append(0.0)
            b2.append(0.0)
            mm.append((1.0, 0.0, 0.0))
            typ.append(rt.string("colloid_random_type", "default"))
    elif cinit == "from_file":
        import os
        from ludwig_tpu.io.colloid_io import read_colloid_file
        nstart = rt.int("N_start", 0)
        if nstart > 0:
            # restart: the config dump of the generating run
            # (ref: colloid_io.c config.cds%8.8d.%3.3d-%3.3d)
            stub = rt.string("colloid_file_stub", "config.cds")
            path = f"{stub}{nstart:08d}.001-001"
        else:
            stub = rt.string("colloid_file_stub", "config.cds")
            # the reference reads <stub>.init for fresh runs but plain
            # <stub>.%3.3d-%3.3d files also appear in the suites
            # (e.g. colloids-serial-pair.001-001)
            for cand in (stub + ".init", stub + ".init.001-001",
                         stub + ".001-001", stub):
                if os.path.exists(cand):
                    path = cand
                    break
            else:
                path = stub + ".init"
        recs = read_colloid_file(path)
        for ni, rec in enumerate(recs):
            a0.append(rec["a0"])
            ah.append(rec["ah"])
            al.append(rec.get("al", 0.0))
            rr.append([c - 1.0 for c in rec["r"]])
            vv.append(tuple(rec["v"]))
            drs.append(tuple(rec.get("dr", (0.0, 0.0, 0.0))))
            ws.append(tuple(rec.get("w", (0.0, 0.0, 0.0))))
            b1.append(rec["b1"])
            b2.append(rec["b2"])
            mv = rec["m"]
            mm.append(tuple(mv) if any(mv) else (1.0, 0.0, 0.0))
            typ.append({0: "default", 1: "active",
                        2: "subgrid"}.get(rec["type"], "default"))
            qq.append((rec.get("q0", 0.0), rec.get("q1", 0.0)))
            rngs.append(rec.get("rng", 1 + ni))
            ss.append(tuple(rec.get("s", (0.0, 0.0, 0.0))))
            _fx = rec.get("isfixedr", 0)
            _fxv = rec.get("isfixedrxyz", [_fx, _fx, _fx])
            if _fx and not any(_fxv):
                _fxv = [1, 1, 1]
            fixedr.append(tuple(_fxv))
            for bi in range(rec.get("nbonds", 0)):
                other = rec["bond"][bi] - 1
                if other > ni:   # record each bond once
                    bonds.append((ni, other))
        nc = len(recs)
    else:
        nc = {"input_one": 1, "input_two": 2, "input_three": 3}[cinit]
        names = ["one", "two", "three"][:nc]
        for ni, nm in enumerate(names):
            a0.append(rt.double_required(f"colloid_{nm}_a0"))
            ah.append(rt.double(f"colloid_{nm}_ah", a0[-1]))
            al.append(rt.double(f"colloid_{nm}_al", 0.0))
            rv = rt.double_vector(f"colloid_{nm}_r", (0.0, 0.0, 0.0))
            rr.append([c - 1.0 for c in rv])  # 1-based -> 0-based
            vv.append(rt.double_vector(f"colloid_{nm}_v",
                                       (0.0, 0.0, 0.0)))
            b1.append(rt.double(f"colloid_{nm}_b1", 0.0))
            b2.append(rt.double(f"colloid_{nm}_b2", 0.0))
            ss.append(tuple(rt.double_vector(f"colloid_{nm}_s",
                                             (0.0, 0.0, 0.0))))
            mv = rt.double_vector(f"colloid_{nm}_m", (1.0, 0.0, 0.0))
            nrm = np.sqrt(sum(c * c for c in mv)) or 1.0
            mm.append(tuple(c / nrm for c in mv))
            typ.append(rt.string(f"colloid_{nm}_type", "default"))
            itypes.append(rt.int(f"colloid_{nm}_interact_type", 0))
            qq.append((rt.double(f"colloid_{nm}_q0", 0.0),
                       rt.double(f"colloid_{nm}_q1", 0.0)))
            _fx = rt.int(f"colloid_{nm}_isfixedr", 0)
            _fxv = rt.int_vector(f"colloid_{nm}_isfixedrxyz",
                                 (_fx, _fx, _fx))
            fixedr.append(tuple(_fxv))
            mybonds = []
            for bi in range(rt.int(f"colloid_{nm}_nbonds", 0)):
                other = rt.int(f"colloid_{nm}_bond{bi + 1}", 0) - 1
                mybonds.append(other)
                if other > ni:   # record each bond once
                    bonds.append((ni, other))
            if rt.int(f"colloid_{nm}_nangles", 0) and len(mybonds) >= 2:
                # the single supported angle spans the two bonds
                # (ref: angle_cosine.c:161-167)
                angles.append((mybonds[0], ni, mybonds[1]))
    grav = tuple(rt.double_vector("colloid_gravity", (0.0, 0.0, 0.0)))
    if rt.switch("calibration", False):
        # hydrodynamic-radius calibration: drive the single particle
        # with a fixed force in the reference's literal random
        # direction (ref: stats_calibration.c:120-143)
        a_ = max(ah)
        L_ = float(size[2])
        fh = (1.0 - 2.837 * (a_ / L_) + 4.19 * (a_ / L_) ** 3
              - 27.4 * (a_ / L_) ** 6)
        utarget = eta * 0.05 / (a_ * rho0)
        ftarget = 6.0 * np.pi * eta * a_ * utarget / fh
        grav = (+5.02274083742018e-01 * ftarget,
                -1.05061333197473e-01 * ftarget,
                -8.58302313330149e-01 * ftarget)
    cparams = ColloidParams(a0=tuple(a0), ah=tuple(ah),
                            rho0=rho0, gravity=grav,
                            b1=tuple(b1), b2=tuple(b2), m=tuple(mm),
                            types=tuple(typ), isfixedr=tuple(fixedr),
                            bonds=tuple(tuple(b) for b in bonds),
                            angles=tuple(tuple(a) for a in angles))
    # pairwise/bond interactions -> per-particle force callback
    # (ref: interact_compute, interaction.c:182)
    force_terms = []
    if rt.int("angle_cosine_on", 0) and angles:
        from ludwig_tpu.interactions import angle_cosine_forces
        ak = rt.double_required("angle_cosine_k")
        aarr = np.array(angles, np.int32)
        force_terms.append(lambda R, V: angle_cosine_forces(
            R, size, aarr, ak))
    if rt.int("bond_fene_on", 0) and bonds:
        from ludwig_tpu.interactions import fene_bond_forces
        fk = rt.double_required("bond_fene_k")
        fr0 = rt.double_required("bond_fene_r0")
        barr = np.array(bonds, np.int32)
        force_terms.append(lambda R, V: fene_bond_forces(
            R, size, barr, fk, fr0))
    if rt.switch("pair_ss_cut_ij", False) and nc > 1:
        # per-pair-type soft sphere (ref: pair_ss_cut_ij.c; vector
        # keys hold the upper triangle by type pair)
        from ludwig_tpu.interactions import soft_sphere_ij_forces
        nt = rt.int("pair_ss_cut_ij_ntypes", 1)
        tri = [(i, j) for i in range(nt) for j in range(i, nt)]

        def _mat(key):
            vals = rt.double_vector(key, (0.0,) * len(tri))
            m = np.zeros((nt, nt))
            for (i, j), v in zip(tri, vals):
                m[i, j] = m[j, i] = v
            return m
        eps_m, sig_m = _mat("pair_ss_cut_ij_epsilon"), \
            _mat("pair_ss_cut_ij_sigma")
        nu_m, hc_m = _mat("pair_ss_cut_ij_nu"), \
            _mat("pair_ss_cut_ij_hc")
        it = np.array(itypes + [0] * (nc - len(itypes)), int)
        epp, spp = eps_m[np.ix_(it, it)], sig_m[np.ix_(it, it)]
        npp, hpp = nu_m[np.ix_(it, it)], hc_m[np.ix_(it, it)]
        # guard zeros to keep the arithmetic finite where eps == 0
        spp = np.where(spp == 0.0, 1.0, spp)
        hpp = np.where(hpp == 0.0, 1.0, hpp)
        ah_arr2 = jnp.asarray(np.array(ah))
        force_terms.append(lambda R, V: soft_sphere_ij_forces(
            R, ah_arr2, size, epp, spp, npp, hpp)[0])
    if rt.int("soft_sphere_on", 0) and nc > 1:
        from ludwig_tpu.interactions import soft_sphere_forces
        eps_ = rt.double_required("soft_sphere_epsilon")
        sig_ = rt.double_required("soft_sphere_sigma")
        nu_ = rt.double_required("soft_sphere_nu")
        hc_ = rt.double_required("soft_sphere_cutoff")
        ah_arr = jnp.asarray(np.array(ah))
        force_terms.append(lambda R, V: soft_sphere_forces(
            R, ah_arr, size, eps_, sig_, nu_, hc_)[0])
    if rt.int("lennard_jones_on", 0) and nc > 1:
        from ludwig_tpu.interactions import lj_cut_forces
        lj_eps = rt.double_required("lj_epsilon")
        lj_sig = rt.double_required("lj_sigma")
        lj_rc = rt.double_required("lj_cutoff")
        force_terms.append(lambda R, V: lj_cut_forces(
            R, size, lj_eps, lj_sig, lj_rc))
    if rt.int("yukawa_on", 0) and nc > 1:
        from ludwig_tpu.interactions import yukawa_forces
        yk_eps = rt.double_required("yukawa_epsilon")
        yk_kap = rt.double_required("yukawa_kappa")
        yk_rc = rt.double_required("yukawa_cutoff")
        force_terms.append(lambda R, V: yukawa_forces(
            R, size, yk_eps, yk_kap, yk_rc))
    f0_driven = rt.double("driving_force_magnitude", 0.0)
    if f0_driven != 0.0:
        # driven colloid: constant force f0 along the particle's spin
        # direction s (ref: driven_colloid.c driven_colloid_force;
        # key driven_colloid_rt.c 'driving_force_magnitude')
        s_arr = jnp.asarray(np.array(
            ss + [(0.0, 0.0, 0.0)] * (nc - len(ss)), np.float64))
        force_terms.append(lambda R, V: f0_driven * s_arr)
    if rt.int("lubrication_on", 0) and nc > 1:
        ah_arr3 = jnp.asarray(np.array(ah))
        rcn = rt.double("lubrication_normal_cutoff", 0.0)
        rct = rt.double("lubrication_tangential_cutoff", 0.0)
        if rcn > 0.0:
            from ludwig_tpu.interactions import lubrication_normal
            force_terms.append(lambda R, V: lubrication_normal(
                R, V, ah_arr3, size, eta, rcn))
        if rct > 0.0:
            from ludwig_tpu.interactions import lubrication_tangential
            force_terms.append(lambda R, V: lubrication_tangential(
                R, V, ah_arr3, size, eta, rct))
    force_fn = None
    if force_terms:
        def force_fn(R, V):
            out = force_terms[0](R, V)
            for ft in force_terms[1:]:
                out = out + ft(R, V)
            return out
    if len(qq) < len(rr):
        qq = qq + [(0.0, 0.0)] * (len(rr) - len(qq))
    if len(rngs) < len(rr):
        rngs = rngs + [1 + i for i in range(len(rngs), len(rr))]
    if len(ss) < len(rr):
        ss = ss + [(0.0, 0.0, 0.0)] * (len(rr) - len(ss))
    if len(drs) < len(rr):
        drs = drs + [(0.0, 0.0, 0.0)] * (len(rr) - len(drs))
        ws = ws + [(0.0, 0.0, 0.0)] * (len(rr) - len(ws))
    return cparams, rr, vv, typ, al, force_fn, qq, rngs, ss, (drs, ws)


def build_system(rt: RunTime) -> System:
    size = tuple(rt.int_vector("size", (64, 64, 64)))
    eta = rt.double("viscosity", 1.0 / 6.0)
    eta_b = rt.double("viscosity_bulk", eta)
    rho0 = rt.double("fluid_rho0", 1.0)
    force = tuple(rt.double_vector("force", (0.0, 0.0, 0.0)))
    walls = tuple(bool(w) for w in rt.int_vector("boundary_walls",
                                                 (0, 0, 0)))
    # old key "ghost_modes", new preferred "lb_ghost_modes"
    # (ref: collision_rt.c:87-92)
    ghosts = rt.switch("ghost_modes", rt.switch("lb_ghost_modes", True))
    dtype = rt.string("dtype", "float64")  # our extension key

    # 2-D inputs use size Z=1 with d2q9
    nvel = rt.int("lb_nvel", 9 if size[2] == 1 else 19)

    # fluctuations (ref: temperature + isothermal_fluctuations keys;
    # symmetric_noise selects order-parameter noise)
    from ludwig_tpu.noise import NoiseConfig
    kt = rt.double("temperature", 0.0)
    fe_name_peek = rt.string("free_energy", "none")
    nz = None
    if kt > 0.0:
        nz = NoiseConfig(kt=kt,
                         seed=rt.int("random_seed", 8361235),
                         rho=rt.switch(
                             "isothermal_fluctuations",
                             rt.switch("lb_fluctuations", False)),
                         phi=(fe_name_peek == "symmetric_noise"
                              and rt.int("fd_phi_fluctuations", 0) != 0))
        if not (nz.rho or nz.phi):
            nz = None

    lb_cfg = LBConfig(size=size, nvel=nvel, eta_shear=eta, eta_bulk=eta_b,
                      rho0=rho0, scheme=_relaxation(rt),
                      ghost_modes_on=ghosts, force_global=force,
                      walls=walls, dtype=dtype, noise=nz)
    porous = None
    pm_wetting = None            # per-site (C, H) map data at solids
    pm_file = rt.string("porous_media_file")
    if pm_file:
        if pm_file.endswith(".npy") or os.path.exists(pm_file + ".npy"):
            # native path: a bare solid mask
            porous = np.load(pm_file if pm_file.endswith(".npy")
                             else pm_file + ".npy").astype(bool)
        else:
            # reference convention: the key is a switch and the file
            # stub is "capillary" (ref: map_rt.c:100-176); ndata from
            # porous_media_ndata or the legacy porous_media_type key
            from ludwig_tpu.io.map_file import read_map
            ndata = rt.int("porous_media_ndata", -1)
            if ndata < 0:
                ndata = {"status_only": 0, "status_with_h": 1,
                         "status_with_sigma": 1,
                         "status_with_c_h": 2}.get(
                    rt.string("porous_media_type", "status_only"), 0)
            fmt = rt.string("porous_media_format", "BINARY")
            stub = pm_file if os.path.exists(pm_file) else \
                (pm_file + ".001-001"
                 if os.path.exists(pm_file + ".001-001")
                 else "capillary.001-001")
            status, data = read_map(stub, size, ndata,
                                    binary=not fmt.startswith("ASCII"))
            porous = status != 0
            if ndata == 2:
                pm_wetting = (jnp.asarray(data[0]), jnp.asarray(data[1]))
            elif ndata == 1:
                pm_wetting = (jnp.zeros(size), jnp.asarray(data[0]))
    elif rt.string("porous_media_init"):
        # simple geometries from the input file (ref: map_rt.c:252-295,
        # map_init.c)
        from ludwig_tpu.io.map_file import GEOMETRIES
        gname = rt.string("porous_media_init")
        if gname not in GEOMETRIES:
            raise RunTimeError(
                f"porous_media_init not recognised {gname}")
        acell = (rt.int_required("porous_media_acell")
                 if gname.endswith("cubic") else 0)
        porous = GEOMETRIES[gname](size, acell) != 0
    solid = solid_mask(lb_cfg, porous=porous)

    fe_name = rt.string("free_energy", "none")

    # composition-dependent viscosity (ref: visc_rt.c, visc_arrhenius.c)
    visc_model = None
    if rt.string("viscosity_model", "newtonian") == "arrhenius":
        from ludwig_tpu.visc import ViscArrhenius
        visc_model = ViscArrhenius(
            eta_minus=rt.double_required("viscosity_arrhenius_eta_minus"),
            eta_plus=rt.double_required("viscosity_arrhenius_eta_plus"),
            phistar=rt.double("viscosity_arrhenius_phistar", 1.0))

    if fe_name == "brazovskii":
        from ludwig_tpu.fe.brazovskii import BrazovskiiFE
        fe = BrazovskiiFE(a=rt.double_required("A"),
                          b=rt.double_required("B"),
                          kappa=rt.double_required("K"),
                          c=rt.double_required("C"))
        bcfg = BinaryConfig(
            lb=lb_cfg, fe=fe,
            mobility=rt.double("mobility", 1.0),
            advection_order=rt.int("fd_advection_scheme_order", 1),
            gradient=rt.string("fd_gradient_calculation", "3d_7pt_fluid"),
            hydrodynamics=rt.switch("hydrodynamics", True))
        phi0 = _phi_init(rt, size, None)
        nplanes_bz = rt.int("N_LE_plane", 0)
        if nplanes_bz > 0:
            # Brazovskii under Lees-Edwards shear (level-4 LE
            # gradients; ref: gradient_2d_5pt_fluid.c d2+d4 passes)
            from ludwig_tpu.binary_le import (BinaryLEConfig,
                                              make_binary_le_step)
            from ludwig_tpu.ops.le_ref import le_fields_2d5pt_d4
            from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                                     le_init_shear_profile)
            le = LeesEdwardsConfig(
                nplanes=nplanes_bz,
                uy=rt.double_required("LE_plane_vel"), nx=size[0],
                omega=2.0 * np.pi / rt.double("LE_oscillation_period",
                                              0.0)
                if rt.double("LE_oscillation_period", 0.0) else 0.0)
            lecfg = BinaryLEConfig(binary=bcfg, le=le)
            if rt.switch("LE_init_profile", False):
                f = le_init_shear_profile(lb_cfg, le)
            else:
                f = initial_rest(lb_cfg)
            jd = lb_cfg.jdtype
            phi = jnp.asarray(phi0, jd)
            g0, d20 = le_fields_2d5pt_d4(phi, le, 0)[:2]
            state = (f, phi, jnp.zeros((3,) + size, jd))
            if nz is not None and nz.kiss and nz.rho:
                from ludwig_tpu.noise_kiss import kiss_init
                state = state + (kiss_init(0, size),)
            state = state + (g0, d20)
            step = make_binary_le_step(lecfg, keep_grads=True)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg,
                          solid=None, state=state, step_fn=step,
                          le_cfg=le)
        state = initial_binary(bcfg, phi0)
        step = make_binary_step(bcfg, solid=solid)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg, solid=solid,
                      state=state, step_fn=step)

    if fe_name in ("surfactant", "ternary"):
        from ludwig_tpu.two_field import (TwoFieldConfig, initial_two_field,
                                          make_two_field_step)
        if fe_name == "surfactant":
            from ludwig_tpu.fe.surfactant import SurfactantFE
            fe = SurfactantFE(a=rt.double_required("surf_A"),
                              b=rt.double_required("surf_B"),
                              kappa=rt.double_required("surf_kappa"),
                              kt=rt.double_required("surf_kT"),
                              epsilon=rt.double_required("surf_epsilon"),
                              beta=rt.double("surf_beta", 0.0),
                              w=rt.double("surf_W", 0.0))
            m0 = rt.double("mobility", 1.0)
            mob = (rt.double("surf_mobility_phi", m0),
                   rt.double("surf_mobility_psi", m0))
            psi0_mean = rt.double("surf_psi0", 0.01)
        else:
            from ludwig_tpu.fe.ternary import TernaryFE
            _h1 = rt.double("ternary_h1", 0.0)
            _h2 = rt.double("ternary_h2", 0.0)
            _k3 = rt.double_required("ternary_kappa3")
            fe = TernaryFE(alpha=rt.double_required("ternary_alpha"),
                           kappa1=rt.double_required("ternary_kappa1"),
                           kappa2=rt.double_required("ternary_kappa2"),
                           kappa3=_k3,
                           h1=_h1, h2=_h2,
                           h3=-_k3 * (_h1
                                      / rt.double_required("ternary_kappa1")
                                      + _h2
                                      / rt.double_required("ternary_kappa2")))
            m0 = rt.double("mobility", 1.0)
            mob = (rt.double("ternary_mobility_phi", m0),
                   rt.double("ternary_mobility_psi", m0))
            psi0_mean = rt.double("ternary_psi0", 0.0)
        default_method = ("phi_gradmu" if fe_name == "ternary"
                          else "stress_divergence")
        tcfg = TwoFieldConfig(
            lb=lb_cfg, fe=fe, mobilities=mob,
            advection_order=rt.int("fd_advection_scheme_order", 1),
            gradient=rt.string("fd_gradient_calculation", "3d_7pt_fluid"),
            hydrodynamics=rt.switch("hydrodynamics", True),
            force_method=_force_method(rt, default_method))
        tinit = (_ternary_init(rt, size) if fe_name == "ternary"
                 else None)
        if tinit is not None:
            phi0, psi0 = tinit
        else:
            phi0 = _phi_init(rt, size, fe if fe_name == "surfactant"
                             else None)
            if (rt.string("psi_initialisation", "") == "uniform"):
                # (ref: field_psi_init_rt.c:46-57)
                psi0_mean = rt.double_required("psi_initialisation_psi0")
            psi0 = np.full(size, psi0_mean)
        solid_ops = None
        ws = None
        if tcfg.gradient.endswith("ternary_solid"):
            # Semprebon wetting gradients hrka (Eq. 24-26; ref:
            # gradient_2d_ternary_solid.c:104-106, h3 from the
            # constraint h1/k1 + h2/k2 + h3/k3 = 0, fe_ternary_rt.c:77)
            from ludwig_tpu.ops.solid_stencil import ternary_solid_ops
            k1, k2, k3 = fe.kappa1, fe.kappa2, fe.kappa3
            a2 = fe.alpha * fe.alpha
            hrka = ((-fe.h1 / k1 + fe.h2 / k2) / a2,
                    (-fe.h3 / k3) / a2)
            two_d = tcfg.gradient.startswith("2d")
            if any(walls) and porous is None:
                from ludwig_tpu.ops.walls import WallSpec
                ws = WallSpec(walls=walls)
                lb_cfg = dataclasses.replace(lb_cfg, walls=(False,) * 3)
                tcfg = dataclasses.replace(tcfg, lb=lb_cfg)
                solid = None   # halo walls: no stored solid sites
            fl = None if solid is None else jnp.logical_not(solid)
            if solid is not None or ws is not None:
                solid_ops = tuple(
                    ternary_solid_ops(size, hrka[n], fluid=fl,
                                      walls=(ws.walls if ws is not None
                                             else (False,) * 3),
                                      two_d=two_d)
                    for n in range(2))
            else:
                # no solid anywhere: reduces to the fluid stencil of
                # the same shape (ref: serial-tern-st2.inp comment)
                solid_ops = tuple(
                    ternary_solid_ops(size, 0.0, fluid=None,
                                      walls=(False,) * 3, two_d=two_d)
                    for n in range(2))
        state = initial_two_field(tcfg, phi0, psi0)
        if ws is not None:
            state = state + (jnp.zeros((3,), tcfg.lb.jdtype),)
        step = make_two_field_step(tcfg, solid=solid, wallspec=ws,
                                   solid_ops=solid_ops)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None, solid=solid,
                      state=state, step_fn=step, two_field_cfg=tcfg,
                      wallspec=ws, fe_solid_ops=solid_ops)

    if (fe_name == "symmetric_lb"
            and rt.string("colloid_init", "") in ("", "none",
                                                  "no_colloids")):
        # two-distribution binary fluid (ref: collision.c
        # lb_collision_mrt2, ludwig.c ndist == 2 path)
        from ludwig_tpu.binary_lb import (BinaryLBConfig, initial_binary_lb,
                                          make_binary_lb_step)
        fe = _symm_fe(rt)
        grad2 = rt.string("fd_gradient_calculation", "3d_27pt_fluid")
        if grad2 == "3d_27pt_solid":
            # no solid sites: reduces to the fluid 27pt stencil
            # (ref: gradient_3d_27pt_solid.c:5-7)
            grad2 = "3d_27pt_fluid"
        ws2 = None
        if any(walls) and porous is None:
            from ludwig_tpu.ops.walls import WallSpec
            ws2 = WallSpec(walls=walls)
            lb_cfg = dataclasses.replace(lb_cfg, walls=(False,) * 3)
            solid = None
            if grad2 == "3d_27pt_fluid" and rt.string(
                    "fd_gradient_calculation", "") == "3d_27pt_solid":
                grad2 = "3d_27pt_solid"   # walls need the solid stencil
        l2cfg = BinaryLBConfig(
            lb=lb_cfg, fe=fe,
            mobility=rt.double("mobility", 0.15),
            gradient=grad2)
        phi0 = _phi_init(rt, size, fe)
        state = initial_binary_lb(l2cfg, phi0)
        if ws2 is not None:
            # insert the wall-momentum accumulator before any noise
            # state: (f, g, u, gwall[, noise])
            state = tuple(state[:3]) + (
                jnp.zeros((3,), lb_cfg.jdtype),) + tuple(state[3:])
        le2 = None
        nplanes2 = rt.int("N_LE_plane", 0)
        if nplanes2 > 0:
            # symmetric_lb under Lees-Edwards shear (ref: model_le.c
            # le_reproject handles both distributions)
            from ludwig_tpu.ops.le_ref import le_gradient
            from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                                     le_init_shear_profile)
            le2 = LeesEdwardsConfig(
                nplanes=nplanes2,
                uy=rt.double_required("LE_plane_vel"), nx=size[0],
                omega=2.0 * np.pi / rt.double("LE_oscillation_period",
                                              0.0)
                if rt.double("LE_oscillation_period", 0.0) else 0.0)
            if rt.switch("LE_init_profile", False):
                state = (le_init_shear_profile(lb_cfg, le2),) + tuple(
                    state[1:])
            phi_g = jnp.asarray(phi0, lb_cfg.jdtype)
            grad0, delsq0 = le_gradient(phi_g, le2, 0, l2cfg.gradient)
            state = tuple(state) + (grad0, delsq0)
        step = make_binary_lb_step(l2cfg, wallspec=ws2, le=le2)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None, solid=solid,
                      state=state, step_fn=step, lb2_cfg=l2cfg,
                      wallspec=ws2, le_cfg=le2)

    _has_colloids = rt.string("colloid_init", "none") not in (
        "none", "no_colloids", "")
    if (fe_name in ("symmetric", "symmetric_noise", "symmetric_lb")
            and not (fe_name in ("symmetric", "symmetric_lb")
                     and _has_colloids)):
        fe = _symm_fe(rt)
        default_grad = "3d_7pt_fluid" if size[2] > 1 else "2d_5pt_fluid"
        bcfg = BinaryConfig(
            lb=lb_cfg, fe=fe,
            mobility=rt.double("mobility", 1.0),
            advection_order=rt.int("fd_advection_scheme_order", 1),
            gradient=rt.string("fd_gradient_calculation", default_grad),
            hydrodynamics=rt.switch("hydrodynamics", True),
            force_method=_force_method(rt, "stress_divergence"),
            gradmu_ex=tuple(rt.double_vector("grad_mu", (0.0, 0.0, 0.0))),
            visc_model=visc_model,
            wetting=(pm_wetting if pm_wetting is not None
                     else (0.0, 0.0)))
        if (bcfg.gradient == "3d_27pt_solid" and solid is None
                and not any(walls)):
            # no solid sites anywhere: the solid stencil reduces to the
            # fluid 27pt one (ref: gradient_3d_27pt_solid.c:5-7)
            bcfg = dataclasses.replace(bcfg, gradient="3d_27pt_fluid")
        phi0 = _phi_init(rt, size, fe)
        if any(walls) and porous is None:
            # halo plane walls: every stored site stays fluid
            from ludwig_tpu.ops.walls import WallSpec
            ws = WallSpec(walls=walls)
            lb_cfg = dataclasses.replace(lb_cfg, walls=(False,) * 3)
            bcfg = dataclasses.replace(bcfg, lb=lb_cfg)
            if rt.switch("lb_bc_open", False):
                # open x boundary + transverse walls (ref:
                # serial-open-phi; lb_bc_* + phi_bc_* open conditions)
                from ludwig_tpu.binary import (make_binary_open_step,
                                               open_x_scalar_ops)
                from ludwig_tpu.ops.open_bc import OpenBCConfig
                obc = OpenBCConfig(
                    u0=tuple(rt.double_vector("lb_bc_inflow_rhou_u0",
                                              (0.0, 0.0, 0.0))),
                    rho0=rt.double("lb_bc_outflow_rhou_rho0", 1.0))
                phib = rt.double("phi_bc_inflow_fixed_phib", 0.0)
                f = _distribution_init(rt, lb_cfg)
                state = (f, jnp.asarray(phi0, lb_cfg.jdtype),
                         jnp.zeros((3,) + size, lb_cfg.jdtype),
                         jnp.zeros((3,), lb_cfg.jdtype))
                step = make_binary_open_step(bcfg, ws, obc, phib)
                return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg,
                              solid=None, state=state, step_fn=step,
                              wallspec=ws,
                              fe_solid_ops=open_x_scalar_ops(bcfg, ws,
                                                             phib))
            f = initial_rest(lb_cfg)
            state = (f, jnp.asarray(phi0, lb_cfg.jdtype),
                     jnp.zeros((3,) + size, lb_cfg.jdtype),
                     jnp.zeros((3,), lb_cfg.jdtype))
            step = make_binary_step(bcfg, wallspec=ws)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg,
                          solid=None, state=state, step_fn=step,
                          wallspec=ws)
        nplanes = rt.int("N_LE_plane", 0)
        if nplanes > 0 and fe_name == "symmetric":
            from ludwig_tpu.binary_le import (BinaryLEConfig,
                                              make_binary_le_step)
            from ludwig_tpu.ops.le_ref import le_gradient
            from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                                     le_init_shear_profile)
            le = LeesEdwardsConfig(nplanes=nplanes,
                                   uy=rt.double_required("LE_plane_vel"),
                                   nx=size[0],
                                   omega=2.0 * np.pi / rt.double(
                                       "LE_oscillation_period", 0.0)
                                   if rt.double("LE_oscillation_period",
                                                0.0) else 0.0)
            lecfg = BinaryLEConfig(binary=bcfg, le=le)
            if rt.switch("LE_init_profile", False):
                f = le_init_shear_profile(lb_cfg, le)
            else:
                f = initial_rest(lb_cfg)
            jd = lb_cfg.jdtype
            phi = jnp.asarray(phi0, jd)
            fused_req = rt.string("tpu_fused", "off")
            if (fused_req != "off" and solid is None and not any(walls)
                    and nz is None
                    and bcfg.force_method == "stress_divergence"
                    and not any(bcfg.gradmu_ex) and visc_model is None
                    and bcfg.wetting == (0.0, 0.0)
                    and bcfg.gradient == "3d_7pt_fluid"
                    and bcfg.advection_order in (1, 2)
                    and bcfg.hydrodynamics
                    and size[0] >= 6 * nplanes):
                # sheared production fast path: fused binary kernels +
                # LE column fixes (ref: model_le.c:57 +
                # phi_ch_le_fix_fluxes)
                plan = _fused_plan(size)
                interp = fused_req == "interpret"
                if plan is not None and (interp or (size[2] % 128 == 0
                                         and lb_cfg.dtype == "float32")):
                    from ludwig_tpu.ops.fused import pad_state
                    from ludwig_tpu.ops.fused_binary import (
                        BinaryPlan, make_fused_binary_le_step, pad_phi)
                    step = make_fused_binary_le_step(
                        lecfg, BinaryPlan(min(8, plan.BX), plan.BY),
                        lb_plan=plan, interpret=interp)
                    state = (pad_state(f, zpad=False), pad_phi(phi),
                             jnp.zeros((3,) + size, jd))
                    return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg,
                                  solid=None, state=state, step_fn=step,
                                  le_cfg=le, fused_mode="binary")
            grad, delsq = le_gradient(phi, le, 0, bcfg.gradient)
            state = (f, phi, jnp.zeros((3,) + size, jd), grad, delsq)
            step = make_binary_le_step(lecfg, keep_grads=True)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg,
                          solid=None, state=state, step_fn=step,
                          le_cfg=le)
        fused_req = rt.string("tpu_fused", "off")
        if (fused_req != "off" and fe_name == "symmetric"
                and solid is None and not any(walls) and nz is None
                and bcfg.force_method == "stress_divergence"
                and not any(bcfg.gradmu_ex) and visc_model is None
                and bcfg.wetting == (0.0, 0.0)
                and bcfg.gradient == "3d_7pt_fluid"
                and bcfg.advection_order in (1, 2)
                and bcfg.hydrodynamics):
            # production fast path: the two-kernel Pallas binary step
            # (ops/fused_binary.py) replaces the jnp CH pipeline
            # (ref: the step wiring at ludwig.c:679-860)
            plan = _fused_plan(size)
            interp = fused_req == "interpret"
            if plan is not None and (interp or (size[2] % 128 == 0
                                     and lb_cfg.dtype == "float32")):
                from ludwig_tpu.ops.fused_binary import (
                    BinaryPlan, initial_fused_binary,
                    make_fused_binary_step)
                step = make_fused_binary_step(
                    bcfg, BinaryPlan(min(8, plan.BX), plan.BY),
                    lb_plan=plan, interpret=interp)
                return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg,
                              solid=None,
                              state=initial_fused_binary(bcfg, phi0),
                              step_fn=step, fused_mode="binary")
        state = initial_binary(bcfg, phi0)   # appends KISS noise states
        has_kiss = nz is not None and nz.kiss and (nz.phi or nz.rho)
        step = make_binary_step(bcfg, solid=solid)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg, solid=solid,
                      state=state, step_fn=step, has_kiss=has_kiss)

    if fe_name == "polar_active":
        from ludwig_tpu.fe.polar_active import PolarActiveFE
        from ludwig_tpu.polar import (PolarConfig, initial_polar,
                                      make_polar_step, polar_init_aster)
        fe = PolarActiveFE(a=rt.double_required("polar_active_a"),
                           b=rt.double_required("polar_active_b"),
                           kappa1=rt.double_required("polar_active_k"),
                           delta=rt.double("polar_active_dk", 0.0),
                           lambda_=rt.double("polar_active_lambda", 0.0),
                           zeta=rt.double("polar_active_zeta", 0.0))
        pcfg = PolarConfig(
            lb=lb_cfg, fe=fe,
            gamma=rt.double("leslie_ericksen_gamma", 0.3),
            swim=rt.double("leslie_ericksen_swim", 0.0),
            advection_order=rt.int("fd_advection_scheme_order", 1),
            gradient=rt.string("fd_gradient_calculation", "3d_7pt_fluid"),
            hydrodynamics=rt.switch("hydrodynamics", True))
        mode = rt.string("polar_active_initialisation", "aster")
        if mode == "aster":
            p0 = polar_init_aster(size)
        else:
            raise ValueError(f"polar init '{mode}' not implemented")
        state = initial_polar(pcfg, p0)
        step = make_polar_step(pcfg, solid=solid)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None, solid=solid,
                      state=state, step_fn=step, polar_cfg=pcfg)

    if fe_name == "lc_droplet":
        from ludwig_tpu.fe.lc_droplet import LCDropletFE
        from ludwig_tpu.lc_droplet_sim import (LCDropletConfig,
                                               initial_droplet,
                                               make_droplet_step)
        symm = _symm_fe(rt)
        lcfe = BluePhaseFE(
            a0=rt.double_required("lc_a0"),
            gamma=rt.double_required("lc_gamma"),
            q0=rt.double_required("lc_q0"),
            kappa0=rt.double_required("lc_kappa0"),
            kappa1=rt.double_required("lc_kappa1"),
            xi=rt.double("lc_xi", 0.0),
            redshift=rt.double("lc_init_redshift", 1.0))
        fe = LCDropletFE(symm=symm, lc=lcfe,
                         gamma0=rt.double_required("lc_droplet_gamma"),
                         delta=rt.double_required("lc_droplet_delta"),
                         w=rt.double("lc_droplet_W", 0.0))
        dcfg = LCDropletConfig(
            lb=lb_cfg, fe=fe,
            mobility=rt.double("mobility", 0.05),
            gamma=rt.double("lc_Gamma", 0.5),
            advection_order=rt.int("fd_advection_scheme_order", 1),
            gradient=rt.string("fd_gradient_calculation", "3d_7pt_fluid"),
            force_method=_force_method(rt, "stress_divergence"))
        phi0 = _phi_init(rt, size, symm)
        amp = rt.double("lc_q_init_amplitude", lcfe.amplitude0)
        mode = rt.string("lc_q_initialisation", "nematic")
        if mode.startswith("cholesteric") or mode == "twist":
            axis = {"x": 0, "y": 1, "z": 2}[mode[-1]] \
                if mode[-1] in "xyz" else 2
            q5 = lc_init.lc_init_twist(size, lcfe.q0, amp, axis=axis)
        elif mode == "o8m":
            q5 = lc_init.lc_init_o8m(size, lcfe.q0, amp)
        elif mode == "o2":
            q5 = lc_init.lc_init_o2(size, lcfe.q0, amp)
        elif mode == "random":
            q5 = lc_init.lc_init_random(size, amp)
        elif mode == "nematic":
            q5 = lc_init.lc_init_nematic(
                size, amp, tuple(rt.double_vector("lc_init_nematic",
                                                  (1.0, 0.0, 0.0))))
        else:
            raise ValueError(f"lc_q_initialisation '{mode}' for droplet")
        nplanes_d = rt.int("N_LE_plane", 0)
        if nplanes_d > 0:
            # sheared LC droplet (ref: ludwig.c:693-742 under lees_edw:
            # bodyforce + flux-route force + LE CH/BE updates)
            if solid is not None or any(walls):
                raise ValueError("lc_droplet + Lees-Edwards does not "
                                 "compose with walls/porous media")
            from ludwig_tpu.lc_droplet_sim import make_droplet_le_step
            from ludwig_tpu.ops.lees_edwards import (
                LeesEdwardsConfig, le_init_shear_profile)
            le = LeesEdwardsConfig(nplanes=nplanes_d,
                                   uy=rt.double_required("LE_plane_vel"),
                                   nx=size[0])
            jd = lb_cfg.jdtype
            if rt.switch("LE_init_profile", False):
                f = le_init_shear_profile(lb_cfg, le)
            else:
                f = initial_rest(lb_cfg)
            fused_req = rt.string("tpu_fused", "off")
            if (fused_req != "off" and nz is None
                    and dcfg.gradient == "3d_7pt_fluid"
                    and dcfg.force_method == "stress_divergence"
                    and dcfg.advection_order == 1
                    and size[0] >= 8 * nplanes_d):
                # sheared coupled fast path: the Pallas phi+Q kernel
                # with LE column fixes (ref: lc_droplet.c +
                # model_le.c:57)
                plan = _fused_plan(size)
                interp = fused_req == "interpret"
                if plan is not None and (interp or (size[2] % 128 == 0
                                         and lb_cfg.dtype == "float32")):
                    from ludwig_tpu.ops.fused import pad_state
                    from ludwig_tpu.ops.fused_binary import pad_phi
                    from ludwig_tpu.ops.fused_droplet import (
                        DropletPlan, make_fused_droplet_le_step)
                    from ludwig_tpu.ops.fused_lc import pad_q
                    step = make_fused_droplet_le_step(
                        dcfg, le, DropletPlan(min(8, plan.BX), plan.BY),
                        lb_plan=plan, interpret=interp)
                    state = (pad_state(f, zpad=False),
                             pad_phi(jnp.asarray(phi0, jd)),
                             pad_q(jnp.asarray(q5, jd)),
                             jnp.zeros((3,) + size, jd))
                    return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                                  solid=None, state=state, step_fn=step,
                                  droplet_cfg=dcfg, le_cfg=le,
                                  fused_mode="droplet")
            state = (f, jnp.asarray(phi0, jd), jnp.asarray(q5, jd),
                     jnp.zeros((3,) + size, jd))
            step = make_droplet_le_step(dcfg, le)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                          solid=None, state=state, step_fn=step,
                          droplet_cfg=dcfg, le_cfg=le)
        fused_req = rt.string("tpu_fused", "off")
        if (fused_req != "off" and solid is None and not any(walls)
                and nz is None and dcfg.gradient == "3d_7pt_fluid"
                and dcfg.force_method == "stress_divergence"
                and dcfg.advection_order in (1, 2)):
            # production fast path: the two-kernel Pallas phi+Q step
            # (ops/fused_droplet.py) replaces the jnp coupled pipeline
            # (ref: the step wiring at ludwig.c:679-860)
            plan = _fused_plan(size)
            interp = fused_req == "interpret"
            if plan is not None and (interp or (size[2] % 128 == 0
                                     and lb_cfg.dtype == "float32")):
                from ludwig_tpu.ops.fused_droplet import (
                    DropletPlan, initial_fused_droplet,
                    make_fused_droplet_step)
                step = make_fused_droplet_step(
                    dcfg, DropletPlan(min(8, plan.BX), plan.BY),
                    lb_plan=plan, interpret=interp)
                return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                              solid=None,
                              state=initial_fused_droplet(dcfg, phi0, q5),
                              step_fn=step, droplet_cfg=dcfg,
                              fused_mode="droplet")
        state = initial_droplet(dcfg, phi0, q5)
        step = make_droplet_step(dcfg, solid=solid)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None, solid=solid,
                      state=state, step_fn=step, droplet_cfg=dcfg)

    if fe_name == "lc_blue_phase":
        active = rt.switch("lc_activity", False)
        fe = BluePhaseFE(
            a0=rt.double_required("lc_a0"),
            gamma=rt.double_required("lc_gamma"),
            q0=rt.double_required("lc_q0"),
            kappa0=rt.double_required("lc_kappa0"),
            kappa1=rt.double_required("lc_kappa1"),
            xi=rt.double("lc_xi", 0.0),
            redshift=rt.double("lc_init_redshift", 1.0),
            zeta0=rt.double("lc_active_zeta0", 0.0) if active else 0.0,
            zeta1=(rt.double("lc_active_zeta", 0.0) or
                   rt.double("lc_active_zeta1", 0.0)) if active else 0.0,
            # input is the raw anisotropy; the free energy carries the
            # 1/(12 pi) factor (ref: blue_phase.c:252)
            epsilon=rt.double("lc_dielectric_anisotropy", 0.0)
            / (12.0 * np.pi),
            e0=tuple(rt.double_vector("electric_e0", (0.0, 0.0, 0.0))))
        gradient = rt.string("fd_gradient_calculation", "3d_7pt_fluid")
        anchoring = None
        wallspec = None
        if any(walls):
            from ludwig_tpu.ops.walls import WallSpec
            wallspec = WallSpec(walls=walls)
            # LC walls live in the halo: all sites stay fluid
            lb_cfg = dataclasses.replace(lb_cfg, walls=(False,) * 3)
            solid = None
        if gradient in ("3d_7pt_solid", "s7_anchoring"):
            anchoring = _lc_anchoring_params(rt, fe)
        lcfg = LCConfig(
            lb=lb_cfg, fe=fe,
            gamma=rt.double("lc_Gamma", 0.1),
            advection_order=rt.int("fd_advection_scheme_order", 1),
            gradient=gradient,
            hydrodynamics=rt.switch("hydrodynamics", True),
            wallspec=wallspec, anchoring=anchoring, keep_grads=True,
            redshift_update=rt.switch("lc_redshift_update", False),
            noise_kt=(rt.double("temperature", 0.0)
                      if rt.switch("lc_noise", False) else 0.0),
            noise_seed=rt.int("random_seed", 8361235))
        nplanes_lc = rt.int("N_LE_plane", 0)
        mode = rt.string("lc_q_initialisation", "nematic")
        amp = rt.double("lc_q_init_amplitude", fe.amplitude0)
        euler = tuple(rt.double_vector("lc_q_init_euler_angles",
                                       (0.0, 0.0, 0.0)))
        if mode == "o8m":
            q5 = lc_init.lc_init_o8m(size, fe.q0, amp, euler=euler)
        elif mode == "o2":
            q5 = lc_init.lc_init_o2(size, fe.q0, amp, euler=euler)
        elif mode in ("twist", "cholesteric_z"):
            q5 = lc_init.lc_init_twist(size, fe.q0, amp, axis=2)
        elif mode == "cholesteric_x":
            q5 = lc_init.lc_init_twist(size, fe.q0, amp, axis=0)
        elif mode == "cholesteric_y":
            q5 = lc_init.lc_init_twist(size, fe.q0, amp, axis=1)
        elif mode == "nematic":
            director = tuple(rt.double_vector("lc_init_nematic",
                                              (1.0, 0.0, 0.0)))
            q5 = lc_init.lc_init_nematic(size, amp, director)
        elif mode == "random":
            q5 = lc_init.lc_init_random(size, amp)      # DEFAULT_SEED
        elif mode == "random_xy":
            q5 = lc_init.lc_init_random_xy(size, amp)
        elif mode == "active_nematic_q2d_x":
            q5 = lc_init.lc_init_active_nematic_q2d(size, amp, axis=0)
        elif mode == "active_nematic_q2d_y":
            q5 = lc_init.lc_init_active_nematic_q2d(size, amp, axis=1)
        else:
            raise ValueError(f"lc_q_initialisation '{mode}' not implemented")
        rect_min = rt.int_vector("lc_q_init_rectangle_min", None)
        rect_max = rt.int_vector("lc_q_init_rectangle_max", None)
        if rect_min is not None and rect_max is not None:
            q5 = lc_init.lc_init_random_rectangle(size, q5, rect_min,
                                                  rect_max)
        if nplanes_lc > 0:
            from ludwig_tpu.lc import make_lc_le_step
            from ludwig_tpu.ops.le_ref import le_gradient
            from ludwig_tpu.ops.lees_edwards import (LeesEdwardsConfig,
                                                     le_init_shear_profile)
            le = LeesEdwardsConfig(nplanes=nplanes_lc,
                                   uy=rt.double_required("LE_plane_vel"),
                                   nx=size[0])
            if rt.switch("LE_init_profile", False):
                f = le_init_shear_profile(lb_cfg, le)
            else:
                f = initial_rest(lb_cfg)
            jd = lb_cfg.jdtype
            fused_req = rt.string("tpu_fused", "off")
            if (fused_req != "off" and solid is None
                    and wallspec is None
                    and lcfg.advection_order == 1
                    and lcfg.gradient == "3d_7pt_fluid"
                    and not lcfg.redshift_update
                    and lcfg.noise_kt == 0.0 and lcfg.hydrodynamics
                    and not any(fe.e0)
                    and size[0] >= 6 * nplanes_lc):
                # sheared production fast path: the two-kernel Pallas
                # LC step + LE column fixes (the reference's headline
                # sheared blue-phase config, ref: model_le.c:57)
                plan = _fused_plan(size)
                interp = fused_req == "interpret"
                if plan is not None and (interp or (size[2] % 128 == 0
                                         and lb_cfg.dtype == "float32")):
                    from ludwig_tpu.ops.fused import pad_state
                    from ludwig_tpu.ops.fused_lc import (
                        LCPlan, make_fused_lc_le_step, pad_q)
                    lcfg = dataclasses.replace(lcfg, keep_grads=False)
                    step = make_fused_lc_le_step(
                        lcfg, le, LCPlan(min(8, plan.BX), plan.BY),
                        lb_plan=plan, interpret=interp)
                    state = (pad_state(f, zpad=False),
                             pad_q(jnp.asarray(q5, jd)),
                             jnp.zeros((3,) + size, jd))
                    return System(rt=rt, lb_cfg=lb_cfg,
                                  binary_cfg=None, solid=None,
                                  state=state, step_fn=step,
                                  lc_cfg=lcfg, le_cfg=le,
                                  fused_mode="lc")
            q5j = jnp.asarray(q5, jd)
            grad, delsq = le_gradient(q5j, le, 0, lcfg.gradient)
            state = (f, q5j, jnp.zeros((3,) + size, jd), grad, delsq)
            lcfg = dataclasses.replace(lcfg, keep_grads=True)
            step = make_lc_le_step(lcfg, le, keep_grads=True)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                          solid=None, state=state, step_fn=step,
                          lc_cfg=lcfg, le_cfg=le)
        _colloids = _parse_colloids(rt, size, rho0, eta)
        if _colloids is not None:
            # LC with resolved colloids (ref: ludwig.c ncolloid > 0
            # q-tensor branch; pth_force_colloid; fe_lc_stats.c)
            from ludwig_tpu.lc_colloid import (initial_lc_colloid,
                                               make_lc_colloid_step)
            cparams, rr, vv, typ, al, force_fn, _qq, _rngs, ss, _drw = _colloids
            state = initial_lc_colloid(lcfg, cparams, q5, rr, vv)
            step = make_lc_colloid_step(
                lcfg, cparams,
                rebuild_freq=rt.int("colloid_rebuild_freq", 1),
                force_fn=force_fn)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                          solid=None, state=state, step_fn=step,
                          lc_cfg=lcfg, colloid_params=cparams)
        fused_req = rt.string("tpu_fused", "off")
        if (fused_req != "off" and solid is None and wallspec is None
                and lcfg.advection_order == 1
                and lcfg.gradient == "3d_7pt_fluid"
                and not lcfg.redshift_update and lcfg.noise_kt == 0.0
                and lcfg.hydrodynamics and not any(fe.e0)):
            # production fast path: the two-kernel Pallas LC step
            # (ops/fused_lc.py) replaces the jnp pipeline
            plan = _fused_plan(size)
            interp = fused_req == "interpret"
            if plan is not None and (interp or (size[2] % 128 == 0
                                     and lb_cfg.dtype == "float32")):
                from ludwig_tpu.ops.fused_lc import (LCPlan,
                                                     initial_fused_lc,
                                                     make_fused_lc_step)
                lcfg = dataclasses.replace(lcfg, keep_grads=False)
                step = make_fused_lc_step(
                    lcfg, LCPlan(min(8, plan.BX), plan.BY),
                    lb_plan=plan, interpret=interp)
                return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                              solid=None, state=initial_fused_lc(lcfg, q5),
                              step_fn=step, lc_cfg=lcfg, fused_mode="lc")
        state = initial_lc(lcfg, q5)
        step = make_lc_step(lcfg, solid=solid)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None, solid=solid,
                      state=state, step_fn=step, lc_cfg=lcfg)

    if fe_name in ("fe_electro", "fe_electro_symmetric"):
        from ludwig_tpu.electro import ElectroConfig
        from ludwig_tpu.electro_sim import (
            ElectroSimConfig, electroneutral, init_gouy_chapman,
            init_liquid_junction, init_uniform, make_electro_step)
        kt = rt.double("temperature", 1.0 / 3.0e4)
        ek = ElectroConfig(
            valency=(rt.int("electrokinetics_z0", 1),
                     rt.int("electrokinetics_z1", -1)),
            diffusivity=(rt.double("electrokinetics_d0", 0.01),
                         rt.double("electrokinetics_d1", 0.01)),
            e=rt.double("electrokinetics_eunit", 1.0),
            beta=1.0 / kt,
            epsilon=rt.double("electrokinetics_epsilon", 3.3e3),
            solver=rt.string("electrokinetics_solver_type", "sor"),
            rel_tol=rt.double("electrokinetics_rel_tol", 1e-8),
            abs_tol=rt.double("electrokinetics_abs_tol", 1e-15),
            max_its=rt.int("electrokinetics_maxits", 10000),
            multisteps=rt.int("electrokinetics_multisteps", 1))
        np_stencil = rt.int("electrokinetics_solver_stencil", 7)
        e0 = tuple(rt.double_vector("electric_e0", (0.0, 0.0, 0.0)))
        mode = rt.string("electrokinetics_init", "uniform")
        rho_el = rt.double("electrokinetics_init_rho_el", 0.0)
        boundary = None
        if mode == "gouy_chapman":
            sigma = rt.double("electrokinetics_init_sigma", 0.0)
            psi0, rho_k, boundary = init_gouy_chapman(size, rho_el, sigma)
        elif mode == "liquid_junction":
            delta_el = rt.double("electrokinetics_init_delta_el", 0.0)
            psi0, rho_k = init_liquid_junction(size, rho_el, delta_el)
        elif mode == "uniform":
            psi0, rho_k = init_uniform(size, rho_el)
        else:
            raise ValueError(f"electrokinetics_init '{mode}'")
        if boundary is not None:
            solid = (jnp.asarray(boundary) if solid is None
                     else jnp.logical_or(solid, jnp.asarray(boundary)))
        rho_k = electroneutral(rho_k, ek.valency,
                               None if solid is None else np.asarray(solid))
        ecfg = ElectroSimConfig(
            lb=lb_cfg, ek=ek, e0=e0,
            hydrodynamics=rt.switch("hydrodynamics", True),
            stencil=np_stencil)
        jd = lb_cfg.jdtype
        _colloids = _parse_colloids(rt, size, rho0, eta)
        if _colloids is not None and fe_name == "fe_electro":
            # electrokinetics + resolved colloids (ref: psi_colloid.c;
            # init: rho_set then electroneutral, ludwig.c:420-424)
            from ludwig_tpu.colloids import build_map
            from ludwig_tpu.electro_colloid import (
                colloid_rho_set, initial_electro_colloid,
                make_electro_colloid_step)
            cparams, rr, vv, typ, al, force_fn, qq, _rngs, _ss, _drw = _colloids
            pid, inside = build_map(jnp.asarray(np.array(rr), jd),
                                    cparams, size)
            rho_j = colloid_rho_set(
                jnp.asarray(rho_k, jd), inside, pid,
                jnp.asarray(np.array(qq), jd),
                jnp.zeros((cparams.n, ek.nk), jd), ek.nk)
            rho_k = electroneutral(np.asarray(rho_j), ek.valency,
                                   np.asarray(inside))
            state = initial_electro_colloid(ecfg, cparams,
                                            psi0, rho_k, rr, vv)
            step = make_electro_colloid_step(
                ecfg, cparams, qq,
                rebuild_freq=rt.int("colloid_rebuild_freq", 1),
                force_fn=force_fn,
                # the v0.2.19-era default for psi runs was the Maxwell
                # stress divergence (serial-elec-ep1.log:38)
                force_method=_force_method(rt,
                                       "stress_divergence"))
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                          solid=None, state=state, step_fn=step,
                          electro_cfg=ecfg, colloid_params=cparams,
                          colloid_charge=tuple(qq),
                          hydro_on=ecfg.hydrodynamics)
        if fe_name == "fe_electro_symmetric":
            # coupled binary + electrokinetics (ref:
            # fe_electro_symmetric.c; ludwig.c psi section + CH update)
            from ludwig_tpu.electro_symm import (ElectroSymmConfig,
                                                 make_electro_symm_step)
            from ludwig_tpu.fe.electro_symmetric import ElectroSymmetricFE
            fe_s = _symm_fe(rt)
            eps1 = rt.double("electrokinetics_epsilon1", ek.epsilon)
            eps2 = rt.double("electrokinetics_epsilon2", ek.epsilon)
            ek = dataclasses.replace(ek, epsilon=0.5 * (eps1 + eps2))
            es_fe = ElectroSymmetricFE(
                symm=fe_s, electro=ek, epsilon1=eps1, epsilon2=eps2,
                deltamu=(rt.double("electrosymmetric_delta_mu0", 0.0),
                         rt.double("electrosymmetric_delta_mu1", 0.0)))
            escfg = ElectroSymmConfig(
                lb=lb_cfg, ek=ek, fe=es_fe,
                mobility=rt.double("mobility", 1.0),
                advection_order=rt.int("fd_advection_scheme_order", 1),
                gradient=rt.string("fd_gradient_calculation",
                                   "3d_7pt_fluid"),
                e0=e0, hydrodynamics=rt.switch("hydrodynamics", True),
                force_method=_force_method(rt,
                                       "stress_divergence"))
            phi0 = _phi_init(rt, size, fe_s)
            f = _distribution_init(rt, lb_cfg)
            state = (f, jnp.asarray(phi0, jd), jnp.asarray(psi0, jd),
                     jnp.asarray(rho_k, jd), jnp.zeros((3,) + size, jd))
            step = make_electro_symm_step(escfg)
            ecfg = dataclasses.replace(ecfg, ek=ek)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                          solid=None, state=state, step_fn=step,
                          electro_cfg=ecfg, es_cfg=escfg,
                          hydro_on=escfg.hydrodynamics)
        f = _distribution_init(rt, lb_cfg)
        state = (f, jnp.asarray(psi0, jd), jnp.asarray(rho_k, jd),
                 jnp.zeros((3,) + size, jd), jnp.zeros((3,), jd))
        step = make_electro_step(ecfg, solid=solid)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None, solid=solid,
                      state=state, step_fn=step, electro_cfg=ecfg,
                      hydro_on=ecfg.hydrodynamics)

    _colloids = _parse_colloids(rt, size, rho0, eta)
    if (fe_name in ("none", "symmetric", "symmetric_lb")
            and _colloids is not None):
        from ludwig_tpu.colloids import make_colloid_step
        cparams, rr, vv, typ, al, force_fn, _qq, _rngs, ss, _drw = _colloids
        f = _distribution_init(rt, lb_cfg)
        from ludwig_tpu.colloids import ColloidState
        R0 = jnp.asarray(np.array(rr), lb_cfg.jdtype)
        if typ and all(tp == "subgrid" for tp in typ):
            from ludwig_tpu.subgrid import make_subgrid_step
            state = (f, R0, jnp.asarray(np.array(vv), lb_cfg.jdtype))
            if nz is not None and nz.kiss and nz.rho:
                from ludwig_tpu.noise_kiss import kiss_init
                state = state + (kiss_init(0, size),)
            rng0 = None
            if nz is not None and nz.rho:
                rng0 = jnp.asarray(np.array(_rngs, np.int64))
                state = state + (rng0,)
            step = make_subgrid_step(lb_cfg, cparams, al,
                                     force_fn=force_fn, rng0=rng0)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                          solid=None, state=state, step_fn=step,
                          colloid_params=cparams)
        if fe_name == "symmetric_lb":
            # two-distribution binary fluid with resolved colloids
            # (ref: bbl.c pass2 ndist > 1 branch; build.c order
            # parameter remove/replace for the g distribution)
            from ludwig_tpu.binary_lb import (BinaryLBConfig,
                                              initial_binary_lb_colloid,
                                              make_binary_lb_colloid_step)
            fe2 = _symm_fe(rt)
            l2cfg = BinaryLBConfig(
                lb=lb_cfg, fe=fe2,
                mobility=rt.double("mobility", 0.15),
                gradient=rt.string("fd_gradient_calculation",
                                   "3d_27pt_solid"))
            phi0 = _phi_init(rt, size, fe2)
            ws_l2 = None
            if any(walls):
                from ludwig_tpu.ops.walls import WallSpec
                ws_l2 = WallSpec(walls=walls)
                lb_cfg = dataclasses.replace(lb_cfg, walls=(False,) * 3)
                l2cfg = dataclasses.replace(l2cfg, lb=lb_cfg)
            state = initial_binary_lb_colloid(l2cfg, cparams, phi0, rr,
                                              vv, W0=_drw[1],
                                              dr0=_drw[0])
            if ws_l2 is not None:
                state = state + (jnp.zeros((3,), lb_cfg.jdtype),)
            step = make_binary_lb_colloid_step(
                l2cfg, cparams,
                rebuild_freq=rt.int("colloid_rebuild_freq", 1),
                force_fn=force_fn, phi_ref=rt.double("phi0", 0.0),
                wetting=(rt.double("colloid_one_c", 0.0),
                         rt.double("colloid_one_h", 0.0)),
                wallspec=ws_l2)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                          solid=None, state=state, step_fn=step,
                          lb2_cfg=l2cfg, colloid_params=cparams,
                          wallspec=ws_l2)
        if fe_name == "symmetric":
            # binary fluid with resolved colloids (ref: phi_force_colloid)
            from ludwig_tpu.binary_colloid import (initial_binary_colloid,
                                                   make_binary_colloid_step)
            fe_s = _symm_fe(rt)
            bcfg = BinaryConfig(
                lb=lb_cfg, fe=fe_s,
                mobility=rt.double("mobility", 1.0),
                advection_order=rt.int("fd_advection_scheme_order", 1),
                gradient=rt.string("fd_gradient_calculation",
                                   "3d_27pt_solid"),
                wetting=(rt.double("colloid_one_c", 0.0),
                         rt.double("colloid_one_h", 0.0)))
            phi0 = _phi_init(rt, size, fe_s)
            ws_bc = None
            if any(walls):
                from ludwig_tpu.ops.walls import WallSpec
                ws_bc = WallSpec(walls=walls)
                lb_cfg = dataclasses.replace(lb_cfg, walls=(False,) * 3)
                bcfg = dataclasses.replace(bcfg, lb=lb_cfg)
            state = initial_binary_colloid(bcfg, cparams, phi0, rr, vv,
                                           W0=_drw[1], dr0=_drw[0])
            if ws_bc is not None:
                state = state + (jnp.zeros((3,), lb_cfg.jdtype),)
            step = make_binary_colloid_step(
                bcfg, cparams,
                rebuild_freq=rt.int("colloid_rebuild_freq", 1),
                force_fn=force_fn, phi_ref=rt.double("phi0", 0.0),
                wallspec=ws_bc,
                # build_conservation_phi arrived ~v0.12; older logs
                # (serial-coll-rfd, v0.8) have no put-back
                conserve_phi=rt.int("_log_vintage", 9999) >= 12)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=bcfg,
                          solid=None, state=state, step_fn=step,
                          colloid_params=cparams, wallspec=ws_bc)
        # from_file configurations carry angular velocity and the
        # deferred move dr (ref: colloid state read; the first update
        # moves each particle by the stored dr)
        _dr0, _w0 = _drw
        state = ColloidState(
            f, R0,
            jnp.asarray(np.array(vv), lb_cfg.jdtype),
            jnp.asarray(np.array(_w0), lb_cfg.jdtype),
            jnp.asarray(np.array(_dr0), lb_cfg.jdtype),
            jnp.array(R0),                        # map/link positions
            jnp.asarray(np.array(cparams.m), lb_cfg.jdtype))
        if nz is not None and nz.kiss and nz.rho:
            from ludwig_tpu.noise_kiss import kiss_init
            state = ColloidState(*state[:7], noise=kiss_init(0, size))
        ws = None
        wall_ss = None
        lubr_rc = lubr_dh = (0.0,) * 3
        if any(walls):
            state = state._replace(
                gwall=jnp.zeros((3,), lb_cfg.jdtype))
            # halo plane walls around the suspension (ref: wall.c;
            # wall_ss_cut.c; wall_lubr_sphere)
            from ludwig_tpu.ops.walls import WallSpec
            ws = WallSpec(walls=walls)
            lb_cfg = dataclasses.replace(lb_cfg, walls=(False,) * 3)
            rc = rt.double("boundary_lubrication_rcnormal", 0.0)
            dh = rt.double("boundary_lubrication_dhnormal", 0.0)
            lubr_rc = (rc, rc, rc)
            lubr_dh = (dh, dh, dh)
            if rt.switch("wall_ss_cut_on", False):
                wall_ss = {
                    "epsilon": rt.double_required("wall_ss_cut_epsilon"),
                    "sigma": rt.double_required("wall_ss_cut_sigma"),
                    "nu": rt.double_required("wall_ss_cut_nu"),
                    "hc": rt.double_required("wall_ss_cut_hc")}
        torque_fn = None
        if rt.int("ewald_sum", 0):
            # dipolar Ewald interactions (ref: ewald.c via
            # interact_compute; dipole vectors s are the input values -
            # rotation of s with the particle is carried via the same
            # Rodrigues update as the swim direction when present)
            from ludwig_tpu.ewald import ewald_sum as _ewald
            emu = rt.double("ewald_mu", 0.0)
            erc = rt.double("ewald_rc", float(min(size)) / 2.0)
            S0 = jnp.asarray(np.array(
                [list(ssv) if any(ssv) else [0.0, 0.0, 0.0]
                 for ssv in (ss if ss else [(0.0, 0.0, 0.0)] * cparams.n)]
            ), lb_cfg.jdtype)
            if bool(jnp.any(S0 != 0.0)):
                _prev = force_fn

                def force_fn(R, V, _p=_prev):
                    F, _ = _ewald(R, S0, emu, erc, size)
                    return F + (_p(R, V) if _p is not None else 0.0)

                def torque_fn(R, V):
                    return _ewald(R, S0, emu, erc, size)[1]
        b0 = tuple(rt.double_vector("magnetic_b0", (0.0, 0.0, 0.0)))
        if any(b0):
            # torque s x B on each dipole (ref: interaction.c:417-419
            # btorque; physics_rt.c magnetic_b0)
            S0b = jnp.asarray(np.array(
                [list(ssv) for ssv in
                 (ss if ss else [(0.0, 0.0, 0.0)] * cparams.n)]),
                lb_cfg.jdtype)
            b0j = jnp.asarray(np.array(b0), lb_cfg.jdtype)
            _prev_t = torque_fn

            def torque_fn(R, V, _p=_prev_t):
                tq = jnp.cross(S0b, b0j[None, :])
                return tq + (_p(R, V) if _p is not None else 0.0)
        step = make_colloid_step(lb_cfg, cparams,
                                 rebuild_freq=rt.int("colloid_rebuild_freq",
                                                     1),
                                 force_fn=force_fn, wallspec=ws,
                                 lubr_rc=lubr_rc, lubr_dh=lubr_dh,
                                 wall_ss=wall_ss, torque_fn=torque_fn)
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None, solid=None,
                      state=state, step_fn=step, colloid_params=cparams,
                      wallspec=ws)

    if fe_name in ("none",):
        le = None
        nplanes = rt.int("N_LE_plane", 0)
        if nplanes > 0:
            from ludwig_tpu.ops.lees_edwards import LeesEdwardsConfig
            le = LeesEdwardsConfig(nplanes=nplanes,
                                   uy=rt.double_required("LE_plane_vel"),
                                   nx=size[0])
        if any(walls) and le is None and porous is None:
            # halo plane walls: every stored site stays fluid
            from ludwig_tpu.lb import make_wall_step
            from ludwig_tpu.ops.walls import WallSpec
            ub = rt.double("boundary_speed_bottom", 0.0)
            ut = rt.double("boundary_speed_top", 0.0)
            sb = tuple(rt.double_vector(
                "boundary_walls_slip_fraction_bot", (0.0, 0.0, 0.0)))
            st_ = tuple(rt.double_vector(
                "boundary_walls_slip_fraction_top", (0.0, 0.0, 0.0)))
            slip_on = (rt.switch("boundary_walls_slip_active", False)
                       or any(sb) or any(st_))
            ws = WallSpec(walls=walls, ubot=(ub, 0.0, 0.0),
                          utop=(ut, 0.0, 0.0), slip_bot=sb, slip_top=st_,
                          slip_active=slip_on)
            lb_cfg = dataclasses.replace(lb_cfg, walls=(False,) * 3)
            f = _distribution_init(rt, lb_cfg)
            fused_req = rt.string("tpu_fused", "off")
            if (fused_req != "off" and not slip_on and nz is None
                    and not rt.switch("lb_bc_open", False)):
                # production fast path: fused Pallas collide+stream with
                # an O(surface) boundary-plane bounce-back fix
                # (ref: wall.c:860-980; step order ludwig.c:802-860)
                plan = _fused_plan(size)
                interp = fused_req == "interpret"
                if plan is not None and (interp
                                         or lb_cfg.dtype == "float32"):
                    from ludwig_tpu.ops.fused import (make_fused_wall_step,
                                                      pad_state)
                    step = make_fused_wall_step(lb_cfg, ws, plan,
                                                interpret=interp)
                    state = (pad_state(f),
                             jnp.zeros((3,), lb_cfg.jdtype))
                    return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                                  solid=None, state=state, step_fn=step,
                                  wallspec=ws, fused_mode="wall")
            obc = None
            oax = 0
            if rt.switch("lb_bc_open", False):
                from ludwig_tpu.ops.open_bc import OpenBCConfig
                obc = OpenBCConfig(
                    u0=tuple(rt.double_vector("lb_bc_inflow_rhou_u0",
                                              (0.0, 0.0, 0.0))),
                    rho0=rt.double("lb_bc_outflow_rhou_rho0", 1.0))
                oax = next((a for a in range(3) if not walls[a]), 0)
            step = make_wall_step(lb_cfg, ws, open_bc=obc, open_axis=oax)
            state = (f, jnp.zeros((3,), lb_cfg.jdtype))
            has_kiss = nz is not None and nz.kiss and nz.rho
            if has_kiss:
                from ludwig_tpu.noise_kiss import kiss_init
                state = state + (kiss_init(0, size),)
            return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                          solid=None, state=state, step_fn=step,
                          wallspec=ws, has_kiss=has_kiss)
        f = _distribution_init(rt, lb_cfg)
        has_kiss = nz is not None and nz.kiss and nz.rho
        fused_req = rt.string("tpu_fused", "off")
        if (fused_req != "off" and le is not None and solid is None
                and not has_kiss and nz is None):
            # sheared production fast path: fused kernel + LE column
            # post-pass (ref: model_le.c:57; ludwig.c:811)
            plan = _fused_plan(size)
            interp = fused_req == "interpret"
            if plan is not None and (interp
                                     or lb_cfg.dtype == "float32"):
                from ludwig_tpu.ops.fused import (make_fused_le_step,
                                                  pad_state)
                step = make_fused_le_step(lb_cfg, le, plan,
                                          interpret=interp)
                return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                              solid=None, state=(pad_state(f),),
                              step_fn=step, le_cfg=le, fused_mode="le")
        if (fused_req != "off" and le is None and solid is None
                and (nz is None or (nz.rho and not nz.phi))):
            # production fast path: the fused Pallas collide+stream
            # replaces the jnp step ('tpu_fused interpret' runs the
            # same kernel in interpret mode for CPU tests).  With
            # isothermal fluctuations on, the kernel generates the
            # counter-keyed noise stream in VMEM (ops/fused.FusedNoise;
            # same variances as the KISS stream, different realisation
            # - golden runs stay on the bitwise jnp path by not
            # requesting tpu_fused)
            plan = _fused_plan(size)
            interp = fused_req == "interpret"
            if plan is not None and (interp
                                     or lb_cfg.dtype == "float32"):
                from functools import partial as _p

                from ludwig_tpu.ops.fused import (FusedNoise, fused_step,
                                                  pad_state)
                model = lb_cfg.model
                params = lb_cfg.collision_params()
                fnz = None
                if nz is not None and nz.rho:
                    from ludwig_tpu.noise import (var_bulk, var_eta,
                                                  var_ghost)
                    fnz = FusedNoise(
                        seed=nz.seed,
                        v_eta=var_eta(1.0 / params.rtau_shear, nz.kt),
                        v_bulk=var_bulk(1.0 / params.rtau_bulk, nz.kt),
                        v_ghost=tuple(var_ghost(model,
                                                params.rtau_ghost,
                                                nz.kt)))

                @_p(jax.jit, donate_argnums=0)
                def step(fpad, t=0):
                    return fused_step(fpad, model, params, plan,
                                      interpret=interp, z=size[2],
                                      noise=fnz, t=t)

                return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None,
                              solid=None, state=(pad_state(f),),
                              step_fn=step, fused_mode="plain")
        step = make_step(lb_cfg, solid=solid, le=le)
        state = (f,)
        if has_kiss:
            from ludwig_tpu.noise_kiss import kiss_init
            state = (f, kiss_init(0, size))
        return System(rt=rt, lb_cfg=lb_cfg, binary_cfg=None, solid=solid,
                      state=state, step_fn=step, has_kiss=has_kiss)

    raise ValueError(f"free_energy '{fe_name}' not implemented yet")



def _lc_efield_adjust(fe, q5, coswt):
    """fed adjustment so the electric term scales with coswt^2
    (full fed carries coswt == 1; ref: blue_phase.c:387-389)."""
    if not (any(fe.e0) and fe.epsilon):
        return 0.0
    from ludwig_tpu.fe.blue_phase import q5_to_q33
    q = q5_to_q33(q5)
    ef = sum(fe.e0[a] * q[a][b] * fe.e0[b]
             for a in range(3) for b in range(3))
    return (1.0 - coswt * coswt) * fe.epsilon * ef


def _make_fast_stats_fn(sys_: System):
    """Plain-jnp statistics for the fused production path.

    The golden-parity stats (reference-ordered compensated scans) lower
    to huge sequential programs on TPU; production runs report the same
    observables with ordinary reductions (values equal up to roundoff).
    """
    from functools import partial as _partial

    from ludwig_tpu.lb import hydro_fields
    from ludwig_tpu.lc import lc_fields
    model = sys_.lb_cfg.model
    lcfg = sys_.lc_cfg
    bcfg = sys_.binary_cfg
    dcfg = sys_.droplet_cfg

    def _fstats(x):
        m = jnp.mean(x)
        return (jnp.sum(x), m, jnp.mean(x * x) - m * m,
                jnp.min(x), jnp.max(x))

    @_partial(jax.jit, static_argnums=3)
    def compute(state, u, prev, coswt=1.0, tstep=0):
        f = state[0]
        rho, g = hydro_fields(f, model)
        res = {"rho": _fstats(rho),
               "g": jnp.sum(g, axis=(1, 2, 3)),
               "umm": stats.velocity_minmax(u)}
        nz_ = sys_.lb_cfg.noise
        if nz_ is not None and nz_.rho:
            # kT statistics (ref: collision.c:1030-1110)
            res["ktstats"] = tuple(
                jnp.mean(g[a] * g[a] / rho) for a in range(3))
        if sys_.wallspec is not None:
            # fused wall mode: gwall rides the state (f, gwall)
            res["gwall"] = state[1]
        if bcfg is not None:
            # fused binary: [phi] + [fed] with the reference's
            # stale-gradient convention (pre-update phi via `prev`)
            phi = state[1]
            res["phi"] = _fstats(phi)
            srcp = prev[0] if prev else phi
            if sys_.le_cfg is not None:
                # sheared fused run: LE-aware gradients of pre-update
                # phi, matching the jnp LE path's stats convention
                from ludwig_tpu.ops.le_ref import le_gradient
                gp_, dp_ = le_gradient(srcp, sys_.le_cfg, tstep,
                                       bcfg.gradient)
                fields = {"phi": srcp, "grad_phi": gp_,
                          "delsq_phi": dp_}
            else:
                fields = fe_fields(srcp, bcfg.gradient)
            fields["phi"] = phi
            fed = bcfg.fe.fed(fields)
            m = jnp.mean(fed)
            res["fed"] = (m, m)
        if dcfg is not None:
            from ludwig_tpu.lc_droplet_sim import droplet_fields
            phi, q5 = state[1], state[2]
            res["phi"] = _fstats(phi)
            res["q5"] = [_fstats(q5[n]) for n in range(5)]
            pp, pq = (prev[0], prev[1]) if len(prev) == 2 else (phi, q5)
            fields = droplet_fields(pp, pq, dcfg.gradient)
            fields["phi"] = phi
            fields["q"] = q5
            fed = dcfg.fe.fed(fields)
            m = jnp.mean(fed)
            res["fed"] = (m, m)
        if lcfg is not None:
            q5 = state[1]
            res["q5"] = [_fstats(q5[n]) for n in range(5)]
            src = prev[0] if len(prev) == 1 else q5
            if sys_.le_cfg is not None:
                # sheared fused run: the reference computes stats with
                # LE-aware gradients of the pre-update q (ludwig.c loop)
                from ludwig_tpu.ops.le_ref import le_gradient
                grad_, delsq_ = le_gradient(src, sys_.le_cfg, tstep,
                                            lcfg.gradient)
                fields = {"q": src, "grad_q": grad_, "delsq_q": delsq_}
            else:
                fields = lc_fields(src, lcfg.gradient)
            fields["q"] = q5
            fed = lcfg.fe.fed(fields) + _lc_efield_adjust(
                lcfg.fe, q5, coswt)
            bulk, grad = lcfg.fe.fed_bulk_grad(fields)
            vol = jnp.asarray(float(fed.size), fed.dtype)
            res["fe_lc"] = (jnp.sum(fed), vol, jnp.sum(bulk),
                            jnp.sum(grad))
        return res

    return compute


def _make_stats_fn(sys_: System):
    """One jitted program computing every reported scalar (eager stats
    would pay a device round-trip per op)."""
    import jax

    model = sys_.lb_cfg.model
    mask = sys_.fluid_mask
    bcfg = sys_.binary_cfg
    bsolid_ops = None
    if bcfg is not None:
        if sys_.fe_solid_ops is not None:
            bsolid_ops = sys_.fe_solid_ops     # open-x BC aware stencils
        else:
            from ludwig_tpu.binary import binary_solid_ops
            bsolid_ops = binary_solid_ops(bcfg, solid=sys_.solid,
                                          wallspec=sys_.wallspec)

    cpar = sys_.colloid_params

    from functools import partial as _partial

    @_partial(jax.jit, static_argnums=3)
    def compute(state, u, prev, coswt=1.0, tstep=0):
        # coswt: phase of the external electric field as the HOST stats
        # see it.  The reference's fe params live in a calloc'd struct
        # whose coswt stays 0.0 until the first device commit inside the
        # time loop, so the t=0 statistics exclude the E-field free
        # energy (ref: blue_phase.c fe_lc_create/fe_lc_param_commit).
        # prev: order-parameter fields from the top of the step - the
        # reference's statistics mix the CURRENT field values with the
        # gradients computed before the update (ludwig.c loop order).
        f = state[0]
        if cpar is not None:
            from ludwig_tpu.colloids import total_colloid_momentum
            if cpar.n > 4:
                from ludwig_tpu.colloids_fast import (
                    build_map_fast as build_map)
            else:
                from ludwig_tpu.colloids import build_map
            R, V = state[1], state[2]
            subgrid = (len(cpar.types) == cpar.n
                       and all(tp == "subgrid" for tp in cpar.types))
            if subgrid:
                # point particles: no excluded sites, and zero mass in
                # the momentum account (ref: stats_colloid.c:69)
                fl = None
                gc = jnp.zeros((3,), f.dtype)
            else:
                pid, inside = build_map(R, cpar, sys_.lb_cfg.size)
                fl = jnp.logical_not(inside)
                gc = total_colloid_momentum(V, cpar, f.dtype)
            # v0.1/v0.2-era logs carry the PLAIN per-rank partial-sum
            # roundoff in their near-zero momentum totals (e.g.
            # long08-chol-n01's 3.6161213e-12 at t = 0: the per-site
            # p-order fold of f_p c_px at rest leaves ~1.4e-17/site).
            # From v0.7 on, colloid-run logs show EXACT zeros at rest -
            # the colloid reporting path changed accumulator before the
            # fluid-only one did (which stayed plain until the v0.12
            # kahan rewrite, hence the < 12 gate in the branch below).
            if sys_.rt.int("_log_vintage", 9999) < 7:
                gtot = stats.momentum_total_plain(
                    f, model, fl,
                    blocks=tuple(sys_.rt.int_vector("_mpi_grid",
                                                    (1, 1, 1))))
            else:
                gtot = stats.momentum_total_ref(f, model, fl)
            res = {"rho": stats.rho_stats_ref(f, model, fl),
                   "g": gtot,
                   "gc": gc,
                   "umm": stats.velocity_minmax(u, fl)}
            if (sys_.wallspec is not None
                    and getattr(state, "gwall", None) is not None):
                res["gwall"] = state.gwall
            elif sys_.wallspec is not None and bcfg is not None:
                # binary colloid tuple state: gwall rides at the end
                res["gwall"] = state[11]
            elif sys_.wallspec is not None and sys_.lb2_cfg is not None:
                res["gwall"] = state[12]
            # The reference prints "Particle statistics" from
            # interact_compute at the TOP of the step (ludwig.c:543),
            # i.e. with the PREVIOUS step's velocities (prev[0]).
            vstat = prev[0] if prev else V
            res["vcol"] = (jnp.min(vstat, axis=0), jnp.max(vstat, axis=0))
            if bcfg is not None:
                # binary + colloids: phi stats and the ncolloid > 0
                # free-energy block (ref: stats_free_energy.c:112-124,
                # fluid-masked, stale top-of-step gradients - the step
                # stashes the gradients it computed as state[9]/[10])
                phi = state[7]
                res["phi"] = stats.field_stats_ref(phi, fl, klein="kahan")
                if coswt == 0.0:
                    # initial statistics: gradients freshly computed at
                    # setup (the state stash is still zeros)
                    from ludwig_tpu.ops.solid_stencil import \
                        solid27_scalar_ops
                    grad, delsq = solid27_scalar_ops(
                        sys_.lb_cfg.size, fluid=fl,
                        rkappa=1.0 / bcfg.fe.kappa, c=bcfg.wetting[0],
                        h=bcfg.wetting[1],
                        walls=(sys_.wallspec.walls if sys_.wallspec
                               else (False,) * 3))
                    sg, sd = grad(phi), delsq(phi)
                else:
                    sg, sd = state[9], state[10]
                fields = {"phi": phi, "grad_phi": sg, "delsq_phi": sd}
                fed = bcfg.fe.fed(fields)
                res["fe_colloid"] = (jnp.sum(jnp.where(fl, fed, 0.0)),
                                     jnp.sum(fl.astype(fed.dtype)))
            if sys_.lb2_cfg is not None:
                # symmetric_lb + colloids: phi from the g distribution,
                # fluid Klein sums with the bbl deficit added to the
                # total before mean/variance (ref: phi_stats.c
                # stats_field_info_bbl:321-338)
                from ludwig_tpu.binary_lb import g_moments
                from ludwig_tpu.ops.solid_stencil import \
                    solid27_scalar_ops
                l2 = sys_.lb2_cfg
                phi = g_moments(state[7], model)[0]
                tot, mean, var, mn, mx = stats.field_stats_ref(
                    phi, fl, klein="klein")
                deficit = jnp.sum(state[9])
                nfl = jnp.sum(fl.astype(phi.dtype))
                tot2 = tot + deficit
                mean2 = tot2 / nfl
                var2 = (var + mean * mean) - mean2 * mean2
                res["phi"] = (tot2, mean2, var2, mn, mx)
                if coswt == 0.0:
                    # initial stats: the state stash is still zeros
                    grad, delsq = solid27_scalar_ops(
                        sys_.lb_cfg.size, fluid=fl,
                        rkappa=1.0 / l2.fe.kappa, c=0.0, h=0.0,
                        walls=(sys_.wallspec.walls if sys_.wallspec
                               else (False,) * 3))
                    sg, sd = grad(phi), delsq(phi)
                else:
                    # the step's own top-of-step gradients
                    sg, sd = state[10], state[11]
                fields = {"phi": phi, "grad_phi": sg, "delsq_phi": sd}
                fed = l2.fe.fed(fields)
                if os.environ.get("LTP_FED_DUMP"):
                    def _fed_writer(fed_, fl_, phi_, sg_, sd_):
                        import numpy as _np
                        n = getattr(compute, "_dump_n", 0)
                        compute._dump_n = n + 1
                        _np.savez(
                            f"{os.environ['LTP_FED_DUMP']}.{n}.npz",
                            fed=_np.asarray(fed_), fl=_np.asarray(fl_),
                            phi=_np.asarray(phi_), sg=_np.asarray(sg_),
                            sd=_np.asarray(sd_))
                    jax.debug.callback(_fed_writer, fed, fl, phi, sg, sd,
                                       ordered=True)
                res["fe_colloid"] = (jnp.sum(jnp.where(fl, fed, 0.0)),
                                     jnp.sum(fl.astype(fed.dtype)))
            if sys_.lc_cfg is not None:
                # LC + colloids: fluid-masked Q stats and the surface
                # free energy over the particle boundary (ref:
                # fe_lc_stats.c fe_lc_colloid)
                from ludwig_tpu.lc_colloid import lc_colloid_surface_fe
                lcfg = sys_.lc_cfg
                q5 = state[7]
                res["q5"] = [stats.field_stats_ref(q5[n], fl)
                             for n in range(5)]
                fields = {"q": q5, "grad_q": state[9],
                          "delsq_q": state[10]}
                fed = lcfg.fe.fed(fields) + _lc_efield_adjust(
                    lcfg.fe, q5, coswt)
                # sequential site-order sum as in the reference's
                # fe_lc_stats accumulation (bitwise contract)
                ftot = stats.seq_sum(fed, fl)
                vol = jnp.sum(fl.astype(fed.dtype))
                if lcfg.has_walls:
                    # walls take precedence in the free-energy report
                    # (ref: fe_lc_stats_info wall branch first)
                    from ludwig_tpu.lc import lc_surface_fe
                    fs1, fs2 = lc_surface_fe(lcfg, q5)
                    res["fe_lc"] = (ftot, vol, fs1, fs2)
                    res["gwall"] = state[11]
                else:
                    fs, area = lc_colloid_surface_fe(
                        lcfg.fe, lcfg.anchoring, q5, pid, inside,
                        state[5], sys_.lb_cfg.size)
                    res["fe_lc_coll"] = (ftot, vol, fs, area)
            if sys_.electro_cfg is not None:
                # electro + colloids: particle charge densities are
                # refreshed before the psi statistics (ref:
                # ludwig.c:2372 psi_colloid_rho_set before psi_stats)
                from ludwig_tpu.electro import fe_electro_fed, rho_elec
                from ludwig_tpu.electro_colloid import (colloid_rho_set,
                                                        zeta_potential)
                ek = sys_.electro_cfg.ek
                psi, rhok, deltaq = state[7], state[8], state[10]
                qc = jnp.asarray(np.array(sys_.colloid_charge,
                                          np.float64), psi.dtype)
                rhok = colloid_rho_set(rhok, inside, pid, qc, deltaq,
                                       ek.nk)

                def tmm(x):
                    # plain site-order total (ref: psi_stats.c)
                    return (stats.seq_sum(x), jnp.min(x), jnp.max(x))

                res["psi3"] = tmm(psi)
                res["rhok"] = [tmm(rhok[k]) for k in range(ek.nk)]
                res["elc"] = tmm(rho_elec(rhok, ek))
                fed = fe_electro_fed(rhok, ek, psi)
                res["fe_colloid"] = (jnp.sum(jnp.where(fl, fed, 0.0)),
                                     jnp.sum(fl.astype(fed.dtype)))
                if cpar.n == 1:
                    res["psi_zeta"] = zeta_potential(psi, fl, inside)
            nz_ = sys_.lb_cfg.noise
            if nz_ is not None and nz_.rho:
                # isothermal-fluctuation temperature statistics over
                # FLUID-status sites only: colloid interiors and any
                # wall/porous solid are excluded, like the reference's
                # status==FLUID test (ref: collision.c:1030-1110
                # lb_collision_stats_kt)
                from ludwig_tpu.lb import hydro_fields
                rho_f, g_f = hydro_fields(f, model)
                flu = fl
                if sys_.solid is not None:
                    s_ = jnp.logical_not(sys_.solid)
                    flu = s_ if flu is None else jnp.logical_and(flu, s_)
                w_ = (1.0 if flu is None else flu.astype(f.dtype))
                nfl = (float(np.prod(sys_.lb_cfg.size)) if flu is None
                       else jnp.sum(w_))
                rho_s = jnp.where(rho_f == 0.0, 1.0, rho_f)  # masked
                res["ktstats"] = tuple(
                    jnp.sum(w_ * g_f[a] * g_f[a] / rho_s) / nfl
                    for a in range(3))
            return res
        _old_stats = sys_.rt.int("_log_vintage", 9999) < 12
        _g_fn = (stats.momentum_total_plain if _old_stats
                 else stats.momentum_total_ref)   # pre-kahan era
        _blocks = (tuple(sys_.rt.int_vector("_mpi_grid", (1, 1, 1)))
                   if _old_stats else None)
        res = {"rho": stats.rho_stats_ref(f, model, mask,
                                          blocks=_blocks),
               "g": (_g_fn(f, model, mask, blocks=_blocks)
                     if _old_stats else _g_fn(f, model, mask)),
               "umm": stats.velocity_minmax(u, mask)}
        if sys_.wallspec is not None:
            if sys_.is_binary:
                res["gwall"] = state[3]
            elif sys_.is_two_field:
                res["gwall"] = state[4]
            else:
                res["gwall"] = state[1]
        if sys_.vol_flux:
            um = u if mask is None else jnp.where(mask[None], u, 0.0)
            res["uflux"] = jnp.sum(um, axis=(1, 2, 3))
        if sys_.electro_cfg is not None:
            from ludwig_tpu.electro import fe_electro_fed, rho_elec
            ek = sys_.electro_cfg.ek
            if sys_.es_cfg is not None:
                phi, psi, rhok = state[1], state[2], state[3]
                gwall = None
            else:
                psi, rhok, gwall = state[1], state[2], state[4]

            def tmm(x):
                # plain site-order total (ref: psi_stats.c
                # psi_stats_local accumulation)
                return (stats.seq_sum(x), jnp.min(x), jnp.max(x))

            res["psi3"] = tmm(psi)
            res["rhok"] = [tmm(rhok[k]) for k in range(ek.nk)]
            res["elc"] = tmm(rho_elec(rhok, ek))
            if sys_.es_cfg is not None:
                # coupled run: [phi] line + the coupled fed, with the
                # stale start-of-step gradients (reference stats run
                # after the update but field_grad is from the top of
                # the step)
                from ludwig_tpu.binary import fe_fields as _es_flds
                res["phi"] = stats.field_stats_ref(phi)
                pphi = prev[0] if prev else phi
                fields = _es_flds(pphi, sys_.es_cfg.gradient)
                fields["phi"] = phi
                fed = sys_.es_cfg.fe.fed_coupled(fields, rhok, psi)
            else:
                fed = fe_electro_fed(rhok, ek, psi)
            if mask is None:
                fluid = jnp.mean(fed)
            else:
                fluid = jnp.sum(jnp.where(mask, fed, 0.0)) / jnp.sum(mask)
            res["fed"] = (jnp.mean(fed), fluid)
            if mask is not None and gwall is not None:
                res["gwall"] = gwall
        if sys_.lb2_cfg is not None:
            from ludwig_tpu.binary_lb import g_moments
            l2 = sys_.lb2_cfg
            phi, _ = g_moments(state[1], model)
            res["phi"] = stats.field_stats_ref(phi, klein=False)
            # current phi with the start-of-step gradients (the
            # reference's ludwig_report_statistics convention)
            l2ops = None
            if sys_.wallspec is not None and l2.gradient.endswith("_solid"):
                from ludwig_tpu.ops.solid_stencil import solid27_scalar_ops
                l2ops = solid27_scalar_ops(
                    sys_.lb_cfg.size, fluid=None,
                    walls=sys_.wallspec.walls,
                    rkappa=1.0 / l2.fe.kappa, c=0.0, h=0.0)
            if sys_.le_cfg is not None:
                # LE runs carry the start-of-step LE-aware gradients
                # at the state tail (binary_lb keep-grads convention)
                fields = {"phi": phi, "grad_phi": state[-2],
                          "delsq_phi": state[-1]}
            else:
                fields = fe_fields(prev[0] if prev else phi, l2.gradient,
                                   solid_ops=l2ops)
                fields["phi"] = phi
            fed = l2.fe.fed(fields)
            res["fed"] = (jnp.mean(fed), jnp.mean(fed))
            if sys_.wallspec is not None:
                res["fe_sum_v"] = (stats.seq_sum(fed),
                                   jnp.asarray(float(fed.size),
                                               fed.dtype))
                res["gwall"] = state[3]
        if bcfg is not None:
            phi = state[1]
            res["phi"] = stats.field_stats(phi, mask)
            if sys_.le_cfg is not None:
                # LE runs carry the start-of-step (LE-aware) gradients
                fields = {"phi": phi, "grad_phi": state[-2],
                          "delsq_phi": state[-1]}
            else:
                fields = fe_fields(prev[0], bcfg.gradient,
                                   fourth_order=bcfg.fourth_order,
                                   solid_ops=bsolid_ops)
                fields["phi"] = phi
            fed = bcfg.fe.fed(fields)
            if mask is None:
                mean = jnp.mean(fed)
                fluid = mean
            else:
                mean = jnp.mean(jnp.where(mask, fed, 0.0))
                fluid = jnp.sum(jnp.where(mask, fed, 0.0)) / jnp.sum(mask)
            res["fed"] = (mean, fluid)
            if sys_.wallspec is not None:
                # wall report needs the un-normalised fluid sum and
                # volume (ref: stats_free_energy.c:103-105; the
                # surface terms f_s1/f_s2 are never accumulated there
                # and print as zero)
                fsum = (jnp.sum(fed) if mask is None
                        else jnp.sum(jnp.where(mask, fed, 0.0)))
                vol = (float(np.prod(fed.shape)) if mask is None
                       else jnp.sum(mask))
                res["fe_sum_v"] = (fsum, vol)
        if sys_.two_field_cfg is not None:
            from ludwig_tpu.two_field import two_fields
            tcfg = sys_.two_field_cfg
            phi, psi = state[1], state[2]
            res["phi"] = stats.field_stats_ref(phi, mask)
            res["psi"] = stats.field_stats_ref(psi, mask)
            fields = two_fields(prev[0], prev[1], tcfg.gradient,
                                solid_ops=sys_.fe_solid_ops)
            fields["phi"] = phi
            fields["psi"] = psi
            fed = tcfg.fe.fed(fields)
            if mask is None:
                mean = jnp.mean(fed)
                fluid = mean
                fsum = jnp.sum(fed)
            else:
                mean = jnp.mean(jnp.where(mask, fed, 0.0))
                fluid = jnp.sum(jnp.where(mask, fed, 0.0)) / jnp.sum(mask)
                fsum = jnp.sum(jnp.where(mask, fed, 0.0))
            res["fed"] = (mean, fluid)
            res["fe_sum"] = fsum
            if (sys_.wallspec is not None
                    and type(tcfg.fe).__name__ == "TernaryFE"):
                # surface free energy terms, counted per fluid-site
                # nearest-neighbour link into a wall (ref:
                # fe_ternary_stats.c fe_ternary_surf_kernel; 2-D only)
                from ludwig_tpu.ops.force import _edge_plane
                sz = phi.shape
                nb = jnp.zeros(sz, phi.dtype)
                for ax in range(2):
                    if sys_.wallspec.walls[ax]:
                        nb = nb + _edge_plane(sz, ax, +1) \
                            + _edge_plane(sz, ax, -1)
                h1, h2, h3 = tcfg.fe.h1, tcfg.fe.h2, tcfg.fe.h3
                res["tern_surf"] = (
                    jnp.sum(nb) * 0.5 * (-h1 - h2),
                    jnp.sum(phi * nb) * 0.5 * (-h1 + h2),
                    jnp.sum(psi * nb) * 0.5 * (h1 + h2 - 2.0 * h3))
        if sys_.polar_cfg is not None:
            from ludwig_tpu.polar import polar_fields
            p = state[1]
            res["pvec"] = [stats.field_stats_ref(p[a], mask)
                           for a in range(3)]
            fields = polar_fields(prev[0], sys_.polar_cfg.gradient)
            fields["p"] = p
            fed = sys_.polar_cfg.fe.fed(fields)
            mean = (jnp.mean(fed) if mask is None
                    else jnp.sum(jnp.where(mask, fed, 0.0)) / jnp.sum(mask))
            res["fed"] = (mean, mean)
        if sys_.droplet_cfg is not None:
            from ludwig_tpu.lc_droplet_sim import droplet_fields
            dcfg = sys_.droplet_cfg
            phi, q5 = state[1], state[2]
            res["phi"] = stats.field_stats_ref(phi, mask)
            res["q5"] = [stats.field_stats_ref(q5[n], mask)
                         for n in range(5)]
            fields = droplet_fields(prev[0], prev[1], dcfg.gradient)
            fields["phi"] = phi
            fields["q"] = q5
            fed = dcfg.fe.fed(fields)
            if mask is None:
                mean = jnp.mean(fed)
                fluid = mean
            else:
                mean = jnp.mean(jnp.where(mask, fed, 0.0))
                fluid = jnp.sum(jnp.where(mask, fed, 0.0)) / jnp.sum(mask)
            res["fed"] = (mean, fluid)
        if sys_.lc_cfg is not None:
            lcfg = sys_.lc_cfg
            q5 = state[1]
            res["q5"] = [stats.field_stats_ref(q5[n], mask)
                         for n in range(5)]
            if lcfg.keep_grads:
                # the reference computes stats with the gradients from
                # the top of the step (pre-BE-update q), ludwig.c loop
                fields = {"q": q5, "grad_q": state[-2],
                          "delsq_q": state[-1]}
            elif sys_.fused_mode == "lc" and len(prev) == 1:
                # fused fast path: same stale-gradient convention, with
                # the pre-update q carried through `prev`
                w3 = (lcfg.wallspec.walls if lcfg.has_walls
                      else (False,) * 3)
                pf = lc_fields(prev[0], lcfg.gradient,
                               anchoring=lcfg.anchoring, walls=w3)
                fields = {"q": q5, "grad_q": pf["grad_q"],
                          "delsq_q": pf["delsq_q"]}
            else:
                w3 = (lcfg.wallspec.walls if lcfg.has_walls
                      else (False,) * 3)
                fields = lc_fields(q5, lcfg.gradient,
                                   anchoring=lcfg.anchoring, walls=w3)
            fe_stats = lcfg.fe
            if getattr(lcfg, "redshift_update", False):
                # the state carries the dynamically recomputed redshift
                # (before the keep_grads tail)
                rs_idx = -3 if lcfg.keep_grads else -1
                res["redshift"] = state[rs_idx]
                import dataclasses as _dc
                fe_stats = _dc.replace(lcfg.fe, redshift=state[rs_idx])
            fed = fe_stats.fed(fields) + _lc_efield_adjust(
                fe_stats, q5, coswt)
            if mask is None:
                ftot = jnp.sum(fed)
                vol = jnp.asarray(float(fed.size), fed.dtype)
            else:
                ftot = jnp.sum(jnp.where(mask, fed, 0.0))
                vol = jnp.sum(mask).astype(fed.dtype)
            if lcfg.has_walls:
                from ludwig_tpu.lc import lc_surface_fe
                fs1, fs2 = lc_surface_fe(lcfg, q5)
                res["fe_lc"] = (ftot, vol, fs1, fs2)
                res["gwall"] = state[3]
            else:
                bulk, grad = fe_stats.fed_bulk_grad(fields)
                if mask is None:
                    bsum, gsum = jnp.sum(bulk), jnp.sum(grad)
                else:
                    bsum = jnp.sum(jnp.where(mask, bulk, 0.0))
                    gsum = jnp.sum(jnp.where(mask, grad, 0.0))
                res["fe_lc"] = (ftot, vol, bsum, gsum)
        nz_ = sys_.lb_cfg.noise
        if nz_ is not None and nz_.rho:
            # isothermal-fluctuation temperature statistics
            # (ref: collision.c:1030-1110 lb_collision_stats_kt)
            from ludwig_tpu.lb import hydro_fields
            rho_f, g_f = hydro_fields(f, model)
            w_ = (1.0 if sys_.solid is None
                  else jnp.logical_not(sys_.solid).astype(f.dtype))
            nfl = (float(np.prod(sys_.lb_cfg.size)) if sys_.solid is None
                   else jnp.sum(w_))
            # guard rho == 0 at zeroed solid/porous sites: 0/0 = NaN
            # survives the w_=0 weight (0*NaN = NaN)
            rho_s = jnp.where(rho_f == 0.0, 1.0, rho_f)
            res["ktstats"] = tuple(
                jnp.sum(w_ * g_f[a] * g_f[a] / rho_s) / nfl
                for a in range(3))
        return res

    return compute


def compute_stats_res(sys_: System, tstep: int, u, stats_fn,
                      in_loop=True, prev=()):
    """Evaluate the statistics program and pull the results host-side
    (shared by the particle block and the scalar blocks so the step is
    only synced once when their emission points differ)."""
    return jax.device_get(stats_fn(sys_.state, u, prev,
                                   1.0 if in_loop else 0.0,
                                   jnp.asarray(tstep, jnp.float32)))


def report_particle_block(sys_: System, res, out=sys.stdout):
    """The "Particle statistics:" section: interaction statistics +
    colloid velocity minmax (ref: interaction.c:207-213 printed at the
    START of the step's colloids_update, i.e. BEFORE the SOR report
    and the io dump lines of the same step)."""
    vmin, vmax = res["vcol"]
    out.write("\nParticle statistics:\n")
    cp = sys_.colloid_params
    if cp is not None:
        from ludwig_tpu.stats_extra import interact_stats_lines
        R_now = jax.device_get(sys_.state[1])
        for ln in interact_stats_lines(sys_.rt, cp, R_now,
                                       sys_.lb_cfg.size):
            out.write(ln)
    out.write("\nColloid velocities - x y z\n")
    out.write(f"[minimum ] {float(vmin[0]):14.7e} "
              f"{float(vmin[1]):14.7e} {float(vmin[2]):14.7e}\n")
    out.write(f"[maximum ] {float(vmax[0]):14.7e} "
              f"{float(vmax[1]):14.7e} {float(vmax[2]):14.7e}\n\n")


def report_statistics(sys_: System, tstep: int, u, stats_fn,
                      with_velocity=True, out=sys.stdout,
                      in_loop=True, prev=(), res=None, particle=True):
    """One statistics block set, reference formats.  The 'Completed
    cycle' trailer only appears inside the time loop (ref:
    ludwig.c:961).  `res`/`particle` let the caller hoist the particle
    block ahead of the SOR/dump lines (full-log ordering)."""
    if res is None:
        res = compute_stats_res(sys_, tstep, u, stats_fn,
                                in_loop=in_loop, prev=prev)

    if "vcol" in res and in_loop and particle:
        report_particle_block(sys_, res, out=out)
    out.write(stats.format_rho_block(*res["rho"]))
    if sys_.is_electro:
        def _3(tot, mn, mx):
            return (f"{float(tot):14.7e} {float(mn):14.7e} "
                    f"{float(mx):14.7e}\n")
        if "phi" in res:
            # coupled fe_electro_symmetric: [phi] precedes the psi
            # block (ref: serial-elec-do1.log:127)
            out.write(stats.format_phi_line("phi", *res["phi"]))
        out.write("[psi] " + _3(*res["psi3"]))
        for k in range(len(res["rhok"])):
            out.write("[rho] " + _3(*res["rhok"][k]))
        out.write("[elc] " + _3(*res["elc"]))
        if "psi_zeta" in res and (
                in_loop or sys_.rt.int("_log_vintage", 99) >= 7):
            # printed in every statistics block, including the t = 0
            # report from v0.7 (serial-elec-rr1.log:126); the v0.2-era
            # blessings (elec-ep1/ep2) print it in-loop only
            out.write(f"[psi_zeta] {float(res['psi_zeta']):14.7e}\n")
        if "fe_colloid" in res:
            # ncolloid > 0, no area (ref: stats_free_energy.c:119-124)
            fsum, vol = (float(v) for v in res["fe_colloid"])
            out.write("\nFree energies - timestep f v f/v f_s a f_s/a\n")
            out.write(f"[fe] {int(tstep):14d} {fsum:17.10e} "
                      f"{vol:17.10e} {fsum / vol:17.10e} "
                      f"{0.0:17.10e}\n")
        else:
            out.write(stats.format_fed_block(tstep, *res["fed"]))
    if sys_.is_binary or sys_.is_binary_lb:
        out.write(stats.format_phi_line("phi", *res["phi"]))
        if "fe_colloid" in res:
            # ncolloid > 0, no area: 4-value row (ref:
            # stats_free_energy.c:119-124).  v0.7-era logs print no
            # block at t = 0 (serial-spin-c03 vs v0.12 serial-spin-c01)
            if in_loop or sys_.rt.int("_t0_fe", 1) == 1:
                fsum, vol = (float(v) for v in res["fe_colloid"])
                if sys_.wallspec is not None:
                    # walls take precedence in the header (ref:
                    # stats_free_energy.c wall branch; serial-coll-rfd)
                    out.write("\nFree energies - timestep f v f/v "
                              "f_s1 fs_s2 \n")
                    out.write(f"[fe] {int(tstep):14d} {fsum:17.10e} "
                              f"{vol:17.10e} {fsum / vol:17.10e} "
                              f"{0.0:17.10e} {0.0:17.10e}\n")
                else:
                    out.write("\nFree energies - timestep f v f/v "
                              "f_s a f_s/a\n")
                    out.write(f"[fe] {int(tstep):14d} {fsum:17.10e} "
                              f"{vol:17.10e} "
                              f"{fsum / vol:17.10e} {0.0:17.10e}\n")
        elif "fe_sum_v" in res:
            # walls present (ref: stats_free_energy.c:103-105)
            fsum, vol = (float(v) for v in res["fe_sum_v"])
            out.write("\nFree energies - timestep f v f/v f_s1 fs_s2 \n")
            out.write(f"[fe] {int(tstep):14d} {fsum:17.10e} {vol:17.10e} "
                      f"{fsum / vol:17.10e} {0.0:17.10e} {0.0:17.10e}\n")
        elif in_loop or sys_.rt.int("_t0_fe", 1) == 1:
            # some logs print no [fed] in the initial-conditions block
            # (sniffed from the committed log; iodrop-mpi1-io1 vs
            # serial-spin-fd1)
            out.write(stats.format_fed_block(tstep, *res["fed"]))
    if sys_.is_two_field:
        is_ternary = type(sys_.two_field_cfg.fe).__name__ == "TernaryFE"
        out.write(stats.format_phi_line("phi", *res["phi"]))
        # both components are labelled [phi] (ref: phi_stats.c:94 the
        # q1 default label array covers nf = 2)
        out.write(stats.format_phi_line("phi", *res["psi"]))
        if is_ternary:
            # ref: fe_ternary_stats.c:80-100
            fl = float(res["fe_sum"])
            out.write("\nFree energies\n")
            if "tern_surf" in res:
                fr, fp, fs = (float(v) for v in res["tern_surf"])
                fes = fr + fp + fs
                out.write(f"[rho/phi/psi]  {int(tstep):9d} {fr:17.10e} "
                          f"{fp:17.10e} {fs:17.10e}\n")
                out.write(f"[surf/fl/tot]  {int(tstep):9d} {fes:17.10e} "
                          f"{fl:17.10e} {fl + fes:17.10e}\n")
            else:
                out.write(f"[surf/fl/tot]  {int(tstep):9d} {0.0:17.10e} "
                          f"{fl:17.10e} {fl + 0.0:17.10e}\n")
        else:
            out.write(stats.format_fed_block(tstep, *res["fed"]))
    if sys_.is_polar:
        for a, name in enumerate(("Px ", "Py ", "Pz ")):
            out.write(stats.format_phi_line(name, *res["pvec"][a]))
        out.write(stats.format_fed_block(tstep, *res["fed"]))
    if sys_.is_droplet:
        out.write(stats.format_phi_line("phi", *res["phi"]))
        for n, name in enumerate(("Qxx", "Qxy", "Qxz", "Qyy", "Qyz")):
            out.write(stats.format_phi_line(name, *res["q5"][n]))
        out.write(stats.format_fed_block(tstep, *res["fed"]))
    if sys_.is_lc and "fe_lc_coll" in res:
        # ncolloid > 0 (ref: fe_lc_stats.c:120-140); label/t0 quirks
        # sniffed from the committed log like the plain-LC branch
        _qn = (("phi",) * 5
               if sys_.rt.string("_q_labels", "q") == "phi"
               else ("Qxx", "Qxy", "Qxz", "Qyy", "Qyz"))
        for n, name in enumerate(_qn):
            out.write(stats.format_phi_line(name, *res["q5"][n]))
        if in_loop or sys_.rt.int("_t0_fe", 1) == 1:
            ftot, vol, fs, area = (float(v) for v in res["fe_lc_coll"])
            out.write("\nFree energies - timestep f v f/v f_s a f_s/a\n")
            if area > 0.0:
                out.write(f"[fe] {int(tstep):14d} {ftot:17.10e} "
                          f"{vol:17.10e} "
                          f"{ftot / vol:17.10e} {fs:17.10e} "
                          f"{area:17.10e} "
                          f"{fs / area:17.10e}\n")
            else:
                out.write(f"[fe] {int(tstep):14d} {ftot:17.10e} "
                          f"{vol:17.10e} "
                          f"{ftot / vol:17.10e} {fs:17.10e}\n")
    elif sys_.is_lc:
        # some old logs label every tensor component [phi] (sniffed
        # from the committed log, the version string does not
        # discriminate; ref: pmpi08-chol-s01 vs serial-chol-st3)
        _qnames = (("phi",) * 5
                   if sys_.rt.string("_q_labels", "q") == "phi"
                   else ("Qxx", "Qxy", "Qxz", "Qyy", "Qyz"))
        for n, name in enumerate(_qnames):
            out.write(stats.format_phi_line(name, *res["q5"][n]))
        if in_loop or sys_.rt.int("_t0_fe", 1) == 1:
            ftot, vol, x3, x4 = (float(v) for v in res["fe_lc"])
            rs = float(res.get("redshift", sys_.lc_cfg.fe.redshift))
            if sys_.rt.int("_fed_block", 0):
                # v0.2-era LC logs print the generic free-energy
                # density block (sniffed; long64-chol-bp1.log:61-62)
                out.write(stats.format_fed_block(tstep, ftot / vol,
                                                 ftot / vol))
            elif sys_.lc_cfg.has_walls:
                out.write("\nFree energies - timestep f v f/v f_s1 "
                          "fs_s2 redshift\n")
                out.write(f"[fe] {int(tstep):14d} {ftot:17.10e} "
                          f"{vol:17.10e} "
                          f"{ftot / vol:17.10e} {x3:17.10e} {x4:17.10e} "
                          f"{rs:17.10e}\n")
            else:
                out.write("\nFree energies - timestep f v f/v f_bulk/v "
                          "f_grad/v redshift\n")
                out.write(f"[fe] {int(tstep):14d} {ftot:17.10e} "
                          f"{vol:17.10e} "
                          f"{ftot / vol:17.10e} {x3 / vol:17.10e} "
                          f"{x4 / vol:17.10e} {rs:17.10e}\n")
    g = res["g"]
    if "gwall" in res and "gc" not in res:
        gw = res["gwall"]
        gt = [g[a] + gw[a] for a in range(3)]
        out.write(stats.format_momentum_block(gt, g, gw))
    elif "gc" in res:
        gc = res["gc"]
        gw = res.get("gwall")
        gt = [g[a] + gc[a] + (gw[a] if gw is not None else 0.0)
              for a in range(3)]
        if os.environ.get("LTP_MOM_DUMP"):
            with open(os.environ["LTP_MOM_DUMP"], "a") as fh:
                fh.write(f"{int(tstep)} " + " ".join(
                    float(v).hex() for v in (g[0], g[1], g[2],
                                             gc[0], gc[1], gc[2])) + "\n")
        out.write("\nMomentum - x y z\n")
        out.write(f"[total   ] {float(gt[0]):14.7e} {float(gt[1]):14.7e} "
                  f"{float(gt[2]):14.7e}\n")
        out.write(f"[fluid   ] {float(g[0]):14.7e} {float(g[1]):14.7e} "
                  f"{float(g[2]):14.7e}\n")
        out.write(f"[colloids] {float(gc[0]):14.7e} {float(gc[1]):14.7e} "
                  f"{float(gc[2]):14.7e}\n")
        if gw is not None:
            out.write(f"[walls   ] {float(gw[0]):14.7e} "
                      f"{float(gw[1]):14.7e} {float(gw[2]):14.7e}\n")
    else:
        out.write(stats.format_momentum_block(g, g))
    if with_velocity:
        out.write(stats.format_velocity_block(*res["umm"]))
        if "uflux" in res:
            fx = res["uflux"]
            out.write(f"[vol flux] {float(fx[0]):14.7e} "
                      f"{float(fx[1]):14.7e} {float(fx[2]):14.7e}\n")
    if "ktstats" in res and in_loop:
        # ref: collision.c:1103-1110 lb_collision_stats_kt
        gx, gy, gz = (float(v) for v in res["ktstats"])
        ndim = 2 if sys_.lb_cfg.nvel == 9 else 3
        kt = sys_.lb_cfg.noise.kt * ndim
        out.write("\nIsothermal fluctuations\n")
        out.write(f"[eqipart.] {gx:14.7e} {gy:14.7e} {gz:14.7e}\n")
        out.write(f"[measd/kT] {gx + gy + gz:14.7e} {kt:14.7e}\n")
    if in_loop:
        out.write(f"\nCompleted cycle {tstep}\n")
    out.flush()


def run_text(text: str, out=sys.stdout) -> System:
    """Run a simulation from input-file text; returns the final System."""
    rt = RunTime(text)
    t0 = time.time()

    sys_ = build_system(rt)
    sys_.hydro_on = rt.switch("hydrodynamics", True)
    sys_.vol_flux = rt.string("stats_vel_print_vol_flux", "no") == "yes"
    size = sys_.lb_cfg.size

    # Device-mesh decomposition (our extension key `tpu_shard on`): the
    # reference's `grid Px_Py_Pz` spawns MPI ranks (ref: coords.c:151)
    # - here it shards ONE program's lattice arrays over the chips of a
    # 3-D jax Mesh and GSPMD emits the halo collective-permutes
    # (SURVEY 2.11).  Off by default: golden-parity runs replay the
    # reference's per-rank roundoff on one device, so `grid` without
    # `tpu_shard` stays a no-op exactly like the reference's serial
    # build ignoring its decomposition hint.
    mesh_note = None
    _shard_fn = None    # re-applied after a checkpoint restart load
    if rt.switch("tpu_shard", False):
        from ludwig_tpu.parallel.mesh import (check_divisible,
                                              default_devices,
                                              lattice_sharding, make_mesh)
        ndev = len(default_devices())
        g = rt.int_vector("grid")
        g = tuple(g) if g is not None else (ndev, 1, 1)
        try:
            if int(np.prod(g)) != ndev:
                raise ValueError(f"grid {g} != {ndev} devices")
            check_divisible(size, g)
            if sys_.fused_mode == "plain":
                # fused + sharded: route to the shard_map'd fused
                # kernel (pads exchanged as ppermute face slabs over
                # ICI).  The device mesh is 2-D over (x, y); z stays
                # whole per chip so the kernel's in-register z lane
                # rolls remain globally periodic (ref: the 3-D MPI
                # decomposition coords.c:151-257; here z-sharding would
                # fragment the 128-lane minor dim anyway).
                if g[2] != 1:
                    raise ValueError(
                        f"tpu_fused needs grid Pz == 1, got {g}")
                local = (size[0] // g[0], size[1] // g[1], size[2])
                plan = _fused_plan(local)
                if plan is None:
                    raise ValueError(
                        f"no fused block plan for local shard {local}")
                if (size[2] % 128
                        and rt.string("tpu_fused", "off") != "interpret"):
                    # the sharded kernels take an unpadded state (no z
                    # lane padding support yet); fail HERE so the
                    # except below downgrades to an unsharded run
                    # instead of a first-step trace error
                    raise ValueError(
                        f"sharded fused path needs Z % 128 == 0 "
                        f"(got {size[2]})")
                from ludwig_tpu.ops.fused import (
                    make_fused_sharded_nstep, unpad_state)
                mesh = make_mesh(g)
                nstep = make_fused_sharded_nstep(
                    sys_.lb_cfg.model, sys_.lb_cfg.collision_params(),
                    mesh, plan,
                    interpret=rt.string("tpu_fused", "off") == "interpret")
                sys_.step_fn = lambda f, t=0: nstep(f, 1)
                sys_.step_nfn = nstep
                sys_.fused_unpadded = True
                sys_.state = (unpad_state(sys_.state[0], z=size[2]),)
            elif sys_.fused_mode == "le":
                # fused + sharded Lees-Edwards: owner-shard column
                # fixes + all-gather y-shifted interpolation over the
                # mesh (ref: model_le.c:399, leesedwards.c:700)
                if g[2] != 1:
                    raise ValueError(
                        f"tpu_fused needs grid Pz == 1, got {g}")
                local = (size[0] // g[0], size[1] // g[1], size[2])
                plan = _fused_plan(local)
                if plan is None:
                    raise ValueError(
                        f"no fused block plan for local shard {local}")
                if (size[2] % 128
                        and rt.string("tpu_fused", "off") != "interpret"):
                    # sharded LE feeds _fused_call an unpadded state;
                    # fail inside this try so the fallback catches it
                    raise ValueError(
                        f"sharded fused LE needs Z % 128 == 0 "
                        f"(got {size[2]})")
                for col in sys_.le_cfg.plane_cols:
                    if col % local[0] == local[0] - 1:
                        raise ValueError(
                            f"LE plane column {col} straddles an "
                            f"x-shard boundary (local extent "
                            f"{local[0]}); choose a different grid "
                            "(ref: leesedwards.c:450)")
                from ludwig_tpu.ops.fused import (
                    make_fused_sharded_le_nstep, unpad_state)
                mesh = make_mesh(g)
                nstep = make_fused_sharded_le_nstep(
                    sys_.lb_cfg.model, sys_.lb_cfg.collision_params(),
                    sys_.le_cfg, mesh, plan,
                    interpret=rt.string("tpu_fused", "off") == "interpret")
                sys_.step_fn = lambda st, t=0: (nstep(st[0], t, 1),)
                sys_.fused_unpadded = True
                sys_.state = (unpad_state(sys_.state[0], z=size[2]),)
            elif (sys_.fused_mode in ("lc", "binary", "droplet")
                    and sys_.le_cfg is None):
                # fused LC / binary + sharded: shard_map'd two-kernel
                # steps (q/u radius-2 pads exchanged by ppermute)
                if g[2] != 1:
                    raise ValueError(
                        f"tpu_fused needs grid Pz == 1, got {g}")
                local = (size[0] // g[0], size[1] // g[1], size[2])
                plan = _fused_plan(local)
                if plan is None:
                    raise ValueError(
                        f"no fused block plan for local shard {local}")
                interp = rt.string("tpu_fused", "off") == "interpret"
                mesh = make_mesh(g)
                from ludwig_tpu.ops.fused import unpad_state
                if sys_.fused_mode == "lc":
                    from ludwig_tpu.ops.fused_lc import (
                        LCPlan, make_fused_lc_sharded_step, unpad_q)
                    sys_.step_fn = make_fused_lc_sharded_step(
                        sys_.lc_cfg, mesh,
                        LCPlan(min(8, plan.BX), plan.BY),
                        lb_plan=plan, interpret=interp)
                    sys_.state = (unpad_state(sys_.state[0]),
                                  unpad_q(sys_.state[1]),
                                  sys_.state[2])
                elif sys_.fused_mode == "droplet":
                    from ludwig_tpu.ops.fused_binary import unpad_phi
                    from ludwig_tpu.ops.fused_droplet import (
                        DropletPlan, make_fused_droplet_sharded_step)
                    from ludwig_tpu.ops.fused_lc import unpad_q
                    sys_.step_fn = make_fused_droplet_sharded_step(
                        sys_.droplet_cfg, mesh,
                        DropletPlan(min(8, plan.BX), plan.BY),
                        lb_plan=plan, interpret=interp)
                    sys_.state = (unpad_state(sys_.state[0]),
                                  unpad_phi(sys_.state[1]),
                                  unpad_q(sys_.state[2]),
                                  sys_.state[3])
                else:
                    from ludwig_tpu.ops.fused_binary import (
                        BinaryPlan, make_fused_binary_sharded_step,
                        unpad_phi)
                    sys_.step_fn = make_fused_binary_sharded_step(
                        sys_.binary_cfg, mesh,
                        BinaryPlan(min(8, plan.BX), plan.BY),
                        lb_plan=plan, interpret=interp)
                    sys_.state = (unpad_state(sys_.state[0]),
                                  unpad_phi(sys_.state[1]),
                                  sys_.state[2])
                sys_.fused_unpadded = True
            elif sys_.fused_mode is not None:
                raise ValueError(
                    f"sharding not supported with the fused "
                    f"'{sys_.fused_mode}' kernels yet")
            else:
                mesh = make_mesh(g)

            def _shard_apply():
                def _shard(leaf):
                    if (hasattr(leaf, "ndim") and leaf.ndim >= 3
                            and tuple(leaf.shape[-3:]) == tuple(size)):
                        return jax.device_put(
                            leaf, lattice_sharding(mesh, leaf.ndim - 3))
                    return leaf
                sys_.state = jax.tree_util.tree_map(_shard, sys_.state)

            _shard_fn = _shard_apply
            _shard_fn()
            mesh_note = dict(mesh.shape)
        except ValueError as e:
            out.write(f"tpu_shard: {e}; running unsharded\n\n")

    from ludwig_tpu.fulllog import InitLog
    initlog = InitLog(rt, sys_, out)
    if mesh_note is not None:
        # our extension: report the real device mesh in place of the
        # (serial-build no-op) reference decomposition hint
        initlog.grid = (mesh_note["x"], mesh_note["y"], mesh_note["z"])
        initlog.is_device_mesh = True

    ncycles = rt.int("N_cycles", 0)
    freq = rt.int("freq_statistics", max(ncycles, 1))
    stats_fn = (_make_fast_stats_fn(sys_) if sys_.fused_mode is not None
                else _make_stats_fn(sys_))

    # checkpoint / restart (ref: ludwig.c:310-369, 868-916)
    from ludwig_tpu.io import read_state, write_state
    iodir = rt.string("io_directory", ".")
    freq_config = rt.int("freq_config", 0)
    config_at_end = rt.switch("config_at_end", False)
    n_start = rt.int("N_start", 0)
    sys_.n_start = n_start

    # reference-format binary field output (ref: ludwig.c
    # is_phi_output_step/is_vel_output_step; io_impl_mpio.c records)
    freq_phi = rt.int("freq_phi", 0)
    freq_vel = rt.int("freq_vel", 0)
    freq_psi = rt.int("freq_psi", 0)
    _periodic = tuple(rt.int_vector("periodicity", (1, 1, 1)))

    # measurement / shear-profile scheduling (ref: control.c
    # freq_measure, freq_shear_measurement, freq_shear_output,
    # colloid_io_freq; ludwig.c:875-936)
    freq_measure = rt.int("freq_measure", 0)
    freq_colloid_io = rt.int("colloid_io_freq", 0)
    freq_shear_meas = rt.int("freq_shear_measurement", 0)
    freq_shear_io = rt.int("freq_shear_output", 0)
    rheo = None
    if freq_shear_meas or freq_shear_io:
        from ludwig_tpu.stats_extra import RheologyAccumulator
        rheo = RheologyAccumulator(size)

    def _binary_fields(state):
        """phi + gradients for host-side fe evaluations (stress/fed)."""
        from ludwig_tpu.binary import binary_solid_ops, fe_fields
        bcfg = sys_.binary_cfg
        sops = binary_solid_ops(bcfg, solid=sys_.solid,
                                wallspec=sys_.wallspec)
        return fe_fields(state[1], bcfg.gradient, bcfg.fourth_order, sops)

    def _rheo_pth(state):
        # thermodynamic stress for the profile (ref: fe->func->stress in
        # stats_rheology_stress_profile_accumulate; fe_null -> zeros)
        if sys_.binary_cfg is not None and not sys_.is_colloid:
            bcfg = sys_.binary_cfg
            return jax.device_get(bcfg.fe.stress(_binary_fields(state)))
        return None

    # surface-tension calibration (ref: stats_sigma.c, switched on by
    # 'calibration_sigma on'; drop-initialised phi + [sigma] lines at
    # measurement steps)
    sigma_cal = None
    if (rt.switch("calibration_sigma", False)
            and sys_.binary_cfg is not None):
        from ludwig_tpu.stats_extra import SigmaCalibration
        bcfg = sys_.binary_cfg
        sigma_cal = SigmaCalibration(bcfg.fe, size, bcfg.mobility)
        phi0 = jnp.asarray(sigma_cal.init_phi(np.float64),
                           sys_.state[1].dtype)
        if sys_.fused_mode == "binary":
            from ludwig_tpu.ops.fused_binary import pad_phi
            phi0 = pad_phi(phi0)
        sys_.state = (sys_.state[0], phi0) + tuple(sys_.state[2:])
        initlog.sigma_cal = sigma_cal   # banner emitted in init order

    # I/O decomposition (ref: io_info_args_rt.c:55-57 "<stub>_io_grid"
    # overriding "default_io_grid"); grid != 1_1_1 writes an iogrid
    # subfile set via the parallel writer (io/sharded.py)
    _io_grid_default = tuple(rt.int_vector("default_io_grid", (1, 1, 1)))

    def _write_field(name, step, arr):
        from ludwig_tpu.io.ref_format import write_ref_field
        grid = tuple(rt.int_vector(f"{name}_io_grid", _io_grid_default))
        _le = (None if sys_.le_cfg is None
               else (sys_.le_cfg.nplanes, sys_.le_cfg.uy))
        if grid != (1, 1, 1):
            from ludwig_tpu.io.sharded import write_sharded
            write_sharded(iodir, name, step, np.asarray(arr), grid=grid,
                          periodic=_periodic, le=_le)
        else:
            write_ref_field(iodir, name, step, arr, periodic=_periodic,
                            le=_le)

    def _ref_dump(step, state, u):
        if sys_.fused_mode is not None:
            state, u = _fused_view(state, u)
        if freq_phi and step % freq_phi == 0:
            if sys_.is_lc:
                _write_field("q", step, jax.device_get(state[1]))
            elif sys_.is_binary_lb:
                from ludwig_tpu.binary_lb import g_moments
                _write_field(
                    "phi", step,
                    jax.device_get(g_moments(state[1],
                                             sys_.lb_cfg.model)[0]))
            elif sys_.is_binary or sys_.is_two_field or sys_.is_droplet:
                _write_field("phi", step, jax.device_get(state[1]))
            elif sys_.is_colloid and sys_.binary_cfg is not None:
                _write_field("phi", step, jax.device_get(state[7]))
        if freq_vel and step % freq_vel == 0:
            _write_field("vel", step, jax.device_get(u))
        if freq_psi and step % freq_psi == 0 and sys_.is_electro:
            off = 1 if sys_.es_cfg is not None else 0
            _write_field("psi", step, jax.device_get(state[1 + off]))
            _write_field("rho", step, jax.device_get(state[2 + off]))

    def _field_names():
        names = ["dist"]
        if sys_.is_binary:
            names.append("phi")
        if sys_.is_two_field:
            names += ["phi", "psi"]
        if sys_.is_lc:
            names.append("q")
        if (sys_.is_binary or sys_.is_lc or sys_.is_two_field
                or sys_.is_droplet):
            names.append("vel")
        return names

    def _dump_colloids(step, state):
        if sys_.is_colloid:
            # reference-format colloid configuration dump
            # (ref: colloid_io.c colloid_io_write, config.cds%8.8d)
            import os as _os
            from ludwig_tpu.io.colloid_io import (default_state,
                                                  write_colloid_file)
            cp = sys_.colloid_params
            R = np.asarray(jax.device_get(state[1]))
            V = np.asarray(jax.device_get(state[2]))
            W = np.asarray(jax.device_get(state[3]))
            dr = np.asarray(jax.device_get(state[4]))
            M = np.asarray(jax.device_get(state[6]))
            recs = []
            for n in range(cp.n):
                rec = default_state()
                rec["index"] = n + 1
                rec["a0"], rec["ah"] = cp.a0[n], cp.ah[n]
                rec["r"] = [float(c) + 1.0 for c in R[n]]
                rec["v"] = [float(c) for c in V[n]]
                rec["w"] = [float(c) for c in W[n]]
                rec["dr"] = [float(c) for c in dr[n]]
                rec["m"] = [float(c) for c in M[n]]
                rec["b1"], rec["b2"] = cp.b1[n], cp.b2[n]
                rec["type"] = {"default": 0, "active": 1,
                               "subgrid": 2}.get(cp.types[n], 0)                     if cp.types else 0
                if sys_.colloid_charge is not None:
                    rec["q0"], rec["q1"] = (
                        float(v) for v in sys_.colloid_charge[n])
                    dq = np.asarray(jax.device_get(state[10]))
                    rec["deltaq0"], rec["deltaq1"] = (float(dq[n, 0]),
                                                      float(dq[n, 1]))
                recs.append(rec)
            write_colloid_file(
                _os.path.join(iodir, f"config.cds{step:08d}.001-001"),
                recs)

    def _dump(step, state):
        _dump_colloids(step, state)
        # friendly names for the classic fields, generic ones for the
        # rest of the state pytree (colloid state, noise, BC carries) so
        # EVERY run restarts exactly (ref: ludwig.c:868-916 writes all
        # fields + config.cds colloid state at freq_config)
        names = _field_names()
        leaves = jax.tree_util.tree_leaves(state)
        fields = {}
        for i, leaf in enumerate(leaves):
            nm = names[i] if i < len(names) else f"state{i:02d}"
            fields[nm] = leaf
        write_state(iodir, step, fields)

    if n_start > 0:
        names = _field_names()
        leaves0, treedef = jax.tree_util.tree_flatten(sys_.state)
        keys = [names[i] if i < len(names) else f"state{i:02d}"
                for i in range(len(leaves0))]
        data = read_state(iodir, n_start, keys)
        new_leaves = [jnp.asarray(data[k], leaf.dtype)
                      for k, leaf in zip(keys, leaves0)]
        sys_.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        if _shard_fn is not None:
            # jnp.asarray above placed the leaves on the default device;
            # a sharded run must re-apply the mesh placement or the
            # restart silently runs serial (and OOMs at scale)
            _shard_fn()
        # diagnostic only: no reference vintage prints a restart line
        print(f"Restart from step {n_start}", file=sys.stderr)

    @jax.jit
    def _wall_collide_u(state):
        """Collision-time (force-shifted) velocity the next step's
        collide computes from the pre-step state: (g + F/2)/rho."""
        from ludwig_tpu.lb import hydro_fields
        from ludwig_tpu.ops.fused import unpad_state
        f = unpad_state(state[0], z=size[2])
        rho_, g_ = hydro_fields(f, sys_.lb_cfg.model)
        fg = sys_.lb_cfg.collision_params().force_global
        g_ = g_ + 0.5 * jnp.asarray(
            np.asarray(fg[:3]), g_.dtype)[:, None, None, None]
        return g_ / rho_

    def _fused_view(state, u=None):
        """Unpadded (state, u) view of a fused-mode state for the
        statistics / IO machinery."""
        from ludwig_tpu.ops.fused import unpad_state
        if sys_.fused_mode in ("plain", "le"):
            from ludwig_tpu.lb import hydro_fields
            f = (state[0] if sys_.fused_unpadded
                 else unpad_state(state[0], z=size[2]))
            if u is None:
                # the reference's hydro u is the collision-time
                # force-shifted velocity (g_pre + F/2)/rho; after the
                # kick the stored momentum is g_pre + F, so subtract F/2
                rho_, g_ = hydro_fields(f, sys_.lb_cfg.model)
                fg = sys_.lb_cfg.collision_params().force_global
                g_ = g_ - 0.5 * jnp.asarray(
                    np.asarray(fg[:3]), g_.dtype)[:, None, None, None]
                u = g_ / rho_
            return (f,), u
        if sys_.fused_mode == "wall":
            from ludwig_tpu.lb import hydro_fields
            f = unpad_state(state[0], z=size[2])
            if u is None:
                # fallback (t = 0 report passes zeros; the loop passes
                # the pre-step collision-time u explicitly)
                rho_, g_ = hydro_fields(f, sys_.lb_cfg.model)
                fg = sys_.lb_cfg.collision_params().force_global
                g_ = g_ - 0.5 * jnp.asarray(
                    np.asarray(fg[:3]), g_.dtype)[:, None, None, None]
                u = g_ / rho_
            return (f, state[1]), u
        if sys_.fused_mode == "binary":
            from ludwig_tpu.ops.fused_binary import unpad_phi
            if sys_.fused_unpadded:
                return (state, state[2] if u is None else u)
            return ((unpad_state(state[0]), unpad_phi(state[1]),
                     state[2]), state[2] if u is None else u)
        if sys_.fused_mode == "droplet":
            from ludwig_tpu.ops.fused_binary import unpad_phi
            from ludwig_tpu.ops.fused_lc import unpad_q
            if sys_.fused_unpadded:
                return (state, state[3] if u is None else u)
            return ((unpad_state(state[0]), unpad_phi(state[1]),
                     unpad_q(state[2]), state[3]),
                    state[3] if u is None else u)
        from ludwig_tpu.ops.fused_lc import unpad_q
        if sys_.fused_unpadded:
            return (state, state[2] if u is None else u)
        return ((unpad_state(state[0]), unpad_q(state[1]), state[2]),
                state[2] if u is None else u)

    def _op_fields(state):
        # copies: the step donates its input buffers
        if sys_.fused_mode == "lc":
            from ludwig_tpu.ops.fused_lc import unpad_q
            if sys_.fused_unpadded:
                return (jnp.array(state[1]),)
            return (jnp.array(unpad_q(state[1])),)   # pre-update q
        if sys_.fused_mode == "binary":
            from ludwig_tpu.ops.fused_binary import unpad_phi
            if sys_.fused_unpadded:
                return (jnp.array(state[1]),)
            return (jnp.array(unpad_phi(state[1])),)   # pre-update phi
        if sys_.fused_mode == "droplet":
            from ludwig_tpu.ops.fused_binary import unpad_phi
            from ludwig_tpu.ops.fused_lc import unpad_q
            if sys_.fused_unpadded:
                return (jnp.array(state[1]), jnp.array(state[2]))
            return (jnp.array(unpad_phi(state[1])),
                    jnp.array(unpad_q(state[2])))
        if sys_.fused_mode is not None:
            return ()
        if sys_.le_cfg is not None:
            if sys_.is_droplet:
                # droplet LE state is (f, phi, q5, u) without grads
                return (jnp.array(state[1]), jnp.array(state[2]))
            return ()   # LE runs carry stale gradients in the state
        if sys_.is_colloid:
            out = (jnp.array(state[2]),)    # start-of-step velocities
            if sys_.binary_cfg is not None:
                out = out + (jnp.array(state[7]),)   # start-of-step phi
            elif sys_.lb2_cfg is not None:
                from ludwig_tpu.binary_lb import g_moments
                out = out + (g_moments(jnp.array(state[7]),
                                       sys_.lb_cfg.model)[0],)
            return out
        if sys_.is_binary_lb:
            from ludwig_tpu.binary_lb import g_moments
            return (g_moments(state[1], sys_.lb_cfg.model)[0],)
        if sys_.es_cfg is not None:
            return (jnp.array(state[1]),)    # start-of-step phi
        if (sys_.is_binary or sys_.is_two_field or sys_.is_droplet
                or sys_.is_polar):
            return tuple(jnp.array(x) for x in state[1:-1])
        return ()

    # hydrodynamic-radius calibration (ref: stats_calibration.c, key
    # `calibration on`; requires exactly one resolved colloid)
    ahydro = None
    _cp = sys_.colloid_params
    if (rt.switch("calibration", False) and sys_.is_colloid
            and _cp.n == 1):
        from ludwig_tpu.stats_extra import AhydroCalibration
        ahydro = AhydroCalibration(
            max(_cp.ah), _cp.a0[0], sys_.lb_cfg.eta_shear,
            sys_.lb_cfg.rho0, _cp.rho0, size, _cp.gravity)
        initlog.ahydro = ahydro         # banner emitted in init order
        from ludwig_tpu.colloids import build_map as _ah_bm

        @jax.jit
        def _ahydro_meas(R, V, u):
            """Particle velocity minus fluid-site mean velocity
            (ref: stats_ahydro_measure)."""
            _, inside = _ah_bm(R, _cp, size)
            fl = jnp.logical_not(inside)
            vol = jnp.sum(fl.astype(u.dtype))
            um = jnp.stack([jnp.sum(jnp.where(fl, u[a], 0.0))
                            for a in range(3)]) / vol
            return V[0] - um

    # the complete init log surface, then the t = 0 report, exactly as
    # the reference orders them (ref: ludwig.c:204-530)
    initlog.emit()
    if os.environ.get("LTP_INIT_ONLY"):
        # dev hook (util/fullcheck.py): init-surface parity loop skips
        # the t = 0 statistics and the time loop entirely
        return sys_
    u = jnp.zeros((3,) + size, sys_.lb_cfg.jdtype)
    if sys_.fused_mode is not None:
        _padded0 = sys_.state
        sys_.state, _ = _fused_view(_padded0, u)
        report_statistics(sys_, sys_.n_start, u, stats_fn,
                          with_velocity=False, out=out, in_loop=False,
                          prev=())
        sys_.state = _padded0
    else:
        report_statistics(sys_, sys_.n_start, u, stats_fn,
                          with_velocity=False, out=out, in_loop=False,
                          prev=_op_fields(sys_.state))

    out.write("\nStarting time step loop.\n")
    t_init = time.time() - t0
    state = sys_.state
    # per-section wall-clock accumulators (ref: TIMER_statistics
    # sections; under jit the whole step is one fused program, so the
    # honest split is dispatch / statistics / IO - device time for the
    # async step dispatch is attributed to the first section that
    # blocks on its results, exactly as the reference's GPU builds
    # attribute kernel time to the next synchronising phase)
    sect = {"step": [0.0, float("inf"), 0.0, 0],
            "stats": [0.0, float("inf"), 0.0, 0],
            "cfgio": [0.0, float("inf"), 0.0, 0],
            "fldio": [0.0, float("inf"), 0.0, 0]}

    def _acc(key, dt_):
        s = sect[key]
        s[0] += dt_
        s[1] = min(s[1], dt_)
        s[2] = max(s[2], dt_)
        s[3] += 1

    def _loop_outputs(t, state, u, prev):
        _ek = getattr(sys_.electro_cfg, "ek", sys_.electro_cfg) \
            if sys_.is_electro else None
        # colloid runs print the particle-statistics section at the
        # START of the step's outputs - before the SOR report and the
        # dump lines (ref: interaction.c:207 in colloids_update vs
        # ludwig.c:866-948 io; e.g. serial-rest-c01.log:98-110,
        # serial-rest-ec1.log:107-116).  Compute the stats ONCE here
        # and hand them to report_statistics below.
        _res = None
        if (t % freq == 0 and sys_.is_colloid
                and sys_.fused_mode is None):
            _res = compute_stats_res(sys_, t, u, stats_fn, prev=prev)
            if "vcol" in _res:
                report_particle_block(sys_, _res, out=out)
        _nfreq = rt.int("freq_psi_resid", freq) if sys_.is_electro else 0
        if (sys_.is_electro and _nfreq and t % _nfreq == 0
                and getattr(sys_, "_last_sor", None) is not None
                and _ek.solver != "fft"):
            # SOR convergence report at statistics steps (ref:
            # psi_sor.c:263-292 gated on its % nfreq; the old-era
            # "per site" normalisation divides by the site count)
            s_n, s_r, s_w = (jax.device_get(v) for v in sys_._last_sor)
            hdr = ("SOR (heterogeneous) solver"
                   if (sys_.es_cfg is not None
                       and getattr(sys_.es_cfg.fe, "gamma", 0.0) != 0.0)
                   else "SOR solver")
            kind = "absolute" if int(s_w) == 0 else "relative"
            out.write(f"\n{hdr} converged to {kind} tolerance\n")
            if rt.int("_log_vintage", 99) <= 7:
                out.write(f"SOR residual per site  "
                          f"{float(s_r) / float(np.prod(size)):14.7e} "
                          f"at {int(s_n)} iterations\n")
            else:
                out.write(f"SOR residual {float(s_r):14.7e} "
                          f"at {int(s_n)} iterations\n")
            out.write(f"{_ek.multisteps} multisteps\n")
        # configuration/field dumps and their log lines come BEFORE the
        # statistics block of the same step (ref: ludwig.c:866-948)
        is_config = ((freq_config and t % freq_config == 0)
                     or (config_at_end and t == sys_.n_start + ncycles
                         and rt.string("_cfg_end_style",
                                       "inloop") == "inloop"))
        if is_config:
            ts0 = time.time()
            out.write(f"Writing distribution output at step {t}!\n")
            if sys_.is_colloid:
                out.write(f"Writing colloid output at step {t}!\n")
                out.write("\ncolloid_io_write:\n")
                out.write(f"writing colloid information to "
                          f"config.cds{t:08d}.001-001 etc\n")
            _dump(t, state)
            _acc("cfgio", time.time() - ts0)
        elif ((freq_measure and t % freq_measure == 0)
                or (freq_colloid_io and t % freq_colloid_io == 0)):
            # colloid state is also written at measurement /
            # colloid-io steps (ref: ludwig.c:878-884)
            if sys_.is_colloid:
                out.write(f"Writing colloid output at step {t}!\n")
                out.write("\ncolloid_io_write:\n")
                out.write(f"writing colloid information to "
                          f"config.cds{t:08d}.001-001 etc\n")
            _dump_colloids(t, state)
        _has_op = (sys_.is_binary or sys_.is_two_field or sys_.is_droplet
                   or sys_.is_binary_lb
                   or (sys_.is_colloid and sys_.binary_cfg is not None))
        if (freq_phi and t % freq_phi == 0) or is_config:
            if _has_op:
                out.write(f"Writing phi file at step {t}!\n")
            if sys_.is_lc or sys_.is_droplet:
                out.write(f"Writing q file at step {t}!\n")
        if sys_.is_electro and ((freq_psi and t % freq_psi == 0)
                                or is_config):
            out.write(f"Writing psi file at step {t}!\n")
        if sys_.hydro_on and ((freq_vel and t % freq_vel == 0)
                              or is_config):
            out.write(f"Writing rho/velocity output at step {t}!\n")
        if freq_measure and t % freq_measure == 0 and sigma_cal is not None:
            # (ref: ludwig.c:920-923 stats_sigma_measure)
            stv = (_fused_view(state)[0] if sys_.fused_mode is not None
                   else state)
            fl_ = _binary_fields(stv)
            radius, xifit, sig = sigma_cal.measure(
                jax.device_get(stv[1]), fl_)
            out.write("\nSurface tension calibration - radius xi0 "
                      "surface tension\n")
            out.write(f"[sigma] {t:14d} {radius:14.7e} {xifit:14.7e} "
                      f"{sig:14.7e}\n")
        if freq_shear_meas and t % freq_shear_meas == 0:
            # (ref: ludwig.c:925-929, stats_rheology accumulate)
            st_ = (_fused_view(state)[0] if sys_.fused_mode is not None
                   else state)
            rheo.accumulate(jax.device_get(st_[0]), sys_.lb_cfg.model,
                            _rheo_pth(st_))
        if freq_shear_io and t % freq_shear_io == 0:
            # (ref: ludwig.c:931-935, str-%8.8d.dat + zero)
            import os as _os
            rheo.write_section(_os.path.join(iodir, f"str-{t:08d}.dat"),
                               sys_.lb_cfg.eta_shear)
            rheo.zero()
        if t % freq == 0:
            ts0 = time.time()
            if sys_.fused_mode is not None:
                sys_.state, u = _fused_view(state, u)
                report_statistics(sys_, t, u, stats_fn, out=out,
                                  with_velocity=sys_.hydro_on, prev=prev)
                sys_.state = state
            else:
                report_statistics(sys_, t, u, stats_fn, out=out,
                                  with_velocity=sys_.hydro_on, prev=prev,
                                  res=_res, particle=_res is None)
            _acc("stats", time.time() - ts0)
        if freq_phi or freq_vel or freq_psi:
            ts0 = time.time()
            _ref_dump(t, state, u)
            _acc("fldio", time.time() - ts0)

    _tend = sys_.n_start + ncycles
    _freqs = [fq for fq in (freq, freq_config, freq_measure,
                            freq_colloid_io, freq_shear_meas,
                            freq_shear_io, freq_phi, freq_vel, freq_psi)
              if fq]

    def _event_gap(t0):
        """Steps from t0 (inclusive) to the next output event."""
        k = _tend - t0 + 1
        for fq in _freqs:
            k = min(k, fq - (t0 - 1) % fq)
        return max(k, 1)

    _chunk_cache = {}

    # non-fused production chaining: batch the steps between output
    # events into one scanned program (same motivation as _fused_chain;
    # per-step dispatch over the remote relay costs ~28 ms).  Colloid
    # runs chain only with rebuild_freq == 1 (the rebuild branch is
    # resolved statically per step otherwise).
    _plain_state1 = (sys_.fused_mode is None and not sys_.is_colloid
                     and sys_.wallspec is None and not sys_.is_electro
                     and not sys_.is_binary_lb
                     and not (sys_.is_binary or sys_.is_lc
                              or sys_.is_two_field or sys_.is_droplet
                              or sys_.is_polar)
                     and not sys_.has_kiss)
    _chain_ok = (sys_.fused_mode is None
                 and (not sys_.is_colloid
                      or rt.int("colloid_rebuild_freq", 1) == 1)
                 and ahydro is None)

    # one step in the shape every event-step unpack below expects
    # (state first, then the family's aux outputs)
    if sys_.is_colloid:
        def _step1(s, tt):
            return tuple(sys_.step_fn(s, tt, True))
    elif _plain_state1:
        def _step1(s, tt):
            f_, rho_, u_ = sys_.step_fn(s[0], tt)
            return ((f_,), rho_, u_)
    else:
        def _step1(s, tt):
            return tuple(sys_.step_fn(s, tt))

    _chain_fn = [None]

    def _jnp_chain(state, n, t0):
        """n steps as ONE jitted dynamic-trip fori_loop; returns the
        full (state, *aux) result tuple of the LAST step.

        Compiled exactly ONCE per run: n and t0 are traced scalars, so
        every event gap - including the n=1 event step itself - reuses
        the same executable.  (The earlier per-gap-length scan compiled
        a fresh multi-minute program for each distinct gap on the big
        colloid cases, plus the standalone step program - three ~2 min
        XLA compiles where one suffices.)"""
        prep = getattr(sys_.step_fn, "prepare", None)
        if prep is not None:
            # stabilise the carry pytree (e.g. the colloid pmap cache)
            # before tracing the loop
            state = prep(state)
        fn = _chain_fn[0]
        if fn is None:
            from functools import partial as _p

            # aux carry seed with the step's output structure (shapes
            # only - no compile)
            res_sds = jax.eval_shape(_step1, state,
                                     jax.ShapeDtypeStruct((), jnp.int32))
            aux_sds = tuple(res_sds[1:])

            @_p(jax.jit, donate_argnums=0)
            def fn(st, n_, t0_):
                aux0 = jax.tree.map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), aux_sds)
                def body(k, c):
                    return _step1(c[0], t0_ + k)
                return jax.lax.fori_loop(0, n_, body, (st,) + aux0)

            _chain_fn[0] = fn
        return fn(state, jnp.asarray(n, jnp.int32),
                  jnp.asarray(t0, jnp.int32))

    def _fused_chain(state, n, t0):
        """n fused steps as ONE scanned program (per-step dispatch over
        the remote relay costs ~0.2 s; production throughput needs the
        steps between output events batched).  t0 is the timestep of the
        first chained step (the LE displacement is t-dependent)."""
        if sys_.step_nfn is not None:
            return (sys_.step_nfn(state[0], n),)
        fn = _chunk_cache.get(n)
        if fn is None:
            from functools import partial as _p
            plain = sys_.fused_mode == "plain"

            @_p(jax.jit, donate_argnums=0)
            def fn(st, t0_):
                def body(s, tt):
                    if plain:
                        return (sys_.step_fn(s[0], tt),), None
                    return sys_.step_fn(s, tt), None
                st, _ = jax.lax.scan(body, st, t0_ + jnp.arange(n))
                return st

            _chunk_cache[n] = fn
        return fn(state, t0)

    t = sys_.n_start + 1
    while t <= _tend:
        ts0 = time.time()
        if sys_.fused_mode is not None:
            k = _event_gap(t)
            if k > 1:
                state = _fused_chain(state, k - 1, t)
                t += k - 1
            prev = _op_fields(state)
            if sys_.fused_mode == "plain":
                state = (sys_.step_fn(state[0], t),)
                rho = u = None   # derived from f at statistics steps
            elif sys_.fused_mode in ("wall", "le"):
                # the logged u is the collision-time velocity of THIS
                # step: (g + F/2)/rho from the PRE-step state, exactly
                # what the jnp path's collide returns (ref: hydro u set
                # in lb_collision_mrt1)
                u = _wall_collide_u(state)
                state = sys_.step_fn(state, t)
                rho = None
            else:
                state = sys_.step_fn(state, t)
                rho, u = None, state[-1]   # u rides at the state tail
            sys_.state = state
            _acc("step", time.time() - ts0)
            _loop_outputs(t, state, u, prev)
            t += 1
            continue
        if _chain_ok:
            k = _event_gap(t)
            if k > 1:
                state = _jnp_chain(state, k - 1, t)[0]
                sys_.state = state
                t += k - 1
        prev = _op_fields(state)
        if _chain_ok:
            # the event step reuses the SAME compiled chain (n=1)
            res = _jnp_chain(state, 1, t)
        elif sys_.is_colloid:
            res = sys_.step_fn(state, t)
        elif _plain_state1:
            f, rho, u = sys_.step_fn(state[0], t)
            res = ((f,), rho, u)
        else:
            res = sys_.step_fn(state, t)
        if sys_.is_colloid:
            state, _aux = res
            if sys_.is_electro:
                # electro-colloid step also reports its SOR convergence
                rho, u = _aux[0], _aux[1]
                sys_._last_sor = _aux[2]
            else:
                rho, u = _aux
            if ahydro is not None and ahydro.wants(t):
                rel = jax.device_get(_ahydro_meas(state[1], state[2], u))
                ahydro.accumulate(jax.device_get(state[2])[0],
                                  jax.device_get(prev[0])[0], rel)
        elif (sys_.wallspec is not None and not sys_.is_binary
                and not sys_.is_two_field and not sys_.is_binary_lb):
            state, rho, u = res
        elif sys_.is_electro:
            state, (rho, _sor) = res
            sys_._last_sor = _sor
            u = state[4] if sys_.es_cfg is not None else state[3]
        elif sys_.is_binary_lb:
            state, (rho, _phi) = res
            u = state[2]
        elif (sys_.is_binary or sys_.is_lc or sys_.is_two_field
                or sys_.is_droplet or sys_.is_polar):
            state, rho = res
            if sys_.is_two_field:
                u = state[3]
            elif (sys_.is_lc or sys_.le_cfg is not None
                    or sys_.wallspec is not None or sys_.has_kiss):
                u = state[2]
            else:
                u = state[-1]
        else:
            # plain fluid (incl. reference-exact KISS noise state)
            state, rho, u = res
        sys_.state = state
        _acc("step", time.time() - ts0)
        _loop_outputs(t, state, u, prev)
        t += 1

    # config_at_end output: the current eras take the in-loop config
    # step at t == n_start + ncycles (ref: control.c:118-127
    # is_config_step, handled in _loop_outputs); the v0.11-class
    # blessings wrote AFTER the loop with field lines only
    _cfg_style = rt.string("_cfg_end_style", "inloop")
    if config_at_end and ncycles > 0 and _cfg_style != "inloop":
        _tend_ = sys_.n_start + ncycles
        if _cfg_style == "after":
            _has_op_ = (sys_.is_binary or sys_.is_two_field
                        or sys_.is_droplet or sys_.is_binary_lb
                        or (sys_.is_colloid
                            and sys_.binary_cfg is not None))
            if _has_op_:
                out.write(f"Writing phi file at step {_tend_}!\n")
            if sys_.is_lc or sys_.is_droplet:
                out.write(f"Writing q file at step {_tend_}!\n")
            if sys_.is_electro:
                out.write(f"Writing psi file at step {_tend_}!\n")
            if sys_.hydro_on:
                out.write(f"Writing rho/velocity output at step "
                          f"{_tend_}!\n")
        _dump(_tend_, state)

    if ahydro is not None:
        ahydro.report(out)

    # timer table (ref: TIMER_statistics table shape)
    total = time.time() - t0
    per_step = (total - t_init) / max(ncycles, 1)
    out.write("\nTimer resolution: 1e-09 second\n")
    out.write("\nTimer statistics\n")
    out.write("             Section:       tmin       tmax      total\n")
    out.write(f"               Total: {total:10.3f} {total:10.3f} "
              f"{total:10.3f} {total:10.6f} (1 call)\n")
    out.write(f"      Initialisation: {t_init:10.3f} {t_init:10.3f} "
              f"{t_init:10.3f} {t_init:10.6f} (1 call)\n")
    out.write(f"      Time step loop: {per_step:10.3f} {per_step:10.3f} "
              f"{total - t_init:10.3f} {per_step:10.6f} "
              f"({max(ncycles, 1)} calls)\n")
    for key, label in (("step", "Step dispatch"), ("stats", "Statistics"),
                       ("cfgio", "Configuration IO"),
                       ("fldio", "Field output")):
        tot, tmin, tmax, ncall = sect[key]
        if not ncall:
            continue
        out.write(f"{label:>20s}: {tmin:10.3f} {tmax:10.3f} "
                  f"{tot:10.3f} {tot / ncall:10.6f} ({ncall} calls)\n")

    if rt.switch("tpu_timer_detail", False) and ncycles > 0:
        # per-phase breakdown (ref: the reference's ~45 TIMER sections,
        # timer.h:52-100, e.g. Collision/Propagation/Lattice halos/
        # phi gradients/BBL/Poisson).  Under jit the production step is
        # ONE fused program, so honest phase costs are measured by
        # running each phase standalone on the final state, fenced.
        for name, dt_ in _timer_detail(sys_, state, stats_fn):
            out.write(f"{name:>20s}: {dt_:10.3f} {dt_:10.3f} "
                      f"{dt_:10.3f} {dt_:10.6f} (probe)\n")
    initlog.tail()
    return sys_


def _timer_detail(sys_, state, stats_fn, reps: int = 3):
    """Measured per-phase costs (seconds per call) on the final state.

    Mirrors the reference's per-phase TIMER sections (timer.h:52-100:
    Collision/Propagation/Lattice halos/phi gradients/BBL/Poisson) for
    the phases that exist in each production mode.  Under jit the step
    is one fused program, so each phase is jitted standalone, compiled
    by a warmup call, then timed with a scalar-readback fence
    (block_until_ready is unreliable over remote relays)."""
    import jax as _jax
    tu = _jax.tree_util

    def _fence(x):
        return float(jnp.ravel(tu.tree_leaves(x)[0])[0])

    def _time(fn, *args):
        _fence(fn(*args))           # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _fence(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def _step_probe():
        # the production step donates its input: regenerate the state
        # copy inside the timed call (adds one state copy to the time)
        return _time(lambda s: tu.tree_leaves(
            sys_.step_fn(tu.tree_map(jnp.array, s), 1))[0], state)

    model = sys_.lb_cfg.model
    params = sys_.lb_cfg.collision_params()
    rows = []
    try:
        if sys_.fused_mode in ("plain", "wall", "le"):
            from ludwig_tpu.ops.fused import _fused_call, _pad_refresh
            plan = _fused_plan(sys_.lb_cfg.size)
            fpad = state[0]
            interp = (sys_.rt.string("tpu_fused", "off") == "interpret")
            rows.append(("Collide+stream", _time(
                _jax.jit(lambda fp: _fused_call(fp, model, params, plan,
                                                interp)), fpad)))
            rows.append(("Pad refresh", _time(
                _jax.jit(_pad_refresh), fpad)))
        elif sys_.fused_mode == "binary" and not sys_.fused_unpadded:
            from ludwig_tpu.ops.fused_binary import binary_phi_force_step
            from ludwig_tpu.ops.fused_lc import pad_q
            bcfg = sys_.binary_cfg
            rows.append(("Phi+force kernel", _time(
                _jax.jit(lambda p, u: binary_phi_force_step(
                    p, pad_q(u), bcfg.fe, bcfg.mobility,
                    bcfg.advection_order)[0]),
                state[1], state[2])))
            rows.append(("Full step", _step_probe()))
        elif sys_.fused_mode == "droplet" and not sys_.fused_unpadded:
            from ludwig_tpu.ops.fused_droplet import \
                droplet_phi_q_force_step
            from ludwig_tpu.ops.fused_lc import pad_q
            dcfg = sys_.droplet_cfg
            rows.append(("Phi+Q+force kernel", _time(
                _jax.jit(lambda p, q, u: droplet_phi_q_force_step(
                    p, q, pad_q(u), dcfg.fe, dcfg.gamma,
                    dcfg.mobility, dcfg.advection_order)[0]),
                state[1], state[2], state[3])))
            rows.append(("Full step", _step_probe()))
        elif sys_.fused_mode == "lc":
            rows.append(("Full step", _step_probe()))
        elif sys_.is_electro:
            from ludwig_tpu.electro import rho_elec
            from ludwig_tpu.electro_sim import (make_psi_neighbours,
                                                poisson_sor_ref)
            ek = sys_.electro_cfg.ek
            off = 1 if sys_.es_cfg is not None else 0
            psi, rhok = state[1 + off], state[2 + off]
            pu, pd = make_psi_neighbours(sys_.lb_cfg.size,
                                         sys_.electro_cfg.e0,
                                         sys_.lb_cfg.dtype)
            rows.append(("Poisson (SOR)", _time(
                _jax.jit(lambda p, r: poisson_sor_ref(
                    p, rho_elec(r, ek), ek, pu, pd)), psi, rhok)))
            rows.append(("Full step", _step_probe()))
        elif sys_.is_colloid:
            cp = sys_.colloid_params
            if cp.n > 4:
                from ludwig_tpu.colloids_fast import build_map_fast as bm
            else:
                from ludwig_tpu.colloids import build_map as bm
            rows.append(("Colloid map build", _time(
                _jax.jit(lambda R: bm(R, cp, sys_.lb_cfg.size)[0]),
                state[1])))
            rows.append(("Full step", _step_probe()))
        else:
            arg_is_tuple = (sys_.is_binary or sys_.is_lc
                            or sys_.is_two_field or sys_.is_droplet
                            or sys_.is_polar or sys_.has_kiss
                            or sys_.lb2_cfg is not None
                            or sys_.wallspec is not None)
            if arg_is_tuple:
                rows.append(("Full step", _step_probe()))
            else:
                rows.append(("Full step", _time(
                    lambda s: tu.tree_leaves(
                        sys_.step_fn(jnp.array(s[0]), 1))[0], state)))
    except Exception as e:                      # pragma: no cover
        rows.append((f"(probe failed: {type(e).__name__})", 0.0))
    return rows


def run(path: str = "input", out=sys.stdout) -> System:
    with open(path) as fh:
        return run_text(fh.read(), out=out)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "input"
    run(path)


if __name__ == "__main__":
    main()
