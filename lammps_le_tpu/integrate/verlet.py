"""The per-step driver: velocity-Verlet + fixes, compiled once, scanned.

This is the TPU-native replacement for ``Verlet::run`` (reference:
src/verlet.cpp:223-354).  The reference's per-step sequence

    initial_integrate -> post_integrate (USER-LE fixes)
    -> comm / neighbor rebuild -> force_clear -> pair + bond compute
    -> reverse_comm -> post_force (langevin) -> final_integrate -> output

maps to one pure ``step(state) -> state`` with:
* no communication stages at all on a single chip (ghosts don't exist);
* neighbor rebuild on a static cadence via ``lax.cond`` instead of the
  data-dependent ``Neighbor::decide`` (src/neighbor.cpp:1933-1962) — a
  sticky half-skin-violation flag provides the safety net;
* LE fixes gated by ``step % nevery == phase`` conds, preserving the
  reference's 1/2/3 stagger (SURVEY.md §3.2);
* topology changes never force a rebuild, because pair exclusions read the
  live extruder table instead of being baked into the list.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..fixes.config import NVE, Extrusion, ExLoad, ExUnload, Langevin, NVELimit
from ..fixes.ex_load import make_ex_load_update
from ..fixes.ex_unload import make_ex_unload_update
from ..fixes.extrusion import make_extrusion_update
from ..ops import cells
from ..ops.forces import compute_forces
from ..state import FLAG_SKIN_VIOLATION, State, extruder_partner, init_state
from ..system import System


@dataclasses.dataclass(frozen=True)
class Simulation:
    """Static run description: system + dt + fixes (the 'input deck')."""

    system: System
    dt: float
    fixes: Tuple = ()
    ex_btype: int = -1  # 1-based bond type of extruder bonds; -1 = none
    # compute pair energy only every N steps (thermo cadence): the energy
    # chain is ~15-20% of the pair kernel; 1 = every step
    energy_every: int = 1

    def __post_init__(self):
        if self.ex_btype < 0:
            bt = -1
            for f in self.fixes:
                if isinstance(f, (Extrusion, ExLoad, ExUnload)):
                    bt = f.btype
                    break
            object.__setattr__(self, "ex_btype", bt)


class ThermoSample(NamedTuple):
    step: jax.Array
    temp: jax.Array
    epair: jax.Array
    ebond: jax.Array
    ke: jax.Array
    etotal: jax.Array
    n_extruders: jax.Array


def _temperature(state: State, system: System):
    """LAMMPS-convention temperature: dof = 3N - 3
    (reference: src/compute_temp.cpp dof_compute)."""
    masses = jnp.asarray(system.masses, state.v.dtype)
    m = masses[state.type][:, None]
    ke2 = jnp.sum(m * state.v * state.v)
    dof = 3.0 * system.n - 3.0
    return ke2 / (dof * system.units.boltz), 0.5 * ke2


def thermo_row(state: State, system: System) -> ThermoSample:
    temp, ke = _temperature(state, system)
    etot = ke + state.epair + state.ebond
    return ThermoSample(
        step=state.step,
        temp=temp,
        epair=state.epair,
        ebond=state.ebond,
        ke=ke,
        etotal=etot,
        n_extruders=jnp.sum(state.ex_left >= 0).astype(jnp.int32),
    )


def _force_pass(state: State, sim: Simulation, energy: bool = True):
    system = sim.system
    partner = None
    ex_l = ex_r = None
    if sim.ex_btype > 0:
        partner = extruder_partner(state, system.n)
        ex_l, ex_r = state.ex_left, state.ex_right
    fr = compute_forces(
        state.x,
        state.type,
        state.nbr,
        system,
        ex_left=ex_l,
        ex_right=ex_r,
        ex_btype=sim.ex_btype - 1,
        ex_partner=partner,
        energy=energy,
    )
    return fr


def _build_nbr(x, system: System):
    if system.neighbor.mode == "grid":
        from ..ops.grid import build_grid

        return build_grid(x, system)
    return cells.build_neighbor_list(x, system)


def _maybe_rebuild(state: State, system: System, force: bool = False):
    """Neighbor rebuild on the static cadence; ``force=True`` (a Python-
    static flag) rebuilds unconditionally without touching ``state.step``
    (used by the minimizer, which rebuilds every iteration)."""
    cfg = system.neighbor
    if not cfg.use_cells:
        return state

    def rebuild(st: State) -> State:
        # wrap positions only at rebuild (reference: domain->pbc() runs only
        # on reneighbor steps, verlet.cpp:271) — ghost-cell coordinate
        # shifts assume in-box positions at grid build time
        x, img = cells.wrap_positions(st.x, system, st.img)
        st = st.replace(x=x, img=img)
        nbr, fl = _build_nbr(st.x, system)
        return st.replace(nbr=nbr, flags=st.flags | fl)

    def keep(st: State) -> State:
        # half-skin safety check (reference: Neighbor::check_distance,
        # src/neighbor.cpp:1948-1962) — sticky flag instead of a rebuild
        d = cells.minimum_image(st.x - st.nbr.x_ref, system.box_size)
        maxsq = jnp.max(jnp.sum(d * d, axis=-1))
        bad = maxsq > (0.5 * cfg.skin) ** 2
        return st.replace(
            flags=st.flags
            | jnp.where(bad, jnp.uint32(FLAG_SKIN_VIOLATION), jnp.uint32(0))
        )

    if force:
        return rebuild(state)
    return jax.lax.cond(
        state.step % cfg.rebuild_every == 0, rebuild, keep, state
    )


def make_step(sim: Simulation, groups: Optional[dict] = None):
    """Compile-ready step(state) -> state."""
    system = sim.system
    dt = sim.dt
    units = system.units
    dtf = 0.5 * dt * units.ftm2v
    masses_np = system.masses

    def group_mask(name):
        if name is None:
            return None
        if groups is None or name not in groups:
            raise KeyError(f"undefined group {name!r}")
        return jnp.asarray(groups[name], bool)[:, None]

    nve_fixes = [f for f in sim.fixes if isinstance(f, (NVE, NVELimit))]
    langevin_fixes = [f for f in sim.fixes if isinstance(f, Langevin)]
    # --- GJF validation (fix_langevin.cpp:97-145 gjfflag) ---
    gjf_list = [f for f in langevin_fixes if f.gjf != "no"]
    if len(gjf_list) > 1:
        raise ValueError("at most one fix langevin may use gjf")
    gjf_fix = gjf_list[0] if gjf_list else None
    if gjf_fix is not None:
        if gjf_fix.gjf not in ("vfull", "vhalf"):
            raise ValueError(
                f"fix langevin gjf must be no/vfull/vhalf, got {gjf_fix.gjf!r}")
        if len(nve_fixes) != 1 or not (
            type(nve_fixes[0]) is NVE and nve_fixes[0].group is None
        ):
            raise ValueError(
                "fix langevin gjf requires exactly one group-all fix nve "
                "(the GJF noise is folded into the Verlet kicks)")
    gjf_lid = langevin_fixes.index(gjf_fix) if gjf_fix is not None else -1
    if sum(1 for f in langevin_fixes if f.tally) > 1:
        # State.therm_e is a single global accumulator: two tallying
        # fixes would each report the SHARED sum through f_ID, silently
        # diverging from the reference's per-fix energies
        # (fix_langevin.cpp compute_scalar).  Reject instead.
        raise ValueError(
            "at most one fix langevin may use tally yes (per-fix "
            "thermostat energy is tracked by a single accumulator)")
    event_fixes = [
        f for f in sim.fixes if isinstance(f, (Extrusion, ExLoad, ExUnload))
    ]
    # registered extension styles (fixes/registry.py — the Modify plugin
    # dispatch, modify.cpp:211-216): hooks compose into this traced step
    from ..fixes.registry import custom_hooks, style_of

    for f in sim.fixes:
        if not isinstance(f, (NVE, NVELimit, Langevin, Extrusion, ExLoad,
                              ExUnload)) and style_of(f) is None:
            raise ValueError(
                f"fix {type(f).__name__} is neither built-in nor a "
                "registered fix style (fixes.registry.register_fix_style)")
    cust_post_int = [(f, b(system, f))
                     for f, b in custom_hooks(sim.fixes, "post_integrate")]
    cust_post_force = [(f, b(system, f))
                       for f, b in custom_hooks(sim.fixes, "post_force")]
    cust_eos = [(f, b(system, f))
                for f, b in custom_hooks(sim.fixes, "end_of_step")]
    if event_fixes:
        s12, s13, s14 = system.special_lj
        if s13 != 1.0 or s14 != 1.0:
            # an extruder bond spanning 2-3 chain hops would have both the
            # chain-tier (1-s13/1-s14) and the extruder (1-s12) corrections
            # subtracted (the reference respecials the pair into the 1-2
            # tier exclusively, fix_extrusion.cpp:743-771); reject rather
            # than double-subtract
            raise ValueError(
                "extruder fixes require special_bonds with 1-3/1-4 lj "
                f"weights of 1.0 (got {s13}, {s14}); use 'special_bonds "
                "fene' (0,1,1)"
            )
    event_updates = []
    for fid, f in enumerate(event_fixes):
        if isinstance(f, Extrusion):
            event_updates.append((f, fid, make_extrusion_update(system, f)))
        elif isinstance(f, ExLoad):
            event_updates.append((f, fid, make_ex_load_update(system, f)))
        elif isinstance(f, ExUnload):
            event_updates.append((f, fid, make_ex_unload_update(system, f)))

    def step(state: State, run_begin=None, run_end=None) -> State:
        dtype = state.x.dtype
        step_no = state.step + 1
        masses = jnp.asarray(masses_np, dtype)
        m = masses[state.type][:, None]

        def lan_t_target(lf):
            # t_start -> t_stop interpolation over the run
            # (fix_langevin.cpp:97-145: delta = (ntimestep - beginstep) /
            # (endstep - beginstep)); callers without run bounds (direct
            # step invocation) get t_start
            if run_begin is None or lf.t_stop == lf.t_start:
                return jnp.asarray(lf.t_start, dtype)
            span = jnp.maximum((run_end - run_begin).astype(dtype), 1.0)
            frac = jnp.clip(
                (step_no - run_begin).astype(dtype) / span, 0.0, 1.0
            )
            return jnp.asarray(lf.t_start, dtype) + frac * (
                jnp.asarray(lf.t_stop, dtype) - jnp.asarray(lf.t_start, dtype)
            )

        if gjf_fix is not None:
            # Gronbech-Jensen/Farago coefficients (Mol. Phys. 111, 2013):
            # with c = dt/(2 damp), a = (1-c)/(1+c) damps, b = 1/(1+c)
            # scales the drift; the noise is a gaussian velocity impulse
            # with Var = 2 kT dt / (damp m) entering both kicks.
            gjf_c = dt / (2.0 * gjf_fix.damp)
            gjf_a = (1.0 - gjf_c) / (1.0 + gjf_c)
            gjf_b = 1.0 / (1.0 + gjf_c)
            gjf_gm = group_mask(gjf_fix.group)

            def gjf_noise(at_step):
                key = jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.fold_in(state.key, at_step),
                        (5 << 20) + gjf_lid,
                    ),
                    gjf_fix.seed,
                )
                kT = units.boltz * lan_t_target(gjf_fix)
                sigma = jnp.sqrt(
                    2.0 * dt * kT / (gjf_fix.damp * m * units.mvv2e)
                )
                dv = sigma * jax.random.normal(key, state.v.shape, dtype)
                if gjf_fix.zero:
                    # zeroflag under gjf: the random force sums to zero
                    # over the group each step (fix_langevin.cpp Tp_ZERO
                    # applies to the gjfa-scaled fran; mean subtraction
                    # commutes with the (dv^n + dv^{n+1})/2 average, so
                    # centering each noise stream gives the same
                    # zero-total-impulse property)
                    if gjf_gm is None:
                        dv = dv - jnp.mean(dv, axis=0, keepdims=True)
                    else:
                        cnt = jnp.maximum(jnp.sum(gjf_gm.astype(dtype)), 1.0)
                        mean = jnp.sum(
                            jnp.where(gjf_gm, dv, 0.0), axis=0, keepdims=True
                        ) / cnt
                        dv = dv - mean
                return dv

        # --- initial integrate: half kick + drift (fix_nve.cpp:64-103) ---
        v = state.v
        x = state.x
        if gjf_fix is not None and gjf_fix.gjf == "vhalf":
            # 2GJ leapfrog (Gronbech Jensen & Gronbech-Jensen, Mol. Phys.
            # 117, 2019): v holds the half-step velocity u^{n-1/2} scaled
            # by 1/sqrt(b), whose kinetic temperature is exact; recursion
            #   u^n = a u^{n-1} + sqrt(b) dt f^n/m
            #         + sqrt(b)/2 (dv^n + dv^{n+1}),   x += dt sqrt(b) u^n
            # (derived by eliminating the on-site velocity from the GJF
            # pair; dv^k is the velocity noise of step k).  Group beads do
            # the whole step here; the final kick skips them.
            sqb = gjf_b ** 0.5
            dv_prev = gjf_noise(step_no - 1)
            dv_cur = gjf_noise(step_no)
            kick = dt * units.ftm2v * state.f / m
            u_new = gjf_a * v + sqb * kick + 0.5 * sqb * (dv_prev + dv_cur)
            vh_plain = v + dtf * state.f / m
            if gjf_fix.tally:
                # thermostat velocity increment vs the pure leapfrog kick
                # (u^{n-1} + dt f^n/m); invariant under later common
                # updates, consumed by the tally block below
                gjf_dvt = u_new - (v + kick)
                if gjf_gm is not None:
                    gjf_dvt = jnp.where(gjf_gm, gjf_dvt, 0.0)
            if gjf_gm is None:
                v = u_new
                x = x + dt * sqb * u_new
            else:
                v = jnp.where(gjf_gm, u_new, vh_plain)
                x = x + dt * jnp.where(gjf_gm, sqb * u_new, vh_plain)
        elif gjf_fix is not None:  # vfull: on-site velocity convention
            # x^{n+1} = x^n + b dt (v^{n+1/2} + dv/2);
            # v stored pre-force = a v^{n+1/2} + b dv, so the standard
            # final half-kick with f^{n+1} completes
            # v^{n+1} = a v^{n+1/2} + dt/2m f^{n+1} + b dv.
            dv_cur = gjf_noise(step_no)
            vh = v + dtf * state.f / m
            v_drift = gjf_b * (vh + 0.5 * dv_cur)
            v_store = gjf_a * vh + gjf_b * dv_cur
            if gjf_fix.tally:
                # thermostat velocity increment vs the pure NVE half-kick
                # velocity vh; the final half-kick adds the same term to
                # both, so the delta survives to the post-step tally
                gjf_dvt = v_store - vh
                if gjf_gm is not None:
                    gjf_dvt = jnp.where(gjf_gm, gjf_dvt, 0.0)
            if gjf_gm is None:
                v = v_store
                x = x + dt * v_drift
            else:
                v = jnp.where(gjf_gm, v_store, vh)
                x = x + dt * jnp.where(gjf_gm, v_drift, vh)
        else:
            for f in nve_fixes:
                gm = group_mask(f.group)
                dv = dtf * state.f / m
                vh = v + dv
                if isinstance(f, NVELimit):
                    # cap the per-step displacement (fix_nve_limit.cpp)
                    vsq = jnp.sum(vh * vh, axis=-1, keepdims=True)
                    vmax = f.xmax / dt
                    scale = jnp.where(
                        vsq > vmax * vmax, vmax / jnp.sqrt(vsq),
                        jnp.ones_like(vsq)
                    )
                    vh = vh * scale
                dx = dt * vh
                if gm is None:
                    v = vh
                    x = x + dx
                else:
                    v = jnp.where(gm, vh, v)
                    x = jnp.where(gm, x + dx, x)
        state = state.replace(x=x, v=v, step=step_no)

        # --- post integrate: LE fixes at their staggered phases ---
        for f, fid, update in event_updates:
            fire = (step_no % f.nevery) == f.phase
            # stream separation: fold (step, kind<<20 | fid, seed) so fixes
            # with adjacent fid/seed values can never share a stream
            # (reference decorrelates per-proc RanMars by seed+me,
            # fix_extrusion.cpp:99)
            kind = {Extrusion: 1, ExLoad: 2, ExUnload: 3}[type(f)]
            key = jax.random.fold_in(
                jax.random.fold_in(
                    jax.random.fold_in(state.key, step_no),
                    (kind << 20) + fid,
                ),
                f.seed,
            )

            if isinstance(f, Extrusion):

                def do(st, update=update, key=key):
                    occ = extruder_partner(st, system.n) >= 0
                    l, r, nm, nrel = update(
                        st.x, st.type, st.ex_left, st.ex_right, occ, key
                    )
                    return st.replace(
                        ex_left=l, ex_right=r, n_moves=st.n_moves + nm,
                        n_unloads=st.n_unloads + nrel,
                        last_event=st.last_event.at[0].set(nm),
                    )

            elif isinstance(f, ExLoad):

                def do(st, update=update, key=key):
                    occ = extruder_partner(st, system.n) >= 0
                    l, r, t, nc, fl = update(
                        st.x, st.type, st.ex_left, st.ex_right, occ, key
                    )
                    return st.replace(
                        ex_left=l,
                        ex_right=r,
                        type=t,
                        n_loads=st.n_loads + nc,
                        last_event=st.last_event.at[1].set(nc),
                        flags=st.flags | fl,
                    )

            else:  # ExUnload

                def do(st, update=update, key=key):
                    l, r, nb = update(st.x, st.ex_left, st.ex_right, key)
                    return st.replace(
                        ex_left=l, ex_right=r, n_unloads=st.n_unloads + nb,
                        last_event=st.last_event.at[2].set(nb),
                    )

            state = jax.lax.cond(fire, do, lambda st: st, state)

        # --- post integrate: registered extension hooks ---
        for f, hook in cust_post_int:
            state = hook(state, step_no)

        # --- neighbor maintenance ---
        state = _maybe_rebuild(state, system)

        # --- forces (pair energy gated to the thermo cadence) ---
        if sim.energy_every > 1:
            fr = jax.lax.cond(
                step_no % sim.energy_every == 0,
                lambda st: _force_pass(st, sim, True),
                lambda st: _force_pass(st, sim, False),
                state,
            )
        else:
            fr = _force_pass(state, sim)
        f_total = fr.f

        # --- post force: langevin drag + uniform noise
        #     (fix_langevin.cpp:654-674) ---
        tally_terms = []
        for lid, lf in enumerate(langevin_fixes):
            if lf is gjf_fix:
                # GJF damping/noise live in the Verlet kicks above
                continue
            gm = group_mask(lf.group)
            key = jax.random.fold_in(
                jax.random.fold_in(
                    jax.random.fold_in(state.key, step_no), (4 << 20) + lid
                ),
                lf.seed,
            )
            t_target = lan_t_target(lf)
            gamma1 = -m / lf.damp / units.ftm2v
            gamma2 = (
                jnp.sqrt(m)
                * jnp.sqrt(24.0 * units.boltz / (lf.damp * dt) / units.mvv2e)
                / units.ftm2v
            ) * jnp.sqrt(t_target)
            noise = jax.random.uniform(key, state.v.shape, dtype) - 0.5
            fr_rand = gamma2 * noise
            if lf.zero:
                # zeroflag: random-force sum adjusted to zero over the
                # group each step (fix_langevin.cpp post_force end)
                if gm is None:
                    fr_rand = fr_rand - jnp.mean(fr_rand, axis=0,
                                                 keepdims=True)
                else:
                    cnt = jnp.maximum(jnp.sum(gm.astype(dtype)), 1.0)
                    mean = jnp.sum(jnp.where(gm, fr_rand, 0.0), axis=0,
                                   keepdims=True) / cnt
                    fr_rand = fr_rand - mean
            fl = gamma1 * state.v + fr_rand
            fl = fl if gm is None else jnp.where(gm, fl, 0.0)
            f_total = f_total + fl
            if lf.tally:
                tally_terms.append(fl)

        # --- post force: registered extension hooks ---
        for f, hook in cust_post_force:
            f_total = hook(state, f_total, step_no)

        # --- final integrate: half kick (fix_nve.cpp:108-140) ---
        v = state.v
        for f in nve_fixes:
            gm = group_mask(f.group)
            dv = dtf * f_total / m
            vn = v + dv
            if isinstance(f, NVELimit):
                vsq = jnp.sum(vn * vn, axis=-1, keepdims=True)
                vmax = f.xmax / dt
                scale = jnp.where(
                    vsq > vmax * vmax, vmax / jnp.sqrt(vsq), jnp.ones_like(vsq)
                )
                vn = vn * scale
            if gjf_fix is not None and gjf_fix.gjf == "vhalf":
                # half-step-velocity beads completed their step in the
                # leapfrog recursion above — no final kick for them
                vn = v if gjf_gm is None else jnp.where(gjf_gm, v, vn)
            v = vn if gm is None else jnp.where(gm, vn, v)

        # ``tally yes``: cumulative thermostat energy, reference sign
        # (FixLangevin::compute_scalar returns -energy; end_of_step sums
        # flangevin . v at the post-kick velocities, fix_langevin.cpp)
        therm_e = state.therm_e
        for fl in tally_terms:
            therm_e = therm_e - dt * jnp.sum(fl * v)
        if gjf_fix is not None and gjf_fix.tally:
            # gjf tally (fix_langevin.cpp post_force<GJF=1,TALLY=1> + the
            # end_of_step gjfflag branch).  The reference estimates the
            # transfer with a midpoint flangevin . lv dot; our GJF path
            # folds drag/noise into the Verlet kicks, where that
            # estimator's noise-velocity correlation does not telescope
            # (it drifts ~kT/damp per step).  Instead tally the EXACT
            # kinetic-energy increment the thermostat produced: gjf_dvt is
            # the thermostat's velocity delta vs a pure NVE kick
            # (invariant under the shared final kick), so the reservoir
            # paid 0.5 m (|v|^2 - |v - dvt|^2) this step.  Same cumulative
            # ledger and sign convention as the non-gjf branch; the
            # reference's first-step capture quirk (compute_scalar seeds
            # energy at beginstep) is not replicated.
            vm = v - gjf_dvt
            therm_e = therm_e - 0.5 * units.mvv2e * jnp.sum(
                m * (v * v - vm * vm))

        from ..state import FLAG_NON_FINITE

        finite = jnp.isfinite(fr.epair) & jnp.isfinite(fr.ebond)
        nf = jnp.where(finite, jnp.uint32(0), jnp.uint32(FLAG_NON_FINITE))
        state = state.replace(
            v=v,
            f=f_total,
            epair=fr.epair,
            ebond=fr.ebond,
            therm_e=therm_e,
            flags=state.flags | fr.flags | nf,
        )

        # --- end of step: registered extension hooks (modify.cpp:481) ---
        for f, hook in cust_eos:
            state = hook(state, step_no)
        return state

    return step


def setup(sim: Simulation, state: State) -> State:
    """Initial neighbor build + force evaluation (Verlet::setup,
    src/verlet.cpp:87-156)."""
    system = sim.system
    x, img = cells.wrap_positions(state.x, system, state.img)
    state = state.replace(x=x, img=img)
    if system.neighbor.use_cells:
        nbr, fl = _build_nbr(state.x, system)
        state = state.replace(nbr=nbr, flags=state.flags | fl)
    fr = _force_pass(state, sim)
    return state.replace(
        f=fr.f, epair=fr.epair, ebond=fr.ebond, flags=state.flags | fr.flags
    )


# Compiled segment cache: one entry per (Simulation, group-set) so repeated
# ``run`` commands and thermo segments never recompile (the analog of the
# reference building its integrator once per run setup, run.cpp:178).
# Bounded LRU: id() keys stay valid because each value pins its sim; LRU
# eviction (oldest first) keeps long-lived processes from accumulating one
# compiled program per Simulation ever created.


class _LRU(dict):
    def __init__(self, cap=32):
        super().__init__()
        self.cap = cap

    def put(self, key, value):
        if key in self:
            del self[key]
        elif len(self) >= self.cap:
            del self[next(iter(self))]
        self[key] = value


_SEGMENT_CACHE = _LRU()


def _compiled(sim: Simulation, groups: Optional[dict]):
    gkey = None
    if groups:
        gkey = tuple(
            (k, v.tobytes() if hasattr(v, "tobytes") else tuple(v))
            for k, v in sorted(groups.items())
        )
    key = (id(sim), gkey)
    hit = _SEGMENT_CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    step = make_step(sim, groups)

    @jax.jit
    def segment(st, length, run_begin, run_end):
        return jax.lax.fori_loop(
            0, length, lambda i, s: step(s, run_begin, run_end), st
        )

    setup_fn = jax.jit(lambda s: setup(sim, s))
    # keep `sim` alive in the value so the id() key can't be reused
    _SEGMENT_CACHE.put(key, (segment, setup_fn, sim))
    return segment, setup_fn


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def run(
    sim: Simulation,
    state: State,
    nsteps: int,
    groups: Optional[dict] = None,
    thermo_every: int = 0,
    thermo_callback=None,
    max_segment: int = 500,
    boundary_every: int = 0,
    boundary_callback=None,
):
    """Drive nsteps, returning (state, list_of_thermo_rows).

    Compiles one segment scan per Simulation and reuses it; thermo rows are
    produced at t=0 (post-setup), at ABSOLUTE steps that are multiples of
    ``thermo_every``, and at the final step of the run (matching the
    reference, src/thermo.cpp:324: output keys on ``ntimestep % every``).
    ``boundary_callback(state)`` fires whenever ``state.step %
    boundary_every == 0`` (dump cadence).  Segments are phased on absolute
    steps — a run entered at an unaligned step (staged decks: ``run 15``
    then ``dump every 10``) still stops exactly at steps 20, 30, ...
    (ADVICE r2: begin-relative phasing silently skipped those frames).
    ``max_segment`` bounds the steps per device call (very long single
    executions can trip transport timeouts on remote accelerators).
    """
    system = sim.system
    segment, setup_fn = _compiled(sim, groups)

    seg = 0
    if thermo_every > 0:
        seg = thermo_every
    if boundary_every > 0:
        seg = _gcd(seg, boundary_every) if seg else boundary_every
    if seg == 0:
        seg = min(nsteps, max_segment)
    rows = []

    # normalize pytree structure (nbr dropped) so setup/segment compile once
    state = setup_fn(state.replace(nbr=None))
    begin = int(jax.device_get(state.step))
    run_begin = jnp.asarray(begin, jnp.int32)
    run_end = jnp.asarray(begin + nsteps, jnp.int32)
    if thermo_every > 0:
        row = jax.device_get(thermo_row(state, system))
        rows.append(row)
        if thermo_callback:
            thermo_callback(row, state)
    if boundary_callback and boundary_every > 0:
        if begin % boundary_every == 0:
            boundary_callback(state)

    done = 0
    while done < nsteps:
        # advance to the next ABSOLUTE multiple of seg (or the run end)
        cur = begin + done
        this = min(seg - cur % seg, nsteps - done)
        left = this
        while left > 0:
            chunk = min(left, max_segment)
            state = segment(state, chunk, run_begin, run_end)
            if left > chunk:
                # sync between chunks: keeps any single device execution
                # bounded (remote-transport timeout guard)
                jax.device_get(state.step)
            left -= chunk
        done += this
        step_abs = begin + done
        on_thermo = thermo_every > 0 and (
            step_abs % thermo_every == 0 or done == nsteps
        )
        if on_thermo:
            row = jax.device_get(thermo_row(state, system))
            rows.append(row)
            if thermo_callback:
                thermo_callback(row, state)
        if boundary_callback and boundary_every > 0:
            if step_abs % boundary_every == 0:
                boundary_callback(state)
    return state, rows
