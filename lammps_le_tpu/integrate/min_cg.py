"""Polak-Ribiere CG + steepest-descent minimizers — ``min_style cg|sd``.

The reference's CG loop (src/min_cg.cpp:40-135) per iteration: line-min
along h, energy-tolerance stop |E-E_prev| < etol*(|E|+|E_prev|+eps)/2,
force-tolerance stop fdotf < ftol^2 (Euclidean 2-norm default), then
Polak-Ribiere beta = f.(f-g)/g.g with restart when beta would exceed 1.
SD (src/min_sd.cpp) is the same loop with beta = 0.

The line minimizer here is energy backtracking (the moral twin of the
reference's default ``linemin_quadratic``'s backtracking fallback,
src/min_linesearch.cpp): start from the displacement-capped alpha
(dmax = 0.1 reduced units of max per-component move, matching
Min::dmax's role) and halve until the energy decreases, bounded
halvings — all inside one ``lax.while_loop`` so the whole minimization
is a single XLA program like FIRE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..state import State
from .verlet import Simulation, _force_pass, _maybe_rebuild, setup

_DMAX = 0.1          # max initial per-component displacement (Min::dmax)
_EPS_ENERGY = 1e-8   # min.cpp EPS_ENERGY
_BACKTRACK_MAX = 14


def minimize_cg(
    sim: Simulation,
    state: State,
    etol: float = 0.0,
    ftol: float = 1e-4,
    maxiter: int = 1000,
    sd: bool = False,
):
    """Relax until the reference's etol/ftol criteria fire or maxiter.

    Returns (state, n_iters, fmax).  ``sd=True`` degrades to steepest
    descent (beta = 0).  ftol compares the Euclidean force 2-norm like
    the reference's default ``min_modify norm two``
    (src/min_cg.cpp:114-119).
    """
    system = sim.system
    state = jax.jit(lambda s: setup(sim, s))(state)

    def energy_forces(st):
        st = _maybe_rebuild(st, system, force=True)
        fr = _force_pass(st, sim)
        st = st.replace(f=fr.f, epair=fr.epair, ebond=fr.ebond,
                        flags=st.flags | fr.flags)
        return st, fr.epair + fr.ebond, fr.f

    def cond(carry):
        st, g, h, e_cur, it, done = carry
        return (~done) & (it < maxiter)

    def body(carry):
        st, g, h, e_cur, it, done = carry
        dtype = st.x.dtype

        # backtracking line-min along h from st.x
        hmax = jnp.max(jnp.abs(h))
        alpha0 = jnp.asarray(_DMAX, dtype) / jnp.maximum(hmax, 1e-20)

        def ls_cond(c):
            _, _, _, k, ok = c
            return (~ok) & (k < _BACKTRACK_MAX)

        def ls_body(c):
            alpha, best_st, best_e, k, ok = c
            xt = st.x + alpha * h
            st_t, e_t, _ = energy_forces(st.replace(x=xt))
            ok_t = e_t < e_cur
            return (
                jnp.where(ok_t, alpha, alpha * 0.5),
                jax.tree.map(
                    lambda a, b: jnp.where(ok_t, a, b), st_t, best_st),
                jnp.where(ok_t, e_t, best_e),
                k + 1,
                ok_t,
            )

        alpha, st_new, e_new, _, ls_ok = jax.lax.while_loop(
            ls_cond, ls_body,
            (alpha0, st, e_cur, jnp.asarray(0, jnp.int32),
             jnp.zeros((), bool)),
        )
        # a failed line search (no downhill alpha) terminates like the
        # reference's linemin failure return (min_cg.cpp:76)
        st_new = jax.tree.map(
            lambda a, b: jnp.where(ls_ok, a, b), st_new, st)
        e_new = jnp.where(ls_ok, e_new, e_cur)
        f_new = st_new.f

        # stopping criteria (min_cg.cpp:80-119)
        e_stop = jnp.abs(e_new - e_cur) < etol * 0.5 * (
            jnp.abs(e_new) + jnp.abs(e_cur) + _EPS_ENERGY)
        fdotf = jnp.sum(f_new * f_new)
        f_stop = (ftol > 0.0) & (fdotf < ftol * ftol)
        done_new = (~ls_ok) | e_stop | f_stop

        # Polak-Ribiere update with the reference's restart guard
        gg = jnp.sum(g * g)
        beta = jnp.where(
            sd, 0.0,
            jnp.maximum(0.0, jnp.sum(f_new * (f_new - g))
                        / jnp.maximum(gg, 1e-30)),
        )
        h_new = f_new + beta * h
        # if h.f <= 0 the direction is uphill: restart from f
        uphill = jnp.sum(h_new * f_new) <= 0.0
        h_new = jnp.where(uphill, f_new, h_new)

        # advance the timestep counter like the reference
        # (min_cg.cpp:68 ++update->ntimestep); keep the step taken by
        # the line search
        st_new = st_new.replace(step=st.step + 1)
        return (st_new, f_new, h_new, e_new, it + 1, done_new)

    st0, e0, f0 = energy_forces(state)
    carry = (st0, f0, f0, e0, jnp.asarray(0, jnp.int32),
             jnp.zeros((), bool))
    out = jax.jit(lambda c: jax.lax.while_loop(cond, body, c))(carry)
    st, g, h, e, it, done = out
    fmax = float(jnp.max(jnp.abs(st.f)))
    return st.replace(v=jnp.zeros_like(st.v)), int(it), fmax
