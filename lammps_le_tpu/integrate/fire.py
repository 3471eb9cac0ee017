"""FIRE energy minimizer (Bitzek et al. 2006) — the ``minimize`` command.

The reference ships CG/SD/FIRE minimizers (src/min_fire.cpp, min_cg.cpp);
decks use minimization to relax bad starting configurations before
dynamics.  FIRE is the one worth having on TPU: it is just damped MD with
adaptive mixing, so it reuses the force machinery and compiles to a single
``while_loop``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..state import State
from .verlet import Simulation, _force_pass, _maybe_rebuild, setup

_ALPHA0 = 0.1
_F_INC = 1.1
_F_DEC = 0.5
_F_ALPHA = 0.99
_N_MIN = 5


def minimize(
    sim: Simulation,
    state: State,
    ftol: float = 1e-4,
    maxiter: int = 1000,
    dtmax_factor: float = 10.0,
):
    """Relax the configuration until max |F| < ftol or maxiter steps.

    Returns (state, n_iters, fmax).  Velocities are zeroed on exit (the
    reference's minimizers likewise leave a quenched configuration).
    """
    system = sim.system
    dt0 = sim.dt
    dtmax = dtmax_factor * dt0
    masses = jnp.asarray(system.masses)

    state = jax.jit(lambda s: setup(sim, s))(state)

    def cond(carry):
        st, v, dt, alpha, npos, it, fmax = carry
        return (fmax > ftol) & (it < maxiter)

    def body(carry):
        st, v, dt, alpha, npos, it, fmax = carry
        dtype = st.x.dtype
        m = masses.astype(dtype)[st.type][:, None]
        f = st.f

        # FIRE velocity mixing
        p = jnp.sum(f * v)
        fnorm = jnp.sqrt(jnp.sum(f * f))
        vnorm = jnp.sqrt(jnp.sum(v * v))
        fhat = f / jnp.maximum(fnorm, 1e-20)
        v_mix = (1.0 - alpha) * v + alpha * vnorm * fhat

        uphill = p <= 0.0
        v_new = jnp.where(uphill, jnp.zeros_like(v), v_mix)
        npos_new = jnp.where(uphill, 0, npos + 1)
        grow = (~uphill) & (npos_new > _N_MIN)
        dt_new = jnp.where(
            grow, jnp.minimum(dt * _F_INC, dtmax),
            jnp.where(uphill, dt * _F_DEC, dt),
        )
        alpha_new = jnp.where(
            grow, alpha * _F_ALPHA, jnp.where(uphill, _ALPHA0, alpha)
        )

        # semi-implicit Euler step
        v_stepped = v_new + dt_new * f / m
        x = st.x + dt_new * v_stepped
        # advance the real timestep counter (the reference advances
        # ntimestep during minimization, src/min.cpp update->ntimestep) and
        # force the rebuild without smuggling step=0 through the cadence
        st = st.replace(x=x, step=st.step + 1)
        st = _maybe_rebuild(st, system, force=True)
        fr = _force_pass(st, sim)
        st = st.replace(f=fr.f, epair=fr.epair, ebond=fr.ebond,
                        flags=st.flags | fr.flags)
        fmax_new = jnp.max(jnp.abs(fr.f))
        return (st, v_stepped, dt_new, alpha_new, npos_new, it + 1, fmax_new)

    dtype = state.x.dtype
    v0 = jnp.zeros_like(state.v)
    fmax0 = jnp.max(jnp.abs(state.f))
    carry = (
        state, v0, jnp.asarray(dt0, dtype), jnp.asarray(_ALPHA0, dtype),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), fmax0,
    )
    out = jax.jit(
        lambda c: jax.lax.while_loop(cond, body, c)
    )(carry)
    st, v, dt, alpha, npos, it, fmax = out
    return st.replace(v=jnp.zeros_like(st.v)), int(it), float(fmax)
