"""Observables: virial pressure and contact maps."""

import numpy as np
import jax.numpy as jnp

from lammps_le_tpu.observe.contact_map import contact_map_accumulate
from lammps_le_tpu.observe.pressure import make_pressure_fn
from lammps_le_tpu.state import init_state

from helpers import relaxed_chain_system, lj_pair_params, fene_bonds


def test_pressure_matches_numpy_virial():
    system, x = relaxed_chain_system(n_chains=2, chain_len=12, box_l=20.0,
                                     dtype="float64")
    rng = np.random.default_rng(0)
    v = rng.normal(scale=0.5, size=x.shape)
    state = init_state(system, x, v=v)

    # independent numpy virial
    box = np.array(system.box_size)
    from helpers import min_image_np

    w = 0.0
    n = system.n
    # pair virial (with the engine's special 1-2 exclusion and LJ floor)
    nxt = system.next_bead
    excl = {frozenset((i, int(nxt[i]))) for i in range(n) if nxt[i] >= 0}
    for i in range(n):
        for j in range(i + 1, n):
            if frozenset((i, j)) in excl:
                continue
            d = min_image_np(x[i] - x[j], box)
            r2 = d @ d
            if r2 >= 1.12 * 1.12:
                continue
            r2 = max(r2, 0.5625)
            sr6 = (1.0 / r2) ** 3
            fpair = (48 * sr6 * sr6 - 24 * sr6) / r2
            w += fpair * (d @ d)
    # bond virial (FENE)
    for i in range(n):
        j = int(nxt[i])
        if j < 0:
            continue
        d = min_image_np(x[i] - x[j], box)
        r2 = d @ d
        rlog = max(1.0 - r2 / 2.25, 0.1)
        fbond = -30.0 / rlog
        if r2 < 2 ** (1 / 3):
            sr6 = (1.0 / r2) ** 3
            fbond += 48 * sr6 * (sr6 - 0.5) / r2
        w += fbond * r2
    ke2 = float((v * v).sum())
    vol = float(np.prod(box))
    p_ref = (ke2 + w) / (3 * vol)

    press = make_pressure_fn(system)(state)
    np.testing.assert_allclose(float(press), p_ref, rtol=1e-8)


def test_contact_map_counts_neighbors():
    system, x = relaxed_chain_system(n_chains=1, chain_len=32, box_l=24.0,
                                     dtype="float64")
    state = init_state(system, x)
    radius = min(1.3, system.neighbor.cell_size)
    cmap = contact_map_accumulate(state, system, radius=radius, nbins=8)
    cmap = np.asarray(cmap)
    # symmetric, bonded neighbors produce near-diagonal contacts
    np.testing.assert_allclose(cmap, cmap.T, atol=1e-6)
    assert cmap.sum() > 0
    # count parity vs brute force
    from helpers import min_image_np

    box = np.array(system.box_size)
    n = system.n
    bead_bin = (np.arange(n) * 8) // n
    ref = np.zeros((8, 8))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = min_image_np(x[i] - x[j], box)
            if d @ d < radius * radius:
                ref[bead_bin[i], bead_bin[j]] += 1
    np.testing.assert_allclose(cmap, ref, atol=1e-6)


def test_rdf_matches_bruteforce():
    """g(r) from the grid path vs a direct numpy double loop
    (reference: src/compute_rdf.cpp normalization convention)."""
    import numpy as np
    import jax.numpy as jnp

    from helpers import min_image_np, random_chain_system
    from lammps_le_tpu.observe import make_rdf_fn, normalize_rdf
    from lammps_le_tpu.state import init_state

    system, x = random_chain_system(n_chains=4, chain_len=30, box_l=8.0,
                                    seed=4)
    state = init_state(system, x, seed=1)
    nbins, rmax = 20, 1.4
    fn = make_rdf_fn(system, nbins=nbins, rmax=rmax)
    hist, fl = fn(state, jnp.zeros((nbins,), jnp.float32))
    assert int(fl) == 0  # binning grid must not drop beads
    hist = np.asarray(hist)

    # numpy reference histogram
    ref = np.zeros(nbins)
    box = np.asarray(system.box_size)
    n = system.n
    for i in range(n):
        d = min_image_np(x[i] - x, box)
        r = np.sqrt((d * d).sum(-1))
        r[i] = 1e9
        sel = r < rmax
        idx = np.clip((r[sel] * nbins / rmax).astype(int), 0, nbins - 1)
        np.add.at(ref, idx, 1.0)
    np.testing.assert_allclose(hist, ref, atol=0)

    r, g = normalize_rdf(hist, system, nframes=1, nbins=nbins, rmax=rmax)
    assert g.shape == (nbins,) and np.all(np.isfinite(g))
