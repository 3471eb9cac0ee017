"""Trajectory dumps: xyz and custom-column text writers.

Covers the dump subset the LE workflow uses (reference: src/dump_atom.cpp,
src/dump_custom.cpp:1207 ``write_data``).  Output is produced on host at
dump intervals; device->host transfer happens only at those boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax


@dataclasses.dataclass
class DumpSpec:
    id: str
    style: str           # 'xyz' | 'atom' | 'custom'
    every: int
    path: str
    fields: List[str]
    _fh: object = None

    def open(self):
        if self._fh is None:
            self._fh = open(self.path, "w")
        return self._fh

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def write_frame(spec: DumpSpec, state, system):
    fh = spec.open()
    n = system.n
    x = np.asarray(state.x)
    step = int(state.step)
    if spec.style == "xyz":
        fh.write(f"{n}\nAtoms. Timestep: {step}\n")
        types = np.asarray(state.type) + 1
        for i in range(n):
            fh.write(f"{types[i]} {x[i,0]:.6g} {x[i,1]:.6g} {x[i,2]:.6g}\n")
    elif spec.style in ("atom", "custom"):
        fh.write("ITEM: TIMESTEP\n%d\n" % step)
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
        fh.write("ITEM: BOX BOUNDS pp pp pp\n")
        for lo, hi in zip(system.box_lo, system.box_hi):
            fh.write(f"{lo:.6g} {hi:.6g}\n")
        fields = spec.fields or ["id", "type", "x", "y", "z"]
        fh.write("ITEM: ATOMS " + " ".join(fields) + "\n")
        cols = {}
        types = np.asarray(state.type) + 1
        v = np.asarray(state.v)
        img = np.asarray(state.img)
        for fld in fields:
            if fld == "id":
                cols[fld] = np.arange(1, n + 1)
            elif fld == "mol":
                cols[fld] = system.molecule + 1
            elif fld == "type":
                cols[fld] = types
            elif fld in ("x", "y", "z"):
                cols[fld] = x[:, "xyz".index(fld)]
            elif fld in ("xu", "yu", "zu"):
                ax = "xyz".index(fld[0])
                box = system.box_size[ax]
                cols[fld] = x[:, ax] + img[:, ax] * box
            elif fld in ("vx", "vy", "vz"):
                cols[fld] = v[:, "xyz".index(fld[1])]
            elif fld in ("ix", "iy", "iz"):
                cols[fld] = img[:, "xyz".index(fld[1])]
            else:
                raise ValueError(f"unsupported dump field {fld}")
        mat = np.column_stack([cols[f] for f in fields])
        np.savetxt(fh, mat, fmt="%.8g")
    else:
        raise ValueError(f"unsupported dump style {spec.style}")
    fh.flush()


def run_with_dumps(sim, state, nsteps, dumps, groups=None,
                   thermo_every=0, thermo_callback=None):
    """Drive the run loop in dump-interval segments, writing frames on host."""
    from ..integrate import run as run_loop

    every = min(d.every for d in dumps)
    rows_all = []
    done = 0
    # initial frames at step 0 boundary handled by first interval end
    while done < nsteps:
        this = min(every, nsteps - done)
        state, rows = run_loop(sim, state, this, groups=groups,
                               thermo_every=thermo_every,
                               thermo_callback=thermo_callback)
        rows_all.extend(rows)
        done += this
        for d in dumps:
            if int(state.step) % d.every == 0:
                write_frame(d, state, sim.system)
    for d in dumps:
        d.close()
    return state, rows_all
