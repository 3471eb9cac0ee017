"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the BASELINE.json primary metric — bead*steps/sec per chip on a
100k-bead chromosome with active loop extrusion (extrusion + ex_load +
ex_unload, hundreds of extruders) — on the grid-resident fast engine
(lammps_le_tpu.fast).  Prints ONE JSON line, ALWAYS.

``vs_baseline`` is relative to the only committed reference measurement:
the 32k-bead FENE chain bench at 102.286 steps/s = 3.273e6 bead*steps/s on
one 2016 CPU core (reference: bench/log.6Oct16.chain.fixed.icc.1:52).

Architecture (round 5 — "the bench must be unloseable"):

  supervisor (this process, no args)
  ├─ SIGALRM dead-man's switch: even if the supervisor itself wedges,
  │  a JSON line is emitted before the driver's timeout
  ├─ tunnel probe  (subprocess, bounded, budget-aware retries)
  ├─ pallas probe  (subprocess = ``--probe``: the EXACT bench path at
  │  tiny step counts; phase-aware watchdog; leaves compiles cached)
  └─ measurement   (subprocess = ``--inner``) under a PER-PHASE watchdog:
       the inner prints BENCH_MARK/BENCH_TICK/BENCH_TIME progress lines;
       each phase has a kill budget (~15x healthy history) and a
       degraded threshold (~10x healthy history, the PERF_NOTES
       post-reboot rule).  A killed or degraded attempt is retried after
       a worker-recycle wait, within the overall wall budget.  Whatever
       the best attempt produced is ALWAYS printed as the final JSON
       line (healthy/degraded/failed annotated in ``detail``).

The reference always prints its Performance/timing block even on short
or imperfect runs (src/finish.cpp:61-155); this harness extends that
contract to every failure mode the axon tunnel has produced so far
(wedged backend init, poisoned post-reboot worker, mid-run worker
crash, VMEM compile OOM).

Usage: python bench.py [--quick]
Env:   LLE_BENCH_BUDGET   overall wall budget in seconds (default 2700)
       LLE_BENCH_PROBE=0  skip tunnel+pallas probes (trust the env)
       LLE_PALLAS_STEP=0  force the XLA-chain fallback engine
       LLE_BENCH_FAULT    fault injection for harness self-tests
                          (hang_thermalize | die_settle)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_BEAD_STEPS = 32000 * 102.286  # reference chain bench, 1 core

# healthy-history phase times in seconds (PERF_NOTES round-4 scoreboard:
# thermalize 15.8 s incl. cached compile, settle 6-7.4 s, measure ~12 s
# for 1540 steps at 4.5 ms + chunk syncs).  Degraded = 10x history (the
# PERF_NOTES post-reboot rule: 110-204 s thermalize/settle runs measured
# 2.5-17.5 M on a build that measures 22.11 M healthy); kill = ~15x.
_HEALTHY = {"startup": 45.0, "thermalize": 16.0, "settle": 8.0,
            "measure": 15.0}
# compile_* phases carry the cold-cache Mosaic/XLA compiles (minutes on
# a cold cache, seconds warm) and are never classified degraded — the
# 2026-08-20 quick run proved a healthy worker pays ~130 s of compile
# loading on the first post-reboot attempt while measuring a healthy
# 219 steps/s; killing/retrying over compile time wastes an attempt.
_COMPILE_PHASES = ("compile_thermalize", "compile_settle",
                   "measure_compile", "report")
_DEGRADED_X = 10.0
_KILL_X = 15.0
_PHASE_FLOOR = {"startup": 420.0, "thermalize": 240.0, "settle": 120.0,
                "measure": 300.0}
_COMPILE_BUDGET = 900.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _emit(value, vs, detail, code=0):
    print(json.dumps({
        "metric": "bead_steps_per_sec_per_chip_100k_le",
        "value": value,
        "unit": "bead*steps/s",
        "vs_baseline": vs,
        "detail": detail,
    }), flush=True)
    sys.exit(code)


# --------------------------------------------------------------------------
# probes (subprocesses that shield the supervisor from a wedged backend)
# --------------------------------------------------------------------------

def _tunnel_probe(deadline: float) -> bool:
    """Tunnel-wedge insurance: the axon tunnel can wedge for hours after
    an OOM-crashed worker, and a wedged tunnel HANGS ``jax.devices()``
    (backend init never returns — CLAUDE.md).  Probe device discovery in
    a bounded SUBPROCESS before anything imports jax; retry while budget
    remains, then fail fast so the driver records an error instead of a
    hung benchmark."""
    import subprocess

    attempt = 0
    while True:
        attempt += 1
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices())"],
                timeout=min(120, max(10, deadline - time.time())),
                capture_output=True, text=True)
            if p.returncode == 0:
                return True
            log(f"tunnel probe rc={p.returncode}: {p.stderr[-500:]}")
        except subprocess.TimeoutExpired:
            log(f"tunnel probe attempt {attempt} timed out (wedged tunnel?)")
        if time.time() + 150 > deadline:
            return False
        time.sleep(120)


def _pallas_hw_probe(deadline: float) -> bool:
    """Probe the fused kernel in a SUBPROCESS before the measurement
    touches the TPU: an on-device Mosaic hang (round 2's stencil kernel
    deadlocked despite green interpret-mode parity) must cost the probe,
    not the benchmark.  The probe is ``bench.py --probe`` — the EXACT
    bench code path at tiny step counts — so (a) the VMEM-OOM/compile
    failure modes of the REAL 100k geometry surface here, not
    mid-benchmark, and (b) a successful probe leaves every Mosaic/XLA
    compile in the persistent cache (compile_cache), making the main
    run's compiles ~free.

    A flat timeout cannot distinguish "cold remote Mosaic compile, be
    patient" (~2-5 min per kernel, serialized through the tunnel's
    compile helper) from "kernel hung on device" (what the probe exists
    to catch).  So the watchdog is PHASE-AWARE: each PROBE_PHASE line
    resets the deadline."""
    rc, _, _, tail, why, saw_ok = _watch_child(
        [sys.executable, os.path.abspath(__file__), "--probe"],
        phase_prefix="PROBE_PHASE", ok_token="PROBE_OK",
        first_budget=600.0, phase_budget=900.0,
        hard_deadline=deadline, budgets=None)
    ok = saw_ok and rc == 0
    if not ok:
        log(f"pallas probe failed (rc={rc}, {why}):\n"
            f"{tail[-3000:]}\nfalling back to the XLA chain")
    return ok


def _watch_child(cmd, phase_prefix, ok_token, first_budget, phase_budget,
                 hard_deadline, budgets, env=None):
    """Run ``cmd`` merging stderr→stdout, relaying lines, enforcing a
    per-phase deadline.  Returns (rc, phase_times, json_obj, tail, why,
    saw_ok).

    ``budgets``: optional dict phase→kill budget; when given, a
    ``{phase_prefix} <name>`` line switches to that phase's budget and
    stamps its wall time into phase_times.  Otherwise every phase line
    resets a flat ``phase_budget``.  Binary pipe + manual line splitting:
    a TextIO readline would leave extra lines buffered where select()
    cannot see them and a healthy child in a long Mosaic compile could
    be spuriously killed (round-3 advisor finding)."""
    import collections
    import selectors
    import subprocess

    p = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, env=env)
    sel = selectors.DefaultSelector()
    sel.register(p.stdout, selectors.EVENT_READ)
    buf = b""

    def drain_lines():
        nonlocal buf
        try:
            chunk = os.read(p.stdout.fileno(), 65536)
        except (BlockingIOError, OSError):
            return []
        buf += chunk
        *lines, tail_b = buf.split(b"\n")
        buf = tail_b
        return [ln.decode("utf-8", "replace") for ln in lines]

    deadline = time.time() + first_budget
    tail = collections.deque(maxlen=80)
    phase_times = {}
    cur_phase, phase_t0 = None, None
    json_obj = None
    saw_ok = False
    why = "child exited"

    def close_phase():
        if cur_phase is not None:
            phase_times[cur_phase] = round(
                phase_times.get(cur_phase, 0.0)
                + (time.time() - phase_t0), 1)

    def handle(line):
        nonlocal deadline, cur_phase, phase_t0, json_obj, saw_ok
        tail.append(line)
        if line.strip():
            log(f"| {line.rstrip()}")  # live relay for driver post-mortems
        if line.startswith(phase_prefix):
            name = line.split()[1] if len(line.split()) > 1 else "?"
            close_phase()
            cur_phase, phase_t0 = name, time.time()
            b = (budgets or {}).get(name, phase_budget)
            deadline = time.time() + b
        elif line.startswith("BENCH_TICK"):
            # ticks prove liveness but do NOT extend the phase budget: a
            # degraded-but-alive run must still die at the kill budget
            pass
        elif ok_token and ok_token in line:
            saw_ok = True
        elif line.startswith("{") and '"metric"' in line:
            try:
                json_obj = json.loads(line)
            except ValueError:
                pass

    while True:
        if p.poll() is not None:
            rest = p.stdout.read() or b""
            for raw in (buf + rest).split(b"\n"):
                handle(raw.decode("utf-8", "replace"))
            close_phase()
            break
        now = time.time()
        if now > deadline or now > hard_deadline:
            why = (f"phase '{cur_phase}' exceeded its kill budget "
                   if now <= hard_deadline else "overall budget exhausted ")
            why += "(hung or order-slower worker)"
            close_phase()
            p.kill()
            p.wait()
            break
        if sel.select(timeout=5.0):
            for line in drain_lines():
                handle(line)
    return p.returncode, phase_times, json_obj, "\n".join(tail), why, saw_ok


# --------------------------------------------------------------------------
# supervisor
# --------------------------------------------------------------------------

def supervise():
    quick = "--quick" in sys.argv
    budget = float(os.environ.get("LLE_BENCH_BUDGET", "2700"))
    hard_deadline = time.time() + budget
    attempts_log = []
    best = None          # (rank, json_obj)  rank: 2 healthy, 1 degraded

    # dead-man's switch: if the supervisor itself ever wedges (it should
    # not — every child is bounded — but the round-4 record is an rc=124
    # with NOTHING emitted), SIGALRM fires a final JSON line.
    import signal

    def _alarm(_sig, _frm):
        detail = {"healthy": False, "error": "supervisor dead-man's switch",
                  "attempts": attempts_log}
        if best is not None:
            o = best[1]
            o["detail"]["attempts"] = attempts_log
            print(json.dumps(o), flush=True)
            os._exit(0)
        print(json.dumps({
            "metric": "bead_steps_per_sec_per_chip_100k_le", "value": 0.0,
            "unit": "bead*steps/s", "vs_baseline": 0.0, "detail": detail,
        }), flush=True)
        os._exit(1)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(budget + 90))

    env = dict(os.environ)
    if env.get("LLE_BENCH_PROBE", "1") != "0":
        if not _tunnel_probe(hard_deadline - 600):
            _emit(0.0, 0.0, {
                "healthy": False,
                "error": "TPU tunnel unreachable (backend init hangs); "
                         "axon worker needs to recycle",
                "attempts": attempts_log}, code=1)
        if env.get("LLE_PALLAS_STEP", "1") != "0":
            if not _pallas_hw_probe(hard_deadline - 420):
                env["LLE_PALLAS_STEP"] = "0"

    def _budgets(scale):
        b = {k: max(_KILL_X * v * scale, _PHASE_FLOOR[k])
             for k, v in _HEALTHY.items()}
        b.update({k: _COMPILE_BUDGET for k in _COMPILE_PHASES})
        return b, {k: _DEGRADED_X * v * scale for k, v in _HEALTHY.items()}

    fallback = env.get("LLE_PALLAS_STEP", "1") == "0"
    scale = 3.0 if fallback else 1.0   # XLA chain is ~5x slower per step
    budgets, degraded_at = _budgets(scale)

    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        rc, phase_times, obj, tail, why, _ = _watch_child(
            [sys.executable, os.path.abspath(__file__), "--inner"]
            + (["--quick"] if quick else []),
            phase_prefix="BENCH_MARK", ok_token=None,
            first_budget=budgets["startup"], phase_budget=600.0,
            hard_deadline=hard_deadline, budgets=budgets, env=env)
        slow = [f"{k}={phase_times[k]}s(>{degraded_at[k]:.0f})"
                for k in phase_times if phase_times[k] > degraded_at.get(
                    k, float("inf"))]
        rec = {"attempt": attempt, "rc": rc, "wall_s": round(
            time.time() - t0, 1), "phase_times": phase_times,
            "degraded_phases": slow}
        attempts_log.append(rec)
        if rc == 17:        # inner classified a fused-kernel VMEM OOM
            log("inner reported VMEM OOM at bench geometry; retrying on "
                "the XLA chain")
            env["LLE_PALLAS_STEP"] = "0"
            fallback, scale = True, 3.0
            budgets, degraded_at = _budgets(scale)
            continue
        if obj is not None and rc == 0 and not slow:
            obj["detail"]["attempts"] = attempts_log
            print(json.dumps(obj), flush=True)
            sys.exit(0)
        if obj is not None:
            # measured, but the run is suspect (degraded phases / died
            # after printing).  Keep it as a fallback candidate.
            obj["detail"]["degraded"] = True
            obj["detail"]["healthy"] = False
            rank = 1
            if best is None or rank > best[0]:
                best = (rank, obj)
            log(f"attempt {attempt} produced a DEGRADED number "
                f"({slow or why}); retrying per the PERF_NOTES rule")
        else:
            log(f"attempt {attempt} failed (rc={rc}, {why}); tail:\n"
                + tail[-1500:])
        # retry after a worker-recycle wait, if the budget allows a
        # meaningful attempt (healthy attempt ~120 s + wait)
        if time.time() + 150 + 300 > hard_deadline or attempt >= 4:
            break
        log("waiting 150s for the axon worker to recycle before retrying")
        time.sleep(150)

    if best is not None:
        obj = best[1]
        obj["detail"]["attempts"] = attempts_log
        print(json.dumps(obj), flush=True)
        sys.exit(0)
    _emit(0.0, 0.0, {
        "healthy": False,
        "error": "no attempt completed; see attempts[].phase_times",
        "attempts": attempts_log}, code=1)


# --------------------------------------------------------------------------
# the measurement (child process: --inner, or --probe for tiny steps)
# --------------------------------------------------------------------------

def measure():
    quick = "--quick" in sys.argv
    probe = "--probe" in sys.argv
    fault = os.environ.get("LLE_BENCH_FAULT", "")

    t_phase = [None, None]

    def phase(name):
        now = time.perf_counter()
        if t_phase[0] is not None:
            print(f"BENCH_TIME {t_phase[0]} {now - t_phase[1]:.1f}",
                  flush=True)
        t_phase[0], t_phase[1] = name, now
        if probe:
            print(f"PROBE_PHASE {name}", flush=True)
        else:
            print(f"BENCH_MARK {name}", flush=True)

    def tick(msg):
        if not probe:
            print(f"BENCH_TICK {msg}", flush=True)

    phase("startup")
    import jax
    import jax.numpy as jnp

    from lammps_le_tpu.compile_cache import enable as _enable_cache

    _enable_cache()  # remote Mosaic compiles are minutes; reruns reload
    from lammps_le_tpu.fast import run_fast, thermo_row_fast, to_fast
    from lammps_le_tpu.fast.engine import make_fast_segment
    from lammps_le_tpu.fixes import NVE, Extrusion, ExLoad, ExUnload, Langevin
    from lammps_le_tpu.integrate import Simulation
    from lammps_le_tpu.io.data import system_from_data
    from lammps_le_tpu.scene import serpentine
    from lammps_le_tpu.state import init_state
    from lammps_le_tpu.system import BondParams, PairLJCut, BOND_FENE, BOND_HARMONIC

    n_beads = 100_000
    n_ex0 = 500
    log(f"devices: {jax.devices()}")

    data = serpentine(n_beads, spacing=0.97, row_gap=1.1, seed=2024,
                      barrier_fraction=0.003)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones, shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    # cells are floored at the FENE clamp reach (system.make_neighbor_config
    # min_cell) so in-kernel bonds can never leave the stencil; rebuilds
    # are reactive (decide()-analog skin trigger), cadence 40 backstops.
    # skin 0.5 / cap 9 beat skin 0.3 / cap 8 on hardware (7.29 vs 9.07
    # ms/step at r3 decomp): the fatter margin stretches reactive windows
    # ~1.6x (5.3 vs 3.3 steps/launch) AND the coarser grid shrinks P,
    # which more than pays for the extra cap row.  That tradeoff belongs
    # to the Mosaic kernel's Newton-half j-split stencil: the XLA-chain
    # fallback pays cap^2 over the FULL 27 offsets, so the coarse
    # geometry runs it ~5x slower (measured 23.4 steps/s, 2026-08-18) —
    # when the kernel probe fails, fall back to r2's measured-best chain
    # geometry (BENCH_r02: skin 0.3 / cap 8 at 11.07 M).
    fused = os.environ.get("LLE_PALLAS_STEP", "1") != "0"
    geom = dict(skin=0.50, rebuild_every=40, cell_cap=9) if fused \
        else dict(skin=0.30, rebuild_every=4, cell_cap=8)
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32",
        ex_btype=2, max_extruders=1024, **geom,
    )
    log(f"grid {system.neighbor.nx}^3 cell {system.neighbor.cell_size:.3f} "
        f"cap {system.neighbor.cell_cap}")

    # --- thermalize to T*=1 (fast path) ---
    warm = Simulation(
        system=system, dt=0.006,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=1.0, seed=7)),
        ex_btype=2,
    )
    state = init_state(system, data.x, types=data.types, seed=11)
    # one-step precompile under its own phase: cold-cache Mosaic/XLA
    # compiles are minutes and must not count against the thermalize
    # phase's degraded-worker classification (they are the dominant cost
    # of the FIRST post-reboot attempt on a perfectly healthy worker)
    phase("compile_thermalize")
    state, _ = run_fast(warm, state, 1)
    phase("thermalize")
    if fault == "hang_thermalize":
        time.sleep(100000)
    n_th = (4 if probe else (300 if quick else 1500)) - 1
    t0 = time.perf_counter()
    done = 0
    while done < n_th:
        this = min(500, n_th - done)
        state, _ = run_fast(warm, state, this)
        done += this
        tick(f"thermalize {done}/{n_th} {time.perf_counter()-t0:.1f}s")
    log(f"thermalization done in {time.perf_counter()-t0:.1f}s, "
        f"flags={int(state.flags):#x}")

    # --- seed extruders at regular (i, i+2) sites ---
    spacing = n_beads // n_ex0
    left = np.full(1024, -1, np.int32)
    right = np.full(1024, -1, np.int32)
    sites = np.arange(n_ex0) * spacing + 1
    left[:n_ex0] = sites
    right[:n_ex0] = sites + 2
    state = state.replace(
        ex_left=jnp.asarray(left), ex_right=jnp.asarray(right),
        flags=jnp.zeros((), jnp.uint32), step=jnp.zeros((), jnp.int32),
    )

    # --- production config: full LE machinery (see r1 notes on nevery) ---
    sim = Simulation(
        system=system, dt=0.006, energy_every=100,
        fixes=(
            NVE(),
            Langevin(t_start=1.0, t_stop=1.0, damp=10.0, seed=904297),
            Extrusion(nevery=1000, neutral_type=1, ctcf_left=2, ctcf_right=3,
                      through_prob=0.5, btype=2, ctcf_left_right=4),
            ExLoad(nevery=700, iatomtype=1, jatomtype=1, cutoff=1.12, btype=2,
                   fraction=0.001, seed=684474, imaxbond=1, inewtype=1,
                   jmaxbond=1, jnewtype=1),
            ExUnload(nevery=700, btype=2, cutoff=0.5, fraction=0.001,
                     seed=456456),
        ),
        ex_btype=2,
    )
    # settle: seeded extruder bonds inject elastic energy
    settle = Simulation(system=system, dt=0.002, fixes=sim.fixes, ex_btype=2)
    phase("compile_settle")
    state, _ = run_fast(settle, state, 1)
    phase("settle")
    if fault == "die_settle":
        os._exit(9)
    t0 = time.perf_counter()
    n_se = (4 if probe else (100 if quick else 400)) - 1
    done = 0
    while done < n_se:
        this = min(200, n_se - done)
        state, _ = run_fast(settle, state, this)
        done += this
        tick(f"settle {done}/{n_se} {time.perf_counter()-t0:.1f}s")
    log(f"settle {time.perf_counter()-t0:.1f}s, flags={int(state.flags):#x}")
    state = state.replace(flags=jnp.zeros((), jnp.uint32))

    # --- measurement: R=1 on the fused whole-step Pallas core ---
    # Single-chip replica sweeping is CLOSED by the roofline measurements
    # (PERF_NOTES "Replica roofline closure"): the R=1 kernel's stencil
    # loop runs within ~15% of this chip's VPU elementwise ceiling, so the
    # bottleneck resource is already saturated; vmapped R>1 must run the
    # XLA chain (the kernel's SMEM scalars cannot batch) at ~3x lower
    # elem-op efficiency AND a static rebuild cadence, which is why
    # BENCH_r02 measured R=4 at 0.79x of R=1 aggregate.  Replicas remain
    # the MULTI-chip dp axis (parallel/replica.py, dryrun-proven), not a
    # single-chip throughput lever.  --sweep reproduces the comparison.
    import dataclasses as _dc

    segment_p, _ = make_fast_segment(sim)
    sweep = [1]
    if "--sweep" in sys.argv:
        sweep = [1, 2] if quick else [1, 4, 8]
    if max(sweep) > 1:
        system_x = _dc.replace(
            system, neighbor=_dc.replace(system.neighbor, rebuild_every=4))
        sim_x = Simulation(system=system_x, dt=sim.dt,
                           energy_every=sim.energy_every, fixes=sim.fixes,
                           ex_btype=sim.ex_btype)
        segment_x, _ = make_fast_segment(sim_x, pallas=False, reactive=False)
    results = {}
    best = None
    for R in sweep:
        phase("measure_compile")
        if R == 1:
            seg1 = jax.jit(segment_p)
            vseg = jax.jit(
                lambda fs, *a: jax.tree.map(
                    lambda l: l[None], seg1(jax.tree.map(lambda l: l[0], fs),
                                            *a)))
        else:
            vseg = jax.jit(jax.vmap(segment_x,
                                    in_axes=(0, None, None, None, None)))

        def rep(seed_i, s):
            return to_fast(s.replace(key=jax.random.fold_in(s.key, seed_i)),
                           sim)

        fs = jax.jit(jax.vmap(rep, in_axes=(0, None)))(
            jnp.arange(100, 100 + R, dtype=jnp.int32), state
        )
        begin = int(jax.device_get(fs.step[0]))
        b0 = jnp.asarray(begin, jnp.int32)
        nwarm = 2 if probe else 40
        nmeas = 4 if probe else (300 if quick else 1500)
        bend = jnp.asarray(begin + nwarm + nmeas, jnp.int32)
        t0 = time.perf_counter()
        fs = vseg(fs, b0, nwarm, b0, bend)
        jax.device_get(fs.step)
        compile_s = time.perf_counter() - t0
        tick(f"measure R={R} warm+compile {compile_s:.1f}s")
        phase("measure")
        # chunked measurement: one long device execution through the
        # tunnel risks a transport timeout that kills the TPU worker
        chunk = 250
        t0 = time.perf_counter()
        done = 0
        while done < nmeas:
            this = min(chunk, nmeas - done)
            fs = vseg(fs, b0 + nwarm + done, this, b0, bend)
            jax.device_get(fs.step)
            done += this
            tick(f"measure R={R} {done}/{nmeas} {time.perf_counter()-t0:.1f}s")
        wall = time.perf_counter() - t0
        sps = nmeas / wall
        agg = sps * n_beads * R
        rows = jax.vmap(lambda f: thermo_row_fast(f, system))(fs)
        temp = float(jnp.mean(rows.temp))
        flags = int(jnp.bitwise_or.reduce(jnp.atleast_1d(fs.flags)))
        moves = int(jnp.sum(fs.n_moves))
        clamps = int(jnp.sum(fs.n_clamps))
        n_ex = int(jnp.sum(fs.ex_left >= 0)) // R
        results[R] = {
            "steps_per_s": round(sps, 2),
            "agg_bead_steps_per_s": round(agg, 1),
            "temp": round(temp, 4),
            "flags": flags,
            "clamp_events": clamps,
            "compile_s": round(compile_s, 1),
        }
        log(f"R={R}: {sps:.1f} steps/s, {agg/1e6:.1f} M bead-steps/s "
            f"aggregate, T={temp:.3f}, flags={flags:#x}, moves={moves}, "
            f"clamps={clamps}")
        if best is None or agg > best[1]:
            best = (R, agg, sps, temp, flags, moves, clamps, n_ex, wall)
    phase("report")

    if probe:
        # everything the real benchmark will jit is now compiled, cached
        # (compile_cache) and proven to EXECUTE + sync on this device
        print("PROBE_OK", flush=True)
        return

    R, agg, sps, temp, flags, moves, clamps, n_ex, wall = best
    # FENE clamps are warning-class (the reference warns per occurrence and
    # continues, bond_fene.cpp:88); bound them by the LE event count.  All
    # other flags are error-class and must be clean.
    from lammps_le_tpu.state import FLAG_FENE_CLAMP

    err_flags = flags & ~FLAG_FENE_CLAMP
    clamp_bound = 20 * max(moves, 1)
    healthy = (bool(np.isfinite(temp)) and 0.5 < temp < 2.0
               and err_flags == 0 and clamps <= clamp_bound)
    events_per_s = moves / wall

    print(json.dumps({
        "metric": "bead_steps_per_sec_per_chip_100k_le",
        "value": round(agg, 1),
        "unit": "bead*steps/s",
        "vs_baseline": round(agg / BASELINE_BEAD_STEPS, 3),
        "detail": {
            "engine": "fast(grid-resident)" if fused else "xla-chain",
            "best_replicas": R,
            "steps_per_s": round(sps, 2),
            "n_beads": n_beads,
            "extruders_per_replica": n_ex,
            "extrusion_moves": moves,
            "extrusion_events_per_s": round(events_per_s, 2),
            "temp": round(temp, 4),
            "healthy": healthy,
            "flags": flags,
            "clamp_events": clamps,
            "replica_sweep": results,
        },
    }), flush=True)


def _inner_with_vmem_insurance():
    """The tiny-system hang probe cannot catch a scoped-VMEM compile OOM
    at the REAL bench geometry (2026-08-18: cap 9 / P 33664 lost the
    120 MiB cap by 1.04 MiB).  A VMEM OOM is a clean compile-time error;
    classify it with rc=17 so the supervisor retries on the XLA chain."""
    try:
        measure()
    except Exception as e:  # noqa: BLE001 — classify, then re-raise
        msg = str(e)
        fused = os.environ.get("LLE_PALLAS_STEP", "1") != "0"
        if fused and ("vmem" in msg.lower() or "Ran out of memory" in msg):
            log(f"fused kernel VMEM OOM at bench geometry:\n{msg[-800:]}")
            sys.exit(17)
        raise


if __name__ == "__main__":
    if "--probe" in sys.argv:
        measure()        # probe subprocess: fail loudly, the parent classifies
    elif "--inner" in sys.argv:
        _inner_with_vmem_insurance()
    else:
        supervise()
