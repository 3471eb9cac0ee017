"""Microprobe: does Mosaic bf16 elementwise math run 2x f32 on this chip?

The fused step kernel is VPU-elementwise-bound (~0.86 T elem-op/s at f32,
PERF_NOTES round-3).  The f32 VPU tile is (8, 128); bf16 packs 2 values
per 32-bit lane (Mosaic lowers to vector<8x128x2xbf16>) — IF arithmetic
on the packed layout runs one tile-pass per op, 16 bf16 rows cost what 8
f32 rows cost.  Known limitation found on hardware: packed-bf16
COMPARISONS are rejected ("Target does not support this comparison"), so
the chain here is mask-free arithmetic (the real kernel would compute
masks in f32/int32 and convert).

Discipline (CLAUDE.md): EMPTY fori carry — accumulators live in scratch
refs; a carried plane spills to VMEM with per-iteration load/store and
measures the spill, not the math (observed 28x slowdown).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 27008
REPS = 400
OPS = 16  # arithmetic ops per chain iteration (count below)


def make_kernel(rows, dtype, reps):
    def kernel(x_ref, o_ref, acc_ref):
        acc_ref[...] = jnp.zeros((rows, P), dtype)

        def body(i, c):
            x = x_ref[...]
            a = acc_ref[...]
            # 16 ops: 3 sub, 2 mul, 3 mul+2 add (rsq), max, 3 mul (r6ish),
            # 2 mul/sub (ff)
            dx = x - a
            dy = x * 1.0001 - a
            dz = x * 0.9999 - a
            rsq = dx * dx + dy * dy + dz * dz
            den = jnp.maximum(rsq, 0.5625)
            r6 = den * den * den
            ff = r6 * 0.0001 - den
            acc_ref[...] = a + ff * 1e-6
            return c

        jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))
        o_ref[...] = acc_ref[...].astype(jnp.float32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, P), dtype)],
    )


def run(rows, dtype, label):
    x = jnp.asarray(
        np.random.RandomState(0).uniform(1.0, 2.0, (rows, P)), dtype)
    call = jax.jit(make_kernel(rows, dtype, REPS))
    jax.device_get(call(x))  # compile + sync
    t0 = time.time()
    jax.device_get(call(x))
    dt = time.time() - t0
    nops = OPS * rows * P * REPS
    print(f"{label:22s} rows={rows:3d} {np.dtype(dtype).name:9s} "
          f"{dt*1e3:8.2f} ms  {nops/dt/1e12:6.3f} T elem-op/s",
          flush=True)
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    a = run(16, jnp.float32, "A f32 16-row")
    b = run(16, jnp.bfloat16, "B bf16 16-row")
    c = run(8, jnp.float32, "C f32 8-row")
    d = run(8, jnp.bfloat16, "D bf16 8-row")
    print(f"bf16 speedup at 16 rows: {a/b:.2f}x; at 8 rows: {c/d:.2f}x",
          flush=True)
