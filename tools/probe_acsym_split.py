#!/usr/bin/env python3
"""On-chip ablation of the acsym kernel's internal blocks at 1080p.

The stage profiler pins the whole kernel at ~0.70 ms/frame and the r05 f32
lookup fold did not move it, so the bottleneck is NOT the lookup arithmetic.
This tool times ablated variants of the kernel (same memory traffic, blocks
stubbed out) via in-jit scan slope - per-call dispatch on this tunnel is
~2 ms and would swamp the signal:

  full          - the production body (copied)
  no_lookup     - eint := k << 6 (skips one-hots + matmul + select)
  no_runs       - run := pos & 31 (skips the segmented cummax)
  no_barrel     - routing barrel skipped (ac written at source lanes)
  traffic_only  - out := z | small reshaped (bounds pure HBM/VMEM traffic)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpga_mpeg2_encoder_tpu.ops.pallas import acsym as A

NBY, NBX = 72, 120
WIDTH = NBX * 384
S_OUT = A.HDR_SLOTS + NBX * A.SLOTS_PER_MB
SP = -(-S_OUT // 128) * 128
RP = -(-NBY // A._RB) * A._RB


def _kernel(width, nbx, sp, divs, ablate, tabt_ref, z_ref, small_ref,
            out_ref, ac_ref):
    tabt = tabt_ref[...]
    (m6, s6), (m394, s394), (m65, s65) = divs

    if ablate == "traffic_only":
        for s in range(0, width, A._CHUNK):
            e = min(s + A._CHUNK, width)
            ac_ref[:, s:e] = z_ref[:, s:e].astype(jnp.uint32)
        data = jnp.concatenate(
            [ac_ref[...],
             jnp.zeros((A._RB, sp - width), jnp.uint32)], axis=1)
        out_ref[...] = data | small_ref[...]
        return

    for s in range(0, width, A._CHUNK):
        e = min(s + A._CHUNK, width)
        z = z_ref[:, s:e]
        pos = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) & 63

        if ablate == "no_runs":
            run = pos & 31
        else:
            ew = jnp.where(z != 0, pos, -1)
            for j in (1, 2, 4, 8, 16, 32):
                rolled = pltpu.roll(ew, shift=j, axis=1)
                ew = jnp.where(pos >= j, jnp.maximum(ew, rolled), ew)
            prev = pltpu.roll(ew, shift=1, axis=1)
            prev = jnp.where(pos == 0, -1, prev)
            run = pos - prev - 1

        v = jnp.where(z == 0, 1, z)
        am1 = jnp.abs(v) - 1
        ka = (run <= 7) & (am1 <= 7)
        kb = (run == 0) & (am1 >= 8) & (am1 <= 39)
        kc = (run == 1) & (am1 >= 8) & (am1 <= 17)
        kd = (run >= 8) & (run <= 16) & (am1 <= 1)
        ke = (run >= 17) & (run <= 31) & (am1 == 0)
        k = jnp.full(run.shape, 143, jnp.int32)
        k = jnp.where(ka, run * 8 + am1, k)
        k = jnp.where(kb, 64 + am1 - 8, k)
        k = jnp.where(kc, 96 + am1 - 8, k)
        k = jnp.where(kd, 106 + (run - 8) * 2 + am1, k)
        k = jnp.where(ke, 124 + run - 17, k)

        if ablate == "no_lookup":
            eint = k << 6
        else:
            klo = k & 15
            khi = k >> 4
            io16 = jax.lax.broadcasted_iota(jnp.int32, (16, e - s), 0)
            rows = []
            for r in range(z.shape[0]):
                oh = (io16 == klo[r:r + 1, :]).astype(jnp.float32)
                p = jnp.dot(tabt, oh, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                ohhi = (io16 == khi[r:r + 1, :]).astype(jnp.float32)
                rows.append(jnp.sum(p * ohhi, axis=0,
                                    keepdims=True).astype(jnp.int32))
            eint = jnp.concatenate(rows, axis=0)

        valid = eint >= (1 << 22)
        code_t = (((eint >> 6) & 0xFFFF).astype(jnp.uint32) << 1) \
            | (v < 0).astype(jnp.uint32)
        len_t = ((eint & 63) + 1).astype(jnp.uint32)
        esc = (jnp.uint32(1) << 18) | (run.astype(jnp.uint32) << 12) \
            | (v & 0xFFF).astype(jnp.uint32)
        packed = jnp.where(valid, code_t | (len_t << 27),
                           esc | (jnp.uint32(24) << 27))
        ac_ref[:, s:e] = jnp.where(z == 0, jnp.uint32(0), packed)

    sl = jax.lax.broadcasted_iota(jnp.int32, (A._RB, sp), 1)
    q = sl >> 6
    mb = (q * m6) >> s6
    t = q - mb * 6
    off = jnp.where(sl < width, 7 + 10 * mb + t, 0)
    data = jnp.concatenate(
        [ac_ref[...],
         jnp.zeros((A._RB, sp - width), jnp.uint32)], axis=1)
    if ablate != "no_barrel":
        carry = (off << 1) | (sl < width).astype(jnp.int32)
        kbit = 1
        while kbit <= 7 + 10 * (width // 384 - 1) + 5:
            kbit <<= 1
        kbit >>= 1
        while kbit >= 1:
            kb2 = kbit << 1
            dmoved = pltpu.roll(data, shift=kbit, axis=1)
            cmoved = pltpu.roll(carry, shift=kbit, axis=1)
            take = ((cmoved & (kb2 | 1)) == (kb2 | 1))
            claimed = ((carry & (kb2 | 1)) == (kb2 | 1))
            data = jnp.where(take, dmoved, data)
            carry = jnp.where(take, cmoved - kb2,
                              jnp.where(claimed, carry & ~1, carry))
            kbit >>= 1

    d = jax.lax.broadcasted_iota(jnp.int32, (A._RB, sp), 1)
    dm3 = d - A.HDR_SLOTS
    mbd = (dm3 * m394) >> s394
    within = dm3 - mbd * A.SLOTS_PER_MB
    w4 = within - 4
    td = (w4 * m65) >> s65
    w65 = w4 - td * 65
    is_ac = (dm3 >= 0) & (mbd < nbx) & (w4 >= 0) & (w65 >= 1) & (w65 <= 63)
    out_ref[...] = jnp.where(is_ac, data, small_ref[...])


def make(ablate):
    divs = (A._magic_div(6, WIDTH // 64),
            A._magic_div(A.SLOTS_PER_MB, SP),
            A._magic_div(65, A.SLOTS_PER_MB))
    call = pl.pallas_call(
        functools.partial(_kernel, WIDTH, NBX, SP, divs, ablate),
        grid=(RP // A._RB,),
        in_specs=[
            pl.BlockSpec((16, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A._RB, WIDTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A._RB, SP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A._RB, SP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RP, SP), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((A._RB, WIDTH), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    def f(z, sm):
        return call(A._table_t(), z, sm)

    return f


def slope_time(f, z, sm, hi=96, lo=48):
    def scanner(n):
        @jax.jit
        def g(z0):
            def body(c, i):
                out = f((c + i) & 63, sm)
                return c ^ out[:RP, :WIDTH].astype(jnp.int32), ()
            c, _ = jax.lax.scan(body, z0, jnp.arange(n))
            return c
        return g
    ghi, glo = scanner(hi), scanner(lo)
    int(ghi(z)[0, 0]); int(glo(z)[0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); int(ghi(z)[0, 0])
        th = time.perf_counter() - t0
        t0 = time.perf_counter(); int(glo(z)[0, 0])
        tl = time.perf_counter() - t0
        best = min(best, (th - tl) / (hi - lo) * 1000)
    return best


def main():
    rng = np.random.default_rng(0)
    z = jnp.asarray((rng.integers(-40, 41, (RP, WIDTH))
                     * (rng.random((RP, WIDTH)) < 0.08)).astype(np.int32))
    sm = jnp.zeros((RP, SP), jnp.uint32)
    jax.block_until_ready((z, sm))
    for ab in ("traffic_only", "no_barrel", "no_lookup", "no_runs", "full"):
        t = slope_time(make(None if ab == "full" else ab), z, sm)
        print(f"{ab:14s}: {t:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
