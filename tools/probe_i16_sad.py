#!/usr/bin/env python3
"""On-chip probe: is the ME SAD volume faster in packed int16 than int32?

The fused ME kernel's dominant VPU block is the 169-candidate SAD volume
(ops/pallas/me.py:_me_body): per candidate one (16, WT) subtract, abs and
16-row sum, all int32 today.  Every value fits int16 (pixels <= 255, row
sums <= 4080), so IF Mosaic packs 2 x i16 per 32-bit vreg with native packed
arithmetic on v5e, the block halves.  This probe times stripped-down kernels
doing exactly that arithmetic at the 1080p geometry (wt = 2048, 72 strips,
yr = 6) in i32 vs i16, plus an i16 variant that keeps the accumulate in
sublane space.  Result decides whether to rework the production kernel.
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

YR = 6
N = 2 * YR + 1
WT = 2048
NSTRIPS = 72
NOUT = -(-(N * N + 1) // 8) * 8


def _kernel(dtype, cur_ref, p0_ref, p1_ref, p2_ref, rs_ref, out_ref):
    c16 = cur_ref[...].astype(dtype)
    win = jnp.concatenate(
        [p0_ref[...], p1_ref[...], p2_ref[...]], axis=0).astype(dtype)
    win = win[10:38, :]                    # only rows 16+dy..32+dy are read
    for dx in range(-YR, YR + 1):
        shifted = pltpu.roll(win, shift=(WT - (YR + dx)) % WT, axis=1)
        for dy in range(-YR, YR + 1):
            d = jnp.abs(c16 - shifted[6 + dy:22 + dy, :])
            rs_ref[(dy + YR) * N + (dx + YR), :] = \
                jnp.sum(d, axis=0).astype(jnp.int32)
    for k in range(N * N, NOUT):
        rs_ref[k, :] = jnp.zeros((WT,), jnp.int32)
    out_ref[...] = rs_ref[...]


def make(dtype):
    return pl.pallas_call(
        functools.partial(_kernel, dtype),
        grid=(NSTRIPS,),
        in_specs=[
            pl.BlockSpec((16, WT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, WT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, WT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, WT), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NOUT, WT), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NOUT, WT), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NOUT, WT), jnp.int32)],
    )


def main():
    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.integers(0, 255, (NSTRIPS * 16, WT), np.int32))
    p0 = jnp.asarray(rng.integers(0, 255, (NSTRIPS * 16, WT), np.int32))
    p1 = jnp.asarray(rng.integers(0, 255, (NSTRIPS * 16, WT), np.int32))
    p2 = jnp.asarray(rng.integers(0, 255, (NSTRIPS * 16, WT), np.int32))
    jax.block_until_ready((cur, p0, p1, p2))
    ref = None
    for name, dtype in (("i32", jnp.int32), ("i16", jnp.int16)):
        try:
            f = jax.jit(make(dtype))
            out = f(cur, p0, p1, p2)
            jax.block_until_ready(out)
            if ref is None:
                ref = np.asarray(out)
            else:
                assert (np.asarray(out) == ref).all(), f"{name} mismatch"
            ts = []
            for r in range(5):
                t0 = time.perf_counter()
                outs = [f(cur, p0, p1, p2) for _ in range(8)]
                s = outs[0][0, 0]
                for o in outs[1:]:
                    s = s + o[0, 0]
                int(s)
                ts.append((time.perf_counter() - t0) / 8 * 1000)
            print(f"{name}: min {min(ts):7.3f} ms / frame-equivalent")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
