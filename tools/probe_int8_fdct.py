#!/usr/bin/env python3
"""On-chip probe: can the FDCT's two roll-MAC passes move onto the MXU as
int8 matmuls?

Col pass (contraction over sublanes): y = KV @ x, KV = blockdiag(DCTM) over
8-row groups, entries <= 89 (int8-exact), x split as 2*xh + xl with
xh = x >> 1 in [-128, 127] and xl = x & 1.

Row pass (contraction over lanes): z = y @ KH, KH = blockdiag(DCTM^T) over
8-col groups as a DENSE (W, W) int8 operand (240x arithmetic waste, but the
MXU is idle during the transform stage and a dense int8 matmul at W=1920 is
~0.1 ms/frame vs ~45 VPU roll-MAC passes).  y <= 181K (18 bits) splits into
3 int8 pieces: y0 = y & 127, y1 = (y >> 7) & 127, y2 = y >> 14 in [-12, 11].

This probe checks (a) Mosaic accepts jnp.dot(int8, int8, preferred=int32),
(b) the composite matches the roll-MAC reference bit-for-bit, (c) slope
timing via an in-jit scan (per-call dispatch on this tunnel is ~2.3 ms and
would swamp sub-ms kernels).
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

from fpga_mpeg2_encoder_tpu.core import tables as T
from fpga_mpeg2_encoder_tpu.ops.pallas.transform import _roll_mac

S, W = 32, 1920
M = np.asarray(T.DCTM, np.int64)


def _blockdiag(m, n):
    out = np.zeros((n, n), np.int8)
    for g in range(n // 8):
        out[g * 8:(g + 1) * 8, g * 8:(g + 1) * 8] = m
    return out


KV = _blockdiag(M, S)          # y = KV @ x  (col pass; sublane contraction)
KH = _blockdiag(M.T, W)        # z = y @ KH  (row pass; lane contraction)


def _mm_kernel(x_ref, kv_ref, kh_ref, o_ref):
    x = x_ref[...]
    kv = kv_ref[...]
    kh = kh_ref[...]
    xh = (x >> 1).astype(jnp.int8)
    xl = (x & 1).astype(jnp.int8)
    y = 2 * jnp.dot(kv, xh, preferred_element_type=jnp.int32) \
        + jnp.dot(kv, xl, preferred_element_type=jnp.int32)
    y0 = (y & 127).astype(jnp.int8)
    y1 = ((y >> 7) & 127).astype(jnp.int8)
    y2 = (y >> 14).astype(jnp.int8)
    z = (jnp.dot(y2, kh, preferred_element_type=jnp.int32) << 14) \
        + (jnp.dot(y1, kh, preferred_element_type=jnp.int32) << 7) \
        + jnp.dot(y0, kh, preferred_element_type=jnp.int32)
    o_ref[...] = z


def _ref_kernel(x_ref, o_ref):
    x = x_ref[...]
    cp = _roll_mac(x, M, 0)
    o_ref[...] = _roll_mac(cp, M, 1)


def run_mm(x):
    return pl.pallas_call(
        _mm_kernel,
        in_specs=[pl.BlockSpec((S, W), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((S, S), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((W, W), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, jnp.asarray(KV), jnp.asarray(KH))


def run_ref(x):
    return pl.pallas_call(
        _ref_kernel,
        in_specs=[pl.BlockSpec((S, W), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.int32),
    )(x)


def slope_time(f, x, reps_hi=192, reps_lo=96):
    """ms per application via in-jit scan slope (content varied per step)."""
    def scanner(n):
        @jax.jit
        def g(x0):
            def body(c, i):
                c = f((c + i) % 511 - 255)
                return c, ()
            c, _ = jax.lax.scan(body, x0, jnp.arange(n))
            return c
        return g
    hi, lo = scanner(reps_hi), scanner(reps_lo)
    int(hi(x)[0, 0]); int(lo(x)[0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); int(hi(x)[0, 0])
        th = time.perf_counter() - t0
        t0 = time.perf_counter(); int(lo(x)[0, 0])
        tl = time.perf_counter() - t0
        best = min(best, (th - tl) / (reps_hi - reps_lo) * 1000)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-255, 256, (S, W), np.int32))
    try:
        got = np.asarray(run_mm(x))
    except Exception as e:
        print(f"int8 matmul: FAILED {type(e).__name__}: {str(e)[:400]}")
        return
    want = np.asarray(run_ref(x))
    ok = (got == want).all()
    print(f"exactness: {'PASS' if ok else 'FAIL'} "
          f"({(got != want).sum()} mismatches)")
    if not ok:
        return
    t_mm = slope_time(run_mm, x)
    t_ref = slope_time(run_ref, x)
    # per-frame equivalent at 1080p: 36 luma blocks + 36 chroma (half rows)
    print(f"mxu int8 : {t_mm:7.4f} ms/block  (~{t_mm * 54:.2f} ms/frame-eq)")
    print(f"roll-mac : {t_ref:7.4f} ms/block  (~{t_ref * 54:.2f} ms/frame-eq)")


if __name__ == "__main__":
    main()
