"""Pallas TPU kernel: full-pel SAD volume over the macroblock grid.

This keeps one macroblock-row strip of the current frame and a 48-row window of
the reference resident in VMEM and evaluates all (2*YR+1)^2 search offsets from
there - the frame is read once per strip instead of once per offset (the XLA
shift formulation in ops/motion.py re-reads it 169 times, ~1.6 GB/frame of HBM
traffic at 1080p), and one byte-split MXU matmul per strip performs the
16-column block reductions.

The RTL analog is CALC_DIFF's 169 parallel SAD accumulators fed from BRAM-
resident window registers (RTL/mpeg2encoder.v:1650-1672); VMEM residency is the
TPU equivalent of that on-chip locality.

Lane alignment: a naive dynamic/unaligned lane slice `win[:, yr+dx : yr+dx+W]`
scalarises under Mosaic (the round-1 kernel's failure mode).  Instead the dx
shift is a static-amount `pltpu.roll` over the lane axis - a vectorised lane
rotation - hoisted to once per dx; dy then slices sublanes (free).  The rolled
wrap-around lands in the zero-padded tail lanes which the 0/1 reduction matrix
ignores.

Exactness: pixels are integers <= 255, row sums <= 4080 are split into bf16-
exact byte planes, the block-diagonal reduction matrix is 0/1, accumulation is
f32, so every value is exact; validated bit-for-bit against the XLA shift
formulation (tests/test_tpu_exactness.py) and the golden model.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(yr: int, wp: int, nout: int, cur_ref, p0_ref, p1_ref, p2_ref, b_ref,
            out_ref, rs_ref):
    from jax.experimental.pallas import tpu as pltpu

    n = 2 * yr + 1
    c = cur_ref[...]                                          # (16, Wp) int32
    win = jnp.concatenate([p0_ref[...], p1_ref[...], p2_ref[...]], axis=0)
    b = b_ref[...].astype(jnp.bfloat16)                       # (Wp, 128)
    # per-offset strip row sums in the VPU, written straight into a VMEM scratch
    # so the MXU runs ONE matmul per strip instead of 169 tiny ones
    wpp = win.shape[1]
    for dx in range(-yr, yr + 1):
        # lane-aligned dx handling: one vectorised lane rotation per dx
        # (shifted[:, x] == win[:, x + yr + dx] for every in-frame lane;
        # pltpu.roll requires a non-negative shift, so roll left by k == roll
        # right by wpp - k)
        shifted = pltpu.roll(win, shift=(wpp - (yr + dx)) % wpp, axis=1)[:, :wp]
        for dy in range(-yr, yr + 1):
            x = c - shifted[16 + dy:32 + dy, :]               # sublane slice: free
            d = jnp.maximum(x, -x)                            # Mosaic lacks math.absi
            rs_ref[(dy + yr) * n + (dx + yr), :] = jnp.sum(d, axis=0)
    rs = rs_ref[...]                                          # (nout, Wp) <= 4080
    # byte-split so both matmul operands are bf16-exact (rs <= 4080 = 12 bits)
    lo = (rs & 255).astype(jnp.float32).astype(jnp.bfloat16)
    hi = (rs >> 8).astype(jnp.float32).astype(jnp.bfloat16)
    s_lo = jnp.dot(lo, b, preferred_element_type=jnp.float32)
    s_hi = jnp.dot(hi, b, preferred_element_type=jnp.float32)
    out_ref[...] = s_hi.astype(jnp.int32) * 256 + s_lo.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("yr",))
def sad_volume_pallas(cur_y: jnp.ndarray, prev_y: jnp.ndarray, yr: int):
    """(H, W) uint8 planes -> ((2yr+1)^2, nby, nbx) int32 full-pel SAD volume.

    Matches the XLA shift formulation bit for bit (tests/test_tpu_exactness.py).
    Requires nbx <= 128 (true up to the 2048-wide max geometry, XL=7).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur_y.shape
    nby, nbx = h // 16, w // 16
    n = 2 * yr + 1
    wp = -(-w // 128) * 128                   # lane-aligned strip width
    nout = -(-(n * n) // 8) * 8               # sublane-aligned output rows

    cur = jnp.pad(cur_y, ((0, 0), (0, wp - w))).astype(jnp.int32)
    # reference padded: 16 rows top/bottom, yr cols left, lane-aligned right.
    # the rolled dx window may read up to wp-1+2yr lanes, so the padded width
    # must cover it (the diff beyond column w is garbage; the 0/1 matrix zeroes
    # those columns, and the roll wrap-around only touches them)
    wpp = -(-(wp + 2 * yr) // 128) * 128
    prev = jnp.pad(prev_y, ((16, 16), (yr, wpp - w - yr))).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, yr, wp, nout),
        grid=(nby,),
        in_specs=[
            pl.BlockSpec((16, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wpp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wpp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wpp), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nout, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nby * nout, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nout, wp), jnp.int32)],
    )(cur, prev, prev, prev, _reduce_matrix(wp, w))
    vol = out.reshape(nby, nout, 128)[:, :n * n, :nbx]        # (nby, 169, nbx)
    return vol.transpose(1, 0, 2)


@functools.lru_cache(maxsize=None)
def _reduce_matrix_np(wp: int, w: int):
    b = np.zeros((wp, 128), np.float32)
    for x in range(w):
        b[x, x // 16] = 1.0
    return b


def _reduce_matrix(wp: int, w: int):
    return jnp.asarray(_reduce_matrix_np(wp, w))


def supported() -> bool:
    return jax.default_backend() == "tpu"
