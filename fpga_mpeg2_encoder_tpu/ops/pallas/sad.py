"""Pallas TPU kernel: full-pel SAD volume over the macroblock grid.

This keeps one macroblock-row strip of the current frame and a 48-row window of
the reference resident in VMEM and evaluates all 169 search offsets from there -
the frame is read once, and one byte-split MXU matmul per strip performs the
16-column block reductions.

Exactness: pixels are integers <= 255, row sums <= 4080 are split into bf16-exact
byte planes, the block-diagonal reduction matrix is 0/1, accumulation is f32, so
every value is exact; validated bit-for-bit against the XLA shift formulation
(tests/test_tpu_exactness.py).

STATUS: correct but NOT the production path.  On this environment's Mosaic
toolchain the unaligned lane slices inside the offset loop compile to
scalarised code (~350 ms/frame vs ~2 ms for the XLA formulation in
ops/motion.py, which fuses the 169 shifted diffs without materialising them).
The kernel is retained as the VMEM-resident reference design - on a toolchain
that vectorises unaligned i32 window slices it reads the frame once instead of
169 times.  ops/motion.py remains the shipping implementation.

Grid: one program per macroblock row.  Block shapes honour the Mosaic tiling
rules (width padded to 128 lanes, strip heights multiples of 16).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(yr: int, wp: int, nout: int, cur_ref, p0_ref, p1_ref, p2_ref, b_ref,
            out_ref, rs_ref):
    n = 2 * yr + 1
    c = cur_ref[...]                                          # (16, Wp) int32
    win = jnp.concatenate([p0_ref[...], p1_ref[...], p2_ref[...]], axis=0)
    b = b_ref[...].astype(jnp.bfloat16)                       # (Wp, 128)
    # per-offset strip row sums in the VPU, written straight into a VMEM scratch
    # so the MXU runs ONE matmul per strip instead of 169 tiny ones
    for dy in range(-yr, yr + 1):
        for dx in range(-yr, yr + 1):
            x = c - win[16 + dy:32 + dy, yr + dx:yr + dx + wp]
            d = jnp.maximum(x, -x)            # Mosaic lacks math.absi
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
    """(H, W) uint8 planes -> (169, nby, nbx) int32 full-pel SAD volume.

    Matches the XLA shift formulation bit for bit (tests/test_tpu_exactness.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur_y.shape
    nby, nbx = h // 16, w // 16
    n = 2 * yr + 1
    wp = -(-w // 128) * 128                   # lane-aligned strip width
    nout = -(-(n * n) // 8) * 8               # sublane-aligned output rows

    cur = jnp.pad(cur_y, ((0, 0), (0, wp - w))).astype(jnp.int32)
    # reference padded: 16 rows top/bottom, yr cols left, lane-aligned right
    # (the diff runs over all Wp columns; the 0/1 matrix zeroes padding columns,
    # and cur/prev padding are both zero there anyway)
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
