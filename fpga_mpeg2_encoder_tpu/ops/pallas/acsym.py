"""Pallas TPU kernel: AC run/level VLC symbolisation (stage T's put_AC loop,
RTL/mpeg2encoder.v:2525-2547 / 2823-2834), VMEM-resident.

The XLA formulation (ops/entropy.py) materialises the one-hot lookup
intermediates in HBM (~0.6 GB/frame at 1080p: the 16-wide one-hot, the
byte-plane partial products and the hi-select pass over 3.3M coefficient
positions).  Here each slice row's coefficients stream through VMEM once:

* run lengths: the previous-nonzero index is a segmented cumulative max over
  each tile's 64 zig-zag lanes, computed as 6 masked lane-roll max steps
  (the TPU analog of the RTL's per-cycle run counter);
* the 144-entry compact B.14 table lookup stays the exact one-hot matmul
  (0/1 one-hot x byte-plane table, f32 accumulation - values <= 255 are
  bf16-exact) but the one-hot and partial products never leave VMEM;
* the 24-bit escape path (RTL:2541-2543) is pure integer arithmetic.

Inputs:  zmod (nby, nbx*6*64) int32 - zig-zag-ordered quantised coefficients
         with position 0 replaced by the emit flag (intra or DC != 0), which
         only influences run computation (position 0's symbol is not an AC
         output; ops/entropy.py slices positions 1..63).
Outputs: codes (nby, nbx*6*64) uint32, lens int32 - put_AC of every position
         (len meaningful where the coefficient is nonzero).

Bit-exact vs the XLA path (tests/test_tpu_exactness.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_RB = 8      # macroblock rows per grid step (block sublane dim must be 8k)
_CHUNK = 12288  # lookup lane-chunk width (bounds the f32 matmul product to
                # (48, 12288) ~ 2.3 MB of VMEM)


def _kernel(width: int, tabt_ref, z_ref, code_ref, len_ref):
    from jax.experimental.pallas import tpu as pltpu

    tabt = tabt_ref[...].astype(jnp.bfloat16)                 # (48, 16)

    # the whole body runs in lane chunks so live temporaries stay ~chunk-sized
    # (full-width (RB, L) int32 temporaries would exhaust VMEM at 1080p);
    # chunk boundaries are multiples of 64, so tile segments never split
    for s in range(0, width, _CHUNK):
        e = min(s + _CHUNK, width)
        z = z_ref[:, s:e]                                     # (RB, C) int32
        pos = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) & 63

        # ---- run lengths: segmented cummax of the last-emit position --------
        ew = jnp.where(z != 0, pos, -1)
        for j in (1, 2, 4, 8, 16, 32):
            rolled = pltpu.roll(ew, shift=j, axis=1)
            ew = jnp.where(pos >= j, jnp.maximum(ew, rolled), ew)
        prev = pltpu.roll(ew, shift=1, axis=1)
        prev = jnp.where(pos == 0, -1, prev)
        run = pos - prev - 1

        # ---- compact B.14 key (ops/entropy.py _ac_key) -----------------------
        # zero coefficients get a dummy value of 1 (their emitted length is
        # zeroed by the caller), as in ops/entropy.py
        v = jnp.where(z == 0, 1, z)
        am1 = jnp.maximum(v, -v) - 1
        ka = (run <= 7) & (am1 <= 7)
        kb = (run == 0) & (am1 >= 8) & (am1 <= 39)
        kc = (run == 1) & (am1 >= 8) & (am1 <= 17)
        kd = (run >= 8) & (run <= 16) & (am1 <= 1)
        ke = (run >= 17) & (run <= 31) & (am1 == 0)
        k = jnp.full(run.shape, 143, jnp.int32)               # invalid sentinel
        k = jnp.where(ka, run * 8 + am1, k)
        k = jnp.where(kb, 64 + am1 - 8, k)
        k = jnp.where(kc, 96 + am1 - 8, k)
        k = jnp.where(kd, 106 + (run - 8) * 2 + am1, k)
        k = jnp.where(ke, 124 + run - 17, k)

        # ---- table lookup: one-hot matmul per sublane row, all in VMEM ------
        # tabt row 16*b + h = byte plane b of hi-group h; hi selection is a
        # masked reduce (exactly one nonzero term per output).  Byte planes
        # <= 255 are bf16-exact, so bf16 after the 32-bit-accumulated matmul
        # is exact.
        klo = k & 15
        khi = k >> 4
        io16 = jax.lax.broadcasted_iota(jnp.int32, (16, e - s), 0)
        rows = []
        for r in range(z.shape[0]):
            oh = (io16 == klo[r:r + 1, :]).astype(jnp.bfloat16)
            p = jnp.dot(tabt, oh,
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            ohhi = (io16 == khi[r:r + 1, :]).astype(jnp.bfloat16)
            v0 = jnp.sum(p[0:16, :] * ohhi, axis=0, keepdims=True)
            v1 = jnp.sum(p[16:32, :] * ohhi, axis=0, keepdims=True)
            v2 = jnp.sum(p[32:48, :] * ohhi, axis=0, keepdims=True)
            rows.append(v0.astype(jnp.int32) | (v1.astype(jnp.int32) << 8)
                        | (v2.astype(jnp.int32) << 16))
        eint = jnp.concatenate(rows, axis=0)                  # (RB, C)

        # ---- symbol assembly (put_AC, RTL:2525-2547) -------------------------
        valid = eint >= (1 << 22)
        code_t = (((eint >> 6) & 0xFFFF).astype(jnp.uint32) << 1) \
            | (v < 0).astype(jnp.uint32)
        len_t = (eint & 63) + 1
        esc = (jnp.uint32(1) << 18) | (run.astype(jnp.uint32) << 12) \
            | (v & 0xFFF).astype(jnp.uint32)
        code_ref[:, s:e] = jnp.where(valid, code_t, esc)
        len_ref[:, s:e] = jnp.where(valid, len_t, 24)


@functools.partial(jax.jit, static_argnames=())
def ac_symbols_pallas(zmod: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(nby, L=nbx*6*64) int32 -> (codes uint32, lens int32), put_AC per lane.

    zmod lane k belongs to zig position k & 63; position-0 lanes carry the
    emit flag (nonzero iff the tile's position 0 'emits' for run purposes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nby, width = zmod.shape
    assert width % 64 == 0
    rp = -(-nby // _RB) * _RB
    z = jnp.pad(zmod, ((0, rp - nby), (0, 0)))

    codes, lens = pl.pallas_call(
        functools.partial(_kernel, width),
        grid=(rp // _RB,),
        in_specs=[
            pl.BlockSpec((48, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_RB, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, width), jnp.uint32),
            jax.ShapeDtypeStruct((rp, width), jnp.int32),
        ],
    )(_table_t(), z)
    return codes[:nby], lens[:nby]


@functools.lru_cache(maxsize=None)
def _table_t_np():
    from ..entropy import _AC_TABLE
    t = np.zeros((48, 16), np.float32)
    for kk in range(144):
        e = int(_AC_TABLE[kk])
        t[(kk >> 4), kk & 15] = e & 255
        t[16 + (kk >> 4), kk & 15] = (e >> 8) & 255
        t[32 + (kk >> 4), kk & 15] = (e >> 16) & 255
    return t


def _table_t():
    return jnp.asarray(_table_t_np())


def supported() -> bool:
    return jax.default_backend() == "tpu"
