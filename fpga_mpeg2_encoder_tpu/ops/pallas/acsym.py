"""Pallas TPU kernel: AC run/level VLC symbolisation (stage T's put_AC loop,
RTL/mpeg2encoder.v:2525-2547 / 2823-2834) emitting the frame's SLOT GRID
directly, VMEM-resident.

The XLA formulation (ops/entropy.py) materialises the one-hot lookup
intermediates in HBM (~0.6 GB/frame at 1080p) and then assembles the
(slice-row, slot) grid with a chain of whole-frame concatenations (another
~0.2 GB).  Here each slice row's coefficients stream through VMEM once and
leave as finished slot-grid rows:

* run lengths: the previous-nonzero index is a segmented cumulative max over
  each tile's 64 zig-zag lanes, computed as 6 masked lane-roll max steps
  (the TPU analog of the RTL's per-cycle run counter);
* the 144-entry compact B.14 table lookup stays the exact one-hot matmul,
  but in f32 with the FULL 24-bit entries as table values (every entry
  < 2^24 is f32-exact, and each one-hot column selects exactly one term, so
  every sum has a single nonzero addend - exact in any accumulation order).
  The pre-r05 form kept three 8-bit byte planes to stay bf16-exact, which
  tripled the second-level select; folding to one f32 plane halves the
  lookup block's VPU work.  One-hots and partial products never leave VMEM;
* the 24-bit escape path (RTL:2541-2543) is pure integer arithmetic;
* slot routing: AC position (mb, t, z) must land at slot
  3 + mb*394 + 4 + t*65 + z, a right-shift of 7 + 10*mb + t lanes.  The
  shift is monotone non-decreasing in the source lane, so the routing is
  collision-free and runs as an 11-stage carry-the-remainder lane barrel:
  each stage rolls (data, remaining-shift) together and lanes take the
  rolled value iff the rolled remainder has that stage's bit set;
* the non-AC slots (slice header, macroblock type/mv/cbp, per-tile DC and
  EOB) arrive pre-packed from XLA (they are (nby, nbx)-sized - trivial) and
  are selected into the grid by a per-lane slot-class mask.

Slots are PACKED: uint32 = code | len << 27 (codes <= 25 bits, lens <= 24),
halving the symbolise->pack HBM traffic.

Inputs:  zmod (nby, nbx*6*64) int32 - zig-zag-ordered quantised coefficients
         with position 0 replaced by the emit flag (intra or DC != 0), which
         only influences run computation;
         small (nby, Sp) uint32 - packed non-AC slots (zero at AC slots).
Outputs: slots (nby, Sp) uint32 - the complete packed slot grid rows.

Bit-exact vs the XLA path (tests/test_pallas_interpret.py on CPU,
tests/test_tpu_exactness.py on chip).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Set True (tests only) to run the kernel via the Pallas CPU interpreter.
_INTERPRET = False

_RB = 8      # macroblock rows per grid step (block sublane dim must be 8k)
_CHUNK = 12288  # lookup lane-chunk width (bounds the f32 matmul product to
                # (48, 12288) ~ 2.3 MB of VMEM)

SLOTS_PER_MB = 4 + 6 * 65          # type, mvx, mvy, cbp, 6 x (dc, 63 ac, eob)
HDR_SLOTS = 3                      # slice start code, row, quantiser scale


@functools.lru_cache(maxsize=None)
def _magic_div(d: int, xmax: int):
    """(m, s) with (x*m) >> s == x // d for all 0 <= x < xmax, x*m < 2^31."""
    for s in range(10, 31):
        m = -(-(1 << s) // d)
        if (xmax - 1) * m >= (1 << 31):
            break
        if all((x * m) >> s == x // d for x in range(0, xmax, 7)) and \
           all((x * m) >> s == x // d for x in range(max(0, xmax - 800), xmax)):
            # spot pattern passed; verify densely
            if all((x * m) >> s == x // d for x in range(xmax)):
                return m, s
    raise AssertionError(f"no magic divisor for /{d} over [0, {xmax})")


def _kernel(width: int, nbx: int, sp: int, divs, tabt_ref, z_ref, small_ref,
            out_ref, ac_ref):
    from jax.experimental.pallas import tpu as pltpu

    tabt = tabt_ref[...]                                      # (16, 16) f32
    (m6, s6), (m394, s394), (m65, s65) = divs

    # ---- put_AC per coefficient, chunked through VMEM -----------------------
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
        v = jnp.where(z == 0, 1, z)
        am1 = jnp.abs(v) - 1
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
        klo = k & 15
        khi = k >> 4
        io16 = jax.lax.broadcasted_iota(jnp.int32, (16, e - s), 0)
        rows = []
        for r in range(z.shape[0]):
            oh = (io16 == klo[r:r + 1, :]).astype(jnp.float32)
            # HIGHEST precision: TPU's default f32 matmul truncates operands
            # to bf16 (1 pass), which would chop the 24-bit entries.  The
            # multi-pass decomposition splits tabt = hi + lo with both
            # passes against the EXACTLY-bf16 one-hot, so the product is
            # exact end to end.
            p = jnp.dot(tabt, oh, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (16, C)
            ohhi = (io16 == khi[r:r + 1, :]).astype(jnp.float32)
            rows.append(jnp.sum(p * ohhi, axis=0,
                                keepdims=True).astype(jnp.int32))
        eint = jnp.concatenate(rows, axis=0)                  # (RB, C)

        # ---- packed symbol assembly (put_AC, RTL:2525-2547) ------------------
        valid = eint >= (1 << 22)
        code_t = (((eint >> 6) & 0xFFFF).astype(jnp.uint32) << 1) \
            | (v < 0).astype(jnp.uint32)
        len_t = ((eint & 63) + 1).astype(jnp.uint32)
        esc = (jnp.uint32(1) << 18) | (run.astype(jnp.uint32) << 12) \
            | (v & 0xFFF).astype(jnp.uint32)
        packed = jnp.where(valid, code_t | (len_t << 27),
                           esc | (jnp.uint32(24) << 27))
        # zero coefficients (and the position-0 emit-flag lanes, which are
        # never routed to an AC slot) emit nothing
        ac_ref[:, s:e] = jnp.where(z == 0, jnp.uint32(0), packed)

    # ---- slot routing: monotone carry-the-remainder lane barrel -------------
    # source lane sl = (mb*6 + t)*64 + z must move RIGHT by
    # off = HDR_SLOTS + 4 + 10*mb + t lanes (monotone in sl -> collision-free:
    # intermediate positions src + (off with only bits >= stage applied) are
    # strictly increasing in src, so no two LIVE copies ever share a lane).
    #
    # Liveness gating is essential: when a copy moves y -> y+k, lane y still
    # HOLDS the old (data, rem) pair, and that stale duplicate would later
    # creep along rem's low bits and overwrite a correct destination.  The
    # bug only manifests once some off crosses a power-of-2 boundary inside
    # the grid (first at nbx = 26, off > 256), which is why narrow-frame
    # tests passed while 720p/1080p/2048 corrupted (caught on-chip, r04).
    # Each copy therefore carries a live flag: a take requires a LIVE source,
    # and a source claimed by its right neighbour dies that stage.
    #
    # The remainder (<= 12 bits) and the live flag share one carry array
    # (rem << 1 | live): each stage rolls/selects 2 arrays instead of 3,
    # a third less VPU traffic in the barrel, bit-identical routing.
    sl = jax.lax.broadcasted_iota(jnp.int32, (_RB, sp), 1)
    q = sl >> 6                                               # tile index
    mb = (q * m6) >> s6
    t = q - mb * 6
    off = jnp.where(sl < width, 7 + 10 * mb + t, 0)
    data = jnp.concatenate(
        [ac_ref[...],
         jnp.zeros((_RB, sp - width), jnp.uint32)], axis=1)   # (RB, SP)
    carry = (off << 1) | (sl < width).astype(jnp.int32)       # rem<<1 | live
    kbit = 1
    while kbit <= 7 + 10 * (width // 384 - 1) + 5:
        kbit <<= 1
    kbit >>= 1
    while kbit >= 1:
        kb2 = kbit << 1
        dmoved = pltpu.roll(data, shift=kbit, axis=1)
        cmoved = pltpu.roll(carry, shift=kbit, axis=1)
        # take: rolled copy has this stage's rem bit AND is live
        take = ((cmoved & (kb2 | 1)) == (kb2 | 1))
        # claimed: this lane's live copy moved away this stage -> it dies
        claimed = ((carry & (kb2 | 1)) == (kb2 | 1))
        data = jnp.where(take, dmoved, data)
        # taking consumes the stage bit (bit 0 stays 1: the source was live);
        # a claimed-and-not-taken lane only drops its live bit
        carry = jnp.where(take, cmoved - kb2,
                          jnp.where(claimed, carry & ~1, carry))
        kbit >>= 1

    # ---- merge with the pre-packed non-AC slots -----------------------------
    d = jax.lax.broadcasted_iota(jnp.int32, (_RB, sp), 1)
    dm3 = d - HDR_SLOTS
    mbd = (dm3 * m394) >> s394
    within = dm3 - mbd * SLOTS_PER_MB
    w4 = within - 4
    td = (w4 * m65) >> s65
    w65 = w4 - td * 65
    is_ac = (dm3 >= 0) & (mbd < nbx) & (w4 >= 0) & (w65 >= 1) & (w65 <= 63)
    out_ref[...] = jnp.where(is_ac, data, small_ref[...])


def ac_slot_grid_pallas(zmod: jnp.ndarray, small: jnp.ndarray) -> jnp.ndarray:
    """(nby, nbx*6*64) int coefficients + (nby, S) uint32 packed non-AC slots
    -> (nby, S) uint32 complete packed slot grid (code | len << 27)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nby, width = zmod.shape
    assert width % 384 == 0
    nbx = width // 384
    s_out = small.shape[1]
    assert s_out == HDR_SLOTS + nbx * SLOTS_PER_MB
    sp = -(-s_out // 128) * 128
    rp = -(-nby // _RB) * _RB
    z = jnp.pad(zmod.astype(jnp.int32), ((0, rp - nby), (0, 0)))
    sm = jnp.pad(small, ((0, rp - nby), (0, sp - s_out)))

    divs = (_magic_div(6, width // 64),
            _magic_div(SLOTS_PER_MB, sp),
            _magic_div(65, SLOTS_PER_MB))

    # Mosaic's default scoped-VMEM cap (16 MB) is sized for double-buffered
    # streaming kernels; this kernel's blocks + barrel temporaries legitimately
    # peak at ~26 MB at 2048-wide (measured on-chip, r04), well inside the
    # v5e core's physical VMEM.  Raise the cap instead of shrinking blocks:
    # the routing barrel needs whole rows resident, so lane-splitting the grid
    # is not an option.
    params = {} if _INTERPRET else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))
    slots = pl.pallas_call(
        functools.partial(_kernel, width, nbx, sp, divs),
        grid=(rp // _RB,),
        in_specs=[
            pl.BlockSpec((16, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RB, sp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, sp), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((_RB, width), jnp.uint32)],
        interpret=_INTERPRET,
        **params,
    )(_table_t(), z, sm)
    return slots[:nby, :s_out]


@functools.lru_cache(maxsize=None)
def _table_t_np():
    from ..entropy import _AC_TABLE
    t = np.zeros((16, 16), np.float32)
    for kk in range(144):
        e = int(_AC_TABLE[kk])
        assert e < (1 << 24)                  # f32-exact integer range
        t[kk >> 4, kk & 15] = e
    return t


def _table_t():
    return jnp.asarray(_table_t_np())


def supported() -> bool:
    return jax.default_backend() == "tpu"
