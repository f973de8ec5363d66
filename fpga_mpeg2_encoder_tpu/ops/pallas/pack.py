"""Pallas TPU kernel: whole-row variable-length bit packing, VMEM-resident.

The XLA barrel-merge tree (ops/bitpack.py) materialises every merge level in
HBM (~0.8 GB/frame of traffic at 1080p).  Here the ENTIRE per-row merge tree
runs inside VMEM: HBM is touched once to read the (codes, lens) slot grid and
once to write the packed rows - the TPU equivalent of the RTL's on-chip
shift-register packer (stage V, RTL/mpeg2encoder.v:2914-2956).

Layout strategy (the whole trick)
---------------------------------
Mosaic vectorises only aligned static slices, so the tree cannot pair adjacent
nodes (stride-2) in the lane axis.  Instead the input is pre-permuted by BIT
REVERSAL of the slot index (one XLA reshape/transpose): after that, every
level's pairs are (i, i + n/2) - two contiguous HALVES, i.e. aligned static
slices at every level.  (Same trick as FFT decimation-in-time.)

* Phase 1 (nodes >= 128): buffers (w, RB, n) with nodes on LANES - halves are
  128-aligned lane slices, word shifts are static sublane shifts.
* One tiny XLA transpose to (rows, node, w).
* Phase 2 (nodes 128 -> 1): buffers (RB, n, w) with words on LANES - halves
  are sublane slices, word shifts are `pltpu.roll` along lanes + iota mask.

Node bit-lengths are exact prefix data, so overflow detection and the final
row bit counts are computed OUTSIDE the kernels from a length pyramid over the
same pairing (lengths are additive under concat) - the kernels carry no
bookkeeping outputs.

Exactness: pure integer bit arithmetic, no floating point anywhere; validated
bit-for-bit against the XLA tree (tests/test_tpu_exactness.py) and the golden
model.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Set True (tests only) to run the kernels via the Pallas CPU interpreter.
_INTERPRET = False

_RB = 8  # rows per grid step (minor-dim sublanes in phase 1)

# Mosaic's default scoped-VMEM cap (16 MB) is sized for double-buffered
# streaming kernels; the merge trees keep whole rows resident plus barrel
# temporaries, legitimately peaking above it at bench caps (measured ~27 MB
# at (128, 4096) -> 256K words, r04) - well inside the v5e core's physical
# VMEM.  merge_fits_vmem gates geometries against this cap.
_VMEM_CAP = 64 * 1024 * 1024


def _compiler_params():
    if _INTERPRET:
        return {}
    from jax.experimental.pallas import tpu as pltpu
    return dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_CAP))


def _level_width(level: int, prev_w: int, cap_words: int,
                 budget_bps: int, budget_margin: int) -> Tuple[int, bool]:
    """Width (words) of merge level `level` (nodes span 2**level slots) and
    whether it is capped below the worst case.  Mirrors the budget policy of
    bitpack.pack_symbols, but widths >= nlev-7 are additionally rounded up to
    128-word multiples for the lane layout, so capped levels (and hence the
    overflow flag) can differ from the XLA tree on the same input - see the
    pack_symbols_pallas docstring."""
    need = (24 * (1 << level) + 31) // 32
    w = min(need, 2 * prev_w, cap_words)
    if budget_bps > 0:
        w = min(w, max((budget_bps * (1 << level) + budget_margin + 31) // 32, 2))
    return w, w < need


def _shift_sub(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """Shift axis 0 (words) down by t, zero-filling the top."""
    pad = jnp.zeros((t,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-t]], axis=0) if t < x.shape[0] \
        else jnp.zeros_like(x)


def _pad_axis(x: jnp.ndarray, w: int, axis: int) -> jnp.ndarray:
    if x.shape[axis] >= w:
        return x
    shape = list(x.shape)
    shape[axis] = w - x.shape[axis]
    return jnp.concatenate([x, jnp.zeros(shape, x.dtype)], axis=axis)


def _phase1_kernel(s2: int, widths, slots_ref, out_ref):
    slots = slots_ref[...]                    # (RB, S2) uint32: code | len<<27
    c = slots & jnp.uint32((1 << 27) - 1)
    l = (slots >> 27).astype(jnp.int32)

    # fused levels 0+1: symbol pairs (<=48 bits) -> 2-word nodes
    m = s2 // 2
    c0, c1 = c[:, :m], c[:, m:]
    l0, l1 = l[:, :m], l[:, m:]
    l01 = l0 + l1
    over = l01 > 32
    t0 = jnp.where(l0 > 0, c0 << jnp.clip(32 - l0, 0, 31).astype(jnp.uint32),
                   jnp.uint32(0))
    t1in = jnp.where(l1 > 0, c1 << jnp.clip(32 - l01, 0, 31).astype(jnp.uint32),
                     jnp.uint32(0))
    w0 = t0 | jnp.where(over, c1 >> jnp.clip(l01 - 32, 0, 31).astype(jnp.uint32),
                        t1in)
    w1 = jnp.where(over, c1 << jnp.clip(64 - l01, 0, 31).astype(jnp.uint32),
                   jnp.uint32(0))
    buf = jnp.stack([w0, w1], axis=0)         # (2, RB, m)
    bl = l01
    w, level = 2, 1

    while m > 128:
        m //= 2
        level += 1
        w_new = widths[level - 1]
        a = _pad_axis(buf[:, :, :m], w_new, 0)
        b = _pad_axis(buf[:, :, m:], w_new, 0)
        la, lb = bl[:, :m], bl[:, m:]
        s = (la & 31).astype(jnp.uint32)[None]            # (1, RB, m)
        pos = s > 0
        prev = _shift_sub(b, 1)
        b = jnp.where(pos, (b >> s) | jnp.where(pos, prev << ((32 - s) & 31),
                                                jnp.uint32(0)), b)
        t = la >> 5
        j = 0
        while (1 << j) <= w:
            take = (((t >> j) & 1) > 0)[None]
            b = jnp.where(take, _shift_sub(b, 1 << j), b)
            j += 1
        buf = a | b
        bl = la + lb
        w = w_new
    out_ref[0] = buf                          # (W1, RB, 128)


def _phase2_kernel(w1: int, s2: int, widths, buf_ref, bl_ref, out_ref):
    buf = buf_ref[...]                        # (RB, 128, W1) uint32
    bl = bl_ref[...]                          # (RB, 128) int32
    n, w = 128, w1
    level = s2.bit_length() - 1 - 7           # phase-1 ended at n=128

    from jax.experimental.pallas import tpu as pltpu
    while n > 1:
        m = n // 2
        level += 1
        w_new = widths[level - 1]
        if n > 8:
            a = _pad_axis(buf[:, :m, :], w_new, 2)
            b = _pad_axis(buf[:, m:n, :], w_new, 2)
            la, lb = bl[:, :m], bl[:, m:n]
        else:
            # sub-tile sublane slices produce Mosaic layout offsets that its
            # concat lowering rejects; once n <= 8 keep all 8 physical
            # sublanes and pair node i with i+m by a cyclic sublane roll -
            # nodes >= m compute garbage that is never read (only node 0
            # survives to the output)
            a = _pad_axis(buf, w_new, 2)
            b = _pad_axis(pltpu.roll(buf, shift=buf.shape[1] - m, axis=1),
                          w_new, 2)
            la = bl
            lb = pltpu.roll(bl, shift=bl.shape[1] - m, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w_new), 2)
        s = (la & 31).astype(jnp.uint32)[..., None]       # (RB, m, 1)
        pos = s > 0
        from jax.experimental.pallas import tpu as pltpu
        prev = jnp.where(lane >= 1, pltpu.roll(b, shift=1, axis=2),
                         jnp.uint32(0))
        b = jnp.where(pos, (b >> s) | jnp.where(pos, prev << ((32 - s) & 31),
                                                jnp.uint32(0)), b)
        t = (la >> 5)[..., None]
        j = 0
        while (1 << j) <= w:
            sh = 1 << j
            shifted = jnp.where(lane >= sh, pltpu.roll(b, shift=sh, axis=2),
                                jnp.uint32(0))
            b = jnp.where(((t >> j) & 1) > 0, shifted, b)
            j += 1
        buf = a | b
        bl = la + lb
        n, w = m, w_new
    out_ref[...] = buf[:, 0, :]               # (RB, W_final)


@functools.lru_cache(maxsize=None)
def _bitrev_axes(nbits: int):
    return (0,) + tuple(range(nbits, 0, -1))


def _bit_reverse(x: jnp.ndarray, s2: int) -> jnp.ndarray:
    """(R, S2) -> slot-index bit-reversed copy, as reshape + transpose."""
    nbits = s2.bit_length() - 1
    r = x.shape[0]
    return x.reshape((r,) + (2,) * nbits).transpose(_bitrev_axes(nbits)) \
        .reshape(r, s2)


def pack_symbols_pallas(codes: jnp.ndarray, lens: jnp.ndarray, cap_words: int,
                        budget_bps: int = 0, budget_margin: int = 1536,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unpacked-operand compatibility wrapper over pack_slots_pallas."""
    slots = codes.astype(jnp.uint32) | (lens.astype(jnp.uint32) << 27)
    return pack_slots_pallas(slots, cap_words, budget_bps, budget_margin)


def pack_slots_pallas(slots: jnp.ndarray, cap_words: int,
                      budget_bps: int = 0, budget_margin: int = 1536,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pallas implementation of bitpack.pack_slots for 2-D packed slot grids
    (uint32 = code | len << 27, entropy.pack_slot).

    slots (R, S) -> (words (R, cap_words) uint32, bits (R,) int32
    byte-aligned, overflow () bool).

    The overflow flag is SELF-consistent (set iff THIS implementation dropped
    bits), not guaranteed identical to the XLA tree's flag on the same input:
    level widths >= nlev-7 round up to 128-word multiples, the cap rounds to
    cap128, and the pow2 bit-reversed pairing groups symbols differently from
    the XLA even-padded tree, so budget-capped levels can drop/flag on
    different inputs.  Callers must treat a set flag as "retry with worst-case
    buffers" (encode_frame_core additionally checks row_bits/fbits against the
    caps), never compare flags across backends.  Successful (non-overflowing)
    outputs ARE bit-identical to the XLA tree."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, s = slots.shape
    s2 = max(256, 1 << (s - 1).bit_length())
    rp = -(-r // _RB) * _RB
    c = jnp.pad(slots, ((0, rp - r), (0, s2 - s)))
    c = _bit_reverse(c, s2)
    l = (c >> 27).astype(jnp.int32)

    # Width ladder: same formula as the XLA tree, except levels at and above
    # the phase boundary are rounded up to 128-word (lane) multiples - Mosaic
    # only concatenates lane-aligned operands.  The internal cap is rounded up
    # too; the final output is truncated back to cap_words (content beyond it
    # implies row_bits > 32*cap_words, which the caller checks).
    nlev = s2.bit_length() - 1
    cap128 = -(-cap_words // 128) * 128
    widths, capped_levels = [2], []
    for level in range(2, nlev + 1):
        w_new, capped = _level_width(level, widths[-1], cap128,
                                     budget_bps, budget_margin)
        if level >= nlev - 7:
            w_new = min(-(-w_new // 128) * 128, cap128)
        widths.append(w_new)
        capped_levels.append(capped or w_new < (24 * (1 << level) + 31) // 32)
    widths = tuple(widths)

    # exact overflow + row bit counts from a length pyramid over the same
    # pairing (bit-lengths are additive under concat; a capped concat drops
    # bits iff its output length exceeds its width)
    ovf = jnp.asarray(False)
    p = l[:r]                                 # only real rows count
    pm = s2 // 2
    p = p[:, :pm] + p[:, pm:]                 # level 1 (w=2, never capped)
    for level in range(2, nlev + 1):
        pm //= 2
        p = p[:, :pm] + p[:, pm:]
        if capped_levels[level - 2]:
            ovf = ovf | (p > 32 * widths[level - 1]).any()
    row_bits = p[:, 0]

    w1 = widths[nlev - 8]                     # phase-1 final width (level nlev-7, n=128)
    buf = pl.pallas_call(
        functools.partial(_phase1_kernel, s2, widths),
        grid=(rp // _RB,),
        in_specs=[
            pl.BlockSpec((_RB, s2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w1, _RB, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp // _RB, w1, _RB, 128), jnp.uint32),
        interpret=_INTERPRET,
        **_compiler_params(),
    )(c)

    # node-major layout for phase 2: (rows, node, words)
    buf_t = buf.transpose(0, 2, 3, 1).reshape(rp, 128, w1)
    # phase-1 node lengths = level-(nlev-7) pyramid over ALL padded rows
    pl9 = l
    for _ in range(nlev - 7):
        half = pl9.shape[1] // 2
        pl9 = pl9[:, :half] + pl9[:, half:]

    w_final = widths[-1]
    rows = pl.pallas_call(
        functools.partial(_phase2_kernel, w1, s2, widths),
        grid=(rp // _RB,),
        in_specs=[
            pl.BlockSpec((_RB, 128, w1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RB, w_final), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, w_final), jnp.uint32),
        interpret=_INTERPRET,
        **_compiler_params(),
    )(buf_t, pl9)

    out = rows[:r]
    if w_final < cap_words:
        out = jnp.pad(out, ((0, 0), (0, cap_words - w_final)))
    elif w_final > cap_words:
        out = out[:, :cap_words]
    return out, (row_bits + 7) & ~7, ovf


def _merge_rows_kernel(r2: int, widths, buf_ref, bl_ref, out_ref):
    """Whole-frame row merge in VMEM: buf (1, R2, C) byte-aligned row
    bit-strings (bit-reversed row order), bl (1, R2) their bit lengths ->
    out (1, W_final) the in-order concatenation.  Same halves pairing and
    lane-roll word barrel as _phase2_kernel."""
    from jax.experimental.pallas import tpu as pltpu

    buf = buf_ref[...]                        # (1, R2, C) uint32
    bl = bl_ref[...]                          # (1, R2) int32
    n, w = r2, buf.shape[2]
    level = 0
    while n > 1:
        m = n // 2
        level += 1
        w_new = widths[level - 1]
        if n > 8:
            a = _pad_axis(buf[:, :m, :], w_new, 2)
            b = _pad_axis(buf[:, m:n, :], w_new, 2)
            la, lb = bl[:, :m], bl[:, m:n]
        else:
            # sub-8 sublane slices create layout offsets Mosaic's concat
            # rejects; keep all 8 sublanes and pair node i with i+m by a
            # cyclic roll (nodes >= m compute garbage that is never read)
            a = _pad_axis(buf, w_new, 2)
            b = _pad_axis(pltpu.roll(buf, shift=buf.shape[1] - m, axis=1),
                          w_new, 2)
            la = bl
            lb = pltpu.roll(bl, shift=bl.shape[1] - m, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w_new), 2)
        s = (la & 31).astype(jnp.uint32)[..., None]
        pos = s > 0
        prev = jnp.where(lane >= 1, pltpu.roll(b, shift=1, axis=2),
                         jnp.uint32(0))
        b = jnp.where(pos, (b >> s) | jnp.where(pos, prev << ((32 - s) & 31),
                                                jnp.uint32(0)), b)
        t = (la >> 5)[..., None]
        j = 0
        while (1 << j) <= w:
            sh = 1 << j
            shifted = jnp.where(lane >= sh, pltpu.roll(b, shift=sh, axis=2),
                                jnp.uint32(0))
            b = jnp.where(((t >> j) & 1) > 0, shifted, b)
            j += 1
        buf = a | b
        bl = la + lb
        n, w = m, w_new
    out_ref[...] = buf[:, 0, :]               # (1, W_final)


def _bit_reverse_rows(x: jnp.ndarray, r2: int) -> jnp.ndarray:
    """Bit-reverse the leading (row) index, as reshape + transpose."""
    nbits = r2.bit_length() - 1
    rest = x.shape[1:]
    perm = tuple(range(nbits - 1, -1, -1)) \
        + tuple(range(nbits, nbits + len(rest)))
    return x.reshape((2,) * nbits + rest).transpose(perm) \
        .reshape((r2,) + rest)


def merge_fits_vmem(shape, cap_words: int) -> bool:
    """VMEM gate for merge_rows_pallas, calibrated on-chip (r04): Mosaic's
    scoped stack peaks at ~3.2x this analytic working-set estimate (measured
    26.9 MB for an 8.4 MB estimate at (128, 4096) -> 256K words), and the
    kernels run with a 64 MB scoped cap (_VMEM_CAP), so the gate admits
    estimates up to 20 MB.  Geometries beyond it fall back to the XLA tree,
    where the merge is a small fraction of frame time anyway - the kernel
    targets small geometries, where ~100 tiny XLA launches per frame
    dominate the merge."""
    r, c = shape
    r2 = max(16, 1 << (max(r, 2) - 1).bit_length())
    cap128 = -(-cap_words // 128) * 128
    return 12 * r2 * c + 8 * cap128 <= 20 * (1 << 20)


def merge_rows_pallas(words: jnp.ndarray, bits: jnp.ndarray, cap_words: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas implementation of bitpack.merge_rows for 2-D row grids:
    (R, C) byte-aligned rows -> ((cap_words,) words, () bits).

    The XLA tree runs log2(R) concat levels of log2(W) barrel steps as
    individual HBM-level XLA ops (~100+ launches per frame - over half the
    frame budget at CIF); here the whole tree is ONE kernel, HBM touched once
    to read the rows and once to write the payload.  Bit-identical to the XLA
    tree (rows are exact-length bit-strings; widths are worst-case, never
    budget-capped, so no overflow semantics differ; content past cap_words is
    truncated identically - callers detect via the returned bit count)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, c = words.shape
    r2 = max(16, 1 << (max(r, 2) - 1).bit_length())
    cap128 = -(-cap_words // 128) * 128
    nlev = r2.bit_length() - 1
    widths, w = [], c
    for _ in range(nlev):
        w = min(2 * w, cap128)
        widths.append(w)
    widths = tuple(widths)
    w_final = widths[-1]

    wb = _bit_reverse_rows(
        jnp.pad(words.astype(jnp.uint32), ((0, r2 - r), (0, 0))), r2)
    lb = _bit_reverse_rows(
        jnp.pad(bits.astype(jnp.int32), (0, r2 - r))[:, None], r2)[:, 0]

    out = pl.pallas_call(
        functools.partial(_merge_rows_kernel, r2, widths),
        in_specs=[
            pl.BlockSpec((1, r2, c), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r2), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w_final), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, w_final), jnp.uint32),
        interpret=_INTERPRET,
        **_compiler_params(),
    )(wb[None], lb[None])

    payload = out[0]
    if w_final < cap_words:
        payload = jnp.pad(payload, (0, cap_words - w_final))
    elif w_final > cap_words:
        payload = payload[:cap_words]
    return payload, bits.sum().astype(jnp.int32)


def supported() -> bool:
    return jax.default_backend() == "tpu"
