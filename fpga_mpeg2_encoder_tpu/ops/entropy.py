"""Vectorised entropy coding: VLC symbolisation + on-device bit packing.

TPU-first design
----------------
The reference emits symbols serially through a 7-chunk-per-cycle FSM
(RTL/mpeg2encoder.v:2476-2956).  The sequential state it carries - per-slice DC
predictors, per-slice MV predictors, per-tile run lengths - is *linear*: every
predictor is a function of the previous macroblock's outputs only, never of the
emitted bits.  So the whole frame symbolises in parallel:

* DC prediction   : published[t] = inter ? 0 : dc[t]; pred = shift-by-one within the
                    slice (RTL:2781-2792) - a roll, not a scan.
* MV prediction   : published[mb] = inter ? mv : 0; pred = shift within slice
                    (RTL:2712-2773).
* run lengths     : prev-nonzero index via cumulative max over the zig order
                    (incl. the inter-DC-zero counts-as-run rule, RTL:2795-2834).

Every symbol becomes a (code, len<=24) pair in a fixed slot grid
(4 + 6*65 slots/MB, len 0 = absent), then a parallel prefix-sum of lengths gives
each symbol its bit offset and two scatter-adds splice all symbols into 32-bit
words.  Slices are byte-aligned by construction (slice payloads are packed
independently and concatenated on the host at byte granularity), reproducing the
stage-V alignment rule (RTL:2940-2943).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import tables as T

SLOTS_PER_MB = 4 + 6 * 65
_ZIG_INV = jnp.asarray(T.ZIGZAG_INV)
_AC_CODE = jnp.asarray(T.AC_CODE.astype(np.uint32))
_AC_LEN = jnp.asarray(T.AC_LEN)
_AC_VALID = jnp.asarray(T.AC_VALID)
_MV_BITS = jnp.asarray(T.BITS_MOTION_VECTOR.astype(np.uint32))
_MV_LENS = jnp.asarray(T.LENS_MOTION_VECTOR)
_CBP_BITS = jnp.asarray(T.BITS_NZ_FLAGS.astype(np.uint32))
_CBP_LENS = jnp.asarray(T.LENS_NZ_FLAGS)
_DCY_BITS = jnp.asarray(T.BITS_DC_Y.astype(np.uint32))
_DCY_LENS = jnp.asarray(T.LENS_DC_Y)
_DCUV_BITS = jnp.asarray(T.BITS_DC_UV.astype(np.uint32))
_DCUV_LENS = jnp.asarray(T.LENS_DC_UV)


class PackedSlices(NamedTuple):
    words: jnp.ndarray     # (nby, words_per_slice) uint32, big-endian bit order
    nbits: jnp.ndarray     # (nby,) int32 valid bits per slice


def _ac_symbol(v: jnp.ndarray, run: jnp.ndarray):
    """put_AC (RTL:2525-2547) for v != 0; returns (code uint32, len int32)."""
    absv = jnp.abs(v)
    am1 = absv - 1
    rc = jnp.clip(run, 0, 32)
    ac = jnp.clip(am1, 0, 40)
    valid = (run < 32) & (am1 < 41) & _AC_VALID[rc, ac]
    code_t = (_AC_CODE[rc, ac] << 1) | (v < 0).astype(jnp.uint32)
    len_t = _AC_LEN[rc, ac] + 1
    esc = (jnp.uint32(1) << 18) | (run.astype(jnp.uint32) << 12) \
        | (v.astype(jnp.int32) & 0xFFF).astype(jnp.uint32)
    return jnp.where(valid, code_t, esc), jnp.where(valid, len_t, 24)


def symbolize_frame(
    quant: jnp.ndarray,     # (nby, nbx, 6, 64) int32, raster coefficient order
    inter: jnp.ndarray,     # (nby, nbx) bool
    mvx: jnp.ndarray,       # (nby, nbx) int32 half-pel
    mvy: jnp.ndarray,
    i_frame: jnp.ndarray,   # scalar int32 (0 => I-frame)
    q_level: int,
):
    """Returns (codes, lens, nzflags): per-slice slot grids ready for packing.

    codes: (nby, 3 + nbx*SLOTS_PER_MB) uint32, lens: same shape int32."""
    nby, nbx = inter.shape
    zig = quant[..., _ZIG_INV]                                   # (nby, nbx, 6, 64)
    nz = jnp.logical_not(inter)[:, :, None] | (zig != 0).any(-1)  # (nby, nbx, 6)
    cbp = sum((nz[..., t].astype(jnp.int32) << (5 - t)) for t in range(6))

    is_p = i_frame != 0
    intra = jnp.logical_not(inter)
    # macroblock type (RTL:2722-2731)
    type_code = jnp.where(intra & is_p, 0x23,
                          jnp.where(inter & (cbp == 0), 0x09, 0x03)).astype(jnp.uint32)
    type_len = jnp.where(intra & is_p, 6, jnp.where(inter & (cbp == 0), 4, 2))

    # motion vector differentials (RTL:2735-2763): per-slice predictor chain
    def mv_symbol(mv):
        pub = jnp.where(inter, mv, 0)
        pred = jnp.concatenate([jnp.zeros((nby, 1), mv.dtype), pub[:, :-1]], axis=1)
        dmv = ((mv - pred + 16) & 31) - 16
        a = jnp.abs(dmv)
        s = (dmv != 0).astype(jnp.int32)
        code = (_MV_BITS[a] << s) | (dmv < 0).astype(jnp.uint32)
        ln = jnp.where(inter, _MV_LENS[a] + s, 0)
        return code, ln
    mvx_code, mvx_len = mv_symbol(mvx)
    mvy_code, mvy_len = mv_symbol(mvy)

    cbp_code = _CBP_BITS[cbp]
    cbp_len = jnp.where(inter, _CBP_LENS[cbp], 0)

    # ---- DC prediction chains (RTL:2781-2821) --------------------------------
    dc = zig[..., 0]                                             # (nby, nbx, 6)
    pub_y = jnp.where(inter[:, :, None], 0, dc[..., :4]).reshape(nby, nbx * 4)
    pred_y = jnp.concatenate([jnp.zeros((nby, 1), dc.dtype), pub_y[:, :-1]], axis=1)
    pred_y = pred_y.reshape(nby, nbx, 4)
    pub_u = jnp.where(inter, 0, dc[..., 4])
    pred_u = jnp.concatenate([jnp.zeros((nby, 1), dc.dtype), pub_u[:, :-1]], axis=1)
    pub_v = jnp.where(inter, 0, dc[..., 5])
    pred_v = jnp.concatenate([jnp.zeros((nby, 1), dc.dtype), pub_v[:, :-1]], axis=1)
    pred_dc = jnp.concatenate([pred_y, pred_u[..., None], pred_v[..., None]], axis=-1)

    diff = dc - pred_dc                                          # (nby, nbx, 6)
    mag = jnp.abs(diff)
    vallen = sum((mag >= (1 << k)).astype(jnp.int32) for k in range(12))
    val = diff & 0xFFF
    val = jnp.where(diff < 0, (val + (1 << vallen) - 1) & 0xFFF, val)
    val = (val & ((1 << vallen) - 1)).astype(jnp.uint32)
    is_luma = (jnp.arange(6) < 4)[None, None, :]
    size_code = jnp.where(is_luma, _DCY_BITS[vallen], _DCUV_BITS[vallen])
    size_len = jnp.where(is_luma, _DCY_LENS[vallen], _DCUV_LENS[vallen])
    dc_intra_code = (size_code << vallen) | val
    dc_intra_len = size_len + vallen

    # inter DC: 0 => nothing (counts as run); +-1 => 2-bit '1s'; else put_AC(v, 0)
    dc_ac_code, dc_ac_len = _ac_symbol(jnp.where(dc == 0, 1, dc), jnp.zeros_like(dc))
    one = jnp.abs(dc) == 1
    dc_inter_code = jnp.where(one, (2 | (dc < 0)).astype(jnp.uint32), dc_ac_code)
    dc_inter_len = jnp.where(dc == 0, 0, jnp.where(one, 2, dc_ac_len))

    dc_code = jnp.where(inter[:, :, None], dc_inter_code, dc_intra_code)
    dc_len = jnp.where(inter[:, :, None], dc_inter_len, dc_intra_len)

    # ---- AC run/level (RTL:2823-2834) -----------------------------------------
    k_idx = jnp.arange(64)
    emit0 = intra[:, :, None] | (dc != 0)                        # position-0 emits
    emits = (zig != 0).at[..., 0].set(emit0)
    ew = jnp.where(emits, k_idx, -1)
    pm = jax.lax.cummax(ew, axis=ew.ndim - 1)
    prev = jnp.concatenate([jnp.full(pm.shape[:-1] + (1,), -1, pm.dtype),
                            pm[..., :-1]], axis=-1)
    run = k_idx - prev - 1                                       # (nby, nbx, 6, 64)
    ac_code, ac_len = _ac_symbol(jnp.where(zig == 0, 1, zig), run)
    ac_len = jnp.where(zig == 0, 0, ac_len)
    ac_code = ac_code[..., 1:]                                   # positions 1..63
    ac_len = ac_len[..., 1:]

    eob_code = jnp.full(nz.shape, 0b10, jnp.uint32)
    eob_len = jnp.full(nz.shape, 2, jnp.int32)

    # mask tile symbols by the coded flag (skipped tiles emit nothing, RTL:2779)
    nz_i = nz.astype(jnp.int32)
    tile_codes = jnp.concatenate([dc_code[..., None], ac_code, eob_code[..., None]],
                                 axis=-1)                        # (nby, nbx, 6, 65)
    tile_lens = jnp.concatenate([dc_len[..., None], ac_len, eob_len[..., None]],
                                axis=-1) * nz_i[..., None]

    mb_codes = jnp.concatenate([
        type_code[..., None], mvx_code[..., None], mvy_code[..., None],
        cbp_code[..., None], tile_codes.reshape(nby, nbx, 6 * 65)], axis=-1)
    mb_lens = jnp.concatenate([
        type_len[..., None], mvx_len[..., None], mvy_len[..., None],
        cbp_len[..., None], tile_lens.reshape(nby, nbx, 6 * 65)], axis=-1)

    # slice header slots (RTL:2708-2710)
    y16 = jnp.arange(nby, dtype=jnp.uint32)
    hdr_codes = jnp.stack([jnp.full(nby, 1, jnp.uint32), y16 + 1,
                           jnp.full(nby, 2 << q_level, jnp.uint32)], axis=1)
    hdr_lens = jnp.broadcast_to(jnp.array([24, 8, 6], jnp.int32), (nby, 3))

    codes = jnp.concatenate([hdr_codes, mb_codes.reshape(nby, nbx * SLOTS_PER_MB)],
                            axis=1)
    lens = jnp.concatenate([hdr_lens, mb_lens.reshape(nby, nbx * SLOTS_PER_MB)],
                           axis=1)
    return codes, lens, cbp


def pack_slices(codes: jnp.ndarray, lens: jnp.ndarray, words_per_slice: int
                ) -> PackedSlices:
    """Splice per-slice symbol streams into big-endian 32-bit words.

    Parallel-prefix over lengths gives bit offsets; each <=24-bit symbol spans at
    most two words, contributed via two scatter-adds (bit ranges are disjoint, so
    add == or)."""
    nby, s = codes.shape
    off_end = jnp.cumsum(lens, axis=1)
    off = off_end - lens                                         # exclusive prefix
    nbits = off_end[:, -1]

    word_idx = off >> 5
    bit_in = off & 31
    sh = 32 - bit_in - lens                                      # may be negative
    c = codes.astype(jnp.uint32)
    shl = jnp.clip(sh, 0, 31).astype(jnp.uint32)
    shr = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
    shlo = jnp.clip(32 + sh, 0, 31).astype(jnp.uint32)
    hi = jnp.where(sh >= 0, c << shl, c >> shr)
    lo = jnp.where(sh >= 0, jnp.uint32(0), c << shlo)
    hi = jnp.where(lens > 0, hi, jnp.uint32(0)).astype(jnp.uint32)
    lo = jnp.where(lens > 0, lo, jnp.uint32(0)).astype(jnp.uint32)

    base = (jnp.arange(nby, dtype=jnp.int32) * words_per_slice)[:, None]
    flat_hi_idx = (base + word_idx).reshape(-1)
    flat_lo_idx = (base + jnp.minimum(word_idx + 1, words_per_slice - 1)).reshape(-1)
    buf = jnp.zeros((nby * words_per_slice,), jnp.uint32)
    buf = buf.at[flat_hi_idx].add(hi.reshape(-1), mode="drop")
    buf = buf.at[flat_lo_idx].add(lo.reshape(-1), mode="drop")
    return PackedSlices(buf.reshape(nby, words_per_slice), nbits)


def words_per_slice_bound(nbx: int) -> int:
    """Hard upper bound on packed bits per slice: header 38 + worst-case symbols
    (every coefficient escaped at 24 bits)."""
    worst_mb = 6 + 11 + 11 + 9 + 6 * (24 + 63 * 24 + 2)
    bits = 38 + nbx * worst_mb
    return (bits + 31) // 32 + 1
