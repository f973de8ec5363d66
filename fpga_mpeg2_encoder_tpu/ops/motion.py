"""Motion estimation + prediction over the whole macroblock grid (stages X/Y/Z/F,
RTL/mpeg2encoder.v:1310-1918).

TPU-first design
----------------
The RTL searches one macroblock at a time with 169 parallel SAD accumulators; on TPU
all macroblocks of the frame run concurrently:

* full-pel: one batched SAD volume ((2YR+1)^2, nby, nbx) built from whole-frame
  shifted absolute differences + block reductions - pure VPU work, fused by XLA;
* argmin with the exact RTL tie-break (largest dy, then largest dx among minima,
  RTL:1694-1710) via an order-encoding key;
* half-pel: per-MB 18x18 window gather from the padded previous recon, four
  interpolated grids (full/H/V/HV), 9 candidate SADs, the exact
  find_min_in_10_values tournament (RTL:804-840) against the intra activity metric
  (f_Y_sum accumulation quirk included, RTL:1659-1662/1774-1791);
* prediction: luma from the selected half-pel grid, chroma via mv>>2 full-pel
  offset + (mv>>1)&1 half flags (RTL:1847-1917).

All arithmetic is integer-exact against the golden model.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .colorspace import mean2, mean4


class MotionResult(NamedTuple):
    inter: jnp.ndarray       # (nby, nbx) bool
    mvx: jnp.ndarray         # (nby, nbx) int32, half-pel units
    mvy: jnp.ndarray         # (nby, nbx) int32
    pred_y: jnp.ndarray      # (nby, nbx, 16, 16) int32
    pred_u: jnp.ndarray      # (nby, nbx, 8, 8) int32
    pred_v: jnp.ndarray      # (nby, nbx, 8, 8) int32


def _block_sum(x: jnp.ndarray, bs: int) -> jnp.ndarray:
    h, w = x.shape
    return x.reshape(h // bs, bs, w // bs, bs).sum(axis=(1, 3))


def _find_min_10(v: jnp.ndarray) -> jnp.ndarray:
    """Vectorised exact tournament of RTL:804-840.  v: (..., 10) int32 -> (...) index."""
    def pick(lo, hi):
        w = jnp.where(v[..., hi] < v[..., lo], v[..., hi], v[..., lo])
        i = jnp.where(v[..., hi] < v[..., lo], hi, lo)
        return w, i
    w01, i01 = pick(0, 1)
    w23, i23 = pick(2, 3)
    w45, i45 = pick(4, 5)
    w67, i67 = pick(6, 7)
    w89, i89 = pick(8, 9)
    x0123 = jnp.where(w23 < w01, w23, w01)
    i0123 = jnp.where(w23 < w01, i23, i01)
    x4567 = jnp.where(w67 < w45, w67, w45)
    i4567 = jnp.where(w67 < w45, i67, i45)
    left = jnp.where(x0123 < x4567, i0123, i4567)
    use89 = (w89 <= x0123) & (w89 <= x4567)
    return jnp.where(use89, i89, left)


def estimate_and_predict(
    cur_y: jnp.ndarray,        # (H, W) uint8 current luma
    cur_u: jnp.ndarray,        # (H/2, W/2) uint8
    cur_v: jnp.ndarray,
    prev_y: jnp.ndarray,       # previous recon planes, uint8
    prev_u: jnp.ndarray,
    prev_v: jnp.ndarray,
    is_iframe: jnp.ndarray,    # scalar bool (traced: one compiled program for I and P)
    yr: int,                   # static: luma search range
    ur: int,                   # static: chroma search range
) -> MotionResult:
    h, w = cur_y.shape
    nby, nbx = h // 16, w // 16
    pad = yr + 1
    cpad = ur + 1

    cy32 = cur_y.astype(jnp.int32)
    prevp = jnp.pad(prev_y, pad).astype(jnp.int32)

    # ---- full-pel SAD volume --------------------------------------------------
    sads = []
    for dy in range(-yr, yr + 1):
        for dx in range(-yr, yr + 1):
            win = jax.lax.dynamic_slice(prevp, (pad + dy, pad + dx), (h, w))
            sads.append(_block_sum(jnp.abs(cy32 - win), 16))
    sad = jnp.stack(sads)                                   # (169, nby, nbx)

    n = 2 * yr + 1
    dyi = (jnp.arange(n * n) // n) - yr
    dxi = (jnp.arange(n * n) % n) - yr
    col = jnp.arange(nbx)
    row = jnp.arange(nby)
    edge_l = (col == 0)[None, None, :]
    edge_r = (col == nbx - 1)[None, None, :]
    edge_t = (row == 0)[None, :, None]
    edge_b = (row == nby - 1)[None, :, None]
    neg_x = (dxi < 0)[:, None, None]
    pos_x = (dxi > 0)[:, None, None]
    neg_y = (dyi < 0)[:, None, None]
    pos_y = (dyi > 0)[:, None, None]
    invalid = (edge_l & neg_x) | (edge_r & pos_x) | (edge_t & neg_y) | (edge_b & pos_y)
    invalid = invalid | (sad > 4095)                        # 12-bit overflow (RTL:1670)

    # tie-break: min SAD, then largest dy, then largest dx == largest linear index
    big = jnp.int32(1 << 24)
    key = jnp.where(invalid, big, sad * (n * n) + (n * n - 1 - jnp.arange(n * n))[:, None, None])
    kmin = key.min(axis=0)
    lin = (n * n - 1) - (kmin % (n * n))
    center = yr * n + yr
    lin = jnp.where(kmin >= big, center, lin)               # all-invalid => mv (0,0)
    mvy_full = lin // n - yr                                # (nby, nbx)
    mvx_full = lin % n - yr

    # ---- intra activity metric (16-bit accumulator semantics) -----------------
    pixsum = _block_sum(cy32, 16)                           # (nby, nbx) <= 65280
    mean = (pixsum >> 8) & 0xFF
    blk = cy32.reshape(nby, 16, nbx, 16).transpose(0, 2, 1, 3)   # (nby, nbx, 16, 16)
    sad_mean = jnp.abs(blk - mean[:, :, None, None]).sum(axis=(2, 3))
    acc = (pixsum + sad_mean) & 0xFFFF
    intra_cost = jnp.where(acc < 4096, acc, 0xFFF)

    # ---- half-pel windows: per-MB 18x18 gather at the full-pel mv -------------
    by16 = (jnp.arange(nby) * 16)[:, None]
    bx16 = (jnp.arange(nbx) * 16)[None, :]
    r0 = by16 + mvy_full + pad - 1                          # (nby, nbx)
    c0 = bx16 + mvx_full + pad - 1
    rr = r0[:, :, None] + jnp.arange(18)[None, None, :]     # (nby, nbx, 18)
    cc = c0[:, :, None] + jnp.arange(18)[None, None, :]
    w18 = prevp[rr[:, :, :, None], cc[:, :, None, :]]      # (nby, nbx, 18, 18)

    full = w18                                              # even-even half coords
    hh = mean2(w18[..., :, :-1], w18[..., :, 1:])           # (.., 18, 17)
    vv = mean2(w18[..., :-1, :], w18[..., 1:, :])           # (.., 17, 18)
    m4 = mean4(w18[..., :-1, :-1], w18[..., :-1, 1:],
               w18[..., 1:, :-1], w18[..., 1:, 1:])         # (.., 17, 17)

    def cand_grid(hy: int, hx: int) -> jnp.ndarray:
        """16x16 sample grid of candidate (hy, hx) in half-pel offsets."""
        ry, rx = (hy + 1) >> 1, (hx + 1) >> 1               # slice starts for odd axes
        if hy == 0 and hx == 0:
            return full[..., 1:17, 1:17]
        if hy == 0:
            return hh[..., 1:17, rx:rx + 16]
        if hx == 0:
            return vv[..., ry:ry + 16, 1:17]
        return m4[..., ry:ry + 16, rx:rx + 16]

    grids = [cand_grid(hy, hx) for hy in (-1, 0, 1) for hx in (-1, 0, 1)]
    over = jnp.int32(0x1000)
    vals = []
    for i9, (hy, hx) in enumerate([(hy, hx) for hy in (-1, 0, 1) for hx in (-1, 0, 1)]):
        s = jnp.abs(blk - grids[i9]).sum(axis=(2, 3))
        bad = jnp.zeros((nby, nbx), bool)
        if hx < 0:
            bad |= edge_l[0] | (mvx_full == -yr)
        if hx > 0:
            bad |= edge_r[0] | (mvx_full == yr)
        if hy < 0:
            bad |= edge_t[0] | (mvy_full == -yr)
        if hy > 0:
            bad |= edge_b[0] | (mvy_full == yr)
        vals.append(jnp.where(bad | (s > 4095), over, s))
    vals.append(intra_cost)
    idx = _find_min_10(jnp.stack(vals, axis=-1))            # (nby, nbx) in 0..9

    inter = (idx != 9) & jnp.logical_not(is_iframe)
    hy_sel = jnp.where(idx == 9, 0, idx // 3 - 1)
    hx_sel = jnp.where(idx == 9, 0, idx % 3 - 1)
    # P-frame: mv registers always updated even when intra wins (RTL:1827-1828);
    # I-frame: forced zero (RTL:1820-1825).
    mvy = jnp.where(is_iframe, 0, (mvy_full << 1) + hy_sel)
    mvx = jnp.where(is_iframe, 0, (mvx_full << 1) + hx_sel)

    # ---- luma prediction: selected half-pel grid, or 128 for intra ------------
    pred_y = jnp.full((nby, nbx, 16, 16), 128, jnp.int32)
    for i9 in range(9):
        pred_y = jnp.where((inter & (idx == i9))[:, :, None, None], grids[i9], pred_y)

    # ---- chroma prediction -----------------------------------------------------
    cfy, cfx = mvy >> 2, mvx >> 2                           # full-pel chroma offset
    chy, chx = (mvy >> 1) & 1, (mvx >> 1) & 1
    pup = jnp.pad(prev_u, cpad).astype(jnp.int32)
    pvp = jnp.pad(prev_v, cpad).astype(jnp.int32)
    cr0 = (jnp.arange(nby) * 8)[:, None] + cfy + cpad
    cc0 = (jnp.arange(nbx) * 8)[None, :] + cfx + cpad
    crr = cr0[:, :, None] + jnp.arange(9)[None, None, :]
    ccc = cc0[:, :, None] + jnp.arange(9)[None, None, :]

    def chroma_pred(plane_pad: jnp.ndarray) -> jnp.ndarray:
        w9 = plane_pad[crr[:, :, :, None], ccc[:, :, None, :]]          # (nby,nbx,9,9)
        p00 = w9[..., :8, :8]
        ph = mean2(w9[..., :8, :8], w9[..., :8, 1:9])
        pv = mean2(w9[..., :8, :8], w9[..., 1:9, :8])
        pm = mean4(w9[..., :8, :8], w9[..., :8, 1:9], w9[..., 1:9, :8], w9[..., 1:9, 1:9])
        hyb = chy[:, :, None, None].astype(bool)
        hxb = chx[:, :, None, None].astype(bool)
        p = jnp.where(hyb & hxb, pm, jnp.where(hxb, ph, jnp.where(hyb, pv, p00)))
        return jnp.where(inter[:, :, None, None], p, 128)

    return MotionResult(inter, mvx, mvy, pred_y, chroma_pred(pup), chroma_pred(pvp))
