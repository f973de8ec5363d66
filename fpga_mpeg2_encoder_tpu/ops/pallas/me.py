"""Pallas TPU kernel: fully fused motion estimation (stages X/Y/Z/F,
RTL/mpeg2encoder.v:1310-1918) - SAD volume, argmin, recentering, half-pel
refinement, inter/intra decision and luma prediction in ONE VMEM-resident
kernel per strip of macroblock rows.

The XLA formulation (ops/motion.py) materialises the SAD volume, the
recentered windows, four interpolation grids and nine candidate diffs in HBM
(~1 GB/frame at 1080p).  Here everything after the strip load stays in VMEM;
HBM sees only the strip reads and the prediction/motion-vector writes - the
TPU analog of the RTL's fully on-chip stage-F datapath (BRAM window registers
and 169 SAD accumulators, RTL:1650-1691).

Per-macroblock data lives in two vector spaces that the MXU converts between:
* LANE space (one lane per pixel column): diffs, windows, predictions;
* MB space (one lane per macroblock): SADs, motion vectors, decisions;
reductions ride a 0/1 block-diagonal matrix (exact: operands <= 255 in bf16
byte planes, f32 accumulation), broadcasts ride its transpose.

Segment folding (small-geometry lane occupancy)
-----------------------------------------------
One grid step processes G macroblock rows side by side: MB row s maps to
folded row s // G, horizontal segment s % G.  Each segment has its own +-yr
column pad, so every lane's window read stays inside its segment and the
per-lane roll arithmetic is uniform - the kernel body is identical for any G.
G = min(128 // nbx, nby), so a 352-wide frame (nbx=22) packs 5 MB rows per
strip (110/128 lanes) instead of wasting 83% of the vector unit; 1920-wide
frames keep G=1 (120/128).  MB lane l = (l // nbx)-th segment, column
l % nbx; frame-edge masks are per-lane constants.

Exactness contract (all bit-exact vs the golden model / XLA path):
* 12-bit SAD overflow masking (RTL:1670) and frame-edge candidate masking;
* argmin tie-break: largest dy then largest dx among minima (RTL:1694-1710),
  encoded in a single min-reduce key;
* the f_Y_sum accumulation quirk in the intra activity metric
  (RTL:1659-1662/1774-1791): acc = (pixsum + sad_mean) & 0xFFFF;
* the asymmetric find_min_in_10_values tournament (RTL:804-840);
* mv registers update even when intra wins on P-frames (RTL:1827-1828),
  I-frames force intra with mv = 0 (RTL:1820-1825).

Per-lane dynamic shifts: column recentering selects among 13 statically
rolled copies of the raw window (selects are evaluated per DESTINATION lane,
so data crossing macroblock boundaries keeps a consistent shift); the row
shift never moves data across lanes, so it uses a log-barrel of sublane
slices (4 selects instead of 13).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Set True (tests only) to run the kernels via the Pallas CPU interpreter -
# gives the CPU suite real coverage of the kernel bodies (ADVICE round 2).
_INTERPRET = False


def _barrel_stages(rng: int):
    stages, rem = [], 2 * rng
    while rem > 0:
        s = (rem + 1) // 2
        stages.append(s)
        rem -= s
    return stages


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _geom(w: int, h: int, yr: int) -> Tuple[int, int, int, int, int]:
    """(G, sw, wt, nbx, nbyf): segments per strip, segment stride (pixels),
    padded total lane width, MBs per segment, folded strip count."""
    nbx, nby = w // 16, h // 16
    g = max(1, min(128 // nbx, nby))
    sw = w + 2 * yr
    wt = _pad128(g * sw)
    nbyf = -(-nby // g)
    return g, sw, wt, nbx, nbyf


def _me_body(yr: int, w: int, sw: int, g: int, nbx: int, nby: int, wt: int,
             magic: int, magicb: int,
             cur_ref, p0_ref, p1_ref, p2_ref, b_ref, bt_ref, scal_ref,
             pred_ref, meta_ref, rs_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 2 * yr + 1
    nn = n * n
    by = pl.program_id(0)
    c16 = cur_ref[...]                                        # (16, WT) int32
    win = jnp.concatenate([p0_ref[...], p1_ref[...], p2_ref[...]], axis=0)
    b = b_ref[...].astype(jnp.bfloat16)                       # (WT, 128)
    bt = bt_ref[...].astype(jnp.bfloat16)                     # (128, WT)
    iframe = scal_ref[0, 0]
    first_row = scal_ref[0, 1]    # global MB row of local row 0 (sharding)
    tot_rows = scal_ref[0, 2]     # global MB row count

    # per-MB-lane maps: segment g_l = lane // nbx (exact magic-multiply
    # division, verified statically in the wrapper), MB column bx_l
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    g_l = (lane * magicb) >> 15
    bx_l = lane - g_l * nbx
    s_l = by * g + g_l                                        # local MB row
    dead = (lane >= g * nbx) | (s_l >= nby)
    edge_l = bx_l == 0
    edge_r = bx_l == nbx - 1
    edge_t = first_row + s_l == 0                 # GLOBAL frame edges, so
    edge_b = first_row + s_l == tot_rows - 1      # shard seams aren't edges

    def reduce_mb(rows):
        """(K, WT) col sums <= 4080 -> (K, 128) exact block sums (byte-split
        bf16 matmul, f32 accumulation; values < 2**24)."""
        lo = (rows & 255).astype(jnp.float32).astype(jnp.bfloat16)
        hi = (rows >> 8).astype(jnp.float32).astype(jnp.bfloat16)
        s_lo = jnp.dot(lo, b, preferred_element_type=jnp.float32)
        s_hi = jnp.dot(hi, b, preferred_element_type=jnp.float32)
        return s_hi.astype(jnp.int32) * 256 + s_lo.astype(jnp.int32)

    def bcast_lanes(rows_mb):
        """(K, 128) small nonneg ints (<= 255) -> (K, WT) per-MB broadcast."""
        v = rows_mb.astype(jnp.float32).astype(jnp.bfloat16)
        return jnp.dot(v, bt, preferred_element_type=jnp.float32).astype(jnp.int32)

    # ---- full-pel SAD volume + pixel-sum row (RTL CALC_DIFF, :1650-1672) ----
    # lane k*sw + c holds cur col c of segment k; win data sits at +yr, so a
    # left-roll by (yr + dx) aligns prev col c+dx under cur col c - reads stay
    # inside the segment's own +-yr pad for every candidate.
    for dx in range(-yr, yr + 1):
        shifted = pltpu.roll(win, shift=(wt - (yr + dx)) % wt, axis=1)
        for dy in range(-yr, yr + 1):
            x = c16 - shifted[16 + dy:32 + dy, :]
            d = jnp.abs(x)
            rs_ref[(dy + yr) * n + (dx + yr), :] = jnp.sum(d, axis=0)
    rs_ref[nn, :] = jnp.sum(c16, axis=0)                      # pixel sums
    nout = rs_ref.shape[0]
    for k in range(nn + 1, nout):
        rs_ref[k, :] = jnp.zeros((wt,), jnp.int32)
    sadv = reduce_mb(rs_ref[...])                             # (nout, 128)

    # ---- argmin with the RTL tie-break (largest dy, then dx; :1694-1710) ----
    row = jax.lax.broadcasted_iota(jnp.int32, (nout, 128), 0)
    dyi = (row * magic) >> 15                                 # row // n
    dxi = row - dyi * n                                       # row % n
    invalid = (row >= nn) | (sadv > 4095) | dead \
        | (edge_l & (dxi < yr)) | (edge_r & (dxi > yr)) \
        | ((dyi < yr) & edge_t) | ((dyi > yr) & edge_b)
    big = jnp.int32(1 << 24)
    key = jnp.where(invalid, big, sadv * 256 + (255 - row))
    kmin = jnp.min(key, axis=0, keepdims=True)                # (1, 128)
    lin = 255 - (kmin & 255)
    lin = jnp.where(kmin >= big, yr * n + yr, lin)            # all invalid -> 0,0
    mvy_full = ((lin * magic) >> 15) - yr                     # (1, 128)
    mvx_full = lin - (((lin * magic) >> 15) * n) - yr

    pixsum = sadv[nn:nn + 1, :]                               # (1, 128)
    mean = (pixsum >> 8) & 0xFF

    # ---- per-lane maps (one broadcast matmul) -------------------------------
    maps = bcast_lanes(jnp.concatenate(
        [mvx_full + yr, mvy_full + yr, mean], axis=0))        # (3, WT)
    mvxl = maps[0:1, :]
    mvyl = maps[1:2, :]
    meanl = maps[2:3, :]

    # ---- recentering: window at each MB's own full-pel mv -------------------
    # rows needed: win[16 + mvy - 1 + r] for r in [0, 18); col shift first
    # (from the unshifted window, so boundary-crossing lanes stay consistent),
    # then a per-lane row log-barrel (row shifts never cross lanes).
    win30 = win[16 - yr - 1:16 + yr + 18 - 1, :]              # rows mvy-1+r, all mvy
    colm1 = jnp.zeros_like(win30)
    col0 = jnp.zeros_like(win30)
    colp1 = jnp.zeros_like(win30)
    for dx in range(-yr, yr + 1):
        mask = mvxl == (dx + yr)                              # (1, WT)
        r0 = pltpu.roll(win30, shift=(wt - (yr + dx)) % wt, axis=1)
        rm1 = pltpu.roll(win30, shift=(wt - (yr + dx - 1)) % wt, axis=1)
        rp1 = pltpu.roll(win30, shift=(wt - (yr + dx + 1)) % wt, axis=1)
        colm1 = jnp.where(mask, rm1, colm1)
        col0 = jnp.where(mask, r0, col0)
        colp1 = jnp.where(mask, rp1, colp1)

    def row_align(cw):
        h = 18 + 2 * yr
        curw = cw
        rem = mvyl
        for s in _barrel_stages(yr):
            h -= s
            curw = jnp.where(rem >= s, curw[s:s + h, :], curw[:h, :])
            rem = rem - jnp.where(rem >= s, s, 0)
        return curw                                           # (18, WT)

    recm1 = row_align(colm1)
    rec0 = row_align(col0)
    recp1 = row_align(colp1)

    def m2(a, bb):
        return (1 + a + bb) >> 1

    def m4(a, bb, c, d):
        return (1 + a + bb + c + d) >> 2

    # ---- 9 half-pel candidates (RTL:1743-1804) ------------------------------
    cands = []
    for hy in (-1, 0, 1):
        ry = (hy + 1) >> 1
        for hx in (-1, 0, 1):
            if hy == 0 and hx == 0:
                g_ = rec0[1:17, :]
            elif hy == 0:
                a, bb = (recm1, rec0) if hx < 0 else (rec0, recp1)
                g_ = m2(a[1:17, :], bb[1:17, :])
            elif hx == 0:
                g_ = m2(rec0[ry:ry + 16, :], rec0[ry + 1:ry + 17, :])
            else:
                a, bb = (recm1, rec0) if hx < 0 else (rec0, recp1)
                g_ = m4(a[ry:ry + 16, :], bb[ry:ry + 16, :],
                        a[ry + 1:ry + 17, :], bb[ry + 1:ry + 17, :])
            cands.append(g_)

    rs2 = jnp.concatenate(
        [jnp.sum(jnp.abs(c16 - g_), axis=0, keepdims=True) for g_ in cands]
        + [jnp.sum(jnp.abs(c16 - meanl), axis=0, keepdims=True),
           jnp.zeros((16 - 10, wt), jnp.int32)], axis=0)      # (16, WT)
    hsad = reduce_mb(rs2)                                     # (16, 128)

    # ---- candidate masking + intra metric (f_Y_sum quirk) -------------------
    over = jnp.int32(0x1000)
    vals = []
    for i9, (hy, hx) in enumerate([(hy, hx) for hy in (-1, 0, 1)
                                   for hx in (-1, 0, 1)]):
        s = hsad[i9:i9 + 1, :]
        bad = jnp.zeros((1, 128), jnp.bool_)
        if hx < 0:
            bad = bad | edge_l | (mvx_full == -yr)
        if hx > 0:
            bad = bad | edge_r | (mvx_full == yr)
        if hy < 0:
            bad = bad | (mvy_full == -yr) | edge_t
        if hy > 0:
            bad = bad | (mvy_full == yr) | edge_b
        vals.append(jnp.where(bad | (s > 4095), over, s))
    sad_mean = hsad[9:10, :]
    acc = (pixsum + sad_mean) & 0xFFFF
    vals.append(jnp.where(acc < 4096, acc, jnp.int32(0xFFF)))

    # ---- find_min_in_10_values tournament (RTL:804-840) ---------------------
    def pick(lo, hi):
        w_ = jnp.where(vals[hi] < vals[lo], vals[hi], vals[lo])
        i_ = jnp.where(vals[hi] < vals[lo], hi, lo)
        return w_, i_
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
    idx = jnp.where(use89, i89, left)                         # (1, 128)

    inter = (idx != 9) & (iframe == 0)
    div3 = (idx * 86) >> 8
    hy_sel = jnp.where(idx == 9, 0, div3 - 1)
    hx_sel = jnp.where(idx == 9, 0, idx - div3 * 3 - 1)
    mvy = jnp.where(iframe != 0, 0, (mvy_full * 2) + hy_sel)
    mvx = jnp.where(iframe != 0, 0, (mvx_full * 2) + hx_sel)

    # ---- luma prediction: selected candidate grid or 128 --------------------
    sel = bcast_lanes(jnp.concatenate(
        [idx, inter.astype(jnp.int32)], axis=0))              # (2, WT)
    idxl, interl = sel[0:1, :], sel[1:2, :]
    pred = jnp.full((16, wt), 128, jnp.int32)
    for i9 in range(9):
        pred = jnp.where((interl > 0) & (idxl == i9), cands[i9], pred)
    pred_ref[...] = pred

    meta = jnp.concatenate(
        [mvx, mvy, inter.astype(jnp.int32),
         jnp.zeros((5, 128), jnp.int32)], axis=0)             # (8, 128)
    meta_ref[0] = meta
    return mvx, mvy, inter


def _kernel(yr, w, sw, g, nbx, nby, wt, magic, magicb,
            cur_ref, p0_ref, p1_ref, p2_ref, b_ref, bt_ref, scal_ref,
            pred_ref, meta_ref, rs_ref):
    _me_body(yr, w, sw, g, nbx, nby, wt, magic, magicb,
             cur_ref, p0_ref, p1_ref, p2_ref, b_ref, bt_ref, scal_ref,
             pred_ref, meta_ref, rs_ref)


def _chroma_predict(ur: int, wt: int, cfxl, cfyl, chxl, chyl, interl, w16):
    """Shared chroma-prediction body (RTL:1847-1917): w16 (16, WT) window
    strip (prev rows 8s-4 .. 8s+12 per segment, data at column offset +4),
    per-lane maps cfx+ur / cfy+ur / half flags / inter -> (8, WT) prediction.
    Used by both the standalone chroma kernel and the fused ME kernel."""
    from jax.experimental.pallas import tpu as pltpu

    # per-lane column select from the unshifted window (consistent shifts
    # across MB boundaries), then a per-lane row barrel.  Window data sits
    # at +4 within each segment, so a left-roll by (4 + dx) aligns prev
    # col c+dx under lane c - reads stay inside the segment's 4-col pads.
    r0 = jnp.zeros_like(w16)
    rp1 = jnp.zeros_like(w16)
    for dx in range(-ur, ur + 1):
        mask = cfxl == (dx + ur)
        r0 = jnp.where(mask,
                       pltpu.roll(w16, shift=(wt - (4 + dx)) % wt,
                                  axis=1), r0)
        rp1 = jnp.where(mask,
                        pltpu.roll(w16, shift=(wt - (4 + dx + 1)) % wt,
                                   axis=1), rp1)
    # rows: w16 row r holds prev row 8*s + r - 4 (4-row halo pad); the
    # window needs prev rows [8*s + cfy, +10) for the +1 interp row:
    # base slice [4 - ur : 4 + ur + 9), then barrel by cfy + ur
    h = 9 + 2 * ur

    def row_align(x):
        cur = x[4 - ur:4 + ur + 9, :]
        rem = cfyl
        hh = h
        for s in _barrel_stages(ur):
            hh -= s
            cur = jnp.where(rem >= s, cur[s:s + hh, :], cur[:hh, :])
            rem = rem - jnp.where(rem >= s, s, 0)
        return cur                                            # (9, WT)

    a0 = row_align(r0)
    a1 = row_align(rp1)
    p00 = a0[0:8, :]
    ph = (1 + a0[0:8, :] + a1[0:8, :]) >> 1
    pv_ = (1 + a0[0:8, :] + a0[1:9, :]) >> 1
    pm = (1 + a0[0:8, :] + a1[0:8, :] + a0[1:9, :] + a1[1:9, :]) >> 2
    hxb = chxl > 0
    hyb = chyl > 0
    p = jnp.where(hyb & hxb, pm,
                  jnp.where(hxb, ph, jnp.where(hyb, pv_, p00)))
    return jnp.where(interl > 0, p, jnp.int32(128))


def _kernel_fused(yr, ur, w, sw, g, nbx, nby, wt, magic, magicb, wtc,
                  cur_ref, p0_ref, p1_ref, p2_ref, b_ref, bt_ref, scal_ref,
                  u0_ref, u1_ref, v0_ref, v1_ref, btc_ref,
                  pred_ref, meta_ref, pu_ref, pv_ref, rs_ref):
    """Luma ME + chroma prediction in ONE kernel launch: the RTL computes
    both in the same stage-F pipeline pass (RTL:1650-1918); fusing here
    removes a kernel launch plus the mv/inter HBM round trip per strip -
    the mv maps feed the chroma barrel straight from registers."""
    mvx, mvy, inter = _me_body(
        yr, w, sw, g, nbx, nby, wt, magic, magicb,
        cur_ref, p0_ref, p1_ref, p2_ref, b_ref, bt_ref, scal_ref,
        pred_ref, meta_ref, rs_ref)

    btc = btc_ref[...].astype(jnp.bfloat16)                   # (128, WTC)
    rows = jnp.concatenate(
        [(mvx >> 2) + ur, (mvy >> 2) + ur,
         (mvx >> 1) & 1, (mvy >> 1) & 1,
         inter.astype(jnp.int32)], axis=0)                    # (5, 128) >= 0
    v = rows.astype(jnp.float32).astype(jnp.bfloat16)
    maps = jnp.dot(v, btc, preferred_element_type=jnp.float32).astype(jnp.int32)
    cfxl, cfyl, chxl, chyl, interl = (maps[k:k + 1, :] for k in range(5))
    wu = jnp.concatenate([u0_ref[...], u1_ref[...]], axis=0)  # (16, WTC)
    wv = jnp.concatenate([v0_ref[...], v1_ref[...]], axis=0)
    pu_ref[...] = _chroma_predict(ur, wtc, cfxl, cfyl, chxl, chyl, interl, wu)
    pv_ref[...] = _chroma_predict(ur, wtc, cfxl, cfyl, chxl, chyl, interl, wv)


def _fold_strips(x: jnp.ndarray, rows: int, g: int, nbyf: int, sw: int,
                 wt: int, col_off: int) -> jnp.ndarray:
    """(nstrips*rows, w') plane -> folded (nbyf*rows, WT): strip s lands at
    folded row s // g, columns [ (s % g)*sw + col_off, +w' ).  Strips beyond
    the input are zero."""
    nstr, w_ = x.shape[0] // rows, x.shape[1]
    if nstr > nbyf * g:
        x = x[: nbyf * g * rows]
    else:
        x = jnp.pad(x, ((0, (nbyf * g - nstr) * rows), (0, 0)))
    f = x.reshape(nbyf, g, rows, w_).transpose(0, 2, 1, 3)    # (nbyf,rows,g,w')
    f = jnp.pad(f, ((0, 0), (0, 0), (0, 0),
                    (col_off, sw - w_ - col_off)))            # (nbyf,rows,g,sw)
    f = f.reshape(nbyf * rows, g * sw)
    return jnp.pad(f, ((0, 0), (0, wt - g * sw)))


def _unfold_strips(x: jnp.ndarray, rows: int, g: int, nstr: int, sw: int,
                   w_: int) -> jnp.ndarray:
    """Inverse of _fold_strips (data at column offset 0): -> (nstr*rows, w_)."""
    nbyf = x.shape[0] // rows
    f = x[:, :g * sw].reshape(nbyf, rows, g, sw)[:, :, :, :w_]
    return f.transpose(0, 2, 1, 3).reshape(nbyf * g * rows, w_)[:nstr * rows]


@functools.partial(jax.jit, static_argnames=("yr", "halo", "as_plane"))
def motion_estimate_pallas(cur_y: jnp.ndarray, prev_y: jnp.ndarray,
                           is_iframe: jnp.ndarray, yr: int,
                           first_mb_row=None, total_mb_rows=None,
                           halo: bool = False, as_plane: bool = False,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray]:
    """Fused luma motion estimation + prediction for one frame or one
    slice-row band.

    cur_y (H, W) uint8; prev_y (H, W) uint8, or (H + 16, W) with an 8-row
    reconstruction halo each side when ``halo=True`` (the sharded band form,
    matching ops/motion.estimate_and_predict_local); is_iframe traced bool ->
    (inter (nby, nbx) bool, mvx, mvy (nby, nbx) int32 half-pel,
    pred_y (nby, nbx, 16, 16) int32).  first_mb_row/total_mb_rows (traced)
    give the band's global position so frame-edge masking ignores shard
    seams.  Bit-exact vs ops/motion.py's XLA path.  Requires nbx <= 128
    (true up to the 2048-wide max geometry)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur_y.shape
    nby, nbx = h // 16, w // 16
    n = 2 * yr + 1
    g, sw, wt, _, nbyf = _geom(w, h, yr)
    nout = -(-(n * n + 1) // 8) * 8
    magic = -(-(1 << 15) // n)                # x//n == (x*magic)>>15 on the
    for x in range(max(nout, 256)):           # domain we use; verify statically
        assert (x * magic) >> 15 == x // n, (n, x)
    magicb = -(-(1 << 15) // nbx)             # lane // nbx for lane < 128
    for x in range(128):
        assert (x * magicb) >> 15 == x // nbx, (nbx, x)
    if first_mb_row is None:
        first_mb_row = jnp.int32(0)
    if total_mb_rows is None:
        total_mb_rows = jnp.int32(nby)

    curf = _fold_strips(cur_y.astype(jnp.int32), 16, g, nbyf, sw, wt, 0)
    # the kernel reads 16-row strips above/below each MB row but only uses
    # yr + 1 <= 7 of them, so an 8-row halo (sharded form) is enough
    pad_v = 8 if halo else 16
    prev_p = jnp.pad(prev_y, ((pad_v, pad_v), (0, 0))).astype(jnp.int32)
    p0 = _fold_strips(prev_p[0:], 16, g, nbyf, sw, wt, yr)
    p1 = _fold_strips(prev_p[16:], 16, g, nbyf, sw, wt, yr)
    p2 = _fold_strips(prev_p[32:], 16, g, nbyf, sw, wt, yr)
    scal = jnp.stack([jnp.asarray(is_iframe, jnp.int32),
                      jnp.asarray(first_mb_row, jnp.int32),
                      jnp.asarray(total_mb_rows, jnp.int32),
                      jnp.int32(0)]).reshape(1, 4)

    pred, meta = pl.pallas_call(
        functools.partial(_kernel, yr, w, sw, g, nbx, nby, wt, magic, magicb),
        grid=(nbyf,),
        in_specs=[
            pl.BlockSpec((16, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wt, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, wt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbyf * 16, wt), jnp.int32),
            jax.ShapeDtypeStruct((nbyf, 8, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nout, wt), jnp.int32)],
        interpret=_INTERPRET,
    )(curf, p0, p1, p2, _reduce_matrix(wt, w, sw, g, nbx),
      _bcast_matrix(wt, w, sw, g, nbx), scal)

    pred_full = _unfold_strips(pred, 16, g, nby, sw, w)       # (nby*16, w)
    if as_plane:
        pred_y = pred_full               # strip plane (H, W) - transform-kernel form
    else:
        pred_y = pred_full.reshape(nby, 16, nbx, 16).transpose(0, 2, 1, 3)

    def unfold_mb(row):
        return row[:, :g * nbx].reshape(nbyf * g, nbx)[:nby]
    mvx = unfold_mb(meta[:, 0])
    mvy = unfold_mb(meta[:, 1])
    inter = unfold_mb(meta[:, 2]) != 0
    return inter, mvx, mvy, pred_y


@functools.partial(jax.jit,
                   static_argnames=("yr", "ur", "halo", "as_plane"))
def motion_estimate_fused_pallas(
        cur_y: jnp.ndarray, prev_y: jnp.ndarray,
        prev_u: jnp.ndarray, prev_v: jnp.ndarray,
        is_iframe: jnp.ndarray, yr: int, ur: int,
        first_mb_row=None, total_mb_rows=None,
        halo: bool = False, as_plane: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray, jnp.ndarray]:
    """Luma ME + prediction + CHROMA prediction in one kernel launch
    (RTL:1310-1918, the full stage-F datapath): one launch per frame step
    instead of two, and the mv/inter MB maps never round-trip through HBM.

    Args as motion_estimate_pallas, plus prev_u/prev_v ((H/2, W/2) uint8, or
    (H/2 + 8, W/2) with a 4-row halo each side when ``halo=True``).  Returns
    (inter, mvx, mvy, pred_y, pred_u, pred_v) - bit-exact vs the XLA path and
    vs the split motion_estimate_pallas + chroma_pred_pallas pair."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur_y.shape
    nby, nbx = h // 16, w // 16
    n = 2 * yr + 1
    g, sw, wt, _, nbyf = _geom(w, h, yr)
    nout = -(-(n * n + 1) // 8) * 8
    magic = -(-(1 << 15) // n)
    for x in range(max(nout, 256)):
        assert (x * magic) >> 15 == x // n, (n, x)
    magicb = -(-(1 << 15) // nbx)
    for x in range(128):
        assert (x * magicb) >> 15 == x // nbx, (nbx, x)
    if first_mb_row is None:
        first_mb_row = jnp.int32(0)
    if total_mb_rows is None:
        total_mb_rows = jnp.int32(nby)

    curf = _fold_strips(cur_y.astype(jnp.int32), 16, g, nbyf, sw, wt, 0)
    pad_v = 8 if halo else 16
    prev_p = jnp.pad(prev_y, ((pad_v, pad_v), (0, 0))).astype(jnp.int32)
    p0 = _fold_strips(prev_p[0:], 16, g, nbyf, sw, wt, yr)
    p1 = _fold_strips(prev_p[16:], 16, g, nbyf, sw, wt, yr)
    p2 = _fold_strips(prev_p[32:], 16, g, nbyf, sw, wt, yr)
    scal = jnp.stack([jnp.asarray(is_iframe, jnp.int32),
                      jnp.asarray(first_mb_row, jnp.int32),
                      jnp.asarray(total_mb_rows, jnp.int32),
                      jnp.int32(0)]).reshape(1, 4)

    # chroma windows: same G-segment folding at half resolution
    wcr = w // 2
    swc = wcr + 8
    wtc = _pad128(g * swc)
    if halo:
        pu_p = prev_u.astype(jnp.int32)
        pv_p = prev_v.astype(jnp.int32)
    else:
        pu_p = jnp.pad(prev_u, ((4, 4), (0, 0))).astype(jnp.int32)
        pv_p = jnp.pad(prev_v, ((4, 4), (0, 0))).astype(jnp.int32)
    u0 = _fold_strips(pu_p[0:], 8, g, nbyf, swc, wtc, 4)
    u1 = _fold_strips(pu_p[8:], 8, g, nbyf, swc, wtc, 4)
    v0 = _fold_strips(pv_p[0:], 8, g, nbyf, swc, wtc, 4)
    v1 = _fold_strips(pv_p[8:], 8, g, nbyf, swc, wtc, 4)

    vspec16 = pl.BlockSpec((16, wt), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec8 = pl.BlockSpec((8, wtc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pred, meta, pred_u, pred_v = pl.pallas_call(
        functools.partial(_kernel_fused, yr, ur, w, sw, g, nbx, nby, wt,
                          magic, magicb, wtc),
        grid=(nbyf,),
        in_specs=[
            vspec16, vspec16, vspec16, vspec16,
            pl.BlockSpec((wt, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, wt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            cspec8, cspec8, cspec8, cspec8,
            pl.BlockSpec((128, wtc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            vspec16,
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec8, cspec8,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbyf * 16, wt), jnp.int32),
            jax.ShapeDtypeStruct((nbyf, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nbyf * 8, wtc), jnp.int32),
            jax.ShapeDtypeStruct((nbyf * 8, wtc), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nout, wt), jnp.int32)],
        interpret=_INTERPRET,
    )(curf, p0, p1, p2, _reduce_matrix(wt, w, sw, g, nbx),
      _bcast_matrix(wt, w, sw, g, nbx), scal,
      u0, u1, v0, v1, _bcast_matrix_c(wtc, wcr, swc, g, nbx))

    pred_full = _unfold_strips(pred, 16, g, nby, sw, w)       # (nby*16, w)
    if as_plane:
        pred_y = pred_full
    else:
        pred_y = pred_full.reshape(nby, 16, nbx, 16).transpose(0, 2, 1, 3)

    def foldc(p):
        full = _unfold_strips(p, 8, g, nby, swc, wcr)         # (nby*8, wc)
        if as_plane:
            return full
        return full.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)

    def unfold_mb(row):
        return row[:, :g * nbx].reshape(nbyf * g, nbx)[:nby]
    mvx = unfold_mb(meta[:, 0])
    mvy = unfold_mb(meta[:, 1])
    inter = unfold_mb(meta[:, 2]) != 0
    return inter, mvx, mvy, pred_y, foldc(pred_u), foldc(pred_v)


def _chroma_kernel(ur: int, wc: int, swc: int, g: int, nbx: int, wt: int,
                   p0u_ref, p1u_ref, p0v_ref, p1v_ref, bt_ref, meta_ref,
                   pu_ref, pv_ref):
    bt = bt_ref[...].astype(jnp.bfloat16)                     # (128, WT)
    meta = meta_ref[0]                                        # (8, 128) int32
    mvx, mvy, inter = meta[0:1, :], meta[1:2, :], meta[2:3, :]
    cfx, cfy = mvx >> 2, mvy >> 2                             # in [-ur, ur]
    chx, chy = (mvx >> 1) & 1, (mvy >> 1) & 1
    rows = jnp.concatenate(
        [cfx + ur, cfy + ur, chx, chy, inter], axis=0)        # (5, 128) >= 0
    v = rows.astype(jnp.float32).astype(jnp.bfloat16)
    maps = jnp.dot(v, bt, preferred_element_type=jnp.float32).astype(jnp.int32)
    cfxl, cfyl, chxl, chyl, interl = (maps[k:k + 1, :] for k in range(5))

    wu = jnp.concatenate([p0u_ref[...], p1u_ref[...]], axis=0)  # (16, WT)
    wv = jnp.concatenate([p0v_ref[...], p1v_ref[...]], axis=0)
    pu_ref[...] = _chroma_predict(ur, wt, cfxl, cfyl, chxl, chyl, interl, wu)
    pv_ref[...] = _chroma_predict(ur, wt, cfxl, cfyl, chxl, chyl, interl, wv)


def chroma_pred_pallas(prev_u: jnp.ndarray, prev_v: jnp.ndarray,
                       inter: jnp.ndarray, mvx: jnp.ndarray, mvy: jnp.ndarray,
                       ur: int, halo: bool = False, as_plane: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chroma prediction (RTL:1847-1917) as one VMEM-resident kernel per
    folded 8-row chroma strip: prev_u/prev_v (H/2, W/2) uint8 - or
    (H/2 + 8, W/2) with a 4-row halo each side when ``halo=True`` (sharded
    band form) - plus per-MB mv/inter -> (nby, nbx, 8, 8) int32 predictions
    x2.  Bit-exact vs ops/motion's XLA _chroma_pred.  Uses the same G-segment
    folding as the luma kernel so MB lanes line up across the two."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hc, wcr = prev_u.shape
    if halo:
        hc -= 8
    nby, nbx = hc // 8, wcr // 8
    g, _, _, _, nbyf = _geom(wcr * 2, hc * 2, 1)              # G from luma geom
    swc = wcr + 8
    wt = _pad128(g * swc)

    if halo:
        pu_p = prev_u.astype(jnp.int32)
        pv_p = prev_v.astype(jnp.int32)
    else:
        pu_p = jnp.pad(prev_u, ((4, 4), (0, 0))).astype(jnp.int32)
        pv_p = jnp.pad(prev_v, ((4, 4), (0, 0))).astype(jnp.int32)
    u0 = _fold_strips(pu_p[0:], 8, g, nbyf, swc, wt, 4)
    u1 = _fold_strips(pu_p[8:], 8, g, nbyf, swc, wt, 4)
    v0 = _fold_strips(pv_p[0:], 8, g, nbyf, swc, wt, 4)
    v1 = _fold_strips(pv_p[8:], 8, g, nbyf, swc, wt, 4)

    meta = jnp.zeros((nbyf, 8, 128), jnp.int32)
    mvf = jnp.pad(mvx, ((0, nbyf * g - nby), (0, 0))).reshape(nbyf, g * nbx)
    mvyf = jnp.pad(mvy, ((0, nbyf * g - nby), (0, 0))).reshape(nbyf, g * nbx)
    intf = jnp.pad(inter.astype(jnp.int32),
                   ((0, nbyf * g - nby), (0, 0))).reshape(nbyf, g * nbx)
    meta = meta.at[:, 0, :g * nbx].set(mvf).at[:, 1, :g * nbx].set(mvyf) \
        .at[:, 2, :g * nbx].set(intf)

    pred_u, pred_v = pl.pallas_call(
        functools.partial(_chroma_kernel, ur, wcr, swc, g, nbx, wt),
        grid=(nbyf,),
        in_specs=[
            pl.BlockSpec((8, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, wt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbyf * 8, wt), jnp.int32),
            jax.ShapeDtypeStruct((nbyf * 8, wt), jnp.int32),
        ],
        interpret=_INTERPRET,
    )(u0, u1, v0, v1, _bcast_matrix_c(wt, wcr, swc, g, nbx), meta)

    def fold(p):
        full = _unfold_strips(p, 8, g, nby, swc, wcr)         # (nby*8, wc)
        if as_plane:
            return full
        return full.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    return fold(pred_u), fold(pred_v)


@functools.lru_cache(maxsize=None)
def _bcast_matrix_c_np(wt: int, w: int, swc: int, g: int, nbx: int):
    m = np.zeros((128, wt), np.float32)
    for k in range(g):
        for c in range(w):
            m[k * nbx + c // 8, k * swc + c] = 1.0
    return m


def _bcast_matrix_c(wt: int, w: int, swc: int, g: int, nbx: int):
    return jnp.asarray(_bcast_matrix_c_np(wt, w, swc, g, nbx))


@functools.lru_cache(maxsize=None)
def _reduce_matrix_np(wt: int, w: int, sw: int, g: int, nbx: int):
    m = np.zeros((wt, 128), np.float32)
    for k in range(g):
        for c in range(w):
            m[k * sw + c, k * nbx + c // 16] = 1.0
    return m


def _reduce_matrix(wt: int, w: int, sw: int, g: int, nbx: int):
    return jnp.asarray(_reduce_matrix_np(wt, w, sw, g, nbx))


def _bcast_matrix(wt: int, w: int, sw: int, g: int, nbx: int):
    return jnp.asarray(
        np.ascontiguousarray(_reduce_matrix_np(wt, w, sw, g, nbx).T))


def supported() -> bool:
    return jax.default_backend() == "tpu"
