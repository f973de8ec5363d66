"""Pallas TPU kernel: fully fused motion estimation (stages X/Y/Z/F,
RTL/mpeg2encoder.v:1310-1918) - SAD volume, argmin, recentering, half-pel
refinement, inter/intra decision and luma prediction in ONE VMEM-resident
kernel per 16-row strip.

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


def _barrel_stages(rng: int):
    stages, rem = [], 2 * rng
    while rem > 0:
        s = (rem + 1) // 2
        stages.append(s)
        rem -= s
    return stages


def _kernel(yr: int, wp: int, wpp: int, nbx: int, nby: int, magic: int,
            cur_ref, p0_ref, p1_ref, p2_ref, b_ref, bt_ref, iframe_ref,
            pred_ref, meta_ref, rs_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 2 * yr + 1
    nn = n * n
    by = pl.program_id(0)
    c16 = cur_ref[...]                                        # (16, Wp) int32
    win = jnp.concatenate([p0_ref[...], p1_ref[...], p2_ref[...]], axis=0)
    b = b_ref[...].astype(jnp.bfloat16)                       # (Wpp, 128)
    bt = bt_ref[...].astype(jnp.bfloat16)                     # (128, Wpp)
    iframe = iframe_ref[0, 0]

    def reduce_mb(rows):
        """(K, Wpp) col sums <= 4080 -> (K, 128) exact block sums (byte-split
        bf16 matmul, f32 accumulation; values < 2**24)."""
        lo = (rows & 255).astype(jnp.float32).astype(jnp.bfloat16)
        hi = (rows >> 8).astype(jnp.float32).astype(jnp.bfloat16)
        s_lo = jnp.dot(lo, b, preferred_element_type=jnp.float32)
        s_hi = jnp.dot(hi, b, preferred_element_type=jnp.float32)
        return s_hi.astype(jnp.int32) * 256 + s_lo.astype(jnp.int32)

    def bcast_lanes(rows_mb):
        """(K, 128) small nonneg ints (<= 255) -> (K, Wpp) per-MB broadcast."""
        v = rows_mb.astype(jnp.float32).astype(jnp.bfloat16)
        return jnp.dot(v, bt, preferred_element_type=jnp.float32).astype(jnp.int32)

    # ---- full-pel SAD volume + pixel-sum row (RTL CALC_DIFF, :1650-1672) ----
    cpad = jnp.concatenate(
        [c16, jnp.zeros((16, wpp - wp), jnp.int32)], axis=1)  # (16, Wpp)
    for dx in range(-yr, yr + 1):
        shifted = pltpu.roll(win, shift=(wpp - (yr + dx)) % wpp, axis=1)
        for dy in range(-yr, yr + 1):
            x = cpad - shifted[16 + dy:32 + dy, :]
            d = jnp.maximum(x, -x)
            rs_ref[(dy + yr) * n + (dx + yr), :] = jnp.sum(d, axis=0)
    rs_ref[nn, :] = jnp.sum(cpad, axis=0)                     # pixel sums
    nout = rs_ref.shape[0]
    for k in range(nn + 1, nout):
        rs_ref[k, :] = jnp.zeros((wpp,), jnp.int32)
    sadv = reduce_mb(rs_ref[...])                             # (nout, 128)

    # ---- argmin with the RTL tie-break (largest dy, then dx; :1694-1710) ----
    row = jax.lax.broadcasted_iota(jnp.int32, (nout, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nout, 128), 1)
    dyi = (row * magic) >> 15                                 # row // n
    dxi = row - dyi * n                                       # row % n
    edge_l = lane == 0
    edge_r = lane == nbx - 1
    edge_t = by == 0
    edge_b = by == nby - 1
    invalid = (row >= nn) | (sadv > 4095) \
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
        [mvx_full + yr, mvy_full + yr, mean], axis=0))        # (3, Wpp)
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
        mask = mvxl == (dx + yr)                              # (1, Wpp)
        r0 = pltpu.roll(win30, shift=(wpp - (yr + dx)) % wpp, axis=1)
        rm1 = pltpu.roll(win30, shift=(wpp - (yr + dx - 1)) % wpp, axis=1)
        rp1 = pltpu.roll(win30, shift=(wpp - (yr + dx + 1)) % wpp, axis=1)
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
        return curw                                           # (18, Wpp)

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
                g = rec0[1:17, :]
            elif hy == 0:
                a, bb = (recm1, rec0) if hx < 0 else (rec0, recp1)
                g = m2(a[1:17, :], bb[1:17, :])
            elif hx == 0:
                g = m2(rec0[ry:ry + 16, :], rec0[ry + 1:ry + 17, :])
            else:
                a, bb = (recm1, rec0) if hx < 0 else (rec0, recp1)
                g = m4(a[ry:ry + 16, :], bb[ry:ry + 16, :],
                       a[ry + 1:ry + 17, :], bb[ry + 1:ry + 17, :])
            cands.append(g)

    rs2 = jnp.concatenate(
        [jnp.sum(jnp.abs(cpad - g), axis=0, keepdims=True) for g in cands]
        + [jnp.sum(jnp.abs(cpad - meanl), axis=0, keepdims=True),
           jnp.zeros((16 - 10, wpp), jnp.int32)], axis=0)     # (16, Wpp)
    hsad = reduce_mb(rs2)                                     # (16, 128)

    # ---- candidate masking + intra metric (f_Y_sum quirk) -------------------
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    el = lane1 == 0
    er = lane1 == nbx - 1
    over = jnp.int32(0x1000)
    vals = []
    for i9, (hy, hx) in enumerate([(hy, hx) for hy in (-1, 0, 1)
                                   for hx in (-1, 0, 1)]):
        s = hsad[i9:i9 + 1, :]
        bad = jnp.zeros((1, 128), jnp.bool_)
        if hx < 0:
            bad = bad | el | (mvx_full == -yr)
        if hx > 0:
            bad = bad | er | (mvx_full == yr)
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
        w = jnp.where(vals[hi] < vals[lo], vals[hi], vals[lo])
        i = jnp.where(vals[hi] < vals[lo], hi, lo)
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
    idx = jnp.where(use89, i89, left)                         # (1, 128)

    inter = (idx != 9) & (iframe == 0)
    div3 = (idx * 86) >> 8
    hy_sel = jnp.where(idx == 9, 0, div3 - 1)
    hx_sel = jnp.where(idx == 9, 0, idx - div3 * 3 - 1)
    mvy = jnp.where(iframe != 0, 0, (mvy_full * 2) + hy_sel)
    mvx = jnp.where(iframe != 0, 0, (mvx_full * 2) + hx_sel)

    # ---- luma prediction: selected candidate grid or 128 --------------------
    sel = bcast_lanes(jnp.concatenate(
        [idx, inter.astype(jnp.int32)], axis=0))              # (2, Wpp)
    idxl, interl = sel[0:1, :], sel[1:2, :]
    pred = jnp.full((16, wpp), 128, jnp.int32)
    for i9 in range(9):
        pred = jnp.where((interl > 0) & (idxl == i9), cands[i9], pred)
    pred_ref[...] = pred[:, :wp]

    meta = jnp.concatenate(
        [mvx, mvy, inter.astype(jnp.int32),
         jnp.zeros((5, 128), jnp.int32)], axis=0)             # (8, 128)
    meta_ref[0] = meta


@functools.partial(jax.jit, static_argnames=("yr",))
def motion_estimate_pallas(cur_y: jnp.ndarray, prev_y: jnp.ndarray,
                           is_iframe: jnp.ndarray, yr: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray]:
    """Fused luma motion estimation + prediction for one frame.

    cur_y/prev_y (H, W) uint8, is_iframe traced bool scalar ->
    (inter (nby, nbx) bool, mvx, mvy (nby, nbx) int32 half-pel,
    pred_y (nby, nbx, 16, 16) int32).  Bit-exact vs ops/motion.py's XLA path.
    Requires nbx <= 128 (true up to the 2048-wide max geometry).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur_y.shape
    nby, nbx = h // 16, w // 16
    n = 2 * yr + 1
    wp = -(-w // 128) * 128
    nout = -(-(n * n + 1) // 8) * 8
    magic = -(-(1 << 15) // n)                # x//n == (x*magic)>>15 on the
    for x in range(max(nout, 256)):           # domain we use; verify statically
        assert (x * magic) >> 15 == x // n, (n, x)

    cur = jnp.pad(cur_y, ((0, 0), (0, wp - w))).astype(jnp.int32)
    wpp = -(-(wp + 2 * yr) // 128) * 128
    prev = jnp.pad(prev_y, ((16, 16), (yr, wpp - w - yr))).astype(jnp.int32)
    iframe = jnp.asarray(is_iframe, jnp.int32).reshape(1, 1)

    pred, meta = pl.pallas_call(
        functools.partial(_kernel, yr, wp, wpp, nbx, nby, magic),
        grid=(nby,),
        in_specs=[
            pl.BlockSpec((16, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wpp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wpp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wpp), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wpp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, wpp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nby * 16, wp), jnp.int32),
            jax.ShapeDtypeStruct((nby, 8, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nout, wpp), jnp.int32)],
    )(cur, prev, prev, prev, _reduce_matrix(wpp, w), _bcast_matrix(wpp, w),
      iframe)

    pred_y = pred[:, :w].reshape(nby, 16, nbx, 16).transpose(0, 2, 1, 3)
    mvx = meta[:, 0, :nbx]
    mvy = meta[:, 1, :nbx]
    inter = meta[:, 2, :nbx] != 0
    return inter, mvx, mvy, pred_y


def _chroma_kernel(ur: int, wc: int, wcp: int, nbx: int,
                   p0u_ref, p1u_ref, p0v_ref, p1v_ref, bt_ref, meta_ref,
                   pu_ref, pv_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bt = bt_ref[...].astype(jnp.bfloat16)                     # (128, Wcp)
    meta = meta_ref[0]                                        # (8, 128) int32
    mvx, mvy, inter = meta[0:1, :], meta[1:2, :], meta[2:3, :]
    cfx, cfy = mvx >> 2, mvy >> 2                             # in [-ur, ur]
    chx, chy = (mvx >> 1) & 1, (mvy >> 1) & 1
    rows = jnp.concatenate(
        [cfx + ur, cfy + ur, chx, chy, inter], axis=0)        # (5, 128) >= 0
    v = rows.astype(jnp.float32).astype(jnp.bfloat16)
    maps = jnp.dot(v, bt, preferred_element_type=jnp.float32).astype(jnp.int32)
    cfxl, cfyl, chxl, chyl, interl = (maps[k:k + 1, :] for k in range(5))

    def predict(w16):
        # per-lane column select from the unshifted window (consistent shifts
        # across MB boundaries), then a per-lane row barrel
        r0 = jnp.zeros_like(w16)
        rp1 = jnp.zeros_like(w16)
        for dx in range(-ur, ur + 1):
            mask = cfxl == (dx + ur)
            r0 = jnp.where(mask,
                           pltpu.roll(w16, shift=(wcp - (4 + dx)) % wcp,
                                      axis=1), r0)
            rp1 = jnp.where(mask,
                            pltpu.roll(w16, shift=(wcp - (4 + dx + 1)) % wcp,
                                       axis=1), rp1)
        # rows: w16 row r holds prev row 8*by + r - 4 (4-row halo pad); the
        # window needs prev rows [8*by + cfy, +10) for the +1 interp row:
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
            return cur                                        # (9, Wcp)

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

    wu = jnp.concatenate([p0u_ref[...], p1u_ref[...]], axis=0)  # (16, Wcp)
    wv = jnp.concatenate([p0v_ref[...], p1v_ref[...]], axis=0)
    pu_ref[...] = predict(wu)[:, :wc]
    pv_ref[...] = predict(wv)[:, :wc]


def chroma_pred_pallas(prev_u: jnp.ndarray, prev_v: jnp.ndarray,
                       inter: jnp.ndarray, mvx: jnp.ndarray, mvy: jnp.ndarray,
                       ur: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chroma prediction (RTL:1847-1917) as one VMEM-resident kernel per
    8-row chroma strip: prev_u/prev_v (H/2, W/2) uint8, per-MB mv/inter ->
    (nby, nbx, 8, 8) int32 predictions x2.  Bit-exact vs ops/motion's XLA
    _chroma_pred."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hc, wcr = prev_u.shape
    nby, nbx = hc // 8, wcr // 8
    wc = -(-wcr // 128) * 128
    wcp = -(-(wc + 2 * ur + 2) // 128) * 128
    pu = jnp.pad(prev_u, ((4, 4), (4, wcp - wcr - 4))).astype(jnp.int32)
    pv = jnp.pad(prev_v, ((4, 4), (4, wcp - wcr - 4))).astype(jnp.int32)
    meta = jnp.zeros((nby, 8, 128), jnp.int32)
    meta = meta.at[:, 0, :nbx].set(mvx).at[:, 1, :nbx].set(mvy) \
        .at[:, 2, :nbx].set(inter.astype(jnp.int32))

    pred_u, pred_v = pl.pallas_call(
        functools.partial(_chroma_kernel, ur, wc, wcp, nbx),
        grid=(nby,),
        in_specs=[
            pl.BlockSpec((8, wcp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wcp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wcp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wcp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, wcp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nby * 8, wc), jnp.int32),
            jax.ShapeDtypeStruct((nby * 8, wc), jnp.int32),
        ],
    )(pu, pu, pv, pv, _bcast_matrix_c(wcp, wcr), meta)

    def fold(p):
        return p[:, :wcr].reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    return fold(pred_u), fold(pred_v)


@functools.lru_cache(maxsize=None)
def _bcast_matrix_c_np(wcp: int, w: int):
    m = np.zeros((128, wcp), np.float32)
    for x in range(w):
        m[x // 8, x] = 1.0
    return m


def _bcast_matrix_c(wcp: int, w: int):
    return jnp.asarray(_bcast_matrix_c_np(wcp, w))


@functools.lru_cache(maxsize=None)
def _reduce_matrix_np(wpp: int, w: int):
    m = np.zeros((wpp, 128), np.float32)
    for x in range(w):
        m[x, x // 16] = 1.0
    return m


def _reduce_matrix(wpp: int, w: int):
    return jnp.asarray(_reduce_matrix_np(wpp, w))


def _bcast_matrix(wpp: int, w: int):
    return jnp.asarray(np.ascontiguousarray(_reduce_matrix_np(wpp, w).T))


def supported() -> bool:
    return jax.default_backend() == "tpu"
