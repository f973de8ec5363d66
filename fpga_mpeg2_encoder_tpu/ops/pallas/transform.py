"""Pallas TPU kernel: the whole transform loop (stages G/H/J/K/M/N/P,
RTL/mpeg2encoder.v:1924-2357) in FRAME-STRIP layout - residual, forward DCT,
quantise, dequantise, Chen-Wang inverse DCT and reconstruction in one
VMEM-resident pass, with NO tile marshalling through HBM.

Why a layout-free kernel
------------------------
The XLA formulation (ops/dct.py driven by models/encoder.py) is
coefficient-major: tiles must be marshalled (H, W) <-> (64, N) around every
stage, and round-2 profiling showed the transform stage is ~70% HBM layout
marshalling, only ~0.35 ms/frame of math; a hand-fused 6D transpose benched
SLOWER than XLA's staged reshapes (docs/STATUS.md).  The fix is to never
leave the natural (H, W) strip layout: tile rows live in sublanes
(v = row & 7), tile columns in lanes (u = lane & 7), and every per-tile
8-point operation becomes a set of statically shifted whole-strip ops:

* forward DCT column/row passes (linear): 15 masked roll-MACs per pass -
  y[p] = sum_j M[p,j] x[j] per aligned 8-group is sum_d roll(x, -d) * c_d
  with c_d a per-position constant built from iota and Python ints.  Tile
  structure guarantees every unmasked read stays inside its own tile, so
  rolls never leak across tiles, frame edges or the U|V chroma seam.
* quantise / dequantise (RTL:2064-2077, 2128-2150): elementwise; INTRA_Q
  weight/reciprocal planes are rebuilt in-register from iota selects; the
  per-MB inter flag arrives as a (rows/16, W) lane-replicated plane and is
  broadcast across sublanes with 8 selects.
* Chen-Wang IDCT (nonlinear per-stage truncations, RTL:843-972): inputs of
  each butterfly are tile-broadcast arrays - 15 rolls + per-lane (or
  per-sublane) selects build x_j[l] = F[tile(l), j] for all 8 j, the
  butterfly then runs on full-width arrays and a final positional select
  keeps each lane's own output.  Everything stays int32; no matmuls, no
  bf16 splitting, nothing to prove about float exactness.
* reconstruction add/clip (RTL:2350-2352) in-strip.

The kernel emits reconstructed strips AND quantised coefficients in strip
layout; the zig-zag tile-major view the entropy stage needs is one XLA
relayout of q alone (the old path relayouted cur, pred, recon AND q).

Grid: one step per GS luma macroblock rows (GS*16 sublanes); chroma runs in
the same step on a U|V horizontally concatenated (GS*8, W) block, so luma
and chroma share the kernel body.  Bit-exact vs ops/dct.py (CPU interpret
tests + on-chip A/B).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import tables as T

# Set True (tests only) to run the kernel via the Pallas CPU interpreter.
_INTERPRET = False


def _gs_for(w: int) -> int:
    """Luma MB-row strips per grid step.  The kernel keeps ~13 live
    full-width int32 temporaries (butterfly inputs + fdct intermediates), so
    the strip block shrinks as width grows to keep peak VMEM well under the
    16 MB budget; VPU efficiency is unaffected (ops scale with area)."""
    if w <= 640:
        return 8
    if w <= 1152:
        return 4
    return 2


def _pos_masks(shape, axis: int):
    """8 per-position masks on the SKINNY broadcastable shape ((n,1)/(1,n))
    - building predicates/constants on full strips was ~30% of the kernel's
    VPU work; on vectors it is noise, and every consumer broadcasts."""
    cshape = (shape[0], 1) if axis == 0 else (1, shape[1])
    idx8 = jax.lax.broadcasted_iota(jnp.int32, cshape, axis) & 7
    return [idx8 == p for p in range(8)]


def _roll_mac(x, m: np.ndarray, axis: int):
    """Linear 8-point transform on every aligned 8-group along `axis`:
    out[p] = sum_j m[p, j] x[j], as 15 shifted int32 MACs against
    per-position tap-constant VECTORS (broadcast along the other axis)."""
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[axis]
    masks = _pos_masks(x.shape, axis)
    cshape = (x.shape[0], 1) if axis == 0 else (1, x.shape[1])
    out = jnp.zeros_like(x)
    for d in range(-7, 8):
        taps = [(p, int(m[p, p + d])) for p in range(8)
                if 0 <= p + d < 8 and m[p, p + d] != 0]
        if not taps:
            continue
        const = jnp.zeros(cshape, jnp.int32)
        for p, c in taps:
            const = jnp.where(masks[p], jnp.int32(c), const)
        shifted = pltpu.roll(x, shift=(n - d) % n, axis=axis)
        out = out + shifted * const
    return out


def _group_bcast_inputs(x, axis: int):
    """For every aligned 8-group along `axis`, return 8 arrays b[j] with
    b[j][k] = x[group(k)*8 + j], as a 3-level butterfly tree: each level
    doubles the broadcast period (1 -> 2 -> 4 -> 8), so the full set costs
    14 rolls + 14 selects instead of the naive 15 rolls + 64 positional
    selects (r05: the two IDCT input builds were the largest VPU block in
    the kernel).  Invariant after processing bits {1..b}: cur[off][k] =
    x[(k & ~(2b-1)) + off]; rolls only ever read within the lane's own
    8-group, so tile/edge/seam safety is inherited from the layout."""
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[axis]
    cshape = (x.shape[0], 1) if axis == 0 else (1, x.shape[1])
    idx = jax.lax.broadcasted_iota(jnp.int32, cshape, axis)
    cur = {0: x}
    for bit in (1, 2, 4):
        m = (idx & bit) != 0
        nxt = {}
        for off, arr in cur.items():
            nxt[off] = jnp.where(m, pltpu.roll(arr, shift=bit, axis=axis),
                                 arr)
            nxt[off + bit] = jnp.where(
                m, arr, pltpu.roll(arr, shift=(n - bit) % n, axis=axis))
        cur = nxt
    return [cur[j] for j in range(8)]


def _cw_stage(a, rounding: bool):
    """One Chen-Wang butterfly stage on 8 parallel int32 arrays
    (RTL:843-972; identical arithmetic to ops/dct._cw_stage)."""
    W1, W2, W3, W5, W6, W7 = T.W1, T.W2, T.W3, T.W5, T.W6, T.W7
    x0, x1, x2, x3 = a[0], a[4], a[6], a[2]
    x4, x5, x6, x7 = a[1], a[7], a[5], a[3]
    if not rounding:
        x0 = (x0 << 11) | 128
        x1 = x1 << 11
        r4, sh = 0, 0
    else:
        x0 = (x0 << 8) + 8192
        x1 = x1 << 8
        r4, sh = 4, 3
    x8 = W7 * (x4 + x5) + r4
    x4 = (x8 + (W1 - W7) * x4) >> sh
    x5 = (x8 - (W1 + W7) * x5) >> sh
    x8 = W3 * (x6 + x7) + r4
    x6 = (x8 - (W3 - W5) * x6) >> sh
    x7 = (x8 - (W3 + W5) * x7) >> sh
    x8 = x0 + x1
    x0 = x0 - x1
    x1 = W6 * (x3 + x2) + r4
    x2 = (x1 - (W2 + W6) * x2) >> sh
    x3 = (x1 + (W2 - W6) * x3) >> sh
    x1 = x4 + x6
    x4 = x4 - x6
    x6 = x5 + x7
    x5 = x5 - x7
    x7 = x8 + x3
    x8 = x8 - x3
    x3 = x0 + x2
    x0 = x0 - x2
    x2 = (181 * (x4 + x5) + 128) >> 8
    x4 = (181 * (x4 - x5) + 128) >> 8
    fs = 8 if not rounding else 14
    return [(x7 + x1) >> fs, (x3 + x2) >> fs, (x0 + x4) >> fs, (x8 + x6) >> fs,
            (x8 - x6) >> fs, (x0 - x4) >> fs, (x3 - x2) >> fs, (x7 - x1) >> fs]


def _positional_select(outs, axis: int, shape):
    """out[k] = outs[k & 7][k] along `axis` - keep each position's own lane."""
    masks = _pos_masks(shape, axis)
    r = outs[0]
    for p in range(1, 8):
        r = jnp.where(masks[p], outs[p], r)
    return r


def _quant_planes(rows: int, cols: int):
    """INTRA_Q weight / exact-reciprocal / DC-position planes, tiled to the
    strip block shape as host-side numpy (8x8-periodic, compile-time static).
    Passed to the kernel as constant-index-map inputs: Pallas forbids
    captured array constants, and building them in-kernel with iota+select
    chains (the pre-r04 form) was ~80 full-strip VPU ops per grid step."""
    reps = (rows // 8, cols // 8)
    q_np = np.asarray(T.INTRA_Q, np.int64)
    iq = np.tile(q_np.astype(np.int32), reps)
    rq = np.tile(
        ((1.0 + 2.0 ** -21) / q_np.astype(np.float64)).astype(np.float32),
        reps)
    dc_np = np.zeros((8, 8), np.bool_)
    dc_np[0, 0] = True
    return iq, rq, np.tile(dc_np, reps)


def _transform_block(cur, pred, im, iq, rq, is_dc, q_level: int):
    """Shared per-plane body: (rows, W) int32 cur/pred strips + the per-MB
    inter flag pre-replicated to pixel resolution + static quant planes
    -> (q, recon) strips."""
    m = np.asarray(T.DCTM, np.int64)
    shape = cur.shape

    resid = cur - pred                                        # |.| <= 255

    # ---- forward DCT (RTL:2025-2062): col pass, row pass, exact rounding ---
    cp = _roll_mac(resid, m, 0)                               # M @ X per tile
    t = _roll_mac(cp, m, 1)                                   # ... @ M^T
    r = (t >> 12) + ((t >> 11) & 1)
    r = ((r & 0x1FFFF) ^ 0x10000) - 0x10000                   # 17-bit wrap

    # ---- quantise (RTL:2064-2077) ------------------------------------------
    a = jnp.abs(r) & 0xFFFF
    q_inter = ((a + 2) & 0xFFFF) >> (4 + q_level)
    off = (iq * ((3 << q_level) + 2)) >> 3
    tq = ((a + off) & 0xFFFF) >> q_level
    q_intra = jnp.floor(tq.astype(jnp.float32) * rq).astype(jnp.int32)
    q_intra = jnp.where(is_dc, (a >> 4) + ((a >> 3) & 1), q_intra)
    q = jnp.where(im > 0, q_inter, q_intra)
    q = jnp.minimum(q, 2047)
    q = jnp.where(r < 0, -q, q)

    # ---- dequantise (RTL:2128-2150) ----------------------------------------
    x2 = q * 2
    xi = (x2 + jnp.sign(x2)) << q_level
    xi = jnp.clip(xi, -2047, 2047)
    xa = q * iq
    if q_level >= 3:
        xa = xa << (q_level - 3)
    else:
        xa = xa >> (3 - q_level)
    xa = jnp.clip(xa, -2047, 2047)
    xa = jnp.where(is_dc, q * 2, xa)
    f = jnp.where(im > 0, xi, xa)                             # |f| <= 2047

    # ---- Chen-Wang IDCT rows (RTL:843-905) ---------------------------------
    xj = _group_bcast_inputs(f, axis=1)
    yrow = _cw_stage(xj, rounding=False)
    yrow = [((v & 0x3FFFF) ^ 0x20000) - 0x20000 for v in yrow]  # 18-bit trunc
    y = _positional_select(yrow, 1, shape)

    # ---- IDCT columns (RTL:911-970) + reconstruction -----------------------
    xv = _group_bcast_inputs(y, axis=0)
    cols = _cw_stage(xv, rounding=True)
    res = _positional_select([jnp.clip(c, -255, 255) for c in cols], 0, shape)
    recon = jnp.clip(pred + res, 0, 255)
    return q, recon


def _kernel(q_level: int, cy_ref, py_ref, iy_ref, cc_ref, pc_ref, ic_ref,
            iqy_ref, rqy_ref, dcy_ref, iqc_ref, rqc_ref, dcc_ref,
            qy_ref, ry_ref, qc_ref, rc_ref):
    qy, ry = _transform_block(cy_ref[...], py_ref[...], iy_ref[...],
                              iqy_ref[...], rqy_ref[...], dcy_ref[...],
                              q_level)
    qy_ref[...] = qy
    ry_ref[...] = ry
    qc, rc = _transform_block(cc_ref[...], pc_ref[...], ic_ref[...],
                              iqc_ref[...], rqc_ref[...], dcc_ref[...],
                              q_level)
    qc_ref[...] = qc
    rc_ref[...] = rc


@functools.partial(jax.jit, static_argnames=("q_level",))
def transform_recon_pallas(
    cur_y: jnp.ndarray,      # (H, W) int32/uint8 4:2:0 luma
    cur_u: jnp.ndarray,      # (H/2, W/2)
    cur_v: jnp.ndarray,
    pred_y: jnp.ndarray,     # (H, W) int32 prediction planes
    pred_u: jnp.ndarray,     # (H/2, W/2)
    pred_v: jnp.ndarray,
    inter: jnp.ndarray,      # (nby, nbx) bool
    q_level: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused transform + reconstruction.  Returns (quant_zig (nby, nbx, 6,
    64) int32 in zig-zag order, recon_y (H, W) uint8, recon_u, recon_v).
    Bit-exact vs the ops/dct.py coefficient-major path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur_y.shape
    nby, nbx = h // 16, w // 16
    gs = min(_gs_for(w), nby)
    nbyp = -(-nby // gs) * gs
    wp = -(-w // 128) * 128
    wc = w // 2
    wcp = -(-(2 * wc) // 128) * 128

    def prep(x, hh, ww, wwp):
        x = x.astype(jnp.int32)
        return jnp.pad(x, ((0, hh - x.shape[0]), (0, wwp - ww)))

    cy = prep(cur_y, nbyp * 16, w, wp)
    py = prep(pred_y, nbyp * 16, w, wp)
    cc = prep(jnp.concatenate([cur_u.astype(jnp.int32),
                               cur_v.astype(jnp.int32)], axis=1),
              nbyp * 8, 2 * wc, wcp)
    pc = prep(jnp.concatenate([pred_u.astype(jnp.int32),
                               pred_v.astype(jnp.int32)], axis=1),
              nbyp * 8, 2 * wc, wcp)
    ii = inter.astype(jnp.int32)
    iy = prep(jnp.repeat(jnp.repeat(ii, 16, axis=0), 16, axis=1),
              nbyp * 16, w, wp)
    ic = prep(jnp.concatenate(
        [jnp.repeat(jnp.repeat(ii, 8, axis=0), 8, axis=1)] * 2, axis=1),
        nbyp * 8, 2 * wc, wcp)
    iqy, rqy, dcy = (jnp.asarray(p) for p in _quant_planes(16 * gs, wp))
    iqc, rqc, dcc = (jnp.asarray(p) for p in _quant_planes(8 * gs, wcp))

    def _const_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    qy, ry, qc, rc = pl.pallas_call(
        functools.partial(_kernel, q_level),
        grid=(nbyp // gs,),
        in_specs=[
            pl.BlockSpec((16 * gs, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * gs, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * gs, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * gs, wcp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * gs, wcp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * gs, wcp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(16 * gs, wp),
            _const_spec(16 * gs, wp),
            _const_spec(16 * gs, wp),
            _const_spec(8 * gs, wcp),
            _const_spec(8 * gs, wcp),
            _const_spec(8 * gs, wcp),
        ],
        out_specs=[
            pl.BlockSpec((16 * gs, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * gs, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * gs, wcp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * gs, wcp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbyp * 16, wp), jnp.int32),
            jax.ShapeDtypeStruct((nbyp * 16, wp), jnp.int32),
            jax.ShapeDtypeStruct((nbyp * 8, wcp), jnp.int32),
            jax.ShapeDtypeStruct((nbyp * 8, wcp), jnp.int32),
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            # Scoped-VMEM cap, not physical (docs/KERNELS.md): the six
            # constant-index-map quant/mask planes add ~1-2 MB double-buffered
            # on top of the ~13 live strip temporaries.
            vmem_limit_bytes=64 * 1024 * 1024),
    )(cy, py, iy, cc, pc, ic, iqy, rqy, dcy, iqc, rqc, dcc)

    recon_y = ry[:h, :w].astype(jnp.uint8)
    recon_u = rc[:h // 2, :wc].astype(jnp.uint8)
    recon_v = rc[:h // 2, wc:2 * wc].astype(jnp.uint8)

    # ---- zig-zag tile-major relayout of q (the only marshalling left) ------
    # r05: two-level transpose over int16 lane-pairs.  The naive 6-D
    # transpose + take costs ~0.66 ms/frame at 1080p (XLA's corner turn falls
    # off the fast path at 8-lane granularity); this form measures ~0.10:
    #   1. pack lane pairs (2j, 2j+1) into one int32 (q is clamped to
    #      [-2047, 2047], RTL:2075 -> 16-bit exact), halving transpose bytes;
    #   2. corner-turn at 16-row x 8-packed-lane MB granularity (fast path),
    #      then rearrange the 2x2 luma tiles lane-locally;
    #   3. bitcast back to int16 (little-endian [lo, hi] matches pack order)
    #      and gather the zig-zag order on the 64-wide minor axis.
    # Bit-exact vs the naive form (pinned by test_pallas_interpret +
    # test_tpu_exactness); measured in tools/probe_transform_split.py.
    zz = np.asarray(T.ZIGZAG, np.int64)                       # (8,8) -> order
    zig_src = np.zeros(64, np.int64)                          # z -> v*8+u
    for v in range(8):
        for u in range(8):
            zig_src[int(zz[v, u])] = v * 8 + u

    def pack2(x, width):
        x16 = x[:, :width] & 0xFFFF
        return (x16[:, 0::2] | (x16[:, 1::2] << 16)).astype(jnp.int32)

    py2 = pack2(qy[:h], w)                                    # (h, w/2)
    pc2 = pack2(qc[:h // 2], 2 * wc)                          # (h/2, wc)
    pyt = py2.reshape(nby, 16, nbx, 8).transpose(0, 2, 1, 3) \
        .reshape(nby, nbx, 2, 8, 2, 4).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(nby, nbx, 4, 32)
    put = pc2[:, :wc // 2].reshape(nby, 8, nbx, 4) \
        .transpose(0, 2, 1, 3).reshape(nby, nbx, 1, 32)
    pvt = pc2[:, wc // 2:].reshape(nby, 8, nbx, 4) \
        .transpose(0, 2, 1, 3).reshape(nby, nbx, 1, 32)
    p6 = jnp.concatenate([pyt, put, pvt], axis=2)             # packed pairs
    q6 = jax.lax.bitcast_convert_type(p6, jnp.int16) \
        .reshape(nby, nbx, 6, 64)
    quant_zig = jnp.take(q6, jnp.asarray(zig_src), axis=3).astype(jnp.int32)
    return quant_zig, recon_y, recon_u, recon_v


def supported() -> bool:
    return jax.default_backend() == "tpu"
