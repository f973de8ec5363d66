"""Forward DCT + quantise and dequantise + inverse DCT, batched over tiles.

TPU-first design notes
----------------------
* The reference's stage-G DCT (RTL/mpeg2encoder.v:2025-2062) keeps phase 1 at full
  precision and rounds once after phase 2, so the whole 2-D transform is ONE exact
  64x64 integer matmul: F.flat = DCT64 @ x.flat.  We split DCT64 = 128*HI + LO
  (|HI|<=62, 0<=LO<=127) so each half runs as an exact float32 matmul on the MXU
  (every partial sum stays below 2^24), then recombine in int32 on the VPU.
* The quantisers (RTL:2064-2077, 2128-2150) are elementwise integer ops with the
  reference's exact 16-bit wrap semantics.
* The inverse DCT is the reference's fixed-point Chen-Wang pipeline
  (RTL:843-972) with its intermediate 18-bit truncations; it is NOT a linear map,
  so it runs as vectorised butterflies on the VPU (int32), batched over tiles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import tables as T

_DCT64_LO_F32 = jnp.asarray(np.asarray(T.DCT64_LO).T, dtype=jnp.float32)   # (64, 64)
_DCT64_HI_F32 = jnp.asarray(np.asarray(T.DCT64_HI).T, dtype=jnp.float32)
_INTRA_Q_FLAT = jnp.asarray(np.asarray(T.INTRA_Q).reshape(64), dtype=jnp.int32)

W1, W2, W3, W5, W6, W7 = T.W1, T.W2, T.W3, T.W5, T.W6, T.W7


def fdct(resid: jnp.ndarray) -> jnp.ndarray:
    """(N, 64) int32 residual tiles (|x| <= 255) -> (N, 64) int32 stage-G DCT output.

    Exact: round((M @ X @ M^T)/4096) with 17-bit wrap (RTL:2058-2059)."""
    x = resid.astype(jnp.float32)
    hi = jnp.dot(x, _DCT64_HI_F32, preferred_element_type=jnp.float32)
    lo = jnp.dot(x, _DCT64_LO_F32, preferred_element_type=jnp.float32)
    t = hi.astype(jnp.int32) * 128 + lo.astype(jnp.int32)
    r = (t >> 12) + ((t >> 11) & 1)
    return ((r & 0x1FFFF) ^ 0x10000) - 0x10000


def quantize(res3: jnp.ndarray, inter: jnp.ndarray, q_level: int) -> jnp.ndarray:
    """(N, 64) coefficients + (N,) bool inter -> (N, 64) quantised (RTL:2064-2077)."""
    a = jnp.abs(res3) & 0xFFFF
    q_inter = ((a + 2) & 0xFFFF) >> (4 + q_level)
    w = _INTRA_Q_FLAT
    off = (w * ((3 << q_level) + 2)) >> 3
    q_intra = (((a + off) & 0xFFFF) >> q_level) // w
    dc_intra = (a >> 4) + ((a >> 3) & 1)
    is_dc = jnp.arange(64) == 0
    q_intra = jnp.where(is_dc, dc_intra, q_intra)
    q = jnp.where(inter[:, None], q_inter, q_intra)
    q = jnp.minimum(q, 2047)
    return jnp.where(res3 < 0, -q, q)


def dequantize(q: jnp.ndarray, inter: jnp.ndarray, q_level: int) -> jnp.ndarray:
    """(N, 64) quantised -> (N, 64) reconstruction-loop coefficients (RTL:2128-2150)."""
    x2 = q * 2
    xi = (x2 + jnp.sign(x2)) << q_level
    xi = jnp.clip(xi, -2047, 2047)
    xa = q * _INTRA_Q_FLAT
    if q_level >= 3:
        xa = xa << (q_level - 3)
    else:
        xa = xa >> (3 - q_level)
    xa = jnp.clip(xa, -2047, 2047)
    is_dc = jnp.arange(64) == 0
    xa = jnp.where(is_dc, q * 2, xa)
    return jnp.where(inter[:, None], xi, xa)


def _trunc(v: jnp.ndarray, bits: int) -> jnp.ndarray:
    m = (1 << bits) - 1
    s = 1 << (bits - 1)
    return ((v & m) ^ s) - s


def _cw_stage(a, rounding: bool):
    """One Chen-Wang butterfly stage on 8 lanes along the last axis.

    rounding=False: row pass (RTL:844-905); True: column pass (RTL:911-970)."""
    x0, x1, x2, x3 = a[..., 0], a[..., 4], a[..., 6], a[..., 2]
    x4, x5, x6, x7 = a[..., 1], a[..., 7], a[..., 5], a[..., 3]
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
    return jnp.stack(
        [(x7 + x1) >> fs, (x3 + x2) >> fs, (x0 + x4) >> fs, (x8 + x6) >> fs,
         (x8 - x6) >> fs, (x0 - x4) >> fs, (x3 - x2) >> fs, (x7 - x1) >> fs],
        axis=-1)


def idct(iq: jnp.ndarray) -> jnp.ndarray:
    """(N, 64) int32 dequantised coefficients -> (N, 64) residual in [-255, 255]."""
    a = iq.reshape(-1, 8, 8)
    rows = _trunc(_cw_stage(a, rounding=False), 18)          # 18-bit regs (RTL:886)
    cols = _cw_stage(rows.transpose(0, 2, 1), rounding=True).transpose(0, 2, 1)
    return jnp.clip(cols, -255, 255).reshape(iq.shape[0], 64)
