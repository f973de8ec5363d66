"""CPU coverage for the Pallas kernel BODIES via the Pallas interpreter.

The three production kernels (ops/pallas/me.py, acsym.py, pack.py) are
TPU-only at runtime ('auto' selects them only on a TPU backend), so the CPU
suite would otherwise never execute their bodies (ADVICE round 2, medium).
Running them under ``pl.pallas_call(..., interpret=True)`` executes the same
kernel logic (rolls, barrel selects, one-hot matmuls, the merge tree) on CPU
and pins it bit-for-bit against the XLA formulations.

This does NOT replace the on-chip suite (tests/test_tpu_exactness.py): the
interpreter cannot catch Mosaic lowering or TPU matmul-precision semantics.
It catches kernel-logic regressions in every CPU CI run.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpga_mpeg2_encoder_tpu.models import encoder as M
from fpga_mpeg2_encoder_tpu.ops import bitpack, entropy, motion
from fpga_mpeg2_encoder_tpu.ops.pallas import acsym as k_acsym
from fpga_mpeg2_encoder_tpu.ops.pallas import me as k_me
from fpga_mpeg2_encoder_tpu.ops.pallas import pack as k_pack
from fpga_mpeg2_encoder_tpu.ops.pallas import transform as k_tf


@pytest.fixture
def interpret_kernels():
    saved = (k_me._INTERPRET, k_acsym._INTERPRET, k_pack._INTERPRET,
             k_tf._INTERPRET, motion._ME_IMPL, entropy._ACSYM_IMPL,
             bitpack._PACK_IMPL, M._TRANSFORM_IMPL)
    k_me._INTERPRET = k_acsym._INTERPRET = k_pack._INTERPRET = True
    k_tf._INTERPRET = True
    yield
    (k_me._INTERPRET, k_acsym._INTERPRET, k_pack._INTERPRET,
     k_tf._INTERPRET, motion._ME_IMPL, entropy._ACSYM_IMPL,
     bitpack._PACK_IMPL, M._TRANSFORM_IMPL) = saved


def _frames(w, h, n, seed):
    rng = np.random.default_rng(seed)
    pad = 32
    yy, xx = np.mgrid[0:h + pad, 0:w + pad]
    tex = rng.integers(0, 48, (h + pad, w + pad)).astype(np.int32)
    y = (((xx * 3 + yy * 2) // 4) % 200 + tex).astype(np.uint8)
    u = ((xx - yy) // 3 % 160 + 48).astype(np.uint8)
    v = ((xx + yy) // 5 % 120 + 64).astype(np.uint8)
    return [(y[2 * i:2 * i + h, 3 * i:3 * i + w].copy(),
             u[2 * i:2 * i + h, 3 * i:3 * i + w].copy(),
             v[2 * i:2 * i + h, 3 * i:3 * i + w].copy()) for i in range(n)]


@pytest.mark.parametrize("vl", [1, 3])
@pytest.mark.parametrize("impl", ["fused", "split"])
def test_interpreted_me_kernel_matches_xla(interpret_kernels, vl, impl):
    """ME + chroma kernels (interpret) vs the XLA formulation, I and P
    frames, at the default and the smallest search range - both the
    one-launch fused kernel and the split luma/chroma pair."""
    yr, ur = 2 * vl, vl
    w, h = 96, 64
    (y0, u0, v0), (y1, u1, v1) = _frames(w, h, 2, 31 + vl)
    prev = (jnp.asarray(y0), jnp.asarray(u0), jnp.asarray(v0))
    # chroma planes at half res for prediction inputs
    pu = jnp.asarray(u0[::2, ::2])
    pv = jnp.asarray(v0[::2, ::2])

    if impl == "fused":
        inter, mvx, mvy, pred_y, pred_u, pred_v = \
            k_me.motion_estimate_fused_pallas(
                jnp.asarray(y1), prev[0], pu, pv, jnp.asarray(False), yr, ur)
    else:
        inter, mvx, mvy, pred_y = k_me.motion_estimate_pallas(
            jnp.asarray(y1), prev[0], jnp.asarray(False), yr)
        pred_u, pred_v = k_me.chroma_pred_pallas(pu, pv, inter, mvx, mvy, ur)

    want = motion.estimate_and_predict_local(
        jnp.asarray(y1), jnp.pad(prev[0], ((8, 8), (0, 0))),
        jnp.pad(pu, ((4, 4), (0, 0))), jnp.pad(pv, ((4, 4), (0, 0))),
        jnp.asarray(False), yr, ur, jnp.int32(0), jnp.int32(h // 16))

    assert (np.asarray(inter) == np.asarray(want.inter)).all()
    assert (np.asarray(mvx) == np.asarray(want.mvx)).all()
    assert (np.asarray(mvy) == np.asarray(want.mvy)).all()
    assert (np.asarray(pred_y) == np.asarray(want.pred_y)).all()
    assert (np.asarray(pred_u) == np.asarray(want.pred_u)).all()
    assert (np.asarray(pred_v) == np.asarray(want.pred_v)).all()


def test_interpreted_me_kernel_max_width_matches_xla(interpret_kernels):
    """nbx=128 (2048-wide, the XL=7 maximum): G=1, every MB lane occupied -
    the boundary of the segment-folding arithmetic."""
    w, h, yr, ur = 2048, 32, 6, 3
    rng = np.random.default_rng(5)
    y1 = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    y0 = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    u0 = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
    v0 = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
    inter, mvx, mvy, pred_y, pu, pv = k_me.motion_estimate_fused_pallas(
        y1, y0, u0, v0, jnp.asarray(False), yr, ur)
    want = motion._estimate_and_predict_local_xla(
        y1, jnp.pad(y0, ((8, 8), (0, 0))), jnp.pad(u0, ((4, 4), (0, 0))),
        jnp.pad(v0, ((4, 4), (0, 0))), jnp.asarray(False), yr, ur,
        jnp.int32(0), jnp.int32(h // 16))
    assert (np.asarray(inter) == np.asarray(want.inter)).all()
    assert (np.asarray(mvx) == np.asarray(want.mvx)).all()
    assert (np.asarray(mvy) == np.asarray(want.mvy)).all()
    assert (np.asarray(pred_y) == np.asarray(want.pred_y)).all()
    assert (np.asarray(pu) == np.asarray(want.pred_u)).all()
    assert (np.asarray(pv) == np.asarray(want.pred_v)).all()


def test_interpreted_me_kernel_banded_halo_matches_xla(interpret_kernels):
    """The sharded band form (halo=True + global row offsets) of the fused ME
    and chroma kernels vs the XLA band formulation: a middle band must treat
    its shard seams as non-edges (VERDICT round-2: one formulation for the
    single-chip and sharded paths)."""
    yr, ur = 6, 3
    w, h = 96, 128                       # full frame: 8 MB rows
    (y0, u0, v0), (y1, u1, v1) = _frames(w, h, 2, 41)
    prev_y = jnp.asarray(y0)
    pu = jnp.asarray(u0[::2, ::2])
    pv = jnp.asarray(v0[::2, ::2])
    nby = h // 16

    # band = MB rows 2..5 (4 rows), with real 8/4-row halos from the frame
    r0, r1 = 2, 6
    cur_b = jnp.asarray(y1[16 * r0:16 * r1])
    py_h = prev_y[16 * r0 - 8:16 * r1 + 8]
    pu_h = pu[8 * r0 - 4:8 * r1 + 4]
    pv_h = pv[8 * r0 - 4:8 * r1 + 4]

    inter, mvx, mvy, pred_y, pred_u, pred_v = \
        k_me.motion_estimate_fused_pallas(
            cur_b, py_h, pu_h, pv_h, jnp.asarray(False), yr, ur,
            first_mb_row=jnp.int32(r0), total_mb_rows=jnp.int32(nby),
            halo=True)

    want = motion._estimate_and_predict_local_xla(
        cur_b, py_h, pu_h, pv_h, jnp.asarray(False), yr, ur,
        jnp.int32(r0), jnp.int32(nby))
    assert (np.asarray(inter) == np.asarray(want.inter)).all()
    assert (np.asarray(mvx) == np.asarray(want.mvx)).all()
    assert (np.asarray(mvy) == np.asarray(want.mvy)).all()
    assert (np.asarray(pred_y) == np.asarray(want.pred_y)).all()
    assert (np.asarray(pred_u) == np.asarray(want.pred_u)).all()
    assert (np.asarray(pred_v) == np.asarray(want.pred_v)).all()


def test_interpreted_acsym_slot_grid_matches_xla(interpret_kernels):
    """Slot-grid emission kernel (interpret) vs the XLA one-hot/cummax +
    concat assembly, on realistic quantised-coefficient statistics (many
    zeros, short runs, escapes).  Zero-length slots may differ in their dead
    code bits (the kernel writes 0, the XLA path leaves the dummy code), so
    the comparison masks by emitted length."""
    rng = np.random.default_rng(7)
    nby, nbx = 5, 4
    zig = np.zeros((nby, nbx, 6, 64), np.int32)
    mask = rng.random(zig.shape) < 0.15
    zig[mask] = rng.integers(-60, 61, mask.sum())
    zig[0, 0, 0, 5] = 2047          # escape-coded level
    zig[1, 2, 3, 63] = -2047
    inter = rng.random((nby, nbx)) < 0.6
    mvx = rng.integers(-12, 13, (nby, nbx)).astype(np.int32)
    mvy = rng.integers(-12, 13, (nby, nbx)).astype(np.int32)

    def run():
        fs = entropy.symbolize_frame(
            jnp.asarray(zig), jnp.asarray(inter), jnp.asarray(mvx),
            jnp.asarray(mvy), jnp.int32(1), jnp.int32(4), 2)
        slots = np.asarray(fs.slots)
        return np.where((slots >> 27) > 0, slots, 0)

    entropy._ACSYM_IMPL = "pallas"
    got = run()
    entropy._ACSYM_IMPL = "xla"
    want = run()
    assert got.shape == want.shape
    assert (got == want).all()


@pytest.mark.parametrize("nbx", [26, 120, 128])
def test_interpreted_acsym_wide_geometry_matches_xla(interpret_kernels, nbx):
    """Regression for the r04 routing-barrel liveness bug: the slot-routing
    barrel's stale duplicates only corrupt once some macroblock's lane
    offset crosses a power-of-2 boundary - first at nbx = 26 (off > 256) -
    so the narrow-frame tests above can never catch it.  Pins 1920-wide
    (nbx = 120, the headline geometry) and max-width 2048 (nbx = 128)."""
    rng = np.random.default_rng(11 + nbx)
    nby = 2
    zig = np.zeros((nby, nbx, 6, 64), np.int32)
    mask = rng.random(zig.shape) < 0.15
    zig[mask] = rng.integers(-60, 61, mask.sum())
    inter = rng.random((nby, nbx)) < 0.6
    mvx = rng.integers(-12, 13, (nby, nbx)).astype(np.int32)
    mvy = rng.integers(-12, 13, (nby, nbx)).astype(np.int32)

    def run():
        fs = entropy.symbolize_frame(
            jnp.asarray(zig), jnp.asarray(inter), jnp.asarray(mvx),
            jnp.asarray(mvy), jnp.int32(1), jnp.int32(4), 2)
        slots = np.asarray(fs.slots)
        return np.where((slots >> 27) > 0, slots, 0)

    entropy._ACSYM_IMPL = "pallas"
    got = run()
    entropy._ACSYM_IMPL = "xla"
    want = run()
    assert (got == want).all()


@pytest.mark.parametrize("q_level", [2, 4])
def test_interpreted_transform_kernel_matches_xla(interpret_kernels, q_level):
    """Fused strip-layout transform kernel (interpret) vs the coefficient-
    major ops/dct.py path: quantised zig coefficients and all three recon
    planes must match exactly, I and P cases, both dequantiser shift
    branches (q_level < 3 and >= 3)."""
    from fpga_mpeg2_encoder_tpu.ops import colorspace, dct
    from fpga_mpeg2_encoder_tpu.ops.pallas.transform import \
        transform_recon_pallas

    w, h = 96, 64
    (y0, u0, v0), (y1, u1, v1) = _frames(w, h, 2, 13)
    ys, us, vs = colorspace.subsample_420(
        jnp.asarray(y1), jnp.asarray(u1), jnp.asarray(v1))
    nby, nbx = h // 16, w // 16
    rng = np.random.default_rng(3)
    inter = jnp.asarray(rng.random((nby, nbx)) < 0.5)
    # prediction planes: previous frame's subsampled planes (realistic values)
    py, pu, pv = colorspace.subsample_420(
        jnp.asarray(y0), jnp.asarray(u0), jnp.asarray(v0))
    pyp = py.astype(jnp.int32)
    pup = pu.astype(jnp.int32)
    pvp = pv.astype(jnp.int32)

    qzig, ry, ru, rv = transform_recon_pallas(
        ys, us, vs, pyp, pup, pvp, inter, q_level)

    # XLA reference (models/encoder.py else-branch)
    yb = M._blockify(ys.astype(jnp.int32), 16)
    ub = M._blockify(us.astype(jnp.int32), 8)
    vb = M._blockify(vs.astype(jnp.int32), 8)
    cur_t = M._tiles(yb, ub, vb)
    pred_t = M._tiles(
        pyp.reshape(nby, 16, nbx, 16).transpose(0, 2, 1, 3),
        pup.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3),
        pvp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3))
    resid = (cur_t - pred_t).reshape(-1, 64).T
    inter_t = jnp.repeat(inter.reshape(-1), 6)
    q = dct.quantize(dct.fdct(resid), inter_t, q_level)
    rres = dct.idct(dct.dequantize(q, inter_t, q_level))
    recon_t = jnp.clip(pred_t.reshape(-1, 64).T + rres, 0, 255) \
        .T.reshape(nby, nbx, 6, 64)
    want_ry = M._unblockify(M._untile_y(recon_t[:, :, :4]))
    want_ru = M._unblockify(recon_t[:, :, 4].reshape(nby, nbx, 8, 8))
    want_rv = M._unblockify(recon_t[:, :, 5].reshape(nby, nbx, 8, 8))
    want_qzig = q[entropy._ZIG_INV_NP, :].T.reshape(nby, nbx, 6, 64)

    assert (np.asarray(qzig) == np.asarray(want_qzig)).all()
    assert (np.asarray(ry) == np.asarray(want_ry)).all()
    assert (np.asarray(ru) == np.asarray(want_ru)).all()
    assert (np.asarray(rv) == np.asarray(want_rv)).all()


def test_interpreted_pack_kernel_matches_xla(interpret_kernels):
    """Pack kernel pair (interpret) vs the XLA merge tree: same words, same
    byte-aligned row bits, on mixed-length symbol rows."""
    rng = np.random.default_rng(9)
    r, s = 5, 700
    lens = rng.integers(0, 25, (r, s)).astype(np.int32)
    lens[rng.random((r, s)) < 0.5] = 0
    codes = np.zeros((r, s), np.uint32)
    nz = lens > 0
    codes[nz] = rng.integers(0, 1 << 24, nz.sum()).astype(np.uint32) \
        & ((1 << lens[nz].astype(np.uint64)) - 1).astype(np.uint32)
    cap = 640        # worst case 700 * 24 bits = 525 words

    gw, gb, govf = k_pack.pack_symbols_pallas(
        jnp.asarray(codes), jnp.asarray(lens), cap)
    ww, wb, wovf = bitpack.pack_symbols(
        jnp.asarray(codes), jnp.asarray(lens), cap, budget_bps=0)

    assert not bool(govf) and not bool(wovf)
    assert (np.asarray(gb) == np.asarray(wb)).all()
    for k in range(r):
        nwords = (int(np.asarray(gb)[k]) + 31) // 32
        assert (np.asarray(gw)[k, :nwords] == np.asarray(ww)[k, :nwords]).all(), k


def test_interpreted_sharded_pipeline_runs_production_kernels(
        interpret_kernels):
    """The slice-row-sharded frame pipeline under shard_map with ALL
    production kernels forced on (via the interpreter): payload must be
    byte-identical to the single-chip XLA encode.  This exercises the exact
    kernel-under-shard_map seams the TPU production sharded path uses
    (VERDICT round-2 weak item 3)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from fpga_mpeg2_encoder_tpu.parallel.mesh import make_mesh
    from fpga_mpeg2_encoder_tpu.parallel.spatial import (
        make_sharded_frame_encoder, sharded_frame_shardings)

    if len(jax.devices()) < 4:
        pytest.skip("needs the 4+ device CPU mesh")
    mesh = make_mesh(4, axis="slice")

    h, w = 64, 96
    frames = _frames(w, h, 2, 71)
    kw = dict(yr=6, ur=3, q_level=2, row_cap=1024, frame_cap=16384)

    # reference: single-chip XLA path
    import functools

    from fpga_mpeg2_encoder_tpu.models.encoder import encode_frame_core
    motion._ME_IMPL = "xla"
    entropy._ACSYM_IMPL = "xla"
    bitpack._PACK_IMPL = "xla"
    M._TRANSFORM_IMPL = "xla"
    fref = jax.jit(functools.partial(encode_frame_core, **kw))
    prev = (jnp.zeros((h, w), jnp.uint8),
            jnp.zeros((h // 2, w // 2), jnp.uint8),
            jnp.zeros((h // 2, w // 2), jnp.uint8))
    want = []
    for fi, (y, u, v) in enumerate(frames):
        ry, ru, rv, fw, fb, ovf = fref(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v), *prev,
                                       jnp.int32(fi), jnp.int32(fi))
        assert not bool(ovf)
        want.append((np.asarray(fw)[: (int(fb) + 31) // 32], int(fb)))
        prev = (ry, ru, rv)

    # sharded: production kernels via the interpreter, under shard_map
    motion._ME_IMPL = "fused"
    entropy._ACSYM_IMPL = "pallas"
    bitpack._PACK_IMPL = "pallas"
    M._TRANSFORM_IMPL = "pallas"
    senc = make_sharded_frame_encoder(mesh, h, w, **kw)
    plane_sh, _ = sharded_frame_shardings(mesh)
    prev_s = (jax.device_put(np.zeros((h, w), np.uint8), plane_sh),
              jax.device_put(np.zeros((h // 2, w // 2), np.uint8), plane_sh),
              jax.device_put(np.zeros((h // 2, w // 2), np.uint8), plane_sh))
    for fi, (y, u, v) in enumerate(frames):
        out = senc(jax.device_put(y, plane_sh), jax.device_put(u, plane_sh),
                   jax.device_put(v, plane_sh), *prev_s,
                   jnp.int32(fi), jnp.int32(fi))
        wfw, wfb = want[fi]
        assert int(out[4]) == wfb, f"frame {fi}: bit counts differ"
        assert (np.asarray(out[3])[: len(wfw)] == wfw).all(), \
            f"frame {fi}: payload differs"
        prev_s = out[:3]


def test_interpreted_chunked_scan_matches_xla(interpret_kernels):
    """The device-resident multi-frame scan (encode_gop_scan - the bench's
    production path) with ALL kernels forced on under lax.scan, vs the XLA
    formulations: sequence payload must be byte-identical."""
    w, h, nf = 96, 64, 3
    rng = np.random.default_rng(2)
    fy = jnp.asarray(rng.integers(0, 256, (nf, h, w)).astype(np.uint8))
    fu = jnp.asarray(rng.integers(0, 256, (nf, h, w)).astype(np.uint8))
    fv = jnp.asarray(rng.integers(0, 256, (nf, h, w)).astype(np.uint8))
    py = jnp.zeros((h, w), jnp.uint8)
    pc = jnp.zeros((h // 2, w // 2), jnp.uint8)
    kw = dict(yr=6, ur=3, q_level=2, row_cap=1024, frame_cap=16384,
              seq_cap=65536)

    def run():
        M.encode_gop_scan.clear_cache()
        out = M.encode_gop_scan(fy, fu, fv, py, pc, pc, jnp.int32(0),
                                jnp.int32(0), jnp.int32(2), **kw)
        sb = int(out[4])
        assert not bool(out[7])
        return np.asarray(out[3]).astype(">u4").tobytes()[: (sb + 7) // 8]

    motion._ME_IMPL = "fused"
    entropy._ACSYM_IMPL = "pallas"
    bitpack._PACK_IMPL = "pallas"
    M._TRANSFORM_IMPL = "pallas"
    got = run()
    motion._ME_IMPL = "xla"
    entropy._ACSYM_IMPL = "xla"
    bitpack._PACK_IMPL = "xla"
    M._TRANSFORM_IMPL = "xla"
    want = run()
    assert got == want


def test_interpreted_chunked_scan_tight_seq_cap_regression(interpret_kernels):
    """Regression for the r04 on-chip chunked-vs-streaming divergence: the
    Pallas merge pads every frame payload to exactly frame_cap words, and
    with seq_cap == frame_cap (push_chunk's sizing for chunks < 8 frames)
    the sequence append's dynamic-slice window equalled the whole
    accumulator, so the offset clamped to 0 and every frame OR'd over frame
    0 - silently (frame bit counts and recon were right).  The fix gives the
    scan accumulator a frame_cap+1-word guard margin (append_bitstring
    sizing contract).  This test pins the exact failing geometry: chunked
    scan payload must equal the concatenation of per-frame payloads."""
    w, h, nf = 96, 64, 4
    rng = np.random.default_rng(5)
    fy = jnp.asarray(rng.integers(0, 256, (nf, h, w)).astype(np.uint8))
    fu = jnp.asarray(rng.integers(0, 256, (nf, h, w)).astype(np.uint8))
    fv = jnp.asarray(rng.integers(0, 256, (nf, h, w)).astype(np.uint8))
    py = jnp.zeros((h, w), jnp.uint8)
    pc = jnp.zeros((h // 2, w // 2), jnp.uint8)
    motion._ME_IMPL = "fused"
    entropy._ACSYM_IMPL = "pallas"
    bitpack._PACK_IMPL = "pallas"          # merge pads payloads to frame_cap
    M._TRANSFORM_IMPL = "pallas"
    M.encode_gop_scan.clear_cache()
    kw = dict(yr=6, ur=3, q_level=2, row_cap=1024, frame_cap=16384)
    out = M.encode_gop_scan(fy, fu, fv, py, pc, pc, jnp.int32(0),
                            jnp.int32(0), jnp.int32(2), **kw,
                            seq_cap=16384)  # == frame_cap: the failing sizing
    assert not bool(out[7])
    sb = int(out[4])
    got = np.asarray(out[3]).astype(">u4").tobytes()[: (sb + 7) // 8]

    f = jax.jit(functools_partial_encode_frame(kw))
    prev, want = (py, pc, pc), b""
    for fi in range(nf):
        ry, ru, rv, fw, fb, ovf = f(fy[fi], fu[fi], fv[fi], *prev,
                                    jnp.int32(fi % 3), jnp.int32(fi))
        assert not bool(ovf)
        want += np.asarray(fw).astype(">u4").tobytes()[: (int(fb) + 7) // 8]
        prev = (ry, ru, rv)
    assert got == want


def functools_partial_encode_frame(kw):
    import functools
    return functools.partial(M.encode_frame_core, **kw)


def test_append_bitstring_rejects_undersized_accumulator():
    """The sizing contract is enforced at trace time: an accumulator not
    strictly wider than the appended width + 1 corrupts silently under
    dynamic-slice clamping, so it must raise instead."""
    with pytest.raises(ValueError, match="sizing contract"):
        bitpack.append_bitstring(jnp.zeros(64, jnp.uint32), jnp.int32(0),
                                 jnp.zeros(64, jnp.uint32), jnp.int32(32))
    with pytest.raises(ValueError, match="sizing contract"):
        bitpack.append_bitstrings_batched(
            jnp.zeros((2, 64), jnp.uint32), jnp.zeros(2, jnp.int32),
            jnp.zeros((2, 64), jnp.uint32), jnp.zeros(2, jnp.int32))


def test_interpreted_full_frame_stream_matches_xla(interpret_kernels):
    """End-to-end: encode_frame_core with ALL THREE kernels forced on (via the
    interpreter) must produce the byte-identical payload to the XLA path -
    the exact integration seam the TPU production path uses."""
    import functools

    from fpga_mpeg2_encoder_tpu.models import encoder as M

    w, h = 96, 64
    frames = _frames(w, h, 2, 21)
    kw = dict(yr=6, ur=3, q_level=2, row_cap=1024, frame_cap=16384)

    def run():
        f = jax.jit(functools.partial(M.encode_frame_core, **kw))
        prev = (jnp.zeros((h, w), jnp.uint8),
                jnp.zeros((h // 2, w // 2), jnp.uint8),
                jnp.zeros((h // 2, w // 2), jnp.uint8))
        outs = []
        for fi, (y, u, v) in enumerate(frames):
            ry, ru, rv, fw, fb, ovf = f(jnp.asarray(y), jnp.asarray(u),
                                        jnp.asarray(v), *prev,
                                        jnp.int32(fi), jnp.int32(fi))
            assert not bool(ovf)
            outs.append((np.asarray(fw)[: (int(fb) + 31) // 32], int(fb)))
            prev = (ry, ru, rv)
        return outs

    motion._ME_IMPL = "fused"
    entropy._ACSYM_IMPL = "pallas"
    bitpack._PACK_IMPL = "pallas"
    M._TRANSFORM_IMPL = "pallas"
    got = run()
    motion._ME_IMPL = "xla"
    entropy._ACSYM_IMPL = "xla"
    bitpack._PACK_IMPL = "xla"
    M._TRANSFORM_IMPL = "xla"
    want = run()
    for fi, ((pw, pb), (xw, xb)) in enumerate(zip(got, want)):
        assert pb == xb, f"frame {fi}: bit counts differ"
        assert (pw == xw).all(), f"frame {fi}: payload differs"


def test_interpreted_2d_mesh_runs_production_kernels(interpret_kernels):
    """The 2-D stream x slice composition with ALL production kernels forced
    on (via the interpreter): every stream's payload byte-identical to the
    single-chip XLA encode - the exact kernels-under-shard_map-under-vmap
    seams the production 2-D scale-out layout uses."""
    import functools

    from fpga_mpeg2_encoder_tpu.models.encoder import encode_frame_core
    from fpga_mpeg2_encoder_tpu.parallel.mesh import make_mesh2d
    from fpga_mpeg2_encoder_tpu.parallel.spatial import (
        make_sharded_batch_encoder, sharded_batch_shardings)

    if len(jax.devices()) < 4:
        pytest.skip("needs the 4+ device CPU mesh")
    mesh = make_mesh2d(2, 2)
    B, h, w = 2, 64, 96
    kw = dict(yr=6, ur=3, q_level=2, row_cap=1024, frame_cap=16384)

    # reference: single-chip XLA path, per stream
    motion._ME_IMPL = "xla"
    entropy._ACSYM_IMPL = "xla"
    bitpack._PACK_IMPL = "xla"
    M._TRANSFORM_IMPL = "xla"
    fref = jax.jit(functools.partial(encode_frame_core, **kw))
    videos = [_frames(w, h, 1, 81 + b)[0] for b in range(B)]
    i_f = np.asarray([0, 1], np.int32)       # different GOP phases
    want = []
    for b in range(B):
        y, u, v = videos[b]
        out = fref(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                   jnp.zeros((h, w), jnp.uint8),
                   jnp.zeros((h // 2, w // 2), jnp.uint8),
                   jnp.zeros((h // 2, w // 2), jnp.uint8),
                   jnp.int32(i_f[b]), jnp.int32(0))
        assert not bool(out[5])
        want.append((np.asarray(out[3])[: (int(out[4]) + 31) // 32],
                     int(out[4])))

    # 2-D mesh with production kernels (interpreter)
    motion._ME_IMPL = "fused"
    entropy._ACSYM_IMPL = "pallas"
    bitpack._PACK_IMPL = "pallas"
    M._TRANSFORM_IMPL = "pallas"
    enc = make_sharded_batch_encoder(mesh, B, h, w, **kw)
    plane_sh, scalar_sh = sharded_batch_shardings(mesh)
    yb = np.stack([videos[b][0] for b in range(B)])
    ub = np.stack([videos[b][1] for b in range(B)])
    vb = np.stack([videos[b][2] for b in range(B)])
    out = enc(jax.device_put(yb, plane_sh), jax.device_put(ub, plane_sh),
              jax.device_put(vb, plane_sh),
              jax.device_put(np.zeros((B, h, w), np.uint8), plane_sh),
              jax.device_put(np.zeros((B, h // 2, w // 2), np.uint8), plane_sh),
              jax.device_put(np.zeros((B, h // 2, w // 2), np.uint8), plane_sh),
              jax.device_put(i_f, scalar_sh),
              jax.device_put(np.zeros(B, np.int32), scalar_sh))
    assert not bool(np.asarray(out[5]).any())
    for b in range(B):
        wfw, wfb = want[b]
        assert int(np.asarray(out[4])[b]) == wfb, f"stream {b}: bit count"
        assert (np.asarray(out[3])[b, :len(wfw)] == wfw).all(), \
            f"stream {b}: payload differs"


@pytest.mark.parametrize("r,c,cap", [
    (20, 128, 1024),      # CIF-like: 18 slice rows + headers
    (5, 256, 512),        # tiny frame, odd row count, sub-16 rows
    (33, 128, 8192),      # crosses the 32-row pow2 boundary
])
def test_interpreted_merge_rows_kernel_matches_xla(interpret_kernels,
                                                   r, c, cap):
    """Single-kernel VMEM row merge vs the XLA concat tree: byte-aligned
    random rows, identical payload words and bit count."""
    from fpga_mpeg2_encoder_tpu.ops.pallas.pack import merge_rows_pallas

    rng = np.random.default_rng(100 + r)
    bits = (rng.integers(0, c * 24 // 8, (r,)) * 8).astype(np.int32)
    words = np.zeros((r, c), np.uint32)
    for k in range(r):
        nw = (int(bits[k]) + 31) // 32
        w = rng.integers(0, 1 << 32, nw, dtype=np.uint64).astype(np.uint32)
        rem = int(bits[k]) % 32
        if nw and rem:
            w[-1] &= np.uint32((0xFFFFFFFF << (32 - rem)) & 0xFFFFFFFF)
        words[k, :nw] = w
    got_w, got_b = merge_rows_pallas(jnp.asarray(words), jnp.asarray(bits),
                                     cap)
    bitpack._PACK_IMPL = "xla"
    want_w, want_b = bitpack.merge_rows(jnp.asarray(words), jnp.asarray(bits),
                                        cap)
    assert int(got_b) == int(want_b)
    assert (np.asarray(got_w) == np.asarray(want_w)).all()
