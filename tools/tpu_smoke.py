#!/usr/bin/env python3
"""Fast per-kernel Mosaic lowering smoke for the production Pallas kernels.

The CPU interpreter suite (tests/test_pallas_interpret.py) proves kernel
LOGIC; it cannot prove Mosaic will accept the lowering.  After a kernel
change or a tunnel outage, run this FIRST on the rig: each kernel compiles
and runs on tiny shapes and is cross-checked against its XLA formulation, a
few seconds per kernel, failures isolated per kernel with the Mosaic error
tail printed.  Then run the full suite (tools/tpu_revalidate.sh).

Run: python tools/tpu_smoke.py
(SMOKE_INTERPRET=1 runs the same checks through the CPU interpreter - a
self-test of this script, not a lowering proof.)
"""
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from fpga_mpeg2_encoder_tpu.models import encoder as M
from fpga_mpeg2_encoder_tpu.ops import bitpack, colorspace, dct, entropy, motion
from fpga_mpeg2_encoder_tpu.ops.pallas import me as k_me
from fpga_mpeg2_encoder_tpu.ops.pallas import pack as k_pack
from fpga_mpeg2_encoder_tpu.ops.pallas.transform import transform_recon_pallas

FAILED = []


def check(name):
    def deco(fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"  PASS  {name}  ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception:
            FAILED.append(name)
            tail = traceback.format_exc().strip().splitlines()
            print(f"  FAIL  {name}", flush=True)
            for line in tail[-6:]:
                print(f"        {line}", flush=True)
        return fn
    return deco


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


def _me_case(w, h, yr, ur, seed, split=False):
    (y0, u0, v0), (y1, _, _) = _frames(w, h, 2, seed)
    prev_y = jnp.asarray(y0)
    pu = jnp.asarray(u0[::2, ::2])
    pv = jnp.asarray(v0[::2, ::2])
    if split:
        inter, mvx, mvy, pred_y = k_me.motion_estimate_pallas(
            jnp.asarray(y1), prev_y, jnp.asarray(False), yr)
        pred_u, pred_v = k_me.chroma_pred_pallas(pu, pv, inter, mvx, mvy, ur)
    else:
        inter, mvx, mvy, pred_y, pred_u, pred_v = \
            k_me.motion_estimate_fused_pallas(
                jnp.asarray(y1), prev_y, pu, pv, jnp.asarray(False), yr, ur)
    want = motion._estimate_and_predict_local_xla(
        jnp.asarray(y1), jnp.pad(prev_y, ((8, 8), (0, 0))),
        jnp.pad(pu, ((4, 4), (0, 0))), jnp.pad(pv, ((4, 4), (0, 0))),
        jnp.asarray(False), yr, ur, jnp.int32(0), jnp.int32(h // 16))
    for got, exp, nm in ((inter, want.inter, "inter"), (mvx, want.mvx, "mvx"),
                         (mvy, want.mvy, "mvy"), (pred_y, want.pred_y, "pred_y"),
                         (pred_u, want.pred_u, "pred_u"),
                         (pred_v, want.pred_v, "pred_v")):
        assert (np.asarray(got) == np.asarray(exp)).all(), nm


def main():
    if os.environ.get("SMOKE_INTERPRET") == "1":
        from fpga_mpeg2_encoder_tpu.ops.pallas import acsym as k_acsym
        from fpga_mpeg2_encoder_tpu.ops.pallas import transform as k_tf
        k_me._INTERPRET = k_pack._INTERPRET = True
        k_acsym._INTERPRET = k_tf._INTERPRET = True
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    assert (jax.default_backend() == "tpu"
            or os.environ.get("SMOKE_INTERPRET") == "1"), "run on the TPU rig"

    for vl in (1, 2, 3):
        check(f"me+chroma fused vl={vl} (folded G>1, 96x64)")(
            lambda vl=vl: _me_case(96, 64, 2 * vl, vl, 31 + vl))
    # production widths: CIF (nbx=22, deep fold), HD (nbx=120), max (nbx=128)
    check("me+chroma fused 352x96 (CIF fold)")(lambda: _me_case(352, 96, 6, 3, 11))
    check("me+chroma fused 2048x32 (nbx=128, G=1)")(
        lambda: _me_case(2048, 32, 6, 3, 5))
    # the split pair is the demotion ladder's fallback rung - prove it lowers
    check("me+chroma SPLIT pair 96x64 (ladder rung)")(
        lambda: _me_case(96, 64, 6, 3, 31, split=True))
    check("me+chroma SPLIT pair 2048x32 (ladder rung)")(
        lambda: _me_case(2048, 32, 6, 3, 5, split=True))

    @check("me+chroma banded halo (sharded form)")
    def _():
        yr, ur, w, h = 6, 3, 96, 128
        (y0, u0, v0), (y1, _, _) = _frames(w, h, 2, 41)
        prev_y = jnp.asarray(y0)
        pu = jnp.asarray(u0[::2, ::2])
        pv = jnp.asarray(v0[::2, ::2])
        nby, (r0, r1) = h // 16, (2, 6)
        cur_b = jnp.asarray(y1[16 * r0:16 * r1])
        py_h = prev_y[16 * r0 - 8:16 * r1 + 8]
        pu_h, pv_h = pu[8 * r0 - 4:8 * r1 + 4], pv[8 * r0 - 4:8 * r1 + 4]
        inter, mvx, mvy, pred_y, pred_u, pred_v = \
            k_me.motion_estimate_fused_pallas(
                cur_b, py_h, pu_h, pv_h, jnp.asarray(False), yr, ur,
                first_mb_row=jnp.int32(r0), total_mb_rows=jnp.int32(nby),
                halo=True)
        want = motion._estimate_and_predict_local_xla(
            cur_b, py_h, pu_h, pv_h, jnp.asarray(False), yr, ur,
            jnp.int32(r0), jnp.int32(nby))
        assert (np.asarray(inter) == np.asarray(want.inter)).all()
        assert (np.asarray(pred_y) == np.asarray(want.pred_y)).all()
        assert (np.asarray(pred_u) == np.asarray(want.pred_u)).all()
        assert (np.asarray(pred_v) == np.asarray(want.pred_v)).all()

    for q_level, w, h in ((2, 96, 64), (4, 96, 64), (2, 1920, 32)):
        @check(f"transform strip kernel q={q_level} {w}x{h}")
        def _(q_level=q_level, w=w, h=h):
            (y0, u0, v0), (y1, u1, v1) = _frames(w, h, 2, 13)
            ys, us, vs = colorspace.subsample_420(
                jnp.asarray(y1), jnp.asarray(u1), jnp.asarray(v1))
            nby, nbx = h // 16, w // 16
            rng = np.random.default_rng(3)
            inter = jnp.asarray(rng.random((nby, nbx)) < 0.5)
            py, pu, pv = colorspace.subsample_420(
                jnp.asarray(y0), jnp.asarray(u0), jnp.asarray(v0))
            pyp, pup, pvp = (py.astype(jnp.int32), pu.astype(jnp.int32),
                             pv.astype(jnp.int32))
            qzig, ry, ru, rv = transform_recon_pallas(
                ys, us, vs, pyp, pup, pvp, inter, q_level)
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
            want_qzig = q[entropy._ZIG_INV_NP, :].T.reshape(nby, nbx, 6, 64)
            want_ry = M._unblockify(M._untile_y(recon_t[:, :, :4]))
            want_ru = M._unblockify(recon_t[:, :, 4].reshape(nby, nbx, 8, 8))
            want_rv = M._unblockify(recon_t[:, :, 5].reshape(nby, nbx, 8, 8))
            assert (np.asarray(qzig) == np.asarray(want_qzig)).all(), "qzig"
            assert (np.asarray(ry) == np.asarray(want_ry)).all(), "ry"
            assert (np.asarray(ru) == np.asarray(want_ru)).all(), "ru"
            assert (np.asarray(rv) == np.asarray(want_rv)).all(), "rv"

    @check("acsym slot grid kernel")
    def _():
        rng = np.random.default_rng(7)
        nby, nbx = 5, 4
        zig = np.zeros((nby, nbx, 6, 64), np.int32)
        mask = rng.random(zig.shape) < 0.15
        zig[mask] = rng.integers(-60, 61, mask.sum())
        zig[0, 0, 0, 5] = 2047
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

        saved = entropy._ACSYM_IMPL
        try:
            entropy._ACSYM_IMPL = "pallas"
            got = run()
            entropy._ACSYM_IMPL = "xla"
            want = run()
        finally:
            entropy._ACSYM_IMPL = saved
        assert (got == want).all()

    for (r, c, cap) in ((20, 1024, 32768), (38, 2048, 65536)):
        @check(f"merge-rows kernel R={r} C={c}")
        def _(r=r, c=c, cap=cap):
            from fpga_mpeg2_encoder_tpu.ops.pallas.pack import (
                merge_fits_vmem, merge_rows_pallas)
            assert merge_fits_vmem((r, c), cap)
            rng = np.random.default_rng(50 + r)
            bits = (rng.integers(0, c * 24 // 8, (r,)) * 8).astype(np.int32)
            words = np.zeros((r, c), np.uint32)
            for k in range(r):
                nw = (int(bits[k]) + 31) // 32
                w_ = rng.integers(0, 1 << 32, nw, dtype=np.uint64) \
                    .astype(np.uint32)
                rem = int(bits[k]) % 32
                if nw and rem:
                    w_[-1] &= np.uint32((0xFFFFFFFF << (32 - rem))
                                        & 0xFFFFFFFF)
                words[k, :nw] = w_
            gw, gb = merge_rows_pallas(jnp.asarray(words), jnp.asarray(bits),
                                       cap)
            saved = bitpack._PACK_IMPL
            try:
                bitpack._PACK_IMPL = "xla"
                ww, wb = bitpack.merge_rows(jnp.asarray(words),
                                            jnp.asarray(bits), cap)
            finally:
                bitpack._PACK_IMPL = saved
            assert int(gb) == int(wb)
            assert (np.asarray(gw) == np.asarray(ww)).all()

    @check("pack kernel pair")
    def _():
        rng = np.random.default_rng(9)
        r, s = 5, 700
        lens = rng.integers(0, 25, (r, s)).astype(np.int32)
        lens[rng.random((r, s)) < 0.5] = 0
        codes = np.zeros((r, s), np.uint32)
        nz = lens > 0
        codes[nz] = rng.integers(0, 1 << 24, nz.sum()).astype(np.uint32) \
            & ((1 << lens[nz].astype(np.uint64)) - 1).astype(np.uint32)
        gw, gb, govf = k_pack.pack_symbols_pallas(
            jnp.asarray(codes), jnp.asarray(lens), 640)
        ww, wb, wovf = bitpack.pack_symbols(
            jnp.asarray(codes), jnp.asarray(lens), 640, budget_bps=0)
        assert not bool(govf) and not bool(wovf)
        assert (np.asarray(gb) == np.asarray(wb)).all()
        for k in range(r):
            nwords = (int(np.asarray(gb)[k]) + 31) // 32
            assert (np.asarray(gw)[k, :nwords]
                    == np.asarray(ww)[k, :nwords]).all(), k

    print(f"\n{'ALL KERNELS LOWER AND MATCH' if not FAILED else 'FAILURES: ' + ', '.join(FAILED)}",
          flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
