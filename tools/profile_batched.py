#!/usr/bin/env python3
"""Localize the multi-stream (vmap) batching tax, stage by stage.

Round-2 data point (BENCH_CONFIGS_r02.json): the batched 8x1920x1152 path
aggregates 344.8 MPixels/s while a single stream does ~425-430 - a ~20% tax
that stream-DP on one chip should not have.  This tool runs the SAME
scan-ablation pipeline as tools/profile_stages.py, but vmapped over a stream
batch, at B=1 and B=<PROF_B>, and reports ms per frame-per-stream for each
truncation point.  The stage whose per-stream delta grows with B is the one
paying the vmap tax (grid-flattened pallas_call, relayouts, or the merge
tree), and is the restructuring target.

Run on the TPU rig: PROF_B=8 PROF_NF=12 python tools/profile_batched.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_frames
from fpga_mpeg2_encoder_tpu.models import encoder as M
from fpga_mpeg2_encoder_tpu.ops import bitpack, colorspace, entropy, motion

W, H = 1920, 1152
NF = int(os.environ.get("PROF_NF", "12"))
B = int(os.environ.get("PROF_B", "8"))
STAGES = ("subsample", "motion", "dct", "sym_nz_dc", "sym_kernel",
          "symbolize", "pack", "merge", "full", "full_vmapped_append")


def frame_through(stage, yy, uu, vv, pyy, puu, pvv, i_f, fno):
    """One stream's frame pipeline truncated after `stage` (checksum keeps
    everything live).  Mirrors the production kernel selection."""
    y, u, v = colorspace.subsample_420(yy, uu, vv)
    if stage == "subsample":
        return pyy, puu, pvv, y.astype(jnp.int32).sum() + u.astype(jnp.int32).sum()
    tf_pallas = M._TRANSFORM_IMPL == "pallas" or (
        M._TRANSFORM_IMPL == "auto" and jax.default_backend() == "tpu")
    mr = motion.estimate_and_predict_planes(y, u, v, pyy, puu, pvv, i_f == 0, 6, 3)
    if stage == "motion":
        return pyy, puu, pvv, mr.pred_y.sum() + mr.mvx.sum() + mr.pred_u.sum()
    if tf_pallas:
        from fpga_mpeg2_encoder_tpu.ops.pallas.transform import transform_recon_pallas
        qzig, ry, ru, rv = transform_recon_pallas(
            y, u, v, mr.pred_y, mr.pred_u, mr.pred_v, mr.inter, 2)
    else:
        from fpga_mpeg2_encoder_tpu.ops import dct
        nby, nbx = H // 16, W // 16
        yb = M._blockify(y.astype(jnp.int32), 16)
        ub = M._blockify(u.astype(jnp.int32), 8)
        vb = M._blockify(v.astype(jnp.int32), 8)
        cur_t = M._tiles(yb, ub, vb)
        pred_t = M._tiles(M._blockify(mr.pred_y, 16),
                          M._blockify(mr.pred_u, 8), M._blockify(mr.pred_v, 8))
        resid = (cur_t - pred_t).reshape(-1, 64).T
        inter_t = jnp.repeat(mr.inter.reshape(-1), 6)
        q = dct.quantize(dct.fdct(resid), inter_t, 2)
        rr = dct.idct(dct.dequantize(q, inter_t, 2))
        recon_t = jnp.clip(pred_t.reshape(-1, 64).T + rr, 0, 255).T \
            .reshape(nby, nbx, 6, 64)
        ry = M._unblockify(M._untile_y(recon_t[:, :, :4])).astype(jnp.uint8)
        ru = M._unblockify(recon_t[:, :, 4].reshape(nby, nbx, 8, 8)).astype(jnp.uint8)
        rv = M._unblockify(recon_t[:, :, 5].reshape(nby, nbx, 8, 8)).astype(jnp.uint8)
        qzig = q[entropy._ZIG_INV_NP, :].T.reshape(nby, nbx, 6, 64)
    if stage == "dct":
        return ry, ru, rv, qzig.sum()
    if stage == "sym_nz_dc":
        # symbolize sub-stage A: the XLA prep's big-array passes only
        # (nz/cbp + the DC slice) - isolates full-grid reads from the rest
        nz = jnp.logical_not(mr.inter)[:, :, None] | (qzig != 0).any(-1)
        dc = qzig[..., 0]
        return ry, ru, rv, nz.astype(jnp.int32).sum() + dc.sum()
    if stage == "sym_kernel":
        # symbolize sub-stage B: zmod build + the acsym kernel alone (dummy
        # small grid) - symbolize minus this minus sym_nz_dc approximates
        # the small-slot XLA prep (one-hot lookups, predictor chains,
        # header rows and their .at scatters)
        from fpga_mpeg2_encoder_tpu.ops.pallas.acsym import (
            HDR_SLOTS, SLOTS_PER_MB, ac_slot_grid_pallas)
        nby, nbx = mr.inter.shape
        emit0 = jnp.logical_not(mr.inter)[:, :, None] | (qzig[..., 0] != 0)
        zmod = qzig.at[..., 0].set(emit0.astype(qzig.dtype))
        small = jnp.zeros((nby, HDR_SLOTS + nbx * SLOTS_PER_MB), jnp.uint32)
        slots = ac_slot_grid_pallas(zmod.reshape(nby, nbx * 6 * 64), small)
        return ry, ru, rv, slots.astype(jnp.int32).sum()
    fs = entropy.symbolize_frame(qzig, mr.inter, mr.mvx, mr.mvy, i_f, fno, 2)
    if stage == "symbolize":
        return ry, ru, rv, fs.slots.astype(jnp.int32).sum()
    rw, rb, _ = bitpack.pack_slots(fs.slots, 4096, budget_bps=8)
    if stage == "pack":
        return ry, ru, rv, rw.astype(jnp.int32).sum() + rb.sum()
    fwd, fb = bitpack.merge_rows(rw, rb, 262144)
    if stage == "merge":
        return ry, ru, rv, fwd.astype(jnp.int32).sum() + fb
    return ry, ru, rv, (fwd, fb)


def make_run(stage, b):
    vframe = jax.vmap(lambda yy, uu, vv, py, pu, pv, i_f, fno:
                      frame_through(stage, yy, uu, vv, py, pu, pv, i_f, fno))

    def body(carry, xs):
        pyy, puu, pvv, sw, sb, i_f, fno = carry
        out = vframe(*xs, pyy, puu, pvv, i_f, fno)
        if stage == "full":
            # production form: scatter-free batched append (unrolled
            # static-row slice updates, bitpack.append_bitstrings_batched)
            ry, ru, rv, (fwd, fb) = out
            sw, sb = bitpack.append_bitstrings_batched(sw, sb, fwd, fb)
        elif stage == "full_vmapped_append":
            # the pre-r04 form: vmapped scalar append -> per-row dynamic
            # offsets become gather/scatter; this row quantifies that tax
            ry, ru, rv, (fwd, fb) = out
            sw, sb = jax.vmap(bitpack.append_bitstring)(sw, sb, fwd, fb)
        else:
            ry, ru, rv, chk = out
            sb = sb + chk.astype(jnp.int32)
        return (ry, ru, rv, sw, sb,
                jnp.where(i_f >= 23, 0, i_f + 1), fno + 1), None

    @jax.jit
    def run(fy, fu, fv, py, pc1, pc2, salt):
        sw0 = jnp.zeros((b, 2097152), jnp.uint32)
        c0 = (py, pc1, pc2, sw0, salt,
              jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32))
        c, _ = jax.lax.scan(body, c0, (fy, fu, fv))
        return c[3], c[4]

    return run


def bench_stage(stage, b, fy1, fu1, fv1):
    """Return min ms per frame-per-stream over 4 timed runs at batch b."""
    # (NF, B, H, W): scan over frames, vmap over streams; streams differ by roll
    fy = jnp.stack([jnp.roll(fy1, s, axis=1) for s in range(b)], axis=1)
    fu = jnp.stack([jnp.roll(fu1, s, axis=1) for s in range(b)], axis=1)
    fv = jnp.stack([jnp.roll(fv1, s, axis=1) for s in range(b)], axis=1)
    py = jnp.zeros((b, H, W), jnp.uint8)
    pc = jnp.zeros((b, H // 2, W // 2), jnp.uint8)
    salts = [jnp.full(b, r, jnp.int32) for r in range(5)]
    run = make_run(stage, b)
    out = run(fy, fu, fv, py, pc, pc, salts[4])
    _ = int(out[1].sum()) if stage != "full" else int(out[1][0])
    jax.block_until_ready(out)
    ts = []
    for r in range(4):
        fyr = jnp.roll(fy, r + 1, axis=0)
        jax.block_until_ready(fyr)
        t0 = time.perf_counter()
        out = run(fyr, fu, fv, py, pc, pc, salts[r])
        _ = int(out[1].sum()) if stage != "full" else int(out[1][0])
        ts.append((time.perf_counter() - t0) / (NF * b) * 1000)
    return min(ts)


def main(stages):
    frames = make_frames(W, H, NF)
    fy1 = jnp.asarray(np.stack([f[0] for f in frames]))
    fu1 = jnp.asarray(np.stack([f[1] for f in frames]))
    fv1 = jnp.asarray(np.stack([f[2] for f in frames]))
    jax.block_until_ready((fy1, fu1, fv1))
    print(f"{'stage':12s} {'B=1 ms/f':>10s} {'B=%d ms/f/s' % B:>12s} {'tax':>7s}")
    prev1 = prevb = 0.0
    for stage in stages:
        t1 = bench_stage(stage, 1, fy1, fu1, fv1)
        tb = bench_stage(stage, B, fy1, fu1, fv1)
        d1, db = t1 - prev1, tb - prevb
        print(f"{stage:12s} {t1:10.2f} {tb:12.2f} {tb / t1:6.2f}x"
              f"   (delta {d1:6.2f} -> {db:6.2f})", flush=True)
        prev1, prevb = t1, tb
    agg = W * H * NF * B
    print(f"\nfull-row aggregate at B={B}: "
          f"{agg / (prevb * NF * B) / 1e3:.1f} MPixels/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(STAGES))
