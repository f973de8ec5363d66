#!/usr/bin/env python3
"""Per-stage device profiling of the frame pipeline via scan ablation.

This rig's runtime caches identical executions and `block_until_ready` can
return early, so naive per-op timing lies.  The reliable method: build scan
variants of the full multi-frame pipeline truncated after each stage (a
checksum keeps everything live), run each with genuinely different content,
force completion with a scalar readback, and report the min over several runs.
Stage costs are the deltas between consecutive rows (each row also carries the
~2 ms/frame readback+dispatch floor at nf=12).

Run: python tools/profile_stages.py [stage ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_frames
from fpga_mpeg2_encoder_tpu.models import encoder as M
from fpga_mpeg2_encoder_tpu.ops import bitpack, colorspace, dct, entropy, motion

_env = __import__("os").environ
W = int(_env.get("PROF_W", "1920"))
H = int(_env.get("PROF_H", "1152"))
NF = int(_env.get("PROF_NF", "12"))
ROW_CAP = int(_env.get("PROF_ROW_CAP", "4096"))
FRAME_CAP = int(_env.get("PROF_FRAME_CAP", "262144"))
NBY, NBX = H // 16, W // 16
STAGES = ("nop", "subsample", "motion", "dct", "sym_nz_dc", "sym_kernel",
          "symbolize", "pack_p1", "pack", "merge",
          "full")


def _pack_phase1_fn():
    """Phase-1-only runner over the production pack kernel's internals:
    bit-reversal prep + the phase-1 pallas_call (slot pairs -> 128-node
    buffers).  `pack` minus this row isolates phase 2 + the row-bits pyramid."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fpga_mpeg2_encoder_tpu.ops.pallas import pack as KP

    def run(slots):
        r, s = slots.shape
        s2 = max(256, 1 << (s - 1).bit_length())
        rp = -(-r // KP._RB) * KP._RB
        nlev = s2.bit_length() - 1
        cap128 = -(-ROW_CAP // 128) * 128
        widths = [2]
        for level in range(2, nlev + 1):
            w_new, _ = KP._level_width(level, widths[-1], cap128, 8, 1536)
            if level >= nlev - 7:
                w_new = min(-(-w_new // 128) * 128, cap128)
            widths.append(w_new)
        widths = tuple(widths)
        c = jnp.pad(slots, ((0, rp - r), (0, s2 - s)))
        c = KP._bit_reverse(c, s2)
        w1 = widths[nlev - 8]
        return pl.pallas_call(
            functools.partial(KP._phase1_kernel, s2, widths),
            grid=(rp // KP._RB,),
            in_specs=[pl.BlockSpec((KP._RB, s2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, w1, KP._RB, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp // KP._RB, w1, KP._RB, 128),
                                           jnp.uint32),
            **KP._compiler_params(),
        )(c)

    return run


def make_scan(stage):
    def frame(yy, uu, vv, pyy, puu, pvv, i_f, fno):
        if stage == "nop":
            # scan/dispatch floor: touch one vector of each input so nothing
            # constant-folds, do no pipeline work.  The subsample row minus
            # this row is the honest subsample cost.
            chk = (yy[0, :256].astype(jnp.int32).sum()
                   + uu[0, :256].astype(jnp.int32).sum()
                   + vv[0, :256].astype(jnp.int32).sum())
            return pyy, puu, pvv, chk
        y, u, v = colorspace.subsample_420(yy, uu, vv)
        if stage == "subsample":
            return pyy, puu, pvv, y.astype(jnp.int32).sum() + u.astype(jnp.int32).sum()
        tf_pallas = M._TRANSFORM_IMPL == "pallas" or (
            M._TRANSFORM_IMPL == "auto" and jax.default_backend() == "tpu")
        if tf_pallas:
            # production strip-layout path (mirrors encode_frame_core)
            from fpga_mpeg2_encoder_tpu.ops.pallas.transform import \
                transform_recon_pallas
            mr = motion.estimate_and_predict_planes(
                y, u, v, pyy, puu, pvv, i_f == 0, 6, 3)
            if stage == "motion":
                return pyy, puu, pvv, (mr.pred_y.sum() + mr.mvx.sum()
                                       + mr.pred_u.sum())
            qzig, ry, ru, rv = transform_recon_pallas(
                y, u, v, mr.pred_y, mr.pred_u, mr.pred_v, mr.inter, 2)
        else:
            mr = motion.estimate_and_predict(y, u, v, pyy, puu, pvv,
                                             i_f == 0, 6, 3)
            if stage == "motion":
                return pyy, puu, pvv, (mr.pred_y.astype(jnp.int32).sum()
                                       + mr.mvx.sum()
                                       + mr.pred_u.astype(jnp.int32).sum())
            yb = M._blockify(y.astype(jnp.int32), 16)
            ub = M._blockify(u.astype(jnp.int32), 8)
            vb = M._blockify(v.astype(jnp.int32), 8)
            cur_t = M._tiles(yb, ub, vb)
            pred_t = M._tiles(mr.pred_y, mr.pred_u, mr.pred_v)
            resid = (cur_t - pred_t).reshape(-1, 64).T
            inter_t = jnp.repeat(mr.inter.reshape(-1), 6)
            q = dct.quantize(dct.fdct(resid), inter_t, 2)
            rr = dct.idct(dct.dequantize(q, inter_t, 2))
            recon_t = jnp.clip(pred_t.reshape(-1, 64).T + rr, 0, 255).T \
                .reshape(NBY, NBX, 6, 64)
            ry = M._unblockify(M._untile_y(recon_t[:, :, :4])).astype(jnp.uint8)
            ru = M._unblockify(recon_t[:, :, 4].reshape(NBY, NBX, 8, 8)) \
                .astype(jnp.uint8)
            rv = M._unblockify(recon_t[:, :, 5].reshape(NBY, NBX, 8, 8)) \
                .astype(jnp.uint8)
            qzig = q[entropy._ZIG_INV_NP, :].T.reshape(NBY, NBX, 6, 64)
        if stage == "dct":
            return ry, ru, rv, qzig.sum()
        if stage == "sym_nz_dc":
            # symbolize sub-stage A: only the full-grid XLA passes (nz flags
            # + the DC slice) - isolates big-array reads from the rest
            nz = jnp.logical_not(mr.inter)[:, :, None] | (qzig != 0).any(-1)
            dcs = qzig[..., 0]
            return ry, ru, rv, nz.astype(jnp.int32).sum() + dcs.sum()
        if stage == "sym_kernel":
            # symbolize sub-stage B: zmod build + the acsym kernel alone with
            # a dummy small grid; symbolize minus this minus sym_nz_dc
            # approximates the small-slot XLA prep (one-hot lookups,
            # predictor chains, header rows)
            from fpga_mpeg2_encoder_tpu.ops.pallas.acsym import (
                HDR_SLOTS, SLOTS_PER_MB, ac_slot_grid_pallas)
            emit0 = jnp.logical_not(mr.inter)[:, :, None] | (qzig[..., 0] != 0)
            zmod = qzig.at[..., 0].set(emit0.astype(qzig.dtype))
            small = jnp.zeros((NBY, HDR_SLOTS + NBX * SLOTS_PER_MB),
                              jnp.uint32)
            slots = ac_slot_grid_pallas(zmod.reshape(NBY, NBX * 6 * 64), small)
            return ry, ru, rv, slots.astype(jnp.int32).sum()
        fs = entropy.symbolize_frame(qzig, mr.inter,
                                     mr.mvx, mr.mvy, i_f, fno, 2)
        if stage == "symbolize":
            return ry, ru, rv, fs.slots.astype(jnp.int32).sum()
        if stage == "pack_p1":
            buf = _pack_phase1_fn()(fs.slots)
            return ry, ru, rv, buf.astype(jnp.int32).sum()
        rw, rb, _ = bitpack.pack_slots(fs.slots, ROW_CAP, budget_bps=8)
        if stage == "pack":
            return ry, ru, rv, rw.astype(jnp.int32).sum() + rb.sum()
        fwd, fb = bitpack.merge_rows(rw, rb, FRAME_CAP)
        if stage == "merge":
            return ry, ru, rv, fwd.astype(jnp.int32).sum() + fb
        return ry, ru, rv, (fwd, fb)

    def body(carry, xs):
        pyy, puu, pvv, sw, sb, i_f, fno = carry
        out = frame(*xs, pyy, puu, pvv, i_f, fno)
        if stage == "full":
            ry, ru, rv, (fwd, fb) = out
            sw, sb = bitpack.concat_bitstrings(sw, sb, fwd, fb, 2097152)
        else:
            ry, ru, rv, chk = out
            sb = sb + chk.astype(jnp.int32)
        return (ry, ru, rv, sw, sb, jnp.where(i_f >= 23, 0, i_f + 1), fno + 1), None

    @jax.jit
    def run(fy, fu, fv, py, pc1, pc2, salt):
        sw0 = jnp.zeros(2097152, jnp.uint32)
        c0 = (py, pc1, pc2, sw0, salt, jnp.int32(0), jnp.int32(0))
        c, _ = jax.lax.scan(body, c0, (fy, fu, fv))
        return c[3], c[4]

    return run


def main(stages):
    frames = make_frames(W, H, NF)
    fy = jnp.asarray(np.stack([f[0] for f in frames]))
    fu = jnp.asarray(np.stack([f[1] for f in frames]))
    fv = jnp.asarray(np.stack([f[2] for f in frames]))
    py = jnp.zeros((H, W), jnp.uint8)
    pc = jnp.zeros((H // 2, W // 2), jnp.uint8)
    fys = [jnp.roll(fy, r, axis=0) for r in range(1, 6)]
    jax.block_until_ready(fys)
    for stage in stages:
        run = make_scan(stage)
        out = run(fy, fu, fv, py, pc, pc, jnp.int32(0))
        _ = int(out[1])
        ts = []
        for r in range(5):
            t0 = time.perf_counter()
            out = run(fys[r], fu, fv, py, pc, pc, jnp.int32(r))
            _ = int(out[1])
            ts.append((time.perf_counter() - t0) / NF * 1000)
        ts.sort()
        print(f"scan through {stage:10s}: min {ts[0]:7.2f}  med {ts[2]:7.2f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or STAGES)
