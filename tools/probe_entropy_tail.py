#!/usr/bin/env python3
"""On-chip micro-profile of the entropy tail: acsym kernel, pack phase 1,
pack phase 2, and the row merge, timed separately at the 1080p geometry with
realistic slot statistics (from an actual encoded frame's slot grid).

The stage profiler gives acsym=0.69 / pack=0.62 ms/frame as whole-stage
deltas; this probe splits pack into its two pallas_call phases and times the
acsym kernel's two halves (chunked lookup loop vs routing barrel) by timing
variant kernels, to decide where the next rework goes.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_frames
from fpga_mpeg2_encoder_tpu.models import encoder as M
from fpga_mpeg2_encoder_tpu.ops import colorspace, entropy, motion
from fpga_mpeg2_encoder_tpu.ops.pallas import acsym as K
from fpga_mpeg2_encoder_tpu.ops.pallas import pack as KP
from fpga_mpeg2_encoder_tpu.ops.pallas.transform import transform_recon_pallas

W, H, NF = 1920, 1152, 8
ROW_CAP, BUDGET = 4096, 8


def timeit(name, f, variants, reps=24):
    """Steady-state timing: `variants` is a list of distinct arg tuples (the
    axon runtime caches identical executions); reps are queued back-to-back
    and ONE combined scalar readback forces the batch, so the ~25 ms tunnel
    round trip is charged once against the whole batch."""
    outs = [f(*v) for v in variants]
    jax.block_until_ready(outs)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        acc = None
        for i in range(reps):
            out = f(*variants[i % len(variants)])
            leaf = jax.tree_util.tree_leaves(out)[0]
            s = leaf.reshape(-1)[0].astype(jnp.int32)
            acc = s if acc is None else acc + s
        int(acc)
        best = min(best, (time.perf_counter() - t0) / reps * 1000)
    print(f"{name:28s}: {best:8.3f} ms", flush=True)
    return best


def main():
    frames = make_frames(W, H, NF)
    y, u, v = colorspace.subsample_420(*[jnp.asarray(p) for p in frames[3]])
    py, pu, pv = colorspace.subsample_420(*[jnp.asarray(p) for p in frames[2]])
    mr = motion.estimate_and_predict_planes(
        y, u, v, py, pu, pv, jnp.asarray(False), 6, 3)
    qzig, ry, ru, rv = transform_recon_pallas(
        y, u, v, mr.pred_y, mr.pred_u, mr.pred_v, mr.inter, 2)
    sym = entropy.symbolize_frame(
        qzig, mr.inter, mr.mvx, mr.mvy, jnp.int32(1), jnp.int32(3), 2)
    slots = sym.slots
    jax.block_until_ready(slots)
    nby = H // 16
    print(f"slot grid: {slots.shape}, nonzero slots: "
          f"{int((np.asarray(slots) != 0).sum())} / {slots.size}", flush=True)
    slot_vars = [jnp.roll(slots, r, axis=0) for r in range(4)]

    # ---- acsym kernel alone (as called inside symbolize_frame) -----------
    nbx = W // 16
    zmod = jnp.asarray(
        np.random.default_rng(0).integers(-4, 5, (nby, nbx * 384), np.int32)
        * (np.random.default_rng(1).random((nby, nbx * 384)) < 0.12))
    small = jnp.zeros((nby, K.HDR_SLOTS + nbx * K.SLOTS_PER_MB), jnp.uint32)
    f_acsym = jax.jit(K.ac_slot_grid_pallas)
    timeit("acsym kernel", f_acsym,
           [(jnp.roll(zmod, r, axis=0), small) for r in range(4)])

    # ---- pack phases ------------------------------------------------------
    f_pack = jax.jit(functools.partial(
        KP.pack_slots_pallas, cap_words=ROW_CAP, budget_bps=BUDGET))
    timeit("pack (both phases)", f_pack, [(v,) for v in slot_vars])

    # phase 1 alone: replicate the call-site prep
    r, s = slots.shape
    s2 = max(256, 1 << (s - 1).bit_length())
    rp = -(-r // KP._RB) * KP._RB
    nlev = s2.bit_length() - 1
    cap128 = -(-ROW_CAP // 128) * 128
    widths = [2]
    for level in range(2, nlev + 1):
        w_new, _ = KP._level_width(level, widths[-1], cap128, BUDGET, 1536)
        if level >= nlev - 7:
            w_new = min(-(-w_new // 128) * 128, cap128)
        widths.append(w_new)
    widths = tuple(widths)
    print(f"s2={s2} widths={widths}")

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def phase1(slots_in):
        c = jnp.pad(slots_in, ((0, rp - r), (0, s2 - s)))
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

    f_p1 = jax.jit(phase1)
    buf = f_p1(slots)
    jax.block_until_ready(buf)
    timeit("pack phase 1", f_p1, [(v,) for v in slot_vars])

    def phase2(buf_in, slots_in):
        c = jnp.pad(slots_in, ((0, rp - r), (0, s2 - s)))
        c = KP._bit_reverse(c, s2)
        l = (c >> 27).astype(jnp.int32)
        w1 = widths[nlev - 8]
        buf_t = buf_in.transpose(0, 2, 3, 1).reshape(rp, 128, w1)
        pl9 = l
        for _ in range(nlev - 7):
            half = pl9.shape[1] // 2
            pl9 = pl9[:, :half] + pl9[:, half:]
        w_final = widths[-1]
        return pl.pallas_call(
            functools.partial(KP._phase2_kernel, w1, s2, widths),
            grid=(rp // KP._RB,),
            in_specs=[
                pl.BlockSpec((KP._RB, 128, w1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KP._RB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((KP._RB, w_final), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp, w_final), jnp.uint32),
            **KP._compiler_params(),
        )(buf_t, pl9)

    f_p2 = jax.jit(phase2)
    jax.block_until_ready(f_p2(buf, slots))
    timeit("pack phase 2 (+prep)", f_p2,
           [(f_p1(v), v) for v in slot_vars])

    # ---- row merge --------------------------------------------------------
    rw, rb, _ = KP.pack_slots_pallas(slots, ROW_CAP, BUDGET)
    jax.block_until_ready((rw, rb))
    f_m = jax.jit(functools.partial(KP.merge_rows_pallas,
                                    cap_words=262144))
    timeit("merge rows", f_m,
           [(jnp.roll(rw, r, axis=0), jnp.roll(rb, r)) for r in range(4)])


if __name__ == "__main__":
    main()
