#!/usr/bin/env python3
"""On-chip ablation of the transform STAGE at 1080p: how much of the
~1.2 ms/frame "dct" row is the Pallas kernel vs the XLA marshalling
around it (prep pads/repeats and the zig-zag tile-major relayout)?

Variants (in-jit scan slope, dodges the ~2 ms per-call dispatch floor):

  prep_only  - build cy/py/iy/cc/pc/ic (pads, repeats, concats), no kernel
  kernel     - prep + pallas_call, slice recon, SKIP the zig-zag relayout
  full       - the production transform_recon_pallas (incl. relayout)

full - kernel bounds the zig-zag corner-turn + take; kernel - prep_only
bounds the pallas_call itself.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fpga_mpeg2_encoder_tpu.ops.pallas import transform as TF

W, H = 1920, 1152
NBY, NBX = H // 16, W // 16


def build_inputs(seed):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8))
    py = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    pu = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    pv = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    inter = jnp.asarray(rng.random((NBY, NBX)) < 0.7)
    return y, u, v, py, pu, pv, inter


def variant(name):
    def run(cur_y, cur_u, cur_v, pred_y, pred_u, pred_v, inter):
        h, w = H, W
        nby, nbx = NBY, NBX
        gs = min(TF._gs_for(w), nby)
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
        if name == "prep_only":
            return (cy.sum() + py.sum() + cc.sum() + pc.sum()
                    + iy.sum() + ic.sum())
        if name == "kernel":
            # call the production wrapper's pallas_call via the public fn but
            # charge the relayout separately: reproduce the call, skip zigzag
            import functools
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            iqy, rqy, dcy = (jnp.asarray(p)
                             for p in TF._quant_planes(16 * gs, wp))
            iqc, rqc, dcc = (jnp.asarray(p)
                             for p in TF._quant_planes(8 * gs, wcp))
            def _const_spec(rows, cols):
                return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)

            qy, ry, qc, rc = pl.pallas_call(
                functools.partial(TF._kernel, 2),
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
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(cy, py, iy, cc, pc, ic, iqy, rqy, dcy, iqc, rqc, dcc)
            return qy.sum() + ry.sum() + qc.sum() + rc.sum()
        qzig, ry, ru, rv = TF.transform_recon_pallas(
            cur_y, cur_u, cur_v, pred_y, pred_u, pred_v, inter, 2)
        return (qzig.sum() + ry.astype(jnp.int32).sum()
                + ru.astype(jnp.int32).sum() + rv.astype(jnp.int32).sum())

    return run


def slope_time(run, inputs, hi=48, lo=24):
    y, u, v, py, pu, pv, inter = inputs

    def scanner(n):
        @jax.jit
        def g(y0):
            def body(c, i):
                s = run((y0 + i.astype(jnp.uint8)), u, v, py + i, pu, pv,
                        inter)
                return c + s, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n))
            return c
        return g

    ghi, glo = scanner(hi), scanner(lo)
    int(ghi(y)); int(glo(y))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); int(ghi(y))
        th = time.perf_counter() - t0
        t0 = time.perf_counter(); int(glo(y))
        tl = time.perf_counter() - t0
        best = min(best, (th - tl) / (hi - lo) * 1000)
    return best


def main():
    inputs = build_inputs(0)
    jax.block_until_ready(inputs)
    for name in ("prep_only", "kernel", "full"):
        t = slope_time(variant(name), inputs)
        print(f"{name:10s}: {t:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
