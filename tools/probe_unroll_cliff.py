#!/usr/bin/env python3
"""Root-cause the CIF unroll=12 throughput cliff (VERDICT r04 weak item 1/
item 6): 68 MP/s at depth 12 vs 241 at depth 8 - a 3.5x regression in a
shipped knob.

For each unroll depth, compile the CIF GOP scan once and report:
  * compile wall time (recompile pathology would show here),
  * executable memory analysis (argument/output/temp/generated-code bytes -
    a spill pathology shows as temp-allocation blow-up),
  * steady-state execution throughput (queued reps, one combined readback).

Run on the rig: python tools/probe_unroll_cliff.py  (PROF_UNROLLS=1,8,12)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

W = int(os.environ.get("PROF_W", "352"))
H = int(os.environ.get("PROF_H", "288"))
NF = int(os.environ.get("PROF_NF", "96"))
UNROLLS = tuple(int(u) for u in
                os.environ.get("PROF_UNROLLS", "1,8,12").split(","))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from bench import make_frames
    from fpga_mpeg2_encoder_tpu.models.encoder import encode_gop_scan

    print(f"backend: {jax.default_backend()}  {W}x{H} NF={NF} "
          f"unrolls={UNROLLS}", flush=True)
    frames = make_frames(W, H, NF)
    fy = jnp.asarray(np.stack([f[0] for f in frames]))
    fu = jnp.asarray(np.stack([f[1] for f in frames]))
    fv = jnp.asarray(np.stack([f[2] for f in frames]))
    py = jnp.zeros((H, W), jnp.uint8)
    pc = jnp.zeros((H // 2, W // 2), jnp.uint8)
    fys = [jnp.roll(fy, r, axis=0) for r in range(4)]
    jax.block_until_ready(fys)

    for u in UNROLLS:
        kw = dict(yr=6, ur=3, q_level=2, row_cap=1024, frame_cap=32768,
                  seq_cap=4194304, unroll=u)

        def run(y):
            return encode_gop_scan(y, fu, fv, py, pc, pc, jnp.int32(0),
                                   jnp.int32(0), jnp.int32(23), **kw)

        t0 = time.perf_counter()
        lowered = jax.jit(run).lower(fys[0])
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        mem = {}
        try:
            ma = compiled.memory_analysis()
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes",
                      "alias_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    mem[k.replace("_size_in_bytes", "")] = f"{v / 1e6:.1f}MB"
        except Exception as e:          # noqa: BLE001 - probe-only
            mem["error"] = str(e)[:80]

        out = compiled(fys[0])
        int(out[4])                      # warm-up + completion
        reps = 3
        t0 = time.perf_counter()
        outs = [compiled(fys[1 + r]) for r in range(reps)]
        force = outs[0][4]
        for o in outs[1:]:
            force = force + o[4]
        int(force)
        dt = (time.perf_counter() - t0) / reps
        mpix = W * H * NF / dt / 1e6
        print(f"unroll={u:3d}: lower {t_lower:5.1f}s  compile {t_compile:6.1f}s"
              f"  exec {dt * 1e3 / NF:6.3f} ms/frame  {mpix:7.1f} MP/s  {mem}",
              flush=True)


if __name__ == "__main__":
    main()
