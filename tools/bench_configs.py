#!/usr/bin/env python3
"""BASELINE.json config-coverage benchmarks (VERDICT round-1 item 6).

Measures, on the real chip, with bench.py's honesty rules (content-varied
reps, forced completion by scalar readback, frames staged in HBM):

* config 2: 352x288 CIF IPPP throughput;
* config 3: 720x576 SD IPPP throughput;
* config 4: 1920x1152 with pframes_count=255 (single I then 255 P) - the
  peak-throughput GOP shape named by BASELINE.json;
* config 5: batched 8-stream 1920x1152 aggregate throughput on ONE chip via
  BatchEncoder's device-resident scan (on real multi-chip hardware the batch
  shards over the `stream` mesh axis with per-stream bit-exactness; on one
  chip this records the aggregate-throughput datapoint available here).

Writes BENCH_CONFIGS_r04.json and prints one JSON line per config.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_filmic_frames, make_frames
    from fpga_mpeg2_encoder_tpu import EncoderConfig, SequenceConfig
    from fpga_mpeg2_encoder_tpu.models.encoder import encode_gop_scan
    from fpga_mpeg2_encoder_tpu.parallel.dp import encode_gops_batched

    results = []

    def run_single(label, w, h, nf, pframes, row_cap, frame_cap, seq_cap,
                   maker=make_frames, unroll=1):
        frames = maker(w, h, nf)
        fy = jnp.asarray(np.stack([f[0] for f in frames]))
        fu = jnp.asarray(np.stack([f[1] for f in frames]))
        fv = jnp.asarray(np.stack([f[2] for f in frames]))
        py = jnp.zeros((h, w), jnp.uint8)
        pc = jnp.zeros((h // 2, w // 2), jnp.uint8)
        kw = dict(yr=6, ur=3, q_level=2, row_cap=row_cap,
                  frame_cap=frame_cap, seq_cap=seq_cap, unroll=unroll)
        fys = [jnp.roll(fy, r, axis=0) for r in range(4)]
        jax.block_until_ready(fys)

        def run(y):
            return encode_gop_scan(y, fu, fv, py, pc, pc, jnp.int32(0),
                                   jnp.int32(0), jnp.int32(pframes), **kw)
        out = run(fys[0])
        int(out[4])
        best = float("inf")
        ovf = bool(out[7])
        for r in range(1, 4):
            t0 = time.perf_counter()
            out = run(fys[r])
            int(out[4])
            best = min(best, time.perf_counter() - t0)
            ovf = ovf or bool(out[7])    # every rep must stay in budget
        assert not ovf, f"{label}: overflow"
        mpix = w * h * nf / best / 1e6
        results.append({"metric": label, "value": round(mpix, 1),
                        "unit": "MPixels/s", "vs_baseline": round(mpix / 268, 3)})

    # configs 2-3: the reference testbench geometries (BASELINE configs).
    # Small frames amortise the per-dispatch/readback floor with DEEP scan
    # chunks (384 CIF frames are still only ~150 MB of staged planes) and
    # multi-frame scan-step unrolling (lets XLA overlap frame n's entropy
    # tail with frame n+1's subsample/ME front; bit-identical).
    run_single("encode_throughput_352x288_ippp", 352, 288, 384, 23,
               1024, 32768, 4194304, unroll=4)
    run_single("encode_throughput_720x576_ippp", 720, 576, 192, 23,
               2048, 65536, 8388608, unroll=2)
    # config 4: 1920x1152, pframes_count=255 (one I, then all P)
    run_single("encode_throughput_1920x1152_p255", 1920, 1152, 48, 255,
               4096, 262144, 4194304)
    # filmic-statistics content (natural low-frequency energy + grain):
    # derisks the entropy budget vs real-world material
    run_single("encode_throughput_1920x1152_filmic", 1920, 1152, 48, 23,
               4096, 262144, 4194304, maker=make_filmic_frames)

    # small frames leave the chip idle per-stream (scan-step overheads
    # dominate at 0.1 MPixel frames); stream batching is the deployment
    # answer - record the 8-stream CIF aggregate alongside
    def run_batched(label, b, w, h, nf, row_cap, frame_cap, seq_cap,
                    unroll=1):
        frames = make_frames(w, h, nf)
        fy1 = np.stack([f[0] for f in frames])
        fu1 = np.stack([f[1] for f in frames])
        fv1 = np.stack([f[2] for f in frames])
        fy = jnp.asarray(np.stack([np.roll(fy1, k, axis=0) for k in range(b)]))
        fu = jnp.asarray(np.stack([fu1] * b))
        fv = jnp.asarray(np.stack([fv1] * b))
        py = jnp.zeros((b, h, w), jnp.uint8)
        pc = jnp.zeros((b, h // 2, w // 2), jnp.uint8)
        z = jnp.zeros((b,), jnp.int32)
        pf = jnp.full((b,), 23, jnp.int32)
        kw = dict(yr=6, ur=3, q_level=2, row_cap=row_cap, frame_cap=frame_cap,
                  seq_cap=seq_cap, unroll=unroll)
        fys = [jnp.roll(fy, r, axis=1) for r in range(4)]
        jax.block_until_ready(fys)

        def runb(y):
            return encode_gops_batched(y, fu, fv, py, pc, pc, z, z, pf, **kw)
        out = runb(fys[0])
        int(out[4][0])
        best = float("inf")
        ovf = bool(np.asarray(out[7]).any())
        for r in range(1, 4):
            t0 = time.perf_counter()
            out = runb(fys[r])
            int(out[4][0])
            best = min(best, time.perf_counter() - t0)
            ovf = ovf or bool(np.asarray(out[7]).any())
        assert not ovf, f"{label}: overflow"
        mpix = b * w * h * nf / best / 1e6
        results.append({"metric": label, "value": round(mpix, 1),
                        "unit": "MPixels/s",
                        "vs_baseline": round(mpix / 268, 3)})

    run_batched("encode_throughput_8x352x288_aggregate", 8, 352, 288, 48,
                1024, 32768, 524288, unroll=4)

    # config 5: batched 8-stream 1080p aggregate on one chip
    b, w, h, nf = 8, 1920, 1152, 12
    frames = make_frames(w, h, nf)
    fy1 = np.stack([f[0] for f in frames])
    fu1 = np.stack([f[1] for f in frames])
    fv1 = np.stack([f[2] for f in frames])
    fy = jnp.asarray(np.stack([np.roll(fy1, k, axis=0) for k in range(b)]))
    fu = jnp.asarray(np.stack([fu1] * b))
    fv = jnp.asarray(np.stack([fv1] * b))
    py = jnp.zeros((b, h, w), jnp.uint8)
    pc = jnp.zeros((b, h // 2, w // 2), jnp.uint8)
    z = jnp.zeros((b,), jnp.int32)
    pf = jnp.full((b,), 23, jnp.int32)
    kw = dict(yr=6, ur=3, q_level=2, row_cap=4096, frame_cap=262144,
              seq_cap=1048576, unroll=2)
    fys = [jnp.roll(fy, r, axis=1) for r in range(4)]
    jax.block_until_ready(fys)

    def runb(y):
        return encode_gops_batched(y, fu, fv, py, pc, pc, z, z, pf, **kw)
    out = runb(fys[0])
    int(out[4][0])
    best = float("inf")
    ovf = bool(np.asarray(out[7]).any())
    for r in range(1, 4):
        t0 = time.perf_counter()
        out = runb(fys[r])
        int(out[4][0])
        best = min(best, time.perf_counter() - t0)
        ovf = ovf or bool(np.asarray(out[7]).any())
    assert not ovf, "batched overflow"
    mpix = b * w * h * nf / best / 1e6
    results.append({"metric": "encode_throughput_8x1920x1152_aggregate",
                    "value": round(mpix, 1), "unit": "MPixels/s",
                    "vs_baseline": round(mpix / 268, 3)})

    with open("/root/repo/BENCH_CONFIGS_r04.json", "w") as f:
        json.dump(results, f, indent=1)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
