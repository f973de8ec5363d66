#!/usr/bin/env python3
"""Headline benchmark: 1920x1152 IPPP encode throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "MPixels/s",
"vs_baseline": N}.  Baseline = the reference FPGA's 268 MPixels/s
(4 px/cycle @ 67 MHz, README.md:20-22; BASELINE.md).

Measures steady-state end-to-end throughput through the public streaming API
(device pipeline + host bitstream assembly), after jit warm-up, on panning
synthetic 1920x1152 content with pframes_count=23 (the reference's sim GOP,
SIM/tb_mpeg2encoder.v:106).
"""
import json
import sys
import time

import numpy as np


def make_frames(w, h, n):
    rng = np.random.default_rng(42)
    pad = 64
    yy, xx = np.mgrid[0:h + pad, 0:w + pad]
    tex = rng.integers(0, 48, (h + pad, w + pad)).astype(np.int32)
    y = (((xx * 3 + yy * 2) // 4) % 200 + tex).astype(np.uint8)
    u = ((xx - yy) // 3 % 160 + 48).astype(np.uint8)
    v = ((xx + yy) // 5 % 120 + 64).astype(np.uint8)
    out = []
    for i in range(n):
        dy, dx = (i * 2) % pad, (i * 3) % pad
        out.append((y[dy:dy + h, dx:dx + w].copy(),
                    u[dy:dy + h, dx:dx + w].copy(),
                    v[dy:dy + h, dx:dx + w].copy()))
    return out


def main():
    from fpga_mpeg2_encoder_tpu import Encoder, EncoderConfig, SequenceConfig

    w, h = 1920, 1152
    warm, measure = 3, 24
    frames = make_frames(w, h, max(warm, 8))

    enc = Encoder(EncoderConfig(xl=7, yl=7, vector_level=3, q_level=2))
    enc.start_sequence(SequenceConfig(w, h, pframes_count=23))
    for i in range(warm):
        enc.push_frame(*frames[i % len(frames)])
    enc._drain_pending()
    import jax
    jax.block_until_ready(enc._prev)

    t0 = time.perf_counter()
    for i in range(measure):
        enc.push_frame(*frames[i % len(frames)])
    enc._drain_pending()
    jax.block_until_ready(enc._prev)
    t1 = time.perf_counter()
    stream = enc.finish()
    assert stream[:4] == b"\x00\x00\x01\xb3" and len(stream) % 32 == 0

    fps = measure / (t1 - t0)
    mpix = w * h * fps / 1e6
    print(json.dumps({
        "metric": "encode_throughput_1920x1152_ippp",
        "value": round(mpix, 1),
        "unit": "MPixels/s",
        "vs_baseline": round(mpix / 268.0, 3),
    }))


if __name__ == "__main__":
    main()
