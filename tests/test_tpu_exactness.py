"""TPU-only bit-exactness checks.

The CPU test suite cannot catch TPU matmul precision semantics (TPU truncates f32
matmul operands to bf16 at default precision - this bit us once in the one-hot
VLC lookups).  These tests run only when a real TPU is the default backend:

    JAX_PLATFORMS= python -m pytest tests/test_tpu_exactness.py -q

They are skipped under the forced-CPU conftest unless TPU_EXACTNESS=1 launches a
separate process without the CPU override.
"""
import os

import numpy as np
import pytest

import jax

tpu_only = pytest.mark.skipif(
    jax.default_backend() in ("cpu",), reason="needs a real TPU backend")


@tpu_only
def test_tpu_stream_bit_exact_vs_golden():
    from fpga_mpeg2_encoder_tpu import Encoder, EncoderConfig, SequenceConfig
    from fpga_mpeg2_encoder_tpu.golden import encoder as G

    rng = np.random.default_rng(11)
    frames = [tuple(rng.integers(0, 256, (64, 96), dtype=np.uint8)
                    for _ in range(3)) for _ in range(4)]
    cfg = EncoderConfig(xl=5, yl=5, q_level=1)
    got = Encoder(cfg).encode(frames, 96, 64, 1)
    want = G.encode_sequence(cfg, SequenceConfig(96, 64, 1), frames)
    assert got == want


@tpu_only
def test_tpu_chunked_equals_streaming():
    from fpga_mpeg2_encoder_tpu import Encoder, EncoderConfig

    rng = np.random.default_rng(12)
    frames = [tuple(rng.integers(0, 256, (64, 64), dtype=np.uint8)
                    for _ in range(3)) for _ in range(6)]
    enc = Encoder(EncoderConfig(xl=4, yl=4))
    a = enc.encode(frames, 64, 64, 2, chunk_frames=6)
    b = enc.encode(frames, 64, 64, 2)
    assert a == b


@tpu_only
def test_pallas_sad_volume_matches_xla():
    import jax.numpy as jnp
    from fpga_mpeg2_encoder_tpu.ops.pallas.sad import sad_volume_pallas

    h, w, yr = 64, 128, 6
    rng = np.random.default_rng(3)
    cur = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    prev = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    got = np.asarray(sad_volume_pallas(cur, prev, yr))

    c = cur.astype(jnp.int32)
    p = jnp.pad(prev, yr).astype(jnp.int32)
    want = []
    for dy in range(-yr, yr + 1):
        for dx in range(-yr, yr + 1):
            win = jax.lax.dynamic_slice(p, (yr + dy, yr + dx), (h, w))
            want.append(np.asarray(
                jnp.abs(c - win).reshape(h // 16, 16, w // 16, 16).sum(axis=(1, 3))))
    assert (np.stack(want) == got).all()
