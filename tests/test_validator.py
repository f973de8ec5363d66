"""The independent ISO 13818-2 validator (golden/validator.py) against every
stream family the framework emits.

This is the verification path that shares no reconstruction code with the
encoder (VERDICT round-1 item 4): full field-by-field syntax checks plus an
ISO-formula decode whose reconstruction must track the encoder's recon within
GOP-bounded drift (float IDCT + mismatch control vs the RTL's Chen-Wang
pipeline are not bit-identical by design; conformance keeps them within ~1
LSB per coefficient, so PSNR stays very high).
"""
import numpy as np
import pytest

from fpga_mpeg2_encoder_tpu import Encoder, EncoderConfig, SequenceConfig
from fpga_mpeg2_encoder_tpu.golden import encoder as G
from fpga_mpeg2_encoder_tpu.golden.decoder import decode_sequence
from fpga_mpeg2_encoder_tpu.golden.validator import (
    ValidationError,
    validate_sequence,
)

from conftest import make_video

PSNR_FLOOR_DB = 45.0


def _validate_against_recon(stream: bytes, n_frames: int):
    val = validate_sequence(stream, expected_frames=n_frames)
    dec = decode_sequence(stream)
    recon = [(p.y, p.u, p.v) for p in dec.pictures]
    for c in range(3):
        p = val.psnr_vs(recon, c)
        assert p > PSNR_FLOOR_DB, f"component {c}: {p:.1f} dB"
    assert [p.coding_type for p in val.pictures] == \
        [1 if m.coding_type == 1 else 2 for m in dec.pictures]
    return val


@pytest.mark.parametrize("kind,q_level,vector_level", [
    ("pan", 2, 3), ("noise", 2, 3), ("still", 1, 1), ("pan", 4, 2),
])
def test_streams_validate(rng, kind, q_level, vector_level):
    w, h, nf = 96, 64, 7
    frames = make_video(rng, w, h, nf, kind)
    cfg = EncoderConfig(xl=7, yl=6, vector_level=vector_level, q_level=q_level)
    s = Encoder(cfg).encode(frames, w, h, pframes_count=2)
    val = _validate_against_recon(s, nf)
    assert val.width == w and val.height == h
    assert val.bit_rate_units == 10000            # 4 Mbps in 400 bps units


def test_gop_timecodes_match_frame_counter(rng):
    """Timecode fields in every GOP header follow the 24 fps counter
    (RTL:2684-2698): GOP k starts at frame k*(pframes_count+1)."""
    w, h, nf, pf = 64, 64, 10, 1
    frames = make_video(rng, w, h, nf, "still")
    cfg = EncoderConfig(xl=7, yl=6, vector_level=1, q_level=3)
    s = Encoder(cfg).encode(frames, w, h, pframes_count=pf)
    val = validate_sequence(s, expected_frames=nf)
    assert len(val.gop_timecodes) == (nf + pf) // (pf + 1)
    for k, (drop, hh, mm, ss, ff) in enumerate(val.gop_timecodes):
        frame_no = k * (pf + 1)
        assert (drop, hh, mm, ss, ff) == (
            0, frame_no // (24 * 3600), (frame_no // (24 * 60)) % 60,
            (frame_no // 24) % 60, frame_no % 24)


def test_partial_stop_stream_validates(rng):
    w, h = 96, 64
    frames = make_video(rng, w, h, 3, "pan")
    cfg = EncoderConfig(xl=7, yl=6, vector_level=3, q_level=2)
    s = Encoder(cfg).encode(frames, w, h, pframes_count=2,
                            stop_mode="partial", partial_groups=w // 4 * 24 + 5)
    _validate_against_recon(s, 3)


def test_golden_encoder_streams_validate(rng):
    """The NumPy oracle's output passes the independent validator too."""
    w, h = 64, 64
    frames = make_video(rng, w, h, 4, "noise")
    cfg = EncoderConfig(xl=7, yl=6, vector_level=3, q_level=2)
    s = G.encode_sequence(cfg, SequenceConfig(w, h, 3), frames)
    _validate_against_recon(s, 4)


@pytest.mark.parametrize("byte,mask,desc", [
    (7, 0x20, "aspect/frame-rate fields"),
    (11, 0x80, "vbv/marker region"),
    (0, 0xFF, "sequence start code"),
])
def test_corruption_detected(rng, byte, mask, desc):
    w, h = 64, 64
    frames = make_video(rng, w, h, 2, "still")
    cfg = EncoderConfig(xl=7, yl=6, vector_level=3, q_level=2)
    s = bytearray(Encoder(cfg).encode(frames, w, h, pframes_count=1))
    s[byte] ^= mask
    with pytest.raises(ValidationError):
        validate_sequence(bytes(s))


def test_truncation_detected(rng):
    w, h = 64, 64
    frames = make_video(rng, w, h, 2, "still")
    cfg = EncoderConfig(xl=7, yl=6, vector_level=3, q_level=2)
    s = Encoder(cfg).encode(frames, w, h, pframes_count=1)
    with pytest.raises(ValidationError):
        validate_sequence(s[:len(s) // 2 // 32 * 32])   # keep 32B multiple


def test_wrong_frame_count_detected(rng):
    w, h = 64, 64
    frames = make_video(rng, w, h, 3, "still")
    cfg = EncoderConfig(xl=7, yl=6, vector_level=3, q_level=2)
    s = Encoder(cfg).encode(frames, w, h, pframes_count=1)
    with pytest.raises(ValidationError):
        validate_sequence(s, expected_frames=4)
