"""Long-sequence soak: 300 frames through the chunked (device-resident scan)
path with a mid-stream checkpoint/resume, plus the timecode minute rollover
(frame 1440 at 24 fps, RTL:2684-2698) - VERDICT round-1 item 9.

Timecode fields are asserted through the independent validator's GOP parse
against the RTL counter formula (itself pinned bit-level by the micro-golden
tests in test_stop_fsm.py / test_golden.py)."""
import numpy as np

from fpga_mpeg2_encoder_tpu import Encoder, EncoderConfig, SequenceConfig
from fpga_mpeg2_encoder_tpu.golden.validator import validate_sequence
from fpga_mpeg2_encoder_tpu.runtime.state import EncoderState

from conftest import make_video


def _frames(rng, n, w=64, h=64):
    base = make_video(rng, w, h, 12, "pan")
    return [base[i % 12] for i in range(n)]


def _expected_timecode(frame_no: int):
    return (0, frame_no // (24 * 3600), (frame_no // (24 * 60)) % 60,
            (frame_no // 24) % 60, frame_no % 24)


def test_soak_300_frames_chunked_with_checkpoint(rng):
    w = h = 64
    nf, pf, chunk = 300, 11, 50
    frames = _frames(rng, nf, w, h)
    cfg = EncoderConfig(xl=4, yl=4, vector_level=1, q_level=3)

    # one-shot chunked encode
    a = Encoder(cfg).encode(frames, w, h, pframes_count=pf, chunk_frames=chunk)

    # same sequence with a serialize/deserialize checkpoint halfway
    enc = Encoder(cfg)
    enc.start_sequence(SequenceConfig(w, h, pf))
    for i in range(0, nf // 2, chunk):
        enc.push_chunk(frames[i:i + chunk])
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        enc.get_state().save(path)
        state = EncoderState.load(path)
    enc._reset_sequence_state()
    enc._seq = None

    enc2 = Encoder(cfg)
    enc2.set_state(state)
    for i in range(nf // 2, nf, chunk):
        enc2.push_chunk(frames[i:i + chunk])
    b = enc2.finish()
    assert a == b, "checkpoint/resume diverged over 300 frames"

    # full validation + every GOP's timecode against the 24fps counter
    val = validate_sequence(a, expected_frames=nf)
    n_gops = (nf + pf) // (pf + 1)
    assert len(val.gop_timecodes) == n_gops
    for k, tc in enumerate(val.gop_timecodes):
        assert tc == _expected_timecode(k * (pf + 1)), f"GOP {k}"
    # 300 frames at 24 fps cross several second boundaries
    assert val.gop_timecodes[-1][3] >= 12


def test_timecode_minute_rollover(rng):
    """Resume from a checkpoint at frame 1380 and encode across frame 1440:
    the GOP headers must roll seconds 57..59 into minute 1 (RTL:2684-2698)."""
    w = h = 64
    pf = 5
    frames = _frames(rng, 120, w, h)
    cfg = EncoderConfig(xl=4, yl=4, vector_level=1, q_level=3)
    enc = Encoder(cfg)
    enc.set_state(EncoderState(
        width=w, height=h, pframes_count=pf, i_frame=0, frame_no=1380,
        recon_y=None, recon_u=None, recon_v=None, payload=b""))
    for f in frames:
        enc.push_frame(*f)
    # reuse finish() to complete, then parse GOP headers directly: the payload
    # lacks the sequence header (we started mid-stream), so prepend one
    from fpga_mpeg2_encoder_tpu.core.bitstream import (
        BitWriter, sequence_header_chunks)
    bw = BitWriter()
    bw.put_chunks(sequence_header_chunks(w, h))
    data = bw.to_bytes_aligned() + enc.finish()
    data += b"\x00" * (-len(data) % 32)
    val = validate_sequence(data, expected_frames=120)
    gop_frames = [1380 + k * (pf + 1) for k in range(len(val.gop_timecodes))]
    assert any(fn >= 1440 for fn in gop_frames)
    for tc, fn in zip(val.gop_timecodes, gop_frames):
        assert tc == _expected_timecode(fn), f"frame_no {fn}"
    # the rollover really happened: minutes 0 then 1 both present
    minutes = {tc[2] for tc in val.gop_timecodes}
    assert minutes == {0, 1}
