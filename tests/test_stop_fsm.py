"""Micro-golden tests for the sequence-stop FSM corners, GOP wrap, and timecode
(VERDICT round-1 item 3).

Each case pins hand-derived RTL behavior (re-traced from RTL/mpeg2encoder.v:978-1096
and 2684-2698 this round):

* raster counters (a_x4, a_y) index the group accepted THIS cycle; they wrap only
  when the NEXT frame's first group is accepted (RTL:1070-1079).  Hence:
  - stop on the last pixel cycle  => NO pad frame (identical stream to a stop
    pulse while idle);
  - stop coinciding with the FIRST group of a new frame => that frame is encoded
    with its first 4 real pixels + black padding;
  - a fully-black pad frame can never occur.
* GOP index wraps via `a_i_frame < pframes_count` on an 8-bit counter (RTL:1078):
  at pframes_count=255 the index runs 0..255 then wraps.
* the 24fps timecode (RTL:2684-2698) ticks per picture header AFTER the GOP
  header is emitted, and the hour field saturates at 63.
"""
import numpy as np
import pytest

from fpga_mpeg2_encoder_tpu.config import EncoderConfig, SequenceConfig
from fpga_mpeg2_encoder_tpu.golden import encoder as G
from fpga_mpeg2_encoder_tpu.golden import decoder as D
from fpga_mpeg2_encoder_tpu.models.encoder import Encoder


class TestStopCorners:
    def test_stop_on_last_pixel_no_pad(self, video_factory):
        """Stop asserted on the very cycle the last group is accepted: counters read
        (max_x4, max_y), SEQ_ENDING -> SEQ_ENDED immediately, no pad (RTL:1048-1058)."""
        cfg = EncoderConfig(xl=4, yl=4)
        frames = video_factory(64, 64, 2)
        enc = Encoder(cfg)
        s_coin = enc.encode(frames, 64, 64, 5, stop_mode="coincident")
        s_clean = enc.encode(frames, 64, 64, 5, stop_mode="clean")
        assert s_coin == s_clean
        assert len(D.decode_sequence(s_coin, cfg).pictures) == 2

    def test_stop_on_first_group_of_new_frame(self, video_factory):
        """Stop coinciding with the first accepted group of a new frame: the pad
        frame's first 4 pixels are the REAL input pixels, the rest is black
        (RTL:1081-1093 accepts the group, then SEQ_ENDING pads from index (1,0))."""
        cfg = EncoderConfig(xl=4, yl=4)
        frames = video_factory(64, 64, 3)
        seq = SequenceConfig(64, 64, 5)
        gold = G.encode_sequence(cfg, seq, frames, stop_mode="partial",
                                 partial_groups=1)
        got = Encoder(cfg).encode(frames, 64, 64, 5, stop_mode="partial",
                                  partial_groups=1)
        assert gold == got
        dec = D.decode_sequence(got, cfg)
        assert len(dec.pictures) == 3
        # the 4 real pixels matter: a variant whose last frame differs only in its
        # first 4 pixels must produce a different stream
        frames2 = list(frames[:-1]) + [(frames[-1][0].copy(), frames[-1][1],
                                        frames[-1][2])]
        frames2[-1][0][0, :4] ^= 0xFF
        got2 = Encoder(cfg).encode(frames2, 64, 64, 5, stop_mode="partial",
                                   partial_groups=1)
        assert got2 != got
        # and the padded region reconstructs near-black (coding loss only)
        last = dec.pictures[-1]
        assert last.y[16:, :].mean() < 4
        assert abs(int(last.u[8:, :].mean()) - 128) < 4

    def test_full_black_pad_frame_is_unreachable(self, video_factory):
        with pytest.raises(ValueError):
            Encoder(EncoderConfig(xl=4, yl=4)).encode(
                video_factory(64, 64, 2), 64, 64, 5,
                stop_mode="partial", partial_groups=0)
        with pytest.raises(ValueError):
            G.encode_sequence(EncoderConfig(xl=4, yl=4), SequenceConfig(64, 64, 5),
                              video_factory(64, 64, 2), stop_mode="partial",
                              partial_groups=0)


class TestGopWrap255:
    def test_gop_wrap_at_pframes_255(self, video_factory):
        """pframes_count=255: the 8-bit GOP index runs 0..255 then wraps (RTL:1078).
        Frame 256 must start a new GOP (new GOP header + I-frame)."""
        cfg = EncoderConfig(xl=4, yl=4)
        n = 258
        base = video_factory(64, 64, 8)
        frames = [base[i % 8] for i in range(n)]
        enc = Encoder(cfg)
        enc.start_sequence(SequenceConfig(64, 64, 255))
        for i in range(0, n, 43):
            enc.push_chunk(frames[i:i + 43])
        stream = enc.finish()
        dec = D.decode_sequence(stream, cfg)
        assert len(dec.pictures) == n
        types = [p.coding_type for p in dec.pictures]
        assert types[0] == 1 and types[256] == 1
        assert all(t == 2 for t in types[1:256]) and types[257] == 2
        trefs = [p.temporal_reference for p in dec.pictures]
        assert trefs[255] == 255 and trefs[256] == 0 and trefs[257] == 1


def rtl_timecode_tick(tc):
    """Literal transcription of RTL:2684-2698 (the per-picture-header update)."""
    hour, minute, second, insec = tc
    insec += 1
    if insec == 24:
        insec = 0
        second += 1
        if second == 60:
            second = 0
            minute += 1
            if minute == 60:
                minute = 0
                if hour < 63:
                    hour += 1
    return (hour, minute, second, insec)


class TestTimecode:
    def test_device_formula_matches_rtl_counter(self):
        """The device header path computes the timecode from frame_no by modular
        arithmetic (ops/entropy.py); prove equivalence to the literal RTL counter
        across minute and hour rollovers and into hour-63 saturation."""
        import jax.numpy as jnp
        from fpga_mpeg2_encoder_tpu.ops.entropy import _header_rows

        checkpoints = {0, 1, 23, 24, 1439, 1440, 1441, 24 * 3600 - 1, 24 * 3600,
                       24 * 3600 + 25}
        tc = (0, 0, 0, 0)
        rtl_at = {}
        for n in range(24 * 3600 + 26):
            if n in checkpoints:
                rtl_at[n] = tc
            tc = rtl_timecode_tick(tc)
        for n, expect in rtl_at.items():
            codes, lens = _header_rows(jnp.int32(0), jnp.int32(n), 16)
            hour, minute = int(codes[0, 2]), int(codes[0, 3])
            second, insec = int(codes[0, 4]) & 63, int(codes[0, 5])
            assert (hour, minute, second, insec) == expect, n

        # hour-63 saturation (RTL:2694-2696 stops incrementing): by induction the
        # counter equals the modular formula until hour hits 63 and then holds 63
        # while min/sec/insec keep cycling; check the saturated region directly.
        for n in (63 * 24 * 3600, 63 * 24 * 3600 + 999, 200 * 24 * 3600 + 7):
            codes, _ = _header_rows(jnp.int32(0), jnp.int32(n), 16)
            assert int(codes[0, 2]) == 63
            assert int(codes[0, 3]) == (n // (24 * 60)) % 60

    def test_golden_timecode_matches_rtl_counter(self):
        tc = (0, 0, 0, 0)
        g = G.Timecode()
        for n in range(90000):
            assert (g.hour, g.minute, g.second, g.insec) == tc, n
            g.tick()
            tc = rtl_timecode_tick(tc)

    def test_gop_header_bytes_at_minute_rollover(self, video_factory):
        """Hand-derived GOP header for frame_no=1440 (hour 0, minute 1, second 0,
        picture 0): time_code(25) = drop(1)=0 | hour(5)=0 | min(6)=1 | marker(1)=1
        | sec(6)=0 | pic(6)=0, then closed_gop=1, broken_link=0.  The 27 bits
        000000 000001 1000000 000000 10 byte-align to 00 18 00 40."""
        cfg = EncoderConfig(xl=4, yl=4)
        frames = video_factory(64, 64, 1)
        enc = Encoder(cfg)
        enc.start_sequence(SequenceConfig(64, 64, 0))
        state = enc.get_state()
        state.frame_no = 1440          # resume deep into the stream (minute 1)
        enc.finish()
        enc2 = Encoder(cfg)
        enc2.set_state(state)
        enc2.push_frame(*frames[0])
        stream = enc2.finish()
        i = stream.find(b"\x00\x00\x01\xb8")
        assert i >= 0
        expected = bytes([0x00, 0x18, 0x00, 0x40])
        assert stream[i + 4: i + 8] == expected
