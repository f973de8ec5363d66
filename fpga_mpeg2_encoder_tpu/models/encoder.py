"""The flagship TPU encoder: jitted per-frame pipeline + sequence runtime.

Pipeline per frame (one XLA program, all macroblocks batched):
  4:2:0 subsample -> motion estimation + prediction -> residual -> exact 64x64 DCT
  matmul (MXU) -> quantise -> dequantise -> Chen-Wang IDCT (VPU) -> reconstruct ->
  zigzag/VLC symbolise -> parallel bit-pack per slice.

The only sequential dependency is frame order (P-frames predict from the previous
frame's reconstruction, the loop the reference closes through mem_ref_Y/UV,
RTL/mpeg2encoder.v:2418-2424 -> 1387-1390); here it is an explicit prev/cur buffer
swap with donated device buffers.

Host work per frame: tiny header bytes + concatenating byte-aligned slice blobs.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig, SequenceConfig
from ..core.bitstream import (
    BitWriter,
    gop_header_chunks,
    picture_header_chunks,
    sequence_header_chunks,
    SEQUENCE_END_CHUNKS,
)
from ..ops import colorspace, dct, entropy, motion


def _blockify(plane: jnp.ndarray, bs: int) -> jnp.ndarray:
    h, w = plane.shape
    return plane.reshape(h // bs, bs, w // bs, bs).transpose(0, 2, 1, 3)


def _unblockify(blocks: jnp.ndarray) -> jnp.ndarray:
    nby, nbx, bs, _ = blocks.shape
    return blocks.transpose(0, 2, 1, 3).reshape(nby * bs, nbx * bs)


def _tiles(yb: jnp.ndarray, ub: jnp.ndarray, vb: jnp.ndarray) -> jnp.ndarray:
    """(nby,nbx,16,16)+(nby,nbx,8,8)x2 -> (nby,nbx,6,64) in tile order Y00..Y11,U,V."""
    nby, nbx = yb.shape[:2]
    yt = yb.reshape(nby, nbx, 2, 8, 2, 8).transpose(0, 1, 2, 4, 3, 5).reshape(nby, nbx, 4, 64)
    return jnp.concatenate(
        [yt, ub.reshape(nby, nbx, 1, 64), vb.reshape(nby, nbx, 1, 64)], axis=2)


def _untile_y(t4: jnp.ndarray) -> jnp.ndarray:
    """(nby,nbx,4,64) -> (nby,nbx,16,16)."""
    nby, nbx = t4.shape[:2]
    return t4.reshape(nby, nbx, 2, 2, 8, 8).transpose(0, 1, 2, 4, 3, 5).reshape(nby, nbx, 16, 16)


def encode_frame_core(
    y444: jnp.ndarray, u444: jnp.ndarray, v444: jnp.ndarray,   # (H, W) uint8
    prev_y: jnp.ndarray, prev_u: jnp.ndarray, prev_v: jnp.ndarray,
    i_frame: jnp.ndarray,                                      # scalar int32
    *, yr: int, ur: int, q_level: int, words_per_slice: int,
):
    """Un-jitted single-frame pipeline; vmap-able over a leading stream axis for
    data-parallel multi-stream encoding (parallel/dp.py)."""
    y, u, v = colorspace.subsample_420(y444, u444, v444)
    mr = motion.estimate_and_predict(y, u, v, prev_y, prev_u, prev_v,
                                     i_frame == 0, yr, ur)
    nby, nbx = mr.inter.shape

    yb = _blockify(y.astype(jnp.int32), 16)
    ub = _blockify(u.astype(jnp.int32), 8)
    vb = _blockify(v.astype(jnp.int32), 8)
    cur_t = _tiles(yb, ub, vb)
    pred_t = _tiles(mr.pred_y, mr.pred_u, mr.pred_v)

    resid = (cur_t - pred_t).reshape(-1, 64)
    inter_t = jnp.repeat(mr.inter.reshape(-1), 6)
    f = dct.fdct(resid)
    q = dct.quantize(f, inter_t, q_level)
    rres = dct.idct(dct.dequantize(q, inter_t, q_level))
    recon_t = jnp.clip(pred_t.reshape(-1, 64) + rres, 0, 255).reshape(nby, nbx, 6, 64)

    recon_y = _unblockify(_untile_y(recon_t[:, :, :4])).astype(jnp.uint8)
    recon_u = _unblockify(recon_t[:, :, 4].reshape(nby, nbx, 8, 8)).astype(jnp.uint8)
    recon_v = _unblockify(recon_t[:, :, 5].reshape(nby, nbx, 8, 8)).astype(jnp.uint8)

    quant4 = q.reshape(nby, nbx, 6, 64)
    codes, lens, _cbp = entropy.symbolize_frame(
        quant4, mr.inter, mr.mvx, mr.mvy, i_frame, q_level)
    packed = entropy.pack_slices(codes, lens, words_per_slice)
    return recon_y, recon_u, recon_v, packed.words, packed.nbits


encode_frame_device = jax.jit(
    encode_frame_core,
    static_argnames=("yr", "ur", "q_level", "words_per_slice"),
    donate_argnames=("prev_y", "prev_u", "prev_v"),
)


class Encoder:
    """TPU-native MPEG-2 encoder.

    API mirrors the reference module contract (RTL/mpeg2encoder.v:10-38):
    construction-time quality/range knobs, per-sequence size/GOP configuration,
    multi-sequence reuse after each ``encode``/``finish``.
    """

    def __init__(self, config: EncoderConfig = EncoderConfig()):
        self.config = config
        self._seq: Optional[SequenceConfig] = None
        self._reset_sequence_state()

    # ------------------------------------------------------------------ one-shot
    def encode(
        self,
        frames444: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
        width: int,
        height: int,
        pframes_count: int = 23,
        stop_mode: str = "clean",
        partial_groups: int = 0,
    ) -> bytes:
        """Encode a full sequence of YUV 4:4:4 frames to an MPEG-2 elementary stream."""
        self.start_sequence(SequenceConfig(width, height, pframes_count))
        last = len(frames444) - 1
        for idx, f in enumerate(frames444):
            if stop_mode == "partial" and idx == last:
                self.push_frame(*self._pad_partial(f, partial_groups))
            else:
                self.push_frame(*f)
        return self.finish(stop_mode=stop_mode)

    # ---------------------------------------------------------------- streaming
    def start_sequence(self, seq: SequenceConfig) -> None:
        if self._seq is not None:
            raise RuntimeError("sequence already active; call finish() first")
        seq = seq.validate(self.config)
        self._seq = seq
        self._writer = BitWriter()
        self._writer.put_chunks(sequence_header_chunks(seq.width, seq.height))
        self._payload: List[bytes] = [self._writer.to_bytes_aligned()]
        self._i_frame = 0
        self._frame_no = 0
        self._prev = None
        wps = entropy.words_per_slice_bound(seq.mb_cols)
        self._wps = wps

    def push_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> None:
        """Feed one YUV 4:4:4 frame (uint8 (H, W) planes). Streaming: device work is
        dispatched asynchronously; the stream bytes are assembled as results land."""
        seq = self._require_seq()
        if y.shape != (seq.height, seq.width):
            raise ValueError(f"frame shape {y.shape} != {(seq.height, seq.width)}")
        if self._prev is None:
            z = np.zeros((seq.height, seq.width), np.uint8)
            zc = np.zeros((seq.height // 2, seq.width // 2), np.uint8)
            self._prev = (jnp.asarray(z), jnp.asarray(zc), jnp.asarray(zc))
        ry, ru, rv, words, nbits = encode_frame_device(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            *self._prev, jnp.int32(self._i_frame),
            yr=self.config.yr, ur=self.config.ur,
            q_level=self.config.q_level, words_per_slice=self._wps)
        self._prev = (ry, ru, rv)
        # one-frame pipelining: assemble frame k's bytes while the device runs k+1
        self._drain_pending()
        self._pending = (self._i_frame, words, nbits)
        self._i_frame = 0 if self._i_frame >= seq.pframes_count else self._i_frame + 1
        self._frame_no += 1

    def _drain_pending(self) -> None:
        if getattr(self, "_pending", None) is not None:
            i_frame, words, nbits = self._pending
            self._pending = None
            self._emit_frame_bits(np.asarray(words), np.asarray(nbits), i_frame)

    def finish(self, stop_mode: str = "clean") -> bytes:
        """End the sequence (i_sequence_stop semantics) and return the stream."""
        seq = self._require_seq()
        if stop_mode == "coincident":
            # stop on the last pixel cycle: indices wrap, a full black frame is
            # padded and encoded (RTL:1048-1083)
            w, h = seq.width, seq.height
            black = (np.zeros((h, w), np.uint8), np.full((h, w), 128, np.uint8),
                     np.full((h, w), 128, np.uint8))
            self.push_frame(*black)
        self._drain_pending()
        bw = BitWriter()
        bw.put_chunks(SEQUENCE_END_CHUNKS)
        self._payload.append(bw.to_bytes_aligned())
        data = b"".join(self._payload)
        target = (len(data) // 32 + 1) * 32
        data = data + b"\x00" * (target - len(data))
        self._seq = None
        self._reset_sequence_state()
        return data

    # ----------------------------------------------------------------- internals
    def _reset_sequence_state(self) -> None:
        self._writer = None
        self._payload = []
        self._prev = None
        self._pending = None
        self._i_frame = 0
        self._frame_no = 0
        self._tc = [0, 0, 0, 0]     # hour, minute, second, insec

    def _require_seq(self) -> SequenceConfig:
        if self._seq is None:
            raise RuntimeError("no active sequence; call start_sequence() first")
        return self._seq

    def _emit_frame_bits(self, words: np.ndarray, nbits: np.ndarray,
                         i_frame: int) -> None:
        bw = BitWriter()
        if i_frame == 0:
            h, m, s, f = self._tc
            bw.put_chunks(gop_header_chunks(h, m, s, f))
        bw.put_chunks(picture_header_chunks(i_frame))
        self._payload.append(bw.to_bytes_aligned())
        # timecode ticks once per frame (RTL:2684-2698)
        tc = self._tc
        tc[3] += 1
        if tc[3] == 24:
            tc[3] = 0
            tc[2] += 1
            if tc[2] == 60:
                tc[2] = 0
                tc[1] += 1
                if tc[1] == 60:
                    tc[1] = 0
                    if tc[0] < 63:
                        tc[0] += 1
        be = words.astype(">u4").tobytes()
        wps_bytes = words.shape[1] * 4
        for s_idx in range(words.shape[0]):
            n = (int(nbits[s_idx]) + 7) // 8
            start = s_idx * wps_bytes
            self._payload.append(be[start:start + n])

    def _pad_partial(self, frame, partial_groups: int):
        seq = self._require_seq()
        h, w = seq.height, seq.width
        y, u, v = (np.array(p, copy=True) for p in frame)
        flat = np.arange(h * (w // 4)).reshape(h, w // 4) >= partial_groups
        mask = np.repeat(flat, 4, axis=1)
        y[mask], u[mask], v[mask] = 0, 128, 128
        return y, u, v
