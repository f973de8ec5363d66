"""Data-parallel multi-stream encoding: a batch of independent video streams sharded
over the ``stream`` mesh axis.

This is the TPU equivalent of deploying N copies of the reference IP (SURVEY.md
section 2.9 / BASELINE config 5: "Batched 8-stream 1080p ... per-chip stream
isolation").  Streams never communicate, so the jitted program contains zero
collectives and per-stream output stays bit-exact regardless of batch size or mesh
shape.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import EncoderConfig, SequenceConfig
from ..models.encoder import Encoder, encode_frame_core
from ..ops import entropy
from .mesh import make_mesh, stream_sharding


@functools.partial(
    jax.jit,
    static_argnames=("yr", "ur", "q_level", "words_per_slice"),
    donate_argnames=("prev_y", "prev_u", "prev_v"),
)
def encode_frames_batched(
    y444, u444, v444,            # (B, H, W) uint8
    prev_y, prev_u, prev_v,      # (B, H, W) / (B, H/2, W/2)
    i_frame,                     # (B,) int32
    *, yr: int, ur: int, q_level: int, words_per_slice: int,
):
    f = functools.partial(encode_frame_core, yr=yr, ur=ur, q_level=q_level,
                          words_per_slice=words_per_slice)
    return jax.vmap(f)(y444, u444, v444, prev_y, prev_u, prev_v, i_frame)


class BatchEncoder:
    """Encode a batch of same-sized streams concurrently, one frame step at a time.

    Each stream keeps its own GOP index, timecode and byte assembly (host side);
    the device step is one SPMD program over the sharded batch.
    """

    def __init__(self, config: EncoderConfig, seq: SequenceConfig,
                 batch: int, mesh: Optional[Mesh] = None):
        if mesh is None and len(jax.devices()) > 1:
            n = len(jax.devices())
            mesh = make_mesh(n if batch % n == 0 else 1)
        self.config = config
        self.seq = seq.validate(config)
        self.batch = batch
        self.mesh = mesh
        self._sharding = stream_sharding(mesh) if mesh is not None else None
        self._encoders = [Encoder(config) for _ in range(batch)]
        for e in self._encoders:
            e.start_sequence(self.seq)
        h, w = self.seq.height, self.seq.width
        zy = np.zeros((batch, h, w), np.uint8)
        zc = np.zeros((batch, h // 2, w // 2), np.uint8)
        self._prev = tuple(self._put(z) for z in (zy, zc, zc))
        self._wps = entropy.words_per_slice_bound(self.seq.mb_cols)

    def _put(self, arr):
        if self._sharding is not None:
            return jax.device_put(arr, self._sharding)
        return jnp.asarray(arr)

    def push_frames(self, frames: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]):
        """One frame per stream (YUV 4:4:4 uint8 planes)."""
        assert len(frames) == self.batch
        y = self._put(np.stack([f[0] for f in frames]))
        u = self._put(np.stack([f[1] for f in frames]))
        v = self._put(np.stack([f[2] for f in frames]))
        cur_i = [e._i_frame for e in self._encoders]
        i_frames = self._put(np.array(cur_i, np.int32))
        ry, ru, rv, words, nbits = encode_frames_batched(
            y, u, v, *self._prev, i_frames,
            yr=self.config.yr, ur=self.config.ur,
            q_level=self.config.q_level, words_per_slice=self._wps)
        self._prev = (ry, ru, rv)
        words_h = np.asarray(words)
        nbits_h = np.asarray(nbits)
        for b, e in enumerate(self._encoders):
            e._emit_frame_bits(words_h[b], nbits_h[b], cur_i[b])
            e._i_frame = 0 if e._i_frame >= self.seq.pframes_count else e._i_frame + 1
            e._frame_no += 1

    def finish(self) -> List[bytes]:
        out = []
        for e in self._encoders:
            e._prev = None   # prev buffers live in the batch, not per-encoder
            out.append(e.finish())
        return out
