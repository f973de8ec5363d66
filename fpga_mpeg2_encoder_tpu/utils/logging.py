"""Structured encoder statistics and logging.

The reference's only observability is o_sequence_busy plus testbench progress
prints (SIM/tb_mpeg2encoder.v:173,221); this module is the framework-native
replacement: per-frame counters surfaced as a stats dict and optional PSNR."""
from __future__ import annotations

import dataclasses
import sys
import time
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class FrameStats:
    index: int
    i_frame: int            # GOP position (0 = I-frame)
    bits: int
    wall_s: float
    psnr_y: Optional[float] = None


@dataclasses.dataclass
class SequenceStats:
    width: int = 0
    height: int = 0
    frames: List[FrameStats] = dataclasses.field(default_factory=list)

    def add(self, **kw) -> None:
        self.frames.append(FrameStats(**kw))

    @property
    def total_bits(self) -> int:
        return sum(f.bits for f in self.frames)

    def summary(self) -> dict:
        n = len(self.frames)
        wall = sum(f.wall_s for f in self.frames)
        d = {
            "frames": n,
            "bytes": self.total_bits // 8,
            "avg_bits_per_frame": self.total_bits // max(n, 1),
            "wall_s": round(wall, 3),
            "fps": round(n / wall, 2) if wall else None,
            "mpixels_per_s": round(n * self.width * self.height / wall / 1e6, 1)
            if wall else None,
        }
        ps = [f.psnr_y for f in self.frames if f.psnr_y is not None]
        if ps:
            d["psnr_y_mean"] = round(float(np.mean(ps)), 2)
        return d


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return float(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))


class ProgressLogger:
    """Per-frame progress lines, mirroring the testbench's $display output."""

    def __init__(self, enabled: bool = True, stream=None):
        self.enabled = enabled
        self.stream = stream or sys.stderr
        self._t0 = time.perf_counter()

    def frame(self, idx: int, i_frame: int, nbytes: int) -> None:
        if self.enabled:
            kind = "I" if i_frame == 0 else "P"
            dt = time.perf_counter() - self._t0
            print(f"  frame {idx:4d} [{kind}] {nbytes:8d} B  t={dt:7.2f}s",
                  file=self.stream)

    def info(self, msg: str) -> None:
        if self.enabled:
            print(msg, file=self.stream)
