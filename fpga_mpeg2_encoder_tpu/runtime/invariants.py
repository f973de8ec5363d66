"""Debug-mode invariant checks for the encoder's reconstruction chain.

The reference's only read/write hazard is intentional: motion estimation must see
the PREVIOUS frame's reconstruction, guaranteed in hardware by the one-slice
write-delay memory (RTL/mpeg2encoder.v:2364-2424, SURVEY.md section 5 "race
detection").  In this framework the invariant holds by construction - the jitted
frame step takes prev recon as an explicit functional input and the scan carries
it - but a debug mode can still PROVE it for a given run: re-encode any frame
from a checkpoint and require identical bytes and recon.

Usage:
    report = verify_recon_chain(config, seq, frames444)   # raises on violation
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..config import EncoderConfig, SequenceConfig
from ..models.encoder import Encoder


def verify_recon_chain(
    config: EncoderConfig,
    seq: SequenceConfig,
    frames444: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    recheck_every: int = 1,
) -> dict:
    """Encode a sequence twice - streaming, and frame-by-frame re-launched from
    checkpoints - and assert both the payload bytes and the reconstruction state
    agree at every checkpointed frame.  Any hidden state or stale-reference read
    (the analog of the RTL's mem_delay ordering hazard) would diverge here."""
    ref = Encoder(config)
    ref.start_sequence(seq)
    chk = Encoder(config)
    chk.start_sequence(seq)
    checked = 0
    for i, f in enumerate(frames444):
        ref.push_frame(*f)
        if i % recheck_every == 0:
            state = chk.get_state()
            fresh = Encoder(config)
            fresh.set_state(state)
            fresh.push_frame(*f)
            chk.push_frame(*f)
            a, b = fresh.get_state(), chk.get_state()
            assert a.payload == b.payload, f"payload divergence at frame {i}"
            assert (a.recon_y == b.recon_y).all(), f"recon divergence at frame {i}"
            rs = ref.get_state()
            assert rs.payload == b.payload, f"streaming divergence at frame {i}"
            checked += 1
        else:
            chk.push_frame(*f)
    out_a, out_b = ref.finish(), chk.finish()
    assert out_a == out_b
    return {"frames": len(frames444), "checkpoints_verified": checked}
