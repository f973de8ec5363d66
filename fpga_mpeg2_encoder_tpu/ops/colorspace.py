"""4:4:4 -> 4:2:0 chroma downsample (stages A-C, RTL/mpeg2encoder.v:1086-1171).

TPU-first design: the RTL streams pixels through a one-line buffer; on TPU the whole
frame is one fused elementwise pass (two mean2 reductions, each with +1 rounding -
NOT a single mean4, the roundings compound differently)."""
from __future__ import annotations

import jax.numpy as jnp


def mean2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (1 + a.astype(jnp.int32) + b.astype(jnp.int32)) >> 1


def subsample_420(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """(H, W) uint8 4:4:4 planes -> (y, u420, v420) with u/v at (H/2, W/2)."""
    uh = mean2(u[:, 0::2], u[:, 1::2])
    vh = mean2(v[:, 0::2], v[:, 1::2])
    u420 = mean2(uh[1::2], uh[0::2]).astype(jnp.uint8)
    v420 = mean2(vh[1::2], vh[0::2]).astype(jnp.uint8)
    return y, u420, v420
