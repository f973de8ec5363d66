import os

# Tests run on a virtual 8-device CPU mesh so CI needs no TPU (the axon TPU plugin in
# this image ignores the JAX_PLATFORMS env var, so force it via jax.config too; this
# also avoids deadlocking on the single TPU tunnel when tests run alongside bench).
import jax

if os.environ.get("TPU_EXACTNESS") != "1":
    os.environ.setdefault(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_video(rng, width, height, n_frames, kind="pan"):
    """Synthetic YUV 4:4:4 clips: smooth gradient + texture with global pan, so
    P-frames exercise real motion vectors."""
    pad = 48
    yy, xx = np.mgrid[0:height + pad, 0:width + pad]
    tex = rng.integers(0, 64, (height + pad, width + pad)).astype(np.int32)
    base_y = ((xx * 3 + yy * 2) // 4 % 200 + tex) % 256
    base_u = ((xx - yy) // 3 % 160 + 48 + tex // 2) % 256
    base_v = ((xx + yy) // 5 % 120 + 64 + tex // 3) % 256
    frames = []
    for i in range(n_frames):
        if kind == "pan":
            dy, dx = (i * 2) % pad, (i * 3) % pad
        elif kind == "still":
            dy = dx = 0
        else:  # noise
            return [
                (rng.integers(0, 256, (height, width), dtype=np.uint8),
                 rng.integers(0, 256, (height, width), dtype=np.uint8),
                 rng.integers(0, 256, (height, width), dtype=np.uint8))
                for _ in range(n_frames)
            ]
        frames.append((
            base_y[dy:dy + height, dx:dx + width].astype(np.uint8),
            base_u[dy:dy + height, dx:dx + width].astype(np.uint8),
            base_v[dy:dy + height, dx:dx + width].astype(np.uint8),
        ))
    return frames


@pytest.fixture(scope="session")
def video_factory(rng):
    def f(width=64, height=64, n_frames=4, kind="pan"):
        return make_video(rng, width, height, n_frames, kind)
    return f
