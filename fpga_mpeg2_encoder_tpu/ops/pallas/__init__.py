"""Pallas TPU kernels (see sad.py for status notes on this rig's toolchain)."""
from .sad import sad_volume_pallas, supported

__all__ = ["sad_volume_pallas", "supported"]
