"""Pallas TPU kernels: fused motion estimation (me.py), VMEM bit packing
(pack.py), AC symbolisation (acsym.py)."""
from .me import supported

__all__ = ["supported"]
