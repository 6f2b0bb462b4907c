"""Reference-compatible import surface (infer_tools/slicer.py)."""

from diffsvc_tpu.infer.slicer import Slicer, chunks2audio, cut, level2db

__all__ = ["Slicer", "cut", "chunks2audio", "level2db"]
