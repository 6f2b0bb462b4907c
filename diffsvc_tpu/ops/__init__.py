from . import mel, pitch, f0_ac

__all__ = ["mel", "pitch", "f0_ac"]
