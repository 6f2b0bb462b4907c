from . import nn, diffnet, fs2, tts_modules, diffusion

__all__ = ["nn", "diffnet", "fs2", "tts_modules", "diffusion"]
