from . import runtime

__all__ = ["runtime"]
