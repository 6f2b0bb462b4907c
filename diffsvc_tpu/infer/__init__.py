from . import slicer
from .hubert_encoder import Hubertencoder
from .svc import Svc

__all__ = ["slicer", "Hubertencoder", "Svc"]
