from . import checkpoint, scheduler
from .task import SVCTask
from .trainer import Trainer

__all__ = ["checkpoint", "scheduler", "SVCTask", "Trainer"]
