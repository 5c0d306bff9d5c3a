"""Timers, checkpointing, and IO utilities."""
from vch_tpu.utils.timers import PhaseTimers
from vch_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["PhaseTimers", "save_checkpoint", "load_checkpoint"]
