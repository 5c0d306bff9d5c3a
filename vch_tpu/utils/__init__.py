"""Timers, profiling, metrics, and checkpointing utilities."""
from vch_tpu.utils.timers import PhaseTimers
from vch_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from vch_tpu.utils.profiling import SolveCounters, trace
from vch_tpu.utils.metrics import MetricsLogger

__all__ = ["PhaseTimers", "save_checkpoint", "load_checkpoint",
           "SolveCounters", "trace", "MetricsLogger"]
