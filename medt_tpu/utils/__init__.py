"""Shared utilities: logging, profiling, image IO."""
from .logging import Logger, ThroughputMeter, chk_mkdir, profiler_trace

__all__ = ["Logger", "ThroughputMeter", "chk_mkdir", "profiler_trace"]
