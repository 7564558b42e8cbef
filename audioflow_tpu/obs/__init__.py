"""Observability: tracing/profiling hooks, throughput metrics, stats persistence.

Three channels, mirroring the reference (SURVEY §5.5): (a) structured logs;
(b) live telemetry events (via sinks.EventDispatcher); (c) persisted usage
counters. What the reference lacked — first-class throughput measurement of
the DSP path — is added here because the north-star metric is
audio-seconds/sec/chip.
"""

from .lifecycle import AppDirs, AppPhase, LifecycleManager
from .logging import get_logger, setup_logging
from .metrics import RunMetrics, Timer, measure_throughput
from .profiling import profile_trace
from .stats import StatsFile, default_stats_path

__all__ = [
    "AppDirs",
    "AppPhase",
    "LifecycleManager",
    "RunMetrics",
    "StatsFile",
    "Timer",
    "default_stats_path",
    "get_logger",
    "measure_throughput",
    "profile_trace",
    "setup_logging",
]
