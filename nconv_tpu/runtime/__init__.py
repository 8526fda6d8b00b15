"""Deployment runtime: streaming engine, benchmarking, StableHLO export."""
from .export import export_guided, load_exported, save_exported
from .streaming import FrameStats, StreamingEngine, benchmark, benchmark_throughput

__all__ = [
    "export_guided",
    "load_exported",
    "save_exported",
    "FrameStats",
    "StreamingEngine",
    "benchmark",
    "benchmark_throughput",
]
