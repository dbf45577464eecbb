from .profiling import trace_annotated, Timer, throughput_report

__all__ = ["trace_annotated", "Timer", "throughput_report"]
