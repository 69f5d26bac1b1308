from vrt.utils.profiling import FrameStats, Profiler, trace_annotation  # noqa: F401
