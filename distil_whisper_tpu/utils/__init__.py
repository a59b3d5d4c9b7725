from .profiling import trace, block, StepTimer, MetricsLogger  # noqa: F401
