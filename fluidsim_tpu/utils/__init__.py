from .profiling import StepTimer, trace_profile
