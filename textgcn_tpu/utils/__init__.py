from .profiling import StepTimer, profile, trace

__all__ = ['StepTimer', 'profile', 'trace']
