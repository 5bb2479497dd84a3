"""Utilities: profiling, metrics, seeding."""

from .profiling import StageTimer, trace_profile, Metrics
