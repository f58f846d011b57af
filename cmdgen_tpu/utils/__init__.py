"""Shared utilities: profiling, timing, logging."""
