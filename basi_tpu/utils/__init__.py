"""Utilities: structured metrics/logging, orbax checkpointing, profiling."""
