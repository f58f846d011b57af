"""Masked dense TPU ops: reductions, noise schedules, geometry, clustering."""
