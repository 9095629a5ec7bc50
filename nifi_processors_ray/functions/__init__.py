"""Vectorized batch/scalar function library for the engine."""
