"""Scalar/UDF function library (the engine's slow-path escape hatches)."""
