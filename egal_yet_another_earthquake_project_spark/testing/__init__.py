"""Deterministic fixture generators for the engine's correctness suite."""
