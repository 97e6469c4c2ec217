"""DataFrame operators — the engine's analytic surface (SURVEY §2)."""
