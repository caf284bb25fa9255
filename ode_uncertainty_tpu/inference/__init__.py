"""Parameter estimation, tempering, evaluation (filled in incrementally)."""
