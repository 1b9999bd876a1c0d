"""DataFrame-level pipeline operators (stages S1-S6 + training-data ops)."""
