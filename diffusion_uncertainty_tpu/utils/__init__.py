"""Config system, artifact paths, RNG discipline, structured logging."""
