"""IO, config, profiling utilities."""
