"""Sources/sinks: the synthetic deterministic web (replaces live HTTP
in this sandbox) and table IO helpers."""
