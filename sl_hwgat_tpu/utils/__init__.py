"""Cross-cutting utilities: profiling/tracing, roofline accounting, debug."""
