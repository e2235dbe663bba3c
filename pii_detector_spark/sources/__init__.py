"""Sources: the web_pages input table schema/reader and the deterministic
synthetic corpus generator used by tests and benchmarks."""
