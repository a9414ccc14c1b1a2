"""Column- and series-level function library."""
