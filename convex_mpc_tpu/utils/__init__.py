"""Config tree, profiling, logging, plotting utilities."""
