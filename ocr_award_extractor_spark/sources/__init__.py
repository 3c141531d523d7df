"""Table loaders and the deterministic web-page fixture generator."""
