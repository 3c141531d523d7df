"""Structured Streaming spellings of the engine (optional scope — the
reference is strictly batch, SURVEY.md §2 'Streaming')."""
