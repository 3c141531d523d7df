"""DataFrame-level operators: the extraction pipeline, dedup family,
similarity search, text analysis, and relational operator spellings."""
