"""Speed layer: Structured Streaming three-query topology
(SURVEY.md §2.9 / §3.2)."""
