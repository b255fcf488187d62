"""Operator library — every relational/dataflow operator from SURVEY.md §2
plus the large-scale training-data-pipeline extensions (dedup,
similarity, text, multimodal)."""
