"""OHLCV reference-parity pipeline: batch ingest → feature engineering →
keyed serving tables → serving queries → forecast (SURVEY.md §3)."""
