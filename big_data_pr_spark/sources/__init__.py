"""Custom Spark data sources (PySpark 4 Python DataSource API)."""

from .ohlcv_source import OhlcvRestDataSource, register_sources  # noqa: F401

__all__ = ["OhlcvRestDataSource", "register_sources"]
