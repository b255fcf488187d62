"""End-to-end operational pipelines composed from the operator layer."""

from .corpus import CorpusResult, build_pretrain_corpus  # noqa: F401
