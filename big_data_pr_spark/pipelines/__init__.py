"""End-to-end operational pipelines composed from the operator layer."""

from .corpus import CorpusResult, build_pretrain_corpus  # noqa: F401
from .rag import build_rag_index, rag_query  # noqa: F401
