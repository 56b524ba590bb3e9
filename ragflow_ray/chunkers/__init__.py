from .common import ChunkConfig, Span
from .registry import CHUNKERS, chunk_document

__all__ = ["ChunkConfig", "Span", "CHUNKERS", "chunk_document"]
