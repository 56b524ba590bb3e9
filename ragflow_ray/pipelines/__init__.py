from .flagship import flagship_pipeline, corpus_from_documents_table

__all__ = ["flagship_pipeline", "corpus_from_documents_table"]
