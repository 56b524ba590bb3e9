from .corpus import generate_corpus, corpus_table, write_corpus, INPUT_SCHEMA, OUTPUT_SCHEMA

__all__ = [
    "generate_corpus",
    "corpus_table",
    "write_corpus",
    "INPUT_SCHEMA",
    "OUTPUT_SCHEMA",
]
