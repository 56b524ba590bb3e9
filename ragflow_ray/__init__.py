"""ragflow_ray — a Ray-Data-native document-extraction engine.

A from-scratch reimplementation of the extraction core of
dawn9551/ragflow (HTML boilerplate stripping, PDF layout parsing,
template chunkers) expressed as Ray Data pipelines over Arrow batches
of interleaved text+media documents.

Layout:
    text/      token counting, delimiters, bullets, section merging
    parsers/   per-format document parsers (html, txt, markdown, json, docx-like)
    pdf/       the page/box layout pipeline (geometry, layout join, tables)
    chunkers/  template chunkers (naive, book, laws, paper, one, qa)
    stages/    Ray Data map_batches stage wrappers
    sources/   corpus synthesis + IO helpers
    state/     checkpoint manifest / resume
    ops/       corpus-scale data ops (dedup, similarity, text stats)
    pipelines/ end-to-end pipeline factories
"""

__version__ = "0.1.0"
