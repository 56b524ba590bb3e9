from .txt import parse_txt
from .html import parse_html, extract_main_text
from .markdown import parse_markdown, extract_tables_and_remainder, md_table_to_html
from .jsonp import parse_json
from .docxlike import parse_docx_spans

__all__ = [
    "parse_txt",
    "parse_html",
    "extract_main_text",
    "parse_markdown",
    "extract_tables_and_remainder",
    "md_table_to_html",
    "parse_json",
    "parse_docx_spans",
]
