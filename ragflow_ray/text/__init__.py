from .tokens import token_count
from .delimiters import delimiter_pattern, decode_escaped_delimiters
from .bullets import (
    BULLET_FAMILIES,
    bullets_category,
    is_probably_not_bullet,
    looks_like_body_text,
    title_frequency,
)
from .merge import (
    greedy_merge,
    hierarchical_merge,
    promote_colon_titles,
    strip_toc_sections,
)
from .lang import is_english_text, is_chinese_text
from .normalize import find_codec, get_text, rm_space, str_q2b, tradi2simp

__all__ = [
    "find_codec",
    "get_text",
    "rm_space",
    "str_q2b",
    "tradi2simp",
    "token_count",
    "delimiter_pattern",
    "decode_escaped_delimiters",
    "BULLET_FAMILIES",
    "bullets_category",
    "is_probably_not_bullet",
    "looks_like_body_text",
    "title_frequency",
    "greedy_merge",
    "hierarchical_merge",
    "promote_colon_titles",
    "strip_toc_sections",
    "is_english_text",
    "is_chinese_text",
]
