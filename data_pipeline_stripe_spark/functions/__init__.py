from .text import tokens_expr, shingles_expr, normalized_text_expr

__all__ = ["tokens_expr", "shingles_expr", "normalized_text_expr"]
