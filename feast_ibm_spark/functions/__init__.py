from .text import (
    tokens_col,
    token_count_col,
    bpe_token_count_col,
    char_codes_col,
    fingerprint_col,
    stopword_count_col,
    BPE_TOKEN_PATTERN,
    LANG_STOPWORDS,
)

__all__ = [
    "tokens_col",
    "token_count_col",
    "bpe_token_count_col",
    "char_codes_col",
    "fingerprint_col",
    "stopword_count_col",
    "BPE_TOKEN_PATTERN",
    "LANG_STOPWORDS",
]
