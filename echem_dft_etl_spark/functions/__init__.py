from .hashing import det_hash_i64, det_hash_str, minhash_perm
from .vector import cosine_sim, dot, l2_norm
from .text import norm_text, tokens, word_ngrams

__all__ = [
    "det_hash_i64",
    "det_hash_str",
    "minhash_perm",
    "cosine_sim",
    "dot",
    "l2_norm",
    "norm_text",
    "tokens",
    "word_ngrams",
]
