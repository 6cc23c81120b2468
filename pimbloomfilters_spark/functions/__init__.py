from . import (  # noqa: F401
    bpe, dedup, kmer, multimodal, packing, pii, similarity, text)
