from . import dedup, kmer, multimodal, packing, similarity, text  # noqa: F401
