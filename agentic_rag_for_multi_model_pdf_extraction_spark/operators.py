"""Operators: extraction kernels and the training-data op families."""

from sparkx.kernels.blocks import parse_blocks  # noqa: F401
from sparkx.kernels.extract import extract_batch, process_blocks, validate_blocks  # noqa: F401
from sparkx.ops.dedup import (  # noqa: F401
    connected_components,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    with_minhash,
    with_simhash,
)
from sparkx.ops.embed import embed_vectors, embed_weights  # noqa: F401
from sparkx.ops.multimodal import (  # noqa: F401
    decode_media,
    documents_as_media,
    frame_sample_plan,
    resize_plan,
)
from sparkx.ops.similarity import knn_join, topk_bruteforce, topk_lsh  # noqa: F401
