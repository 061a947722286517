from .ann_index import (  # noqa: F401
    append_to_ann_index,
    build_ann_index,
    compact_ann_index,
    delete_from_ann_index,
    evaluate_ann_index,
    load_ann_index,
    maintain_ann_index,
    mine_hard_negatives,
    search_ann_index,
    search_ann_index_batch,
    tune_ann_index,
)
from .corpus_build import build_corpus, build_corpus_increment  # noqa: F401
from .dedup_store import (  # noqa: F401
    admit_embeddings_to_store,
    admit_to_store,
    build_dedup_store,
    build_embedding_dedup_store,
    check_dedup_store_health,
    check_embedding_store_health,
    compact_dedup_store,
    dedup_against_store,
    embedding_dedup_against_store,
)
from .quality_loop import (  # noqa: F401
    apply_quality_filter,
    apply_text_quality_filter,
    load_quality_weights,
    train_quality_filter,
    train_text_quality_filter,
)
