from pybabe_spark.operators.relational import (
    dedup,
    filter_by_regexp,
    filter_columns,
    filter_out_null_values,
    filter_rows,
    filter_values,
    head,
    insert_rows,
    max_n,
    min_n,
    rename,
    replace_cell,
    replace_in_string,
    skip,
    sort,
    split_rows,
    union_streams,
)
from pybabe_spark.operators.join import asof_join, join, range_join
from pybabe_spark.operators.merge import dedup_against, upsert
from pybabe_spark.operators.sampling import (
    global_shuffle,
    hash_sample,
    mix_sources,
    stratified_sample,
    train_test_split,
)
from pybabe_spark.operators.sketch import exact_heavy_hitters, heavy_hitters
from pybabe_spark.operators.skew import salted_join
from pybabe_spark.operators.group import group, group_all
from pybabe_spark.operators.reshape import pivot, transpose, unpivot
from pybabe_spark.operators.window import window_map
from pybabe_spark.operators.decontam import (
    coverage_dedup,
    decontaminate,
    duplicated_ngram_coverage,
)
from pybabe_spark.operators.graph import best_of_clusters, connected_components, dup_clusters
from pybabe_spark.operators.packing import chunk_documents, pack_tokens
from pybabe_spark.operators.tfidf import tfidf_top_terms
from pybabe_spark.operators.infra import primary_key_detect, profile
from pybabe_spark.operators.similarity import (
    ann_brute_force,
    ann_ivf,
    ann_ivf_stored,
    ann_lsh,
    ann_lsh_stored,
    build_ivf_index,
    build_lsh_index,
    dequantize_embeddings,
    quantize_embeddings,
    semantic_dedup,
)

__all__ = [
    "ann_brute_force",
    "ann_ivf",
    "ann_ivf_stored",
    "ann_lsh",
    "ann_lsh_stored",
    "best_of_clusters",
    "build_ivf_index",
    "build_lsh_index",
    "chunk_documents",
    "connected_components",
    "coverage_dedup",
    "decontaminate",
    "dequantize_embeddings",
    "dup_clusters",
    "duplicated_ngram_coverage",
    "pack_tokens",
    "primary_key_detect",
    "profile",
    "quantize_embeddings",
    "semantic_dedup",
    "tfidf_top_terms",
    "asof_join",
    "dedup_against",
    "exact_heavy_hitters",
    "global_shuffle",
    "hash_sample",
    "heavy_hitters",
    "mix_sources",
    "salted_join",
    "stratified_sample",
    "train_test_split",
    "upsert",
    "dedup",
    "filter_by_regexp",
    "filter_columns",
    "filter_out_null_values",
    "filter_rows",
    "filter_values",
    "group",
    "group_all",
    "head",
    "insert_rows",
    "join",
    "max_n",
    "min_n",
    "pivot",
    "range_join",
    "rename",
    "replace_cell",
    "replace_in_string",
    "skip",
    "sort",
    "split_rows",
    "transpose",
    "union_streams",
    "unpivot",
    "window_map",
]
