from dataengineering_spark.operators.windows import log_index, top1_by_order
from dataengineering_spark.operators.joins import (
    enrich_with_prices,
    enrich_transfers,
    attach_constant_price,
)
from dataengineering_spark.operators.aggregates import (
    transactions_agg,
    link_inputs_agg,
    link_outputs_agg,
    chain_state_summary,
)
from dataengineering_spark.operators.setops import union_all, missing_keys, dedup_exact
from dataengineering_spark.operators.transforms import (
    select_columns,
    drop_columns,
    rename_columns,
    mask_filter,
    fill_nulls,
    stringify_keys,
    sort_rows,
)
from dataengineering_spark.operators.dedup import (
    connected_components,
    semantic_candidate_pairs,
    exploded_shingles,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    semantic_cell_stats,
    semantic_cells,
    semantic_dedup_members,
    simhash,
    simhash_neardup_pairs,
)
from dataengineering_spark.operators.similarity import (
    cosine_topk,
    ivf_centroids,
    ivf_topk,
    ivfpq_topk,
    lsh_cosine_topk,
    two_level_assign,
    two_level_train_rows,
)
from dataengineering_spark.operators.skew import (
    salted_join,
    salted_collect,
    explain_skew,
)
from dataengineering_spark.operators.chain_state import chain_state, dialect_for
from dataengineering_spark.operators.maintenance import dedup_table_partitions

__all__ = [
    "log_index",
    "top1_by_order",
    "enrich_with_prices",
    "enrich_transfers",
    "attach_constant_price",
    "transactions_agg",
    "link_inputs_agg",
    "link_outputs_agg",
    "chain_state_summary",
    "union_all",
    "missing_keys",
    "dedup_exact",
    "select_columns",
    "drop_columns",
    "rename_columns",
    "mask_filter",
    "fill_nulls",
    "stringify_keys",
    "sort_rows",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "jaccard_pairs",
    "simhash",
    "exploded_shingles",
    "connected_components",
    "cosine_topk",
    "ivf_centroids",
    "ivf_topk",
    "ivfpq_topk",
    "lsh_cosine_topk",
    "two_level_assign",
    "two_level_train_rows",
    "simhash_neardup_pairs",
    "semantic_cells",
    "semantic_candidate_pairs",
    "semantic_cell_stats",
    "semantic_dedup_members",
    "salted_join",
    "salted_collect",
    "explain_skew",
    "chain_state",
    "dialect_for",
    "dedup_table_partitions",
]
