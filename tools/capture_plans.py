"""Capture .explain("formatted") output for driver queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: a target
set of the heaviest bench queries). Plans are load-independent, so this
can run any time; queries that build warehouse state as a side effect do
so here exactly as in the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent
from global_seismic_data_pipeline_spark.session import get_spark

DEFAULT = [
    "bpe_encode_docs",
    "incremental_minhash_dedup",
    "ivf_index_drift",
    "ppjoin_near_dup",
    "hybrid_rrf_search",
    "tfidf_search_docs",
    "triangle_count_copurchase",
    "fuzzy_match_part_names",
    "perplexity_bucket_sample",
    "semdedup_prune_embeddings",
    "bloom_prune_lineitem",
    "nb_lang_classifier",
    "bigram_surprisal_docs",
    "span_dedup_docs",
    "line_dedup_docs",
    "minhash_near_dup",
    "cosine_topk_bruteforce",
    "iceberg_delete_where_orders",
    "curation_funnel_docs",
    "cms_heavy_tokens",
    "exact_dedup_docs",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
