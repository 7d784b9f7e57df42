"""DuckDB oracle SQL for the extension workloads (workloads_ext.py).

Same mirroring discipline as oracles.py. DuckDB needs the 'g' flag on
regexp_replace (Spark replaces all matches by default); list functions are
1-based like Spark's slice/element_at.
"""

from __future__ import annotations

NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

TEXT_QUALITY_SQL = rf"""
WITH base AS (
    SELECT doc_id,
        CAST(length(text) AS BIGINT) AS char_len,
        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS word_cnt,
        CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt,
        CAST(len(regexp_extract_all(lower(text),
            '\b(the|and|of|to|in|is|that|for|with)\b')) AS BIGINT) AS stopword_cnt,
        length(regexp_replace(text, '\s+', '', 'g')) AS squeezed_len
    FROM documents
), feat AS (
    SELECT doc_id, char_len, word_cnt, punct_cnt, stopword_cnt,
        squeezed_len / word_cnt AS avg_word_len,
        punct_cnt / char_len AS punct_ratio,
        stopword_cnt / word_cnt AS stopword_ratio
    FROM base
)
SELECT doc_id, char_len, word_cnt, punct_cnt, stopword_cnt, avg_word_len,
    punct_ratio, stopword_ratio,
    (stopword_ratio * 10.0) - (punct_ratio * 5.0)
        + (CASE WHEN avg_word_len >= 3.0 AND avg_word_len <= 8.0
                THEN 1.0 ELSE 0.0 END) AS quality_score
FROM feat
"""

TEXT_LANGUAGE_ID_SQL = r"""
WITH hits AS (
    SELECT doc_id,
        CAST(len(regexp_extract_all(lower(text),
            '\b(the|and|of|to|in|is|that|for|with)\b')) AS BIGINT) AS hits_en,
        CAST(len(regexp_extract_all(lower(text),
            '\b(el|la|los|las|de|que|y|en|un|una)\b')) AS BIGINT) AS hits_es,
        CAST(len(regexp_extract_all(lower(text),
            '\b(der|die|das|und|ist|nicht|mit|ein|zu)\b')) AS BIGINT) AS hits_de,
        CAST(len(regexp_extract_all(lower(text),
            '\b(le|la|les|et|des|est|une|dans|pour)\b')) AS BIGINT) AS hits_fr
    FROM documents
)
SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
    CASE WHEN (((hits_en + hits_es) + hits_de) + hits_fr) = 0 THEN 'unknown'
         WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
         WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
         WHEN hits_de >= hits_fr THEN 'de'
         ELSE 'fr' END AS lang_guess
FROM hits
"""

TEXT_TOKENIZE_SQL = r"""
SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
    CAST(CAST(length(text) AS BIGINT) = n_chars AS BIGINT) AS len_matches_meta
FROM documents
"""

TEXT_FINGERPRINT_SQL = rf"""
SELECT doc_id, md5({NORM}) AS fp FROM documents
"""

EXACT_DEDUP_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id,
    CAST(COUNT(*) AS BIGINT) AS dup_count
FROM documents GROUP BY md5(text)
"""

# single source of truth for the n-gram Jaccard knobs — the workload
# (workloads_ext.ngram_jaccard_near_dup) imports these, so retuning either
# side cannot silently desynchronize the oracle
NGRAM_N = 3
NGRAM_THRESHOLD = 0.2
_SHINGLE_CONCAT = " || ' ' || ".join(f"w[i+{j}]" for j in range(NGRAM_N))

NGRAM_JACCARD_SQL = rf"""
WITH sets AS (
    SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(w) - {NGRAM_N - 1}, 0) + 1),
            i -> {_SHINGLE_CONCAT})) AS shingles
    FROM (SELECT doc_id, string_split({NORM}, ' ') AS w FROM documents)
), nonempty AS (
    SELECT * FROM sets WHERE len(shingles) > 0
), exploded AS (
    SELECT doc_id, unnest(shingles) AS shingle FROM nonempty
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(COUNT(*) AS BIGINT) AS intersection
    FROM exploded a JOIN exploded b ON a.shingle = b.shingle
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
), sized AS (
    SELECT i.id_a, i.id_b, i.intersection,
        CAST(len(sa.shingles) AS BIGINT) AS size_a,
        CAST(len(sb.shingles) AS BIGINT) AS size_b
    FROM inter i
    JOIN nonempty sa ON sa.doc_id = i.id_a
    JOIN nonempty sb ON sb.doc_id = i.id_b
)
SELECT id_a, id_b, intersection, size_a, size_b,
    intersection / ((size_a + size_b) - intersection) AS jaccard
FROM sized
WHERE intersection / ((size_a + size_b) - intersection) >= {NGRAM_THRESHOLD}
"""

COSINE_TOPK_SQL = """
WITH pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        ROUND(
            list_sum(list_transform(range(1, 65),
                i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))),
        6) AS cosine_sim
    FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
    WHERE q.vec_id < 20
)
SELECT query_id, neighbor_id, cosine_sim,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS BIGINT) AS sim_rank
FROM pairs
QUALIFY sim_rank <= 5
"""

FILTERED_ANN_TOPK_SQL = """
WITH pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.label,
        ROUND(
            list_sum(list_transform(range(1, 65),
                i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))),
        6) AS cosine_sim
    FROM embeddings q JOIN embeddings c
        ON q.vec_id != c.vec_id AND q.label = c.label
    WHERE q.vec_id < 20
)
SELECT query_id, neighbor_id, label, cosine_sim,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS BIGINT) AS sim_rank
FROM pairs
QUALIFY sim_rank <= 5
"""
MULTIMODAL_METADATA_SQL = """
SELECT doc_id,
    CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
    CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS header_byte,
    CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
    CAST((ascii(substr(text, 1, 1)) * 3) % 480 AS BIGINT) AS height
FROM documents
"""

TUMBLING_WINDOW_SQL = """
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS window_start,
    event_type,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    ROUND(SUM(value), 2) / COUNT(*) AS avg_value
FROM events GROUP BY 1, 2
"""

SLIDING_WINDOW_SQL = """
WITH expanded AS (
    SELECT CAST(CAST(ts AS DATE) - CAST(i AS INTEGER) AS VARCHAR) AS window_start,
        user_id
    FROM events, range(0, 7) t(i)
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM expanded GROUP BY window_start
"""

EMBEDDING_COSINE_NEAR_DUP_SQL = """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(list_cosine_similarity(a.emb, b.emb), 4) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.emb, b.emb), 4) >= 0.45
"""

ASOF_JOIN_SQL = """
WITH purchases AS (
    SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
), clicks AS (
    SELECT user_id, ts, MAX(value) AS click_value
    FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
       r.click_value AS click_value_asof
FROM purchases l ASOF LEFT JOIN clicks r
    ON l.user_id = r.user_id AND l.ts >= r.ts
"""

SALTED_AGG_SQL = """
SELECT l_returnflag,
    ROUND(SUM(l_quantity), 2) AS qty_sum,
    COUNT(l_quantity) AS n,
    MIN(l_quantity) AS qty_min,
    MAX(l_quantity) AS qty_max
FROM lineitem GROUP BY l_returnflag
"""

ORACLES_EXT: dict[str, str] = {
    "text_quality_score": TEXT_QUALITY_SQL,
    "text_language_id": TEXT_LANGUAGE_ID_SQL,
    "text_tokenize_stats": TEXT_TOKENIZE_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "exact_dedup_docs": EXACT_DEDUP_SQL,
    "ngram_jaccard_near_dup": NGRAM_JACCARD_SQL,
    # prefix filtering is LOSSLESS for J >= tau: the oracle is the same
    # exhaustive join at the query's tau = 4/5 — any pruned qualifying
    # pair hash-fails
    "ppjoin_near_dup": NGRAM_JACCARD_SQL.replace(
        f">= {NGRAM_THRESHOLD}", ">= 0.8"
    ),
    "cosine_topk_bruteforce": COSINE_TOPK_SQL,
    "filtered_ann_topk": FILTERED_ANN_TOPK_SQL,
    "embedding_cosine_near_dup": EMBEDDING_COSINE_NEAR_DUP_SQL,
    "salted_agg_lineitem": SALTED_AGG_SQL,
    "asof_join_purchases": ASOF_JOIN_SQL,
    "multimodal_metadata": MULTIMODAL_METADATA_SQL,
    "tumbling_window_daily": TUMBLING_WINDOW_SQL,
    "sliding_window_7d": SLIDING_WINDOW_SQL,
}

# Thresholds = format(int(cum_fraction * 16**8), '08x') for (0.9, 0.95) —
# pinned by tests/test_sampling.py::test_default_thresholds_match_oracle.
SPLIT_TRAIN_VAL_TEST_SQL = r"""
WITH s AS (
    SELECT n_chars, source,
        CASE WHEN substr(md5(CAST(source AS VARCHAR) || '|s1'), 1, 8) < 'e6666666' THEN 'train'
             WHEN substr(md5(CAST(source AS VARCHAR) || '|s1'), 1, 8) < 'f3333333' THEN 'val'
             ELSE 'test' END AS split
    FROM documents
)
SELECT split,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM s GROUP BY split
"""

PACK_TOKEN_SHARDS_SQL = r"""
WITH t AS (
    SELECT doc_id, doc_id % 8 AS writer,
        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks
    FROM documents
), c AS (
    SELECT doc_id, writer, toks,
        SUM(toks) OVER (PARTITION BY writer ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM t
), b AS (
    SELECT writer, toks,
        CAST(DENSE_RANK() OVER (
            PARTITION BY writer ORDER BY (cum - toks) // 2000
        ) - 1 AS BIGINT) AS shard
    FROM c
)
SELECT writer, shard,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(toks) AS BIGINT) AS shard_tokens
FROM b GROUP BY writer, shard
"""

ORACLES_EXT["split_train_val_test"] = SPLIT_TRAIN_VAL_TEST_SQL
ORACLES_EXT["pack_token_shards"] = PACK_TOKEN_SHARDS_SQL

# --------------------------------------------------------------------------
# MinHash-LSH and SimHash full-pipeline oracles.
#
# Both Spark queries use the portable md5-derived 60-bit hash
# (operators/neardup.py `portable_hash64`), which DuckDB reproduces
# bit-identically as ('0x' || substr(md5(x),1,15))::BIGINT — so the oracle
# replicates the ENTIRE pipeline (hashing, universal-hash minimums, band
# buckets, candidate join, verification), not just the output shape.
# The universal-hash coefficients are generated from the same seeded
# generator the operator uses, so both engines evaluate identical
# (a*h + b) % P chains.

_MD5_INT = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
_MH_PRIME = 2147483647  # operators/neardup.py HASH_PRIME
_MH_NUM, _MH_BANDS, _MH_SEED, _MH_THRESH = 64, 16, 42, 0.2
_MH_ROWS = _MH_NUM // _MH_BANDS


def _minhash_sql() -> str:
    from ..operators.neardup import _minhash_perms

    perms = _minhash_perms(_MH_NUM, _MH_SEED)
    mins = ",\n        ".join(
        f"MIN(({a} * h + {b}) % {_MH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(perms)
    )
    band_selects = "\n    UNION ALL\n    ".join(
        "SELECT doc_id, {band} AS band, {bucket} AS bucket FROM sigs".format(
            band=i,
            bucket=_MD5_INT.format(
                x="concat_ws(',', "
                + ", ".join(f"m{i * _MH_ROWS + j}" for j in range(_MH_ROWS))
                + ")"
            ),
        )
        for i in range(_MH_BANDS)
    )
    shingle_hash = _MD5_INT.format(x="shingle")
    return rf"""
WITH sets AS (
    SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(w) - {NGRAM_N - 1}, 0) + 1),
            i -> {_SHINGLE_CONCAT})) AS shingles
    FROM (SELECT doc_id, string_split({NORM}, ' ') AS w FROM documents)
), nonempty AS (
    SELECT * FROM sets WHERE len(shingles) > 0
), hashes AS (
    SELECT doc_id, {shingle_hash} % {_MH_PRIME} AS h
    FROM (SELECT doc_id, unnest(shingles) AS shingle FROM nonempty)
), sigs AS (
    SELECT doc_id,
        {mins}
    FROM hashes GROUP BY doc_id
), bands AS (
    {band_selects}
), cands AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id < b.doc_id
), verified AS (
    SELECT c.id_a, c.id_b,
        CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS intersection,
        CAST(len(sa.shingles) AS BIGINT) AS size_a,
        CAST(len(sb.shingles) AS BIGINT) AS size_b
    FROM cands c
    JOIN nonempty sa ON sa.doc_id = c.id_a
    JOIN nonempty sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, intersection,
    intersection / ((size_a + size_b) - intersection) AS jaccard
FROM verified
WHERE intersection / ((size_a + size_b) - intersection) >= {_MH_THRESH}
"""


_SH_BITS, _SH_BANDS, _SH_MAXHAM = 48, 4, 3
_SH_CHUNK = _SH_BITS // _SH_BANDS
_SH_MASK = (1 << _SH_CHUNK) - 1


def _simhash_sql() -> str:
    votes = ",\n        ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(_SH_BITS)
    )
    fingerprint = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END"
        for j in range(_SH_BITS)
    )
    band_selects = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, sh, {i} AS band, (sh >> {i * _SH_CHUNK}) & {_SH_MASK} AS chunk FROM fps"
        for i in range(_SH_BANDS)
    )
    tok_hash = _MD5_INT.format(x="tok")
    return rf"""
WITH toks AS (
    SELECT doc_id, unnest(list_distinct(string_split({NORM}, ' '))) AS tok
    FROM documents
), hashes AS (
    SELECT doc_id, {tok_hash} AS h FROM toks
), votes AS (
    SELECT doc_id,
        {votes}
    FROM hashes GROUP BY doc_id
), fps AS (
    SELECT doc_id, ({fingerprint}) AS sh FROM votes
), bands AS (
    {band_selects}
), cands AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        a.sh AS sh_a, b.sh AS sh_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.chunk = b.chunk
    WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM cands
WHERE bit_count(xor(sh_a, sh_b)) <= {_SH_MAXHAM}
"""


MINHASH_NEAR_DUP_SQL = _minhash_sql()
SIMHASH_NEAR_DUP_SQL = _simhash_sql()
ORACLES_EXT["minhash_near_dup"] = MINHASH_NEAR_DUP_SQL
ORACLES_EXT["simhash_near_dup"] = SIMHASH_NEAR_DUP_SQL

# Pairs → connected components: the same MinHash edges closed transitively
# with a recursive CTE; component id = min doc id, exactly the fixpoint the
# Spark min-label propagation converges to (operators/cluster.py).
NEAR_DUP_CLUSTERS_SQL = rf"""
WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM ({MINHASH_NEAR_DUP_SQL}) mh
), sym AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
    SELECT a AS id, a AS r FROM sym
    UNION
    SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r
), labels AS (
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
), sized AS (
    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
    FROM labels GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size,
    CAST(CASE WHEN l.doc_id = l.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM labels l JOIN sized s USING (cluster_id)
"""
ORACLES_EXT["near_dup_clusters"] = NEAR_DUP_CLUSTERS_SQL
# incremental maintenance must land on the identical clusters — same
# recursive-CTE oracle, unchanged
ORACLES_EXT["incremental_near_dup_clusters"] = NEAR_DUP_CLUSTERS_SQL

# Leakage-safe split: cluster closure + the standard md5-threshold rule
# keyed on the component id (singletons: the doc id).
LEAKAGE_SAFE_SPLIT_SQL = rf"""
WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM ({MINHASH_NEAR_DUP_SQL}) mh
), sym AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
    SELECT a AS id, a AS r FROM sym
    UNION
    SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r
), labels AS (
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
), keyed AS (
    SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS split_key
    FROM documents d LEFT JOIN labels l USING (doc_id)
)
SELECT doc_id, split_key,
    CASE WHEN substr(md5(split_key::VARCHAR || '|cl'), 1, 8) < 'e6666666' THEN 'train'
         WHEN substr(md5(split_key::VARCHAR || '|cl'), 1, 8) < 'f3333333' THEN 'val'
         ELSE 'test' END AS split
FROM keyed
"""
ORACLES_EXT["leakage_safe_split_docs"] = LEAKAGE_SAFE_SPLIT_SQL

# BM25: generated by the operator module from the same constants/terms as
# the Spark side (identical expression tree, identical pivot order).
from ..operators.search import oracle_sql as _bm25_oracle_sql  # noqa: E402
from .workloads_ext import BM25_K, BM25_TERMS  # noqa: E402

BM25_SEARCH_SQL = _bm25_oracle_sql(
    "documents", NORM, BM25_TERMS, id_col="doc_id", k=BM25_K
)
ORACLES_EXT["bm25_search_docs"] = BM25_SEARCH_SQL

# Portable quantile histogram: same exact-integer bucket math as the Spark
# side, generated by the operator module.
from ..operators.sketch import quantile_oracle_sql as _qh_oracle_sql  # noqa: E402

APPROX_PRICE_QUANTILES_SQL = _qh_oracle_sql(
    "(SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders) s",
    "cents",
    ["o_orderpriority"],
    [0.5, 0.9, 0.99],
)
ORACLES_EXT["approx_price_quantiles"] = APPROX_PRICE_QUANTILES_SQL

DECONTAMINATE_SQL = rf"""
WITH fp AS (
    SELECT doc_id, md5({NORM}) AS fp FROM documents
)
SELECT c.doc_id, c.fp FROM fp c
WHERE NOT EXISTS (
    SELECT 1 FROM fp ev WHERE ev.doc_id % 97 = 0 AND ev.fp = c.fp
)
"""

ORACLES_EXT["decontaminate_docs"] = DECONTAMINATE_SQL

# Trailing-window range self-join: the oracle states the interval predicate
# directly (DuckDB plans it as an IEJoin); the Spark side runs the
# bin-bucketed equi-join of operators/rangejoin.py. Window (t, t+30min],
# exact microsecond timestamp arithmetic on both engines.
RANGE_JOIN_BURSTS_SQL = r"""
WITH a AS (SELECT event_id, ts FROM events WHERE value > 180)
SELECT a.event_id,
       count(b.ts) AS n_follow,
       count(DISTINCT b.user_id) AS n_users,
       max(b.value) AS max_follow_value
FROM a LEFT JOIN events b
  ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
GROUP BY a.event_id
"""

ORACLES_EXT["range_join_event_bursts"] = RANGE_JOIN_BURSTS_SQL

# Sqrt-temperature domain mixture sampling: keep ⟺ h²·n_d < n_min·4^20 in
# exact integer math (HUGEINT here, DECIMAL(38,0) on the Spark side) — no
# pow/sqrt whose final ulp could flip a membership near the threshold.
TEMPERATURE_SAMPLE_SQL = r"""
WITH counts AS (
    SELECT lang, count(*) AS n_d FROM documents GROUP BY lang
), m AS (
    SELECT min(n_d) AS n_min FROM counts
), h AS (
    SELECT doc_id, lang, source,
           ('0x' || substr(md5(doc_id::VARCHAR || '|temp1'), 1, 5))::BIGINT AS hv
    FROM documents
)
SELECT h.doc_id, h.lang, h.source
FROM h JOIN counts USING (lang) CROSS JOIN m
WHERE hv::HUGEINT * hv * n_d < n_min::HUGEINT * 1099511627776
"""

ORACLES_EXT["temperature_mixture_sample"] = TEMPERATURE_SAMPLE_SQL

# JSONL parse/recovery: both engines serialize each doc to a minimal JSON
# line ({"doc_id":N,"text":"..."}, same field order, no spaces), truncate
# every 7th, and re-parse their OWN serialization — so the per-line parse
# outcome (Jackson PERMISSIVE vs json_valid) must agree line-for-line.
JSONL_PARSE_SQL = r"""
WITH j AS (
    SELECT doc_id AS orig_id,
           to_json(struct_pack(doc_id := doc_id, text := text))::VARCHAR AS js
    FROM documents
), lines AS (
    SELECT CASE WHEN orig_id % 7 = 0 THEN substr(js, 1, length(js) - 5)
                ELSE js END AS line
    FROM j
)
SELECT
    CASE WHEN json_valid(line) THEN json_extract(line, '$.doc_id')::BIGINT
         ELSE NULLIF(regexp_extract(line, '"doc_id":([0-9]+)', 1), '')::BIGINT
    END AS doc_id,
    CAST(json_valid(line) AS BIGINT) AS ok,
    CAST(CASE WHEN json_valid(line)
              THEN length(json_extract_string(line, '$.text')) END
         AS BIGINT) AS parsed_text_len
FROM lines
"""

ORACLES_EXT["jsonl_parse_recovery"] = JSONL_PARSE_SQL

# Simpson-diversity token stats: Σcnt² is an exact integer; each float
# output is one IEEE division of exactly-representable ints — portable
# without any float-sum ordering or libm concerns.
TOKEN_DIVERSITY_SQL = rf"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM documents
), cnts AS (
    SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
), agg AS (
    SELECT doc_id,
        CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
        CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
    FROM cnts GROUP BY doc_id
)
SELECT doc_id, n_tokens, distinct_tokens, sum_sq,
    (n_tokens * n_tokens) / sum_sq AS effective_vocab,
    1.0 - sum_sq / (n_tokens * n_tokens) AS gini_simpson
FROM agg
"""

ORACLES_EXT["token_diversity_docs"] = TOKEN_DIVERSITY_SQL

# Context-window chunking: the oracle slices each chunk's tokens directly
# from the split array (1-based list_slice), mirroring the row-generating
# Spark operator chunk-for-chunk. L=40, S=20, min 20 tokens.
_CH_L, _CH_S, _CH_MIN = 40, 20, 20
CHUNK_DOCS_SQL = rf"""
WITH w AS (
    SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents
), c AS (
    SELECT doc_id, ws,
           unnest(range(((len(ws) - 1) // {_CH_S}) + 1)) AS chunk_id
    FROM w WHERE len(ws) > 0
)
SELECT doc_id,
    chunk_id::BIGINT AS chunk_id,
    (least(chunk_id * {_CH_S} + {_CH_L}, len(ws))
        - chunk_id * {_CH_S})::BIGINT AS n_tokens,
    array_to_string(
        list_slice(ws, chunk_id * {_CH_S} + 1,
                   least(chunk_id * {_CH_S} + {_CH_L}, len(ws))), ' '
    ) AS chunk_text
FROM c
WHERE least(chunk_id * {_CH_S} + {_CH_L}, len(ws)) - chunk_id * {_CH_S}
      >= {_CH_MIN}
"""

ORACLES_EXT["chunk_docs_for_training"] = CHUNK_DOCS_SQL

# --------------------------------------------------------------------------
# PII redaction / repetition filter / URL normalization / stratified sample
# / corpus n-grams. Patterns live in the RE2∩Java-regex subset so both
# engines evaluate them identically (operators/scrub.py docstring).

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
_PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

PII_REDACT_SQL = rf"""
WITH aug AS (
    SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN
            text || ' contact u' || doc_id || '@mail.example.com ph 555-'
                 || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || ' ip 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                 || ' ssn 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        ELSE text END AS text
    FROM documents
)
SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
    CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT) AS n_ssn,
    CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
    CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ipv4,
    regexp_replace(
        regexp_replace(
            regexp_replace(
                regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                '{_PII_SSN}', '<SSN>', 'g'),
            '{_PII_PHONE}', '<PHONE>', 'g'),
        '{_PII_IP}', '<IP>', 'g') AS clean_text
FROM aug
"""

REPETITION_FILTER_SQL = rf"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM documents
), uni AS (
    SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
), per_uni AS (
    SELECT doc_id,
        CAST(SUM(cnt) AS BIGINT) AS total_tokens,
        CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
        CAST(MAX(cnt) AS BIGINT) AS top_token_cnt
    FROM uni GROUP BY doc_id
), bigs AS (
    SELECT doc_id,
        unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
    FROM (SELECT doc_id, string_split({NORM}, ' ') AS w FROM documents)
), per_big AS (
    SELECT doc_id,
        CAST(SUM(cnt) AS BIGINT) AS total_bigrams,
        CAST(MAX(cnt) AS BIGINT) AS top_bigram_cnt
    FROM (SELECT doc_id, bigram, COUNT(*) AS cnt FROM bigs GROUP BY doc_id, bigram)
    GROUP BY doc_id
), joined AS (
    SELECT u.doc_id, u.total_tokens, u.distinct_tokens, u.top_token_cnt,
        COALESCE(b.total_bigrams, 0) AS total_bigrams,
        COALESCE(b.top_bigram_cnt, 0) AS top_bigram_cnt
    FROM per_uni u LEFT JOIN per_big b ON u.doc_id = b.doc_id
)
SELECT doc_id, total_tokens, distinct_tokens, top_token_cnt,
    total_bigrams, top_bigram_cnt,
    1.0 - (distinct_tokens / total_tokens) AS dup_token_frac,
    top_token_cnt / total_tokens AS top_token_frac,
    CASE WHEN total_bigrams > 0 THEN top_bigram_cnt / total_bigrams
         ELSE 0.0 END AS top_bigram_frac,
    CAST(
        (1.0 - (distinct_tokens / total_tokens)) <= 0.5
        AND (CASE WHEN total_bigrams > 0 THEN top_bigram_cnt / total_bigrams
                  ELSE 0.0 END) <= 0.18
    AS BIGINT) AS keep
FROM joined
"""

URL_HOST_STATS_SQL = r"""
WITH urls AS (
    SELECT doc_id,
        lower('https://WWW.Host' || (doc_id % 50) || '.example.com:443/p/'
              || doc_id || '?utm_source=x&sid=' || (doc_id % 7) || '#frag') AS url
    FROM documents
), canon AS (
    SELECT
        regexp_replace(
            regexp_replace(
                lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)),
                ':[0-9]+$', ''),
            '^www\.', '') AS host,
        regexp_extract(url, '^([^?#]*)', 1) AS clean_url
    FROM urls
)
SELECT host,
    CAST(COUNT(*) AS BIGINT) AS n_urls,
    CAST(COUNT(DISTINCT clean_url) AS BIGINT) AS n_pages
FROM canon GROUP BY host
"""

# Bounds = operators/sampling.py rate_bound(rate): format(int(rate*16**8),
# '08x'), 'gggggggg' for rate >= 1 — pinned by tests/test_sampling.py.
STRATIFIED_SAMPLE_SQL = r"""
SELECT doc_id, lang, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|strat1'), 1, 8) <
    CASE lang
        WHEN 'en' THEN '80000000'
        WHEN 'zh' THEN 'cccccccc'
        WHEN 'es' THEN '99999999'
        WHEN 'fr' THEN 'gggggggg'
        ELSE '40000000' END
"""

CORPUS_TOP_TRIGRAMS_SQL = rf"""
WITH grams AS (
    SELECT unnest(list_transform(range(1, len(w) - 1),
        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ngram
    FROM (SELECT string_split({NORM}, ' ') AS w FROM documents)
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams GROUP BY ngram
ORDER BY n DESC, ngram ASC
LIMIT 20
"""

# --------------------------------------------------------------------------
# ANN top-k full-pipeline oracles (LSH + IVF).
#
# Both Spark paths quantize vectors and hyperplanes/centroids to
# floor(x * 2^20) int64 and assign buckets/cells with EXACT integer dot
# products (operators/similarity.py QUANT rationale) — so DuckDB replicates
# the entire candidate-generation stage bit-identically from the same
# seeded planes, then the exact re-rank reuses the engine-portable rounded
# cosine of COSINE_TOPK_SQL.

_ANN_DIM, _ANN_K, _ANN_SEED = 64, 5, 42
_LSH_BITS, _LSH_TABLES = 8, 4
_IVF_CELLS, _IVF_NPROBE = 16, 4

_XQ = (
    "list_transform(range(1, 65), i -> "
    "CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT))"
)

_RERANK = """
, scored AS (
    SELECT c.query_id, c.neighbor_id,
        ROUND(
            list_sum(list_transform(range(1, 65),
                i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(n.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))))),
        6) AS cosine_sim
    FROM cands c
    JOIN embeddings q ON q.vec_id = c.query_id
    JOIN embeddings n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS BIGINT) AS sim_rank
FROM scored
QUALIFY sim_rank <= {k}
""".format(k=_ANN_K)


def _int_list(vals) -> str:
    return "list_value(" + ", ".join(str(int(v)) for v in vals) + ")"


def _lsh_ann_sql() -> str:
    from ..operators.similarity import _hyperplanes, quantize

    planes_q = quantize(_hyperplanes(_ANN_DIM, _LSH_BITS, _LSH_TABLES, _ANN_SEED))
    tables_sql = []
    for t in range(_LSH_TABLES):
        bits_sum = " + ".join(
            f"CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> xq[i] * ({_int_list(planes_q[t][b])})[i])) > 0 "
            f"THEN {1 << b} ELSE 0 END"
            for b in range(_LSH_BITS)
        )
        tables_sql.append(
            f"SELECT vec_id, {t} AS tbl, ({bits_sum}) AS bucket FROM xq"
        )
    buckets = "\n    UNION ALL\n    ".join(tables_sql)
    return f"""
WITH xq AS (
    SELECT vec_id, {_XQ} AS xq FROM embeddings
), buckets AS (
    {buckets}
), cands AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM buckets q JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
    WHERE q.vec_id < 20 AND q.vec_id != c.vec_id
){_RERANK}"""


_IVF_ITERS = 4


def _trained_ivf_codebook() -> "np.ndarray":
    """Retrain the IVF codebook exactly as the Spark query does
    (similarity.train_ivf_codebook: quantize → argmax int64 dots →
    order-free int64 per-dim sums → floor-division update, empty cells
    keep their centroid) — in numpy, from the parquet the oracle will run
    against. Every step is exact integer arithmetic, so both trainings
    land on the IDENTICAL codebook and it can be embedded as literals.

    The parquet path comes from $SPARK_GRAFT_ORACLE_SF_DIR (the driver
    checks at sf0.01 — the default; tools/check_correctness.py sets it to
    whatever sf_dir it was given, because embeddings differ across SFs).
    """
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from ..operators.similarity import _centroids, quantize

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    xq = quantize(mat)
    cb = quantize(_centroids(_ANN_DIM, _IVF_CELLS, _ANN_SEED))
    for _ in range(_IVF_ITERS):
        assign = np.argmax(xq @ cb.T, axis=1)
        new_cb = cb.copy()
        for c in range(_IVF_CELLS):
            members = xq[assign == c]
            if len(members):
                new_cb[c] = np.floor_divide(members.sum(axis=0), len(members))
        cb = new_cb
    return cb


def _trained_ivf_codebook_base_subset() -> "np.ndarray":
    """The incremental-index codebook: trained (same exact-integer Lloyd)
    on the BASE subset only (vec_id % 5 != 0) — mirrors
    ann_index.build_ivf_index in the incremental_ivf_ann query."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from ..operators.similarity import _centroids, quantize

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.array(emb.column("vec_id").to_pylist())
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    xq = quantize(mat[ids % 5 != 0])
    cb = quantize(_centroids(_ANN_DIM, _IVF_CELLS, _ANN_SEED))
    for _ in range(_IVF_ITERS):
        assign = np.argmax(xq @ cb.T, axis=1)
        new_cb = cb.copy()
        for c in range(_IVF_CELLS):
            members = xq[assign == c]
            if len(members):
                new_cb[c] = np.floor_divide(members.sum(axis=0), len(members))
        cb = new_cb
    return cb


def _ivf_probe_sql(cb_q) -> str:
    """The IVF probe pipeline (corpus cells → query cells → candidates →
    exact re-rank) against a given quantized codebook's literals."""
    dots = ", ".join(
        f"list_sum(list_transform(range(1, 65), "
        f"i -> xq[i] * ({_int_list(cb_q[c])})[i]))"
        for c in range(_IVF_CELLS)
    )
    return f"""
WITH xq AS (
    SELECT vec_id, {_XQ} AS xq FROM embeddings
), dots AS (
    SELECT vec_id, list_value({dots}) AS d FROM xq
), corpus_cells AS (
    SELECT vec_id, CAST(list_position(d, list_max(d)) - 1 AS BIGINT) AS cell
    FROM dots
), q_exp AS (
    SELECT vec_id, i AS idx, d[i] AS dot
    FROM dots, range(1, {_IVF_CELLS + 1}) t(i)
    WHERE vec_id < 20
), query_cells AS (
    SELECT vec_id, CAST(idx - 1 AS BIGINT) AS cell
    FROM (
        SELECT vec_id, idx,
            ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dot DESC, idx ASC) AS rn
        FROM q_exp
    )
    WHERE rn <= {_IVF_NPROBE}
), cands AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM query_cells q JOIN corpus_cells c ON q.cell = c.cell
    WHERE q.vec_id != c.vec_id
){_RERANK}"""


def _ivf_ann_sql() -> str:
    cb_q = _trained_ivf_codebook()
    dots = ", ".join(
        f"list_sum(list_transform(range(1, 65), "
        f"i -> xq[i] * ({_int_list(cb_q[c])})[i]))"
        for c in range(_IVF_CELLS)
    )
    return f"""
WITH xq AS (
    SELECT vec_id, {_XQ} AS xq FROM embeddings
), dots AS (
    SELECT vec_id, list_value({dots}) AS d FROM xq
), corpus_cells AS (
    -- nprobe=1: first occurrence of the max dot = lowest tied index
    SELECT vec_id, CAST(list_position(d, list_max(d)) - 1 AS BIGINT) AS cell
    FROM dots
), q_exp AS (
    SELECT vec_id, i AS idx, d[i] AS dot
    FROM dots, range(1, {_IVF_CELLS + 1}) t(i)
    WHERE vec_id < 20
), query_cells AS (
    SELECT vec_id, CAST(idx - 1 AS BIGINT) AS cell
    FROM (
        SELECT vec_id, idx,
            ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dot DESC, idx ASC) AS rn
        FROM q_exp
    )
    WHERE rn <= {_IVF_NPROBE}
), cands AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM query_cells q JOIN corpus_cells c ON q.cell = c.cell
    WHERE q.vec_id != c.vec_id
){_RERANK}"""


_PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_REFINE = 8, 16, 3, 20
_PQ_DSUB = _ANN_DIM // _PQ_M


def _trained_pq_codebooks() -> "np.ndarray":
    """Retrain the PQ codebooks exactly as similarity.train_pq_codebooks
    does (quantize → per-subspace argmin of ‖c‖²−2x·c on int64 → order-free
    int64 sums → floor-division update, empty codes keep their centroid,
    ties → lowest code) — in numpy, from the oracle's parquet. Exact
    integer arithmetic end-to-end, so both trainings land on identical
    codebooks and they embed as literals."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from ..operators.similarity import quantize

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    xq = quantize(mat).reshape(-1, _PQ_M, _PQ_DSUB)
    rng = np.random.RandomState(_ANN_SEED)
    cb = quantize(
        rng.standard_normal((_PQ_M, _PQ_KSUB, _PQ_DSUB)) / np.sqrt(_ANN_DIM)
    )
    for _ in range(_PQ_ITERS):
        terms = (cb.astype(np.int64) ** 2).sum(axis=2)[None, :, :] - 2 * np.einsum(
            "nmd,mkd->nmk", xq, cb
        )
        codes = np.argmin(terms, axis=2)  # (n, m), first-hit ties
        new_cb = cb.copy()
        for s in range(_PQ_M):
            for c in range(_PQ_KSUB):
                members = xq[:, s, :][codes[:, s] == c]
                if len(members):
                    new_cb[s][c] = np.floor_divide(members.sum(axis=0), len(members))
        cb = new_cb
    return cb


def _pq_ann_sql() -> str:
    """IVF-PQ: the IVF cell CTEs from _ivf_ann_sql, plus per-vector PQ
    terms/codes from the retrained codebook literals, ADC ranking
    (sum of m LUT lookups — query terms indexed by corpus codes), a
    refine cut, then the shared exact re-rank."""
    ivf_cb = _trained_ivf_codebook()
    pq_cb = _trained_pq_codebooks()
    ivf_dots = ", ".join(
        f"list_sum(list_transform(range(1, 65), "
        f"i -> xq[i] * ({_int_list(ivf_cb[c])})[i]))"
        for c in range(_IVF_CELLS)
    )
    term_lists = []
    for s in range(_PQ_M):
        cnorms = (pq_cb[s].astype("int64") ** 2).sum(axis=1)
        entries = ", ".join(
            f"({int(cnorms[c])} - 2 * list_sum(list_transform(range(1, {_PQ_DSUB + 1}), "
            f"i -> xq[{s * _PQ_DSUB} + i] * ({_int_list(pq_cb[s][c])})[i])))"
            for c in range(_PQ_KSUB)
        )
        term_lists.append(f"list_value({entries}) AS t{s}")
    codes = ", ".join(
        f"CAST(list_position(t{s}, list_min(t{s})) - 1 AS BIGINT)"
        for s in range(_PQ_M)
    )
    terms = ", ".join(f"t{s}" for s in range(_PQ_M))
    return f"""
WITH xq AS (
    SELECT vec_id, {_XQ} AS xq FROM embeddings
), dots AS (
    SELECT vec_id, list_value({ivf_dots}) AS d FROM xq
), corpus_cells AS (
    SELECT vec_id, CAST(list_position(d, list_max(d)) - 1 AS BIGINT) AS cell
    FROM dots
), q_exp AS (
    SELECT vec_id, i AS idx, d[i] AS dot
    FROM dots, range(1, {_IVF_CELLS + 1}) t(i)
    WHERE vec_id < 20
), query_cells AS (
    SELECT vec_id, CAST(idx - 1 AS BIGINT) AS cell
    FROM (
        SELECT vec_id, idx,
            ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dot DESC, idx ASC) AS rn
        FROM q_exp
    )
    WHERE rn <= {_IVF_NPROBE}
), pq_terms AS (
    SELECT vec_id, {", ".join(term_lists)} FROM xq
), pq AS (
    SELECT vec_id, list_value({codes}) AS codes, list_value({terms}) AS terms
    FROM pq_terms
), cand0 AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM query_cells q JOIN corpus_cells c ON q.cell = c.cell
    WHERE q.vec_id != c.vec_id
), adc AS (
    SELECT c0.query_id, c0.neighbor_id,
        list_sum(list_transform(range(1, {_PQ_M + 1}),
            s -> qp.terms[s][cp.codes[s] + 1])) AS ad
    FROM cand0 c0
    JOIN pq qp ON qp.vec_id = c0.query_id
    JOIN pq cp ON cp.vec_id = c0.neighbor_id
), cands AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY ad ASC, neighbor_id ASC) AS rn
        FROM adc
    )
    WHERE rn <= {_PQ_REFINE}
){_RERANK}"""


def _jl_sql() -> str:
    """JL projection oracle: the 16 projected coordinates as integer dot
    products against the seeded quantized matrix literals."""
    from ..operators.similarity import jl_projection_matrix

    r_q = jl_projection_matrix(_ANN_DIM, 16, _ANN_SEED)
    coords = ", ".join(
        f"list_sum(list_transform(range(1, 65), "
        f"i -> xq[i] * ({_int_list(r_q[c])})[i]))"
        for c in range(16)
    )
    return f"""
WITH xq AS (
    SELECT vec_id, {_XQ} AS xq FROM embeddings
)
SELECT vec_id, array_to_string(list_value({coords}), ',') AS proj_csv FROM xq
"""


ORACLES_EXT["jl_project_embeddings"] = _jl_sql()

LSH_ANN_TOPK_SQL = _lsh_ann_sql()
IVF_ANN_TOPK_SQL = _ivf_ann_sql()
ORACLES_EXT["lsh_ann_topk"] = LSH_ANN_TOPK_SQL
ORACLES_EXT["ivf_ann_topk"] = IVF_ANN_TOPK_SQL
ORACLES_EXT["pq_ann_topk"] = _pq_ann_sql()
# incremental index: frozen base-trained codebook assigns the WHOLE
# corpus — append ≡ rebuild under a frozen codebook
ORACLES_EXT["incremental_ivf_ann"] = _ivf_probe_sql(
    _trained_ivf_codebook_base_subset()
)


def _ivf_drift_sql() -> str:
    """Per-cell drift metrics with the base-trained frozen codebook:
    cell = argmax dot (ties → lowest index), best_dot = that max dot,
    occupancy + new-batch split + alignment sums — all exact int64
    (DuckDB SUM(BIGINT) is HUGEINT, so the sums cast back)."""
    cb_q = _trained_ivf_codebook_base_subset()
    dots = ", ".join(
        f"list_sum(list_transform(range(1, 65), "
        f"i -> xq[i] * ({_int_list(cb_q[c])})[i]))"
        for c in range(_IVF_CELLS)
    )
    return f"""
WITH xq AS (
    SELECT vec_id, {_XQ} AS xq FROM embeddings
), dots AS (
    SELECT vec_id, list_value({dots}) AS d FROM xq
), cells AS (
    SELECT vec_id,
        CAST(list_position(d, list_max(d)) - 1 AS BIGINT) AS cell,
        list_max(d) AS best_dot
    FROM dots
)
SELECT cell,
    CAST(COUNT(*) AS BIGINT) AS n_vecs,
    CAST(SUM(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
    CAST(SUM(best_dot) AS BIGINT) AS sum_best_dot
FROM cells
GROUP BY cell"""


ORACLES_EXT["ivf_index_drift"] = _ivf_drift_sql()

ORACLES_EXT["pii_redact_docs"] = PII_REDACT_SQL
ORACLES_EXT["repetition_filter_docs"] = REPETITION_FILTER_SQL

# Curation funnel: composes the quality and repetition oracles as
# subqueries (defined above), so the funnel's cumulative accounting reuses
# the exact stage predicates already hash-checked in isolation.
CURATION_FUNNEL_SQL = rf"""
WITH q AS ({TEXT_QUALITY_SQL}), r AS ({REPETITION_FILTER_SQL}),
fp AS (
    SELECT doc_id, n_chars, md5({NORM}) AS fp FROM documents
), flags AS (
    SELECT fp.n_chars,
        CASE WHEN q.quality_score >= 1.2 THEN 1 ELSE 0 END AS c1,
        CASE WHEN q.quality_score >= 1.2 AND r.keep = 1 THEN 1 ELSE 0 END AS c2,
        CASE WHEN q.quality_score >= 1.2 AND r.keep = 1 AND NOT EXISTS (
            SELECT 1 FROM fp ev
            WHERE ev.doc_id % 97 = 0 AND ev.fp = fp.fp
        ) THEN 1 ELSE 0 END AS c3
    FROM fp
    JOIN q USING (doc_id)
    JOIN r USING (doc_id)
), agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n0,
        CAST(sum(n_chars) AS BIGINT) AS ch0,
        CAST(sum(c1) AS BIGINT) AS n1,
        CAST(COALESCE(sum(CASE WHEN c1 = 1 THEN n_chars END), 0) AS BIGINT) AS ch1,
        CAST(sum(c2) AS BIGINT) AS n2,
        CAST(COALESCE(sum(CASE WHEN c2 = 1 THEN n_chars END), 0) AS BIGINT) AS ch2,
        CAST(sum(c3) AS BIGINT) AS n3,
        CAST(COALESCE(sum(CASE WHEN c3 = 1 THEN n_chars END), 0) AS BIGINT) AS ch3
    FROM flags
)
SELECT '0_ingested' AS stage, n0 AS n_docs, ch0 AS total_chars FROM agg
UNION ALL SELECT '1_quality', n1, ch1 FROM agg
UNION ALL SELECT '2_repetition', n2, ch2 FROM agg
UNION ALL SELECT '3_decontaminated', n3, ch3 FROM agg
"""

ORACLES_EXT["curation_funnel_docs"] = CURATION_FUNNEL_SQL

# Bloom semi-join pruning: the oracle rebuilds the identical bitmap (same
# md5 double-hash positions (h1 + i·h2) mod 2^18, same 32-bit words) and
# must agree with Spark on every false positive, not just the exact
# membership. The per-key probe is computed once per DISTINCT fact key,
# then joined back to the fact rows.
_BLOOM_M = 1 << 18
_BLOOM_HASH = (
    "('0x' || substr(md5({key}::VARCHAR || '|bl1'), 1, 15))::BIGINT"
)
_BLOOM_HASH2 = (
    "('0x' || substr(md5({key}::VARCHAR || '|bl1'), 17, 15))::BIGINT"
)
BLOOM_PRUNE_SQL = rf"""
WITH dimk AS (
    SELECT DISTINCT o_orderkey AS key FROM orders
    WHERE o_orderpriority = '1-URGENT'
), words AS (
    SELECT p // 32 AS word,
           bit_or(1::BIGINT << (p % 32)::INT) AS bits
    FROM (
        SELECT ({_BLOOM_HASH.format(key='key')}
                + i * {_BLOOM_HASH2.format(key='key')}) % {_BLOOM_M} AS p
        FROM dimk, (VALUES (0), (1), (2), (3)) t(i)
    )
    GROUP BY 1
), fkeys AS (
    SELECT DISTINCT l_orderkey FROM lineitem
), fpos AS (
    SELECT l_orderkey,
           ({_BLOOM_HASH.format(key='l_orderkey')}
            + i * {_BLOOM_HASH2.format(key='l_orderkey')}) % {_BLOOM_M} AS p
    FROM fkeys, (VALUES (0), (1), (2), (3)) t(i)
), fhit AS (
    SELECT l_orderkey
    FROM fpos LEFT JOIN words ON (p // 32) = word
    GROUP BY l_orderkey
    HAVING count(*) FILTER (
        WHERE bits IS NOT NULL
          AND (bits & (1::BIGINT << (p % 32)::INT))
              = (1::BIGINT << (p % 32)::INT)
    ) = 4
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_bloom_pass,
       CAST(count(*) FILTER (
           WHERE l_orderkey IN (SELECT key FROM dimk)
       ) AS BIGINT) AS n_exact
FROM lineitem JOIN fhit USING (l_orderkey)
GROUP BY l_returnflag
"""

ORACLES_EXT["bloom_prune_lineitem"] = BLOOM_PRUNE_SQL

# K-minimum-values uniform sample: ORDER BY md5 hash, deterministic
# doc_id tiebreak (md5 collisions don't occur here, but the tiebreak makes
# the contract airtight).
UNIFORM_SAMPLE_SQL = r"""
SELECT doc_id, lang, source,
       md5(doc_id::VARCHAR || '|usamp1') AS h
FROM documents
ORDER BY h, doc_id
LIMIT 100
"""

ORACLES_EXT["uniform_sample_docs"] = UNIFORM_SAMPLE_SQL

# Count-Min heavy hitters: counters built from per-token totals (equal to
# counting occurrences), probes = the exact top-20; estimate = min over
# the d=4 rows. Same md5 double-hash as the bloom oracle; all integers.
_CMS_W, _CMS_D = 1 << 10, 4
_CMS_H1 = "('0x' || substr(md5(tok || '|cms1'), 1, 15))::BIGINT"
_CMS_H2 = "('0x' || substr(md5(tok || '|cms1'), 17, 15))::BIGINT"
CMS_HEAVY_SQL = rf"""
WITH toks AS (
    SELECT unnest(string_split({NORM}, ' ')) AS tok FROM documents
), tokc AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
), counters AS (
    SELECT i, ({_CMS_H1} + i * {_CMS_H2}) % {_CMS_W} AS pos,
           CAST(SUM(cnt) AS BIGINT) AS c
    FROM tokc, (VALUES (0), (1), (2), (3)) v(i)
    GROUP BY 1, 2
), top20 AS (
    SELECT tok, cnt AS exact_cnt FROM tokc
    ORDER BY cnt DESC, tok ASC LIMIT 20
), est AS (
    SELECT t.tok, CAST(min(c.c) AS BIGINT) AS cms_cnt
    FROM top20 t
    CROSS JOIN (VALUES (0), (1), (2), (3)) v(i)
    JOIN counters c
      ON c.i = v.i
     AND c.pos = (('0x' || substr(md5(t.tok || '|cms1'), 1, 15))::BIGINT
                  + v.i * ('0x' || substr(md5(t.tok || '|cms1'), 17, 15))::BIGINT)
                 % {_CMS_W}
    GROUP BY t.tok
)
SELECT t.tok, t.exact_cnt, e.cms_cnt
FROM top20 t JOIN est e USING (tok)
"""

ORACLES_EXT["cms_heavy_tokens"] = CMS_HEAVY_SQL

# Vocabulary encoding: dense frequency-ranked ids (count DESC, token ASC
# tie-break), documents re-emitted as position-ordered id lists.
VOCAB_ENCODE_SQL = rf"""
WITH w AS (
    SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents
), toks AS (
    SELECT doc_id, unnest(range(len(ws))) AS pos, ws FROM w
), tok_rows AS (
    SELECT doc_id, pos, ws[pos + 1] AS tok FROM toks
), vocab AS (
    SELECT tok,
           CAST(row_number() OVER (ORDER BY count(*) DESC, tok ASC) - 1
                AS BIGINT) AS id
    FROM tok_rows GROUP BY tok
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       array_to_string(list(v.id ORDER BY t.pos), ',') AS ids
FROM tok_rows t JOIN vocab v USING (tok)
GROUP BY t.doc_id
"""

ORACLES_EXT["vocab_encode_docs"] = VOCAB_ENCODE_SQL

# Exact-integer 1.5σ outliers: 4(n·x − S)²·(n−1) > 9n(nQ − S²) in HUGEINT
# — the denominator-cleared |x − μ| > 1.5σ, no float anywhere.
OUTLIER_ORDERS_SQL = r"""
WITH c AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS x
    FROM orders
), s AS (
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS HUGEINT) AS sm,
           CAST(sum(x::HUGEINT * x) AS HUGEINT) AS q
    FROM c GROUP BY o_orderpriority
)
SELECT c.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (
           WHERE 4 * (n::HUGEINT * x - sm) * (n::HUGEINT * x - sm) * (n - 1)
                 > 9 * n::HUGEINT * (n * q - sm * sm)
       ) AS BIGINT) AS n_outliers
FROM c JOIN s USING (o_orderpriority)
GROUP BY c.o_orderpriority
"""

ORACLES_EXT["outlier_orders_exact"] = OUTLIER_ORDERS_SQL

# Incremental view maintenance: the oracle aggregates the WHOLE table
# directly; the Spark side merges per-batch partials — equality is the IVM
# invariant itself.
INCREMENTAL_ROLLUP_SQL = r"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
"""

ORACLES_EXT["incremental_daily_rollup"] = INCREMENTAL_ROLLUP_SQL

# Calendar-spine gap filling: dense (day × type) grid, zero-filled.
GAP_FILL_SQL = r"""
WITH b AS (
    SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
    FROM events
), spine AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS event_date
    FROM b
), types AS (
    SELECT DISTINCT event_type FROM events
), daily AS (
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE value > 400
    GROUP BY 1, 2
)
SELECT CAST(s.event_date AS VARCHAR) AS event_date,
       t.event_type,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
FROM spine s
CROSS JOIN types t
LEFT JOIN daily d
  ON d.event_date = s.event_date AND d.event_type = t.event_type
"""

ORACLES_EXT["gap_fill_daily"] = GAP_FILL_SQL

# Running distinct users: distinct-to-date == Σ first-seen-that-day.
CUMULATIVE_NEW_USERS_SQL = r"""
WITH fs AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
), dn AS (
    SELECT d0, CAST(count(*) AS BIGINT) AS n_new FROM fs GROUP BY d0
)
SELECT CAST(d0 AS VARCHAR) AS event_date, n_new,
       CAST(sum(n_new) OVER (ORDER BY d0 ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM dn
"""

ORACLES_EXT["cumulative_new_users"] = CUMULATIVE_NEW_USERS_SQL

COHORT_RETENTION_SQL = r"""
WITH fw AS (
    SELECT user_id, min(CAST(date_trunc('week', ts) AS DATE)) AS w0
    FROM events GROUP BY user_id
), act AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
    FROM events
)
SELECT CAST(f.w0 AS VARCHAR) AS cohort_week,
       CAST((a.w - f.w0) / 7 AS BIGINT) AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM act a JOIN fw f USING (user_id)
GROUP BY 1, 2
"""

ORACLES_EXT["cohort_retention"] = COHORT_RETENTION_SQL

EVENT_FUNNEL_SQL = r"""
WITH t1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN t1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > t1.t1
    GROUP BY e.user_id
), t3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN t2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > t2.t2
    GROUP BY e.user_id
)
SELECT '1_view' AS stage, CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_users
UNION ALL
SELECT '2_click_after_view', CAST((SELECT count(*) FROM t2) AS BIGINT)
UNION ALL
SELECT '3_purchase_after_click', CAST((SELECT count(*) FROM t3) AS BIGINT)
"""

ORACLES_EXT["event_funnel_conversion"] = EVENT_FUNNEL_SQL

# Time-bounded funnel: same chained min-aggregates with a 24h upper bound
# per stage, on epoch-microsecond integers.
BOUNDED_FUNNEL_SQL = """
WITH t1 AS (
    SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t2
    FROM events e JOIN t1 USING (user_id)
    WHERE e.event_type = 'click'
      AND epoch_us(e.ts) > t1.t1
      AND epoch_us(e.ts) <= t1.t1 + 86400000000
    GROUP BY e.user_id
), t3 AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t3
    FROM events e JOIN t2 USING (user_id)
    WHERE e.event_type = 'purchase'
      AND epoch_us(e.ts) > t2.t2
      AND epoch_us(e.ts) <= t2.t2 + 86400000000
    GROUP BY e.user_id
), c AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n1,
           (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n2,
           (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n3
)
SELECT '1_view' AS stage, n1 AS n_users FROM c
UNION ALL SELECT '2_click_24h', n2 FROM c
UNION ALL SELECT '3_purchase_24h', n3 FROM c
"""
ORACLES_EXT["bounded_funnel_conversion"] = BOUNDED_FUNNEL_SQL

# ABC classification: same exact-cents running sum and cross-multiplied
# boundaries.
ABC_CLASSIFICATION_SQL = """
WITH per_part AS (
    SELECT l_partkey,
        CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
            AS rev_cents
    FROM lineitem GROUP BY l_partkey
), cum AS (
    SELECT l_partkey, rev_cents,
        SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
        SUM(rev_cents) OVER () AS total_cents
    FROM per_part
), classed AS (
    SELECT CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
        rev_cents
    FROM cum
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
    CAST(sum(rev_cents) AS BIGINT) AS class_cents
FROM classed GROUP BY abc_class
"""
ORACLES_EXT["abc_classification_parts"] = ABC_CLASSIFICATION_SQL

# Theil-Sen: exact scaled-integer pairwise slopes — Spark div and
# DuckDB // BOTH truncate toward zero, so plain integer division is
# engine-identical; lower-median rank walk.
THEIL_SEN_SQL = """
WITH daily AS (
    SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS di,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS c
    FROM orders GROUP BY 1
), slopes AS (
    SELECT ((b.c - a.c) * 1000000) // (b.di - a.di) AS s
    FROM daily a JOIN daily b ON a.di < b.di
), r AS (
    SELECT s, ROW_NUMBER() OVER (ORDER BY s ASC) AS rn,
        count(*) OVER () AS n
    FROM slopes
)
SELECT CAST(n AS BIGINT) AS n_pairs,
    s AS median_slope_scaled,
    s / 1000000.0 AS cents_per_day
FROM r WHERE rn = (n + 1) // 2
"""
ORACLES_EXT["theil_sen_daily_trend"] = THEIL_SEN_SQL

# Mann-Whitney: RANK (first-of-tie) + per-value counts -> doubled
# midranks, all integer.
MANN_WHITNEY_SQL = """
WITH base AS (
    SELECT o_orderpriority AS grp,
        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), ranked AS (
    SELECT grp, v,
        RANK() OVER (ORDER BY v ASC) AS rk,
        COUNT(*) OVER (PARTITION BY v) AS cnt
    FROM base
), sums AS (
    SELECT grp, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(rk * 2 + cnt - 1) AS BIGINT) AS r2
    FROM ranked GROUP BY grp
)
SELECT grp, n, r2, r2 - n * (n + 1) AS u2 FROM sums
"""
ORACLES_EXT["mann_whitney_u_orders"] = MANN_WHITNEY_SQL

MANN_KENDALL_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS c
    FROM orders GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END)
        AS BIGINT) AS s_statistic
FROM daily a JOIN daily b ON a.d < b.d
"""
ORACLES_EXT["mann_kendall_trend_orders"] = MANN_KENDALL_SQL

# KS two-sample: step-CDF supremum at sample values, cross-multiplied to
# int64; one final division for the float statistic.
KS_TEST_SQL = """
WITH base AS (
    SELECT o_orderpriority AS grp,
        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), per_val AS (
    SELECT v,
        CAST(sum(CASE WHEN grp = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        CAST(sum(CASE WHEN grp = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS cb
    FROM base GROUP BY v
), cum AS (
    SELECT SUM(ca) OVER (ORDER BY v) AS ca_cum,
           SUM(cb) OVER (ORDER BY v) AS cb_cum
    FROM per_val
), tot AS (
    SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
    FROM per_val
)
SELECT na AS n_a, nb AS n_b,
    CAST(max(abs(ca_cum * nb - cb_cum * na)) AS BIGINT) AS d_scaled,
    CAST(max(abs(ca_cum * nb - cb_cum * na)) AS BIGINT)
        / CAST(na * nb AS DOUBLE) AS d_stat
FROM cum, tot GROUP BY na, nb
"""
ORACLES_EXT["ks_test_orders"] = KS_TEST_SQL

# Q5-shaped star join; revenue as exact integer cents·(100−disc) summed,
# one division at the end — no float-sum ordering hazard.
STAR_JOIN_SQL = r"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

ORACLES_EXT["star_join_revenue"] = STAR_JOIN_SQL

# Z-order clustering: the oracle evaluates the SAME mask-spread SQL
# expression (operators/zorder.py zvalue_expr — integer shifts/masks,
# valid verbatim in both Spark SQL and DuckDB).
from ..operators.zorder import zvalue_expr as _zvalue_expr  # noqa: E402

ZORDER_SQL = rf"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST({_zvalue_expr('(l_partkey % 1024)', '(l_suppkey % 1024)')} AS BIGINT) AS zkey
FROM lineitem
ORDER BY zkey, l_orderkey, l_linenumber
LIMIT 100
"""

ORACLES_EXT["zorder_cluster_lineitem"] = ZORDER_SQL

CUBE_ORDERS_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
    COALESCE(o_orderstatus, 'ALL') AS status,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 1e8, 4)
        AS value_m
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""

ORACLES_EXT["cube_orders"] = CUBE_ORDERS_SQL
ORACLES_EXT["url_host_stats"] = URL_HOST_STATS_SQL
ORACLES_EXT["stratified_sample_docs"] = STRATIFIED_SAMPLE_SQL
ORACLES_EXT["corpus_top_trigrams"] = CORPUS_TOP_TRIGRAMS_SQL

# Incremental MinHash dedup: full recompute on the union (base ∪ batch ==
# all documents), restricted to pairs touching the batch (doc_id % 5 == 0)
# — the equivalence the incremental probe must reproduce exactly.
INCREMENTAL_MINHASH_SQL = f"""
SELECT id_a, id_b, intersection, jaccard
FROM ({MINHASH_NEAR_DUP_SQL}) m
WHERE id_a % 5 = 0 OR id_b % 5 = 0
"""
ORACLES_EXT["incremental_minhash_dedup"] = INCREMENTAL_MINHASH_SQL

SCALABLE_RANK_SQL = """
SELECT p_partkey, p_retailprice,
    CAST(DENSE_RANK() OVER (ORDER BY p_retailprice) AS BIGINT) AS price_rank
FROM part
"""
ORACLES_EXT["scalable_rank_parts"] = SCALABLE_RANK_SQL

SKIPPING_PRUNED_SCAN_SQL = """
SELECT l_returnflag,
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(l_quantity) AS BIGINT) AS qty_sum,
    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem
WHERE l_orderkey >= 1000 AND l_orderkey <= 3000
GROUP BY l_returnflag
"""
ORACLES_EXT["skipping_pruned_scan"] = SKIPPING_PRUNED_SCAN_SQL

# Metadata-only aggregates: the oracle is the DIRECT full-table aggregate —
# the Spark side must reproduce it from per-file stats alone, so any stale,
# missing, or double-counted stats row hash-fails.
ORACLES_EXT["metadata_only_agg"] = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
    CAST(min(l_orderkey) AS BIGINT) AS min_l_orderkey,
    CAST(max(l_orderkey) AS BIGINT) AS max_l_orderkey,
    min(l_quantity) AS min_l_quantity,
    max(l_quantity) AS max_l_quantity
FROM lineitem
"""

ORACLES_EXT["hybrid_range_count_lineitem"] = """
SELECT CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_orderkey BETWEEN 500 AND 4500
"""

from ..operators.sketch import oracle_sql as _hll_sql  # noqa: E402

# Table profiling: per-column stats + HLL NDV, one UNION ALL branch per
# profiled column, each reusing the canonical register SQL.
def _profile_orders_sql() -> str:
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    branches = []
    for c in cols:
        hll = _hll_sql(
            f"(SELECT 1 AS g, CAST({c} AS VARCHAR) AS v FROM orders)",
            "v", ["g"], p=12, out_col="approx_ndv",
        )
        branches.append(f"""
SELECT '{c}' AS column,
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
    min(CAST({c} AS VARCHAR)) AS min_str,
    max(CAST({c} AS VARCHAR)) AS max_str,
    (SELECT approx_ndv FROM ({hll})) AS approx_ndv
FROM orders""")
    return "\nUNION ALL\n".join(branches)


ORACLES_EXT["profile_orders_table"] = _profile_orders_sql()


# Join-size estimation: identical HLL register math (via sketch.oracle_sql)
# + the integer System-R estimate; the actual join count audits the error.
ORACLES_EXT["join_size_estimate_orders"] = f"""
WITH ndvl AS ({_hll_sql("(SELECT 1 AS g, l_orderkey FROM lineitem)",
                        "l_orderkey", ["g"], p=12, out_col="ndv_left")}),
ndvr AS ({_hll_sql("(SELECT 1 AS g, o_orderkey FROM orders)",
                   "o_orderkey", ["g"], p=12, out_col="ndv_right")}),
nl AS (SELECT CAST(count(*) AS BIGINT) AS n_left FROM lineitem),
nr AS (SELECT CAST(count(*) AS BIGINT) AS n_right FROM orders),
j AS (
    SELECT CAST(count(*) AS BIGINT) AS actual_join_rows
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT n_left, n_right, ndv_left, ndv_right,
    (n_left * n_right) // greatest(ndv_left, ndv_right) AS est_join_rows,
    actual_join_rows
FROM nl, nr, ndvl, ndvr, j
"""

# Feature hashing: identical md5-prefix hash → index = hash mod 256,
# sign = bit 20; weights are integer Σ±1 per (doc, idx).
ORACLES_EXT["feature_hash_docs"] = rf"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM documents
), hashed AS (
    SELECT doc_id,
        ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
    FROM toks WHERE tok != ''
)
SELECT doc_id,
    h % 256 AS feature_idx,
    CAST(sum(CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT)
        AS weight
FROM hashed
GROUP BY doc_id, h % 256
"""

# SCD2: lag-window no-op collapse + lead-window validity intervals.
ORACLES_EXT["scd2_user_value_history"] = """
WITH ded AS (
    SELECT user_id, ts, max(value) AS value
    FROM events GROUP BY user_id, ts
), lagged AS (
    SELECT user_id, ts, value,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts,
        lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value
    FROM ded
), kept AS (
    SELECT user_id, ts, value FROM lagged
    WHERE prev_ts IS NULL OR value IS DISTINCT FROM prev_value
)
SELECT user_id, value, ts AS valid_from,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
    CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL AS BIGINT)
        AS is_current
FROM kept
"""

# SCD2 point-in-time read: the oracle answers via latest-kept-change-at-
# or-before-T (ROW_NUMBER), the operator via interval containment — the
# two constructions must agree row-for-row.
ORACLES_EXT["scd2_as_of_snapshot"] = """
WITH ded AS (
    SELECT user_id, ts, max(value) AS value
    FROM events GROUP BY user_id, ts
), lagged AS (
    SELECT user_id, ts, value,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts,
        lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value
    FROM ded
), kept AS (
    SELECT user_id, ts, value FROM lagged
    WHERE prev_ts IS NULL OR value IS DISTINCT FROM prev_value
)
SELECT user_id, value, ts AS valid_from FROM (
    SELECT user_id, value, ts,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
    FROM kept WHERE ts <= TIMESTAMP '2024-01-15'
) WHERE rn = 1
"""

# Phrase search: token-position replay (w[i], w[i+1], w[i+2] equality over
# every start position) — overlap-correct where substring replace-counting
# is not.
ORACLES_EXT["phrase_search_docs"] = rf"""
WITH t AS (
    SELECT doc_id, string_split({NORM}, ' ') AS w FROM documents
), c AS (
    SELECT doc_id,
        CAST(list_sum(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
            i -> CASE WHEN w[i] = 'slow' AND w[i+1] = 'hash'
                       AND w[i+2] = 'batch'
                 THEN 1 ELSE 0 END)) AS BIGINT) AS n_occurrences
    FROM t
)
SELECT doc_id, n_occurrences FROM c WHERE n_occurrences > 0
"""

# KMV overlap: the oracle rebuilds both 256-row k-minimum-values sketches
# (same md5-prefix hash, ORDER BY + LIMIT) and replays the integer
# estimators — (k−1)·2^60 in HUGEINT ≡ Spark's DECIMAL(38,0) — so the
# sketch ESTIMATES, approximation error included, match bit-for-bit.
_KMV_K = 256
_KMV_M = 1 << 60
ORACLES_EXT["kmv_audience_overlap"] = f"""
WITH lsk AS (
    SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
    FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
    ORDER BY hv LIMIT {_KMV_K}
), rsk AS (
    SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
    FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ORDER BY hv LIMIT {_KMV_K}
), usk AS (
    SELECT hv FROM (SELECT hv FROM lsk UNION SELECT hv FROM rsk)
    ORDER BY hv LIMIT {_KMV_K}
), est AS (
    SELECT CAST(count(*) AS BIGINT) AS k_used,
        max(hv) AS kth_min,
        CAST(sum(CASE WHEN hv IN (SELECT hv FROM lsk)
                       AND hv IN (SELECT hv FROM rsk)
                  THEN 1 ELSE 0 END) AS BIGINT) AS matches
    FROM usk
), est2 AS (
    SELECT k_used, kth_min, matches,
        CASE WHEN k_used < {_KMV_K} THEN k_used
             ELSE CAST(((k_used - 1)::HUGEINT * {_KMV_M}::HUGEINT) // kth_min
                       AS BIGINT) END AS est_union
    FROM est
), est3 AS (
    SELECT *, CASE WHEN k_used < {_KMV_K} THEN matches
                   ELSE (matches * est_union) // k_used END AS est_intersection
    FROM est2
), lk AS (
    SELECT DISTINCT user_id FROM events
    WHERE event_type = 'view' AND user_id IS NOT NULL
), rk AS (
    SELECT DISTINCT user_id FROM events
    WHERE event_type = 'purchase' AND user_id IS NOT NULL
), au AS (
    SELECT CAST(count(*) AS BIGINT) AS actual_union
    FROM (SELECT user_id FROM lk UNION SELECT user_id FROM rk)
), ai AS (
    SELECT CAST(count(*) AS BIGINT) AS actual_intersection
    FROM lk JOIN rk USING (user_id)
)
SELECT k_used, kth_min, matches, est_union, est_intersection,
    actual_union, actual_intersection
FROM est3, au, ai
"""

# Mixture epochs: same base/frac-bound CASE + lateral range replication.
def _mixture_epochs_sql() -> str:
    from ..operators.sampling import rate_bound
    from .workloads_ext import MIX_EPOCHS

    base = " ".join(
        f"WHEN '{src}' THEN {int(e)}" for src, e in MIX_EPOCHS.items()
    )
    frac = " ".join(
        f"WHEN '{src}' THEN '{rate_bound(e - int(e))}'"
        for src, e in MIX_EPOCHS.items()
    )
    zero = "'" + "0" * 8 + "'"
    return f"""
WITH k AS (
    SELECT doc_id, source,
        (CASE source {base} ELSE 1 END)
        + (CASE WHEN substr(md5(doc_id::VARCHAR || '|mix'), 1, 8) <
                 (CASE source {frac} ELSE {zero} END)
            THEN 1 ELSE 0 END) AS rep
    FROM documents
)
SELECT doc_id, source,
    CAST(unnest(generate_series(1, rep)) AS BIGINT) AS copy_ix
FROM k WHERE rep > 0
"""


ORACLES_EXT["mixture_epoch_repeats"] = _mixture_epochs_sql()

ORACLES_EXT["training_shuffle_shards"] = """
WITH o AS (
    SELECT doc_id,
        md5('epoch0|' || CAST(doc_id AS VARCHAR)) AS okey
    FROM documents
), r AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY okey, doc_id) AS rn FROM o
)
SELECT doc_id,
    CAST((rn - 1) % 8 AS BIGINT) AS shard,
    CAST((rn - 1) // 8 AS BIGINT) AS pos
FROM r"""

# Negative sampling: ROW_NUMBER over the md5 permutation == the scalable
# rank's (md5, id) total order; step/target arithmetic is the identical
# nonneg 60-bit md5-prefix hash, so the triple set matches bit-for-bit.
ORACLES_EXT["negative_sample_pairs"] = """
WITH pos AS (
    SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) AS p
    FROM documents
), n AS (SELECT count(*) AS c FROM documents),
anchors AS (
    SELECT doc_id, p, i AS slot FROM pos, range(0, 3) t(i)
), tgt AS (
    SELECT a.doc_id, a.slot,
        ((a.p - 1
          + (('0x' || substr(md5(a.doc_id::VARCHAR || '|neg|' || a.slot::VARCHAR),
               1, 15))::BIGINT % (n.c - 1)) + 1)
         % n.c) + 1 AS tp
    FROM anchors a, n
)
SELECT t.doc_id, CAST(t.slot AS BIGINT) AS slot, q.doc_id AS neg_doc_id
FROM tgt t JOIN pos q ON q.p = t.tp
"""

# Round-3 SQL-surface depth -------------------------------------------------

JSON_EXTRACT_EVENTS_SQL = r"""
WITH probed AS (
    SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        CAST(json_extract_string(props, '$.k') IS NOT NULL AS BIGINT) AS has_k
    FROM events
)
SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(SUM(has_k) AS BIGINT) AS n_with_k,
    CAST(SUM(k) AS BIGINT) AS k_sum,
    CAST(MIN(k) AS BIGINT) AS k_min,
    CAST(MAX(k) AS BIGINT) AS k_max,
    CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM probed GROUP BY event_type
"""

ORACLES_EXT["json_extract_events"] = JSON_EXTRACT_EVENTS_SQL

WINDOW_RANK_SUITE_SQL = r"""
WITH base AS (
    SELECT o_orderkey, o_orderpriority,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
)
SELECT o_orderkey, o_orderpriority, price_cents,
    CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
    PERCENT_RANK() OVER w AS pct_rank,
    CUME_DIST() OVER w AS cum_dist,
    FIRST_VALUE(o_orderkey) OVER w AS top_order_in_priority
FROM base
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY price_cents DESC, o_orderkey ASC)
"""

ORACLES_EXT["window_rank_suite"] = WINDOW_RANK_SUITE_SQL

LISTAGG_TOP_CUSTOMERS_SQL = r"""
WITH ranked AS (
    SELECT c_custkey, c_name, c_nationkey,
        CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
        ROW_NUMBER() OVER (PARTITION BY c_nationkey
                           ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC,
                                    c_custkey ASC) AS rnk
    FROM customer
), top AS (
    SELECT * FROM ranked WHERE rnk <= 5
), grouped AS (
    SELECT c_nationkey,
        CAST(COUNT(*) AS BIGINT) AS n_top,
        string_agg(c_name, '|' ORDER BY rnk) AS top_names,
        CAST(SUM(bal_cents) AS BIGINT) AS top_bal_cents
    FROM top GROUP BY c_nationkey
)
SELECT n.n_name, g.n_top, g.top_names, g.top_bal_cents
FROM grouped g JOIN nation n ON g.c_nationkey = n.n_nationkey
"""

ORACLES_EXT["listagg_top_customers"] = LISTAGG_TOP_CUSTOMERS_SQL

GROUPING_SETS_ORDERS_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
    COALESCE(o_orderpriority, 'ALL') AS priority,
    CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
    CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 1e8, 4) AS value_m
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

ORACLES_EXT["grouping_sets_orders"] = GROUPING_SETS_ORDERS_SQL

# EWMA: integer numerator/denominator built from 14 dense-spine lags with
# power-of-two weights (half-life-1 over a 14-day span), one division at
# the end. Generated from the same span constant as the workload.
_EWMA_SPAN = 14
_EWMA_NUM = " + ".join(
    f"CASE WHEN lag(day_cents, {a}) OVER w IS NOT NULL "
    f"THEN lag(day_cents, {a}) OVER w * {1 << (_EWMA_SPAN - 1 - a)} ELSE 0 END"
    for a in range(_EWMA_SPAN)
)
_EWMA_DEN = " + ".join(
    f"CASE WHEN lag(day_cents, {a}) OVER w IS NOT NULL "
    f"THEN {1 << (_EWMA_SPAN - 1 - a)} ELSE 0 END"
    for a in range(_EWMA_SPAN)
)

EWMA_DAILY_REVENUE_SQL = rf"""
WITH b AS (
    SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events
), spine AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d FROM b
), daily AS (
    SELECT CAST(ts AS DATE) AS d,
        CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
    FROM events GROUP BY 1
), dense AS (
    SELECT s.d, CAST(COALESCE(daily.day_cents, 0) AS BIGINT) AS day_cents
    FROM spine s LEFT JOIN daily ON daily.d = s.d
), terms AS (
    SELECT d, day_cents,
        CAST({_EWMA_NUM} AS BIGINT) AS ewma_num,
        CAST({_EWMA_DEN} AS BIGINT) AS ewma_den
    FROM dense
    WINDOW w AS (ORDER BY d)
)
SELECT CAST(d AS VARCHAR) AS event_date, day_cents, ewma_num, ewma_den,
    CAST(ewma_num AS DOUBLE) / CAST(ewma_den AS DOUBLE) AS ewma_cents
FROM terms
"""

ORACLES_EXT["ewma_daily_revenue"] = EWMA_DAILY_REVENUE_SQL


def _semdedup_sql() -> str:
    """SemDeDup oracle: identical retrained codebook literals (the same
    exact-integer Lloyd loop as the IVF oracle), nprobe=1 assignment for
    every vector, then the greedy lower-id prune on round-4 cosines."""
    cb_q = _trained_ivf_codebook()
    dots = ", ".join(
        f"list_sum(list_transform(range(1, 65), "
        f"i -> xq[i] * ({_int_list(cb_q[c])})[i]))"
        for c in range(_IVF_CELLS)
    )
    return f"""
WITH xq AS (
    SELECT vec_id, {_XQ} AS xq FROM embeddings
), dots AS (
    SELECT vec_id, list_value({dots}) AS d FROM xq
), cc AS (
    SELECT vec_id, CAST(list_position(d, list_max(d)) - 1 AS BIGINT) AS cell
    FROM dots
), e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), hits AS (
    SELECT a.vec_id AS ia, b.vec_id AS ib
    FROM cc a
    JOIN cc b ON a.cell = b.cell AND a.vec_id != b.vec_id
    JOIN e ea ON ea.vec_id = a.vec_id
    JOIN e eb ON eb.vec_id = b.vec_id
    WHERE ROUND(list_cosine_similarity(ea.emb, eb.emb), 4) >= 0.45
), agg AS (
    SELECT ia AS vec_id,
        CAST(COUNT(*) AS BIGINT) AS n_dups,
        CAST(SUM(CASE WHEN ib < ia THEN 1 ELSE 0 END) AS BIGINT) AS n_lower
    FROM hits GROUP BY ia
)
SELECT c.vec_id, c.cell,
    CAST(COALESCE(a.n_lower, 0) = 0 AS BIGINT) AS keep,
    CAST(COALESCE(a.n_dups, 0) AS BIGINT) AS n_dups_in_cell
FROM cc c LEFT JOIN agg a USING (vec_id)
"""


ORACLES_EXT["semdedup_prune_embeddings"] = _semdedup_sql()


# TF-IDF retrieval + RRF hybrid fusion: generated from the same constants
# as the workloads (search.tfidf_oracle_sql / search.oracle_sql).
def _tfidf_sql(k: int) -> str:
    from ..operators.search import tfidf_oracle_sql

    return tfidf_oracle_sql("documents", NORM, BM25_TERMS_O, k=k)


def _bm25_sql_k(k: int) -> str:
    from ..operators.search import oracle_sql as bm25_oracle_sql

    return bm25_oracle_sql("documents", NORM, BM25_TERMS_O, k=k)


from .workloads_ext import BM25_TERMS as BM25_TERMS_O  # noqa: E402

TFIDF_SEARCH_SQL = _tfidf_sql(25)

HYBRID_RRF_SQL = f"""
WITH bm_list AS (
    SELECT * FROM ({_bm25_sql_k(50)})
), ti_list AS (
    SELECT * FROM ({_tfidf_sql(50)})
), bmr AS (
    SELECT doc_id,
        CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
            AS bm25_rank
    FROM bm_list
), tir AS (
    SELECT doc_id,
        CAST(ROW_NUMBER() OVER (ORDER BY tfidf_cosine DESC, doc_id) AS BIGINT)
            AS tfidf_rank
    FROM ti_list
)
SELECT COALESCE(bmr.doc_id, tir.doc_id) AS doc_id,
    CAST(COALESCE(bm25_rank, 0) AS BIGINT) AS bm25_rank,
    CAST(COALESCE(tfidf_rank, 0) AS BIGINT) AS tfidf_rank,
    COALESCE(1.0 / (60.0 + bm25_rank), 0.0)
        + COALESCE(1.0 / (60.0 + tfidf_rank), 0.0) AS rrf_score
FROM bmr FULL OUTER JOIN tir ON bmr.doc_id = tir.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT 15
"""

ORACLES_EXT["tfidf_search_docs"] = TFIDF_SEARCH_SQL
ORACLES_EXT["hybrid_rrf_search"] = HYBRID_RRF_SQL


# Grid 1-NN: the oracle is the BRUTE-FORCE argmin over all stations —
# a grid-pruning bug (missed true NN) hash-fails instead of passing.
GRID_NEAREST_STATION_SQL = r"""
WITH st AS (
    SELECT range AS station_id,
        (range // 10) * 100 + 50 + (((range // 10) * 37) % 21) - 10 AS sx,
        (range % 10) * 100 + 50 + (((range % 10) * 53) % 21) - 10 AS sy
    FROM range(100)
), pts AS (
    SELECT event_id, event_id % 1000 AS px, (event_id * 7919) % 1000 AS py
    FROM events
), pairs AS (
    SELECT p.event_id, s.station_id,
        CAST((p.px - s.sx) * (p.px - s.sx)
             + (p.py - s.sy) * (p.py - s.sy) AS BIGINT) AS dist_sq
    FROM pts p CROSS JOIN st s
)
SELECT event_id, CAST(station_id AS BIGINT) AS station_id, dist_sq
FROM pairs
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id
                           ORDER BY dist_sq, station_id) = 1
"""

ORACLES_EXT["grid_nearest_station"] = GRID_NEAREST_STATION_SQL


def _bpe_cte(k: int) -> str:
    """The shared K-round BPE CTE chain (through ``t{k}``, the post-merge
    state): the same lead/count/argmax/islands/lag pipeline as
    operators/bpe.py, one block per round — all string/integer ops, so
    every round replicates bit-for-bit. Finalized by ``_bpe_sql`` (the
    training audit) and ``BPE_ENCODE_SQL`` (the encoded corpus)."""
    parts = [
        f"""
WITH w0 AS (
    SELECT doc_id AS doc, string_split({NORM}, ' ') AS ws FROM documents
), wrows AS (
    SELECT doc, unnest(range(len(ws))) AS w, ws FROM w0
), words AS (
    SELECT doc, w, ws[w + 1] AS word FROM wrows
), crows AS (
    SELECT doc, w, unnest(range(length(word))) AS pos, word FROM words
), t0 AS (
    SELECT doc, w, pos, word[pos + 1] AS sym FROM crows
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", r{i} AS (
    SELECT doc, w, pos, sym,
        ROW_NUMBER() OVER (PARTITION BY doc, w ORDER BY pos) AS rn,
        LEAD(sym) OVER (PARTITION BY doc, w ORDER BY pos) AS nxt
    FROM t{i - 1}
), p{i} AS (
    SELECT sym AS a, nxt AS b, COUNT(*) AS cnt
    FROM r{i} WHERE nxt IS NOT NULL
    GROUP BY sym, nxt
    ORDER BY cnt DESC, a ASC, b ASC
    LIMIT 1
), m{i} AS (
    SELECT r.*, (r.sym = p.a AND r.nxt = p.b) AS is_cand
    FROM r{i} r CROSS JOIN p{i} p
), g{i} AS (
    SELECT *, CASE WHEN is_cand THEN
        rn - ROW_NUMBER() OVER (PARTITION BY doc, w, is_cand ORDER BY rn)
        END AS isl
    FROM m{i}
), k{i} AS (
    SELECT *, is_cand AND
        ((rn - MIN(rn) OVER (PARTITION BY doc, w, isl)) % 2 = 0) AS do_merge
    FROM g{i}
), d{i} AS (
    SELECT *, LAG(do_merge) OVER (PARTITION BY doc, w ORDER BY rn) AS prev_merge
    FROM k{i}
), t{i} AS (
    SELECT doc, w, pos,
        CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
    FROM d{i}
    WHERE NOT COALESCE(prev_merge, FALSE)
)"""
        )
    return "".join(parts)


def _bpe_sql(k: int) -> str:
    selects = [
        f"""SELECT CAST({i} AS BIGINT) AS step, a || ' ' || b AS merged_pair,
    CAST(cnt AS BIGINT) AS pair_count,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM t{i}) AS symbols_after
FROM p{i}"""
        for i in range(1, k + 1)
    ]
    return _bpe_cte(k) + "\n" + "\nUNION ALL\n".join(selects)


BPE_LEARN_SQL = _bpe_sql(3)
ORACLES_EXT["bpe_learn_merges"] = BPE_LEARN_SQL

# Encode side: learn the same 3 merges, then the FINAL state t3 IS the
# encoded corpus — reassembled per doc in (word, pos) order. The Spark
# query encodes with encode_with_merges(learned merges), so a hash match
# here certifies encode ≡ train-state equivalence on the real corpus.
BPE_ENCODE_SQL = _bpe_cte(3) + """
SELECT doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       string_agg(sym, ' ' ORDER BY w, pos) AS tokens
FROM t3 GROUP BY doc
"""
ORACLES_EXT["bpe_encode_docs"] = BPE_ENCODE_SQL


EVENT_TRANSITION_SQL = r"""
WITH trans AS (
    SELECT user_id,
        LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS from_type,
        event_type AS to_type
    FROM events
), f AS (
    SELECT from_type, to_type FROM trans WHERE from_type IS NOT NULL
), counts AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM f GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
    CAST(n_transitions AS DOUBLE)
        / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
        AS p_transition
FROM counts
"""

ORACLES_EXT["event_transition_matrix"] = EVENT_TRANSITION_SQL


def _pagerank_sql(iters: int = 3, scale: int = 1 << 20,
                  num: int = 85, den: int = 100) -> str:
    """Generated fixed-iteration integer-PageRank oracle (mirrors
    cluster.pagerank_integer on the synthetic 50-host doc graph)."""
    base = (scale * (den - num)) // den
    parts = [f"""
WITH e AS (
    SELECT DISTINCT doc_id % 50 AS src, (doc_id * 7) % 50 AS dst
    FROM documents
    WHERE doc_id % 50 != (doc_id * 7) % 50
), nodes AS (
    SELECT DISTINCT n FROM (
        SELECT src AS n FROM e UNION ALL SELECT dst AS n FROM e
    )
), od AS (
    SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src
), idg AS (
    SELECT dst, CAST(COUNT(*) AS BIGINT) AS indeg FROM e GROUP BY dst
), pr0 AS (
    SELECT n, CAST({scale} AS BIGINT) AS pr FROM nodes
)"""]
    for i in range(1, iters + 1):
        parts.append(f""", c{i} AS (
    SELECT p.n, ({num} * (p.pr // o.outdeg)) // {den} AS c
    FROM pr{i - 1} p JOIN od o ON o.src = p.n
), in{i} AS (
    SELECT e.dst AS n, CAST(SUM(c.c) AS BIGINT) AS inflow
    FROM e JOIN c{i} c ON c.n = e.src GROUP BY e.dst
), pr{i} AS (
    SELECT nodes.n, CAST({base} + COALESCE(i.inflow, 0) AS BIGINT) AS pr
    FROM nodes LEFT JOIN in{i} i USING (n)
)""")
    parts.append(f"""
SELECT p.n AS node, p.pr AS pagerank_q,
    CAST(COALESCE(o.outdeg, 0) AS BIGINT) AS outdeg,
    CAST(COALESCE(i.indeg, 0) AS BIGINT) AS indeg
FROM pr{iters} p
LEFT JOIN od o ON o.src = p.n
LEFT JOIN idg i ON i.dst = p.n
""")
    return "".join(parts)


ORACLES_EXT["pagerank_hosts"] = _pagerank_sql()


RECORD_LINKAGE_SQL = r"""
WITH clean AS (
    SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nat
    FROM customer
), dirty AS (
    SELECT c_custkey + 1000000 AS rec_id,
        substr(c_name, 1, length(c_name) - 1) || 'X' AS name,
        c_nationkey AS nat
    FROM customer WHERE c_custkey % 7 = 0
), recs AS (
    SELECT *, CAST(nat AS VARCHAR) || '|' || substr(name, 1, 12) AS block
    FROM (SELECT * FROM clean UNION ALL SELECT * FROM dirty)
), pairs AS (
    SELECT a.rec_id AS id_a, b.rec_id AS id_b,
        a.name AS name_a, b.name AS name_b
    FROM recs a JOIN recs b ON a.block = b.block AND a.rec_id < b.rec_id
)
SELECT id_a, id_b, name_a, name_b,
    CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev_dist,
    CAST(id_b = id_a + 1000000 AS BIGINT) AS is_planted
FROM pairs
WHERE levenshtein(name_a, name_b) <= 1
"""

ORACLES_EXT["record_linkage_customers"] = RECORD_LINKAGE_SQL


ROBUST_OUTLIERS_SQL = r"""
WITH base AS (
    SELECT o_orderkey, o_orderstatus,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), med AS (
    SELECT o_orderstatus, median(cents) AS med FROM base GROUP BY o_orderstatus
), dev AS (
    SELECT b.*, m.med, abs(b.cents - m.med) AS adev
    FROM base b JOIN med m USING (o_orderstatus)
), mad AS (
    SELECT o_orderstatus, median(adev) AS mad FROM dev GROUP BY o_orderstatus
), flagged AS (
    SELECT d.*, m.mad,
        CAST((8.0 * d.adev) > (28.0 * m.mad) AS BIGINT) AS is_outlier
    FROM dev d JOIN mad m USING (o_orderstatus)
)
SELECT o_orderstatus,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    MAX(med) AS med_cents,
    MAX(mad) AS mad_cents,
    CAST(SUM(is_outlier) AS BIGINT) AS n_outliers
FROM flagged GROUP BY o_orderstatus
"""

ORACLES_EXT["robust_outliers_mad"] = ROBUST_OUTLIERS_SQL

EXACT_CORR_SQL = r"""
WITH s AS (
    SELECT l_returnflag,
        CAST(COUNT(*) AS HUGEINT) AS n,
        CAST(SUM(CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS sx,
        CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS HUGEINT) AS sy,
        CAST(SUM(CAST(l_quantity AS HUGEINT)
                 * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS HUGEINT) AS sxy,
        CAST(SUM(CAST(l_quantity AS HUGEINT)
                 * CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS sxx,
        CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                 * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS HUGEINT) AS syy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
    CAST(n AS BIGINT) AS n_rows,
    ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_qty_price
FROM s
"""

ORACLES_EXT["exact_corr_lineitem"] = EXACT_CORR_SQL

COPURCHASE_SQL = r"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM pairs GROUP BY pa, pb
ORDER BY n_orders DESC, pa ASC, pb ASC
LIMIT 20
"""

ORACLES_EXT["copurchase_pairs_topk"] = COPURCHASE_SQL


# DSIR importance selection: portable md5 feature hash, integer weights.
_DSIR_BUCKETS, _DSIR_SCALE = 256, 1024
_DSIR_LOGSP1 = _DSIR_SCALE.bit_length()

DSIR_SELECT_SQL = rf"""
WITH toks AS (
    SELECT doc_id AS id_,
        CAST(lang = 'en' AS BIGINT) AS is_t,
        ('0x' || substr(md5(unnest(string_split({NORM}, ' '))), 1, 15))::BIGINT
            % {_DSIR_BUCKETS} AS f
    FROM documents
), feat AS (
    SELECT f, CAST(SUM(is_t) AS BIGINT) AS t_f,
        CAST(COUNT(*) AS BIGINT) AS r_f
    FROM toks GROUP BY f
), totals AS (
    SELECT CAST(SUM(t_f) AS BIGINT) AS t_tot,
        CAST(SUM(r_f) AS BIGINT) AS r_tot
    FROM feat
), weights AS (
    SELECT f,
        CAST(length(bin(CAST(((t_f + 1) * r_tot * {_DSIR_SCALE})
                             // ((r_f + 1) * t_tot) AS BIGINT)))
             - {_DSIR_LOGSP1} AS BIGINT) AS w
    FROM feat CROSS JOIN totals
), scored AS (
    SELECT t.id_, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(w.w) AS BIGINT) AS dsir_score
    FROM toks t JOIN weights w USING (f)
    GROUP BY t.id_
)
SELECT id_ AS doc_id, n_tokens, dsir_score,
    CAST(dsir_score >= 0 AS BIGINT) AS keep
FROM scored
"""

ORACLES_EXT["dsir_select_docs"] = DSIR_SELECT_SQL


BUCKETED_JOIN_SQL = r"""
SELECT c.c_mktsegment,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

ORACLES_EXT["bucketed_join_revenue"] = BUCKETED_JOIN_SQL

DQ_EXPECTATIONS_SQL = r"""
SELECT 'orders_pk_unique' AS check_name,
    CAST((SELECT COUNT(*) FROM (
        SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
    )) AS BIGINT) AS n_violations
UNION ALL
SELECT 'orders_custkey_fk',
    CAST((SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'orders_status_accepted',
    CAST((SELECT COUNT(*) FROM orders
          WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
UNION ALL
SELECT 'orders_price_positive',
    CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT)
UNION ALL
SELECT 'orders_date_in_range',
    CAST((SELECT COUNT(*) FROM orders
          WHERE CAST(o_orderdate AS DATE) < DATE '1992-01-01'
             OR CAST(o_orderdate AS DATE) > DATE '1998-12-31') AS BIGINT)
"""

ORACLES_EXT["dq_expectations"] = DQ_EXPECTATIONS_SQL

# Exact-substring duplication rate: n-gram occurrence totals via a window
# over the already-aggregated (doc, gram) rows; dup/total is the single
# float division and the keep flag cross-multiplies to exact integers.
NGRAM_DUP_RATE_SQL = rf"""
WITH grams AS (
    SELECT doc_id,
        unnest(list_transform(range(1, len(w) - 3),
            i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS gram
    FROM (SELECT doc_id, string_split({NORM}, ' ') AS w FROM documents)
), occ AS (
    SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY doc_id, gram
), tot AS (
    SELECT doc_id, cnt,
        SUM(cnt) OVER (PARTITION BY gram) AS total_cnt
    FROM occ
), per_doc AS (
    SELECT doc_id,
        CAST(SUM(cnt) AS BIGINT) AS total_ngrams,
        CAST(SUM(CASE WHEN total_cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
            AS dup_ngrams,
        CAST(SUM(CASE WHEN total_cnt > cnt THEN cnt ELSE 0 END) AS BIGINT)
            AS cross_dup_ngrams
    FROM tot GROUP BY doc_id
)
SELECT doc_id, total_ngrams, dup_ngrams, cross_dup_ngrams,
    dup_ngrams / total_ngrams AS dup_frac,
    CAST(dup_ngrams * 10 <= total_ngrams * 3 AS BIGINT) AS keep
FROM per_doc
"""

ORACLES_EXT["ngram_dup_rate_docs"] = NGRAM_DUP_RATE_SQL

# Unigram LM surprisal: integer-log2 per-token bits (same length(bin())
# trick as TF-IDF idf), exact int64 sums, one division, integer keep band.
UNIGRAM_SURPRISAL_SQL = rf"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM documents
), tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY doc_id, tok
), uni AS (
    SELECT tok, CAST(SUM(tf) AS BIGINT) AS corpus_cnt FROM tf GROUP BY tok
), tot AS (
    SELECT CAST(SUM(corpus_cnt) AS BIGINT) AS n_total FROM uni
), lm AS (
    SELECT tok,
        CAST(length(bin(CAST(t.n_total // u.corpus_cnt AS BIGINT))) AS BIGINT)
            AS surprisal_q
    FROM uni u CROSS JOIN tot t
), per_doc AS (
    SELECT f.doc_id,
        CAST(SUM(f.tf) AS BIGINT) AS n_tokens,
        CAST(SUM(f.tf * l.surprisal_q) AS BIGINT) AS surprisal_sum
    FROM tf f JOIN lm l USING (tok) GROUP BY f.doc_id
)
SELECT doc_id, n_tokens, surprisal_sum,
    surprisal_sum / n_tokens AS bits_per_token,
    CAST(surprisal_sum >= n_tokens * 2
         AND surprisal_sum <= n_tokens * 12 AS BIGINT) AS keep
FROM per_doc
"""

ORACLES_EXT["unigram_surprisal_docs"] = UNIGRAM_SURPRISAL_SQL

# Sweep-line peak concurrency: day-clipped segments -> +1/-1 boundary
# rows -> per-day running sum; the (t, delta, id) sort order encodes the
# half-open [s, e) semantics. Integer/timestamp outputs only.
MAX_CONCURRENT_SQL = r"""
WITH base AS (
    SELECT event_id, ts AS s, ts + INTERVAL 15 MINUTE AS e,
        CAST(ts AS DATE) AS d1,
        CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP) AS m
    FROM events
), segs AS (
    SELECT event_id AS id_, d1 AS day, s, least(e, m) AS e FROM base
    UNION ALL
    SELECT event_id, CAST(m AS DATE), m, e FROM base WHERE e > m
), bounds AS (
    SELECT id_, day, s AS t, 1 AS delta FROM segs
    UNION ALL
    SELECT id_, day, e AS t, -1 AS delta FROM segs
), run AS (
    SELECT id_, day, t, delta,
        CAST(SUM(delta) OVER (
            PARTITION BY day ORDER BY t, delta, id_
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
    FROM bounds
), mx AS (
    SELECT *, MAX(run) OVER (PARTITION BY day) AS day_max FROM run
)
SELECT CAST(day AS VARCHAR) AS day,
    CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_segments,
    CAST(MAX(run) AS BIGINT) AS max_concurrent,
    MIN(CASE WHEN run = day_max THEN t END) AS peak_first_ts
FROM mx GROUP BY day
"""

ORACLES_EXT["max_concurrent_events"] = MAX_CONCURRENT_SQL

# Top-k per group: the oracle is the naive total-order window — the
# map-side prune must be invisible in the result.
TOPK_ORDERS_SQL = r"""
SELECT o_orderpriority, o_orderkey, o_totalprice,
    CAST(rn AS BIGINT) AS rn
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (
            PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
WHERE rn <= 3
"""

ORACLES_EXT["topk_orders_per_priority"] = TOPK_ORDERS_SQL

# Triangle count: identical degree-ordered orientation; every CTE is
# exact-integer so the wedge/triangle counts match bit-for-bit.
TRIANGLE_COUNT_SQL = r"""
WITH pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
), e AS (
    SELECT pa AS a, pb AS b FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2
), deg AS (
    SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v
), oriented AS (
    SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                THEN e.a ELSE e.b END AS u,
           CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                THEN e.b ELSE e.a END AS w
    FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
), wedges AS (
    SELECT e1.u AS x, e1.w AS y, e2.w AS z
    FROM oriented e1 JOIN oriented e2 ON e1.w = e2.u
), closed AS (
    SELECT w2.x FROM wedges w2
    JOIN oriented o ON w2.x = o.u AND w2.z = o.w
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM closed) AS n_triangles
"""

ORACLES_EXT["triangle_count_copurchase"] = TRIANGLE_COUNT_SQL

# HLL merge rollup: daily registers max-merged == direct registers,
# estimate tail identical to sketch.oracle_sql (same float literals).
from ..operators.sketch import _alpha_c as _hll_alpha  # noqa: E402
from ..operators.sketch import _rho_max as _hll_rho_max  # noqa: E402
from ..operators.sketch import oracle_sql as _hll_sql  # noqa: E402

_HLL_P = 12
_HLL_M = 1 << _HLL_P
_HLL_RMAX = _hll_rho_max(_HLL_P)
_HLL_C = repr(_hll_alpha(_HLL_P))
_HLL_LC = repr(2.5 * _HLL_M)

HLL_MERGE_ROLLUP_SQL = f"""
WITH ev AS (
    SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events
),
mh AS (
  SELECT event_type, day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM ev WHERE user_id IS NOT NULL
),
daily_r AS (
  SELECT event_type, day, hv % {_HLL_M} AS bucket,
         MAX(CASE WHEN (hv // {_HLL_M}) > 0
                  THEN CAST(ROUND(LOG2((hv // {_HLL_M}) & (-(hv // {_HLL_M}))), 0) AS BIGINT) + 1
                  ELSE {_HLL_RMAX} END) AS m_j
  FROM mh GROUP BY event_type, day, hv % {_HLL_M}
),
merged_r AS (
  SELECT event_type, bucket, MAX(m_j) AS m_j
  FROM daily_r GROUP BY event_type, bucket
),
merged_g AS (
  SELECT event_type,
         SUM(1::BIGINT << CAST({_HLL_RMAX} - m_j AS INTEGER)) AS s_present,
         COUNT(*) AS nonzero
  FROM merged_r GROUP BY event_type
),
merged_e AS (
  SELECT event_type, {_HLL_M} - nonzero AS zeros,
         CAST(s_present + ({_HLL_M} - nonzero) * (1::BIGINT << {_HLL_RMAX}) AS DOUBLE) AS s_total
  FROM merged_g
),
merged AS (
  SELECT event_type,
       CAST(ROUND(CASE WHEN {_HLL_C} / s_total <= {_HLL_LC} AND zeros > 0
            THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / zeros)
            ELSE {_HLL_C} / s_total END, 0) AS BIGINT) AS merged_users
  FROM merged_e
),
direct AS ({_hll_sql("events", "user_id", ["event_type"], p=12, out_col="direct_users")}),
days AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
  FROM events GROUP BY event_type
)
SELECT m.event_type, m.merged_users, d.direct_users,
    CAST(m.merged_users = d.direct_users AS BIGINT) AS merge_exact,
    days.n_days
FROM merged m JOIN direct d USING (event_type) JOIN days USING (event_type)
"""

ORACLES_EXT["hll_merge_rollup"] = HLL_MERGE_ROLLUP_SQL

# Trimmed mean: exact integer trim ranks, exact cents, one final division.
TRIMMED_MEAN_SQL = r"""
WITH ranked AS (
    SELECT l_returnflag,
        CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY l_returnflag
            ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                     l_orderkey, l_linenumber) AS BIGINT) AS rn,
        CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
    FROM lineitem
), kept AS (
    SELECT *, (n * 5) // 100 AS lo FROM ranked
    WHERE rn > (n * 5) // 100 AND rn <= n - (n * 5) // 100
)
SELECT l_returnflag,
    CAST(MAX(n) AS BIGINT) AS n_rows,
    CAST(COUNT(*) AS BIGINT) AS n_kept,
    CAST(SUM(cents) AS BIGINT) AS kept_cents,
    CAST(SUM(cents) AS BIGINT) / (COUNT(*) * 100) AS trimmed_mean
FROM kept GROUP BY l_returnflag
"""

ORACLES_EXT["trimmed_mean_prices"] = TRIMMED_MEAN_SQL

# CSV parse recovery: the oracle states the EXPECTED per-line outcome —
# a type-corrupted id (every 7th doc) must quarantine, everything else
# must parse with its fields intact. A Spark parse-semantics drift would
# hash-fail here.
CSV_RECOVERY_SQL = r"""
SELECT doc_id,
    CAST(doc_id % 7 != 0 AS BIGINT) AS ok,
    CASE WHEN doc_id % 7 != 0 THEN n_chars END AS n_chars_parsed,
    CASE WHEN doc_id % 7 != 0 THEN lang END AS lang_parsed
FROM documents
"""

ORACLES_EXT["csv_parse_recovery"] = CSV_RECOVERY_SQL


# change data feed: recompute each commit's diff set-theoretically from
# the deterministic version definitions (v1 = %10<5 subset; v2 = merge of
# +1e6-custkey rows for %10 in 3..6; v3 = v2 minus %10=0)
CDF_ORDER_CHANGES_SQL = """
WITH v1 AS (
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 10 < 5
), upd AS (
    SELECT o_orderkey, o_custkey + 1000000 AS o_custkey
    FROM orders WHERE o_orderkey % 10 BETWEEN 3 AND 6
)
SELECT u.o_orderkey, u.o_custkey,
       'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
FROM upd u LEFT JOIN v1 o ON u.o_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT o.o_orderkey, o.o_custkey, 'update_preimage', 2
FROM v1 o JOIN upd u ON o.o_orderkey = u.o_orderkey
UNION ALL
SELECT u.o_orderkey, u.o_custkey, 'update_postimage', 2
FROM v1 o JOIN upd u ON o.o_orderkey = u.o_orderkey
UNION ALL
SELECT o_orderkey, o_custkey, 'delete', 3
FROM v1 WHERE o_orderkey % 10 = 0
"""

ORACLES_EXT["cdf_order_changes"] = CDF_ORDER_CHANGES_SQL


ORACLES_EXT["bloom_point_lookup_events"] = """
SELECT event_id, user_id, event_type
FROM events WHERE event_id IN (1, 7, 42, 987, -1)
"""


ORACLES_EXT["ivm_orders_by_status"] = """
WITH final AS (
    SELECT o_orderstatus,
           CASE WHEN o_orderkey % 10 BETWEEN 3 AND 6
                THEN o_custkey + 1000000 ELSE o_custkey END AS o_custkey
    FROM orders
    WHERE o_orderkey % 10 BETWEEN 1 AND 6
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
FROM final GROUP BY o_orderstatus
"""


ORACLES_EXT["delta_roundtrip_orders"] = """
-- delta_roundtrip_orders: latest snapshot = (%4 IN (0,1)) minus the
-- overwrite's filter (status <> 'P'); v1 snapshot = (%4 IN (0,1))
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 4 IN (0, 1)) AS v1_rows
FROM orders
WHERE o_orderkey % 4 IN (0, 1) AND o_orderstatus <> 'P'
GROUP BY o_orderstatus
"""


ORACLES_EXT["line_dedup_docs"] = """
-- line_dedup_docs: 8-word chunk lines; lines in >=3 distinct docs are
-- boilerplate and removed everywhere; survivors rejoin in order
WITH words AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS w
  FROM documents
), lines AS (
  SELECT doc_id, pos // 8 AS line_no,
         string_agg(w, ' ' ORDER BY pos) AS line
  FROM words GROUP BY doc_id, pos // 8
), flagged AS (
  SELECT line FROM (
    SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line
  ) WHERE df >= 3
), kept AS (
  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM flagged)
), rebuilt AS (
  SELECT doc_id, string_agg(line, '|' ORDER BY line_no) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(t.n_lines - COALESCE(r.n_kept, 0) AS BIGINT) AS lines_removed
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


# CCNet-style perplexity bucketing + per-bucket md5 keeps: surprisal CTEs
# as in UNIGRAM_SURPRISAL_SQL, exact scaled-integer ordering, ROW_NUMBER
# with doc_id tiebreak, integer bucket cut, stratified_sample's hex bounds.
PERPLEXITY_BUCKET_SQL = rf"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM documents
), tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY doc_id, tok
), uni AS (
    SELECT tok, CAST(SUM(tf) AS BIGINT) AS corpus_cnt FROM tf GROUP BY tok
), tot AS (
    SELECT CAST(SUM(corpus_cnt) AS BIGINT) AS n_total FROM uni
), lm AS (
    SELECT tok,
        CAST(length(bin(CAST(t.n_total // u.corpus_cnt AS BIGINT))) AS BIGINT)
            AS surprisal_q
    FROM uni u CROSS JOIN tot t
), per_doc AS (
    SELECT f.doc_id,
        CAST(SUM(f.tf) AS BIGINT) AS n_tokens,
        CAST(SUM(f.tf * l.surprisal_q) AS BIGINT) AS surprisal_sum
    FROM tf f JOIN lm l USING (tok) GROUP BY f.doc_id
), scaled AS (
    SELECT doc_id,
        CAST(surprisal_sum * 1000000 // n_tokens AS BIGINT) AS scaled_bits
    FROM per_doc
), rnk AS (
    SELECT doc_id, scaled_bits,
        CAST(ROW_NUMBER() OVER (ORDER BY scaled_bits, doc_id) AS BIGINT) AS rk,
        COUNT(*) OVER () AS n
    FROM scaled
), bucketed AS (
    SELECT doc_id, scaled_bits, rk,
        CASE (rk - 1) * 3 // n WHEN 0 THEN 'head'
                               WHEN 1 THEN 'middle'
                               ELSE 'tail' END AS ppl_bucket
    FROM rnk
)
SELECT doc_id, ppl_bucket, scaled_bits, rk
FROM bucketed
WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|ccnet'), 1, 8) <
      CASE ppl_bucket WHEN 'head' THEN 'gggggggg'
                      WHEN 'middle' THEN '80000000'
                      ELSE '19999999' END
"""

ORACLES_EXT["perplexity_bucket_sample"] = PERPLEXITY_BUCKET_SQL


# Lee-et-al exact-substring span dedup: k=8 token spans, cross-document
# duplicates removed everywhere except the smallest-id (canonical) doc;
# coverage via a rolling ROWS-frame max; ordered reassembly.
SPAN_DEDUP_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           generate_subscripts(string_split({NORM}, ' '), 1) - 1 AS pos,
           unnest(string_split({NORM}, ' ')) AS tok
    FROM documents
), led AS (
    SELECT doc_id, pos, tok,
           lead(tok, 1) OVER w AS t1, lead(tok, 2) OVER w AS t2,
           lead(tok, 3) OVER w AS t3, lead(tok, 4) OVER w AS t4,
           lead(tok, 5) OVER w AS t5, lead(tok, 6) OVER w AS t6,
           lead(tok, 7) OVER w AS t7
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), grams AS (
    SELECT doc_id, pos,
           concat_ws(' ', tok, t1, t2, t3, t4, t5, t6, t7) AS gram
    FROM led WHERE t7 IS NOT NULL
), fl AS (
    SELECT doc_id, pos,
           CASE WHEN min(doc_id) OVER wg <> max(doc_id) OVER wg
                 AND doc_id <> min(doc_id) OVER wg THEN 1 ELSE 0 END AS flag
    FROM grams WINDOW wg AS (PARTITION BY gram)
), marked AS (
    SELECT t.doc_id, t.pos, t.tok,
           max(COALESCE(f.flag, 0)) OVER (
               PARTITION BY t.doc_id ORDER BY t.pos
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS rm
    FROM toks t
    LEFT JOIN (SELECT doc_id, pos, flag FROM fl WHERE flag = 1) f
      ON t.doc_id = f.doc_id AND t.pos = f.pos
), rebuilt AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
           COUNT(*) AS n_kept
    FROM marked WHERE rm = 0 GROUP BY doc_id
), totals AS (
    SELECT doc_id, COUNT(*) AS n_tokens FROM toks GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS tokens_removed
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""

ORACLES_EXT["span_dedup_docs"] = SPAN_DEDUP_SQL


# Quantized multinomial Naive Bayes lang classifier: fit on doc_id%5<>0,
# score doc_id%5=0. Laplace-smoothed per-(lang,tok) counts quantized via
# the bit-length log2; class prior + unseen-token default; argmin with
# label-ascending tiebreak.
NB_LANG_SQL = rf"""
WITH train AS (
    SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0
), held AS (
    SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 = 0
), ttoks AS (
    SELECT t.doc_id, t.lang, unnest(string_split({NORM}, ' ')) AS tok
    FROM train t
), counts AS (
    SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ttoks GROUP BY lang, tok
), vsz AS (
    SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM counts
), ntr AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM train
), classes AS (
    SELECT c.lang, c.n_docs, COALESCE(s.total_tokens, 0) AS total_tokens,
           CAST(length(bin(CAST(ntr.n // c.n_docs AS BIGINT))) AS BIGINT)
               AS prior_q,
           CAST(length(bin(CAST(COALESCE(s.total_tokens, 0) + vsz.v
                                AS BIGINT))) AS BIGINT) AS default_q
    FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM train GROUP BY lang) c
    LEFT JOIN (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS total_tokens
               FROM counts GROUP BY lang) s ON c.lang = s.lang
    CROSS JOIN vsz CROSS JOIN ntr
), model AS (
    SELECT co.lang, co.tok,
           CAST(length(bin(CAST((cl.total_tokens + vsz.v) // (co.cnt + 1)
                                AS BIGINT))) AS BIGINT) AS q
    FROM counts co JOIN classes cl ON co.lang = cl.lang CROSS JOIN vsz
), htf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT h.doc_id, unnest(string_split({NORM}, ' ')) AS tok
          FROM held h)
    GROUP BY doc_id, tok
), scored AS (
    SELECT f.doc_id, c.lang,
           c.prior_q + SUM(f.tf * COALESCE(m.q, c.default_q)) AS score
    FROM htf f CROSS JOIN classes c
    LEFT JOIN model m ON m.lang = c.lang AND m.tok = f.tok
    GROUP BY f.doc_id, c.lang, c.prior_q
), best AS (
    SELECT doc_id, lang AS pred_lang, score AS best_surprisal,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score ASC, lang ASC) AS rn
    FROM scored
)
SELECT b.doc_id, h.lang, b.pred_lang,
       CAST(b.best_surprisal AS BIGINT) AS best_surprisal,
       CAST(b.pred_lang = h.lang AS BIGINT) AS correct
FROM best b JOIN held h ON b.doc_id = h.doc_id
WHERE b.rn = 1
"""

ORACLES_EXT["nb_lang_classifier"] = NB_LANG_SQL


# GPT-3-style containment decontamination: distinct corpus 5-grams vs the
# broadcast eval gram set; exact-integer keep at overlap/total <= 1/10.
NGRAM_CONTAINMENT_SQL = rf"""
WITH corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
), ev AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
), ctoks AS (
    SELECT doc_id,
           generate_subscripts(string_split({NORM}, ' '), 1) - 1 AS pos,
           unnest(string_split({NORM}, ' ')) AS tok
    FROM corpus
), cled AS (
    SELECT doc_id, tok,
           lead(tok, 1) OVER w AS t1, lead(tok, 2) OVER w AS t2,
           lead(tok, 3) OVER w AS t3, lead(tok, 4) OVER w AS t4
    FROM ctoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), cgrams AS (
    SELECT DISTINCT doc_id, concat_ws(' ', tok, t1, t2, t3, t4) AS gram
    FROM cled WHERE t4 IS NOT NULL
), etoks AS (
    SELECT doc_id,
           generate_subscripts(string_split({NORM}, ' '), 1) - 1 AS pos,
           unnest(string_split({NORM}, ' ')) AS tok
    FROM ev
), eled AS (
    SELECT doc_id, tok,
           lead(tok, 1) OVER w AS t1, lead(tok, 2) OVER w AS t2,
           lead(tok, 3) OVER w AS t3, lead(tok, 4) OVER w AS t4
    FROM etoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), egrams AS (
    SELECT DISTINCT concat_ws(' ', tok, t1, t2, t3, t4) AS gram
    FROM eled WHERE t4 IS NOT NULL
), per AS (
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS total_ngrams,
           CAST(COUNT(e.gram) AS BIGINT) AS overlap_ngrams
    FROM cgrams c LEFT JOIN egrams e ON c.gram = e.gram
    GROUP BY c.doc_id
)
SELECT d.doc_id,
       COALESCE(p.total_ngrams, 0) AS total_ngrams,
       COALESCE(p.overlap_ngrams, 0) AS overlap_ngrams,
       CASE WHEN COALESCE(p.total_ngrams, 0) > 0
            THEN p.overlap_ngrams / p.total_ngrams ELSE 0.0
       END AS containment,
       CAST(COALESCE(p.overlap_ngrams, 0) * 10
            <= COALESCE(p.total_ngrams, 0) * 1 AS BIGINT) AS keep
FROM corpus d LEFT JOIN per p ON d.doc_id = p.doc_id
"""

ORACLES_EXT["ngram_containment_decontam"] = NGRAM_CONTAINMENT_SQL


# Gopher rule suite: per-doc token fold + scalar regexp counters; every
# flag an exact-integer cross-multiplication (query params: required
# floor 1, rest paper defaults). Patterns are RE2/Java-portable: (?m)
# anchors per \n line, [ \t]* never consumes newlines.
GOPHER_RULES_SQL = rf"""
WITH docs AS (
    SELECT doc_id, COALESCE(text, '') AS text FROM documents
), toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM docs
), wagg AS (
    SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(length(tok)) AS BIGINT) AS word_chars,
        CAST(SUM(CASE WHEN regexp_matches(tok, '[a-z]') THEN 1 ELSE 0 END)
             AS BIGINT) AS alpha_words,
        CAST(COUNT(DISTINCT CASE WHEN tok IN
             ('the','be','to','of','and','that','have','with')
             THEN tok END) AS BIGINT) AS required_distinct
    FROM toks GROUP BY doc_id
), sagg AS (
    SELECT doc_id,
        CAST(length(text) - length(replace(text, chr(10), '')) + 1
             AS BIGINT) AS n_lines,
        CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS BIGINT)
            AS symbol_cnt,
        CAST(len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]')) AS BIGINT)
            AS bullet_lines,
        CAST(len(regexp_extract_all(text, '(?m)(?:\.\.\.|…)$')) AS BIGINT)
            AS ellipsis_lines
    FROM docs
), j AS (
    SELECT s.doc_id,
        COALESCE(w.n_words, 0) AS n_words,
        COALESCE(w.word_chars, 0) AS word_chars,
        COALESCE(w.alpha_words, 0) AS alpha_words,
        COALESCE(w.required_distinct, 0) AS required_distinct,
        s.n_lines, s.symbol_cnt, s.bullet_lines, s.ellipsis_lines
    FROM sagg s LEFT JOIN wagg w ON s.doc_id = w.doc_id
)
SELECT doc_id, n_words, n_lines, word_chars, alpha_words,
    required_distinct, symbol_cnt, bullet_lines, ellipsis_lines,
    CASE WHEN n_words > 0 THEN word_chars / n_words ELSE 0.0 END
        AS mean_word_len,
    CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT) AS r_word_count,
    CAST(word_chars >= n_words * 3 AND word_chars <= n_words * 10
         AS BIGINT) AS r_mean_word_len,
    CAST(symbol_cnt * 100 <= n_words * 10 AS BIGINT) AS r_symbol_ratio,
    CAST(bullet_lines * 100 <= n_lines * 90 AS BIGINT) AS r_bullet_lines,
    CAST(ellipsis_lines * 100 <= n_lines * 30 AS BIGINT)
        AS r_ellipsis_lines,
    CAST(alpha_words * 100 >= n_words * 80 AS BIGINT) AS r_alpha_words,
    CAST(required_distinct >= 1 AS BIGINT) AS r_required_words,
    CAST(n_words >= 50 AND n_words <= 100000
         AND word_chars >= n_words * 3 AND word_chars <= n_words * 10
         AND symbol_cnt * 100 <= n_words * 10
         AND bullet_lines * 100 <= n_lines * 90
         AND ellipsis_lines * 100 <= n_lines * 30
         AND alpha_words * 100 >= n_words * 80
         AND required_distinct >= 1 AS BIGINT) AS keep
FROM j
"""

ORACLES_EXT["gopher_rules_docs"] = GOPHER_RULES_SQL


def _dk_html_decode(expr: str) -> str:
    """Nested non-regex replace chain mirroring extract._DECODE —
    &amp; LAST so &amp;lt; decodes to the literal text &lt;."""
    for pat, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "''"),
        ("&#39;", "''"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        expr = f"replace({expr}, '{pat}', '{rep}')"
    return expr


def _dk_squeeze(expr: str) -> str:
    return rf"trim(regexp_replace({expr}, '\s+', ' ', 'g'))"


_HTML_SCRIPT_PAT = r"(?is)<script\b[^>]*>.*?</script\s*>"
_HTML_STYLE_PAT = r"(?is)<style\b[^>]*>.*?</style\s*>"
_HTML_COMMENT_PAT = r"(?s)<!--.*?-->"
_HTML_TITLE_PAT = r"(?is)<title[^>]*>(.*?)</title\s*>"
_HTML_TITLE_BLOCK_PAT = r"(?is)<title[^>]*>.*?</title\s*>"

# HTML extraction: the deterministic markup wrap, then the operator's
# exact stage chain (script -> style -> comment -> title capture -> tag
# strip -> entity decode -> collapse) on the RE2/Java-portable subset.
# Plain string concatenation (not an f-string) keeps the CSS/JS braces
# literal.
HTML_EXTRACT_SQL = (
    """
WITH d AS (
    SELECT doc_id,
        '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        || ' &amp; friends</title><style type="text/css">p { color: #333; }</style></head><body>'
        || CASE WHEN doc_id % 3 = 0
                THEN '<script type="text/javascript">if (a < b && c > d) { track("x"); }</script>'
                ELSE '' END
        || '<!-- comment with <tags> inside --><p>' || COALESCE(text, '')
        || '</p><p>5 &lt; 7 &amp;&amp; 9 &gt; 2&nbsp;&quot;quoted&quot; &#39;q&#39;</p></body></html>'
            AS html
    FROM documents
), s1 AS (
    SELECT doc_id, html,
        regexp_replace(html, '"""
    + _HTML_SCRIPT_PAT
    + """', ' ', 'g') AS no_script FROM d
), s2 AS (
    SELECT *, regexp_replace(no_script, '"""
    + _HTML_STYLE_PAT
    + """', ' ', 'g') AS no_style FROM s1
), s3 AS (
    SELECT *, regexp_replace(no_style, '"""
    + _HTML_COMMENT_PAT
    + """', ' ', 'g') AS no_comment FROM s2
), s3b AS (
    SELECT *, regexp_replace(no_comment, '"""
    + _HTML_TITLE_BLOCK_PAT
    + """', ' ', 'g') AS no_title FROM s3
), s4 AS (
    SELECT *, regexp_replace(no_title, '<[^>]*>', ' ', 'g') AS stripped
    FROM s3b
)
SELECT doc_id,
    """
    + _dk_squeeze(
        _dk_html_decode(
            "regexp_extract(no_comment, '" + _HTML_TITLE_PAT + "', 1)"
        )
    )
    + """ AS title,
    """
    + _dk_squeeze(_dk_html_decode("stripped"))
    + """ AS clean_text,
    CAST(len(regexp_extract_all(html, '"""
    + _HTML_SCRIPT_PAT
    + """'))
       + len(regexp_extract_all(no_script, '"""
    + _HTML_STYLE_PAT
    + """'))
       + len(regexp_extract_all(no_style, '"""
    + _HTML_COMMENT_PAT
    + """')) AS BIGINT) AS n_blocks,
    CAST(len(regexp_extract_all(no_title, '<[^>]*>')) AS BIGINT) AS n_tags,
    CAST(len(regexp_extract_all(stripped,
        '&(?:amp|lt|gt|quot|apos|nbsp|#39);')) AS BIGINT) AS n_entities
FROM s4
"""
)

ORACLES_EXT["html_extract_docs"] = HTML_EXTRACT_SQL


# Bigram add-one LM surprisal: lead-window bigram rows, corpus model from
# the (doc,w1,w2) aggregate, integer log2, exact centibit keep band.
BIGRAM_SURPRISAL_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           generate_subscripts(string_split({NORM}, ' '), 1) - 1 AS pos,
           unnest(string_split({NORM}, ' ')) AS tok
    FROM documents
), bi AS (
    SELECT doc_id, tok AS w1,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks
), bif AS (
    SELECT doc_id, w1, w2 FROM bi WHERE w2 IS NOT NULL
), tf AS (
    SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
    FROM bif GROUP BY doc_id, w1, w2
), c12 AS (
    SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12 FROM tf GROUP BY w1, w2
), ctx AS (
    SELECT w1, CAST(SUM(c12) AS BIGINT) AS ctx FROM c12 GROUP BY w1
), voc AS (
    SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks
), lm AS (
    SELECT c.w1, c.w2,
        CAST(length(bin(CAST((x.ctx + voc.v) // (c.c12 + 1) AS BIGINT)))
             AS BIGINT) AS surprisal_q
    FROM c12 c JOIN ctx x USING (w1) CROSS JOIN voc
), per AS (
    SELECT f.doc_id,
        CAST(SUM(f.tf) AS BIGINT) AS n_bigrams,
        CAST(SUM(f.tf * l.surprisal_q) AS BIGINT) AS surprisal_sum
    FROM tf f JOIN lm l ON f.w1 = l.w1 AND f.w2 = l.w2
    GROUP BY f.doc_id
)
SELECT d.doc_id,
    COALESCE(p.n_bigrams, 0) AS n_bigrams,
    COALESCE(p.surprisal_sum, 0) AS surprisal_sum,
    CASE WHEN COALESCE(p.n_bigrams, 0) > 0
         THEN p.surprisal_sum / p.n_bigrams ELSE 0.0
    END AS bits_per_bigram,
    CAST(COALESCE(p.surprisal_sum, 0) * 100 >= COALESCE(p.n_bigrams, 0) * 100
         AND COALESCE(p.surprisal_sum, 0) * 100
             <= COALESCE(p.n_bigrams, 0) * 531 AS BIGINT) AS keep
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN per p ON d.doc_id = p.doc_id
"""

ORACLES_EXT["bigram_surprisal_docs"] = BIGRAM_SURPRISAL_SQL


# Multi-grain ROLLUP: leaf + per-status + grand total in one grouping
# pass; GROUPING_ID bit order (first col = MSB) matches Spark.
ROLLUP_MULTIGRAIN_SQL = r"""
SELECT
    COALESCE(o_orderstatus, '<all>') AS status,
    COALESCE(o_orderpriority, '<all>') AS priority,
    CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

ORACLES_EXT["rollup_multigrain_orders"] = ROLLUP_MULTIGRAIN_SQL


# Hilbert curve position via a recursive CTE carrying the (x, y, d)
# state MSB->LSB — the same quadrant-digit + reflect/swap arithmetic as
# the Spark aggregate() fold, spelled with CASE instead of xor (DuckDB's
# ^ is exponentiation).
HILBERT_CLUSTER_SQL = r"""
WITH RECURSIVE base AS (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(l_partkey % 1024 AS BIGINT) AS x0,
           CAST(l_suppkey % 1024 AS BIGINT) AS y0
    FROM lineitem
), steps AS (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           x0 AS x, y0 AS y, CAST(0 AS BIGINT) AS d, 9 AS i
    FROM base
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        CAST(CASE WHEN ((y >> i) & 1) = 1 THEN x
             WHEN ((x >> i) & 1) = 1
                 THEN ((CAST(1 AS BIGINT) << i) - 1 - y)
                      & ((CAST(1 AS BIGINT) << i) - 1)
             ELSE y & ((CAST(1 AS BIGINT) << i) - 1) END AS BIGINT),
        CAST(CASE WHEN ((y >> i) & 1) = 1 THEN y
             WHEN ((x >> i) & 1) = 1
                 THEN ((CAST(1 AS BIGINT) << i) - 1 - x)
                      & ((CAST(1 AS BIGINT) << i) - 1)
             ELSE x & ((CAST(1 AS BIGINT) << i) - 1) END AS BIGINT),
        d + (CAST(1 AS BIGINT) << (2 * i))
            * (CASE WHEN ((x >> i) & 1) = 1 AND ((y >> i) & 1) = 1 THEN 2
                    WHEN ((x >> i) & 1) = 1 THEN 3
                    WHEN ((y >> i) & 1) = 1 THEN 1 ELSE 0 END),
        i - 1
    FROM steps WHERE i >= 0
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, d AS hkey
FROM steps WHERE i = -1
ORDER BY hkey, l_orderkey, l_linenumber
LIMIT 100
"""

ORACLES_EXT["hilbert_cluster_lineitem"] = HILBERT_CLUSTER_SQL


# Incremental SCD2 apply must equal the from-scratch full-stream build —
# the oracle IS the full build (same SQL as scd2_user_value_history).
ORACLES_EXT["scd2_incremental_history"] = ORACLES_EXT[
    "scd2_user_value_history"
]


ORACLES_EXT["iceberg_roundtrip_orders"] = """
-- iceberg_roundtrip_orders: latest snapshot = (%4 IN (0,1,2));
-- snapshot-1 time travel = (%4 = 0); tail after snapshot 1 = the two
-- appended slices (%4 IN (1,2))
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 4 = 0) AS v1_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 4 IN (1, 2)) AS tail_rows
FROM orders
WHERE o_orderkey % 4 IN (0, 1, 2)
GROUP BY o_orderstatus
"""


ORACLES_EXT["delta_v2_checkpoint_orders"] = """
-- state reconstructed PURELY from the v2 checkpoint manifest +
-- sidecars (every JSON commit deleted): slices %3 IN (0,1)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_bucket_pruned_scan"] = """
-- bucket-partitioned write + pruned read of the MIN(o_custkey) probe;
-- pruned=1 asserts the file list actually shrank (bucket hash parity)
SELECT CAST((SELECT MIN(o_custkey) FROM orders) AS BIGINT) AS probe_custkey,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(1 AS BIGINT) AS pruned
FROM orders
WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
"""


# Blocked fuzzy join: first-word blocks, id-ordered pairs, levenshtein
# <= 3 (the length prefilter is lossless, so the oracle omits it).
FUZZY_MATCH_SQL = r"""
WITH p AS (
    SELECT p_partkey, p_name,
           string_split(lower(trim(p_name)), ' ')[1] AS block
    FROM part
), pairs AS (
    SELECT a.block, levenshtein(a.p_name, b.p_name) AS d
    FROM p a JOIN p b
      ON a.block = b.block AND a.p_partkey < b.p_partkey
)
SELECT block,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(COUNT(*) FILTER (WHERE d = 0) AS BIGINT) AS n_exact,
       CAST(SUM(d) AS BIGINT) AS sum_dist
FROM pairs
WHERE d <= 3
GROUP BY block
"""

ORACLES_EXT["fuzzy_match_part_names"] = FUZZY_MATCH_SQL


# Mixture budget allocation: B = min_s floor(T_s*W/w_s), tgt_s =
# floor(B*w_s/W), keep <=> h*T_s < tgt_s*2^20 in HUGEINT (Spark:
# DECIMAL(38,0)). Weights 5:4:3:2:1, W = 15, salt "mix1".
MIXTURE_BUDGET_SQL = r"""
WITH docs AS (
    SELECT source, doc_id,
           CAST(len(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'),
                    ' ')) AS BIGINT) AS toks,
           CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 4
                       WHEN 'src2' THEN 3 WHEN 'src5' THEN 2
                       WHEN 'src7' THEN 1 END AS w
    FROM documents
    WHERE source IN ('src0','src1','src2','src5','src7')
), per_src AS (
    SELECT source, ANY_VALUE(w) AS weight,
           CAST(SUM(toks) AS BIGINT) AS avail_tokens,
           CAST(COUNT(*) AS BIGINT) AS avail_docs
    FROM docs GROUP BY source
), b AS (
    SELECT CAST(MIN((avail_tokens * 15) // weight) AS BIGINT) AS budget
    FROM per_src
), rates AS (
    SELECT p.*, b.budget,
           CAST((b.budget * p.weight) // 15 AS BIGINT) AS target_tokens
    FROM per_src p CROSS JOIN b
), kept AS (
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS kept_docs,
           CAST(SUM(d.toks) AS BIGINT) AS kept_tokens
    FROM docs d JOIN rates r ON d.source = r.source
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || '|mix1'), 1, 5))::BIGINT::HUGEINT
          * r.avail_tokens
          < r.target_tokens::HUGEINT * 1048576
    GROUP BY d.source
)
SELECT r.source, r.weight, r.avail_docs, r.avail_tokens, r.budget,
       r.target_tokens,
       COALESCE(k.kept_docs, 0) AS kept_docs,
       COALESCE(k.kept_tokens, 0) AS kept_tokens
FROM rates r LEFT JOIN kept k ON r.source = k.source
"""

ORACLES_EXT["mixture_budget_docs"] = MIXTURE_BUDGET_SQL


# Multiset EXCEPT ALL / INTERSECT ALL folded to (key, appearances).
ORACLES_EXT["setops_customer_years"] = """
WITH y95 AS (
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
), y96 AS (
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
), exc AS (
    SELECT o_custkey FROM y95 EXCEPT ALL SELECT o_custkey FROM y96
), ins AS (
    SELECT o_custkey FROM y95 INTERSECT ALL SELECT o_custkey FROM y96
)
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n, 'except_all' AS op
FROM exc GROUP BY o_custkey
UNION ALL
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n, 'intersect_all' AS op
FROM ins GROUP BY o_custkey
"""

# Correlated EXISTS + two correlated scalar aggregates; the
# above-average test is exact-integer (cents·n > Σcents).
ORACLES_EXT["exists_priority_customers"] = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT'
      AND CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * (
              SELECT COUNT(*) FROM orders o2
              WHERE o2.o_custkey = o.o_custkey
          ) > (
              SELECT SUM(CAST(ROUND(o2.o_totalprice * 100) AS BIGINT))
              FROM orders o2 WHERE o2.o_custkey = o.o_custkey
          )
)
"""

# UNPIVOT of the wide per-status aggregate into tidy rows.
ORACLES_EXT["unpivot_order_metrics"] = """
WITH wide AS (
    SELECT o_orderstatus,
           CAST(COUNT(*) AS DOUBLE) AS n_orders,
           ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS sum_price,
           CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
    FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide
UNION ALL
SELECT o_orderstatus, 'sum_price', sum_price FROM wide
UNION ALL
SELECT o_orderstatus, 'n_customers', n_customers FROM wide
"""


# Time-weighted average: value holds until the next event; weighted sum
# exact int64 (cents x held seconds), one float division at the end.
ORACLES_EXT["twap_user_value"] = """
WITH ev AS (
    SELECT user_id, CAST(epoch_us(ts) // 1000 AS BIGINT) AS ms,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
), ded AS (
    SELECT user_id, ms, MAX(cents) AS cents FROM ev GROUP BY user_id, ms
), held AS (
    SELECT user_id, cents,
           lead(ms) OVER (PARTITION BY user_id ORDER BY ms) - ms AS held
    FROM ded
), agg AS (
    SELECT user_id,
        CAST(SUM(CASE WHEN held IS NOT NULL THEN cents * held END)
             AS BIGINT) AS wcs,
        CAST(SUM(COALESCE(held, 0)) AS BIGINT) AS span_ms,
        CAST(COUNT(*) AS BIGINT) AS n_points,
        MAX(CASE WHEN held IS NULL THEN cents END) AS last_cents
    FROM held GROUP BY user_id
)
SELECT user_id,
    COALESCE(wcs, 0) AS weighted_cents_ms,
    span_ms, n_points,
    CASE WHEN span_ms > 0
         THEN COALESCE(wcs, 0) / span_ms / 100.0
         ELSE last_cents / 100.0 END AS twap
FROM agg
"""


ORACLES_EXT["iceberg_v2_deletes_roundtrip"] = """
-- iceberg_v2_deletes_roundtrip: latest = (%4 IN (0,1)) minus the
-- positional-delete set (%10 = 0); pre-delete snapshot = (%4 IN (0,1));
-- the identity-transform pruned read of partition 'F' must equal the
-- plain filter on the delete-merged state
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 4 IN (0, 1)) AS pre_delete_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 4 IN (0, 1)
           AND o_orderkey % 10 <> 0
           AND o_orderstatus = 'F') AS pruned_f_rows
FROM orders
WHERE o_orderkey % 4 IN (0, 1) AND o_orderkey % 10 <> 0
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_upsert_orders"] = """
-- iceberg_upsert_orders: base = (%4 IN (0,1)); batch = (%8 = 0 OR
-- %4 = 2) with custkey shifted +1e6; merged = update-wins upsert
WITH base AS (
    SELECT o_orderkey, o_orderstatus, o_custkey
    FROM orders WHERE o_orderkey % 4 IN (0, 1)
), batch AS (
    SELECT o_orderkey, o_orderstatus, o_custkey + 1000000 AS o_custkey
    FROM orders WHERE o_orderkey % 8 = 0 OR o_orderkey % 4 = 2
), merged AS (
    SELECT * FROM base
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
    UNION ALL
    SELECT * FROM batch
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS pre_rows
FROM merged
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_delete_where_orders"] = """
-- iceberg_delete_where_orders: survivors = (%3 IN (0,1)) minus the
-- predicate delete (%7 = 0), read back AFTER rewrite_manifests — the
-- rewritten manifests must keep delete scoping (else tombstoned rows
-- resurrect and the hash breaks). manifests_after: 1 data manifest + 1
-- delete manifest. pruned_o_rows: identity-partition summary pruning
-- over the REWRITTEN list must equal the plain filter.
WITH survivors AS (
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 7 <> 0
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(2 AS BIGINT) AS manifests_after,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM survivors
         WHERE o_orderstatus = 'O') AS pruned_o_rows
FROM survivors
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_refs_tag_orders"] = """
-- iceberg_refs_tag_orders: tag = the pre-append slice (%5 = 0), pinned
-- through a later append AND expire_snapshots; main = both slices. A
-- ref resolving wrong, lost by a commit, or collected by expiry breaks
-- the hash.
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 5 = 0) AS tag_rows,
       (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
         WHERE o_orderkey % 5 = 0) AS tag_sum_key
FROM orders
WHERE o_orderkey % 5 IN (0, 1)
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_partitions_metadata_orders"] = """
-- iceberg_partitions_metadata_orders: the partitions metadata table's
-- per-partition record counts must equal a plain GROUP BY over the
-- same two slices — a writer misstating record_count or a partition
-- value round-tripping wrong through the hive layout breaks the hash.
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(COUNT(*) AS BIGINT) AS part_rows
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_wap_publish_orders"] = """
-- iceberg_wap_publish_orders: base slice (%4 = 0) on main, staged
-- slice (%4 = 1) written to the 'audit' branch, then fast-forwarded.
-- pre_rows/pre_sum_key replay the PRE-publish main read (base only —
-- a branch write leaking into main inflates them); the grouped
-- aggregates replay the published union; published = 1 fast-forwarded
-- commit.
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(1 AS BIGINT) AS published,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 4 = 0) AS pre_rows,
       (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
         WHERE o_orderkey % 4 = 0) AS pre_sum_key
FROM orders
WHERE o_orderkey % 4 IN (0, 1)
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_spec_evolution_orders"] = """
-- iceberg_spec_evolution_orders: base slice (%3 = 0) written
-- identity-partitioned on o_orderstatus, spec evolved to
-- bucket[8](o_custkey) metadata-only, second slice (%3 = 1) under the
-- new spec. The grouped aggregates replay the full two-spec read; the
-- pruned_o_* scalars replay the pruned-then-filtered read on the OLD
-- layout (a reader resolving old files through the default spec drops
-- their rows and breaks the hash — the r8 silent-row-loss path); the
-- cust_* scalars replay the bucket-pruned read on the NEW layout at
-- the set's min customer; n_specs pins both specs surviving in the
-- metadata.
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(2 AS BIGINT) AS n_specs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 3 IN (0, 1)
           AND o_orderstatus = 'O') AS pruned_o_rows,
       (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
         WHERE o_orderkey % 3 IN (0, 1)
           AND o_orderstatus = 'O') AS pruned_o_sum_key,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderkey % 3 IN (0, 1)
           AND o_custkey = (SELECT MIN(o_custkey) FROM orders
                             WHERE o_orderkey % 3 IN (0, 1))) AS cust_rows,
       (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
         WHERE o_orderkey % 3 IN (0, 1)
           AND o_custkey = (SELECT MIN(o_custkey) FROM orders
                             WHERE o_orderkey % 3 IN (0, 1))) AS cust_sum_key
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderstatus
"""


# delta_cdf_file_orders replays the SAME set-theoretic change feed as
# cdf_order_changes (merge-commit changes at version 2, the band
# removal at version 3) — the Spark side produces it from the spec's
# _change_data files instead of snapshot diffs
ORACLES_EXT["delta_cdf_file_orders"] = CDF_ORDER_CHANGES_SQL


ORACLES_EXT["iceberg_changelog_orders"] = """
-- iceberg_changelog_orders: seed (%3 = 0); commit 0 = equality-delete
-- upsert (old %6 = 0 rows out at their ORIGINAL custkey, re-valued
-- +1e6 rows + fresh %3 = 1 keys in); commit 1 = positional delete of
-- %9 = 0 over the LIVE state (updated values where %6 = 0). A reader
-- resolving tombstones against the wrong parent state or re-reporting
-- already-dead rows breaks the hash.
WITH seed AS (
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 3 = 0
), upd AS (
    SELECT o_orderkey, o_custkey + 1000000 AS o_custkey
    FROM orders WHERE o_orderkey % 6 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 3 = 1
), live AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 6 = 0 THEN o_custkey + 1000000
                ELSE o_custkey END AS o_custkey
    FROM orders WHERE o_orderkey % 3 IN (0, 1)
), changes AS (
    SELECT 'delete' AS _change_type, 0 AS _change_ordinal,
           o_orderkey, o_custkey
    FROM seed WHERE o_orderkey % 6 = 0
    UNION ALL
    SELECT 'insert', 0, o_orderkey, o_custkey FROM upd
    UNION ALL
    SELECT 'delete', 1, o_orderkey, o_custkey
    FROM live WHERE o_orderkey % 9 = 0
)
SELECT _change_type,
       _change_ordinal,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM changes
GROUP BY _change_type, _change_ordinal
"""


ORACLES_EXT["delta_replace_where_orders"] = """
-- delta_replace_where_orders: the 1-URGENT band is replaced with a
-- recomputed batch (custkey + 1e6); every other band rides through
-- untouched. Leaked non-matching rows or lost survivors hash-fail.
WITH live AS (
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN o_custkey + 1000000 ELSE o_custkey END AS o_custkey,
           o_orderpriority
    FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM live
GROUP BY o_orderpriority
"""


# same set-theoretic replay on the Iceberg realization
ORACLES_EXT["iceberg_replace_where_orders"] = (
    ORACLES_EXT["delta_replace_where_orders"]
)


ORACLES_EXT["dynamic_overwrite_orders"] = """
-- dynamic_overwrite_orders: the batch carries partitions 1-URGENT and
-- 2-HIGH (custkey + 1e6); exactly those replace, the rest survive.
WITH live AS (
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN o_custkey + 1000000 ELSE o_custkey END AS o_custkey,
           o_orderpriority
    FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM live
GROUP BY o_orderpriority
"""


ORACLES_EXT["copy_into_orders"] = """
-- copy_into_orders: two COPY INTO runs over the same landing file must
-- ingest it exactly once (rerun loads 0 files) — a broken ledger
-- doubles every aggregate.
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
       CAST(0 AS BIGINT) AS rerun_files_loaded
FROM orders
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_branch_dml_orders"] = """
-- iceberg_branch_dml_orders: on the audit branch, %7 = 0 keys delete
-- (positional) and %5 = 0 keys re-value (+1e6 custkey, equality-delete
-- upsert that also RESURRECTS deleted %35 = 0 keys at the new value);
-- main holds the full seed until fast_forward publishes.
WITH live AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN o_custkey + 1000000
                ELSE o_custkey END AS o_custkey,
           o_orderstatus
    FROM orders
    WHERE o_orderkey % 7 <> 0 OR o_orderkey % 5 = 0
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
           AS pre_publish_main_rows
FROM live
GROUP BY o_orderstatus
"""


ORACLES_EXT["iceberg_branch_changelog_orders"] = """
-- iceberg_branch_changelog_orders: seed (%4 = 0) is the fork point;
-- the audit BRANCH stages %4 = 1 (ordinal 0) then %4 = 2 (ordinal 1);
-- MAIN independently appends %4 = 3 (its ordinal 0). Each lineage's
-- feed sees ONLY its own commits past the fork — bleed either way
-- breaks the hash.
WITH changes AS (
    SELECT 'audit' AS side, 'insert' AS _change_type,
           0 AS _change_ordinal, o_orderkey, o_custkey
    FROM orders WHERE o_orderkey % 4 = 1
    UNION ALL
    SELECT 'audit', 'insert', 1, o_orderkey, o_custkey
    FROM orders WHERE o_orderkey % 4 = 2
    UNION ALL
    SELECT 'main', 'insert', 0, o_orderkey, o_custkey
    FROM orders WHERE o_orderkey % 4 = 3
)
SELECT side,
       _change_type,
       _change_ordinal,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM changes
GROUP BY side, _change_type, _change_ordinal
"""

ORACLES_EXT["alter_columns_delta_orders"] = """
-- alter_columns_delta_orders: rename o_custkey -> cust_id (values
-- survive), schema-evolving MERGE bumps urgent custkeys +1e6 and adds
-- urgent_flag (NULL backfill elsewhere), ADD COLUMN note reads NULL
WITH t AS (
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN o_custkey + 1000000 ELSE o_custkey END AS cust_id,
           o_orderpriority,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN 1 ELSE NULL END AS urgent_flag,
           NULL AS note
    FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(cust_id) AS BIGINT) AS sum_cust,
       CAST(SUM(COALESCE(urgent_flag, 0)) AS BIGINT) AS sum_flag,
       CAST(COUNT(note) AS BIGINT) AS n_notes
FROM t
GROUP BY o_orderpriority
"""

ORACLES_EXT["alter_columns_iceberg_orders"] = """
-- alter_columns_iceberg_orders: original rows read the re-added
-- cust_id as NULL (fresh field id; dropped values never resurrect);
-- the post-alter append carries real custkeys for the urgent band
WITH t AS (
    SELECT o_orderkey, CAST(NULL AS BIGINT) AS cust_id, o_orderpriority
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderpriority
    FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(COALESCE(cust_id, 0)) AS BIGINT) AS sum_cust
FROM t
GROUP BY o_orderpriority
"""

# Data-skipping reads: the Spark side prunes files through log stats /
# manifest bounds and re-applies the exact predicate; the oracle replays
# the SAME predicate over the FULL table — a wrongly skipped file drops
# rows and hash-fails, so the gate pins the superset guarantee.
ORACLES_EXT["delta_skipping_orders"] = """
SELECT o_orderpriority,
    CAST(COUNT(*) AS BIGINT) AS cnt,
    CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS price_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""

ORACLES_EXT["iceberg_range_scan_orders"] = """
SELECT o_orderstatus,
    CAST(COUNT(*) AS BIGINT) AS cnt,
    CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS price_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1994-07-01 00:00:00'
  AND o_orderdate <= TIMESTAMP '1995-03-31 00:00:00'
  AND o_totalprice > 1000.0
GROUP BY o_orderstatus
"""
