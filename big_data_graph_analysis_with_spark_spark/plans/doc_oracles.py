"""DuckDB oracle SQL for the documents/embeddings operators — generated
in lockstep with operators/dedup.py, similarity.py, textops.py.

Conventions that make these hash-stable cross-engine (see also
tpch_graph.py): integer arithmetic until a single final division;
DECIMAL fixed-point for any multi-term float sum; the shared 56-bit
MD5 hash (functions/hashing.py) for all hashing.
"""

from __future__ import annotations

from ..functions.hashing import hash56_sql, srp_weight_sql
from ..operators.dedup import NUM_BANDS, NUM_HASHES, SIMHASH_BITS
from ..operators.textops import LANG_PROFILES, STOPWORDS


def _shingle_ctes(n: int = 3) -> str:
    # NB: laterally-correlated generate_series is unsupported in DuckDB
    # 1.0 — build the shingle list with list_transform over range()
    # (scalar list form) and unnest it instead.
    return f"""
words AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
shing AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(w) - {n - 1}),
                i -> array_to_string(w[i+1:i+{n}], ' '))) AS shingle
  FROM words WHERE len(w) >= {n}
  UNION ALL
  SELECT doc_id, text AS shingle FROM words WHERE len(w) < {n}
)
"""


def _jaccard_ctes(threshold: float) -> str:
    return f"""
sz AS (SELECT doc_id, COUNT(*) AS sz FROM shing GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shing a JOIN shing b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.doc_a, i.doc_b, CAST(i.n_common AS BIGINT) AS n_common,
         i.n_common / (sa.sz + sb.sz - i.n_common) AS jaccard
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.doc_a
  JOIN sz sb ON sb.doc_id = i.doc_b
  WHERE i.n_common / (sa.sz + sb.sz - i.n_common) >= {threshold}
)
"""


def dedup_exact_sql() -> str:
    return """
    SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.2) -> str:
    return (
        "WITH "
        + _shingle_ctes(n).strip()
        + ", "
        + _jaccard_ctes(threshold).strip()
        + " SELECT doc_a, doc_b, n_common, jaccard FROM jac"
    )


def minhash_lsh_sql(n: int = 3, threshold: float = 0.2) -> str:
    mins = ", ".join(
        f"MIN({hash56_sql('shingle', seed=i)}) AS mh_{i}" for i in range(NUM_HASHES)
    )
    rpb = NUM_HASHES // NUM_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS sig FROM mh".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(NUM_BANDS)
    )
    return (
        "WITH "
        + _shingle_ctes(n).strip()
        + ", "
        + _jaccard_ctes(threshold).strip()
        + f""",
mh AS (SELECT doc_id, {mins} FROM shing GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT j.doc_a, j.doc_b, j.jaccard FROM jac j
WHERE EXISTS (SELECT 1 FROM cand c
              WHERE c.doc_a = j.doc_a AND c.doc_b = j.doc_b)
"""
    )


def dup_groups_sql(pairs_sql: str) -> str:
    """Connected components over the pairs produced by `pairs_sql`
    (any query yielding doc_a/doc_b): min reachable id per document
    via a recursive CTE — mirrors dedup.dup_groups' min-label
    propagation fixpoint exactly (both compute the component min)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
nodes AS (SELECT DISTINCT a AS doc_id FROM und),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT u.a, reach.r FROM und u JOIN reach ON reach.doc_id = u.b
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(MIN(r) AS BIGINT) AS group_id
FROM reach GROUP BY doc_id
"""


def keep_best_sql(pairs_sql: str) -> str:
    """Canonical-copy selection twin of dedup.dedup_keep_best over the
    pairs from `pairs_sql`: groups via the recursive-CTE component min,
    canonical = argmax(n_chars, tie → min doc_id), singletons (docs in
    no pair) canonical by construction."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
nodes AS (SELECT DISTINCT a AS doc_id FROM und),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT u.a, reach.r FROM und u JOIN reach ON reach.doc_id = u.b
),
grp AS (SELECT doc_id, MIN(r) AS group_id FROM reach GROUP BY doc_id),
alldocs AS (
  SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS group_id, d.n_chars
  FROM documents d LEFT JOIN grp g ON d.doc_id = g.doc_id
),
canon AS (
  SELECT group_id, doc_id AS canonical_id
  FROM (SELECT group_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY group_id
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn
        FROM alldocs)
  WHERE rn = 1
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(a.group_id AS BIGINT) AS group_id,
       CAST(c.canonical_id AS BIGINT) AS canonical_id,
       a.doc_id = c.canonical_id AS is_canonical
FROM alldocs a JOIN canon c ON a.group_id = c.group_id
"""


def simhash_sql(max_hamming: int = 8) -> str:
    h = hash56_sql("w")
    sums = ", ".join(
        f"SUM(cnt * ((({h} >> {k}) & 1) * 2 - 1)) AS s{k}"
        for k in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"CASE WHEN s{k} > 0 THEN (1::BIGINT << {k}) ELSE 0 END"
        for k in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, t.w, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents) t(doc_id, w)
  GROUP BY doc_id, t.w
),
sums AS (SELECT doc_id, {sums} FROM tok GROUP BY doc_id),
sigs AS (SELECT doc_id, {sim} AS simhash FROM sums)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


_COMP_CTES = """
comp AS (
  SELECT vec_id, unnest(range(len(embedding))) AS j,
         CAST(CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000000) AS BIGINT) * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9)) AS x
  FROM embeddings
),
norms AS (SELECT vec_id, SUM(x * x) AS nsq FROM comp GROUP BY vec_id)
"""


def embedding_cosine_sql(
    threshold: float = 0.9,
    num_tables: int = 8,
    planes_per_table: int = 6,
) -> str:
    """Mirrors dedup.embedding_cosine_pairs exactly — including the
    SRP-LSH candidate generation (exact integer-weight decimal
    projections, see functions.hashing.srp_weight_int), so the
    approximate operator is still hash-checkable end-to-end."""
    return f"""
WITH {_COMP_CTES.strip()},
{_srp_sig_ctes(num_tables, planes_per_table).strip()},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sigs a JOIN sigs b
    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
),
dots AS (
  SELECT c.vec_a, c.vec_b, SUM(a.x * b.x) AS dot
  FROM cand c
  JOIN comp a ON a.vec_id = c.vec_a
  JOIN comp b ON b.vec_id = c.vec_b AND b.j = a.j
  GROUP BY 1, 2
)
SELECT d.vec_a, d.vec_b,
       ROUND(CAST(d.dot AS DOUBLE)
             / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)), 9) AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.vec_a
JOIN norms nb ON nb.vec_id = d.vec_b
WHERE ROUND(CAST(d.dot AS DOUBLE)
            / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)), 9)
      >= {threshold}
"""


def _srp_sig_ctes(num_tables: int, planes_per_table: int) -> str:
    """planes/proj/sigs CTEs shared by the SRP-LSH oracles — the exact
    integer-weight decimal projections of dedup.srp_signatures_decimal."""
    iw = srp_weight_sql("t", "p", "j")
    return f"""
planes AS (
  SELECT t, p, j, {iw} AS iw
  FROM range({num_tables}) AS rt(t),
       range({planes_per_table}) AS rp(p),
       (SELECT DISTINCT j FROM comp) AS rj(j)
),
proj AS (
  SELECT c.vec_id, pl.t, pl.p, SUM(c.x * pl.iw) AS s
  FROM comp c JOIN planes pl ON pl.j = c.j
  GROUP BY 1, 2, 3
),
sigs AS (
  SELECT vec_id, t,
         SUM(CASE WHEN s > 0 THEN 1::BIGINT << p ELSE 0::BIGINT END) AS sig
  FROM proj GROUP BY vec_id, t
)
"""


def ann_lsh_topk_sql(
    k: int = 5,
    query_max_id: int = 20,
    num_tables: int = 8,
    planes_per_table: int = 6,
) -> str:
    """Mirrors similarity.ann_lsh_topk_exact: SRP-LSH candidate
    buckets (decimal signs) + decimal rerank + row_number top-k."""
    return f"""
WITH {_COMP_CTES.strip()},
{_srp_sig_ctes(num_tables, planes_per_table).strip()},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
  FROM sigs q JOIN sigs n ON q.t = n.t AND q.sig = n.sig
  WHERE q.vec_id < {query_max_id} AND q.vec_id <> n.vec_id
),
dots AS (
  SELECT c.query_id, c.neighbor_id, SUM(a.x * b.x) AS dot
  FROM cand c
  JOIN comp a ON a.vec_id = c.query_id
  JOIN comp b ON b.vec_id = c.neighbor_id AND b.j = a.j
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         ROUND(CAST(d.dot AS DOUBLE)
               / sqrt(CAST(nq.nsq AS DOUBLE) * CAST(nn.nsq AS DOUBLE)), 9) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nn ON nn.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, cosine FROM (
  SELECT s.*, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored s) WHERE rn <= {k}
"""


def cosine_topk_sql(k: int = 5, query_max_id: int = 20) -> str:
    return f"""
WITH {_COMP_CTES.strip()},
dots AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, SUM(q.x * n.x) AS dot
  FROM comp q JOIN comp n ON q.j = n.j AND q.vec_id <> n.vec_id
  WHERE q.vec_id < {query_max_id}
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         ROUND(CAST(d.dot AS DOUBLE)
               / sqrt(CAST(nq.nsq AS DOUBLE) * CAST(nn.nsq AS DOUBLE)), 9) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nn ON nn.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, cosine FROM (
  SELECT s.*, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored s) WHERE rn <= {k}
"""


def knn_graph_sql(k: int = 5, sample_mod: int = 10) -> str:
    """SQL twin of similarity.knn_graph: exact cosine kNN edges over
    the deterministic vec_id % sample_mod slice."""
    return f"""
WITH sub AS (SELECT * FROM embeddings WHERE vec_id % {sample_mod} = 0),
comp AS (
  SELECT vec_id, unnest(range(len(embedding))) AS j,
         CAST(CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000000) AS BIGINT) * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9)) AS x
  FROM sub
),
norms AS (SELECT vec_id, SUM(x * x) AS nsq FROM comp GROUP BY vec_id),
dots AS (
  SELECT q.vec_id AS vec_id, n.vec_id AS neighbor_id, SUM(q.x * n.x) AS dot
  FROM comp q JOIN comp n ON q.j = n.j AND q.vec_id <> n.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.vec_id, d.neighbor_id,
         ROUND(CAST(d.dot AS DOUBLE)
               / sqrt(CAST(nq.nsq AS DOUBLE) * CAST(nn.nsq AS DOUBLE)), 9) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.vec_id
  JOIN norms nn ON nn.vec_id = d.neighbor_id
)
SELECT vec_id, neighbor_id, CAST(rn AS BIGINT) AS rank, cosine FROM (
  SELECT s.*, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored s) WHERE rn <= {k}
"""


def _bucket_sql(seed: int) -> str:
    """SQL twin of sampling._bucket: seeded 56-bit hash of the doc id,
    reduced to the rate denominator."""
    return f"({hash56_sql('doc_id', seed=seed)} % 1000000)"


def hash_sample_sql(rate: float, seed: int) -> str:
    threshold = int(rate * 1_000_000)
    return f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {_bucket_sql(seed)} < {threshold}
"""


def train_eval_split_sql(eval_frac: float, seed: int) -> str:
    threshold = int(eval_frac * 1_000_000)
    return f"""
SELECT doc_id,
       CASE WHEN {_bucket_sql(seed)} < {threshold}
            THEN 'eval' ELSE 'train' END AS split
FROM documents
"""


def stratified_cap_sql(strata_col: str, cap: int, seed: int) -> str:
    return f"""
SELECT doc_id, {strata_col} FROM (
  SELECT doc_id, {strata_col}, ROW_NUMBER() OVER (
    PARTITION BY {strata_col}
    ORDER BY {_bucket_sql(seed)} ASC, doc_id ASC) AS rk
  FROM documents)
WHERE rk <= {cap}
"""


def doc_chunks_sql(max_tokens: int = 64) -> str:
    """Mirrors chunking.doc_chunks: consecutive ≤max_tokens-token
    chunks; DuckDB list slices are 1-based end-inclusive, matching
    Spark's F.slice(start, length) clamping."""
    m = max_tokens
    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id, w, unnest(range((len(w) + {m - 1}) // {m})) AS chunk_id
  FROM words
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(w[chunk_id * {m} + 1 : chunk_id * {m} + {m}]) AS BIGINT)
         AS n_tokens,
       array_to_string(w[chunk_id * {m} + 1 : chunk_id * {m} + {m}], ' ')
         AS chunk_text
FROM c
"""


def pack_documents_sql(
    budget: int = 512, n_buckets: int = 8, seed: int = 7, stride: int = 1_000_000
) -> str:
    """Mirrors chunking.pack_documents: hash-bucketed concat-then-chop
    packing with the shared 56-bit hash order."""
    h = hash56_sql("doc_id", seed=seed)
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {h} AS h,
         CAST({h} % {n_buckets} AS BIGINT) AS bucket
  FROM documents
),
runs AS (
  SELECT doc_id, n_tokens, bucket,
         SUM(n_tokens) OVER (
           PARTITION BY bucket ORDER BY h, doc_id
           ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM base
)
SELECT doc_id, n_tokens,
       CAST(bucket * {stride} + start // {budget} AS BIGINT) AS pack_id,
       CAST(start % {budget} AS BIGINT) AS offset_in_pack
FROM runs
"""


def length_buckets_sql(
    boundaries: tuple[int, ...] = (16, 64, 256),
    batch_size: int = 32,
    seed: int = 7,
    stride: int = 1_000_000,
) -> str:
    """Mirrors chunking.length_buckets: boundary CASE bucketing +
    hash-ordered fixed-size batch numbering per bucket."""
    h = hash56_sql("doc_id", seed=seed)
    case = "CASE " + " ".join(
        f"WHEN n_tokens < {b} THEN {k}" for k, b in enumerate(boundaries)
    ) + f" ELSE {len(boundaries)} END"
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {h} AS h
  FROM documents
),
b AS (
  SELECT doc_id, n_tokens, CAST({case} AS BIGINT) AS bucket, h FROM base
),
r AS (
  SELECT doc_id, n_tokens, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1 AS rn
  FROM b
)
SELECT doc_id, n_tokens, bucket,
       CAST(bucket * {stride} + rn // {batch_size} AS BIGINT) AS batch_id,
       CAST(rn % {batch_size} AS BIGINT) AS pos_in_batch
FROM r
"""


def sessionize_sql(gap_us: int) -> str:
    """Mirrors sessions.sessionize_events over the events table —
    microsecond granularity (DuckDB truncates parquet nanos to µs;
    Spark side divides its nanos-longs by 1000 to agree)."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events
),
flags AS (
  SELECT *, CASE WHEN prev IS NULL OR tus - prev > {gap_us} THEN 1 ELSE 0 END
           AS new_s
  FROM (SELECT *, LAG(tus) OVER (
          PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e)
),
sess AS (
  SELECT *, SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY tus, event_id
    ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flags
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(tus) AS BIGINT) AS start_us,
       CAST(MAX(tus) AS BIGINT) AS end_us,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, session_id
"""


def session_quantiles_sql(gap_us: int = 30 * 60 * 1_000_000) -> str:
    """Mirrors sessions.session_quantiles: rank-selection p50/p90/p99
    of session duration and depth over the sessionized events."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events
),
flags AS (
  SELECT *, CASE WHEN prev IS NULL OR tus - prev > {gap_us} THEN 1 ELSE 0 END
           AS new_s
  FROM (SELECT *, LAG(tus) OVER (
          PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e)
),
sess AS (
  SELECT *, SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY tus, event_id
    ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flags
),
stab AS (
  SELECT user_id, session_id,
         CAST(MAX(tus) - MIN(tus) AS BIGINT) AS duration_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM sess GROUP BY user_id, session_id
),
qs(p_label, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)),
dur AS (
  SELECT q.p_label, CAST(r.cnt AS BIGINT) AS n_sessions,
         r.duration_us AS q_duration_us
  FROM (SELECT *, ROW_NUMBER() OVER (
          ORDER BY duration_us, user_id, session_id) AS rn,
          COUNT(*) OVER () AS cnt FROM stab) r, qs q
  WHERE r.rn - 1 = (r.cnt - 1) * q.num // q.den
),
dep AS (
  SELECT q.p_label, r.n_events AS q_n_events
  FROM (SELECT *, ROW_NUMBER() OVER (
          ORDER BY n_events, user_id, session_id) AS rn,
          COUNT(*) OVER () AS cnt FROM stab) r, qs q
  WHERE r.rn - 1 = (r.cnt - 1) * q.num // q.den
)
SELECT d.p_label, d.n_sessions, d.q_duration_us, p.q_n_events
FROM dur d JOIN dep p ON p.p_label = d.p_label
"""


def _clean_corpus_ctes(
    quality_threshold: float, n: int, jaccard_threshold: float
) -> str:
    """CTE chain (for a WITH RECURSIVE preamble) ending in `survivors`
    — shared by the clean-corpus oracle and the composed
    prepare-corpus oracle."""
    return f"""pairs AS ({minhash_lsh_sql(n, jaccard_threshold)}),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
dnodes AS (SELECT DISTINCT a AS doc_id FROM und),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM dnodes
  UNION
  SELECT u.a, reach.r FROM und u JOIN reach ON reach.doc_id = u.b
),
groups AS (SELECT doc_id, MIN(r) AS group_id FROM reach GROUP BY doc_id),
q AS ({quality_sql()}),
lid AS ({language_id_sql()}),
survivors AS (
  SELECT d.doc_id, d.lang, lid.guessed_lang, q.quality, q.n_tokens
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  JOIN lid ON lid.doc_id = d.doc_id
  LEFT JOIN groups g ON g.doc_id = d.doc_id
  WHERE q.quality >= {quality_threshold}
    AND (g.group_id IS NULL OR g.group_id = d.doc_id)
)"""


def clean_corpus_sql(
    quality_threshold: float = 0.2, n: int = 3, jaccard_threshold: float = 0.2
) -> str:
    """Mirrors corpus.clean_corpus — the composed pipeline oracle:
    quality + language branches joined with near-dup canonical
    resolution (the same recursive-CTE components as dup_groups_sql,
    fed by the MinHash pair query)."""
    return f"""
WITH RECURSIVE {_clean_corpus_ctes(quality_threshold, n, jaccard_threshold)}
SELECT doc_id, lang, guessed_lang, quality, n_tokens FROM survivors
"""


def prepare_corpus_sql(
    quality_threshold: float,
    n: int,
    jaccard_threshold: float,
    weights: dict[str, float],
    default_rate: float,
    mix_seed: int,
    n_shards: int,
    shard_seed: int,
) -> str:
    """Mirrors corpus.prepare_corpus: clean → mixture-reweight →
    shard-shuffle, chained on the survivors CTE."""
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {int(v * 1_000_000)}"
        for k, v in sorted(weights.items())
    )
    default = int(default_rate * 1_000_000)
    h = hash56_sql("doc_id", seed=shard_seed)
    return f"""
WITH RECURSIVE {_clean_corpus_ctes(quality_threshold, n, jaccard_threshold)},
mixed AS (
  SELECT doc_id, lang, quality FROM survivors
  WHERE {_bucket_sql(mix_seed)} < CASE {cases} ELSE {default} END
),
sharded AS (
  SELECT doc_id, lang, quality,
         CAST({h} % {n_shards} AS BIGINT) AS shard, {h} AS hh
  FROM mixed
)
SELECT doc_id, lang, quality, shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY shard ORDER BY hh ASC, doc_id ASC) AS BIGINT) AS pos
FROM sharded
"""


def decontaminate_sql(
    eval_frac: float = 0.1,
    seed: int = 7,
    n: int = 3,
    min_overlap: int = 2,
) -> str:
    """Mirrors curation.decontaminate fed by sampling.train_eval_split:
    shared-distinct-n-gram counts of each train doc against the eval
    side's n-gram set."""
    threshold = int(eval_frac * 1_000_000)
    return f"""
WITH {_shingle_ctes(n).strip()},
split AS (
  SELECT doc_id,
         CASE WHEN {_bucket_sql(seed)} < {threshold}
              THEN 'eval' ELSE 'train' END AS split
  FROM documents),
ev AS (SELECT DISTINCT s.shingle
       FROM shing s JOIN split p ON p.doc_id = s.doc_id
       WHERE p.split = 'eval'),
tr AS (SELECT s.doc_id, s.shingle
       FROM shing s JOIN split p ON p.doc_id = s.doc_id
       WHERE p.split = 'train')
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(e.shingle) AS BIGINT) AS n_shared,
       (COUNT(e.shingle) >= {min_overlap}) AS contaminated
FROM tr t LEFT JOIN ev e ON e.shingle = t.shingle
GROUP BY t.doc_id
"""


def _gram_counts_sql(n: int) -> tuple[str, str]:
    total = f"greatest(0, len(w) - {n - 1})"
    distinct = f"""CASE WHEN len(w) < {n} THEN 0 ELSE
      len(list_distinct(list_transform(range(len(w) - {n - 1}),
          i -> array_to_string(w[i+1:i+{n}], ' ')))) END"""
    return total, distinct


def repetition_stats_sql() -> str:
    g2t, g2d = _gram_counts_sql(2)
    g3t, g3d = _gram_counts_sql(3)

    def frac(total: str, distinct: str) -> str:
        return (
            f"CASE WHEN ({total}) = 0 THEN 0.0 "
            f"ELSE (({total}) - ({distinct})) / ({total}) END"
        )

    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       {frac('len(w)', 'len(list_distinct(w))')} AS dup_word_frac,
       CAST({g2t} AS BIGINT) AS n_2grams,
       {frac(g2t, g2d)} AS dup_2gram_frac,
       CAST({g3t} AS BIGINT) AS n_3grams,
       {frac(g3t, g3d)} AS dup_3gram_frac
FROM words
"""


def pii_redaction_sql() -> str:
    """Mirrors the pii_redaction query: deterministic PII planting
    (the fixture corpus contains none) followed by
    curation.redact_pii's two redaction passes."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?\d[\d -]{7,}\d"
    return f"""
WITH planted AS (
  SELECT doc_id,
         text
         || repeat(' u' || CAST(doc_id AS VARCHAR) || '@ex.com',
                   CAST(doc_id % 3 AS INT))
         || repeat(' +1 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0'),
                   CAST(doc_id % 2 AS INT)) AS text
  FROM documents),
e AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{email}')) AS n_emails,
         regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
  FROM planted)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{phone}')) AS BIGINT) AS n_phones,
       regexp_replace(t1, '{phone}', '<PHONE>', 'g') AS clean_text
FROM e
"""


def token_stats_sql() -> str:
    return """
WITH words AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT)
         AS n_tokens_regex,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       (length(text) - len(w) + 1) / len(w) AS avg_token_len,
       len(list_distinct(w)) / len(w) AS type_token_ratio
FROM words
"""


def quality_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id,
         len(w) AS n,
         len(list_filter(w, x -> x IN ({stop_list}))) AS n_stop_occ,
         len(list_distinct(list_filter(w, x -> x IN ({stop_list})))) AS n_stop_d,
         len(list_distinct(w)) AS n_d
  FROM words)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       ROUND(n_stop_occ / n, 6) AS stopword_ratio,
       CASE WHEN n >= 20 AND n <= 1000
            THEN ROUND(LEAST(1.0, (n_stop_occ / n) * 4) * 0.4 + (n_d / n) * 0.6, 6)
            ELSE 0.0 END AS quality,
       CAST(n_stop_d AS BIGINT) AS n_distinct_stopwords
FROM m
"""


def language_id_sql() -> str:
    langs = sorted(LANG_PROFILES)
    ovs = ", ".join(
        "len(list_filter(w, x -> x IN ({toks}))) AS ov_{lang}".format(
            toks=", ".join(f"'{t}'" for t in LANG_PROFILES[lang]), lang=lang
        )
        for lang in langs
    )
    # fold with strict > : earlier (alphabetical) languages win ties
    fold = "CASE "
    order_desc = []
    for lang in langs:
        cond = " AND ".join(
            f"ov_{lang} >= ov_{o}" for o in langs if o != lang
        )
        strict_before = " AND ".join(
            f"ov_{lang} > ov_{o}" for o in langs if o < lang
        )
        full = cond if not strict_before else f"({cond}) AND ({strict_before})"
        order_desc.append(f"WHEN {full} THEN '{lang}'")
    fold += " ".join(order_desc) + " END"
    greatest = "GREATEST(" + ", ".join(f"ov_{L}" for L in langs) + ")"
    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ov AS (SELECT doc_id, {ovs} FROM words)
SELECT doc_id, {fold} AS guessed_lang,
       CAST({greatest} AS BIGINT) AS best_overlap
FROM ov
"""


def fingerprint_sql(n: int = 5, keep: int = 4) -> str:
    h = hash56_sql("g")
    return f"""
WITH words AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, unnest(list_transform(range(len(w) - {n - 1}),
                 i -> array_to_string(w[i+1:i+{n}], ' '))) AS g
  FROM words WHERE len(w) >= {n}
  UNION ALL
  SELECT doc_id, text AS g FROM words WHERE len(w) < {n}
),
hashed AS (SELECT DISTINCT doc_id, {h} AS h FROM grams),
ranked AS (
  SELECT doc_id, h, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY h ASC) AS rn
  FROM hashed)
SELECT doc_id, h FROM ranked WHERE rn <= {keep}
"""


def tfidf_sql(k: int = 5) -> str:
    # score = tf·(N+1)/(df+1): BIGINT·BIGINT product, ONE double
    # division — IEEE-exact in both engines (no transcendentals)
    return f"""
WITH tf AS (
  SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY doc_id, w
),
wd AS (
  SELECT doc_id, term, tf,
         CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
  FROM tf
),
scored AS (
  SELECT *,
         (tf * ((SELECT COUNT(*) FROM documents) + 1)) / (df + 1) AS score
  FROM wd
)
SELECT doc_id, term, tf, df, CAST(score AS DOUBLE) AS score,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= {k}
"""


def mixture_sample_sql(
    weights: dict[str, float],
    strata_col: str,
    default_rate: float,
    seed: int,
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {int(v * 1_000_000)}"
        for k, v in sorted(weights.items())
    )
    default = int(default_rate * 1_000_000)
    return f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {_bucket_sql(seed)} < CASE {cases} ELSE {default} END
"""


def shard_assignments_sql(n_shards: int, seed: int) -> str:
    h = hash56_sql("doc_id", seed=seed)
    return f"""
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS BIGINT) AS pos
FROM (SELECT doc_id, CAST({h} % {n_shards} AS BIGINT) AS shard,
             {h} AS h
      FROM documents)
"""


def prefix_containment_sql(block_chars: int = 32) -> str:
    """Twin of dedup.prefix_containment_pairs: same blocking key, same
    substring verification, same (length, id) pair orientation."""
    return f"""
WITH sides AS (
  SELECT doc_id, text, LENGTH(text) AS chars,
         SUBSTR(text, 1, {block_chars}) AS blk
  FROM documents WHERE LENGTH(text) >= {block_chars}
)
SELECT a.doc_id AS dup_id, b.doc_id AS container_id
FROM sides a JOIN sides b ON a.blk = b.blk
WHERE (a.chars < b.chars OR (a.chars = b.chars AND a.doc_id < b.doc_id))
  AND SUBSTR(b.text, 1, a.chars) = a.text
"""


def length_matched_resample_sql(
    bucket_width: int = 128, n_buckets: int = 8, seed: int = 13
) -> str:
    """Twin of sampling.length_matched_resample: exact integer
    acceptance rates from the bucket histogram, shared hash gate."""
    return f"""
WITH bucketed AS (
  SELECT doc_id, n_chars,
         LEAST(CAST(n_chars AS BIGINT) // {bucket_width},
               {n_buckets - 1}) AS bucket
  FROM documents
),
hist AS (SELECT bucket, COUNT(*) AS cnt FROM bucketed GROUP BY bucket),
mn AS (SELECT MIN(cnt) AS m FROM hist),
rates AS (SELECT bucket, (m * 1000000) // cnt AS rate FROM hist, mn)
SELECT b.doc_id, CAST(b.bucket AS BIGINT) AS bucket, b.n_chars
FROM bucketed b JOIN rates r ON r.bucket = b.bucket
WHERE {_bucket_sql(seed)} < r.rate
"""


def rp_project_sql(out_dims: int = 8) -> str:
    """Twin of similarity.rp_project: same MD5-bit ±1 sign matrix, same
    decimal-exact sums, same final round(·, 6)."""
    sign_hash = hash56_sql(
        "'rp:' || CAST(k AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
    )
    return f"""
WITH comp AS (
  SELECT vec_id, unnest(range(len(embedding))) AS j,
         CAST(CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000000) AS BIGINT) * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9)) AS x
  FROM embeddings
),
signs AS (
  SELECT k, j,
         CASE WHEN ({sign_hash} % 2) = 0 THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range({out_dims})) AS k),
       (SELECT DISTINCT j FROM comp)
)
SELECT c.vec_id, CAST(s.k AS BIGINT) AS k,
       ROUND(CAST(SUM(c.x * s.s) AS DOUBLE), 6) AS y
FROM comp c JOIN signs s ON s.j = c.j
GROUP BY c.vec_id, s.k
"""


def source_overlap_sql() -> str:
    """Twin of q_source_overlap: curation.source_overlap_matrix over
    the corpus plus its deterministic 'mirror' source (doc_id % 10 == 0
    relabeled) — the seeded cross-source duplicates that make the
    matrix non-vacuous on the synthetic corpus."""
    return """
WITH docs2 AS (
  SELECT text, source FROM documents
  UNION ALL
  SELECT text, 'mirror' AS source FROM documents WHERE doc_id % 10 = 0
),
ds AS (SELECT DISTINCT md5(text) AS h, source FROM docs2)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_texts
FROM ds a JOIN ds b ON a.h = b.h
WHERE a.source < b.source
GROUP BY a.source, b.source
"""


def grid_clusters_sql(bits: int = 6) -> str:
    """Twin of similarity.embedding_grid_clusters, composed over the
    rp_project oracle."""
    rp = rp_project_sql(out_dims=bits).strip()
    return f"""
WITH rp AS ({rp}),
assigned AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN y > 0 THEN (CAST(1 AS BIGINT) << k)
                       ELSE 0 END) AS BIGINT) AS cluster_id
  FROM rp GROUP BY vec_id
)
SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       MIN(vec_id) AS min_vec_id
FROM assigned GROUP BY cluster_id
"""


def quality_percentile_sql(num: int = 1, den: int = 2) -> str:
    """Twin of curation.quality_percentile_filter: same quality
    expression (quality_sql), same integer rank rule over the value
    histogram."""
    q = quality_sql().strip()
    return f"""
WITH qall AS ({q}),
qs AS (SELECT doc_id,
              CAST(ROUND(quality * 1000000) AS BIGINT) AS quality_ppm
       FROM qall),
hist AS (SELECT quality_ppm, COUNT(*) AS cnt FROM qs GROUP BY quality_ppm),
cum AS (
  SELECT quality_ppm,
         SUM(cnt) OVER (ORDER BY quality_ppm
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS total
  FROM hist
),
thr AS (SELECT MIN(quality_ppm) AS thr FROM cum
        WHERE cum > (total - 1) * {num} // {den})
SELECT q.doc_id, q.quality_ppm FROM qs q, thr t
WHERE q.quality_ppm >= t.thr
"""


def ngram_novelty_sql(n: int = 3) -> str:
    """Twin of corpusstats.ngram_novelty over the shared shingle CTE."""
    return f"""
WITH {_shingle_ctes(n).strip()},
dfs AS (SELECT shingle, COUNT(DISTINCT doc_id) AS df FROM shing GROUP BY shingle)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique_corpus,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS novelty_ppm
FROM shing s JOIN dfs d ON d.shingle = s.shingle
GROUP BY s.doc_id
"""


def bpe_merges_sql(rounds: int = 4, sep: str = "_") -> str:
    """Twin of textops.bpe_merges — the greedy merge loop as chained
    CTEs (count → argmax with (c DESC, pair ASC) tiebreak → padded
    literal replace), one trio per round."""
    ctes = ["t0 AS (SELECT ' ' || text || ' ' AS t FROM documents)"]
    finals = []
    for k in range(1, rounds + 1):
        p = k - 1
        ctes.append(f"""
tok{k} AS (SELECT string_split(trim(t), ' ') AS w FROM t{p}),
bg{k} AS (
  SELECT w[i+1] || ' ' || w[i+2] AS pair, COUNT(*) AS c
  FROM (SELECT w, unnest(range(len(w) - 1)) AS i
        FROM tok{k} WHERE len(w) >= 2)
  GROUP BY pair
),
best{k} AS MATERIALIZED (
  SELECT pair, replace(pair, ' ', '{sep}') AS merged, c
  FROM bg{k} ORDER BY c DESC, pair ASC LIMIT 1
),
t{k} AS MATERIALIZED (
  SELECT replace(t, ' ' || (SELECT pair FROM best{k}) || ' ',
                 ' ' || (SELECT merged FROM best{k}) || ' ') AS t
  FROM t{p}
)""")
        finals.append(
            f"SELECT CAST({k} AS BIGINT) AS round, pair, merged,"
            f" CAST(c AS BIGINT) AS n_occ FROM best{k}"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(finals)


def knn_label_prop_sql(
    k: int = 5, rounds: int = 2, known_mod: int = 3, sample_mod: int = 1
) -> str:
    """Twin of similarity.knn_label_propagation: the kNN edge CTE plus
    round-unrolled vote/argmax/merge CTEs. `sample_mod` slices the
    vector set (the audit-scale bound, as in knn_graph_sql)."""
    knn = knn_graph_sql(k=k, sample_mod=sample_mod).strip()
    ctes = [
        f"""edges AS MATERIALIZED (
  SELECT vec_id, neighbor_id FROM ({knn})
),
lab0 AS MATERIALIZED (
  SELECT vec_id, CAST(label AS BIGINT) AS label
  FROM embeddings
  WHERE vec_id % {sample_mod} = 0 AND vec_id % {known_mod} = 0
)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(f""",
votes{r} AS (
  SELECT e.vec_id, l.label, COUNT(*) AS c
  FROM edges e JOIN lab{p} l ON l.vec_id = e.neighbor_id
  GROUP BY e.vec_id, l.label
),
pred{r} AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY c DESC, label ASC) AS rn
    FROM votes{r}) WHERE rn = 1
),
lab{r} AS MATERIALIZED (
  SELECT * FROM lab0
  UNION ALL
  SELECT p.vec_id, p.label FROM pred{r} p
  WHERE p.vec_id NOT IN (SELECT vec_id FROM lab0)
)""")
    return (
        "WITH " + "".join(ctes)
        + f"\nSELECT vec_id, label, vec_id % {known_mod} = 0 AS is_seed"
        + f" FROM lab{rounds}"
    )


def dup_group_sizes_sql(pairs_sql: str) -> str:
    """Histogram twin of dedup.dup_group_size_histogram over the pairs
    from `pairs_sql`: the dup_groups_sql component resolution, rolled
    up to (group_size, n_groups)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
nodes AS (SELECT DISTINCT a AS doc_id FROM und),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT u.a, reach.r FROM und u JOIN reach ON reach.doc_id = u.b
),
labels AS (SELECT doc_id, MIN(r) AS group_id FROM reach GROUP BY doc_id),
sizes AS (SELECT group_id, COUNT(*) AS n FROM labels GROUP BY group_id)
SELECT CAST(n AS BIGINT) AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
FROM sizes GROUP BY n
"""
