"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (per BASELINE.json north star): exact
dedup, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-dup — each expressed as pure DataFrame algebra (no Python UDFs in
any hot path) with a DuckDB-reproducible formulation so every operator
is oracle-checkable.

Scale design notes
------------------
* **Exact**: one hash-groupBy. At 100 TB, group on `md5(text)` (8-byte
  shuffle key after projection) rather than the text itself.
* **n-gram Jaccard**: candidate pairs come from an inverted shingle
  index (explode → self-join on shingle). Σ df² of shingle frequencies
  bounds the join; the optional `max_shingle_df` cap drops
  high-frequency stop-shingles from candidate generation to keep the
  quadratic term bounded at scale (off by default — see the
  `ngram_jaccard_pairs` docstring for the semantic caveat).
* **MinHash+LSH**: H=16 hash functions, 4 bands × 4 rows. Banding makes
  candidate generation a groupBy on band signatures — *linear* in corpus
  size; only in-bucket pairs are verified with true Jaccard. This is the
  100 TB dedup path (exact pairwise is quadratic and dead on arrival).
* **SimHash**: 56 hyperplane bits from token hashes, aggregated as 56
  independent signed sums (no explode — one groupBy with 56 columns),
  then Hamming-distance pairs. Banding over bit-chunks gives the scale
  path for candidate generation.
* **Embedding cosine**: sign-random-projection LSH candidates (same
  hyperplane family as similarity.py) verified with dot products over
  DECIMAL(18,9)-cast components — exact, associative,
  order-independent (float sums are not reproducible across
  partitionings, let alone engines). Candidate generation AND verify
  are both linear-ish; the all-pairs dimension join is gone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import bit_of, hash56, srp_weight_int

# MinHash / LSH parameters (bands × rows_per_band = num_hashes)
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
#: SimHash bit width (= usable bits of hash56)
SIMHASH_BITS = 56


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups: (doc_id=min of group, n_copies).

    Groups on md5(text) so the shuffle key is 32 bytes regardless of
    document size; column pruning drops `text` before the exchange.
    """
    return (
        docs.select(F.col("doc_id"), F.md5("text").alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("doc_id", "n_copies")
    )


def incremental_dedup(new_docs: DataFrame, seen_hashes: DataFrame) -> DataFrame:
    """(doc_id, h): documents from `new_docs` that survive incremental
    exact dedup against an existing corpus — the re-crawl/append
    ingestion step: a new document is kept iff its md5(text) is absent
    from `seen_hashes` (one `h STRING` column — the persisted hash
    index of everything already ingested) AND it is the first copy
    (min doc_id) within its own batch.

    Scale shape: the anti join keys on the 32-byte hash (never the
    text), and at 100 TB the hash index is exactly the kind of table
    to store bucketed on `h` so repeated ingests co-locate; the batch-
    internal dedup is the same min-groupBy as `exact_dedup`. Appending
    the survivors' hashes back to the index is the caller's write —
    this operator stays a pure read so it composes into one plan.
    """
    keyed = new_docs.select("doc_id", F.md5("text").alias("h"))
    firsts = keyed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    return firsts.join(seen_hashes.select("h"), on="h", how="left_anti").select(
        "doc_id", "h"
    )


def word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams per document.

    Documents shorter than n words contribute their whole text as a
    single shingle (same convention as textops.doc_fingerprints) — an
    empty shingle set would make short duplicates invisible to every
    shingle-based dedup operator.

    Built-in higher-order functions only — the transform runs in
    whole-stage codegen, no Python boundary.
    """
    words = F.split(F.col("text"), " ")
    shingles = F.when(F.size(words) < n, F.array(F.col("text"))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            )
        )
    )
    return docs.select("doc_id", F.explode(shingles).alias("shingle"))


def _pair_jaccard(shingles: DataFrame, threshold: float) -> DataFrame:
    """All-pairs Jaccard over an inverted shingle index."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa")), on="doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb")), on="doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sa") + F.col("sb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.col("n_common").cast("long"), "jaccard")
    )


def _verify_jaccard(
    cands: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over FULL shingle sets, computed ONLY for
    (doc_a, doc_b) candidate pairs — O(|cands|·shingles/doc), never the
    global Σ df² inverted-index join. Shared by every dedup variant
    whose candidate generation is bounded (MinHash bands, capped
    inverted index). Returns (doc_a, doc_b, n_common, jaccard)."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sh_a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(sh_a, on="doc_a")
        .join(sh_b, on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa")),
            on="doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb")),
            on="doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sa") + F.col("sb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.col("n_common").cast("long"), "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard ≥ threshold.

    Candidate generation via the inverted index: only pairs sharing at
    least one shingle are ever scored. The division is the single
    floating-point op (ints otherwise) → deterministic across engines.

    `max_shingle_df` caps the inverted-index join at scale: shingles
    appearing in more than that many documents are dropped from
    *candidate generation only* (a df-k stop-shingle contributes O(k²)
    join rows); Jaccard is then verified over the FULL shingle sets of
    the surviving candidates. Scores are therefore exact, and the
    capped result is a strict subset of the uncapped one (capping can
    only drop pairs whose every shared shingle is a stop-shingle) —
    the property tests/test_dataops.py asserts. Off by default and off
    in the oracle-checked query; at 100 TB it is mandatory.
    """
    # the shingle relation feeds every downstream consumer (df cap,
    # both inverted-index sides, size table, both verify sides) — up to
    # SIX lazy re-executions of the scan+explode subtree per plan in a
    # bare session. Same persist discipline as minhash_lsh_pairs: pin
    # it, run the (bounded-output) dedup eagerly, drop the cache before
    # returning so it never outlives the call.
    shingles = word_shingles(docs, n).persist()
    if max_shingle_df is None:
        result = _pair_jaccard(shingles, threshold).localCheckpoint()
        shingles.unpersist()
        return result
    rare = (
        shingles.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_shingle_df)
        .select("shingle")
    )
    capped = shingles.join(rare, on="shingle", how="left_semi")
    a = capped.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = capped.select(F.col("doc_id").alias("doc_b"), "shingle")
    cands = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    result = _verify_jaccard(cands, shingles, threshold).localCheckpoint()
    shingles.unpersist()
    return result


def minhash_signatures(shingles: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, mh_0..mh_{H-1}): MinHash signature per document —
    min over shingles of H seeded 56-bit hashes, one groupBy."""
    hashed = shingles.select(
        "doc_id",
        *[hash56("shingle", seed=i).alias(f"h{i}") for i in range(num_hashes)],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"mh_{i}") for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with true Jaccard.

    Pipeline: shingle → signature → band signatures → groupBy band
    bucket (linear) → in-bucket candidate pairs → exact Jaccard verify.
    Returns (doc_a, doc_b, jaccard).
    """
    # the shingle relation feeds both the signature pass and the
    # verification join — persist it so the explode runs once; the
    # result (near-dup pairs, ≪ corpus) is materialized before return
    # so the cache never outlives this call
    shingles = word_shingles(docs, n).persist()
    sigs = minhash_signatures(shingles, num_hashes)
    rpb = num_hashes // num_bands

    # NOTE (r12, measured): this union-of-band-selects looks like it
    # re-runs the minhash aggregation once per band per join side, but
    # AQE's runtime stage reuse dedups the identical signature
    # exchange, so the duplication is plan-cosmetic. Rewriting it as a
    # single aggregation + band-array explode (with or without an
    # eager signature checkpoint) measured 1.5-1.6× SLOWER end-to-end
    # (min-of-5, paired processes: 4.6s → 7.3s) — the explode variant
    # adds a materialization barrier the reused stages never pay. Do
    # not re-try.
    bands = None
    for b in range(num_bands):
        cols = [F.col(f"mh_{b * rpb + r}") for r in range(rpb)]
        one = sigs.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws("_", *[c.cast("string") for c in cols]).alias("sig"),
        )
        bands = one if bands is None else bands.unionAll(one)

    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b_ = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    cands = (
        a.join(b_, on=["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    # candidate-bounded verification (the whole point of banding;
    # all-pairs Jaccard would re-introduce the quadratic), then eager:
    # run the (bounded-output) dedup job now so the shingle cache can
    # be dropped — a lazy return would leak it for the rest of the
    # session (it slowed every later query in a shared session;
    # measured as bench drift round-over-round)
    result = (
        _verify_jaccard(cands, shingles, threshold)
        .select("doc_a", "doc_b", "jaccard")
        .localCheckpoint(eager=True)
    )
    shingles.unpersist()
    return result


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): 56-bit SimHash over token-frequency weights.

    Each bit k is the sign of Σ_tokens cnt·(2·bit_k(hash(token))−1),
    computed directly over token OCCURRENCES: summing (2·bit−1) per
    occurrence is integer-identical to the cnt-weighted sum over
    distinct words, and it drops the former (doc_id, w) pre-count —
    a full shuffle of the token stream — leaving ONE doc_id shuffle
    whose map-side partial aggregation emits a single 56-column row
    per document per map partition.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).select("doc_id", hash56("w").alias("h"))
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(bit_of(F.col("h"), k) * 2 - 1).alias(f"s{k}")
            for k in range(bits)
        ]
    )
    sim = None
    for k in range(bits):
        term = F.when(F.col(f"s{k}") > 0, F.lit(1).cast("long") * (1 << k)).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.alias("simhash"))


def _simhash_chunks(bits: int, n_chunks: int) -> list[tuple[int, int]]:
    """Partition [0, bits) into n_chunks contiguous (offset, width)
    spans, widths as even as possible."""
    base, rem = divmod(bits, n_chunks)
    widths = [base + 1] * rem + [base] * (n_chunks - rem)
    spans, off = [], 0
    for w in widths:
        spans.append((off, w))
        off += w
    return spans


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 8, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Candidate generation is banded (the 100 TB path): the signature is
    split into ``max_hamming + 1`` contiguous bit chunks; by pigeonhole,
    any pair within Hamming ≤ max_hamming differs in at most max_hamming
    chunks, so it agrees EXACTLY on at least one — an equi-join on
    (chunk_index, chunk_value) finds every qualifying pair with linear
    candidate generation, and the XOR+popcount verify then filters the
    in-bucket false positives. Output identical to all-pairs; no
    CartesianProduct anywhere in the plan.

    Exactly-once emission WITHOUT a distinct shuffle: a pair that agrees
    in several chunks would surface once per agreeing chunk, so each
    join row is kept only when its chunk is the FIRST chunk the pair
    agrees on — a pure bit-arithmetic predicate on ha XOR hb over the
    earlier chunk spans. This replaced the round-3 pair-level
    ``.distinct()`` (an extra full shuffle of the candidate set).

    Requires max_hamming + 1 ≤ bits (chunks need ≥1 bit each) — true
    for any useful threshold; asserted, not silently degraded.
    """
    assert max_hamming + 1 <= bits, "banding needs max_hamming + 1 <= bits"
    spans = _simhash_chunks(bits, max_hamming + 1)
    # materialize the signatures once — both self-join branches read
    # them, and a checkpoint guarantees one signature pass regardless of
    # whether exchange reuse fires. N×8-byte rows: trivially cheap to
    # pin at any corpus size. (Locally the join probe dominates: on the
    # shared-vocabulary sf0.1 fixture the banded candidate volume,
    # Σ bucket², is 22.6M rows vs 12.5M all-pairs at N=5000 — banding
    # is a small-N overhead that wins asymptotically, since Σ bucket²
    # grows linearly with N at fixed near-dup density while N² doesn't.)
    sigs = simhash_signatures(docs, bits).localCheckpoint()
    chunk_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), off).bitwiseAND(F.lit((1 << w) - 1))
            for off, w in spans
        ]
    )
    keyed = sigs.select(
        "doc_id", "simhash", F.posexplode(chunk_vals).alias("chunk", "cv")
    )
    a = keyed.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "chunk", "cv"
    )
    b = keyed.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "chunk", "cv"
    )
    xor = F.col("ha").bitwiseXOR(F.col("hb"))
    # keep the row only if every chunk BEFORE this one disagrees — the
    # pair's first agreeing chunk emits it, all later collisions drop
    first_agree = F.lit(True)
    for k, (off, w) in enumerate(spans):
        disagrees_k = F.shiftright(xor, off).bitwiseAND(F.lit((1 << w) - 1)) != 0
        first_agree = first_agree & ((F.col("chunk") <= F.lit(k)) | disagrees_k)
    return (
        a.join(b, on=["chunk", "cv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(first_agree)
        .withColumn("hamming", F.bit_count(xor))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("long"))
    )


def dup_groups(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Resolve near-dup pairs into groups: connected components by
    min-label propagation, the step that turns any pair list (exact,
    MinHash, SimHash, embedding) into canonical-document groups.

    Returns (doc_id, group_id) for every document appearing in a pair;
    group_id = the minimum doc_id of its component (so "keep the
    canonical copy" is `filter(doc_id == group_id)`). Documents in no
    pair are implicitly their own singleton group.

    Each iteration is one join+groupBy propagating the component
    minimum one hop; convergence takes O(component diameter) rounds —
    near-dup components are overwhelmingly tiny stars/cliques, so this
    terminates in 2-3 rounds in practice (`max_iters` is a safety
    bound, and iterates are localCheckpointed to keep lineage flat).
    Deterministic: min() is order-independent.
    """
    und = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = (
        und.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("group_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nbr_min = (
            und.join(labels, on=und.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("group_id").alias("nbr"))
        )
        new_labels = (
            labels.join(nbr_min, on="doc_id", how="left")
            .select(
                "doc_id",
                F.least(
                    F.col("group_id"), F.coalesce("nbr", F.col("group_id"))
                ).alias("group_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels, on=["doc_id", "group_id"], how="left_anti")
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keep_best(
    docs: DataFrame, pairs: DataFrame, score: Column | None = None
) -> DataFrame:
    """(doc_id, group_id, canonical_id, is_canonical): canonical-copy
    selection per near-dup group — the curation step after
    :func:`dup_groups` when "keep the minimum id" is the wrong policy.

    The kept member is the group's argmax of `score` (default:
    `n_chars`, i.e. keep the longest variant — the common heuristic for
    crawl dedup where truncated copies should lose), ties broken by
    minimum doc_id for determinism. Documents in no pair are their own
    singleton group and always canonical.

    Cost on top of dup_groups: one broadcast-sized join of the group
    table (near-dup members only — a small fraction of the corpus)
    against the doc scores, one per-group window (group sizes are tiny
    cliques/stars), one left join back to the corpus. Nothing touches
    `text`.
    """
    if score is None:
        score = F.col("n_chars")
    groups = dup_groups(pairs)
    scored = docs.select("doc_id", score.alias("_score"))
    members = groups.join(scored, on="doc_id")
    w = Window.partitionBy("group_id").orderBy(
        F.desc("_score"), F.asc("doc_id")
    )
    canon = (
        members.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("group_id", F.col("doc_id").alias("canonical_id"))
    )
    return (
        scored.select("doc_id")
        .join(groups, on="doc_id", how="left")
        .withColumn("group_id", F.coalesce("group_id", F.col("doc_id")))
        .join(canon, on="group_id", how="left")
        .select(
            "doc_id",
            F.col("group_id").cast("long").alias("group_id"),
            F.coalesce("canonical_id", F.col("doc_id"))
            .cast("long")
            .alias("canonical_id"),
            (
                F.col("doc_id")
                == F.coalesce("canonical_id", F.col("doc_id"))
            ).alias("is_canonical"),
        )
    )


def _decimal_components(emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, j, x): DECIMAL(18,9) embedding components via integer
    NANO-UNITS — x = ROUND(xf·1e9)/1e9, constructed as bigint·1e-9 so
    both engines derive the decimal from the SAME integer. A direct
    double→decimal(18,9) cast is NOT engine-stable: Spark goes through
    BigDecimal.valueOf (shortest double repr) while DuckDB expands the
    exact binary fraction, and one component in ~1e6 lands where the
    two roundings differ by 1 ulp (caught by the sf0.1 oracle sweep on
    `embedding_centroids`). ROUND on the shared double product is the
    engine-agreed primitive the whole cents convention already rests
    on; |xf·1e9| for unit-scale embeddings sits ~10 significant digits,
    far inside double-exact range."""
    from decimal import Decimal

    nanos = F.round(F.col("xf").cast("double") * F.lit(1e9)).cast(
        "decimal(18,0)"
    )
    return emb.select(
        F.col(id_col),
        F.posexplode("embedding").alias("j", "xf"),
    ).select(
        id_col,
        "j",
        (nanos * F.lit(Decimal("0.000000001"))).cast("decimal(18,9)").alias("x"),
    )


def srp_signatures_decimal(
    emb: DataFrame,
    num_tables: int = 8,
    planes_per_table: int = 6,
    comp: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, tbl, sig): sign-random-projection LSH bucket per table,
    computed in EXACT decimal arithmetic so bucket assignment is
    engine-reproducible.

    Same hyperplane family as similarity.lsh_signatures (identical
    md5-derived components, see functions.hashing.srp_weight_int), but
    the projections here are Σ x·iw over DECIMAL components and INTEGER
    weights — associative, order-independent, and byte-identical in
    DuckDB — where the ANN path's float BLAS matmul could flip the sign
    of a near-zero projection between engines.

    Execution detail: x = n/1e9 exactly (DECIMAL(18,9)), so each
    projection is computed as the LONG sum Σ n·iw — sign(Σ n·iw) ==
    sign(Σ x·iw) since 1e9 > 0, and the whole 48-accumulator groupBy
    runs in long arithmetic instead of BigDecimal (≈4× on the bench
    fixture; bucket assignment is bit-identical, so the unchanged
    decimal-formulated oracles still hash-match). Overflow guard: the
    long path runs only when d·max|n|·1e6 stays under 2^63 (true for
    every sane embedding table — unit-scale 4096-dim needs max|x| ≲ 1e3
    to break it); out-of-range inputs fall back to the BigDecimal
    formulation with identical signs.
    """
    spark = emb.sparkSession
    if comp is None:
        comp = _decimal_components(emb)
    L, r = num_tables, planes_per_table
    # pivoted plane table: ONE row per dimension, one column per plane.
    # The projection join then stays at N·d rows (never N·d·L·r) and
    # all L·r sums run as aggregate expressions in one codegen'd
    # groupBy — same exact arithmetic signs, so the oracle's
    # (vec, table, plane)-grouped decimal formulation computes
    # identical buckets.
    pivot = spark.createDataFrame(
        [
            tuple(
                [j]
                + [
                    srp_weight_int(t, p, j)
                    for t in range(L)
                    for p in range(r)
                ]
            )
            for j in range(_emb_dim(emb))
        ],
        ", ".join(["j LONG"] + [f"iw_{k} LONG" for k in range(L * r)]),
    )
    scaled = comp.select(
        "vec_id",
        "j",
        (F.col("x") * F.lit(1_000_000_000)).cast("long").alias("n"),
    )
    dim = max(1, _emb_dim(emb))
    if dim * _abs_max_n(scaled) * 1_000_000 < (1 << 62):
        proj = (
            scaled.join(F.broadcast(pivot), on="j")
            .groupBy("vec_id")
            .agg(
                *[
                    F.sum(F.col("n") * F.col(f"iw_{k}")).alias(f"s_{k}")
                    for k in range(L * r)
                ]
            )
        )
    else:
        proj = (
            comp.join(F.broadcast(pivot), on="j")
            .groupBy("vec_id")
            .agg(
                *[
                    F.sum(F.col("x") * F.col(f"iw_{k}")).alias(f"s_{k}")
                    for k in range(L * r)
                ]
            )
        )
    table_sigs = []
    for t in range(L):
        sig = None
        for p in range(r):
            term = F.when(
                F.col(f"s_{t * r + p}") > 0, F.lit(1 << p).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            sig = term if sig is None else sig + term
        table_sigs.append(
            F.struct(F.lit(t).cast("long").alias("tbl"), sig.alias("sig"))
        )
    return proj.select(
        "vec_id", F.explode(F.array(*table_sigs)).alias("ts")
    ).select("vec_id", F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))


def srp_bucket_candidates(
    emb: DataFrame,
    num_tables: int = 8,
    planes_per_table: int = 6,
    comp: DataFrame | None = None,
) -> DataFrame:
    """(vec_a, vec_b) candidate pairs from sign-random-projection LSH —
    an equi-join of :func:`srp_signatures_decimal` with itself on
    (table, signature). Candidate volume shrinks ~2^planes_per_table-fold
    per table vs all-pairs; a vector lands in exactly num_tables
    buckets, so generation is one equi-join."""
    # materialize the signatures once — the self-join would otherwise
    # re-derive the whole projection lineage for each side
    sigs = srp_signatures_decimal(
        emb, num_tables, planes_per_table, comp=comp
    ).localCheckpoint()
    a = sigs.select(F.col("vec_id").alias("vec_a"), "tbl", "sig")
    b = sigs.select(F.col("vec_id").alias("vec_b"), "tbl", "sig")
    return (
        a.join(b, on=["tbl", "sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )


def _emb_dim(emb: DataFrame) -> int:
    """Embedding dimensionality (constant per table by schema contract);
    one tiny head query, not a scan."""
    row = emb.select(F.size("embedding").alias("d")).head()
    return int(row["d"]) if row else 0


def _abs_max_n(scaled: DataFrame) -> int:
    """max |n| over a (vec_id, j, n) scaled-components frame — the
    overflow guard for the long fixed-point fast paths (one tiny
    aggregate; components are n = x·1e9 exactly)."""
    row = scaled.agg(F.max(F.abs(F.col("n"))).alias("m")).first()
    return int(row["m"]) if row and row["m"] is not None else 0


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    num_tables: int = 8,
    planes_per_table: int = 6,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold among SRP-LSH
    candidates (decimal-arithmetic dots → engine-reproducible).

    Returns (vec_a, vec_b, cosine). Candidates come from
    :func:`srp_bucket_candidates` — the scale path; dot products are
    then computed ONLY for in-bucket pairs (never the all-pairs
    dimension join). Like every LSH dedup, recall is probabilistic:
    for true near-dups (cosine ≥ 0.9, θ ≤ 26°) a pair collides in ≥1
    of 8 tables with prob ≈ 1−(1−(1−θ/π)^6)^8 ≈ 0.98, while
    far-apart pairs rarely generate candidates. The DuckDB oracle
    mirrors the candidate generation exactly, so the operator is
    hash-checkable end-to-end despite being approximate.
    """
    # the exploded decimal components feed FOUR scans below (signature
    # projection, norms, and both sides of the dot join) — materialize
    # once instead of re-running scan+posexplode+cast per consumer
    comp = _decimal_components(emb).localCheckpoint()
    # cands is the verify frontier: materialize it so the signature
    # self-join runs once and the dot join starts from a compact
    # (vec_a, vec_b) table instead of re-deriving both signature sides
    cands = srp_bucket_candidates(
        emb, num_tables, planes_per_table, comp=comp
    ).localCheckpoint()
    # fixed-point fast path (same trick as srp_signatures_decimal):
    # x = n/1e9 exactly, so x_a·x_b = n_a·n_b/1e18 with each product a
    # long; the per-pair sum is accumulated as DECIMAL(38,0) (a d-term
    # sum of long products can pass 2^63) and rescaled on the double
    # cast. The exact value is identical to the decimal-multiply
    # formulation; the double cast can differ by ≲2 ulp, which the
    # existing round(9) absorbs — the same tolerance class the DuckDB
    # oracle already relies on. Guard: per-term |n_a·n_b| must fit a
    # long, i.e. max|n| < 3e9 (components up to |x| ≈ 3); larger-range
    # embeddings take the BigDecimal formulation instead — same values,
    # never an overflow (ANSI mode would raise, not wrap, but the
    # dispatch keeps even that from happening).
    scaled = comp.select(
        "vec_id", "j", (F.col("x") * F.lit(1_000_000_000)).cast("long").alias("n")
    )
    if _abs_max_n(scaled) < 3_000_000_000:
        norms = scaled.groupBy("vec_id").agg(
            F.sum((F.col("n") * F.col("n")).cast("decimal(38,0)")).alias("nsq18")
        )
        a = scaled.select(
            F.col("vec_id").alias("vec_a"), "j", F.col("n").alias("na_")
        )
        b = scaled.select(
            F.col("vec_id").alias("vec_b"), "j", F.col("n").alias("nb_")
        )
        # candidate-bounded verification, same shape as
        # minhash_lsh_pairs: explode each candidate pair to its
        # components, never all pairs
        dots = (
            cands.join(a, on="vec_a")
            .join(b, on=["vec_b", "j"])
            .groupBy("vec_a", "vec_b")
            .agg(
                F.sum(
                    (F.col("na_") * F.col("nb_")).cast("decimal(38,0)")
                ).alias("dot18")
            )
        )
        scale = F.lit(1e18)
        dot_d = F.col("dot18").cast("double") / scale
        na_d = F.col("na").cast("double") / scale
        nb_d = F.col("nb").cast("double") / scale
        norms_a = norms.select(
            F.col("vec_id").alias("vec_a"), F.col("nsq18").alias("na")
        )
        norms_b = norms.select(
            F.col("vec_id").alias("vec_b"), F.col("nsq18").alias("nb")
        )
    else:
        norms = comp.groupBy("vec_id").agg(
            F.sum(F.col("x") * F.col("x")).alias("nsq")
        )
        a = comp.select(
            F.col("vec_id").alias("vec_a"), "j", F.col("x").alias("xa")
        )
        b = comp.select(
            F.col("vec_id").alias("vec_b"), "j", F.col("x").alias("xb")
        )
        dots = (
            cands.join(a, on="vec_a")
            .join(b, on=["vec_b", "j"])
            .groupBy("vec_a", "vec_b")
            .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"))
        )
        dot_d = F.col("dot").cast("double")
        na_d = F.col("na").cast("double")
        nb_d = F.col("nb").cast("double")
        norms_a = norms.select(
            F.col("vec_id").alias("vec_a"), F.col("nsq").alias("na")
        )
        norms_b = norms.select(
            F.col("vec_id").alias("vec_b"), F.col("nsq").alias("nb")
        )
    return (
        dots.join(norms_a, on="vec_a")
        .join(norms_b, on="vec_b")
        .withColumn(
            # round(9): absorbs the ≤2-ulp double-cast difference between
            # engines (and between the scaled and decimal formulations)
            "cosine",
            F.round(dot_d / F.sqrt(na_d * nb_d), 9),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    key_chars: int = 32,
    block_chars: int = 8,
    threshold_ppm: int = 500_000,
    window: int = 2,
) -> DataFrame:
    """Sorted-neighborhood dedup (Hernández & Stolfo's classic blocking
    strategy): sort documents by a prefix key, compare each row to its
    `window - 1` predecessors (default 1 — adjacent only), keep pairs
    whose token-set Jaccard (in exact ppm integers) clears
    `threshold_ppm`. Widening `window` is the recall dial: cost grows
    linearly (w−1 lagged comparisons per row), never quadratically.

    Complements the MinHash/SimHash family with an O(n log n) method
    that needs NO inverted index and exactly ONE shuffle: rows are
    hash-partitioned by a short `block_chars` prefix and sorted by the
    longer `key_chars` prefix inside each block, so a near-duplicate
    pair is found iff the copies agree on their first `block_chars`
    characters — the standard recall/cost dial of the method (windowed
    variants widen recall; adjacent-only keeps the check linear).

    Scale: one window shuffle keyed on the block prefix; per-row state
    is one lagged token array. No self-join, no candidate explosion —
    the cheapest of the dedup family at 100 TB, with the weakest recall
    (prefix-sensitive). Jaccard uses integer ppm arithmetic
    (`common * 1_000_000 div union`) so the DuckDB oracle hash-matches.

    Output: (doc_a, doc_b, jaccard_ppm) with doc_a < doc_b.
    """
    toks = docs.select(
        "doc_id",
        F.substring("text", 1, block_chars).alias("blk"),
        F.substring("text", 1, key_chars).alias("srt"),
        F.array_sort(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
    )
    w = Window.partitionBy("blk").orderBy(F.col("srt").asc(), F.col("doc_id").asc())
    with_lags = toks.select(
        "doc_id",
        "tok",
        *[
            c
            for i in range(1, window)
            for c in (
                F.lag("doc_id", i).over(w).alias(f"_pid{i}"),
                F.lag("tok", i).over(w).alias(f"_ptok{i}"),
            )
        ],
    )
    lagged = with_lags.select(
        "doc_id",
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"_pid{i}").alias("prev_id"),
                        F.col(f"_ptok{i}").alias("prev_tok"),
                    )
                    for i in range(1, window)
                ]
            )
        ).alias("p"),
    )
    adj = lagged.select(
        "doc_id", "tok", F.col("p.prev_id").alias("prev_id"),
        F.col("p.prev_tok").alias("prev_tok"),
    ).filter(F.col("prev_id").isNotNull())
    common = F.size(F.array_intersect(F.col("tok"), F.col("prev_tok"))).cast("long")
    union = (F.size("tok") + F.size("prev_tok")).cast("long") - common
    return (
        adj.withColumn("_c", common)
        .withColumn("_u", union)
        .withColumn("jaccard_ppm", F.expr("_c * 1000000 DIV _u"))
        .filter(F.col("jaccard_ppm") >= threshold_ppm)
        .select(
            F.least("prev_id", "doc_id").alias("doc_a"),
            F.greatest("prev_id", "doc_id").alias("doc_b"),
            "jaccard_ppm",
        )
    )


def prefix_containment_pairs(docs: DataFrame, block_chars: int = 32) -> DataFrame:
    """(dup_id, container_id): documents whose ENTIRE text is a prefix
    of another document's text — the retraining-leak shape that
    shingle-Jaccard misses when the container is much longer (the
    short doc's shingles are a tiny fraction of the long one's) and
    exact dedup misses entirely.

    Blocking join on the first `block_chars` characters (a prefix-
    contained doc of length ≥ block_chars shares them with every
    container), then in-block verification by exact substring compare.
    Only documents with ≥ block_chars characters participate — shorter
    ones don't share the block key with their containers; run them
    through exact/Jaccard dedup instead (they're below any useful
    training-doc length anyway). Equal-text pairs are oriented by
    doc_id so each is emitted once; run AFTER exact_dedup at scale or
    a k-copy cluster contributes k·(k−1)/2 pairs.

    Shuffle profile: one exchange on the 32-char block key; the text
    column rides the shuffle only for in-block verification (cap the
    blocks with a df-style cap as in ngram_jaccard_pairs if a corpus
    has pathological boilerplate prefixes).
    """
    a = docs.filter(F.length("text") >= block_chars).select(
        F.col("doc_id").alias("dup_id"),
        F.col("text").alias("dup_text"),
        F.length("text").alias("dup_chars"),
        F.substring("text", 1, block_chars).alias("blk"),
    )
    b = docs.filter(F.length("text") >= block_chars).select(
        F.col("doc_id").alias("container_id"),
        F.col("text").alias("c_text"),
        F.length("text").alias("c_chars"),
        F.substring("text", 1, block_chars).alias("blk"),
    )
    return (
        a.join(b, on="blk")
        .filter(
            (F.col("dup_chars") < F.col("c_chars"))
            | (
                (F.col("dup_chars") == F.col("c_chars"))
                & (F.col("dup_id") < F.col("container_id"))
            )
        )
        .filter(F.expr("substring(c_text, 1, dup_chars) = dup_text"))
        .select("dup_id", "container_id")
    )


def dup_group_size_histogram(pairs: DataFrame) -> DataFrame:
    """(group_size, n_groups): the size distribution of near-duplicate
    clusters resolved from a candidate-pair relation — the report that
    distinguishes "many doc-pairs" (harmless) from "one 80k-doc
    boilerplate cluster" (a template crawl that will dominate training
    unless capped). Composes :func:`dup_groups` (min-label resolution)
    with two tiny aggregations; singleton documents are not clustered
    and so don't appear (every reported size ≥ 2).
    """
    groups = dup_groups(pairs)
    sizes = groups.groupBy("group_id").agg(F.count("*").alias("n"))
    return sizes.groupBy(F.col("n").cast("long").alias("group_size")).agg(
        F.count("*").cast("long").alias("n_groups")
    )


def typo_pair_join(part: DataFrame, max_dist: int = 2) -> DataFrame:
    """(name_a, name_b, dist, n_parts_a, n_parts_b): the blocked
    EDIT-DISTANCE similarity join — catalog names within Levenshtein
    `max_dist` of each other, the entity-resolution primitive the
    token-set family (Jaccard/MinHash/containment) cannot express
    (character-level typos barely move token sets). `levenshtein` is
    Spark's JVM built-in, inside codegen; DuckDB's levenshtein uses the
    identical unit-cost DP, so the pair set hash-matches.

    Blocking: names dedupe to their (vocabulary-bounded) distinct set
    first, carrying their part multiplicity as census weight; candidate
    pairs form only WITHIN a block keyed on the LAST whitespace token.
    For adjective-noun style catalog names an edit ≤ 2 almost never
    survives a noun swap, and the block key bounds the quadratic term
    by the per-noun variant count, not the catalog size — the same
    pigeonhole trade documented for SimHash chunks. A hot block (one
    noun dominating the vocabulary) is the salted-join case:
    sub-block on a name-hash residue before pairing, as
    `skew_salted_enrich` demonstrates. Ordering `name_a < name_b`
    emits each pair once.
    """
    names = (
        part.groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").cast("long").alias("n_parts"))
        .withColumn("block", F.element_at(F.split(F.col("name"), " "), -1))
    )
    a = names.select(
        F.col("block"),
        F.col("name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
    )
    b = names.select(
        F.col("block"),
        F.col("name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
    )
    return (
        a.join(b, on="block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, w: int = 4
) -> DataFrame:
    """(doc_id, fp): distinct winnowing fingerprints per document —
    the local-minimum subsample of the char-k-gram hash sequence
    (Schleimer/Wilkerson/Aiken's MOSS winnowing, SIGMOD'03): hash every
    k-char gram (the shared md5-56 family, cross-engine exact), slide a
    w-gram window over the sequence, keep each window's minimum. The
    guarantee: any shared substring of length ≥ k + w − 1 contributes
    at least one IDENTICAL fingerprint to both documents, at ~1/w the
    volume of the full gram set — the standard partial-overlap /
    contained-plagiarism detector that whole-document shingle dedup
    (`ngram_jaccard_pairs`) misses when the copied span is a small
    fraction of either document.

    Simplification vs the paper (documented, mirrored in the oracle):
    the per-window RIGHTMOST-minimum tie rule and the consecutive-
    selection dedup collapse here to a plain DISTINCT over per-window
    minima — same fingerprint SET guarantee, order metadata dropped.

    Documents shorter than k chars contribute their whole text as a
    single gram (substring(text, 1, k) already is the whole text —
    the short-doc convention of `word_shingles`); documents with fewer
    than w grams yield their single full-range window minimum.

    Scale shape: the gram explode fans ~L per document (~1k at the
    testdata's doc lengths), so docs route through
    `spread_before_explode` first (the round-10/11 fan-out rule); the
    window min is per-doc (bounded partitions ≈ doc length); the
    output is distinct-reduced to ~L/w fingerprints per doc before any
    join."""
    from ..functions.joins import spread_before_explode

    docs = spread_before_explode(
        docs.filter(F.col("text").isNotNull() & (F.length("text") > 0))
    )
    n_grams = F.greatest(F.length("text") - (k - 1), F.lit(1))
    grams = docs.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(1), n_grams)).alias("_", "i"),
        n_grams.alias("n_grams"),
        "text",
    ).select(
        "doc_id",
        "i",
        "n_grams",
        hash56(F.expr(f"substring(text, i, {k})")).alias("h"),
    )
    win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    fps = (
        grams.withColumn("wmin", F.min("h").over(win))
        .filter(F.col("i") <= F.greatest(F.col("n_grams") - (w - 1), F.lit(1)))
        .select("doc_id", F.col("wmin").alias("fp"))
        .distinct()
    )
    return fps


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = 64,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing ≥ `min_shared`
    winnowing fingerprints, ordered doc_a < doc_b — the partial-overlap
    join over `winnow_fingerprints`. `max_fp_df` drops fingerprints
    present in more than that many documents before the pair join (the
    `max_shingle_df` lever: a gram every document contains — boilerplate
    headers, whitespace runs — carries no overlap signal and its
    inverted-index bucket is quadratic)."""
    # The fingerprint frame feeds the df-cap aggregate AND both sides of
    # the pair self-join — without materialization the char-gram explode
    # + per-doc window subtree runs up to three times (r11 advice).
    # localCheckpoint (eager, MEMORY_AND_DISK) computes it once and
    # truncates the lineage; blocks are ContextCleaner-freed when the
    # frame is dropped, per the repo's iterate-persistence rules.
    fps = winnow_fingerprints(docs, k=k, w=w).localCheckpoint()
    if max_fp_df is not None:
        keep = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_fp_df)
            .select("fp")
        )
        fps = fps.join(keep, on="fp", how="left_semi")
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, on="fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def source_copy_matrix(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    max_fp_df: int | None = 64,
) -> DataFrame:
    """(source_a, source_b, n_pairs, n_shared_fps): the cross-source
    contamination matrix — winnowing-fingerprint overlap
    (`winnow_overlap_pairs`'s pair stream) rolled up to ordered SOURCE
    pairs: how many cross-source document pairs share fingerprints and
    how many fingerprint co-occurrences they share in total. The
    corpus-governance complement of `dup_rate_by_source` (which counts
    within-corpus duplicates per source): before mixing source B into
    a training set that already contains source A, this matrix says
    how much of B is textually derivative of A — mutually-copied spans
    surface here even when neither document is a whole-document
    duplicate. source_a < source_b lexicographically; same-source
    pairs excluded (that is `dup_rate_by_source`'s job).

    Scale shape: `winnow_overlap_pairs`' shape (scan-linear gram
    hashing behind `spread_before_explode`, `max_fp_df`-capped
    fingerprint buckets) plus one broadcastable doc→source annotation
    join on each pair side and a source²-bounded rollup."""
    pairs = winnow_overlap_pairs(
        docs, k=k, w=w, min_shared=1, max_fp_df=max_fp_df
    )
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    b = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        pairs.join(a, on="doc_a")
        .join(b, on="doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "n_shared",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("n_shared").cast("long").alias("n_shared_fps"),
        )
    )
