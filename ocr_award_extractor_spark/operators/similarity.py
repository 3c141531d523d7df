"""Similarity search over an embedding column (array<float>).

* brute-force cosine scoring / top-k — the correctness baseline;
* all-pairs near-duplicate detection above a cosine threshold;
* random-hyperplane LSH bucket assignment — the scale path (bucketed
  candidate join instead of the O(n²) cross join).

Determinism contract: embeddings are QUANTIZED to int64 (round(x·10⁴))
before any arithmetic, dot products and norms are exact integer sums, and
the final cosine is the same IEEE divide/sqrt on both engines — so the
DuckDB oracles match bit-for-bit, including threshold predicates and
top-k cut lines (no float tolerance needed anywhere).

Scale notes (100 TB / 10⁹ vectors): the brute-force scorer broadcasts the
query vector (no shuffle); near-dup pairs must NOT be a cross join at
scale — use lsh_buckets to bucket vectors, then join within buckets
(candidates shrink by orders of magnitude; the cross-join spelling here is
the small-scale oracle baseline the bucketed path is validated against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_award_extractor_spark.sources.tables import load_table

QUANT = 10_000
DIM = 64
NEARDUP_THRESHOLD = 0.35
TOP_K = 10
IVF_K = 8  # coarse centroids; deterministic = embeddings of vec_id 0..K-1

# deterministic pseudo-random hyperplanes for LSH (shared with the oracle)
LSH_PLANES = 8
LSH_WEIGHTS = [
    [((p * 1009 + d * 917) % 2001) - 1000 for d in range(DIM)]
    for p in range(LSH_PLANES)
]


def _quant(col):
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT, 0).cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )


def _norm2(a):
    return _dot(a, a)


def _with_query(spark: SparkSession, sf_dir: str, query_vec_id: int = 0):
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.where(F.col("vec_id") == query_vec_id)
        .select(_quant(F.col("embedding")).alias("qv"))
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id", "label",
            _dot(_quant(F.col("embedding")), F.col("qv")).alias("dot_q"),
            _norm2(_quant(F.col("embedding"))).alias("n2_self"),
            _norm2(F.col("qv")).alias("n2_query"),
        )
    )
    cos = F.col("dot_q").cast("double") / F.sqrt(
        (F.col("n2_self") * F.col("n2_query")).cast("double")
    )
    return scored.select("vec_id", "label", "dot_q", cos.alias("cos_sim"))


def cosine_to_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every vector to the query vector (vec_id=0): broadcast
    join, zero shuffle, whole-stage-codegen arithmetic."""
    return _with_query(spark, sf_dir)


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k by cosine (tie-break vec_id asc) — TopK sort over
    the broadcast-scored scan; Spark plans this as TakeOrderedAndProject
    (per-partition heap + driver merge), no full sort."""
    scored = _with_query(spark, sf_dir).where(F.col("vec_id") != 0)
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(TOP_K)


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs near-dup baseline: pairs with cosine ≥ threshold. The
    threshold predicate is exact (quantized ints → identical doubles)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quant(F.col("embedding")).alias("qe")
    )
    a = emb.select(F.col("vec_id").alias("va"), F.col("qe").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"), F.col("qe").alias("eb"))
    pairs = a.join(b, F.col("va") < F.col("vb"))
    cos = _dot(F.col("ea"), F.col("eb")).cast("double") / F.sqrt(
        (_norm2(F.col("ea")) * _norm2(F.col("eb"))).cast("double")
    )
    return (
        pairs.select("va", "vb", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= NEARDUP_THRESHOLD)
    )


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: sign bit per plane → bucket id. At scale,
    near-dup search joins within (bucket) instead of all-pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    qe = _quant(F.col("embedding"))
    bucket = None
    for p in range(LSH_PLANES):
        w = F.array(*[F.lit(v).cast("long") for v in LSH_WEIGHTS[p]])
        bit = F.when(_dot(qe, w) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return emb.select("vec_id", "label", bucket.alias("bucket"))


def lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path: near-dup pairs restricted to same-LSH-bucket
    candidates (recall < 1 by construction; compare with the brute-force
    baseline via tests/bench). Joins on bucket — shuffle is O(candidates)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quant(F.col("embedding")).alias("qe")
    )
    buckets = lsh_buckets(spark, sf_dir).select("vec_id", "bucket")
    v = emb.join(buckets, "vec_id")
    a = v.select(F.col("bucket").alias("ka"), F.col("vec_id").alias("va"), F.col("qe").alias("ea"))
    b = v.select(F.col("bucket").alias("kb"), F.col("vec_id").alias("vb"), F.col("qe").alias("eb"))
    pairs = a.join(b, (F.col("ka") == F.col("kb")) & (F.col("va") < F.col("vb")))
    cos = _dot(F.col("ea"), F.col("eb")).cast("double") / F.sqrt(
        (_norm2(F.col("ea")) * _norm2(F.col("eb"))).cast("double")
    )
    return (
        pairs.select("va", "vb", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= NEARDUP_THRESHOLD)
    )


def _assign_to_centroids(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid argmax for any (vec_id, label, qe) frame."""
    cos_c = _dot(F.col("qe"), F.col("cv")).cast("double") / F.sqrt(
        (_norm2(F.col("qe")) * _norm2(F.col("cv"))).cast("double")
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", cos_c.alias("cos_c"), "cid"
    )
    # maximize (cos_c, -cid): struct-max ⇒ partial-aggregatable argmax
    best = scored.groupBy("vec_id", "label").agg(
        F.max(F.struct(F.col("cos_c").alias("c"),
                       (-F.col("cid")).alias("neg_cid"))).alias("b")
    )
    return best.select(
        "vec_id", "label", (-F.col("b.neg_cid")).cast("long").alias("centroid")
    )


def _emb_and_centroids(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _quant(F.col("embedding")).alias("qe")
    )
    cent = emb.where(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("cv")
    )
    return emb, cent


def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid by
    cosine (tie-break centroid id asc). Centroids are the first IVF_K
    vectors (deterministic — a k-means step would slot in here unchanged).

    Scale shape: centroids broadcast (no shuffle to score), argmax via
    groupBy + max(struct) — plans as a two-phase SortAggregate with
    partial_max BELOW the exchange, so the shuffle carries one row per
    vec_id (never IVF_K candidates, never a window sort). At 10⁹ vectors
    the assignment is written back bucketed by centroid so probes prune
    partitions instead of re-scoring."""
    emb, cent = _emb_and_centroids(spark, sf_dir)
    return _assign_to_centroids(emb, cent)


def ivf_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe (nprobe=1): top-k by cosine to the query (vec_id=0)
    scanning ONLY the query's centroid cluster — the scale path vs the
    brute-force ann_topk_cosine baseline. Deterministic, so the DuckDB
    oracle reproduces the exact candidate set and cut line."""
    # the QUERY's centroid only needs the query row scored against the K
    # centroids (1×K, not N×K) — computing it separately means the full
    # assignment subtree appears exactly ONCE in the returned plan, with
    # no cache to leak into the session (at 10⁹ vectors the assignment is
    # a materialized table bucketed by centroid instead)
    emb, cent = _emb_and_centroids(spark, sf_dir)
    qcent = _assign_to_centroids(emb.where(F.col("vec_id") == 0), cent).select(
        F.col("centroid").alias("qc")
    )
    assigned = _assign_to_centroids(emb, cent)
    cand = (
        assigned.join(F.broadcast(qcent), F.col("centroid") == F.col("qc"))
        .where(F.col("vec_id") != 0)
        .select("vec_id", "centroid")
    )
    scored = _with_query(spark, sf_dir).join(cand, "vec_id")
    return (
        scored.select("vec_id", "label", "centroid", "dot_q", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def embedding_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side dedup clusters: connected components over the
    bucketed cosine near-dup pairs (component id = min vec_id = keeper) —
    the same keep-one-per-group step as the text-side dedup_clusters,
    sharing its pointer-jumping propagation."""
    from ocr_award_extractor_spark.operators.dedup import connected_components

    pairs = lsh_neardup_pairs(spark, sf_dir)
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id")
    edges = pairs.selectExpr("va AS src", "vb AS dst").union(
        pairs.selectExpr("vb AS src", "va AS dst")
    )
    return connected_components(
        vecs.withColumnRenamed("vec_id", "doc_id"), edges
    ).withColumnRenamed("doc_id", "vec_id")


# ------------------------------------------------------------------ oracles
_Q_CTE = f"""
    WITH qv AS (
        SELECT list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS q
        FROM embeddings WHERE vec_id = 0
    ), ev AS (
        SELECT vec_id, label,
               list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS e
        FROM embeddings
    ), scored AS (
        SELECT vec_id, label,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [e[i] * q[i] FOR i IN range(1, {DIM} + 1)]), (a, b) -> a + b) AS dot_q,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [e[i] * e[i] FOR i IN range(1, {DIM} + 1)]), (a, b) -> a + b) AS n2_self,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [q[i] * q[i] FOR i IN range(1, {DIM} + 1)]), (a, b) -> a + b) AS n2_query
        FROM ev, qv
    )
"""

_PAIR_CTE = f"""
    WITH ev AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS e
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [a.e[i] * b.e[i] FOR i IN range(1, {DIM} + 1)]), (x, y) -> x + y) AS dot_ab,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [a.e[i] * a.e[i] FOR i IN range(1, {DIM} + 1)]), (x, y) -> x + y) AS n2_a,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [b.e[i] * b.e[i] FOR i IN range(1, {DIM} + 1)]), (x, y) -> x + y) AS n2_b
        FROM ev a JOIN ev b ON a.vec_id < b.vec_id
    )
"""


def _lsh_bit_sql(p: int, e: str = "e") -> str:
    terms = " + ".join(f"{e}[{d + 1}] * ({LSH_WEIGHTS[p][d]})" for d in range(DIM))
    return f"CASE WHEN ({terms}) > 0 THEN (CAST(1 AS BIGINT) << {p}) ELSE 0 END"


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[{a}[i] * {b}[i] FOR i IN range(1, {DIM} + 1)]), (x, y) -> x + y)"
    )


_IVF_ASSIGN_CTE = f"""
    WITH ev AS (
        SELECT vec_id, label,
               list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS e
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, e AS c FROM ev WHERE vec_id < {IVF_K}
    ), sc AS (
        SELECT ev.vec_id, ev.label, ev.e, cent.cid,
               {_dot_sql("ev.e", "cent.c")} AS d,
               {_dot_sql("ev.e", "ev.e")} AS ne,
               {_dot_sql("cent.c", "cent.c")} AS nc
        FROM ev, cent
    ), asg AS (
        SELECT vec_id, label, e, cid,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY CAST(d AS DOUBLE) / sqrt(CAST(ne * nc AS DOUBLE)) DESC,
                            cid ASC) AS rn
        FROM sc
    ), a1 AS (
        SELECT vec_id, label, e, cid FROM asg WHERE rn = 1
    )
"""


# shared bucketed-near-dup pair CTEs (lsh_neardup_pairs AND the clusters
# oracle compose from this — one spelling of the LSH/threshold logic)
_LSH_PAIR_CTE = f"""
        ev AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS e
            FROM embeddings
        ), b AS (
            SELECT vec_id, e,
                   {" + ".join(_lsh_bit_sql(p) for p in range(LSH_PLANES))} AS bucket
            FROM ev
        ), pairs AS (
            SELECT a.vec_id AS va, bb.vec_id AS vb,
                   {_dot_sql("a.e", "bb.e")} AS dot_ab,
                   {_dot_sql("a.e", "a.e")} AS n2_a,
                   {_dot_sql("bb.e", "bb.e")} AS n2_b
            FROM b a JOIN b bb
              ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
        ), neardup AS (
            SELECT va, vb,
                   CAST(dot_ab AS DOUBLE) / sqrt(CAST(n2_a * n2_b AS DOUBLE)) AS cos_sim
            FROM pairs
            WHERE CAST(dot_ab AS DOUBLE) / sqrt(CAST(n2_a * n2_b AS DOUBLE))
                  >= {NEARDUP_THRESHOLD}
        )
"""

ORACLES = {
    "cosine_to_query": _Q_CTE + """
        SELECT vec_id, label, dot_q,
               CAST(dot_q AS DOUBLE) / sqrt(CAST(n2_self * n2_query AS DOUBLE)) AS cos_sim
        FROM scored
    """,
    "ann_topk_cosine": _Q_CTE + f"""
        SELECT vec_id, label, dot_q,
               CAST(dot_q AS DOUBLE) / sqrt(CAST(n2_self * n2_query AS DOUBLE)) AS cos_sim
        FROM scored WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {TOP_K}
    """,
    "embedding_neardup_pairs": _PAIR_CTE + f"""
        SELECT va, vb,
               CAST(dot_ab AS DOUBLE) / sqrt(CAST(n2_a * n2_b AS DOUBLE)) AS cos_sim
        FROM pairs
        WHERE CAST(dot_ab AS DOUBLE) / sqrt(CAST(n2_a * n2_b AS DOUBLE)) >= {NEARDUP_THRESHOLD}
    """,
    "lsh_buckets": f"""
        WITH ev AS (
            SELECT vec_id, label,
                   list_transform(embedding,
                                  x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS e
            FROM embeddings
        )
        SELECT vec_id, label,
               {" + ".join(_lsh_bit_sql(p) for p in range(LSH_PLANES))} AS bucket
        FROM ev
    """,
    # the bucketed scale path is itself deterministic (same hyperplanes both
    # sides), so the recall-bounded candidate set is exactly reproducible
    "lsh_neardup_pairs": f"""
        WITH {_LSH_PAIR_CTE}
        SELECT va, vb, cos_sim FROM neardup
    """,
    "embedding_neardup_clusters": f"""
        WITH RECURSIVE {_LSH_PAIR_CTE}
        , edges AS (
            SELECT va AS src, vb AS dst FROM neardup
            UNION ALL
            SELECT vb AS src, va AS dst FROM neardup
        ), reach(vec_id, r) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT reach.vec_id, e.dst FROM reach JOIN edges e ON e.src = reach.r
        )
        SELECT vec_id, min(r) AS comp FROM reach GROUP BY vec_id
    """,
    "ivf_assign": _IVF_ASSIGN_CTE + """
        SELECT vec_id, label, CAST(cid AS BIGINT) AS centroid FROM a1
    """,
    "ivf_topk_cosine": _IVF_ASSIGN_CTE + f"""
        , qq AS (
            SELECT e AS q, cid AS qcid FROM a1 WHERE vec_id = 0
        ), scored AS (
            SELECT a1.vec_id, a1.label, CAST(a1.cid AS BIGINT) AS centroid,
                   {_dot_sql("a1.e", "qq.q")} AS dot_q,
                   {_dot_sql("a1.e", "a1.e")} AS n2_self,
                   {_dot_sql("qq.q", "qq.q")} AS n2_query
            FROM a1, qq
            WHERE a1.cid = qq.qcid AND a1.vec_id <> 0
        )
        SELECT vec_id, label, centroid, dot_q,
               CAST(dot_q AS DOUBLE) / sqrt(CAST(n2_self * n2_query AS DOUBLE)) AS cos_sim
        FROM scored
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {TOP_K}
    """,
}

QUERIES = {
    "cosine_to_query": cosine_to_query,
    "ann_topk_cosine": ann_topk_cosine,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "lsh_buckets": lsh_buckets,
    "lsh_neardup_pairs": lsh_neardup_pairs,
    "embedding_neardup_clusters": embedding_neardup_clusters,
    "ivf_assign": ivf_assign,
    "ivf_topk_cosine": ivf_topk_cosine,
}
