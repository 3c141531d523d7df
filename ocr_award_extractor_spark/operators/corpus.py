"""Corpus-shaping operators for a crawl-scale training-data pipeline:
per-host document caps and token-budget shard packing.

Both are global-coordination problems ("at most K per key", "running
total over a global order") whose NAIVE relational spellings stop
scaling long before 100 TB — a single window over a mega-host funnels
that host's every row through one task, and a global cumulative sum
over one unpartitioned window funnels the whole corpus through one
task. The spellings here are the distributed-classic rewrites:

* ``host_cap_sample_df`` — two-phase top-K per key: hosts at-or-under
  the cap are admitted via a broadcast of the per-host counts (no
  ordering work at all — at crawl scale that is almost every host),
  and only the oversize hosts go through a SALTED two-level rank
  (rank within (host, salt) first, keep ``rn <= cap`` per salt — any
  row in a host's global top ``cap`` has at most ``cap-1`` rows ahead
  of it globally, hence at most ``cap-1`` ahead within its own salt,
  so the survivor set is exact — then a second rank over the at most
  ``salt_parts * cap`` survivors per host). The biggest single-task
  partition is O(rows_of_biggest_host / salt_parts), not
  O(rows_of_biggest_host).
* ``pack_token_shards_df`` — distributed exclusive prefix-sum: the
  deterministic global order (md5 bucket, doc_id) is RANGE-partitioned
  by the bucket's top bits, each range computes a local running total
  independently (one hash shuffle on range_id), the per-range grand
  totals — ``n_ranges`` rows, not data-sized — go through the only
  single-partition window, and a broadcast join adds each range's
  starting offset back. Shard id is then integer division of the
  exclusive offset by the token budget: the document-packing rule that
  concatenates the token stream in order and cuts every ``budget``
  tokens, as a sequence-packing front-end for LLM training shards.

Determinism: all arithmetic is exact-integer (counts, lengths, int64
cumsums, integer division); the order key (md5 bucket, doc_id) is a
total order because doc_id is unique — so results are invariant under
input partitioning and engine, and each slot is oracle-checked against
DuckDB's deliberately-naive single-window spelling.

The oracle slots run over the driver ``documents`` table, which has a
uniform ``source`` column (20 hosts × n/20 docs) — no skew to exercise
the oversize path — so ``host_cap_sample`` synthesizes a deterministic
mega-host: docs whose md5 bucket ≡ 0 (mod 4) are reassigned to
``hub.example`` (~25% of the corpus in one host), putting BOTH the
small-host fast path and the salted big-host path on the driver-graded
path at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_award_extractor_spark.operators.textstats import _md5_bucket
from ocr_award_extractor_spark.sources.tables import load_table

HOST_CAP = 20           # keep at most this many docs per host
HOST_HUB_MOD = 4        # bucket % 4 == 0 → synthetic mega-host (~25%)
HOST_SALT = 8           # sub-partitions for the oversize-host rank
HUB_HOST = "hub.example"

PACK_BUDGET = 256       # tokens per training shard
PACK_RANGE_BITS = 4     # 2**4 = 16 range partitions of the bucket space
_MD5_BUCKET_BITS = 32   # _md5_bucket spans [0, 2**32)


def _bucket_sql(col: str = "doc_id") -> str:
    """DuckDB spelling of textstats._md5_bucket (first 8 md5 hex digits
    as int64) — the shared deterministic ordering/assignment key."""
    return f"('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT"


def synth_host() -> F.Column:
    """The deterministic skew synthesizer for the oracle slot: ~1/4 of
    docs collapse into one mega-host, the rest keep their source."""
    return F.when(
        _md5_bucket(F.col("doc_id")) % HOST_HUB_MOD == 0, F.lit(HUB_HOST)
    ).otherwise(F.col("source"))


def host_cap_sample_df(
    docs: DataFrame,
    cap: int = HOST_CAP,
    salt_parts: int = HOST_SALT,
    host: F.Column | None = None,
    verdict: bool = True,
) -> DataFrame:
    """Per-host document cap: keep the first ``cap`` docs of each host
    under the deterministic (md5 bucket, doc_id) order (C4/RefinedWeb-
    style down-weighting of boilerplate-heavy mega-domains). With
    ``verdict=True`` (the oracle contract) EVERY doc gets a row
    (doc_id, host, n_host, kept); with ``verdict=False`` (the production
    fast path) only kept rows come back, without the ``kept`` column.

    Scale shape (see module docstring): one slim-projection partial-agg
    shuffle for the per-host counts (hosts ≪ docs ⇒ broadcast), ZERO
    ordering work for hosts within the cap, and a salted two-level
    row_number for the few oversize hosts so no single task ever holds a
    whole mega-host. Spark 4 plans each ``row_number <= cap`` filter as
    a WindowGroupLimit with a MAP-SIDE partial top-(cap) below the
    shuffle, so the survivor branches shuffle at most ``cap`` rows per
    (host, salt) group per mapper — that optimization cannot apply to
    the verdict mode's overflow branch (it must keep rows BEYOND the
    cap), which is one reason the kept-only path is the production
    default shape. The union branches each re-scan the pruned 3-column
    projection (Catalyst recomputes shared subtrees in a DAG); the scans
    are column-pruned and predicate-pushed, and a caller for whom the
    re-scan dominates should stage or persist the slim projection first
    — the ordering work itself is never more than two window passes over
    the oversize slice."""
    if cap < 1 or salt_parts < 1:
        raise ValueError("cap and salt_parts must be >= 1")
    h = host if host is not None else synth_host()
    # NULL host (unparsable url) coalesces to one pseudo-host rather than
    # riding a NULL join key: the count join below is null-UNSAFE, so a
    # NULL group would silently VANISH from the output — in the pipeline
    # that is dropped documents, not just a missing verdict row
    base = docs.select(
        "doc_id", F.coalesce(h, F.lit("")).alias("host"),
        _md5_bucket(F.col("doc_id")).alias("bucket")
    )
    counts = base.groupBy("host").agg(F.count(F.lit(1)).alias("n_host"))
    base = base.join(F.broadcast(counts), "host")

    small = base.where(F.col("n_host") <= cap)
    big = base.where(F.col("n_host") > cap).withColumn(
        "salt", F.col("bucket") % salt_parts
    )
    w1 = Window.partitionBy("host", "salt").orderBy("bucket", "doc_id")
    big = big.withColumn("rn1", F.row_number().over(w1))
    w2 = Window.partitionBy("host").orderBy("bucket", "doc_id")
    ranked = (
        big.where(F.col("rn1") <= cap)
        .withColumn("rn", F.row_number().over(w2))
    )

    out_cols = ["doc_id", "host", "n_host"]
    if not verdict:
        return (
            small.select(*out_cols)
            .unionByName(ranked.where(F.col("rn") <= cap).select(*out_cols))
        )
    overflow1 = big.where(F.col("rn1") > cap)
    return (
        small.select(*out_cols, F.lit(True).alias("kept"))
        .unionByName(ranked.select(
            *out_cols, (F.col("rn") <= cap).alias("kept")))
        .unionByName(overflow1.select(
            *out_cols, F.lit(False).alias("kept")))
    )


def host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """host_cap_sample_df over the driver documents table with the
    synthetic mega-host (oracle slot)."""
    return host_cap_sample_df(load_table(spark, sf_dir, "documents"))


def pack_token_shards_df(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    range_bits: int = PACK_RANGE_BITS,
    n_toks_col: str | None = None,
) -> DataFrame:
    """Token-budget shard assignment per doc:
    (doc_id, n_toks, tok_offset, shard) where tok_offset is the
    exclusive running token total under the deterministic
    (md5 bucket, doc_id) global order and shard = tok_offset div budget
    — i.e. concatenate the corpus token stream in that order and cut a
    training shard every ``budget`` tokens (each doc lands in the shard
    its first token falls into).

    Scale shape (see module docstring): distributed prefix-sum — range
    partition on the bucket's top ``range_bits`` bits (the md5 bucket is
    uniform, so ranges are balanced), local exclusive cumsum per range,
    single-partition window ONLY over the 2**range_bits per-range
    totals, broadcast the starting offsets back. Tokenization is the
    blank-filtered whitespace split shared with doc_token_profile.

    The totals branch re-scans the pruned (doc_id, text) projection and
    re-tokenizes — deliberate: map-side partial aggregation means that
    branch shuffles at most 2**range_bits rows PER MAPPER, and the
    alternative (deriving totals from the windowed side) measured the
    same scan count because Catalyst cannot reuse the window exchange
    across the diamond (the join side's null-filter makes the subtrees
    non-identical — verified against the AQE final plan, round 6). A
    caller for whom the double tokenize dominates should stage the slim
    (doc_id, n_toks, bucket) projection to parquet first, as the
    rehearsal pipeline does between stages, and pass ``n_toks_col`` to
    skip the in-plan tokenize entirely — measured round 6 at 8M rows,
    that isolates the structural win: 2.56× over the global window
    (3.6 s vs 9.3 s) vs ~1.2× when both plans re-tokenize in-flight."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if not 0 <= range_bits < _MD5_BUCKET_BITS:
        raise ValueError(f"range_bits must be in [0, {_MD5_BUCKET_BITS})")
    if n_toks_col is not None:
        n_toks = F.col(n_toks_col).cast("long")
    else:
        n_toks = F.coalesce(
            F.size(F.filter(F.split(F.col("text"), " "),
                            lambda x: F.length(x) > 0)).cast("long"),
            F.lit(0).cast("long"),
        )
    base = docs.select(
        "doc_id",
        n_toks.alias("n_toks"),
        _md5_bucket(F.col("doc_id")).alias("bucket"),
    ).withColumn(
        # top bits of the uniform bucket ⇒ ordered, balanced ranges
        # (shift, not division: exact on the int64 path by construction)
        "range_id",
        F.shiftrightunsigned("bucket", _MD5_BUCKET_BITS - range_bits)
        if range_bits else F.lit(0),
    )
    w_local = (
        Window.partitionBy("range_id")
        .orderBy("bucket", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = base.withColumn(
        "local_off",
        F.coalesce(F.sum("n_toks").over(w_local), F.lit(0).cast("long")),
    )
    totals = base.groupBy("range_id").agg(F.sum("n_toks").alias("range_total"))
    # the ONLY single-partition window: 2**range_bits rows, not the corpus
    w_ranges = (
        Window.orderBy("range_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "range_id",
        F.coalesce(F.sum("range_total").over(w_ranges),
                   F.lit(0).cast("long")).alias("range_off"),
    )
    out = base.join(F.broadcast(offsets), "range_id")
    tok_offset = F.col("range_off") + F.col("local_off")
    return out.select(
        "doc_id",
        "n_toks",
        tok_offset.alias("tok_offset"),
        # integer `div`, not floor(double /): offsets at 100 TB exceed
        # the range where double division is provably exact
        F.expr(f"(range_off + local_off) div {int(budget)}").alias("shard"),
    )


def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_token_shards_df over the driver documents table (oracle
    slot)."""
    return pack_token_shards_df(load_table(spark, sf_dir, "documents"))


# query params that never affect page identity (tracking/session noise);
# kept sorted, matched on the part before '='
TRACKING_PARAM_RE = (
    "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src)="
)


def canonicalize_url_expr(url) -> F.Column:
    """Canonical form of a URL as a pure JVM-expression Column (no UDF):
    scheme and host lowercased, a trailing ``#fragment`` removed, the
    default port for the scheme dropped (``:80`` for http, ``:443`` for
    https), tracking query params (utm_*, fbclid, gclid, …) removed, the
    surviving query params SORTED so param order can't split identical
    pages, a bare trailing ``?`` dropped, and a root path ``/`` made
    explicit after an authority-only URL. NULL stays NULL.

    This is the key a crawl dedups on BEFORE any content hashing — the
    same document fetched as ``HTTP://Site.example/a?utm_src=x&b=1`` and
    ``http://site.example/a?b=1`` must collide. Being a projection it
    composes with `stream_dedup_first_seen` (canonicalize before the
    stateful key) and `host_cap_sample_df` for free, shuffle-free."""
    url = F.when(url == "", "").otherwise(url)   # keep '' out of the regexes
    # strip fragment first: everything after the first '#'
    u = F.regexp_replace(url, "#.*$", "")
    # lowercase scheme://host[:port] (the authority; path stays cased)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    rest_after_scheme = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    authority = F.lower(F.regexp_extract(rest_after_scheme, r"^([^/?]*)", 1))
    # default ports: :80 on http, :443 on https
    authority = F.when(
        (scheme == "http") & authority.endswith(":80"),
        F.regexp_replace(authority, ":80$", ""),
    ).when(
        (scheme == "https") & authority.endswith(":443"),
        F.regexp_replace(authority, ":443$", ""),
    ).otherwise(authority)
    path_q = F.regexp_replace(rest_after_scheme, r"^[^/?]*", "")
    path = F.regexp_extract(path_q, r"^([^?]*)", 1)
    path = F.when(path == "", "/").otherwise(path)
    query = F.regexp_extract(path_q, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(TRACKING_PARAM_RE)
        & ~F.lower(p).rlike("^utm_[a-z]+$"),
    )
    clean_q = F.array_join(F.array_sort(params), "&")
    has_scheme = u.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://")
    canon = F.concat(
        scheme, F.lit("://"), authority, path,
        F.when(clean_q == "", "").otherwise(F.concat(F.lit("?"), clean_q)),
    )
    # a URL without a scheme://authority (relative, mailto:, data:) is
    # returned untouched minus the fragment — canonicalizing what we
    # can't parse would corrupt it
    return F.when(url.isNull(), F.lit(None).cast("string")).when(
        has_scheme, canon).otherwise(u)


def canonicalize_url_df(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``canon_url`` next to ``url_col`` — the projection callers
    feed to url-level dedup / host caps. Not in the driver registry (50
    seats, all taken); DuckDB parity + property tests live in
    tests/test_corpus_ops.py, per the jaccard precedent."""
    return df.withColumn("canon_url", canonicalize_url_expr(F.col(url_col)))


CANONICALIZE_URL_ORACLE_SQL = rf"""
    WITH s AS (
        SELECT url, regexp_replace(url, '#.*$', '') AS u FROM urls
    ), p AS (
        SELECT url, u,
               lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1))
                   AS scheme,
               regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')
                   AS after_scheme,
               regexp_matches(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
                   AS has_scheme
        FROM s
    ), a AS (
        SELECT url, u, scheme, has_scheme,
               lower(regexp_extract(after_scheme, '^([^/?]*)', 1)) AS auth0,
               regexp_replace(after_scheme, '^[^/?]*', '') AS path_q
        FROM p
    ), b AS (
        SELECT url, u, scheme, has_scheme, path_q,
               CASE WHEN scheme = 'http' AND auth0 LIKE '%:80'
                    THEN regexp_replace(auth0, ':80$', '')
                    WHEN scheme = 'https' AND auth0 LIKE '%:443'
                    THEN regexp_replace(auth0, ':443$', '')
                    ELSE auth0 END AS authority,
               CASE WHEN regexp_extract(path_q, '^([^?]*)', 1) = ''
                    THEN '/' ELSE regexp_extract(path_q, '^([^?]*)', 1)
               END AS path,
               -- two DuckDB NULL traps vs Spark's '' semantics:
               -- regexp_extract is NULL on no-match, and sorting/joining
               -- a fully-filtered (empty) list is NULL — either would
               -- poison the final concat for every query-less url
               coalesce(array_to_string(list_sort(list_filter(
                   string_split(coalesce(
                       regexp_extract(path_q, '\?(.*)$', 1), ''), '&'),
                   x -> len(x) > 0
                        AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')
                        AND NOT regexp_matches(lower(x), '^utm_[a-z]+$')
               )), '&'), '') AS clean_q
        FROM a
    )
    SELECT url,
           CASE WHEN url IS NULL THEN NULL
                WHEN has_scheme THEN
                    scheme || '://' || authority || path ||
                    CASE WHEN clean_q = '' THEN ''
                         ELSE '?' || clean_q END
                ELSE u END AS canon_url
    FROM b
"""


ORACLES = {
    # deliberately the naive spellings: one global window per host /
    # one unpartitioned cumsum — correct at oracle scale, and exactly
    # what the distributed rewrites must reproduce bit-for-bit
    "host_cap_sample": f"""
        WITH h AS (
            SELECT doc_id,
                   CASE WHEN {_bucket_sql()} % {HOST_HUB_MOD} = 0
                        THEN '{HUB_HOST}' ELSE source END AS host,
                   {_bucket_sql()} AS bucket
            FROM documents
        ), c AS (
            SELECT host, count(*) AS n_host FROM h GROUP BY host
        ), r AS (
            SELECT h.doc_id, h.host, c.n_host,
                   row_number() OVER (PARTITION BY h.host
                                      ORDER BY h.bucket, h.doc_id) AS rn
            FROM h JOIN c USING (host)
        )
        SELECT doc_id, host, n_host, rn <= {HOST_CAP} AS kept FROM r
    """,
    "pack_token_shards": f"""
        WITH b AS (
            SELECT doc_id,
                   CAST(coalesce(len(list_filter(string_split(text, ' '),
                                                 x -> len(x) > 0)), 0)
                        AS BIGINT) AS n_toks,
                   {_bucket_sql()} AS bucket
            FROM documents
        ), o AS (
            SELECT doc_id, n_toks,
                   CAST(coalesce(sum(n_toks) OVER (
                       ORDER BY bucket, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS tok_offset
            FROM b
        )
        SELECT doc_id, n_toks, tok_offset,
               tok_offset // {PACK_BUDGET} AS shard
        FROM o
    """,
}

QUERIES = {
    "host_cap_sample": host_cap_sample,
    "pack_token_shards": pack_token_shards,
}
