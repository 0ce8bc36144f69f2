"""The engine's declared query surface for the driver's correctness gate.

Each entry pairs a Spark DataFrame implementation with an equivalent ANSI
SQL string for the DuckDB oracle (run over the same parquet tables). Keys
map to SURVEY.md §2 operators (s*/p*/j*/w*/a*/o* prefixes), TPC-H-style
analytic queries (q*), and the beyond-reference training-data operators
(dedup_*, text_*, sim_*).

Rules for oracle parity (learned the hard way, encoded once here):
- Alias every computed column identically on both sides.
- Round float aggregates on both sides (ROUND(x, 2..6)) so accumulation
  order can't flip the value hash.
- Any top-k has a full deterministic tiebreak in its ORDER BY.
- Set-returning queries compare order-insensitively, so no ORDER BY needed
  for correctness — kept where it documents intent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from erigon_extract_spark import rotation
from erigon_extract_spark.operators.asof import as_of_join, state_at
from erigon_extract_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from erigon_extract_spark.operators.rangejoin import band_self_join
from erigon_extract_spark.operators.similarity import brute_force_topk, lsh_bucket_topk
from erigon_extract_spark.operators import text as tx
from erigon_extract_spark.operators.windows import (
    delta_encode,
    dedup_keep_first,
    rekey_first_block,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# per-artifact build serialization for _cached_artifact (see its docstring)
import threading as _threading  # noqa: E402

_ARTIFACT_LOCKS: dict = {}
_ARTIFACT_LOCKS_GUARD = _threading.Lock()


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped with nanosecond timestamps (which Spark's
    Parquet reader rejects without nanosAsLong) and with microsecond NTZ
    timestamps, depending on the generator version. Normalize either to
    TIMESTAMP — under a UTC session the values match DuckDB's TIMESTAMP
    exactly, so the oracle comparison stays value-identical."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    from erigon_extract_spark.sources.tables import normalize_event_ts

    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts left in its STORAGE form: ntz stays ntz; a legacy
    ns-bigint column becomes a timestamp via ``timestamp_micros`` (an
    epoch-valued constructor — timezone-independent). Unlike ``_events``,
    the value NEVER passes through a ``cast(ntz as timestamp)``, whose
    epoch shifts with ``spark.sql.session.timeZone``. Queries whose output
    depends on epoch DIFFERENCES (sessionize) must read through this
    loader so their results cannot vary with driver session config."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        from erigon_extract_spark.sources.tables import normalize_event_ts

        df = normalize_event_ts(df)  # bigint branch is TZ-independent
    return df


def _dsum(col) -> F.Column:
    """Order-independent float sum: per-row cast to DECIMAL(18,6), exact
    decimal addition, result back to double. Large double sums rounded to
    cents can flip on accumulation order alone (observed: one q9 group off
    by a cent between two runs of the SAME engine); decimal sums cannot.
    The SQL mirror is ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE), k).

    Scale 6 is load-bearing: every TPC-H money expression here has at most
    6 true decimal digits (price 2dp x discount 2dp x tax 2dp), so the
    double->decimal cast lands on an exactly-representable value and never
    sits on a rounding tie — at scale 4 the engines' tie-breaking modes
    disagreed (HALF_UP vs round-half-even) by a cent per ~10k rows.
    """
    return F.sum(col.cast("decimal(18,6)")).cast("double")


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _cached_artifact(sf_dir: str, src_table: str, family: str,
                     params: str, build) -> str:
    """Build-once artifact cache shared by the index/shard queries.

    The cache key fingerprints the source dataset CONTENT (path + size +
    mtime — a regenerated fixture invalidates it) AND the build
    ``params`` string, so changing build parameters can never silently
    serve an artifact built with the old ones (r5 review finding). The
    root is uid-scoped 0o700 so another user on a shared machine can
    neither pre-create nor read it. ``build(tmp_dir)`` materializes the
    artifact into ``tmp_dir``; it is atomically renamed into place, so a
    killed build never leaves a partial artifact at the final path. A
    failed rename is tolerated ONLY when the final artifact actually
    exists (a lost build race); any other failure re-raises instead of
    silently deleting the fresh build and querying nothing.

    Same-PROCESS concurrency is serialized per artifact: the gate mirror
    runs queries on a 6-thread pool, and when two queries share an
    artifact (the bucketed-table pair was the first), two threads
    building into a pid-keyed tmp dir stomp each other's in-flight write
    (observed as a FileNotFoundException inside the Spark file commit).
    A per-final-path lock makes the second thread wait and then find the
    finished artifact; the tmp suffix also carries the thread id so even
    un-serialized callers can never collide in-process. Cross-PROCESS
    races remain handled by the rename-race tolerance above."""
    import hashlib
    import os
    import tempfile
    import threading

    src = os.path.join(os.path.abspath(sf_dir), f"{src_table}.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|{family}|{params}".encode()
    ).hexdigest()[:16]
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_cache_{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    if os.stat(root).st_uid != os.getuid():
        raise RuntimeError(f"cache dir {root} owned by another user")
    final = os.path.join(root, f"{family}_{tag}")
    with _ARTIFACT_LOCKS_GUARD:
        lock = _ARTIFACT_LOCKS.setdefault(final, threading.Lock())
    with lock:
        if not os.path.isdir(final):
            tmp_dir = f"{final}.build.{os.getpid()}.{threading.get_ident()}"
            try:
                build(tmp_dir)
            except BaseException:
                # a failed build must not leak a partial .build.* dir
                # into the uid cache (one per retry, forever)
                import shutil

                shutil.rmtree(tmp_dir, ignore_errors=True)
                raise
            try:
                os.rename(tmp_dir, final)
            except OSError:
                import shutil

                shutil.rmtree(tmp_dir, ignore_errors=True)
                if not os.path.isdir(final):  # not a lost race — surface it
                    raise
    return final


# ---------------------------------------------------------------------------
# TPC-H-style analytic queries (generic surface, SURVEY.md §2.6/§2.7/§3)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(_dsum(F.col("l_extendedprice")), 2).alias("sum_base_price"),
            F.round(_dsum(disc_price), 2).alias("sum_disc_price"),
            F.round(_dsum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(
                _dsum(F.col("l_extendedprice")) / F.count("*"), 6
            ).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _load(spark, sf_dir, "lineitem")
    supp = _load(spark, sf_dir, "supplier")
    nation = _load(spark, sf_dir, "nation")
    region = _load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q6_revenue_change",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount
                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(_dsum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Operator-mapped queries (SURVEY.md §2 inventory, line by line)
# ---------------------------------------------------------------------------


@query(
    "s1_point_lookup",
    "SELECT r_regionkey, r_name FROM region WHERE r_name = 'ASIA'",
)
def s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1: SyncStage["Execution"] → value (erigon_extract.c:1435-1467):
    # point lookup into a tiny dimension.
    return (
        _load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey", "r_name")
    )


@query(
    "s2_range_scan",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-06-01' AND l_shipdate <= TIMESTAMP '1996-08-31'
    """,
)
def s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S2/S3/P5: cursor range scan ≡ pushed-down block-range predicate
    # (erigon_extract.c:1535-1558, 1598-1600). Projection prunes columns at
    # the parquet reader.
    li = _load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-08-31").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "j1_lookup_join",
    """
    SELECT p_brand,
           COUNT(*) AS n_items,
           ROUND(SUM(COALESCE(p_retailprice, 0.0) * l_quantity), 2) AS retail_value
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1: broadcast left-outer lookup join with null-tolerant fallback
    # (PlainCodeHash recovery, erigon_extract.c:262-292).
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.coalesce(F.col("p_retailprice"), F.lit(0.0)) * F.col("l_quantity")),
                2,
            ).alias("retail_value"),
        )
    )


@query(
    "j2_ordered_union",
    """
    SELECT * FROM (
      SELECT o_orderkey AS key, 0 AS kind, o_totalprice AS amount FROM orders
      UNION ALL
      SELECT l_orderkey AS key, 1 AS kind, l_extendedprice AS amount FROM lineitem
    )
    """,
)
def j2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2: ordered interleave of two sorted streams = unionByName with a kind
    # discriminator, account-before-storage (erigon_extract.c:1578-1596).
    orders = _load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.lit(0).alias("kind"),
        F.col("o_totalprice").alias("amount"),
    )
    li = _load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key"),
        F.lit(1).alias("kind"),
        F.col("l_extendedprice").alias("amount"),
    )
    return orders.unionByName(li)


@query(
    "j3_index_range_join",
    """
    WITH spans AS (
      SELECT l_orderkey AS key, MAX(l_linenumber) AS n FROM lineitem GROUP BY l_orderkey
    ),
    ids AS (
      SELECT key, UNNEST(generate_series(1, n)) AS l_linenumber FROM spans
    )
    SELECT ids.key AS orderkey, ids.l_linenumber AS linenumber,
           l.l_quantity AS quantity
    FROM ids JOIN lineitem l
      ON l.l_orderkey = ids.key AND l.l_linenumber = ids.l_linenumber
    """,
)
def j3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J3: 1:N index-range join — body (tx_index, tx_amount) joined to the tx
    # table over a generated contiguous id range (erigon_extract.c:1873-1965):
    # explode(sequence(...)) + equi-join.
    li = _load(spark, sf_dir, "lineitem")
    spans = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.max("l_linenumber").alias("n")
    )
    ids = spans.select(
        "key", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("ln")
    ).alias("ids")
    lia = li.alias("li")
    return ids.join(
        lia,
        (F.col("li.l_orderkey") == F.col("ids.key"))
        & (F.col("li.l_linenumber") == F.col("ids.ln")),
    ).select(
        F.col("ids.key").alias("orderkey"),
        F.col("ids.ln").alias("linenumber"),
        F.col("li.l_quantity").alias("quantity"),
    )


@query(
    "w1_delta_encode",
    """
    SELECT event_id, user_id,
           ROUND(value - COALESCE(LAG(value) OVER
                 (PARTITION BY user_id ORDER BY event_id), 0.0), 6) AS value_delta
    FROM events
    """,
)
def w1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1/W2: per-key delta encoding = lag window (erigon_extract.c:690-735).
    ev = _load(spark, sf_dir, "events")
    out = delta_encode(
        ev,
        key_cols=["user_id"],
        order_cols=["event_id"],
        value_col="value",
        out_col="value_delta",
        first_value=F.lit(0.0),
    )
    return out.select(
        "event_id", "user_id", F.round("value_delta", 6).alias("value_delta")
    )


@query(
    "w4_rekey_first_block",
    """
    SELECT user_id, event_id, event_type, value,
           COALESCE(LAG(event_id) OVER (PARTITION BY user_id ORDER BY event_id), 0)
             AS effective_from
    FROM events
    """,
)
def w4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W4: the load-bearing first-block re-keying (erigon_extract.c:2409-2433)
    # generalized: each version's key becomes the previous version's id.
    ev = _load(spark, sf_dir, "events")
    out = rekey_first_block(
        ev,
        key_cols=["user_id"],
        block_col="event_id",
        out_col="effective_from",
        drop_genesis=False,  # generic ids carry no genesis-entry semantics
    )
    return out.select("user_id", "event_id", "event_type", "value", "effective_from")


@query(
    "w6_dedup_first",
    """
    SELECT user_id, event_type, event_id, ts FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W6: canonical-chain dedup — keep first row per key by deterministic
    # order (fork blocks, erigon_extract.c:1852-1871). Raw loader: the
    # emitted ts stays ntz (stored wall-clock under any session config).
    ev = _events_raw(spark, sf_dir)
    return dedup_keep_first(ev, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id", "event_type", "event_id", "ts"
    )


@query(
    "asof_state_at",
    """
    SELECT user_id,
           MAX(event_id) AS event_id,
           ARG_MAX(event_type, event_id) AS event_type,
           ARG_MAX(value, event_id) AS value
    FROM events
    WHERE event_id <= 5000
    GROUP BY user_id
    """,
)
def asof_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The as-of query — the reference's raison d'être (README.md:37-41):
    # latest version per key at/before a point in version-time, via max_by.
    ev = _load(spark, sf_dir, "events")
    return state_at(
        ev,
        key_cols=["user_id"],
        version_col="event_id",
        as_of=5000,
        value_cols=["event_type", "value"],
    )


@query(
    "asof_join",
    """
    SELECT c.event_id, c.user_id, c.ts,
           p.event_id AS purchase_event_id, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.event_id <= c.event_id
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # As-of join: each click gets the user's latest not-after purchase.
    # Raw loader: the emitted ts column stays ntz, so collection yields the
    # stored wall-clock under ANY session config — structural parity with
    # the oracle's naive TIMESTAMP instead of relying on cast/render
    # round-tripping.
    ev = _events_raw(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return as_of_join(
        clicks,
        purchases,
        on=["user_id"],
        left_time="event_id",
        right_time="purchase_event_id",
        direction="backward",
    ).select("event_id", "user_id", "ts", "purchase_event_id", "purchase_value")


@query(
    "a1_counters",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def a1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1/A2: row counters per kind (erigon_extract.c:1627-1630, 1968-1972).
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "a3_uniqueness_check",
    """
    SELECT l_orderkey, l_linenumber, COUNT(*) AS n
    FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
    """,
)
def a3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A3: PK-uniqueness violation set (must be empty; reference aborts,
    # erigon_extract.c:2131-2157). Returned as a DataFrame so the driver
    # hashes the (empty) violation set.
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


@query(
    "o2_multi_column_sort",
    """
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def o2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O1/O2: the transpose sort contract — range-partition + in-partition
    # multi-column sort (erigon_extract.c:2102-2264). Values compare
    # equal regardless of order; the sort is exercised in the plan.
    orders = _load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        orders.repartitionByRange(8, "o_custkey", "o_orderdate")
        .sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )


@query(
    "topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "set_ops_nations",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _load(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return a.intersect(b)


@query(
    "rollup_order_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                 AS DOUBLE), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _load(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(_dsum(F.col("o_totalprice")), 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators (north star, BASELINE.json)
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS doc_id
    FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id")


# Shared DuckDB CTE chain: source table → 3-gram shingles → exact-jaccard
# pairs at threshold 0.2 (reused by the pair query, the cluster oracle, and
# the end-to-end curation oracle — parameterized on the source relation).
def _ngram_pair_ctes(src: str = "documents", materialized: bool = False) -> str:
    """``materialized=True`` tags every CTE in the chain AS MATERIALIZED —
    required whenever a downstream CTE references ``jpairs`` more than
    once (the CC oracles' symmetric ``edges``): DuckDB 1.0 inlines plain
    CTEs per reference, so without the tag the whole shingle self-join
    re-executes per copy and the combined memory pressure spilled >40 GB
    at sf1 where the single-copy chain needs ~15 s and no spill."""
    out = _NGRAM_PAIR_CTES_TMPL.replace("__SRC__", src)
    if materialized:
        for cte in ("words", "sh", "sizes", "inter", "jpairs"):
            out = out.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (")
    return out


_NGRAM_PAIR_CTES_TMPL = """words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM __SRC__
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
      FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    ),
    jpairs AS (
      SELECT doc_id_a, doc_id_b,
             ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
      FROM inter
        JOIN sizes sa ON sa.doc_id = doc_id_a
        JOIN sizes sb ON sb.doc_id = doc_id_b
      WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    )"""


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {_ngram_pair_ctes()}
    SELECT doc_id_a, doc_id_b, jaccard FROM jpairs
    """,
)
def dedup_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2)
    return out.select(
        "doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard")
    )


# Connected-component labels WITHOUT a transitive closure (VERDICT r10
# item 7 — the recursive-closure oracle's O(V*E) ``reach`` set exhausted
# disk at sf1 while the engine side finished fine). Label-SET
# propagation: seed every node with LEAST(u, min neighbor), then
# recursively flow a label l from node p to neighbor u whenever l < u.
# The recursion references itself exactly once (DuckDB's recursive-CTE
# constraint), runs to the TRUE fixpoint (no unrolled-round truncation
# to guard), and its accumulated state is (node, seen-label) pairs —
# labels only originate at local minima, so the set stays near-linear
# on clustered dup graphs instead of the closure's all-reachable-pairs.
# MIN per node over the set is exactly the component minimum: the
# component min m seeds itself (LEAST(m, nbrs) = m), propagates to every
# other node (m < u), and no label from outside the component ever
# enters. Expects a ``jpairs`` CTE upstream, tagged MATERIALIZED
# (``_ngram_pair_ctes(materialized=True)``) because ``edges`` reads it
# twice. Measured at sf1: 108 s bounded-spill vs the closure's >40 GB
# disk exhaustion.
_CC_LABELPROP_CTES = """edges AS MATERIALIZED (
      SELECT doc_id_a AS u, doc_id_b AS v FROM jpairs
      UNION
      SELECT doc_id_b AS u, doc_id_a AS v FROM jpairs
    ),
    lp AS (
      SELECT u, LEAST(u, MIN(v)) AS l FROM edges GROUP BY u
      UNION
      SELECT e.u, p.l
      FROM lp p JOIN edges e ON e.v = p.u
      WHERE p.l < e.u
    ),
    comp AS MATERIALIZED (
      SELECT u AS doc_id, MIN(l) AS cluster FROM lp GROUP BY u
    )"""


@query(
    "dedup_connected_clusters",
    f"""
    WITH RECURSIVE {_ngram_pair_ctes(materialized=True)},
    {_CC_LABELPROP_CTES}
    SELECT doc_id, cluster FROM comp
    UNION ALL
    SELECT d.doc_id, d.doc_id AS cluster
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution over the near-dup pair graph: every doc labeled
    with the smallest doc id reachable through jaccard>=0.2 pairs
    (singletons label themselves). Spark side: iterative min-label
    propagation (operators/graph.py); oracle: recursive label-set
    propagation to the exact fixpoint (_CC_LABELPROP_CTES) — the same
    component minima, independently computed, with near-linear state
    instead of the former transitive closure's O(V*E) pair set (which
    exhausted disk at sf1)."""
    from erigon_extract_spark.operators.graph import dedup_clusters

    docs = _load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2)
    return dedup_clusters(pairs, all_ids=docs).select("doc_id", "cluster")


@query(
    "graph_components_star",
    """
    WITH RECURSIVE base AS (
      SELECT DISTINCT o_custkey % 500 AS a, (o_custkey * 7 + 3) % 500 AS b
      FROM orders
    ),
    edges AS (
      SELECT a AS u, b AS v FROM base
      UNION
      SELECT b AS u, a AS v FROM base
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS node, LEAST(u, MIN(v)) AS component
    FROM reach GROUP BY u
    """,
)
def graph_components_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via the alternating large-star/small-star
    scheme (operators/graph.py method="star", Kiveris et al. 2014 —
    O(log n) rounds on ANY topology) over a deliberately long-chained
    graph: the functional graph x — (7x+3) mod 500 on customer-key
    residues, whose components are cycles with long attached chains —
    the diameter >> log n regime the method exists for (min-label
    propagation is pytest-pinned to need strictly more rounds here).
    Oracle: recursive transitive closure, the same fixpoint computed
    independently."""
    from erigon_extract_spark.operators.graph import connected_components

    orders = _load(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % 500).alias("doc_id_a"),
        ((F.col("o_custkey") * 7 + 3) % 500).alias("doc_id_b"),
    ).distinct()
    return connected_components(edges, max_iter=40, method="star")




@query(
    "corpus_curation_keep_list",
    f"""
    WITH RECURSIVE e AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    ),
    docs_e AS (
      SELECT d.doc_id, d.text FROM documents d JOIN e USING (doc_id)
    ),
    {_ngram_pair_ctes("docs_e", materialized=True)},
    {_CC_LABELPROP_CTES},
    kept AS (
      SELECT e.doc_id FROM e LEFT JOIN comp c USING (doc_id)
      WHERE c.doc_id IS NULL OR c.cluster = e.doc_id
    )
    SELECT doc_id,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM kept
    """,
)
def corpus_curation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus curation pipeline as ONE composed
    plan: exact dedup (md5 winner) → near-dup pair graph (exact jaccard,
    prefix-filtered) → connected-component cluster resolution → keep the
    smallest-id representative per cluster → stable train/val/test split.
    Every stage's semantics are independently re-derived by the oracle
    (md5 grouping, recursive closure, hash-bucket split), so the COMPOSED
    keep-list membership — what a 100 TB curation job actually ships — is
    value-hash-verified, not just the stages in isolation."""
    from erigon_extract_spark.operators.graph import dedup_clusters
    from erigon_extract_spark.operators.sampling import stable_split

    docs = _load(spark, sf_dir, "documents")
    survivors = exact_dedup(docs)
    pairs = ngram_jaccard_pairs(survivors, shingle_n=3, threshold=0.2)
    clusters = dedup_clusters(pairs, all_ids=survivors)
    kept = clusters.filter(F.col("doc_id") == F.col("cluster")).select("doc_id")
    return stable_split(kept, "doc_id").select("doc_id", "split")


@query(
    "multimodal_resize",
    """
    WITH payload AS (
      SELECT doc_id, regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS s
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   regexp_split_to_array(substring(s, 1, 64), ''),
                   c -> CAST(unicode(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) & 2147483647) AS hv
      FROM payload
    )
    SELECT doc_id, 'image/png' AS mime,
           CAST(224 AS INTEGER) AS target_w, CAST(224 AS INTEGER) AS target_h,
           '000000E0' || '000000E0' || lpad(to_hex(hv), 8, '0') AS payload_hex
    FROM h
    """,
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing through the real Arrow-batched kernel
    (payload-in/payload-out mapInPandas): the stubbed pixel op emits
    dims-header + content digest, which the oracle rebuilds byte-for-byte
    as hex — so batching, schema, and the digest fold are value-verified;
    swapping PIL in changes only the inner function."""
    from erigon_extract_spark.operators.multimodal import resize_images

    docs = _load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.lit("image/png").alias("mime"),
        F.encode(
            F.regexp_replace(F.col("text"), r"[^\x20-\x7e]", ""), "utf-8"
        ).alias("payload"),
    )
    out = resize_images(media, target_w=224, target_h=224, fake_decode=True)
    return out.select(
        "doc_id", "mime", "target_w", "target_h",
        F.hex("payload").alias("payload_hex"),
    )


# The murmur3/xxhash64 fast-path variants (minhash_lsh_candidates,
# simhash_near_pairs) are deliberately NOT registered as gate queries:
# their hashes have no DuckDB counterpart, so a registry row could only
# ever be a weak rows-only check, while the md5-portable variants below
# carry full value-hash oracles over the SAME plan shape. The fast paths
# stay the production default and are pytest-pinned (tests/test_dedup.py)
# and benched (dedup_scale drives minhash_lsh_candidates at 200k docs).


@query(
    "text_stats",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS token_count,
           ROUND((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                 / length(text), 6) AS digit_ratio,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        tx.token_count(c).alias("token_count"),
        F.round(tx.digit_ratio(c), 6).alias("digit_ratio"),
        F.md5(tx.normalize_text(c)).alias("fingerprint"),
    )


@query(
    "text_lang_quality",  # language votes + quality components, oracle-matched
    """
    WITH toks AS (
      SELECT doc_id, lang,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents
    )
    SELECT doc_id, lang,
           len(list_filter(w, t -> list_contains(
             ['the','and','of','to','in','is','that','it','for','was'], t))) AS en_hits,
           len(w) AS n_tokens
    FROM toks
    """,
)
def text_lang_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    toks = F.split(tx.normalize_text(F.col("text")), " ")
    markers = F.array(
        *[F.lit(m) for m in ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"]]
    )
    return docs.select(
        "doc_id",
        "lang",
        F.size(F.filter(toks, lambda t: F.array_contains(markers, t))).alias("en_hits"),
        F.size(toks).alias("n_tokens"),
    )


@query(
    "sim_bruteforce_topk",
    """
    WITH probes AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pvec
      FROM embeddings WHERE vec_id < 5
    ),
    vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pairs AS (
      -- DOUBLE[] so DuckDB accumulates in float64, matching Spark's
      -- double-precision left-fold exactly (float32 accumulation differs
      -- at ~1e-7 and flips 6-decimal rounding)
      SELECT p.probe_id, e.vec_id,
             list_dot_product(e.v, p.pvec)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(p.pvec, p.pvec))) AS cos_raw
      FROM vecs e CROSS JOIN probes p
    )
    SELECT probe_id, vec_id, ROUND(cos_raw, 6) AS cosine FROM (
      SELECT probe_id, vec_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY cos_raw DESC, vec_id) AS rn
      FROM pairs
    ) WHERE rn <= 10
    """,
)
def sim_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id",
        # double products match the oracle's DOUBLE[] accumulation exactly;
        # float32 products can flip both 6-decimal rounding and near-tie
        # top-k ordering
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = brute_force_topk(emb, probes, k=10)
    return out.select("probe_id", "vec_id", F.round("cosine", 6).alias("cosine"))


def _lsh_topk_oracle_sql(dim: int = 64, n_planes: int = 6) -> str:
    """The hyperplane-LSH search is fully deterministic (LCG planes), so
    the WHOLE approximate path — sign-bit bucketing, bucket equi-join,
    in-bucket cosine top-k — is SQL-expressible: the plane constants embed
    as DOUBLE[] literals (Python repr round-trips to the identical float64
    in DuckDB)."""
    from erigon_extract_spark.operators.similarity import _hyperplane

    bits = []
    for p in range(n_planes):
        plane = "[" + ", ".join(repr(x) for x in _hyperplane(dim, p + 1)) + "]"
        bits.append(
            f"CASE WHEN list_dot_product(v, {plane}) >= 0 "
            f"THEN {1 << p} ELSE 0 END"
        )
    bucket = "\n             + ".join(bits)
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sig AS (
      SELECT vec_id, v,
             ({bucket}) AS bucket
      FROM vecs
    ),
    probes AS (
      SELECT vec_id AS probe_id, v AS pvec, bucket
      FROM sig WHERE vec_id < 5
    ),
    pairs AS (
      SELECT p.probe_id, s.vec_id,
             list_dot_product(s.v, p.pvec)
               / (sqrt(list_dot_product(s.v, s.v))
                  * sqrt(list_dot_product(p.pvec, p.pvec))) AS cos_raw
      FROM sig s JOIN probes p USING (bucket)
    )
    SELECT probe_id, vec_id, ROUND(cos_raw, 6) AS cosine FROM (
      SELECT probe_id, vec_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY cos_raw DESC, vec_id) AS rn
      FROM pairs
    ) WHERE rn <= 10
    """


def _recall_oracle_sql(dim: int = 64, n_planes: int = 6, k: int = 10) -> str:
    """Recall@k of the LSH path against the exact path — BOTH are
    SQL-expressible (the hyperplane constants embed as DOUBLE[] literals,
    see _lsh_topk_oracle_sql), so even the evaluation harness is under
    the differential hash gate."""
    from erigon_extract_spark.operators.similarity import _hyperplane

    bits = []
    for p in range(n_planes):
        plane = "[" + ", ".join(repr(x) for x in _hyperplane(dim, p + 1)) + "]"
        bits.append(
            f"CASE WHEN list_dot_product(v, {plane}) >= 0 "
            f"THEN {1 << p} ELSE 0 END"
        )
    bucket = "\n             + ".join(bits)
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sig AS (
      SELECT vec_id, v,
             ({bucket}) AS bucket
      FROM vecs
    ),
    probes AS (
      SELECT vec_id AS probe_id, v AS pvec, bucket
      FROM sig WHERE vec_id < 5
    ),
    exact AS (
      SELECT probe_id, vec_id FROM (
        SELECT p.probe_id, s.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.probe_id
                 ORDER BY list_dot_product(s.v, p.pvec)
                            / (sqrt(list_dot_product(s.v, s.v))
                               * sqrt(list_dot_product(p.pvec, p.pvec)))
                            DESC,
                          s.vec_id) AS rn
        FROM vecs s CROSS JOIN probes p
      ) WHERE rn <= {k}
    ),
    approx AS (
      SELECT probe_id, vec_id FROM (
        SELECT p.probe_id, s.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.probe_id
                 ORDER BY list_dot_product(s.v, p.pvec)
                            / (sqrt(list_dot_product(s.v, s.v))
                               * sqrt(list_dot_product(p.pvec, p.pvec)))
                            DESC,
                          s.vec_id) AS rn
        FROM sig s JOIN probes p USING (bucket)
      ) WHERE rn <= {k}
    ),
    n_exact AS (
      SELECT probe_id, COUNT(*) AS n_exact FROM exact GROUP BY probe_id
    ),
    hits AS (
      SELECT e.probe_id, COUNT(*) AS n_hits
      FROM exact e JOIN approx a
        ON a.probe_id = e.probe_id AND a.vec_id = e.vec_id
      GROUP BY e.probe_id
    )
    SELECT probe_id, n_exact,
           COALESCE(n_hits, 0) AS n_hits,
           ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE)
                 / CAST(n_exact AS DOUBLE), 6) AS recall
    FROM n_exact LEFT JOIN hits USING (probe_id)
    """


@query("sim_recall_eval", _recall_oracle_sql())
def sim_recall_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation under the hash gate (operators/similarity.
    ann_recall_report): per-probe recall@10 of the LSH bucket path against
    the exact brute-force top-k — the measurement that decides whether an
    index configuration is trustworthy before it serves a corpus. Both
    paths are deterministic, so the WHOLE evaluation (exact ranking, LSH
    bucketing with embedded plane literals, intersection counting) is
    differential-hash-checked, not just eyeballed. The recall ratio is a
    quotient of small integers — exact in both engines."""
    from erigon_extract_spark.operators.similarity import (
        ann_recall_report,
        brute_force_topk,
        lsh_bucket_topk,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = brute_force_topk(emb, probes, k=10)
    approx = lsh_bucket_topk(emb, probes, dim=64, k=10, n_planes=6)
    out = ann_recall_report(exact, approx)
    return out.select(
        "probe_id", "n_exact", "n_hits",
        F.round("recall", 6).alias("recall"),
    )


@query("sim_lsh_topk", _lsh_topk_oracle_sql())
def sim_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via hyperplane-LSH bucketing — the sublinear scale
    path for similarity search, now under the hash gate end to end (the
    oracle reproduces the plane projections, bucket assignment, bucket
    join, and in-bucket ranking)."""
    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id",
        # float64 products to match the oracle's DOUBLE[] accumulation
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = lsh_bucket_topk(emb, probes, dim=64, k=10, n_planes=6)
    return out.select("probe_id", "vec_id", F.round("cosine", 6).alias("cosine"))


# ---------------------------------------------------------------------------
# Additional generic-surface coverage (SURVEY.md §2.13 gaps: semi/anti,
# scalar library, pivot, running windows, prune filter)
# ---------------------------------------------------------------------------


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "p6_prune_filter",
    """
    SELECT event_id, user_id, ts FROM events
    WHERE ts >= (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
    """,
)
def p6_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P6: pruned mode keeps only the trailing window of history
    # (latest - 90000 + 1, erigon_extract.c:2721-2726) — here the trailing
    # 7 days of events. The scalar bound broadcasts; the filter pushes down.
    # Raw loader: ntz interval math + emitted ts, session-independent.
    ev = _events_raw(spark, sf_dir)
    bound = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("__cutoff")
    )
    return (
        ev.crossJoin(F.broadcast(bound))
        .filter(F.col("ts") >= F.col("__cutoff"))
        .select("event_id", "user_id", "ts")
    )


@query(
    "scalar_surface",
    """
    SELECT l_orderkey, l_linenumber,
           year(l_shipdate) AS ship_year,
           month(l_shipdate) AS ship_month,
           upper(l_returnflag) || '-' || lower(l_linestatus) AS tag,
           length(l_returnflag) AS flag_len,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
           substr(l_returnflag || l_linestatus, 1, 1) AS first_char
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        F.concat(
            F.upper("l_returnflag"), F.lit("-"), F.lower("l_linestatus")
        ).alias("tag"),
        F.length("l_returnflag").alias("flag_len"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_bucket"),
        F.substring(F.concat("l_returnflag", "l_linestatus"), 1, 1).alias(
            "first_char"
        ),
    )


@query(
    "pivot_status_qty",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .sum("l_quantity")
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("F"), 2).alias("F"),
        F.round(F.col("O"), 2).alias("O"),
    )


@query(
    "w_running_sum",
    """
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS UNBOUNDED PRECEDING), 6) AS running_value
    FROM events
    """,
)
def w_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The delta-decode frame: running accumulator per key
    # (rowsBetween(unboundedPreceding, currentRow) — reference W1 decode).
    ev = _load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


# Quality-score oracle as a reusable CTE fragment: (doc_id, quality) in
# ``tq``. Float op order mirrors the Spark expressions exactly — ratio
# first, then scale ((a/n)*k, not (a*k)/n) — so doubles match to the last
# bit; shared by text_quality_score and dedup_keep_best_quality.
_QUALITY_CTES = """
    tq_t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                         x -> len(x) > 0) AS w
      FROM documents
    ),
    tq_c AS (
      SELECT doc_id,
        least(length(text) / 500.0, 1.0) AS length_ok,
        1.0 - least(((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
                    * 1.0 / length(text)) * 4, 1.0) AS low_punct,
        1.0 - least(((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                    * 1.0 / length(text)) * 5, 1.0) AS low_digit,
        CASE WHEN len(w) = 0 THEN 0.0
             ELSE list_aggregate(list_transform(w, x -> len(x)), 'sum')
                  * 1.0 / len(w) END AS wl,
        CASE WHEN len(w) = 0 THEN 0.0
             ELSE least((len(list_filter(w, t2 -> list_contains(
               ['the','and','of','to','in','is','that','it','for','was'], t2)))
               * 1.0 / len(w)) * 3, 1.0) END AS sw
      FROM tq_t
    ),
    tq AS (
      SELECT doc_id,
             length_ok * 0.3 + low_punct * 0.2 + low_digit * 0.2
             + (CASE WHEN wl >= 3 AND wl <= 10 THEN 1.0 ELSE 0.5 END) * 0.15
             + sw * 0.15 AS quality
      FROM tq_c
    )
"""


@query(
    "text_lang_id_vote",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(
               string_split_regex(lower(text), '[^a-z0-9'']+'),
               x -> len(x) > 0) AS w
      FROM documents
    ),
    votes AS (
      SELECT doc_id, lang,
        len(list_filter(w, t -> list_contains(
          ['the','and','of','to','in','is','that','it','for','was'], t))) AS en,
        len(list_filter(w, t -> list_contains(
          ['der','die','und','das','ist','nicht','ein','mit','auf','zu'], t))) AS de,
        len(list_filter(w, t -> list_contains(
          ['le','la','les','et','de','un','une','est','que','pour'], t))) AS fr,
        len(list_filter(w, t -> list_contains(
          ['el','la','los','de','que','y','en','un','una','es'], t))) AS es
      FROM toks
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                WHEN de >= fr AND de >= es THEN 'de'
                WHEN fr >= es THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM votes
    """,
)
def text_lang_vote_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NB: the engine's word_tokens uses \p{L}\p{N}; this corpus is ASCII so
    # the [a-z0-9'] oracle class is equivalent. Tie-break order en>de>fr>es
    # matches operators.text.lang_id (earlier language wins ties).
    docs = _load(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", tx.lang_id(F.col("text")).alias("lang_pred"))


@query(
    "text_quality_score",
    f"""
    WITH {_QUALITY_CTES}
    SELECT doc_id, ROUND(quality, 6) AS quality FROM tq
    """,
)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(tx.quality_score(F.col("text")), 6).alias("quality")
    )


@query(
    "dedup_keep_best_quality",
    f"""
    WITH RECURSIVE {_ngram_pair_ctes()},
    edges AS (
      SELECT doc_id_a AS u, doc_id_b AS v FROM jpairs
      UNION
      SELECT doc_id_b AS u, doc_id_a AS v FROM jpairs
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster FROM reach GROUP BY u
    ),
    clusters AS (
      SELECT doc_id, cluster FROM comp
      UNION ALL
      SELECT d.doc_id, d.doc_id AS cluster
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
      WHERE c.doc_id IS NULL
    ),
    {_QUALITY_CTES},
    ranked AS (
      SELECT cl.cluster, cl.doc_id, q.quality,
             ROW_NUMBER() OVER (PARTITION BY cl.cluster
                                ORDER BY q.quality DESC, cl.doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY cl.cluster) AS n_members
      FROM clusters cl JOIN tq q ON q.doc_id = cl.doc_id
    )
    SELECT cluster, doc_id AS keep_doc_id,
           ROUND(quality, 6) AS quality,
           n_members
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster representative selection: resolve near-dup
    clusters (graph.py min-label propagation), then keep the HIGHEST-
    quality member per cluster (ties → smallest doc_id) — what a real
    curation pass does, vs the keep-first policy of
    corpus_curation_keep_list. Ordering uses the unrounded quality double
    (bit-identical expressions on both engines)."""
    from erigon_extract_spark.operators.graph import dedup_clusters

    docs = _load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2)
    cl = dedup_clusters(pairs, all_ids=docs).select("doc_id", "cluster")
    quality = docs.select(
        "doc_id", tx.quality_score(F.col("text")).alias("__q")
    )
    j = cl.join(quality, "doc_id")
    w = Window.partitionBy("cluster").orderBy(
        F.col("__q").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("cluster")
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc))
        .filter(F.col("__rn") == 1)
        .select(
            "cluster",
            F.col("doc_id").alias("keep_doc_id"),
            F.round("__q", 6).alias("quality"),
            "n_members",
        )
    )


# Both sides of the sessionize pair work on integer epoch-MICROSECONDS
# computed straight from the stored value: Spark via timestampdiff on the
# ntz column (never a session-TZ cast — see session_tick_micros), DuckDB
# via epoch_us on the naive timestamp. A µs tick is exact integer math on
# both engines and invariant to any driver session configuration.
_SESSIONIZE_TICK_SQL = """
    WITH e AS (
      -- epoch_ns // 1000 is EXPLICIT truncation: exact for µs files, and
      -- for a legacy ns file it matches Spark's `ts div 1000` regardless
      -- of whether the engine's ns→µs CAST truncates or rounds
      SELECT user_id, event_id,
             epoch_ns(ts) // 1000 AS tick_micros
      FROM events
    ),
    g AS (
      SELECT user_id, event_id, tick_micros,
             CASE WHEN LAG(tick_micros) OVER w IS NULL
                       OR tick_micros - LAG(tick_micros) OVER w
                          > CAST(3600 AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tick_micros, event_id)
    )
"""


@query(
    "sessionize_events",
    _SESSIONIZE_TICK_SQL
    + """
    SELECT user_id, event_id,
           -- CAST: DuckDB widens window SUM over integers to HUGEINT
           -- (int128), which the driver's pandas canonicalizer hashes
           -- differently from Spark's int64 (VERDICT r3 root cause).
           CAST(SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY tick_micros, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
    FROM g
    """,
)
def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from erigon_extract_spark.operators.windows import sessionize

    ev = _events_raw(spark, sf_dir)
    out = sessionize(
        ev, ["user_id"], "ts", gap_seconds=3600, tiebreak_cols=["event_id"]
    )
    return out.select("user_id", "event_id", "session_id")


@query(
    "sessionize_debug",
    _SESSIONIZE_TICK_SQL
    + """
    SELECT user_id, event_id, tick_micros, is_new FROM g
    """,
)
def sessionize_debug_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-localizing companion to sessionize_events: emits the raw tick
    and the session-start mark so a gate mismatch pins down WHICH stage
    diverges (tick extraction vs gap comparison vs running sum) in the
    correctness file itself, rather than needing a repro session."""
    from erigon_extract_spark.operators.windows import sessionize_marks

    ev = _events_raw(spark, sf_dir)
    out = sessionize_marks(
        ev, ["user_id"], "ts", gap_seconds=3600, tiebreak_cols=["event_id"]
    )
    return out.select("user_id", "event_id", "tick_micros", "is_new")


# --- corpus curation signals (C4/Gopher-class rules) ----------------------

# The synthetic documents carry no PII, so both engines append the SAME
# deterministic contact suffix before scrubbing — the redaction is then
# demonstrably active and the whole transform sits under the hash gate.
_PII_SYNTH_SQL = (
    "concat(COALESCE(text, ''), ' contact user', CAST(doc_id AS VARCHAR), "
    "'@example.com from 10.0.', CAST(doc_id % 256 AS VARCHAR), "
    "'.7 call +1 555-01', lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'))"
)


@query(
    "text_pii_scrub",
    f"""
    WITH synth AS (
      SELECT doc_id, {_PII_SYNTH_SQL} AS text FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
             '\\+\\d[\\d\\- ]{{7,}}\\d', '<PHONE>', 'g') AS scrubbed,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
           len(regexp_extract_all(text,
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ips,
           len(regexp_extract_all(text, '\\+\\d[\\d\\- ]{{7,}}\\d')) AS n_phones
    FROM synth
    """,
)
def text_pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, IPv4s, phones) as pure codegen'd regexp
    expressions — the curation pass every corpus release runs. Patterns
    live in the common Java-regex/RE2 subset so the oracle mirrors them
    verbatim (operators/curation.py)."""
    from erigon_extract_spark.operators.curation import scrub_pii

    docs = _load(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("text"),
    )
    out = scrub_pii(synth)
    return out.select("doc_id", "scrubbed", "n_emails", "n_ips", "n_phones")


# word → distinct 5-gram shingle fragment, identical to the (twice
# hash-verified) minhash-portable oracle's construction
_SHINGLE5_SQL = """
    words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 4), ' ') AS sh
      FROM words,
           UNNEST(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
      WHERE length(array_to_string(list_slice(w, i, i + 4), ' ')) > 0
    )
"""


@query(
    "curation_decontaminate",
    f"""
    WITH {_SHINGLE5_SQL},
    bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 25),
    corp AS (SELECT * FROM sh WHERE doc_id >= 25),
    tot AS (
      SELECT doc_id, COUNT(*) AS total_shingles FROM corp GROUP BY doc_id
    ),
    shared AS (
      SELECT c.doc_id, COUNT(*) AS shared_shingles
      FROM corp c JOIN bench b USING (sh) GROUP BY c.doc_id
    )
    SELECT t.doc_id,
           COALESCE(s.shared_shingles, 0) AS shared_shingles,
           t.total_shingles,
           ROUND(COALESCE(s.shared_shingles, 0) * 1.0 / t.total_shingles, 6)
             AS overlap_ratio,
           CAST(COALESCE(s.shared_shingles, 0) * 1.0 / t.total_shingles >= 0.2
                AS INTEGER) AS contaminated
    FROM tot t LEFT JOIN shared s ON s.doc_id = t.doc_id
    """,
)
def curation_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs 0-24 stand in for the eval set, the
    rest are the corpus; per corpus doc, the fraction of its distinct
    5-gram shingles that appear in the benchmark. The benchmark shingle
    set broadcasts (it is always the tiny side at 100 TB) — the corpus is
    never shuffled on shingles."""
    from erigon_extract_spark.operators.curation import decontaminate_against

    docs = _load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 25)
    corpus = docs.filter(F.col("doc_id") >= 25)
    return decontaminate_against(corpus, bench, shingle_n=5, threshold=0.2)


@query(
    "text_repetition_ratio",
    """
    WITH words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id, len(w) AS nw,
             CASE WHEN len(w) >= 3 THEN
               len(list_distinct(list_transform(
                 generate_series(1, len(w) - 2),
                 i -> array_to_string(list_slice(w, i, i + 2), ' '))))
             ELSE 0 END AS nd
      FROM words
    )
    SELECT doc_id,
           CAST(greatest(nw - 2, 0) AS BIGINT) AS total_3grams,
           CAST(nd AS BIGINT) AS distinct_3grams,
           ROUND(CASE WHEN nw >= 3 THEN 1.0 - nd * 1.0 / (nw - 2)
                      ELSE 0.0 END, 6) AS repetition_ratio
    FROM g
    """,
)
def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate 3-gram fraction per document (Gopher-style repetition
    filter) — per-row array math, codegen'd, shuffle-free."""
    from erigon_extract_spark.operators.curation import repetition_ratio

    docs = _load(spark, sf_dir, "documents")
    return repetition_ratio(docs, n=3)


@query(
    "pack_sequences",
    """
    WITH t AS (
      SELECT doc_id, ((doc_id % 8) + 8) % 8 AS shard,
             CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END
               AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS cum_excl
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           -- CAST: window SUM widens to HUGEINT in DuckDB; the driver's
           -- canonicalizer hashes int128 differently from int64.
           CAST(cum_excl // 2048 AS BIGINT) AS chunk_id,
           CAST(cum_excl % 2048 AS BIGINT) AS chunk_offset
    FROM c
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/packing.py): per doc,
    the 2048-token context chunk and offset where its tokens begin, packed
    per shard in doc_id order — the loader-side contract for building
    fixed-length training examples."""
    from erigon_extract_spark.operators.packing import pack_sequences

    docs = _load(spark, sf_dir, "documents")
    return pack_sequences(docs, context_tokens=2048, n_shards=8)


@query(
    "pack_length_buckets",
    """
    WITH t AS (
      SELECT doc_id, ((doc_id % 4) + 4) % 4 AS shard,
             greatest(CASE WHEN text IS NULL OR length(trim(text)) = 0
                           THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+'))
                      END, 1) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, shard,
             CAST(length(to_base(n_tokens, 2)) - 1 AS BIGINT) AS band
      FROM t
    ),
    r AS (
      SELECT doc_id, n_tokens, shard, band,
             greatest(1, 512 >> CAST(band + 1 AS INTEGER)) AS per_batch,
             ROW_NUMBER() OVER (PARTITION BY band, shard
                                ORDER BY doc_id) AS rn
      FROM b
    ),
    x AS (
      SELECT doc_id, n_tokens, band, shard,
             CAST((rn - 1) // per_batch AS BIGINT) AS batch_idx
      FROM r
    )
    SELECT doc_id, n_tokens, band, shard, batch_idx,
           CAST(COUNT(*) OVER (PARTITION BY band, shard, batch_idx)
                AS BIGINT) AS batch_size,
           MAX(n_tokens) OVER (PARTITION BY band, shard, batch_idx)
             AS batch_max_tokens
    FROM x
    """,
)
def pack_length_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split packing via length-bucketed dynamic batching
    (operators/packing.length_bucket_batches): power-of-two length bands,
    per-(band, shard) batches sized batch_tokens/band-ceiling, padding
    waste bounded under 50% by construction. The regime where
    concat-and-chunk is wrong (SFT/eval examples must not cross context
    boundaries). Integer-exact bands (base-2 digit count, no float log2)
    keep the full assignment — batch membership, sizes, maxima —
    hash-identical across engines."""
    from erigon_extract_spark.operators.packing import length_bucket_batches

    docs = _load(spark, sf_dir, "documents")
    return length_bucket_batches(docs, batch_tokens=512, n_shards=4)


@query(
    "corpus_mixture_sample",
    """
    WITH rated AS (
      SELECT doc_id, source,
             100 + 50 * (CAST(substr(source, 4) AS INTEGER) % 10)
               AS rate_permille,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 1000 AS bucket
      FROM documents
    )
    SELECT source,
           first(rate_permille) AS rate_permille,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM rated
    WHERE bucket < rate_permille
    GROUP BY source
    """,
)
def corpus_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixing subsample (operators/sampling.mixture_sample): each
    source gets a per-mille keep rate (derived from its name here; a real
    run supplies trained mixture weights), membership decided by the same
    stable md5 bucket the split operator uses. The id_checksum puts the
    MEMBERSHIP under the hash gate, not just the counts."""
    from erigon_extract_spark.operators.sampling import mixture_sample

    docs = _load(spark, sf_dir, "documents")
    rate = 100 + 50 * (F.substring("source", 4, 10).cast("int") % 10)
    kept = mixture_sample(
        docs.withColumn("rate_permille", rate), "doc_id", F.col("rate_permille")
    )
    return kept.groupBy("source").agg(
        F.first("rate_permille").cast("int").alias("rate_permille"),
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
    )


@query(
    "dedup_embedding_cosine",
    """
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= 0.35
    """,
)
def dedup_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force; the LSH-bucketed
    variant in operators.similarity is the 100 TB path — this exact version
    is the verification oracle)."""
    from erigon_extract_spark.operators.similarity import cosine_prenorm, l2_norm

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id",
        # float64 products to match the oracle's DOUBLE[] accumulation —
        # float32 products differ at ~1e-7 and flip 6-decimal rounding
        F.col("embedding").cast("array<double>").alias("embedding"),
    ).withColumn("norm", l2_norm(F.col("embedding")))
    a = emb.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("embedding").alias("va"),
        F.col("norm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("embedding").alias("vb"),
        F.col("norm").alias("nb"),
    )
    # The theta join plans as BroadcastNestedLoopJoin with b broadcast and
    # a streamed; a small embeddings parquet arrives as ONE scan partition,
    # so without this repartition the whole O(n^2) pair loop runs as a
    # single task (measured: 240 s at sf0.1 on one core; 32-way it is
    # seconds, and the r10 sf1 sweep ground a single task for 25+ min).
    # Parallelism hygiene only — pair SET and values are unchanged.
    pairs = a.repartition(32).join(b, F.col("vec_id_a") < F.col("vec_id_b"))
    cos = cosine_prenorm(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        pairs.withColumn("__cos", cos)
        .filter(F.col("__cos") >= 0.35)
        .select("vec_id_a", "vec_id_b", F.round("__cos", 6).alias("cosine"))
    )


# HLL sketch values are engine-specific, so the oracle can't reproduce
# approx_parts — instead the ERROR BOUND rides through the value hash
# (VERDICT r4 #5): Spark's HLL++ is deterministic for a fixed dataset
# (register maxes are order-free), so the boolean is stable, and the
# exact side is fully hash-gated.
@query(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.1 * F.col("exact_parts")
        ).alias("approx_within_10pct"),
    )


def _u256_limb_sql() -> str:
    """DuckDB oracle for 256-bit add/sub: no 256-bit type exists there, so
    the oracle does SCHOOLBOOK LIMB ARITHMETIC — eight 32-bit limbs parsed
    from hex, carry/borrow chains via lateral column aliases, recomposed to
    64 hex chars. Independently validated against Python bigints on 200
    random pairs; mirrors the reference's byte-wise carry kernels
    (erigon_extract.c:665-688) in pure ANSI-ish SQL."""
    parts = []
    for x in ("a", "b"):
        for i in range(8):
            parts.append(
                f"('0x' || substr({x}_hex, {i * 8 + 1}, 8))::BIGINT AS {x}{i}"
            )
    carry = "0"
    for i in range(7, -1, -1):
        parts.append(f"a{i} + b{i} + {carry} AS s{i}")
        parts.append(f"s{i} % 4294967296 AS so{i}")
        carry = f"(s{i} // 4294967296)"
    borrow = "0"
    for i in range(7, -1, -1):
        parts.append(f"a{i} - b{i} - {borrow} AS d{i}")
        parts.append(
            f"((d{i} % 4294967296) + 4294967296) % 4294967296 AS do{i}"
        )
        borrow = f"(CASE WHEN d{i} < 0 THEN 1 ELSE 0 END)"
    chain = ",\n           ".join(parts)
    sum_hex = " || ".join(f"lpad(to_hex(so{i}), 8, '0')" for i in range(8))
    diff_hex = " || ".join(f"lpad(to_hex(do{i}), 8, '0')" for i in range(8))
    return f"""
    WITH src AS (
      SELECT p_partkey,
             upper(md5(p_name) || md5(p_name)) AS a_hex,
             upper(md5(p_brand) || md5(p_type)) AS b_hex
      FROM part
    ),
    limbs AS (
      SELECT p_partkey,
           {chain}
      FROM src
    )
    SELECT p_partkey, {sum_hex} AS sum_hex, {diff_hex} AS diff_hex
    FROM limbs
    """


@query("u256_arithmetic", _u256_limb_sql())
def u256_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic u256 math over synthesized 32-byte values (md5‖md5 of
    # part names) — the balance-delta kernel (reference W3/F5,
    # erigon_extract.c:665-688) as a distributed column op. The oracle
    # re-implements it as 32-bit limb arithmetic in SQL (_u256_limb_sql).
    from erigon_extract_spark.functions.u256 import u256_add, u256_sub

    part = _load(spark, sf_dir, "part")
    a = F.unhex(F.concat(F.md5(F.col("p_name")), F.md5(F.col("p_name"))))
    b = F.unhex(F.concat(F.md5(F.col("p_brand")), F.md5(F.col("p_type"))))
    out = part.select(
        "p_partkey", a.alias("a"), b.alias("b")
    ).select(
        "p_partkey",
        F.hex(u256_add(F.col("a"), F.col("b"))).alias("sum_hex"),
        F.hex(u256_sub(F.col("a"), F.col("b"))).alias("diff_hex"),
    )
    return out


# ---------------------------------------------------------------------------
# Flagship Erigon domain pipeline under the DuckDB hash gate.
#
# The Spark side reads the RAW fixture parquet (encoded blobs) and runs the
# real pipeline: Arrow-batched decode → broadcast code-hash recovery →
# transpose → first-block re-key (reference merge loop,
# erigon_extract.c:2358-2433). The oracle starts from the PYTHON-decoded
# parquet (written by fixture_store, independent of Spark) and re-derives
# the SQL-expressible semantics itself: recovery join (262-300), +1
# PlainState shift (2373-2387), per-key lag re-key (2409-2433), genesis
# filter (2421-2426). A defect in ANY Spark stage — decode included —
# breaks the value hash.
# ---------------------------------------------------------------------------

from erigon_extract_spark.fixture_store import FIXTURE_DIR as _FIXDIR
from erigon_extract_spark.schemas import EMPTY_CODE_HASH as _EMPTY_CH

_Z32 = "00" * 32


def _erigon_history_cte(
    ps_account: str = "d_ps_account", ps_storage: str = "d_ps_storage"
) -> str:
    """Shared DuckDB CTE: decoded fixture parquet → state_history rows.

    ``ps_account``/``ps_storage`` select which latest-state snapshot feeds
    the build: the raw-PlainState decode (``d_ps_*``, what the reference's
    full rebuild sees) or the timeline snapshot (``snap_tip_*``, which also
    carries pre-self-destruct incarnation slots — the richer store the
    incremental path maintains)."""
    d = str(_FIXDIR)
    empty = _EMPTY_CH.hex()
    return f"""
    WITH pch AS (
      SELECT address, incarnation, code_hash AS looked_up
      FROM read_parquet('{d}/plain_code_hash.parquet')
    ),
    acct_raw AS (
      SELECT block, address, nonce, balance, incarnation, code_hash
      FROM read_parquet('{d}/d_account_changes.parquet')
      UNION ALL
      -- +1 PlainState shift, erigon_extract.c:2373-2387
      SELECT block + 1, address, nonce, balance, incarnation, code_hash
      FROM read_parquet('{d}/{ps_account}.parquet')
    ),
    acct_rec AS (
      -- code-hash recovery, erigon_extract.c:262-300
      SELECT a.block, a.address, a.nonce, a.balance, a.incarnation,
             CASE WHEN (a.code_hash = unhex('{_Z32}')
                        OR a.code_hash = unhex('{empty}'))
                       AND a.incarnation <> 0 AND p.looked_up IS NOT NULL
                  THEN p.looked_up ELSE a.code_hash END AS ch
      FROM acct_raw a LEFT JOIN pch p
        ON a.address = p.address AND a.incarnation = p.incarnation
    ),
    acct AS (
      -- empty-code normalization, erigon_extract.c:832-838
      SELECT block, address, nonce, balance, incarnation,
             CASE WHEN ch = unhex('{empty}') THEN unhex('{_Z32}')
                  ELSE ch END AS code_hash
      FROM acct_rec
    ),
    stor AS (
      SELECT block, address, incarnation, slot, value
      FROM read_parquet('{d}/d_storage_changes.parquet')
      UNION ALL
      SELECT block + 1, address, incarnation, slot, value
      FROM read_parquet('{d}/{ps_storage}.parquet')
    ),
    hist AS (
      -- first-block re-key: account version key is the address alone
      -- (incarnation is payload); storage keys include incarnation+slot —
      -- reference comparator erigon_extract.c:2102-2129
      SELECT address, 0 AS kind, incarnation, CAST(NULL AS BLOB) AS slot,
             COALESCE(LAG(block) OVER (PARTITION BY address ORDER BY block),
                      0) AS block_from,
             block, nonce, balance, code_hash, CAST(NULL AS BLOB) AS value
      FROM acct
      UNION ALL
      SELECT address, 1 AS kind, incarnation, slot,
             COALESCE(LAG(block) OVER (PARTITION BY address, incarnation,
                                       slot ORDER BY block),
                      0) AS block_from,
             block, CAST(NULL AS BIGINT) AS nonce, CAST(NULL AS BLOB) AS balance,
             CAST(NULL AS BLOB) AS code_hash, value
      FROM stor
    ),
    state_history AS (
      SELECT address, kind, incarnation, slot, block_from,
             nonce, balance, code_hash, value
      FROM hist
      WHERE NOT (block_from = 0 AND block = 0)  -- genesis filter, 2421-2426
    )
    """


_ERIGON_HISTORY_SQL = (
    _erigon_history_cte()
    + """
    SELECT hex(address) AS address, kind, incarnation, hex(slot) AS slot,
           block_from, nonce, hex(balance) AS balance,
           hex(code_hash) AS code_hash, hex(value) AS value
    FROM state_history
    """
)


def _erigon_raw_inputs(spark: SparkSession):
    """Read the raw fixture parquet with declared schemas."""
    from erigon_extract_spark import fixture_store
    from erigon_extract_spark.schemas import (
        ACCOUNT_CHANGESETS,
        PLAIN_CODE_HASH,
        PLAIN_STATE,
        STORAGE_CHANGESETS,
    )

    d = str(fixture_store.ensure())
    acs = spark.read.schema(ACCOUNT_CHANGESETS).parquet(f"{d}/account_changesets.parquet")
    scs = spark.read.schema(STORAGE_CHANGESETS).parquet(f"{d}/storage_changesets.parquet")
    ps = spark.read.schema(PLAIN_STATE).parquet(f"{d}/plain_state.parquet")
    pch = spark.read.schema(PLAIN_CODE_HASH).parquet(f"{d}/plain_code_hash.parquet")
    return d, acs, scs, ps, pch


def _hex_history(sh: DataFrame) -> DataFrame:
    return sh.select(
        F.hex("address").alias("address"),
        "kind",
        "incarnation",
        F.hex("slot").alias("slot"),
        "block_from",
        "nonce",
        F.hex("balance").alias("balance"),
        F.hex("code_hash").alias("code_hash"),
        F.hex("value").alias("value"),
    )


# Formula-derived oracle (VERDICT r5 #4; replaces the r4 pinned
# constants 2930000/60570000): the probe synthesizes 50k addresses x 40
# account versions (block = id/50k) and 20k slots x 50 storage writes
# (block = id/20k); the transpose emits one history row per version
# AFTER the first (the W4 lag re-key gives block_from = the previous
# version's block; the P7 genesis filter drops each key's first row).
# The oracle regenerates that closed form — per address block_from =
# 0..38, per slot 0..48 — so a correctness bug in the engine cannot be
# pinned into its own oracle. W4/P7 semantics are separately
# fixture-oracled via w4_rekey_first_block.
@query(
    "erigon_transpose_scale",
    """
    WITH acct AS (
      SELECT blk FROM UNNEST(generate_series(0, 49999)) AS a(addr),
                      UNNEST(generate_series(0, 39)) AS b(blk)
    ), stor AS (
      SELECT blk FROM UNNEST(generate_series(0, 19999)) AS s(k),
                      UNNEST(generate_series(0, 49)) AS b(blk)
    ), hist AS (
      SELECT blk - 1 AS block_from FROM acct WHERE blk >= 1
      UNION ALL
      SELECT blk - 1 FROM stor WHERE blk >= 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(block_from) AS BIGINT) AS block_from_checksum
    FROM hist
    """,
)
def erigon_transpose_scale_q(
    spark: SparkSession, sf_dir: str, scale: int = 1
) -> DataFrame:
    """The core ETL at benchmark volume: 2M account versions + 1M storage
    writes synthesized DISTRIBUTIVELY (spark.range + hash expressions — no
    driver-side data, no fixture collect), pushed through the real
    build_state_history (range shuffle + window re-key) and reduced to a
    checksum row. This is the measured-throughput witness that the
    transpose scales with rows, independent of the tiny correctness
    fixtures; bench.py tracks it per round. ``scale`` multiplies the row
    volume at FIXED key cardinality (history depth grows — the regime a
    long-running chain produces); bench.py's scale section runs scale=10
    to measure the work→time curve."""
    from erigon_extract_spark.plans.transpose import build_state_history

    n_acct, n_keys = 2_000_000 * scale, 50_000
    acct = spark.range(n_acct).select(
        F.expr("substring(unhex(md5(cast(id % 50000 as string))), 1, 20)").alias(
            "address"
        ),
        (F.col("id") / n_keys).cast("long").alias("block"),
        (F.col("id") % 97).alias("nonce"),
        F.expr(
            "unhex(concat(md5(cast(id as string)), md5(cast(id + 1 as string))))"
        ).alias("balance"),
        F.lit(0).cast("long").alias("incarnation"),
        F.lit(b"\x00" * 32).alias("code_hash"),
    )
    n_stor, n_slots = 1_000_000 * scale, 20_000
    stor = spark.range(n_stor).select(
        F.expr("substring(unhex(md5(cast(id % 20000 as string))), 1, 20)").alias(
            "address"
        ),
        F.lit(1).cast("long").alias("incarnation"),
        F.expr("unhex(md5(cast(id % 20000 as string)))").alias("__slot16"),
        (F.col("id") / n_slots).cast("long").alias("block"),
        F.expr("unhex(concat(md5(cast(id as string)), md5(cast(id * 7 as string))))").alias(
            "value"
        ),
    ).select(
        "address",
        "incarnation",
        F.concat(F.col("__slot16"), F.col("__slot16")).alias("slot"),
        "block",
        "value",
    )
    # partitions scale WITH the data (32 at x1 -> ~100K rows/partition at
    # every scale) — the knob a real cluster turns via AQE/conf, held
    # proportional here so partition sizing stays a controlled variable.
    # NOTE (measured, SCALE.md "100x point"): this is hygiene, not the
    # x100 fix — partition count moved the x100 time <10%; the measured
    # 2.7x-over-linear inflection at x100 is the ~45GB shuffle crossing
    # this single box's page cache (disk-bandwidth-bound), which a real
    # cluster avoids by scaling nodes with data.
    sh = build_state_history(acct, stor, num_partitions=32 * scale)
    return sh.groupBy().agg(
        F.count("*").alias("n_rows"),
        F.sum("block_from").alias("block_from_checksum"),
    )


# Independent reference Keccak-256 for the scalar_keccak256 oracle
# (VERDICT r7 #3: promote the rows-only keccak row to hash-gated).
# DuckDB has no keccak, but digests over a FIXED input set are
# constants — so the oracle is a VALUES literal computed at
# registration time by this compact spec-style implementation, which
# shares NOTHING with functions/keccak.py beyond the published Keccak
# specification itself: 2-D lanes (not a flat 25-list), rho offsets
# from the spec's (t+1)(t+2)/2 walk (not a table), round constants
# from the degree-8 LFSR (not a table), and classic q-byte padding
# (not append-then-or). A defect in EITHER the engine's numpy batch
# lane (the Spark path) or this reference now hash-fails under the
# driver — a true differential gate, the _ref_bpe_expected pattern.
def _ref_keccak256_hex(data: bytes) -> str:
    M = (1 << 64) - 1

    def rol(v: int, n: int) -> int:
        return ((v << n) | (v >> (64 - n))) & M if n else v

    def f1600(lanes):
        R = 1
        for _ in range(24):
            # theta
            C = [lanes[x][0] ^ lanes[x][1] ^ lanes[x][2] ^ lanes[x][3]
                 ^ lanes[x][4] for x in range(5)]
            D = [C[(x + 4) % 5] ^ rol(C[(x + 1) % 5], 1) for x in range(5)]
            lanes = [[lanes[x][y] ^ D[x] for y in range(5)] for x in range(5)]
            # rho + pi: the spec's single-lane walk
            x, y = 1, 0
            cur = lanes[x][y]
            for t in range(24):
                x, y = y, (2 * x + 3 * y) % 5
                cur, lanes[x][y] = (
                    lanes[x][y],
                    rol(cur, ((t + 1) * (t + 2) // 2) % 64),
                )
            # chi
            for y in range(5):
                row = [lanes[x][y] for x in range(5)]
                for x in range(5):
                    lanes[x][y] = (
                        row[x] ^ ((~row[(x + 1) % 5]) & row[(x + 2) % 5])
                    ) & M
            # iota: round constants from the spec LFSR
            for j in range(7):
                R = ((R << 1) ^ ((R >> 7) * 0x71)) % 256
                if R & 2:
                    lanes[0][0] ^= 1 << ((1 << j) - 1)
        return lanes

    rate = 136
    q = rate - (len(data) % rate)
    padded = data + (
        b"\x81" if q == 1 else b"\x01" + b"\x00" * (q - 2) + b"\x80"
    )
    lanes = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), rate):
        for i in range(rate // 8):
            lanes[i % 5][i // 5] ^= int.from_bytes(
                padded[off + 8 * i : off + 8 * i + 8], "little"
            )
        lanes = f1600(lanes)
    out = b"".join(lanes[i % 5][i // 5].to_bytes(8, "little") for i in range(4))
    return out.hex().upper()


# 64 deterministic messages: ("k%02d|" % i) repeated (i % 40) times —
# lengths 0..156 bytes, covering the empty message (i = 0, 40) and both
# sides of the 136-byte rate boundary (multi-block absorption)
_KECCAK_GATE_N = 64


def _keccak_gate_msg(i: int) -> bytes:
    return (("k%02d|" % i) * (i % 40)).encode("utf-8")


def _scalar_keccak_oracle_sql() -> str:
    rows = ",\n      ".join(
        f"({i}, '{_ref_keccak256_hex(_keccak_gate_msg(i))}')"
        for i in range(_KECCAK_GATE_N)
    )
    return f"""
    SELECT CAST(c0 AS BIGINT) AS id, c1 AS keccak
    FROM (VALUES
      {rows}
    ) AS t(c0, c1)
    """


@query("scalar_keccak256", _scalar_keccak_oracle_sql())
def scalar_keccak_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keccak-256 (F8) through the engine's Arrow-batched numpy lane,
    hash-gated against VALUES-literal digests from the independent
    compact spec implementation above (pytest additionally pins the
    algorithm to the published vectors incl. EMPTY_CODE_HASH ==
    keccak256('')). Input is the fixed 64-message set — deterministic,
    SF-independent, rate-boundary-crossing — built in-plan with zero
    UDFs before the one hashing projection."""
    from erigon_extract_spark.functions.keccak import keccak256

    base = F.concat(
        F.lit("k"), F.lpad(F.col("id").cast("string"), 2, "0"), F.lit("|")
    )
    msg = F.repeat(base, (F.col("id") % 40).cast("int"))
    return spark.range(_KECCAK_GATE_N).select(
        "id",
        F.hex(keccak256(F.encode(msg, "utf-8"))).alias("keccak"),
    )


# Golden-value oracle: DuckDB has no keccak, but the probe's input is a
# deterministic md5 formula, so the reduction is a constant — the pin
# regression-guards the numpy Keccak lane (algorithm itself is pinned to
# the spec vectors in tests/test_keccak.py); config-sweep verified
@query(
    "keccak_scale",
    """
    SELECT CAST(200000 AS BIGINT) AS n_hashed,
           'FFFF6D78D6E0970522AC605F6FC18FFF401680C806F1B03BD90C2B2530A3B1D0'
             AS max_hash
    """,
)
def keccak_scale_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-state throughput probe: 200k synthetic 32-byte keys through
    the batched numpy Keccak lane (functions/keccak.py::keccak256_batch) —
    the map stage a hashed-trie layout job runs per address/slot. The
    aggregate output keeps the gate surface scalar; pytest pins the
    algorithm to the spec vectors."""
    from erigon_extract_spark.functions.keccak import keccak256

    n = 200_000
    keys = spark.range(n).select(
        F.unhex(
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5(F.concat(F.lit("x"), F.col("id").cast("string"))),
            )
        ).alias("key")
    )
    hashed = keys.select(keccak256(F.col("key")).alias("h"))
    return hashed.agg(
        F.count("*").alias("n_hashed"),
        F.max(F.hex("h")).alias("max_hash"),
    )


# Trained sub-codebooks aren't SQL-expressible, so the RECALL FLOOR
# rides through the value hash instead (VERDICT r4 #5): the query
# computes exact brute-force top-10 IN-PLAN and emits per-probe result
# counts plus a mean-recall>=0.3 witness (the pytest floor) the oracle
# pins to TRUE. Any quantizer/ADC regression that drops recall below the
# floor now hash-fails under the driver, not just in pytest.
@query(
    "sim_pq_topk",
    """
    SELECT vec_id AS probe_id,
           CAST(10 AS BIGINT) AS n_results,
           TRUE AS mean_recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def sim_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.pq_topk): vectors
    L2-normalized then encoded as 8 byte-codes (32x memory compression at
    64 dims); probes score by ADC table lookups — pure Catalyst HOFs.
    tests/test_similarity.py pins per-run recall@10 against exact brute
    force; the registered output folds the same floor into the hash.
    ADC runs with the standard exact re-rank stage (rerank=50): measured
    mean recall@10 is 0.84 (sf0.01) / 0.62 (sf0.1) vs 0.48/0.22
    ADC-only — the floor carries 2x margin at the worst scale."""
    from erigon_extract_spark.operators.similarity import (
        brute_force_topk,
        l2_norm,
        pq_topk,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    norm = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x / l2_norm(F.col("embedding"))
        ).alias("embedding"),
    )
    probes = norm.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = norm.filter(F.col("vec_id") >= 5)
    approx = pq_topk(corpus, probes, k=10, m=8, n_codes=64, rerank=50)
    exact = brute_force_topk(corpus, probes, k=10)
    hits = (
        approx.select("probe_id", "vec_id")
        .join(exact.select("probe_id", "vec_id"), ["probe_id", "vec_id"])
        .agg(F.count("*").alias("__hits"))
    )
    n_probes = probes.count()
    mean_ok = hits.select(
        (F.col("__hits") >= F.lit(0.3 * n_probes * 10)).alias(
            "mean_recall_ok"
        )
    )
    return (
        approx.groupBy("probe_id")
        .agg(F.count("*").alias("n_results"))
        .crossJoin(F.broadcast(mean_ok))
    )


# Trained KMeans quantizer isn't SQL-expressible — fold the per-probe
# recall floor into the hashed output instead (same pattern as
# sim_pq_topk above). Floor 0.4 on random synthetic embeddings (the
# hardest regime for cell pruning): measured per-probe min is 0.5 at
# both sf0.01 and sf0.1 with n_probe=4, leaving one 0.1-step of margin.
@query(
    "sim_ivf_topk",
    """
    SELECT vec_id AS probe_id,
           CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def sim_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer, probes scan only
    their n_probe nearest cells (operators/similarity.py::ivf_topk).
    Exact brute force runs in the same plan; each probe's recall@10 must
    clear the 0.4 floor under the driver's value hash."""
    from erigon_extract_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = ivf_topk(emb, probes, k=10, n_lists=8, n_probe=4)
    exact = brute_force_topk(emb, probes, k=10)
    hits = (
        approx.select("probe_id", "vec_id")
        .join(exact.select("probe_id", "vec_id"), ["probe_id", "vec_id"])
        .groupBy("probe_id")
        .agg(F.count("*").alias("__hits"))
    )
    return (
        approx.groupBy("probe_id")
        .agg(F.count("*").alias("n_results"))
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            "n_results",
            (F.coalesce(F.col("__hits"), F.lit(0)) >= 4).alias(
                "recall_ok"
            ),
        )
    )


# IVF+PQ composed (FAISS IVFPQ): cells bound WHICH rows a probe scans,
# residual PQ codes bound the BYTES per row, exact re-rank restores
# recall. Same hashed-witness pattern as sim_pq/sim_ivf above.
@query(
    "sim_ivfpq_topk",
    """
    SELECT vec_id AS probe_id,
           CAST(10 AS BIGINT) AS n_results,
           TRUE AS mean_recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def sim_ivfpq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full composed ANN path (operators/similarity.ivfpq_topk):
    coarse cells scanned per probe (n_probe/n_lists of the corpus),
    ADC over residual codes, exact re-rank of 50 candidates. Mean
    recall@10 vs in-plan brute force must clear 0.3 under the value
    hash; note brute force here is restricted to the same probed rows'
    UNIVERSE (full corpus) so cell misses count against recall."""
    from erigon_extract_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
        l2_norm,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    norm = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x / l2_norm(F.col("embedding"))
        ).alias("embedding"),
    )
    probes = norm.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = norm.filter(F.col("vec_id") >= 5)
    approx = ivfpq_topk(
        corpus, probes, k=10, n_lists=8, n_probe=4, m=8, n_codes=32,
        rerank=50,
    )
    exact = brute_force_topk(corpus, probes, k=10)
    hits = (
        approx.select("probe_id", "vec_id")
        .join(exact.select("probe_id", "vec_id"), ["probe_id", "vec_id"])
        .agg(F.count("*").alias("__hits"))
    )
    n_probes = probes.count()
    mean_ok = hits.select(
        (F.col("__hits") >= F.lit(0.3 * n_probes * 10)).alias(
            "mean_recall_ok"
        )
    )
    return (
        approx.groupBy("probe_id")
        .agg(F.count("*").alias("n_results"))
        .crossJoin(F.broadcast(mean_ok))
    )


# The at-rest IVFPQ index: built once per dataset fingerprint, queried
# by partition-pruned scan; equality with the in-memory ivfpq_topk is
# pytest-pinned exactly, so the driver witness is the same recall floor.
@query(
    "sim_ivfpq_index_topk",
    """
    SELECT vec_id AS probe_id,
           CAST(10 AS BIGINT) AS n_results,
           TRUE AS mean_recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def sim_ivfpq_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVFPQ (operators/similarity.build_ivfpq_index /
    query_ivfpq_index): cells as partition directories — the probe's
    candidate read is partition-pruned at planning time; ADC + exact
    re-rank answer from the stored codes/vectors without retraining.
    Index built once per dataset fingerprint in the uid-scoped cache
    (the sim_lsh_index_topk convention)."""
    import os

    from erigon_extract_spark.operators.similarity import (
        brute_force_topk,
        build_ivfpq_index,
        l2_norm,
        query_ivfpq_index,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    norm = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x / l2_norm(F.col("embedding"))
        ).alias("embedding"),
    )
    probes = norm.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = norm.filter(F.col("vec_id") >= 5)

    parent = _cached_artifact(
        sf_dir, "embeddings", "ivfpq", "n_lists=8,m=8,n_codes=32,seed=42",
        lambda tmp: build_ivfpq_index(
            corpus, os.path.join(tmp, "idx"),
            n_lists=8, m=8, n_codes=32,
        ),
    )
    path = os.path.join(parent, "idx")
    approx = query_ivfpq_index(
        spark, path, probes, k=10, n_probe=4, rerank=50
    )
    exact = brute_force_topk(corpus, probes, k=10)
    hits = (
        approx.select("probe_id", "vec_id")
        .join(exact.select("probe_id", "vec_id"), ["probe_id", "vec_id"])
        .agg(F.count("*").alias("__hits"))
    )
    n_probes = probes.count()
    mean_ok = hits.select(
        (F.col("__hits") >= F.lit(0.3 * n_probes * 10)).alias(
            "mean_recall_ok"
        )
    )
    return (
        approx.groupBy("probe_id")
        .agg(F.count("*").alias("n_results"))
        .crossJoin(F.broadcast(mean_ok))
    )


# Golden-value oracle: deterministic md5-derived corpus -> constant
# candidate count (config-sweep verified; see erigon_transpose_scale note)
@query(
    "dedup_scale",
    # Engine-computed constant, kept as a DRIFT REGRESSION (r6 verdict:
    # acceptable where no closed form exists). Unlike curation_scale, the
    # LSH buckets hash with Spark's seeded murmur3 (F.hash), which DuckDB
    # cannot reproduce, and band collisions of the 5k near-dup pairs are
    # data-dependent. The analytic floor IS known: 45000 same-signature
    # pairs (seed groups {s, s+150000}, s % 10 != 0) collide in all bands
    # with certainty, so 49226 = 45000 certain + 4226 near-dup/accidental.
    "SELECT CAST(49226 AS BIGINT) AS n_candidates",
)
def dedup_scale_q(
    spark: SparkSession, sf_dir: str, scale: int = 1
) -> DataFrame:
    """Minhash LSH at benchmark volume: 200k documents synthesized
    distributively (10 hash-words each; 25% exact duplicates of earlier
    seeds, plus a 10% near-dup band differing in the final word), pushed
    through the real banded-LSH candidate pipeline and reduced to a
    count row. The LLM-pipeline throughput witness at ~2M shingle rows —
    independent of the 5k-doc correctness table. ``scale`` multiplies
    docs AND unique-seed cardinality together (corpus growth, constant
    dup rate); bench.py's scale section runs scale=10."""
    n_docs, n_uniq = 200_000 * scale, 150_000 * scale
    words = [
        F.md5(F.concat((F.col("id") % n_uniq).cast("string"), F.lit(f"_{i}")))
        for i in range(9)
    ]
    last = F.when(
        F.col("id") % 10 == 0, F.md5(F.concat(F.col("id").cast("string"), F.lit("_x")))
    ).otherwise(
        F.md5(F.concat((F.col("id") % n_uniq).cast("string"), F.lit("_9")))
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *words, last).alias("text"),
    )
    cand = minhash_lsh_candidates(docs, n_hashes=16, bands=4, shingle_n=3)
    return cand.groupBy().agg(F.count("*").alias("n_candidates"))


@query("erigon_state_history", _ERIGON_HISTORY_SQL)
def erigon_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship domain pipeline end-to-end on the deterministic fixture
    parquet: decode → code-hash recovery → transpose → first-block rekey.
    Returns the state-history rows (hex-encoded keys for hashability)."""
    from erigon_extract_spark.plans.extract import (
        decode_account_changesets,
        decode_storage_changesets,
        recover_code_hashes,
        split_plain_state,
    )
    from erigon_extract_spark.plans.transpose import build_state_history

    _, acs, scs, ps, pch = _erigon_raw_inputs(spark)
    acct = recover_code_hashes(
        decode_account_changesets(acs).drop("decode_error"), pch
    )
    stor = decode_storage_changesets(scs).drop("decode_error")
    ps_a, ps_s = split_plain_state(ps)
    ps_acct = recover_code_hashes(
        decode_account_changesets(ps_a).drop("decode_error"), pch
    )
    ps_stor = decode_storage_changesets(ps_s).drop("decode_error")
    sh = build_state_history(acct, stor, ps_acct, ps_stor, num_partitions=2)
    return _hex_history(sh)


_ERIGON_INCREMENTAL_SQL = (
    _erigon_history_cte(ps_account="snap_tip_account", ps_storage="snap_tip_storage")
    + """
    SELECT hex(address) AS address, kind, incarnation, hex(slot) AS slot,
           block_from, nonce, hex(balance) AS balance,
           hex(code_hash) AS code_hash, hex(value) AS value
    FROM state_history
    """
)


@query("erigon_incremental_update", _ERIGON_INCREMENTAL_SQL)
def erigon_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental state-history maintenance: base store at block 60 +
    append-only delta for blocks 61..tip must equal a full rebuild over the
    same inputs, so the ORACLE is the state-history SQL over the tip
    snapshot — the hash gate proves the incremental path converges to the
    batch build (also tests/test_incremental.py). The snapshot here is the
    timeline ("latest-state") table, which retains pre-self-destruct
    incarnation slots that raw PlainState drops — the store the maintained
    path keeps is strictly richer. The reference only aspires to in-place
    update (README.md:52-56); here the update is a batch-sized window + one
    append — no archive rewrite."""
    from erigon_extract_spark.plans.extract import (
        decode_account_changesets,
        decode_storage_changesets,
        recover_code_hashes,
    )
    from erigon_extract_spark.plans.incremental import (
        apply_increment,
        incremental_history_delta,
        zero_tombstones,
    )
    from erigon_extract_spark.plans.transpose import build_state_history

    d, acs, scs, _, pch = _erigon_raw_inputs(spark)
    t_split = 60
    acct = recover_code_hashes(
        decode_account_changesets(acs).drop("decode_error"), pch
    ).localCheckpoint(eager=False)  # consumed by old build, batch split, and snapshots —
    stor = decode_storage_changesets(scs).drop("decode_error").localCheckpoint(eager=False)
    # materialize the pandas-UDF decode once. eager=False (r11 optimization
    # round, guide §5): materialization still happens exactly once (at the
    # caller's single action) but the 4-5 driver-synchronous checkpoint
    # jobs that serialized construction are gone — measured on the chained
    # variant: construct 9.2 -> 6.1 s, action 1.5 -> 1.2 s (min-of-3,
    # same session); hash-gate green at sf0.01 after the change.

    acct_ps_schema = (
        "block long, address binary, nonce long, balance binary, "
        "incarnation long, code_hash binary"
    )
    stor_ps_schema = (
        "block long, address binary, incarnation long, slot binary, value binary"
    )

    def snapshot(stor_decoded, tag, at_block):
        psa = spark.read.schema(acct_ps_schema).parquet(f"{d}/{tag}_account.parquet")
        pss = spark.read.schema(stor_ps_schema).parquet(f"{d}/{tag}_storage.parquet")
        tomb = zero_tombstones(stor_decoded, pss, at_block)
        return psa, pss.unionByName(tomb.select(*pss.columns))

    stor_old = stor.filter(F.col("block") <= t_split)
    psa_t, pss_t = snapshot(stor_old, "snap60", t_split)
    old = build_state_history(
        acct.filter(F.col("block") <= t_split), stor_old, psa_t, pss_t,
        num_partitions=2,
    ).localCheckpoint(eager=False)  # old store is consumed 3x (keys, seam, append);
    # materialize once instead of re-running the base build per consumer
    latest_block = 120  # fixture_store.PARAMS["n_blocks"]
    psa_tip, pss_tip = snapshot(stor, "snap_tip", latest_block)
    delta = incremental_history_delta(
        old,
        acct.filter(F.col("block") > t_split),
        stor.filter(F.col("block") > t_split),
        psa_tip,
        pss_tip,
    )
    updated = apply_increment(old, delta, num_partitions=2)
    return _hex_history(updated)


@query("erigon_chained_increments", _ERIGON_INCREMENTAL_SQL)
def erigon_chained_increments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README's "can be updated in place" claim under the
    oracle, CHAINED: base store at block 60, then TWO successive
    increments (60,90] and (90,120] must converge to the full tip
    rebuild. The middle boundary has NO snapshot fixture — increment 1's
    snapshot-at-90 is DERIVED from the changeset stream plus the tip
    snapshot (plans/incremental.derive_snapshot_at: a changeset carries
    the value before its block, so state@90 is the before-value of each
    key's first changeset after 90, falling back to tip, zero-filling
    storage tombstones). That is the maintenance loop a streaming
    ingester runs: hold the changeset feed and the current tip, never
    re-read the archive. The single-split gate (erigon_incremental_update)
    proves one append converges; this one proves the append OPERATION
    composes — the induction step. The streaming file-drop twin of the
    same loop (availableNow replay, micro-batch boundaries at the same
    splits) is pinned in tests/test_incremental.py."""
    from erigon_extract_spark.plans.extract import (
        decode_account_changesets,
        decode_storage_changesets,
        recover_code_hashes,
    )
    from erigon_extract_spark.plans.incremental import (
        apply_increment,
        derive_snapshot_at,
        incremental_history_delta,
        zero_tombstones,
    )
    from erigon_extract_spark.plans.transpose import build_state_history

    d, acs, scs, _, pch = _erigon_raw_inputs(spark)
    t0_split, t1_split, tip = 60, 90, 120
    acct = recover_code_hashes(
        decode_account_changesets(acs).drop("decode_error"), pch
    ).localCheckpoint(eager=False)
    stor = decode_storage_changesets(scs).drop("decode_error").localCheckpoint(eager=False)

    acct_ps_schema = (
        "block long, address binary, nonce long, balance binary, "
        "incarnation long, code_hash binary"
    )
    stor_ps_schema = (
        "block long, address binary, incarnation long, slot binary, value binary"
    )
    psa_tip_raw = spark.read.schema(acct_ps_schema).parquet(
        f"{d}/snap_tip_account.parquet"
    )
    pss_tip_raw = spark.read.schema(stor_ps_schema).parquet(
        f"{d}/snap_tip_storage.parquet"
    )

    # base store at 60 (fixture snapshot + tombstones, as the batch build)
    stor_old = stor.filter(F.col("block") <= t0_split)
    psa_60 = spark.read.schema(acct_ps_schema).parquet(
        f"{d}/snap60_account.parquet"
    )
    pss_60_raw = spark.read.schema(stor_ps_schema).parquet(
        f"{d}/snap60_storage.parquet"
    )
    pss_60 = pss_60_raw.unionByName(
        zero_tombstones(stor_old, pss_60_raw, t0_split).select(
            *pss_60_raw.columns
        )
    )
    store = build_state_history(
        acct.filter(F.col("block") <= t0_split), stor_old, psa_60, pss_60,
        num_partitions=2,
    ).localCheckpoint(eager=False)

    # increment 1: (60, 90] with the DERIVED boundary snapshot
    a1 = acct.filter((F.col("block") > t0_split) & (F.col("block") <= t1_split))
    s1 = stor.filter((F.col("block") > t0_split) & (F.col("block") <= t1_split))
    psa_90, pss_90 = derive_snapshot_at(
        acct, stor, psa_tip_raw, pss_tip_raw, t1_split,
        touched_accounts=a1.select("address"),
        touched_storage=s1.select("address", "incarnation", "slot"),
    )
    store = apply_increment(
        store, incremental_history_delta(store, a1, s1, psa_90, pss_90),
        num_partitions=2,
    ).localCheckpoint(eager=False)

    # increment 2: (90, tip] with the real tip snapshot (+ tombstones)
    a2 = acct.filter(F.col("block") > t1_split)
    s2 = stor.filter(F.col("block") > t1_split)
    pss_tip = pss_tip_raw.unionByName(
        zero_tombstones(stor, pss_tip_raw, tip).select(*pss_tip_raw.columns)
    )
    store = apply_increment(
        store,
        incremental_history_delta(store, a2, s2, psa_tip_raw, pss_tip),
        num_partitions=2,
    )
    return _hex_history(store)


@query("ref_dialect_decode", _ERIGON_HISTORY_SQL)
def ref_dialect_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact reference-format fidelity under the hash gate: decode the
    golden merged full-history file (256-byte header + strategy-0 opcode
    stream with 4 KiB restart pages, written by codec/refstream in the
    reference's exact dialect — erigon_extract.c:1340-1428, 2266-2288) with
    the PARALLEL page-range reader, and require the items to hash-match the
    state-history oracle. Exercises opcode dispatch, number/delta/invert
    codecs, choose-shorter slots, incarnation escapes, restart-page resets,
    and the mapInPandas page-task fan-out."""
    from erigon_extract_spark import fixture_store
    from erigon_extract_spark.codec.refstream import read_ref_file_df

    d = str(fixture_store.ensure())
    df = read_ref_file_df(spark, f"{d}/full-history.dat", strategy=0,
                          pages_per_task=2)
    return df.select(
        F.hex("address").alias("address"),
        F.col("is_storage").cast("int").alias("kind"),
        "incarnation",
        F.hex("slot").alias("slot"),
        F.col("block").alias("block_from"),
        "nonce",
        F.hex("balance").alias("balance"),
        F.hex("code_hash").alias("code_hash"),
        F.hex("value").alias("value"),
    )


_ERIGON_STATE_AT_SQL = (
    _erigon_history_cte()
    + """
    SELECT hex(address) AS address,
           MAX(block_from) AS block_from,
           arg_max(nonce, block_from) AS nonce,
           hex(arg_max(balance, block_from)) AS balance,
           arg_max(incarnation, block_from) AS incarnation,
           hex(arg_max(code_hash, block_from)) AS code_hash
    FROM state_history
    WHERE kind = 0 AND block_from <= 100
    GROUP BY address
    """
)


_ERIGON_LATEST_SQL = (
    _erigon_history_cte()
    + """
    SELECT hex(address) AS address, kind,
           arg_max(incarnation, block_from) AS incarnation,
           hex(slot) AS slot,
           MAX(block_from) AS block_from,
           arg_max(nonce, block_from) AS nonce,
           hex(arg_max(balance, block_from)) AS balance,
           hex(arg_max(code_hash, block_from)) AS code_hash,
           hex(arg_max(value, block_from)) AS value
    FROM state_history
    -- the version key: incarnation is payload for accounts, key for
    -- storage (reference comparator erigon_extract.c:2102-2129)
    GROUP BY address, kind,
             CASE WHEN kind = 1 THEN incarnation ELSE 0 END, slot
    """
)


@query("erigon_latest_state", _ERIGON_LATEST_SQL)
def erigon_latest_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained latest-state table (PlainState equivalent): the open
    version per state key, materialized from the store with one max_by
    aggregation. This is the ``old_keys`` side table the incremental plan
    joins against at scale (plans/incremental.py) and the seed for point
    lookups — kept under the hash gate so its derivation can't drift from
    the store semantics."""
    from erigon_extract_spark.plans.transpose import with_version_key

    sh_hex = erigon_pipeline_q(spark, sf_dir)
    sh = sh_hex.select(
        F.unhex("address").alias("address"),
        "kind",
        "incarnation",
        F.unhex("slot").alias("slot"),
        "block_from",
        "nonce",
        F.unhex("balance").alias("balance"),
        F.unhex("code_hash").alias("code_hash"),
        F.unhex("value").alias("value"),
    )
    keyed = with_version_key(sh)
    out = keyed.groupBy("address", "kind", "__key_inc", "slot").agg(
        F.max("block_from").alias("block_from"),
        F.max_by("incarnation", "block_from").alias("incarnation"),
        F.max_by("nonce", "block_from").alias("nonce"),
        F.max_by("balance", "block_from").alias("balance"),
        F.max_by("code_hash", "block_from").alias("code_hash"),
        F.max_by("value", "block_from").alias("value"),
    )
    return out.select(
        F.hex("address").alias("address"),
        "kind",
        "incarnation",
        F.hex("slot").alias("slot"),
        "block_from",
        "nonce",
        F.hex("balance").alias("balance"),
        F.hex("code_hash").alias("code_hash"),
        F.hex("value").alias("value"),
    )


_ERIGON_DUMP_SQL = (
    _erigon_history_cte()
    + """
    SELECT CASE WHEN kind = 0 THEN
             'A ' || lower(hex(address)) || ' @' || block_from
             || ' nonce=' || COALESCE(nonce, 0)
             || ' balance=' ||
               CASE WHEN balance IS NULL THEN '-'
                    WHEN ltrim(lower(hex(balance)), '0') = '' THEN '0'
                    ELSE ltrim(lower(hex(balance)), '0') END
             || ' inc=' || incarnation
             || ' code=' ||
               CASE WHEN code_hash IS NULL THEN '-'
                    WHEN ltrim(lower(hex(code_hash)), '0') = '' THEN '0'
                    ELSE ltrim(lower(hex(code_hash)), '0') END
           ELSE
             'S ' || lower(hex(address)) || ' inc=' || incarnation
             || ' slot=' || lower(hex(slot)) || ' @' || block_from
             || ' value=' ||
               CASE WHEN value IS NULL THEN '-'
                    WHEN ltrim(lower(hex(value)), '0') = '' THEN '0'
                    ELSE ltrim(lower(hex(value)), '0') END
           END AS line
    FROM state_history
    """
)


@query("erigon_canonical_dump", _ERIGON_DUMP_SQL)
def erigon_canonical_dump_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 pretty-print sink under the hash gate: the canonical text line per
    state row (operators/dump.py), hash-matched against the oracle building
    the identical strings from the state-history CTE (reference
    show_file/print_* formats, erigon_extract.c:361-424)."""
    from erigon_extract_spark.operators.dump import canonical_dump

    sh_hex = erigon_pipeline_q(spark, sf_dir)
    sh = sh_hex.select(
        F.unhex("address").alias("address"),
        "kind",
        "incarnation",
        F.unhex("slot").alias("slot"),
        "block_from",
        "nonce",
        F.unhex("balance").alias("balance"),
        F.unhex("code_hash").alias("code_hash"),
        F.unhex("value").alias("value"),
    )
    return canonical_dump(sh)


_ERIGON_MANIFEST_SQL = (
    _erigon_history_cte()
    + """
    SELECT kind, COUNT(*) AS n_rows
    FROM state_history
    GROUP BY kind
    """
)


@query("erigon_manifest_counts", _ERIGON_MANIFEST_SQL)
def erigon_manifest_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 manifest counts under the gate: per-kind row counts of the built
    store — the numbers the reference's 256-byte header was SUPPOSED to
    carry before the words[6] double-assignment clobbered the account count
    (erigon_extract.c:2281-2282; fixed in sources/tables.write_manifest,
    replicated faithfully only in the byte-exact refstream header)."""
    sh_hex = erigon_pipeline_q(spark, sf_dir)
    return sh_hex.groupBy("kind").agg(F.count("*").alias("n_rows"))


_ERIGON_TX_BODIES_SQL = f"""
    WITH dedup AS (
      SELECT block, tx_index, tx_amount, uncles
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY block
                                     ORDER BY block_hash) AS rn
        FROM read_parquet('{_FIXDIR}/d_block_bodies.parquet')
      ) WHERE rn = 1
    ),
    tx AS (SELECT * FROM read_parquet('{_FIXDIR}/block_transactions.parquet')),
    joined AS (
      SELECT d.block, d.tx_amount, d.uncles, t.tx_id, t.tx_rlp
      FROM dedup d LEFT JOIN tx t
        ON t.tx_id >= d.tx_index AND t.tx_id < d.tx_index + d.tx_amount
    )
    SELECT block,
           first(tx_amount) AS tx_amount,
           hex(first(uncles)) AS uncles,
           COALESCE(string_agg(hex(tx_rlp), '' ORDER BY tx_id)
                    FILTER (WHERE tx_id IS NOT NULL), '') AS txs
    FROM joined
    GROUP BY block
    """


@query("erigon_tx_bodies", _ERIGON_TX_BODIES_SQL)
def erigon_tx_bodies_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage B under the hash gate: RLP-decode block bodies (F7), fork
    dedup (W6), 1:N keyed tx-range join (S6/J3), K4 assembly — the Spark
    side reads the RAW RLP fixture parquet; the oracle range-joins the
    Python-decoded frames in SQL (reference extract_txbodies,
    erigon_extract.c:1785-1980)."""
    from erigon_extract_spark import fixture_store
    from erigon_extract_spark.plans.txbodies import assemble_tx_bodies
    from erigon_extract_spark.schemas import BLOCK_BODIES, BLOCK_TRANSACTIONS

    d = str(fixture_store.ensure())
    bodies = spark.read.schema(BLOCK_BODIES).parquet(f"{d}/block_bodies.parquet")
    txs = spark.read.schema(BLOCK_TRANSACTIONS).parquet(
        f"{d}/block_transactions.parquet"
    )
    out = assemble_tx_bodies(bodies, txs, dedup_forks=True)
    # Gate-facing projection is SCALAR-ONLY: the driver's canonicalizer
    # (pandas sort_values/factorize) cannot hash list cells, so the txs
    # array collapses to one hex string per block (order preserved by the
    # array_sort upstream). The array-shaped K4 sink stays the library API
    # (plans.txbodies.assemble_tx_bodies).
    return out.select(
        "block",
        "tx_amount",
        F.hex("uncles").alias("uncles"),
        F.concat_ws("", F.transform("txs", lambda x: F.hex(x))).alias("txs"),
    )


_ERIGON_TXSTATS_SQL = f"""
    WITH bodies AS (
      SELECT * FROM read_parquet('{_FIXDIR}/d_block_bodies.parquet')
    ),
    tx AS (SELECT * FROM read_parquet('{_FIXDIR}/block_transactions.parquet'))
    SELECT (SELECT COUNT(DISTINCT block) FROM bodies) AS block_count,
           (SELECT CAST(SUM(tx_amount) AS BIGINT) FROM bodies) AS tx_count,
           (SELECT CAST(SUM(octet_length(tx_rlp)) AS BIGINT) FROM tx)
             AS total_tx_bytes,
           (SELECT COUNT(*) FROM (
              SELECT block FROM bodies GROUP BY block HAVING COUNT(*) > 1
            )) AS fork_dup_blocks
    """


@query("erigon_txbodies_stats", _ERIGON_TXSTATS_SQL)
def erigon_txbodies_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 aggregates over the tx-bodies fixture tables (reference counters,
    erigon_extract.c:1819-1820, 1871, 1960-1972)."""
    from erigon_extract_spark import fixture_store
    from erigon_extract_spark.plans.txbodies import txbodies_stats
    from erigon_extract_spark.schemas import BLOCK_BODIES, BLOCK_TRANSACTIONS

    d = str(fixture_store.ensure())
    bodies = spark.read.schema(BLOCK_BODIES).parquet(f"{d}/block_bodies.parquet")
    txs = spark.read.schema(BLOCK_TRANSACTIONS).parquet(
        f"{d}/block_transactions.parquet"
    )
    out = txbodies_stats(bodies, txs)
    return out.select(
        "block_count",
        "tx_count",
        "total_tx_bytes",
        F.col("fork_dup_blocks").cast("long").alias("fork_dup_blocks"),
    )


_ERIGON_STORAGE_AT_SQL = (
    _erigon_history_cte()
    + """
    SELECT hex(address) AS address,
           incarnation,
           hex(slot) AS slot,
           MAX(block_from) AS block_from,
           hex(arg_max(value, block_from)) AS value
    FROM state_history
    WHERE kind = 1 AND block_from <= 100
    GROUP BY address, incarnation, slot
    """
)


@query("erigon_storage_state_at", _ERIGON_STORAGE_AT_SQL)
def erigon_storage_state_at_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-slot as-of lookup over the flagship pipeline output (the
    other half of the reference's 'any account or storage at any point in
    block time', README.md:37-41): latest version per (address,
    incarnation, slot) with block_from <= 100, max_by-aggregated — partial
    aggregation before the single exchange."""
    from erigon_extract_spark.plans.state import storage_state_at

    sh_hex = erigon_pipeline_q(spark, sf_dir)
    sh = sh_hex.select(
        F.unhex("address").alias("address"),
        "kind",
        "incarnation",
        F.unhex("slot").alias("slot"),
        "block_from",
        F.unhex("value").alias("value"),
    )
    out = storage_state_at(sh, block=100)
    return out.select(
        F.hex("address").alias("address"),
        "incarnation",
        F.hex("slot").alias("slot"),
        "block_from",
        F.hex("value").alias("value"),
    )


@query("erigon_state_at", _ERIGON_STATE_AT_SQL)
def erigon_state_at_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from erigon_extract_spark.plans.state import account_state_at

    sh_hex = erigon_pipeline_q(spark, sf_dir)
    sh = sh_hex.select(
        F.unhex("address").alias("address"),
        "kind",
        "incarnation",
        F.unhex("slot").alias("slot"),
        "block_from",
        "nonce",
        F.unhex("balance").alias("balance"),
        F.unhex("code_hash").alias("code_hash"),
        F.unhex("value").alias("value"),
    )
    out = account_state_at(sh, block=100)
    return out.select(
        F.hex("address").alias("address"),
        "block_from",
        "nonce",
        F.hex("balance").alias("balance"),
        "incarnation",
        F.hex("code_hash").alias("code_hash"),
    )


# Probe blocks for the encoded-file O(log N) lookup gate: genesis, three
# mid-history points, the erigon_state_at block, and the tip.
_REF_LOOKUP_BLOCKS = (0, 30, 60, 90, 100, 120)
_REF_LOOKUP_STOR_BLOCKS = (60, 120)


def _ref_lookup_oracle_sql() -> str:
    """As-of answers for every (key, probe_block) pair, derived relationally
    from the decoded fixture tables: greatest block_from <= probe per key —
    the SQL statement of README.md:37-41's 'any account or storage can be
    looked up at any point in block time'."""
    blocks = ", ".join(f"({b})" for b in _REF_LOOKUP_BLOCKS)
    sblocks = ", ".join(f"({b})" for b in _REF_LOOKUP_STOR_BLOCKS)
    return (
        _erigon_history_cte()
        + f"""
    , probes(probe_block) AS (VALUES {blocks}),
    sprobes(probe_block) AS (VALUES {sblocks}),
    acct_hits AS (
      SELECT hex(h.address) AS address, 0 AS kind,
             arg_max(h.incarnation, h.block_from) AS incarnation,
             CAST(NULL AS VARCHAR) AS slot,
             p.probe_block AS probe_block,
             MAX(h.block_from) AS block_from,
             arg_max(h.nonce, h.block_from) AS nonce,
             hex(arg_max(h.balance, h.block_from)) AS balance,
             hex(arg_max(h.code_hash, h.block_from)) AS code_hash,
             CAST(NULL AS VARCHAR) AS value
      FROM state_history h CROSS JOIN probes p
      WHERE h.kind = 0 AND h.block_from <= p.probe_block
      GROUP BY h.address, p.probe_block
    ),
    stor_hits AS (
      SELECT hex(h.address) AS address, 1 AS kind,
             h.incarnation AS incarnation,
             hex(h.slot) AS slot,
             p.probe_block AS probe_block,
             MAX(h.block_from) AS block_from,
             CAST(NULL AS BIGINT) AS nonce,
             CAST(NULL AS VARCHAR) AS balance,
             CAST(NULL AS VARCHAR) AS code_hash,
             hex(arg_max(h.value, h.block_from)) AS value
      FROM state_history h CROSS JOIN sprobes p
      WHERE h.kind = 1 AND h.block_from <= p.probe_block
      GROUP BY h.address, h.incarnation, h.slot, p.probe_block
    )
    SELECT * FROM acct_hits UNION ALL SELECT * FROM stor_hits
    """
    )


@query("erigon_ref_file_lookup", _ref_lookup_oracle_sql())
def erigon_ref_file_lookup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline READ path under the hash gate: O(log N)
    binary-search point lookups INTO the encoded merged full-history file
    (README.md:37-41; restart pages erigon_extract.c:802-822), answered by
    codec/refstream.point_lookup — each probe decodes only first-items of
    log2(pages) restart pages plus ONE full page, never the file.

    The probe set is every state key the history contains (changeset keys
    union the +1-shifted PlainState keys), each looked up at six account /
    two storage probe blocks; misses (no version at or before the probe)
    emit no row on either side. The oracle reconstructs the same answers
    relationally (argmax block_from <= probe over the state-history CTE),
    so a defect anywhere in the encode, the page-start geometry, the
    binary-search comparator, or the final in-page scan breaks the value
    hash. The logarithmic IO bound itself is pytest-pinned by probe counts
    in tests/test_refstream.py; this gate pins the ANSWERS.

    Scale note: each lookup is O(log N) page IO independent of file size —
    the driver-side loop here is fixture-sized test plumbing, not a scan."""
    import pyarrow.parquet as pq

    from erigon_extract_spark import fixture_store
    from erigon_extract_spark.codec.refstream import point_lookup

    d = fixture_store.ensure()
    path = str(d / "full-history.dat")

    def cols(tbl: str, names: list[str]):
        t = pq.read_table(str(d / tbl), columns=names)
        return zip(*(t.column(c).to_pylist() for c in names))

    addrs = sorted(
        {bytes(a) for (a,) in cols("d_account_changes.parquet", ["address"])}
        | {bytes(a) for (a,) in cols("d_ps_account.parquet", ["address"])}
    )
    skeys = set()
    for tbl in ("d_storage_changes.parquet", "d_ps_storage.parquet"):
        for a, i, s in cols(tbl, ["address", "incarnation", "slot"]):
            skeys.add((bytes(a), int(i), bytes(s)))

    rows = []
    for b in _REF_LOOKUP_BLOCKS:
        for a in addrs:
            it, _ = point_lookup(path, a, b)
            if it is not None:
                rows.append((
                    a.hex().upper(), 0, int(it.incarnation), None, b,
                    int(it.block), int(it.nonce), it.balance.hex().upper(),
                    it.code_hash.hex().upper(), None,
                ))
    for b in _REF_LOOKUP_STOR_BLOCKS:
        for a, inc, s in sorted(skeys):
            it, _ = point_lookup(path, a, b, slot=s, incarnation=inc)
            if it is not None:
                rows.append((
                    a.hex().upper(), 1, inc, s.hex().upper(), b,
                    int(it.block), None, None, None, it.value.hex().upper(),
                ))
    schema = (
        "address string, kind int, incarnation long, slot string, "
        "probe_block int, block_from long, nonce long, balance string, "
        "code_hash string, value string"
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# TPC-H-shaped analytic queries, part 2 (correlated subqueries, EXISTS /
# NOT EXISTS, outer-join histograms, conditional-aggregate ratios,
# disjunctive predicates, distinct aggregates). The classic q2/q9/q11/q16/
# q20/q21 need a partsupp table or commit/receipt dates the test corpus
# lacks; shapes are adapted to the available columns. Reference analog:
# none (the reference has no query language, SURVEY.md §2.13) — this is the
# generic analytics surface of the new engine.
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left-semi join with a mixed equi + range
    predicate. Catalyst plans the equi part as the join key and the range
    part as a join-time filter, so no cartesian blowup at scale."""
    orders = _load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(year FROM l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aliased copies of the nation dim (both broadcast) + a
    disjunctive cross-nation predicate evaluated after both joins."""
    li = _load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    n1 = _load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    df = (
        _load(spark, sf_dir, "supplier")
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(_load(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(_load(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return df.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO'
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31') all_nations
    GROUP BY o_year
    """,
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-table star join; every dim side is broadcast-sized, so the plan is
    one pass over lineitem with chained broadcast hash joins — the shape
    that survives a 100x fact-table scale-up."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    n1 = _load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = _load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    region = _load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    df = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(_load(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_load(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return df.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            4,
        ).alias("mkt_share")
    )


@query(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-count aggregation over a join with a cross-column date
    predicate (shipment >= 60 days after order)."""
    orders = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join + two-level aggregation (per-customer order count, then a
    histogram of those counts). COUNT(col) semantics — nulls from the outer
    join don't count — match between engines."""
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_effect",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio. Float parity rule: mirror the exact op
    order — 100.0 * SUM(case) / SUM(all), rounded once at the end."""
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            4,
        ).alias("promo_revenue")
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar MAX subquery against a derived revenue relation. Revenue is
    rounded to cents BEFORE the max/equality so cross-engine float
    accumulation order can't flip the argmax."""
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        _load(spark, sf_dir, "supplier")
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_count_by_part",
    """
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#12' AND p_size IN (1, 5, 9, 13)
    GROUP BY p_brand, p_type
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate over a join (partsupp-free adaptation of the
    classic parts/supplier relationship query)."""
    part = _load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12") & F.col("p_size").isin(1, 5, 9, 13)
    )
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND l_quantity < (SELECT 0.2 * ROUND(AVG(l2.l_quantity), 6)
                        FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-AVG subquery, decorrelated into a per-part
    aggregate + broadcast join (what Catalyst does to the SQL form too).
    The AVG is rounded to 6 decimals on both sides so the strict-< filter
    can't flip on cross-engine accumulation order."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.2) * F.round(F.avg("l_quantity"), 6)).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customer",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery with HAVING → aggregate + left-semi join. Quantities are
    integral doubles, so the >250 sum compares exactly in both engines."""
    li = _load(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 250)
        .select("l_orderkey")
    )
    all_orders = _load(spark, sf_dir, "orders")
    orders = all_orders.join(
        big_orders, all_orders.o_orderkey == big_orders.l_orderkey, "left_semi"
    )
    return (
        _load(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-column predicate spanning both join sides; the
    p_brand IN (...) implied superset is still pushdown-able to the part
    scan while the full OR evaluates post-join."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q22_dormant_rich_customers",
    """
    SELECT n_name, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT ROUND(AVG(c_acctbal), 6) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-AVG subquery (kept in-plan as a broadcast cross join — no
    driver collect) + NOT EXISTS anti join. Adapted from the classic
    global-sales-opportunity shape: every synthetic customer has orders, so
    dormancy = no order since 2000."""
    cust = _load(spark, sf_dir, "customer")
    nation = _load(spark, sf_dir, "nation")
    recent = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM ps
    JOIN part ON p_partkey = ps.l_partkey
    JOIN supplier ON s_suppkey = ps.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                       FROM ps ps2
                       JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                       JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                       JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                       WHERE ps2.l_partkey = ps.l_partkey
                         AND r2.r_name = 'EUROPE')
    """,
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adaptation (min-cost supplier). The testdata has no
    partsupp table, so the part↔supplier relation is the DISTINCT
    (l_partkey, l_suppkey) projection of lineitem and the minimized "cost"
    is s_acctbal. The correlated MIN subquery decorrelates into a window
    min over p_partkey — one shuffle, no join-back. s_acctbal is compared
    raw (no arithmetic on either side), so float equality is exact."""
    ps = (
        _load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = _load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    region = _load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eu = (
        _load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp_eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
    )


@query(
    "q9_product_type_profit",
    """
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity
                     AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adaptation (product-type profit). No partsupp →
    supply cost proxied as 0.6 * p_retailprice. Star join: lineitem fact
    vs three broadcast dims + orders; profit aggregated by supplier
    nation × order year.

    The per-row profit casts to DECIMAL(18,6) before SUM: decimal
    addition is exact and therefore order-independent, so the cross-engine
    hash can't flip at a ROUND boundary the way a double SUM did (observed
    one group off by a cent at sf0.01 from accumulation order alone)."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    supp = _load(spark, sf_dir, "supplier")
    orders = _load(spark, sf_dir, "orders")
    nation = _load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(profit.cast("decimal(18,6)")).cast("double"), 2
            ).alias("sum_profit")
        )
    )


@query(
    "q11_important_stock",
    """
    SELECT l_partkey,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                 AS DOUBLE), 2) AS part_value
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                 AS DOUBLE), 2) >
           (SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                   AS DOUBLE) * 0.0005, 2)
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7')
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adaptation (important stock). Stock value per part =
    SUM(l_extendedprice) over one nation's suppliers; keep parts above a
    fraction of the nation total (global-aggregate scalar subquery, kept
    in-plan via broadcast cross join — no driver collect). Both the group
    sums and the threshold round to 2 decimals on both engines."""
    li = _load(spark, sf_dir, "lineitem")
    supp = (
        _load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    base = li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
    threshold = base.agg(
        F.round(_dsum(F.col("l_extendedprice")) * F.lit(0.0005), 2).alias(
            "threshold"
        )
    )
    return (
        base.groupBy("l_partkey")
        .agg(F.round(_dsum(F.col("l_extendedprice")), 2).alias("part_value"))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@query(
    "q20_potential_promotion",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey
                        FROM lineitem JOIN part ON p_partkey = l_partkey
                        WHERE p_name LIKE 'small%'
                        GROUP BY l_suppkey
                        HAVING SUM(l_quantity) > 100)
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adaptation (promotion-eligible suppliers). No partsupp →
    eligibility is "shipped more than 100 units of small* parts", an
    IN-subquery with HAVING → aggregate + left-semi join. Quantities are
    integral doubles so the >100 sum is exact in both engines."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualified = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 100)
        .select("l_suppkey")
    )
    supp = _load(spark, sf_dir, "supplier")
    return supp.join(
        qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


@query(
    "q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adaptation (suppliers who kept orders waiting). No
    receipt/commit dates → "late" is proxied by l_returnflag = 'R': count,
    per supplier, finished multi-supplier orders where this supplier is
    the ONLY one with a returned item. Exercises the correlated
    EXISTS (left-semi with a non-equi residual) + NOT EXISTS (left-anti)
    pair — the reference's only missing join shapes (SURVEY.md §2.13)."""
    li = _load(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    orders_f = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    supp = _load(spark, sf_dir, "supplier")
    base = (
        l1.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "window_ranking_surface",
    """
    SELECT o_orderkey,
           ROW_NUMBER() OVER w1 AS rn,
           NTILE(4) OVER w1 AS quartile,
           RANK() OVER w2 AS rnk,
           DENSE_RANK() OVER w2 AS drnk,
           ROUND(PERCENT_RANK() OVER w2, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w2, 6) AS cume
    FROM orders
    WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
    """,
)
def window_ranking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window surface (SURVEY.md §2.13: absent in the reference,
    supplied by Spark built-ins). w1 is a deterministic total order for the
    position functions; w2 ranks on a tie-heavy key, which is deterministic
    for rank/dense_rank/percent_rank/cume_dist because they depend only on
    the ordering key values."""
    orders = _load(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return orders.select(
        "o_orderkey",
        F.row_number().over(w1).alias("rn"),
        F.ntile(4).over(w1).alias("quartile"),
        F.rank().over(w2).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
        F.round(F.percent_rank().over(w2), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w2), 6).alias("cume"),
    )


@query(
    "cube_order_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_prio,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                 AS DOUBLE), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping (SURVEY.md §2.13). GROUPING() markers disambiguate
    real NULLs from subtotal rows — the reason hash comparison across
    engines stays sound on the superset rows."""
    orders = _load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").alias("g_status"),
        F.grouping("o_orderpriority").alias("g_prio"),
        F.count("*").alias("n_orders"),
        F.round(_dsum(F.col("o_totalprice")), 2).alias("total_price"),
    )


@query(
    "grouping_sets_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_prio,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                 AS DOUBLE), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY.md §2.13 absent-category coverage
    beyond rollup/cube): three independent grouping lists in one pass —
    Spark plans a single Expand + hash aggregate, not three scans."""
    orders = _load(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").alias("g_status"),
        F.grouping("o_orderpriority").alias("g_prio"),
        F.count("*").alias("n_orders"),
        F.round(_dsum(F.col("o_totalprice")), 2).alias("total_price"),
    )


@query(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (SURVEY.md §2.13 distinct/ordered
    aggregates). Both engines interpolate lo + frac*(hi-lo) on the sorted
    group in float64, so values are compared at full precision — any
    rounding here would CREATE tie-boundary mismatches (quartile fracs are
    multiples of 0.0025, which always land on round-half ties at some
    decimal). Exact ordered-agg is the correctness baseline for the
    approx_percentile scale path."""
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.50)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("p75"),
        F.count("*").alias("n"),
    )


@query(
    "text_fingerprint",
    """
    WITH norm AS (
      SELECT doc_id,
             substring(
               regexp_replace(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                 '[^\\x20-\\x7e]', '', 'g'),
               1, 64) AS s
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN length(s) = 0 THEN 0 ELSE
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_split_to_array(s, ''),
                                c -> CAST(unicode(c) AS BIGINT))),
               (a, x) -> (a * 31 + x) % 2147483647)
           END AS fp
    FROM norm
    """,
)
def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via polynomial rolling hash (training-data
    north star: 'document fingerprinting (rolling hash)'). Deterministic
    int64 arithmetic -> full DuckDB oracle, unlike hash-function
    fingerprints."""
    docs = _load(spark, sf_dir, "documents")
    return tx.rolling_fingerprint_df(docs)


@query(
    "range_interval_join",
    """
    SELECT a.event_type,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT a.event_id) AS n_events_with_neighbor
    FROM events a JOIN events b
      ON a.event_type = b.event_type
     AND b.ts BETWEEN a.ts - INTERVAL 5 SECOND AND a.ts + INTERVAL 5 SECOND
     AND a.event_id <> b.event_id
    GROUP BY a.event_type
    """,
)
def range_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal band join: events of the same type within +-5s of each
    other. The oracle is the naive theta-join; the Spark plan is the
    bucketed equi-join from operators/rangejoin.py (linear, shuffle-
    partitionable — the 100 TB path where a theta-join would be a
    cartesian product)."""
    # raw loader: ts stays ntz so band_self_join's timestampdiff branch
    # engages — micros deltas become pure wall-clock arithmetic,
    # session-config-independent
    events = _events_raw(spark, sf_dir)
    pairs = band_self_join(
        events, ["event_type"], "ts", band_us=5_000_000, id_col="event_id"
    )
    return pairs.groupBy(F.col("a_event_type").alias("event_type")).agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct(F.col("a_event_id")).alias("n_events_with_neighbor"),
    )


@query(
    "window_tumbling_agg",
    """
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS window_start,
           time_bucket(INTERVAL 15 MINUTE, ts) + INTERVAL 15 MINUTE
             AS window_end,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_tumbling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window rollup (SURVEY.md §2.12). Runs the
    streaming builder itself in batch mode (withWatermark is a batch
    no-op), so the oracle validates the exact code path the availableNow
    streaming tests execute."""
    from erigon_extract_spark.streaming.latest_state import stream_windowed_counts

    events = _events_raw(spark, sf_dir)
    return stream_windowed_counts(
        events, "ts", window_duration="15 minutes", group_cols=["event_type"]
    )


def _zorder_oracle_sql() -> str:
    from erigon_extract_spark.operators.zorder import zorder_sql

    z = zorder_sql("user_id", "event_id % 1024")
    return f"""
    SELECT user_id, event_id, {z} AS zval
    FROM events
    """


@query("zorder_curve", _zorder_oracle_sql())
def zorder_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) codes over (user_id, event_id mod 1024) — the
    multi-dimensional layout key (operators/zorder.py) whose bit-interleave
    arithmetic the oracle reproduces verbatim in SQL. write_zordered sorts
    parquet by this code so row-group min/max stats prune on BOTH columns;
    tests/test_zorder.py measures the pruning win against a single-column
    sort."""
    from erigon_extract_spark.operators.zorder import zvalue

    ev = _load(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        zvalue(F.col("user_id"), F.col("event_id") % 1024).alias("zval"),
    )


@query(
    "session_window_agg",
    """
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    g AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                          >= CAST(300 AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
             AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def session_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (SURVEY.md §2.12 extension): a session is a
    maximal run of a key's events with inter-event gaps < 5 minutes; it
    closes 5 minutes after its last event. The oracle re-derives merge
    semantics via lag/cumsum grouping — a gap of EXACTLY the window starts
    a new session (Spark's half-open [start, last+gap) windows), hence
    ``>=`` in the oracle's gap test."""
    from erigon_extract_spark.streaming.latest_state import (
        stream_session_windows,
    )

    events = _events_raw(spark, sf_dir)
    return stream_session_windows(
        events, "ts", gap="5 minutes", key_cols=["user_id"], value_col="value"
    )


@query(
    "window_hopping_agg",
    """
    WITH hops AS (
      SELECT e.event_type, u.w_start AS window_start
      FROM events e,
           UNNEST([time_bucket(INTERVAL 15 MINUTE, ts),
                   time_bucket(INTERVAL 15 MINUTE, ts) - INTERVAL 15 MINUTE])
             AS u(w_start)
    )
    SELECT window_start,
           window_start + INTERVAL 30 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events
    FROM hops
    GROUP BY 1, 2, 3
    """,
)
def window_hopping_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) 30min/15min windows: each event counts in exactly
    window/slide = 2 overlapping windows. The oracle materializes the same
    assignment with a 2-element UNNEST — the explode Spark's Expand node
    performs physically."""
    from erigon_extract_spark.streaming.latest_state import stream_windowed_counts

    events = _events_raw(spark, sf_dir)
    return stream_windowed_counts(
        events,
        "ts",
        window_duration="30 minutes",
        group_cols=["event_type"],
        slide_duration="15 minutes",
    )


@query(
    "multimodal_probe",
    """
    WITH payload AS (
      SELECT doc_id, regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS s
      FROM documents
    ),
    h AS (
      SELECT doc_id, length(s) AS n_bytes,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   regexp_split_to_array(substring(s, 1, 64), ''),
                   c -> CAST(unicode(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) & 2147483647) AS hv
      FROM payload
    )
    SELECT doc_id, 'image/png' AS mime, n_bytes,
           CAST(64 + hv % 1920 AS INTEGER) AS width,
           CAST(64 + (hv // 256) % 1080 AS INTEGER) AS height,
           (hv // 65536) % 60000 AS duration_ms
    FROM h
    """,
)
def multimodal_probe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata extraction through the REAL mapInPandas decode
    path (operators/multimodal.py). Payloads are printable-ASCII text bytes,
    so the stub probe's byte fold is mirrorable as a char-code fold in SQL —
    the one payload family where the Arrow-batched binary pipeline gets a
    full value oracle rather than a rows-only check."""
    from erigon_extract_spark.operators.multimodal import extract_media_metadata

    docs = _load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.lit("image/png").alias("mime"),
        F.encode(
            F.regexp_replace(F.col("text"), r"[^\x20-\x7e]", ""), "utf-8"
        ).alias("payload"),
    )
    meta = extract_media_metadata(media, fake_decode=True)
    return meta.select(
        "doc_id", "mime", "n_bytes", "width", "height", "duration_ms"
    )


@query(
    "multimodal_framesample",
    """
    WITH payload AS (
      SELECT doc_id, regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS s
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   regexp_split_to_array(substring(s, 1, 64), ''),
                   c -> CAST(unicode(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) & 2147483647) AS hv
      FROM payload
    ),
    durations AS (
      SELECT doc_id, (hv // 65536) % 60000 AS duration_ms FROM h
      WHERE (hv // 65536) % 60000 > 0
    )
    SELECT doc_id, u.frame_ts_ms
    FROM durations,
         UNNEST(generate_series(0, CAST(duration_ms AS BIGINT) - 1, 1000))
           AS u(frame_ts_ms)
    """,
)
def multimodal_framesample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling WORK PLAN through the real metadata path: one row per
    (doc, frame timestamp) at 1 fps over the probed duration — the
    explode that turns opaque media into independently-schedulable work
    items. The oracle re-derives the stub probe's duration fold and the
    series expansion in SQL."""
    from erigon_extract_spark.operators.multimodal import frame_sample_plan

    docs = _load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.lit("image/png").alias("mime"),
        F.encode(
            F.regexp_replace(F.col("text"), r"[^\x20-\x7e]", ""), "utf-8"
        ).alias("payload"),
    )
    return frame_sample_plan(media, every_ms=1000)


@query(
    "sample_stable_split",
    """
    WITH b AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM b
    GROUP BY 1, 2
    """,
)
def sample_stable_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-hash bucket
    (operators/sampling.py): stable across runs, partitionings, and
    engines — the oracle checks the split MEMBERSHIP itself via the
    id_checksum, not just the counts."""
    from erigon_extract_spark.operators.sampling import stable_split

    docs = _load(spark, sf_dir, "documents")
    return stable_split(docs, "doc_id").groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("id_checksum"),
    )


@query(
    "sample_leakage_safe_split",
    """
    WITH base AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, lang, upper(text) || '   '
      FROM documents WHERE doc_id % 3 = 0
    ),
    norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      FROM base
    ),
    b AS (
      SELECT doc_id, md5(ntext) AS fp,
             CAST('0x' || substr(md5(ntext), 1, 8) AS BIGINT) % 100
               AS bucket
      FROM norm
    ),
    s AS (
      SELECT CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split,
             fp, doc_id
      FROM b
    )
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_fingerprints
    FROM s GROUP BY split
    UNION ALL
    SELECT '__all__', COUNT(*), COUNT(DISTINCT fp) FROM s
    """,
)
def sample_leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split (operators/sampling.
    leakage_safe_split): assignment is a pure function of the NORMALIZED
    CONTENT, so duplicates can never straddle train and test — the
    benchmark-contamination bug an id-hash split (sample_stable_split)
    commits by construction. The gate plants normalized duplicates
    (upper-cased + padded copies of every 3rd doc under new ids) and
    reports per-split doc/fingerprint counts plus the global row: no
    straddling ⟺ the per-split fingerprint counts sum to the global
    distinct count — an arithmetic the hash gate freezes and the pytest
    asserts explicitly."""
    from erigon_extract_spark.operators.sampling import leakage_safe_split
    from erigon_extract_spark.operators.text import normalize_text

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    dups = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "lang",
        F.concat(F.upper("text"), F.lit("   ")).alias("text"),
    )
    base = docs.unionByName(dups)
    s = leakage_safe_split(base, "text").withColumn(
        "fp", F.md5(normalize_text(F.col("text")))
    )
    per = s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_fingerprints"),
    )
    allr = s.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_fingerprints"),
    ).select(F.lit("__all__").alias("split"), "n_docs", "n_fingerprints")
    return per.unionByName(allr)


def _minhash_portable_ctes() -> str:
    """The md5-minhash CTE chain (words -> shingles -> hashes -> sigs ->
    bands -> candidate ``pairs``), shared by the portable-LSH oracle and
    the LSH->levenshtein composition oracle. Built programmatically so
    the permutation constants can never drift from operators/dedup.py."""
    from erigon_extract_spark.operators.dedup import (
        PORTABLE_AS,
        PORTABLE_BS,
        PORTABLE_P,
    )

    n, bands, rpb = 16, 4, 4
    mins = ",\n             ".join(
        f"MIN(({PORTABLE_AS[i]} * hv + {PORTABLE_BS[i]}) % {PORTABLE_P})"
        f" AS s{i}"
        for i in range(n)
    )
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws('_', "
        + ", ".join(f"s{b * rpb + r}" for r in range(rpb))
        + ")) AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 4), ' ') AS sh
      FROM words,
           UNNEST(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
      WHERE length(array_to_string(list_slice(w, i, i + 4), ' ')) > 0
    ),
    hv AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT)
               % {PORTABLE_P} AS hv
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      {band_selects}
    ),
    pairs AS (
      SELECT DISTINCT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    )"""


def _minhash_portable_oracle_sql() -> str:
    """Portable-LSH oracle: the shared CTE chain plus the 16-way
    signature-agreement projection."""
    n = 16
    agree = " + ".join(
        f"CAST(sa.s{i} = sb.s{i} AS INTEGER)" for i in range(n)
    )
    return f"""
    WITH {_minhash_portable_ctes()}
    SELECT p.doc_id_a, p.doc_id_b,
           ({agree}) / 16.0 AS sig_agreement
    FROM pairs p
      JOIN sig sa ON sa.doc_id = p.doc_id_a
      JOIN sig sb ON sb.doc_id = p.doc_id_b
    """


def _minhash_incremental_oracle_sql(split: int = 400) -> str:
    """Incremental dedup oracle: same md5-minhash sig/band CTEs as the
    portable variant, but candidates join NEW docs (id >= split) against
    the EXISTING corpus (id < split) only — never corpus-vs-corpus."""
    from erigon_extract_spark.operators.dedup import (
        PORTABLE_AS,
        PORTABLE_BS,
        PORTABLE_P,
    )

    n, bands, rpb = 16, 4, 4
    mins = ",\n             ".join(
        f"MIN(({PORTABLE_AS[i]} * hv + {PORTABLE_BS[i]}) % {PORTABLE_P})"
        f" AS s{i}"
        for i in range(n)
    )
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws('_', "
        + ", ".join(f"s{b * rpb + r}" for r in range(rpb))
        + ")) AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 4), ' ') AS sh
      FROM words,
           UNNEST(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
      WHERE length(array_to_string(list_slice(w, i, i + 4), ' ')) > 0
    ),
    hv AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT)
               % {PORTABLE_P} AS hv
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      {band_selects}
    )
    SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
    FROM bands n JOIN bands c
      ON n.band = c.band AND n.bucket = c.bucket
    WHERE n.doc_id >= {split} AND c.doc_id < {split}
    """


@query("dedup_incremental", _minhash_incremental_oracle_sql())
def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup: documents with id >= 400 stand in for
    the newly arrived batch; candidates are (new, corpus) band-bucket
    collisions only (operators/dedup.incremental_minhash_candidates) — at
    scale the corpus side is the stored append-only band table, so per-run
    cost follows the batch, not the corpus."""
    from erigon_extract_spark.operators.dedup import (
        incremental_minhash_candidates,
    )

    docs = _load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") >= 400)
    corpus = docs.filter(F.col("doc_id") < 400)
    return incremental_minhash_candidates(new, corpus)


@query("dedup_minhash_portable", _minhash_portable_oracle_sql())
def dedup_minhash_portable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-matched minhash LSH: md5-derived permutation hashes make
    shingling, signatures, banding, candidate pairs, AND the signature-
    agreement fraction reproducible in DuckDB — the correctness witness
    for the xxhash64 fast path (dedup_minhash_lsh, rows-only)."""
    from erigon_extract_spark.operators.dedup import minhash_lsh_pairs_portable

    docs = _load(spark, sf_dir, "documents")
    return minhash_lsh_pairs_portable(docs)


@query(
    "dedup_recall_eval",
    f"""
    WITH {_minhash_portable_ctes()},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b,
             COUNT(*) AS n_common
      FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    ),
    truth AS (
      SELECT i.doc_id_a, i.doc_id_b,
             CAST(n_common AS DOUBLE)
               / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS j,
             (p.doc_id_a IS NOT NULL) AS is_cand
      FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_id_a
        JOIN sizes sb ON sb.doc_id = i.doc_id_b
        LEFT JOIN pairs p
          ON p.doc_id_a = i.doc_id_a AND p.doc_id_b = i.doc_id_b
    ),
    th AS (SELECT * FROM (VALUES (0.2e0), (0.4e0), (0.6e0), (0.8e0))
           t(threshold))
    SELECT threshold,
           COUNT(*) AS n_true,
           CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hit,
           ROUND(CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS recall
    FROM truth JOIN th ON j >= threshold
    GROUP BY threshold
    """,
)
def dedup_recall_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-vs-exact recall for the DEDUP family (operators/dedup.
    lsh_recall_report — the twin of sim_recall_eval): per similarity
    threshold, what fraction of true Jaccard-similar pairs the banded
    minhash candidates recover. Truth and candidates hash the SAME
    widened 5-gram shingle sets, so the report isolates the banding
    s-curve (4 bands x 4 rows here). Both arms are md5-portable, so the
    ENTIRE evaluation — shingles, signatures, banding, the exact
    inverted-index truth join, the per-threshold recall quotients — is
    differential-hash-checked."""
    from erigon_extract_spark.operators.dedup import lsh_recall_report

    docs = _load(spark, sf_dir, "documents")
    return lsh_recall_report(docs)


def _simhash_portable_oracle_sql() -> str:
    """32-bit portable SimHash mirrored in SQL: per-bit ±1 vote sums,
    sign-bit reassembly, 8-bit chunk banding, Hamming filter."""
    from erigon_extract_spark.operators.dedup import PORTABLE_P

    n_bits, chunk_bits = 32, 8
    vote_cols = ",\n             ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(n_bits)
    )
    fp_sum = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(n_bits)
    )
    chunk_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, fp, {i} AS chunk, (fp >> {i * chunk_bits})"
        f" & {(1 << chunk_bits) - 1} AS ck FROM fp"
        for i in range(4)
    )
    return f"""
    WITH words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 1), ' ') AS sh
      FROM words,
           UNNEST(generate_series(1, greatest(len(w) - 1, 1))) AS t(i)
      WHERE length(array_to_string(list_slice(w, i, i + 1), ' ')) > 0
    ),
    hv AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT)
               % {PORTABLE_P} AS hv
      FROM sh
    ),
    votes AS (
      SELECT doc_id,
             {vote_cols}
      FROM hv GROUP BY doc_id
    ),
    fp AS (
      SELECT doc_id, {fp_sum} AS fp FROM votes
    ),
    chunks AS (
      {chunk_selects}
    ),
    pairs AS (
      SELECT DISTINCT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b,
             l.fp AS ha, r.fp AS hb
      FROM chunks l JOIN chunks r
        ON l.chunk = r.chunk AND l.ck = r.ck AND l.doc_id < r.doc_id
    )
    SELECT doc_id_a, doc_id_b, bit_count(xor(ha, hb)) AS hamming
    FROM pairs
    WHERE bit_count(xor(ha, hb)) <= 3
    """


@query("dedup_simhash_portable", _simhash_portable_oracle_sql())
def dedup_simhash_portable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-matched SimHash near-dup pairs — the correctness witness for
    the 63-bit xxhash64 fast path (dedup_simhash, rows-only)."""
    from erigon_extract_spark.operators.dedup import simhash_pairs_portable

    docs = _load(spark, sf_dir, "documents")
    return simhash_pairs_portable(docs)


# ONE ANSI string both engines parse and execute — the spark.sql() front
# end is itself part of the engine's user surface (SURVEY.md §2.13: the
# reference has no query language; ours is DataFrame + SQL).
_SQL_SURFACE = """
    WITH big AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
      FROM orders
      GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(b.spend) AS DOUBLE), 2) AS segment_spend
    FROM customer c JOIN big b ON b.o_custkey = c.c_custkey
    WHERE EXISTS (
      SELECT 1 FROM nation n
      WHERE n.n_nationkey = c.c_nationkey AND n.n_regionkey < 3
    )
    GROUP BY c.c_mktsegment
"""


@query("sql_entrypoint", _SQL_SURFACE)
def sql_entrypoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front end as a first-class entry point: register the tables
    as views, submit the IDENTICAL ANSI text the DuckDB oracle runs (CTE,
    correlated EXISTS, decimal aggregation), return the result. Catalyst
    plans the EXISTS as a broadcast semi join — same physical shape as the
    DataFrame-API queries."""
    for t in ("orders", "customer", "nation"):
        _load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_SURFACE)


@query(
    "json_extract_agg",
    """
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_total
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
    """,
)
def json_extract_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar surface (SURVEY.md §2.13): extract a field from the
    semi-structured props column JVM-side (get_json_object — no Python in
    the path) and aggregate on it. At scale the extraction is a map-side
    projection; only the grouped result shuffles."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.filter(k.isNotNull())
        .groupBy("event_type", (k % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.sum(k).alias("k_total"))
    )


@query(
    "date_scalar_surface",
    """
    SELECT EXTRACT(YEAR FROM l_shipdate) AS y,
           EXTRACT(MONTH FROM l_shipdate) AS m,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS qty,
           MIN(EXTRACT(dow FROM l_shipdate)) AS min_dow,
           MAX(EXTRACT(doy FROM l_shipdate)) AS max_doy,
           MIN(date_diff('day', DATE '1992-01-01', l_shipdate)) AS min_epoch_day
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def date_scalar_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar library over the ship-date axis (SURVEY.md §2.13;
    the reference's only time axis is the block number). Conventions are
    normalized to DuckDB's: dow 0=Sunday (Spark dayofweek is 1=Sunday),
    doy and EXTRACT match directly."""
    li = _load(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate")
    return li.groupBy(
        F.year(d).alias("y"), F.month(d).alias("m")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.min(F.dayofweek(d) - 1).alias("min_dow"),
        F.max(F.dayofyear(d)).alias("max_doy"),
        F.min(F.datediff(d, F.lit("1992-01-01"))).alias("min_epoch_day"),
    )


@query(
    "array_scalar_surface",
    """
    SELECT vec_id,
           len(embedding) AS n_dims,
           list_max(embedding) AS max_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           embedding[5] AS fifth
    FROM embeddings
    """,
)
def array_scalar_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar library (SURVEY.md §2.13) over the embedding column:
    size / max / filtered count / indexing, all structural (no float
    accumulation, so values compare exactly). DuckDB lists are 1-indexed;
    element_at matches that convention."""
    emb = _load(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(v).alias("n_dims"),
        F.array_max(v).alias("max_val"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.element_at(v, 5).alias("fifth"),
    )


@query(
    "text_explode_sentences",
    """
    SELECT doc_id, i AS sentence_idx, length(w[i]) AS sentence_len
    FROM (
      SELECT doc_id, string_split(text, '. ') AS w FROM documents
    ), UNNEST(generate_series(1, len(w))) AS t(i)
    WHERE length(w[i]) > 0
    """,
)
def text_explode_sentences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating surface (the UDTF shape, §2.13) as a built-in
    posexplode — one row per sentence with its ordinal. At scale this is a
    map-side Generate node: no shuffle, output partitioning inherits the
    scan."""
    docs = _load(spark, sf_dir, "documents")
    split_col = F.split(F.col("text"), r"\. ")
    return (
        docs.select("doc_id", F.posexplode(split_col).alias("pos", "s"))
        .filter(F.length("s") > 0)
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("sentence_idx"),
            F.length("s").alias("sentence_len"),
        )
    )


@query(
    "stream_latest_state_batch",
    """
    SELECT user_id,
           MAX(ts) AS ts,
           arg_max(event_type, ts) AS event_type,
           arg_max(value, ts) AS value
    FROM events
    GROUP BY user_id
    """,
)
def stream_latest_state_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming latest-state builder itself, oracle-gated in batch
    mode (no (user_id, ts) ties in the data, so max_by/arg_max agree
    deterministically). This is the running-state operator the update-mode
    stream maintains — O(#live keys) state at any input size."""
    from erigon_extract_spark.streaming.latest_state import stream_latest_state

    ev = _events_raw(spark, sf_dir)  # ntz out: wall-clock parity, any session
    return stream_latest_state(
        ev, ["user_id"], version_col="ts", value_cols=["event_type", "value"]
    ).select("user_id", "ts", "event_type", "value")


@query(
    "dedup_substring_spans",
    """
    WITH base AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, i AS pos, md5(substr(t, i, 40)) AS h
      FROM base, UNNEST(generate_series(1, length(t) - 39, 10)) AS u(i)
      WHERE length(t) >= 40
    ),
    dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
    brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= 40
                  THEN 0 ELSE 1 END AS b
      FROM hits
    ),
    grp AS (
      SELECT doc_id, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS gid
      FROM brk
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + 39 AS span_end,
           MAX(pos) + 40 - MIN(pos) AS span_len
    FROM grp GROUP BY doc_id, gid
    """,
)
def dedup_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-LEVEL dedup (duplicate spans, not duplicate documents):
    the Spark analogue of suffix-array substring dedup (Lee et al. 2022),
    via strided gram fingerprints + gaps-and-islands merge
    (operators/dedup.duplicate_spans). Completes the dedup family:
    exact doc (md5), near-dup doc (minhash/simhash/jaccard/embedding),
    and now within-doc duplicated REGIONS across the corpus."""
    from erigon_extract_spark.operators.dedup import duplicate_spans

    docs = _load(spark, sf_dir, "documents")
    return duplicate_spans(docs, width=40, stride=10)


@query(
    "text_quality_classifier",
    """
    WITH tok AS (
      SELECT doc_id, tok
      FROM (
        SELECT doc_id,
               UNNEST(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '
               )) AS tok
        FROM documents
      )
      WHERE length(tok) > 0
    ),
    w AS (
      SELECT doc_id,
             (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024)
               * 2654435761 % 2001 - 1000 AS w
      FROM tok
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(SUM(w) AS BIGINT) AS weight_sum
      FROM w GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, weight_sum,
           ROUND(0.5 + (0.5 * (CAST(weight_sum AS DOUBLE)
                               / CAST(n_tokens * 1000 AS DOUBLE)))
                       / (1.0 + abs(CAST(weight_sum AS DOUBLE)
                                    / CAST(n_tokens * 1000 AS DOUBLE))), 6)
             AS quality_score,
           ROUND(0.5 + (0.5 * (CAST(weight_sum AS DOUBLE)
                               / CAST(n_tokens * 1000 AS DOUBLE)))
                       / (1.0 + abs(CAST(weight_sum AS DOUBLE)
                                    / CAST(n_tokens * 1000 AS DOUBLE))), 6)
             >= 0.5 AS keep
    FROM agg
    """,
)
def text_quality_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fasttext-classifier stage of
    CCNet/RefinedWeb-style curation) as a hashed-feature linear scorer
    whose integer weight table is md5-derived, so the IDENTICAL model runs
    in DuckDB for the hash gate (operators/text.hashed_linear_quality).
    Integer weight sums make the score independent of accumulation order —
    no float-reduction nondeterminism at any parallelism."""
    from erigon_extract_spark.operators.text import hashed_linear_quality

    docs = _load(spark, sf_dir, "documents")
    return hashed_linear_quality(docs)


@query(
    "agg_cms_heavy_hitters",
    """
    WITH r AS (
      SELECT CAST(user_id AS VARCHAR) AS k, i
      FROM events, UNNEST(generate_series(0, 3)) AS u(i)
    ),
    cells AS (
      SELECT i,
             CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '_' || k), 1, 8)
                  AS BIGINT) % 64 AS b,
             COUNT(*) AS cnt
      FROM r GROUP BY 1, 2
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS true_count FROM events GROUP BY user_id
    ),
    probes AS (
      SELECT e.user_id, u.i,
             CAST('0x' || substr(md5(CAST(u.i AS VARCHAR) || '_'
                                     || CAST(e.user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 64 AS b
      FROM exact e, UNNEST(generate_series(0, 3)) AS u(i)
    ),
    est AS (
      SELECT p.user_id, MIN(c.cnt) AS est_count
      FROM probes p JOIN cells c ON p.i = c.i AND p.b = c.b
      GROUP BY p.user_id
    )
    SELECT e.user_id, est_count, true_count,
           est_count - true_count AS overestimate
    FROM est JOIN exact e USING (user_id)
    ORDER BY est_count DESC, user_id LIMIT 20
    """,
)
def agg_cms_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection via a count-min sketch (operators/sketch):
    the frequency summary is a constant 4x64 cell table regardless of key
    cardinality — the sketch aggregate a 100 TB job keeps INSTEAD of the
    full groupBy. md5-derived hash rows make sketch + estimates exactly
    reproducible in the DuckDB oracle; the exact counts ride along to
    exhibit the one-sided (overestimate-only) error bound."""
    from erigon_extract_spark.operators.sketch import cms_heavy_hitters

    ev = _events(spark, sf_dir)
    return cms_heavy_hitters(ev, "user_id", depth=4, width=64, top_k=20)


@query(
    "agg_bloom_membership",
    """
    WITH members AS (
      -- every customer has orders in the synthetic tables, so a sparse
      -- member subset is carved deterministically to exercise negatives
      SELECT DISTINCT o_custkey AS key FROM orders WHERE o_custkey % 7 = 0
    ),
    mh AS (
      SELECT key,
             CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8) AS BIGINT)
               AS h1,
             CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 9, 8) AS BIGINT)
               | 1 AS h2
      FROM members
    ),
    pos AS (
      SELECT ((h1 + i * h2) % 4096) AS p
      FROM mh, UNNEST(generate_series(0, 3)) AS u(i)
    ),
    bloom AS (
      SELECT p // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
      FROM pos GROUP BY 1
    ),
    ph AS (
      SELECT c_custkey,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                  AS BIGINT) AS h1,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)
                  AS BIGINT) | 1 AS h2
      FROM customer
    ),
    pp AS (
      SELECT c_custkey, ((h1 + i * h2) % 4096) AS p
      FROM ph, UNNEST(generate_series(0, 3)) AS u(i)
    ),
    hits AS (
      SELECT c_custkey,
             (COALESCE(b.bits, 0)
              & (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)))
               = (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS h
      FROM pp LEFT JOIN bloom b ON pp.p // 32 = b.word
    )
    SELECT c_custkey,
           bool_and(h) AS maybe,
           MAX(c_custkey IN (SELECT key FROM members)) AS actual
    FROM hits GROUP BY c_custkey
    """,
)
def agg_bloom_membership_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership (operators/sketch.bloom_build /
    bloom_maybe_contains): the customers-with-orders key set reduced to a
    4096-bit word table that BROADCASTS, probed by every customer with k
    broadcast 1:1 joins — zero shuffles on the probe side (plan-asserted
    in pytest). m is deliberately undersized (~1000 keys in 4096 bits) so
    false positives exist and the gate pins WHICH keys false-positive:
    the md5 double-hash family makes the exact bit pattern, not just the
    rate, reproducible in ANSI SQL. ``actual`` rides along to exhibit the
    no-false-negative guarantee. At 100 TB this is the semi-join prefilter
    (bloom_prune_join): the fact table only shuffles Bloom survivors."""
    from erigon_extract_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    # full key coverage in the synthetic tables -> carve a sparse member
    # subset so the probe set contains real negatives
    members = (
        orders.filter(F.col("o_custkey") % 7 == 0)
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    bloom = bloom_build(members, "key", m_bits=4096, k=4)
    out = bloom_maybe_contains(
        bloom, cust.select("c_custkey"), "c_custkey", m_bits=4096, k=4
    )
    truth = members.select(
        F.col("key").alias("c_custkey"), F.lit(True).alias("__in")
    )
    return (
        out.join(F.broadcast(truth), "c_custkey", "left")
        .select(
            "c_custkey",
            "maybe",
            F.coalesce("__in", F.lit(False)).alias("actual"),
        )
    )


def _hll_oracle_sql() -> str:
    m = 64
    alpha_mm = (0.7213 / (1 + 1.079 / m)) * m * m
    # repr round-trips the exact double, so DuckDB parses the identical
    # value Spark embeds as a literal — the one float input to the gate
    return f"""
    WITH kr AS (
      SELECT source,
             CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % {m} AS bucket,
             CASE WHEN CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) = 0
                  THEN 33
                  ELSE 33 - length(to_base(
                         CAST('0x' || substr(md5(text), 9, 8) AS BIGINT), 2))
             END AS rho
      FROM documents
    ),
    sk AS (
      SELECT source, bucket, MAX(rho) AS r FROM kr GROUP BY 1, 2
    ),
    agg AS (
      SELECT source,
             COUNT(*) AS present,
             CAST(SUM(CAST(1 AS BIGINT) << CAST(50 - r AS INTEGER))
                  AS BIGINT) AS s_present
      FROM sk GROUP BY source
    ),
    ex AS (
      SELECT source, COUNT(DISTINCT text) AS true_distinct
      FROM documents GROUP BY source
    )
    SELECT a.source, present,
           {m} - present AS zeros,
           CAST(s_present + ({m} - present) * (CAST(1 AS BIGINT) << 50)
                AS BIGINT) AS harmonic_scaled,
           -- CAST: DuckDB parses bare decimal literals as DECIMAL, whose
           -- arithmetic overflows and differs from Spark's double path
           ROUND(CAST({alpha_mm!r} AS DOUBLE)
                 * CAST({float(1 << 50)!r} AS DOUBLE)
                 / CAST(s_present + ({m} - present)
                        * (CAST(1 AS BIGINT) << 50) AS DOUBLE), 2) AS est,
           true_distinct
    FROM agg a JOIN ex USING (source)
    """


@query("agg_hll_distinct", _hll_oracle_sql())
def agg_hll_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count estimation via HyperLogLog (operators/sketch):
    64 integer registers per source replace COUNT(DISTINCT text)'s
    key-wide shuffle — the profiling-at-scale primitive (a 100 TB column
    profile keeps the mergeable sketch, not the key set). The harmonic
    sum is an exact BIGINT over denominator 2^50 (order-independent — no
    float accumulation anywhere), so the full sketch AND the estimate
    hash-match the SQL oracle; exact distinct rides along to exhibit
    accuracy. Completes the sketch family: CMS (frequency), Bloom
    (membership), HLL (cardinality)."""
    from erigon_extract_spark.operators.sketch import hll_build, hll_estimate

    docs = _load(spark, sf_dir, "documents")
    sk = hll_build(docs, "text", m=64, group_cols=["source"])
    est = hll_estimate(sk, m=64, group_cols=["source"])
    exact = docs.groupBy("source").agg(
        F.countDistinct("text").alias("true_distinct")
    )
    return est.join(exact, "source")


@query(
    "corpus_mixture_plan",
    """
    WITH supply AS (
      SELECT source,
             CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0
                           THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+'))
                      END) AS BIGINT) AS available_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source,
             CAST(1 + CAST(substr(source, 4) AS INTEGER) % 3 AS BIGINT)
               AS weight
      FROM (SELECT DISTINCT source FROM documents)
    ),
    tw AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_w FROM w),
    planned AS (
      SELECT s.source, s.available_tokens, w.weight,
             CAST((500000 * w.weight) // tw.total_w AS BIGINT)
               AS target_tokens
      FROM supply s JOIN w USING (source), tw
    )
    SELECT source, available_tokens, weight, target_tokens,
           CAST(CASE WHEN available_tokens = 0 THEN 0
                     ELSE target_tokens // available_tokens
                END AS BIGINT) AS full_epochs,
           CAST(CASE WHEN available_tokens = 0 THEN 0
                     ELSE ((target_tokens % available_tokens) * 1000)
                          // available_tokens
                END AS BIGINT) AS residual_permille,
           CAST(CASE WHEN available_tokens = 0 THEN 0
                     ELSE (target_tokens // available_tokens)
                          * available_tokens
                          + (available_tokens
                             * (((target_tokens % available_tokens) * 1000)
                                // available_tokens)) // 1000
                END AS BIGINT) AS expected_tokens
    FROM planned
    """,
)
def corpus_mixture_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning (operators/sampling.
    plan_token_mixture): per-source weights + a 500k-token budget turn
    into full_epochs complete passes plus one residual_permille partial
    pass — expected_tokens <= target always (a ceil-epochs plan would
    overshoot by up to a whole epoch); zero-supply sources plan to zero
    instead of dividing by it. One map-side-combined supply aggregate
    (one row per source); the corpus is never shuffled. All-integer
    arithmetic (div, never float division) keeps the plan hash-identical
    across engines."""
    from erigon_extract_spark.operators.sampling import plan_token_mixture

    docs = _load(spark, sf_dir, "documents")
    weights = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                1 + F.substring("source", 4, 10).cast("int") % 3
            ).cast("long").alias("weight"),
        )
    )
    return plan_token_mixture(
        docs, weights, token_budget=500_000
    )


@query(
    "dedup_winnowing",
    """
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
      WHERE length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) >= 5
    ),
    g AS (
      SELECT doc_id, i,
             CAST('0x' || substr(md5(substr(t, CAST(i AS INTEGER), 5)), 1, 8)
                  AS BIGINT) AS h
      FROM t, UNNEST(generate_series(1, length(t) - 4)) AS u(i)
    ),
    m AS (SELECT doc_id, MAX(i) AS mx FROM g GROUP BY doc_id),
    starts AS (
      SELECT doc_id, p
      FROM m, UNNEST(generate_series(1, greatest(mx - 3, 1))) AS u(p)
    ),
    win AS (
      SELECT s.doc_id, s.p, g.h, g.i
      FROM starts s
      JOIN g ON g.doc_id = s.doc_id AND g.i BETWEEN s.p AND s.p + 3
    ),
    sel AS (SELECT doc_id, p, MIN(h) AS mh FROM win GROUP BY doc_id, p),
    pick AS (
      SELECT w.doc_id, MAX(w.i) AS pos, s.mh AS gram_hash
      FROM win w
      JOIN sel s ON w.doc_id = s.doc_id AND w.p = s.p AND w.h = s.mh
      GROUP BY w.doc_id, w.p, s.mh
    )
    SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, gram_hash
    FROM pick
    """,
)
def dedup_winnowing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (operators/dedup.winnowing_fingerprints;
    Schleimer et al. 2003): min-hash-per-window selection with rightmost
    tie-breaking, k=5 char grams, w=4 windows — any >=8-char shared
    substring between docs shares a fingerprint. Zero-shuffle per-row
    array HOFs on the Spark side; the oracle rebuilds the same selection
    relationally (window starts x grams band join). The full selected
    set — positions, hashes, tie decisions — is under the value hash."""
    from erigon_extract_spark.operators.dedup import winnowing_fingerprints

    docs = _load(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, k=5, w=4)


@query(
    "dedup_winnowing_matches",
    """
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
      WHERE length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) >= 5
    ),
    g AS (
      SELECT doc_id, i,
             CAST('0x' || substr(md5(substr(t, CAST(i AS INTEGER), 5)), 1, 8)
                  AS BIGINT) AS h
      FROM t, UNNEST(generate_series(1, length(t) - 4)) AS u(i)
    ),
    m AS (SELECT doc_id, MAX(i) AS mx FROM g GROUP BY doc_id),
    starts AS (
      SELECT doc_id, p
      FROM m, UNNEST(generate_series(1, greatest(mx - 3, 1))) AS u(p)
    ),
    win AS (
      SELECT s.doc_id, s.p, g.h, g.i
      FROM starts s
      JOIN g ON g.doc_id = s.doc_id AND g.i BETWEEN s.p AND s.p + 3
    ),
    sel AS (SELECT doc_id, p, MIN(h) AS mh FROM win GROUP BY doc_id, p),
    dh AS (SELECT DISTINCT doc_id, mh AS gram_hash FROM sel),
    hot AS (
      SELECT gram_hash FROM dh GROUP BY gram_hash HAVING COUNT(*) <= 1000
    ),
    usable AS (SELECT dh.* FROM dh JOIN hot USING (gram_hash)),
    -- denominators from the df-capped space, same as the shared counts
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_fp FROM usable GROUP BY doc_id
    ),
    pairs AS (
      SELECT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b,
             COUNT(*) AS shared_fp
      FROM usable l JOIN usable r USING (gram_hash)
      WHERE l.doc_id < r.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 100
    )
    SELECT doc_id_a, doc_id_b, shared_fp,
           ROUND(CAST(shared_fp AS DOUBLE) / sa.n_fp, 6) AS cover_a,
           ROUND(CAST(shared_fp AS DOUBLE) / sb.n_fp, 6) AS cover_b
    FROM pairs
    JOIN sizes sa ON sa.doc_id = pairs.doc_id_a
    JOIN sizes sb ON sb.doc_id = pairs.doc_id_b
    """,
)
def dedup_winnowing_matches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style clone report (operators/dedup.winnowing_matches): doc
    pairs sharing >= 100 winnowing fingerprints (the synthetic corpus is highly self-similar, so the gate pins the true-clone tail) with shared counts and
    per-side coverage fractions. The inverted-index join runs on the
    ~2/(w+1)-density fingerprint hashes with a hot-hash df cap (the LSH
    max_bucket_size argument) — join volume bounded by rare-hash
    collisions, never a text self-join."""
    from erigon_extract_spark.operators.dedup import winnowing_matches

    docs = _load(spark, sf_dir, "documents")
    return winnowing_matches(docs, k=5, w=4, min_shared=100)


@query(
    "events_scd2_intervals",
    """
    SELECT user_id,
           event_id AS valid_from,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
             AS valid_to,
           event_type,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
             IS NULL AS is_current
    FROM events
    """,
)
def events_scd2_intervals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog -> validity intervals (operators/windows.intervalize):
    the SCD-type-2 / temporal-table materialization, dual of the as-of
    operators — all historical states with [valid_from, valid_to) ranges
    so any point-in-time query is a BETWEEN predicate. One hash shuffle,
    lead() inside the same partitioning."""
    from erigon_extract_spark.operators.windows import intervalize

    ev = _events_raw(spark, sf_dir)
    return intervalize(ev, ["user_id"], "event_id", ["event_type"])


@query(
    "graph_triangle_count",
    """
    WITH raw AS (SELECT i FROM UNNEST(generate_series(0, 599)) AS t(i)),
    base AS (
      SELECT i % 200 AS u, (i * 7 + 3) % 200 AS v FROM raw
      UNION ALL
      SELECT i % 200 AS u, (i * 13 + 5) % 200 AS v FROM raw
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
      FROM base WHERE u != v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def graph_triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.triangle_count) with
    degree-ordered orientation — out-degrees bounded by O(sqrt(E)), so
    the wedge join is O(E^1.5) worst case instead of a hub vertex's
    deg^2 (the skew argument). Deterministic synthetic graph (600 edge
    draws over 200 vertices, two affine generators) built identically
    from spark.range and generate_series; the oracle counts canonical
    a<b<c triangles by 3-way join."""
    from erigon_extract_spark.operators.graph import triangle_count

    raw = spark.range(600)
    base = raw.select(
        (F.col("id") % 200).alias("src"),
        ((F.col("id") * 7 + 3) % 200).alias("dst"),
    ).unionAll(
        raw.select(
            (F.col("id") % 200).alias("src"),
            ((F.col("id") * 13 + 5) % 200).alias("dst"),
        )
    )
    return triangle_count(base)


@query(
    "multimodal_audio_features",
    """
    WITH s AS (
      SELECT d.d AS doc_id, i.i AS i,
             ((i.i * (d.d + 3)) % 256 - 128) * 100 AS x
      FROM UNNEST(generate_series(0, 49)) AS d(d),
           UNNEST(generate_series(0, 1599)) AS i(i)
    ),
    sgn AS (
      SELECT doc_id, i,
             CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 END AS sg
      FROM s WHERE x != 0
    ),
    cross_cnt AS (
      SELECT doc_id, CAST(COUNT(*) FILTER (WHERE sg != prev) AS BIGINT)
               AS crossings
      FROM (SELECT doc_id, sg,
                   LAG(sg) OVER (PARTITION BY doc_id ORDER BY i) AS prev
            FROM sgn)
      GROUP BY doc_id
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(x * x) AS BIGINT) AS ss,
             CAST(MAX(abs(x)) AS BIGINT) AS mx
      FROM s GROUP BY doc_id
    )
    SELECT a.doc_id,
           8000 AS sample_rate,
           CAST(200 AS BIGINT) AS duration_ms,
           ROUND(sqrt(CAST(ss AS DOUBLE) / 1600.0) / 32768.0, 9) AS rms,
           ROUND(CAST(mx AS DOUBLE) / 32768.0, 9) AS peak,
           ROUND(CAST(crossings AS DOUBLE) * 8000.0 / 1600.0, 6)
             AS zcr_per_s,
           sqrt(CAST(ss AS DOUBLE) / 1600.0) / 32768.0 < 0.01 AS silent
    FROM agg a JOIN cross_cnt USING (doc_id)
    """,
)
def multimodal_audio_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL audio kernel under the value hash: 50 deterministic
    integer-PCM clips are synthesized per executor, encoded to actual WAV
    bytes (functions/wav.encode_wav), then parsed back and
    feature-extracted by the real RIFF kernel
    (operators/multimodal.extract_audio_features) — while the oracle
    derives RMS/peak/zero-crossing rate relationally from the same sample
    formula. Hash-matching proves the full byte round trip AND the
    feature math: sums of squares stay integer-exact (all partial sums <
    2^53, so numpy's float64 accumulation is exact and order-free), and
    the only irrational ops (sqrt, one division) are IEEE
    correctly-rounded on both engines."""
    import pandas as pd

    def synth(batches):
        import numpy as np

        from erigon_extract_spark.functions.wav import encode_wav

        for pdf in batches:
            i = np.arange(1600, dtype=np.int64)
            rows = []
            for d in pdf["id"]:
                x = (((i * (int(d) + 3)) % 256) - 128) * 100
                rows.append(
                    (int(d), bytearray(encode_wav(x.astype("int16"), 8000)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    from erigon_extract_spark.operators.multimodal import (
        extract_audio_features,
    )

    media = spark.range(50).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )
    out = extract_audio_features(media)
    return out.select(
        "doc_id",
        "sample_rate",
        "duration_ms",
        "rms",
        "peak",
        "zcr_per_s",
        "silent",
    )


@query(
    "multimodal_png_roundtrip",
    """
    WITH px AS (
      SELECT d.d AS doc_id, y.y AS y, x.x AS x,
             (d.d * 37 + y.y * 19 + x.x * 7 + (y.y * x.x) % 11) % 256 AS v
      FROM UNNEST(generate_series(0, 29)) AS d(d),
           UNNEST(generate_series(0, 14)) AS y(y),
           UNNEST(generate_series(0, 14)) AS x(x)
    ),
    resized AS (
      -- 15 -> 5 bilinear sample points land exactly on source pixels
      -- ((j + 0.5) * 3 - 0.5 = 3j + 1): pure gather, no interpolation
      SELECT doc_id, v FROM px
      WHERE y % 3 = 1 AND x % 3 = 1
    )
    SELECT doc_id,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max,
           CAST(COUNT(*) AS BIGINT) AS n_px
    FROM resized GROUP BY doc_id
    """,
)
def multimodal_png_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image kernel under the value hash: 30 deterministic 15x15
    grayscale images are synthesized per executor, pushed through the
    actual PNG encoder, DECODER, and bilinear resize (functions/png.py —
    real zlib deflate round trip, real pixel gather), and reduced to
    per-image pixel statistics — while the oracle derives the same stats
    straight from the pixel formula. The 15->5 resize is chosen so every
    bilinear sample point lands exactly on a source pixel (3j+1), making
    the resized pixels integer-exact with no rounding-mode dependence;
    the interpolating case is pytest-pinned instead."""
    import pandas as pd

    def roundtrip(batches):
        import numpy as np

        from erigon_extract_spark.functions.png import (
            decode_png,
            encode_png,
            resize_bilinear,
        )

        for pdf in batches:
            yy, xx = np.mgrid[0:15, 0:15]
            rows = []
            for d in pdf["id"]:
                d = int(d)
                img = (
                    (d * 37 + yy * 19 + xx * 7 + (yy * xx) % 11) % 256
                ).astype("uint8")
                small = resize_bilinear(
                    decode_png(encode_png(img)), 5, 5
                )[:, :, 0].astype("int64")
                rows.append(
                    (d, int(small.sum()), int(small.min()),
                     int(small.max()), int(small.size))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "px_sum", "px_min", "px_max", "n_px"],
            )

    return spark.range(30).mapInPandas(
        roundtrip,
        schema="doc_id long, px_sum long, px_min long, px_max long, "
               "n_px long",
    )


@query(
    "multimodal_jpeg_roundtrip",
    """
    WITH tiles AS (
      SELECT d.d AS doc_id, ty.ty AS ty, tx.tx AS tx,
             128 + 2 * ((d.d * 7 + ty.ty * 5 + tx.tx * 3) % 53 - 26) AS v
      FROM UNNEST(generate_series(0, 29)) AS d(d),
           UNNEST(generate_series(0, 3)) AS ty(ty),
           UNNEST(generate_series(0, 3)) AS tx(tx)
    )
    SELECT doc_id,
           CAST(64 * SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max,
           CAST(64 * COUNT(*) AS BIGINT) AS n_px
    FROM tiles GROUP BY doc_id
    """,
)
def multimodal_jpeg_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL JPEG kernel under the value hash (functions/jpeg.py —
    actual Huffman entropy coding, DCT, quantization, restart markers):
    30 deterministic 32x32 grayscale images built from 8x8-constant
    tiles are encoded and decoded per executor, and reduced to per-image
    pixel statistics the oracle derives straight from the tile formula.

    Why this is EXACT despite JPEG being lossy: a constant 8x8 block has
    only a DC coefficient (orthonormal DCT: 8*(v-128)); at quality 50
    the Annex K luminance DC quantizer is 16, and tile values are even
    offsets from 128, so 8*(v-128) is divisible by 16 — quantization
    loses nothing and the IDCT reconstructs v bit-exactly (the float
    epsilon is ~1e-14, killed by the final round). The tile grid still
    exercises the full codec: per-block DC prediction with negative
    diffs, Huffman tables, bit packing with FF-stuffing, and the
    restart-marker resync path (restart_interval=3 — 16 MCUs per image
    means five RSTn markers under the hash). Lossy-path fidelity is
    pytest-pinned by PSNR floors instead (tests/test_jpeg.py)."""
    import pandas as pd

    def roundtrip(batches):
        import numpy as np

        from erigon_extract_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        for pdf in batches:
            ty, tx = np.mgrid[0:4, 0:4]
            rows = []
            for d in pdf["id"]:
                d = int(d)
                tiles = 128 + 2 * ((d * 7 + ty * 5 + tx * 3) % 53 - 26)
                img = np.repeat(
                    np.repeat(tiles, 8, axis=0), 8, axis=1
                ).astype("uint8")
                back = decode_jpeg(
                    encode_jpeg(img, quality=50, restart_interval=3)
                )[:, :, 0].astype("int64")
                rows.append(
                    (d, int(back.sum()), int(back.min()),
                     int(back.max()), int(back.size))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "px_sum", "px_min", "px_max", "n_px"],
            )

    return spark.range(30).mapInPandas(
        roundtrip,
        schema="doc_id long, px_sum long, px_min long, px_max long, "
               "n_px long",
    )


# Formula-derived oracle (VERDICT r5 #4; replaces the r4 pinned
# constant 783592384): PNG is lossless, so the decoded pixels ARE the
# generator formula, and the 64->32 bilinear resize with
# align-corners=False samples output centers at 2i+0.5 — exactly the
# mean of each 2x2 block, rounded half-to-even per channel (np.rint).
# The oracle recomputes the checksum from that closed form (s = the 2x2
# block sum; round-half-even of s/4 is the CASE on s % 4), independent
# of the engine's codec path.
@query(
    "multimodal_png_scale",
    """
    WITH px AS (
      SELECT d.d AS d, i.i AS i, j.j AS j, c.c AS c,
             SUM(CASE c.c
                   WHEN 0 THEN ((2*i.i + dy.dy) * 3 + (2*j.j + dx.dx) * 5 + d.d) % 256
                   WHEN 1 THEN ((2*i.i + dy.dy) * 7 + (2*j.j + dx.dx) + d.d * 11) % 256
                   ELSE        ((2*i.i + dy.dy) + (2*j.j + dx.dx) * 13 + d.d * 2) % 256
                 END) AS s
      FROM UNNEST(generate_series(0, 1999)) AS d(d),
           UNNEST(generate_series(0, 31)) AS i(i),
           UNNEST(generate_series(0, 31)) AS j(j),
           UNNEST(generate_series(0, 2)) AS c(c),
           UNNEST(generate_series(0, 1)) AS dy(dy),
           UNNEST(generate_series(0, 1)) AS dx(dx)
      GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(2000 AS BIGINT) AS n_images,
           CAST(SUM(CASE WHEN s % 4 = 3 THEN s // 4 + 1
                         WHEN s % 4 = 2 THEN s // 4 + (s // 4) % 2
                         ELSE s // 4 END) AS BIGINT) AS checksum
    FROM px
    """,
)
def multimodal_png_scale_q(
    spark: SparkSession, sf_dir: str, scale: int = 1
) -> DataFrame:
    """Real-PNG kernel throughput at benchmark volume: 2,000 synthetic
    64x64 RGB images per run, each taking the full encode -> zlib ->
    decode -> bilinear-resize-to-32x32 round trip inside the
    Arrow-batched executor path, reduced to one checksum row. The
    measured witness that the pure-numpy codec sustains corpus-scale
    image preprocessing (the fake-decode queries measure plumbing; this
    measures the kernel). ``scale`` multiplies the image count;
    bench.py's scale section runs scale=10 (embarrassingly parallel —
    the curve should be the flattest of the four probes)."""
    import pandas as pd

    def work(batches):
        import numpy as np

        from erigon_extract_spark.functions.png import (
            decode_png,
            encode_png,
            resize_bilinear,
        )

        for pdf in batches:
            yy, xx = np.mgrid[0:64, 0:64]
            total = 0
            n = 0
            for d in pdf["id"]:
                d = int(d)
                img = np.stack(
                    [
                        (yy * 3 + xx * 5 + d) % 256,
                        (yy * 7 + xx + d * 11) % 256,
                        (yy + xx * 13 + d * 2) % 256,
                    ],
                    axis=2,
                ).astype("uint8")
                out = resize_bilinear(decode_png(encode_png(img)), 32, 32)
                total += int(out.sum())
                n += 1
            yield pd.DataFrame({"n_images": [n], "checksum": [total]})

    return (
        spark.range(2_000 * scale)
        .repartition(32)
        .mapInPandas(work, schema="n_images long, checksum long")
        .groupBy()
        .agg(
            F.sum("n_images").alias("n_images"),
            F.sum("checksum").alias("checksum"),
        )
    )


@query(
    "source_webdataset_roundtrip",
    """
    SELECT doc_id,
           'txt' AS ext,
           CAST(length(coalesce(text, '')) AS BIGINT) AS text_len,
           lang, source
    FROM documents
    """,
)
def source_webdataset_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar shards under the value hash: the documents table is
    packed into real tar shards (sources/webdataset.py — executor-side
    tarfile writers, one shard per partition) and read back through the
    binaryFile + tarfile path; the reassembled rows must hash-match the
    original table. Shards are built once per dataset fingerprint in a
    uid-scoped 0o700 cache (the sim_lsh_index_topk convention)."""
    import os

    from erigon_extract_spark.sources.webdataset import (
        documents_to_shards,
        read_shards,
    )

    docs = _load(spark, sf_dir, "documents")
    out_dir = _cached_artifact(
        sf_dir, "documents", "wds", "n_shards=4",
        lambda tmp: documents_to_shards(
            spark, docs, tmp, n_shards=4
        ).collect(),
    )
    back = read_shards(spark, out_dir)
    return back.select(
        F.col("key").cast("long").alias("doc_id"),
        "ext",
        F.length(F.decode("payload", "utf-8")).cast("long").alias("text_len"),
        F.get_json_object("meta", "$.lang").alias("lang"),
        F.get_json_object("meta", "$.source").alias("source"),
    )


@query(
    "multimodal_gif_frames",
    """
    WITH f AS (
      -- doc d has 3 frames of 8x8 palette indices (d + fi + y*x) % 4,
      -- delays 200/300/500ms; ticks every 250ms over [0, 1000):
      -- tick 0 -> frame 0, 250 -> 1, 500 -> 2, 750 -> 2
      SELECT d.d AS doc_id, t.k AS frame_idx,
             CAST(t.k * 250 AS BIGINT) AS frame_ts_ms,
             CASE t.k WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END AS fi
      FROM UNNEST(generate_series(0, 19)) AS d(d),
           UNNEST(generate_series(0, 3)) AS t(k)
    ),
    px AS (
      SELECT doc_id, frame_idx, frame_ts_ms,
             -- palette: index i -> gray value i*80; frame pixel sum over
             -- the 8x8 grid of ((d + fi + y*x) % 4) * 80 * 3 channels
             (SELECT SUM(((f.doc_id + f.fi + y.y * x.x) % 4) * 80 * 3)
              FROM UNNEST(generate_series(0, 7)) AS y(y),
                   UNNEST(generate_series(0, 7)) AS x(x)) AS px_sum
      FROM f
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, frame_ts_ms,
           CAST(px_sum AS BIGINT) AS px_sum
    FROM px
    """,
)
def multimodal_gif_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL animation kernel under the value hash: 20 deterministic
    3-frame animated GIFs are built per executor (palette frames via
    encode_gif), decoded by the full standard LZW path, timeline-sampled
    at 250 ms, PNG-decoded back, and reduced to per-frame pixel sums —
    while the oracle derives the same sums from the index formula. The
    whole chain (GIF container, LZW, frame composition, timeline
    selection, PNG round trip) sits under one hash."""
    import pandas as pd

    from erigon_extract_spark.operators.multimodal import extract_gif_frames

    def synth(batches):
        import numpy as np

        from erigon_extract_spark.functions.gif import encode_gif

        pal = np.stack([np.arange(4) * 80] * 3, axis=1).astype("uint8")
        yy, xx = np.mgrid[0:8, 0:8]
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                frames = [
                    (delay, ((d + fi + yy * xx) % 4).astype("uint8"))
                    for fi, delay in enumerate((200, 300, 500))
                ]
                rows.append((d, bytearray(encode_gif(frames, pal))))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    def summarize(batches):
        import numpy as np  # noqa: F401

        from erigon_extract_spark.functions.png import decode_png

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "px_sum": [
                        int(decode_png(bytes(p)).astype("int64").sum())
                        for p in pdf["payload"]
                    ],
                }
            )

    media = spark.range(20).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )
    frames = extract_gif_frames(media, every_ms=250)
    return frames.select(
        "doc_id", "frame_idx", "frame_ts_ms", "payload"
    ).mapInPandas(
        summarize,
        schema="doc_id long, frame_idx int, frame_ts_ms long, px_sum long",
    )


@query(
    "multimodal_video_frames",
    """
    WITH f AS (
      -- doc d is a 3-frame MJPEG AVI at 4 fps (250ms/frame); ticks every
      -- 250ms over [0, 750) hit each frame exactly once
      SELECT d.d AS doc_id, t.k AS frame_idx,
             CAST(t.k * 250 AS BIGINT) AS frame_ts_ms
      FROM UNNEST(generate_series(0, 19)) AS d(d),
           UNNEST(generate_series(0, 2)) AS t(k)
    ),
    px AS (
      SELECT doc_id, frame_idx, frame_ts_ms,
             -- 32x32 of 8x8-constant tiles: per-tile value repeated 64x;
             -- DC-exact at quality 50 so the decoded sum IS the formula
             (SELECT SUM(64 * (128 + 2 * ((f.doc_id * 7 + f.frame_idx * 11
                                           + ty.ty * 5 + tx.tx * 3)
                                          % 53 - 26)))
              FROM UNNEST(generate_series(0, 3)) AS ty(ty),
                   UNNEST(generate_series(0, 3)) AS tx(tx)) AS px_sum
      FROM f
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, frame_ts_ms,
           CAST(px_sum AS BIGINT) AS px_sum
    FROM px
    """,
)
def multimodal_video_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video modality under the value hash (VERDICT r7 #8): 20
    deterministic 3-frame MJPEG AVIs are containerized per executor
    (functions/avi.py), walked back out, each sampled frame JPEG-decoded
    (functions/jpeg.py) and PNG re-encoded by
    operators/multimodal.extract_video_frames, then reduced to per-frame
    pixel sums the oracle derives straight from the tile formula. The
    whole chain — RIFF container build/parse, frame timeline, baseline
    JPEG entropy decode, PNG round trip — sits under one hash. Exactness
    despite lossy JPEG: the multimodal_jpeg_roundtrip DC-quantization
    argument (8x8-constant tiles, even offsets from 128, quality 50)."""
    import pandas as pd

    from erigon_extract_spark.operators.multimodal import (
        extract_video_frames,
    )

    def synth(batches):
        import numpy as np

        from erigon_extract_spark.functions.avi import encode_avi_mjpeg
        from erigon_extract_spark.functions.jpeg import encode_jpeg

        ty, tx = np.mgrid[0:4, 0:4]
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                frames = []
                for fi in range(3):
                    tiles = 128 + 2 * (
                        (d * 7 + fi * 11 + ty * 5 + tx * 3) % 53 - 26
                    )
                    img = np.repeat(
                        np.repeat(tiles, 8, axis=0), 8, axis=1
                    ).astype("uint8")
                    frames.append(
                        encode_jpeg(img, quality=50, restart_interval=3)
                    )
                rows.append((d, bytearray(encode_avi_mjpeg(
                    frames, width=32, height=32, fps=4
                ))))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    def summarize(batches):
        from erigon_extract_spark.functions.png import decode_png

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "px_sum": [
                        int(decode_png(bytes(p)).astype("int64").sum())
                        for p in pdf["payload"]
                    ],
                }
            )

    media = spark.range(20).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )
    frames = extract_video_frames(media, every_ms=250)
    return frames.select(
        "doc_id", "frame_idx", "frame_ts_ms", "payload"
    ).mapInPandas(
        summarize,
        schema="doc_id long, frame_idx int, frame_ts_ms long, px_sum long",
    )


@query(
    "multimodal_mp4_frames",
    """
    WITH f AS (
      -- doc d is a 3-frame MJPEG MP4 at 4 fps (250ms/frame); ticks every
      -- 250ms over [0, 750) hit each frame exactly once
      SELECT d.d AS doc_id, t.k AS frame_idx,
             CAST(t.k * 250 AS BIGINT) AS frame_ts_ms
      FROM UNNEST(generate_series(0, 19)) AS d(d),
           UNNEST(generate_series(0, 2)) AS t(k)
    ),
    px AS (
      SELECT doc_id, frame_idx, frame_ts_ms,
             -- 32x32 of 8x8-constant tiles: per-tile value repeated 64x;
             -- DC-exact at quality 50 so the decoded sum IS the formula
             (SELECT SUM(64 * (128 + 2 * ((f.doc_id * 13 + f.frame_idx * 17
                                           + ty.ty * 5 + tx.tx * 3)
                                          % 53 - 26)))
              FROM UNNEST(generate_series(0, 3)) AS ty(ty),
                   UNNEST(generate_series(0, 3)) AS tx(tx)) AS px_sum
      FROM f
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, frame_ts_ms,
           CAST(px_sum AS BIGINT) AS px_sum
    FROM px
    """,
)
def multimodal_mp4_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ISO-BMFF container under the value hash — the MP4 twin of
    multimodal_video_frames (VERDICT r8 stretch #8): 20 deterministic
    3-frame MJPEG MP4s are containerized per executor (functions/mp4.py
    box tree: ftyp + mdat + moov sample tables), sniffed and walked back
    out by the SAME operator (extract_video_frames auto-detects the
    container per payload), each sampled frame JPEG-decoded and PNG
    re-encoded, then reduced to per-frame pixel sums the oracle derives
    from the tile formula. Constants differ from the AVI gate (13/17 vs
    7/11) so the two container paths cannot cross-pass on copied
    output. Exactness despite lossy JPEG: the multimodal_jpeg_roundtrip
    DC-quantization argument (8x8-constant tiles, even offsets from
    128, quality 50)."""
    import pandas as pd

    from erigon_extract_spark.operators.multimodal import (
        extract_video_frames,
    )

    def synth(batches):
        import numpy as np

        from erigon_extract_spark.functions.jpeg import encode_jpeg
        from erigon_extract_spark.functions.mp4 import encode_mp4_mjpeg

        ty, tx = np.mgrid[0:4, 0:4]
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                frames = []
                for fi in range(3):
                    tiles = 128 + 2 * (
                        (d * 13 + fi * 17 + ty * 5 + tx * 3) % 53 - 26
                    )
                    img = np.repeat(
                        np.repeat(tiles, 8, axis=0), 8, axis=1
                    ).astype("uint8")
                    frames.append(
                        encode_jpeg(img, quality=50, restart_interval=3)
                    )
                rows.append((d, bytearray(encode_mp4_mjpeg(
                    frames, width=32, height=32, fps=4
                ))))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    def summarize(batches):
        from erigon_extract_spark.functions.png import decode_png

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "px_sum": [
                        int(decode_png(bytes(p)).astype("int64").sum())
                        for p in pdf["payload"]
                    ],
                }
            )

    media = spark.range(20).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )
    frames = extract_video_frames(media, every_ms=250)
    return frames.select(
        "doc_id", "frame_idx", "frame_ts_ms", "payload"
    ).mapInPandas(
        summarize,
        schema="doc_id long, frame_idx int, frame_ts_ms long, px_sum long",
    )


@query(
    "sim_hard_negatives",
    """
    WITH anchors AS (
      SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec,
             label AS alabel
      FROM embeddings WHERE vec_id < 8
    ),
    vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      FROM embeddings
    ),
    pairs AS (
      SELECT a.anchor_id, e.vec_id, e.label AS negative_label,
             list_dot_product(e.v, a.avec)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(a.avec, a.avec))) AS cos_raw
      FROM vecs e CROSS JOIN anchors a
      WHERE e.label <> a.alabel
    )
    SELECT anchor_id, vec_id, negative_label,
           ROUND(cos_raw, 6) AS cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                   ORDER BY cos_raw DESC, vec_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
)
def sim_hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard-negative mining (operators/similarity.
    hard_negatives): for each anchor, the 5 most-similar vectors with a
    DIFFERENT label — the boundary-adjacent negatives that carry the
    gradient signal. Plan: anchor batch broadcasts, corpus streams map-
    side with zero shuffle, one per-anchor top-k exchange (the
    sim_bruteforce_topk shape plus the label guard). Float parity per
    that gate's discipline: double products both sides, ROUND(,6)."""
    from erigon_extract_spark.operators.similarity import hard_negatives

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    anchors = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("anchor_id"), "embedding", "label"
    )
    out = hard_negatives(emb, anchors, k=5)
    return out.select(
        "anchor_id", "vec_id", "negative_label",
        F.round("cosine", 6).alias("cosine"),
    )


_MMR_UNROLL_TAIL = """
    sim AS (
      SELECT c1.anchor_id, c1.vec_id AS va, c2.vec_id AS vb,
             list_dot_product(c1.v, c2.v)
               / (sqrt(list_dot_product(c1.v, c1.v))
                  * sqrt(list_dot_product(c2.v, c2.v))) AS s
      FROM cand c1 JOIN cand c2 ON c1.anchor_id = c2.anchor_id
    ),
    s1 AS (
      -- scores are ROUND(,9)-quantized BEFORE every argmax: the engine
      -- computes pairwise cosines with BLAS, this oracle with
      -- sequential list_dot_product folds; selection must not hinge on
      -- the last ulp (operators/similarity.mmr_select quantizes the
      -- same way before its greedy argmax)
      SELECT anchor_id, vec_id, rel, ROUND(0.7e0 * rel, 9) AS score
      FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY anchor_id
                ORDER BY ROUND(0.7e0 * rel, 9) DESC, vec_id) AS rn
            FROM cand) WHERE rn = 1
    ),
    r2 AS (
      SELECT c.anchor_id, c.vec_id, c.rel,
             ROUND(0.7e0 * c.rel - 0.3e0 * m1.s, 9) AS score
      FROM cand c
      JOIN s1 ON s1.anchor_id = c.anchor_id AND c.vec_id <> s1.vec_id
      JOIN sim m1 ON m1.anchor_id = c.anchor_id AND m1.va = c.vec_id
                 AND m1.vb = s1.vec_id
    ),
    s2 AS (
      SELECT anchor_id, vec_id, rel, score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY score DESC, vec_id) AS rn
            FROM r2) WHERE rn = 1
    ),
    r3 AS (
      SELECT c.anchor_id, c.vec_id, c.rel,
             ROUND(0.7e0 * c.rel - 0.3e0 * GREATEST(m1.s, m2.s), 9)
               AS score
      FROM cand c
      JOIN s1 ON s1.anchor_id = c.anchor_id AND c.vec_id <> s1.vec_id
      JOIN s2 ON s2.anchor_id = c.anchor_id AND c.vec_id <> s2.vec_id
      JOIN sim m1 ON m1.anchor_id = c.anchor_id AND m1.va = c.vec_id
                 AND m1.vb = s1.vec_id
      JOIN sim m2 ON m2.anchor_id = c.anchor_id AND m2.va = c.vec_id
                 AND m2.vb = s2.vec_id
    ),
    s3 AS (
      SELECT anchor_id, vec_id, rel, score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY score DESC, vec_id) AS rn
            FROM r3) WHERE rn = 1
    ),
    r4 AS (
      SELECT c.anchor_id, c.vec_id, c.rel,
             ROUND(0.7e0 * c.rel - 0.3e0 * GREATEST(m1.s, m2.s, m3.s), 9)
               AS score
      FROM cand c
      JOIN s1 ON s1.anchor_id = c.anchor_id AND c.vec_id <> s1.vec_id
      JOIN s2 ON s2.anchor_id = c.anchor_id AND c.vec_id <> s2.vec_id
      JOIN s3 ON s3.anchor_id = c.anchor_id AND c.vec_id <> s3.vec_id
      JOIN sim m1 ON m1.anchor_id = c.anchor_id AND m1.va = c.vec_id
                 AND m1.vb = s1.vec_id
      JOIN sim m2 ON m2.anchor_id = c.anchor_id AND m2.va = c.vec_id
                 AND m2.vb = s2.vec_id
      JOIN sim m3 ON m3.anchor_id = c.anchor_id AND m3.va = c.vec_id
                 AND m3.vb = s3.vec_id
    ),
    s4 AS (
      SELECT anchor_id, vec_id, rel, score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY score DESC, vec_id) AS rn
            FROM r4) WHERE rn = 1
    )
    SELECT anchor_id, 1 AS sel_rank, vec_id,
           ROUND(rel, 6) AS relevance, ROUND(score, 6) AS mmr_score
    FROM s1
    UNION ALL
    SELECT anchor_id, 2, vec_id, ROUND(rel, 6), ROUND(score, 6) FROM s2
    UNION ALL
    SELECT anchor_id, 3, vec_id, ROUND(rel, 6), ROUND(score, 6) FROM s3
    UNION ALL
    SELECT anchor_id, 4, vec_id, ROUND(rel, 6), ROUND(score, 6) FROM s4
    """
# ^ the shared 4-step greedy unroll: expects a `cand` CTE with columns
#   (anchor_id, vec_id, v, rel); both MMR gates splice their own
#   candidate-generation CTEs in front of it, so the rerank spec can
#   never drift between the brute-force and LSH variants.


@query(
    "sim_mmr_rerank",
    f"""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
      FROM embeddings WHERE vec_id < 4
    ),
    vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    scored AS (
      SELECT a.anchor_id, e.vec_id, e.v,
             list_dot_product(e.v, a.avec)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(a.avec, a.avec))) AS rel
      FROM vecs e CROSS JOIN anchors a
      WHERE e.vec_id <> a.anchor_id
    ),
    cand AS (
      SELECT anchor_id, vec_id, v, rel
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY rel DESC, vec_id) AS rn
            FROM scored) WHERE rn <= 12
    ),
    {_MMR_UNROLL_TAIL}
    """,
)
def sim_mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diverse selection (operators/similarity.
    mmr_select): retrieve-then-rerank — distributed top-12 candidate
    generation per anchor (the brute_force_topk broadcast plan), then the
    greedy k=4 MMR loop as one bounded Arrow batch per anchor group
    (never corpus-sized, never driver-side). The oracle unrolls the four
    greedy steps explicitly (s1..s4: each step's penalty is the GREATEST
    pairwise cosine against everything already selected), so a selection
    divergence — not just a score error — flips the hash. lam/mu are
    independent literals on both sides (1 - 0.7 != 0.3 in binary floats;
    see the operator docstring)."""
    from erigon_extract_spark.operators.similarity import mmr_select

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    anchors = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("anchor_id"), "embedding"
    )
    out = mmr_select(emb, anchors, k=4, n_candidates=12, lam=0.7, mu=0.3)
    return out.select(
        "anchor_id", "sel_rank", "vec_id",
        F.round("relevance", 6).alias("relevance"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )


def _mmr_lsh_oracle_sql(dim: int = 64, n_planes: int = 6) -> str:
    """The LSH-candidate MMR variant: same deterministic plane literals
    as _lsh_topk_oracle_sql for candidate generation, same unroll tail as
    sim_mmr_rerank for the greedy rerank — the two stages compose in SQL
    exactly as the operators compose in Spark."""
    from erigon_extract_spark.operators.similarity import _hyperplane

    bits = []
    for p in range(n_planes):
        plane = "[" + ", ".join(repr(x) for x in _hyperplane(dim, p + 1)) + "]"
        bits.append(
            f"CASE WHEN list_dot_product(v, {plane}) >= 0 "
            f"THEN {1 << p} ELSE 0 END"
        )
    bucket = "\n             + ".join(bits)
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sig AS (
      SELECT vec_id, v,
             ({bucket}) AS bucket
      FROM vecs
    ),
    anchors AS (
      SELECT vec_id AS anchor_id, v AS avec, bucket
      FROM sig WHERE vec_id < 4
    ),
    scored AS (
      SELECT a.anchor_id, s.vec_id, s.v,
             list_dot_product(s.v, a.avec)
               / (sqrt(list_dot_product(s.v, s.v))
                  * sqrt(list_dot_product(a.avec, a.avec))) AS rel
      FROM sig s JOIN anchors a USING (bucket)
      WHERE s.vec_id <> a.anchor_id
    ),
    cand AS (
      SELECT anchor_id, vec_id, v, rel
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY rel DESC, vec_id) AS rn
            FROM scored) WHERE rn <= 12
    ),
    {_MMR_UNROLL_TAIL}
    """


@query("sim_mmr_lsh", _mmr_lsh_oracle_sql())
def sim_mmr_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR with SUBLINEAR candidate generation — the pluggability the
    mmr_select docstring promises, proven under the hash gate: candidates
    come from the LSH bucket equi-join (shuffle ∝ corpus, not anchors ×
    corpus) instead of the brute-force broadcast scan, and the identical
    bounded per-anchor greedy rerank runs on top. The oracle splices the
    LSH plane-literal CTEs in front of the SAME unroll tail the
    brute-force gate uses, so the two gates share the rerank spec by
    construction. Anchors whose bucket holds fewer than k neighbors
    select fewer rows — both engines agree on the degenerate-bucket
    semantics."""
    from erigon_extract_spark.operators.similarity import (
        cosine_prenorm,
        l2_norm,
        lsh_signature,
        mmr_select,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    c = emb.withColumn(
        "__bucket", lsh_signature(F.col("embedding"), 64, 6)
    ).withColumn("__cnorm", l2_norm(F.col("embedding")))
    anchors = c.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("__avec"),
        F.col("__cnorm").alias("__anorm"),
        "__bucket",
    )
    cand = (
        c.join(F.broadcast(anchors), "__bucket")
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "vec_id",
            "embedding",
            cosine_prenorm(
                F.col("embedding"), F.col("__avec"),
                F.col("__cnorm"), F.col("__anorm"),
            ).alias("relevance"),
        )
    )
    out = mmr_select(
        emb,
        anchors.select("anchor_id", F.col("__avec").alias("embedding")),
        k=4, n_candidates=12, lam=0.7, mu=0.3,
        candidates=cand,
    )
    return out.select(
        "anchor_id", "sel_rank", "vec_id",
        F.round("relevance", 6).alias("relevance"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )


@query(
    "events_user_similarity",
    f"""
    WITH traj AS (
      SELECT user_id AS doc_id,
             string_agg(event_type, ' ' ORDER BY ts, event_id) AS text
      FROM events GROUP BY user_id
    ),
    {_ngram_pair_ctes("traj")}
    SELECT doc_id_a AS user_a, doc_id_b AS user_b, jaccard
    FROM jpairs
    WHERE jaccard >= 0.35
    """,
)
def events_user_similarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral trajectory similarity (the REPOSE/trajectory-top-k
    problem class, re-expressed Spark-first): each user's ordered
    event-type sequence becomes a document, and exact n-gram Jaccard
    with prefix filtering finds similar behavior pairs — sequence
    alignment's quadratic pair cost replaced by the bounded
    inverted-index join the dedup family already proves. Ordering is
    (ts, event_id) — a pure value sort, session-TZ-independent."""
    ev = _events_raw(spark, sf_dir)
    traj = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("__seq")
        )
        .select(
            F.col("user_id").alias("doc_id"),
            F.concat_ws(
                " ", F.transform("__seq", lambda s: s["event_type"])
            ).alias("text"),
        )
    )
    pairs = ngram_jaccard_pairs(traj, shingle_n=3, threshold=0.2)
    # 5-type alphabet makes ALL users mildly similar at the family's 0.2
    # bar; the behavioral-pair report keeps the genuinely-similar tail
    return pairs.filter(F.round("jaccard", 6) >= 0.35).select(
        F.col("doc_id_a").alias("user_a"),
        F.col("doc_id_b").alias("user_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


@query(
    "quality_validation_report",
    """
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_key,
             CAST(SUM(CASE WHEN NOT (l_quantity > 0) OR l_quantity IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
             CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 1)
                             OR l_discount IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
             CAST(SUM(CASE WHEN NOT (l_returnflag IN ('A', 'N', 'R'))
                             OR l_returnflag IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_flag
      FROM lineitem
    )
    SELECT c.check_name, n_rows,
           CASE c.check_name WHEN 'key_not_null' THEN v_key
                WHEN 'positive_quantity' THEN v_qty
                WHEN 'discount_in_unit_range' THEN v_disc
                ELSE v_flag END AS n_violations,
           CASE c.check_name WHEN 'key_not_null' THEN v_key
                WHEN 'positive_quantity' THEN v_qty
                WHEN 'discount_in_unit_range' THEN v_disc
                ELSE v_flag END = 0 AS passed
    FROM agg, (VALUES ('key_not_null'), ('positive_quantity'),
               ('discount_in_unit_range'), ('known_return_flag'))
         AS c(check_name)
    """,
)
def quality_validation_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's abort-mid-scan invariants (SURVEY.md §2 P4,
    erigon_extract.c:1561-1576 length checks et al.) as an OBSERVABLE
    validation report (operators/asserts.validation_report): every check
    counted in ONE aggregation pass over one scan, job gates on
    ``passed`` instead of dying — the CI-dashboard form of A3/P4/W6."""
    from erigon_extract_spark.operators.asserts import validation_report

    li = _load(spark, sf_dir, "lineitem")
    return validation_report(
        li,
        {
            "key_not_null": F.col("l_orderkey").isNotNull(),
            "positive_quantity": F.col("l_quantity") > 0,
            "discount_in_unit_range": F.col("l_discount").between(0, 1),
            "known_return_flag": F.col("l_returnflag").isin("A", "N", "R"),
        },
    )


# Trained k-means quantizer -> cell labels aren't SQL-expressible; the
# output instead carries the SemDeDup CONTRACT as per-vector invariants
# the oracle pins to TRUE (VERDICT r4 #5): link validity (keep XOR
# dup_of), dup link points to a lower id in the SAME cell, and the
# linked pair really clears the cosine threshold (recomputed from the
# raw vectors in-plan). Cell-assignment semantics vs brute force stay
# pytest-pinned (tests/test_similarity.py).
@query(
    "dedup_semantic",
    """
    SELECT vec_id,
           TRUE AS valid_link,
           TRUE AS dup_lower_id,
           TRUE AS dup_same_cell,
           TRUE AS dup_sim_ok
    FROM embeddings
    """,
)
def dedup_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: k-means cells bound the pairwise
    cosine work (operators/similarity.semantic_dedup); every contract
    property of (vec_id, cell, dup_of, keep) is re-verified against the
    raw vectors under the driver's value hash."""
    from erigon_extract_spark.operators.similarity import (
        cosine,
        semantic_dedup,
    )

    emb = _load(spark, sf_dir, "embeddings")
    res = semantic_dedup(emb, threshold=0.35, n_lists=8)
    vecs = emb.select(
        F.col("vec_id").alias("__vid"), F.col("embedding").alias("__v")
    )
    cells = res.select(
        F.col("vec_id").alias("__cid"), F.col("cell").alias("__dcell")
    )
    j = (
        res.join(vecs, res["vec_id"] == vecs["__vid"], "left")
        .join(
            vecs.select(
                F.col("__vid").alias("__did"), F.col("__v").alias("__dv")
            ),
            res["dup_of"] == F.col("__did"),
            "left",
        )
        .join(cells, res["dup_of"] == cells["__cid"], "left")
    )
    kept = F.col("dup_of").isNull()
    return j.select(
        "vec_id",
        (kept == F.col("keep")).alias("valid_link"),
        (kept | (F.col("dup_of") < F.col("vec_id"))).alias("dup_lower_id"),
        (kept | (F.col("__dcell") == F.col("cell"))).alias("dup_same_cell"),
        (
            kept | (cosine(F.col("__v"), F.col("__dv")) >= 0.35)
        ).alias("dup_sim_ok"),
    )


@query(
    "text_strip_boilerplate",
    """
    WITH s AS (
      SELECT doc_id, i AS pos, parts[i] AS s, md5(parts[i]) AS h
      FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
           UNNEST(generate_series(1, len(parts))) AS u(i)
      WHERE length(parts[i]) > 0
    ),
    freq AS (
      SELECT h FROM s GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 3
    ),
    m AS (
      SELECT s.doc_id, s.pos, s.s, (f.h IS NOT NULL) AS is_boiler
      FROM s LEFT JOIN freq f ON s.h = f.h
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN NOT is_boiler THEN s END,
                               '. ' ORDER BY pos), '') AS kept_text,
           COUNT(*) AS n_sentences,
           CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed
    FROM m GROUP BY doc_id
    """,
)
def text_strip_boilerplate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate strip (CCNet frequent-paragraph filter):
    sentences verbatim-shared by >= 3 docs are template noise removed from
    every doc, text rebuilt order-preserved
    (operators/text.strip_boilerplate). Distinct from dedup: documents are
    rewritten, not dropped."""
    from erigon_extract_spark.operators.text import strip_boilerplate

    docs = _load(spark, sf_dir, "documents")
    return strip_boilerplate(docs, min_docs=3)


@query(
    "corpus_shuffle_shards",
    """
    WITH h AS (
      SELECT doc_id, md5('shuf1_' || CAST(doc_id AS VARCHAR)) AS hh
      FROM documents
    )
    SELECT doc_id,
           CAST('0x' || substr(hh, 1, 8) AS BIGINT) % 8 AS shard,
           ROW_NUMBER() OVER (
             PARTITION BY CAST('0x' || substr(hh, 1, 8) AS BIGINT) % 8
             ORDER BY hh, doc_id
           ) AS shard_pos
    FROM h
    """,
)
def corpus_shuffle_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: reproducible pseudorandom
    shard + within-shard position from a seed-keyed content hash
    (operators/sampling.shuffle_order). Parallel window (partitioned by
    shard) — deliberately NOT a global row_number, which would funnel
    100 TB through one partition."""
    from erigon_extract_spark.operators.sampling import shuffle_order

    docs = _load(spark, sf_dir, "documents")
    return shuffle_order(docs, "doc_id", seed="shuf1", n_shards=8)


@query(
    "curation_length_band",
    """
    WITH tot AS (SELECT COUNT(*) AS n FROM documents),
    hist AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1),
    cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist
    ),
    cuts AS (
      SELECT MIN(CASE WHEN cum * 100 >= 5 * tot.n THEN v END) AS lo_cut,
             MIN(CASE WHEN cum * 100 >= 95 * tot.n THEN v END) AS hi_cut
      FROM cum, tot
    )
    SELECT doc_id, n_chars, lo_cut, hi_cut
    FROM documents, cuts
    WHERE n_chars >= lo_cut AND n_chars <= hi_cut
    """,
)
def curation_length_band_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative (percentile-band) length filter: trim the shortest 5% and
    longest 5% by DISCRETE integer-arithmetic cutoffs
    (operators/curation.length_band_filter) — no float interpolation, so
    cutoffs and membership are engine-exact under the hash gate."""
    from erigon_extract_spark.operators.curation import length_band_filter

    docs = _load(spark, sf_dir, "documents")
    return length_band_filter(docs, lo_pct=5, hi_pct=95)


@query(
    "text_bigram_familiarity",
    """
    WITH words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
      FROM words, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
      WHERE len(w) >= 2
    ),
    model AS (SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(cnt) AS BIGINT) AS familiarity_sum,
           ROUND(CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS familiarity
    FROM bg JOIN model USING (bg)
    GROUP BY doc_id
    """,
)
def text_bigram_familiarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM familiarity (integer-exact n-gram-LM-perplexity skeleton,
    operators/text.bigram_familiarity): train the bigram frequency model in
    pass 1, score every doc against it in pass 2 — the two-pass
    train-then-score shape of CCNet perplexity filtering, with integer
    counts so the gate hash is exact."""
    from erigon_extract_spark.operators.text import bigram_familiarity

    docs = _load(spark, sf_dir, "documents")
    return bigram_familiarity(docs)


def _jsonl_oracle_sql() -> str:
    # Import-time must stay filesystem-read-only: the fixture is committed
    # (fixtures_jsonl/documents_sample.jsonl) and the query function calls
    # ensure_sample() at execution, so building the SQL string needs only
    # the path literal — a read-only checkout can import this module.
    from erigon_extract_spark.sources.jsonl import SAMPLE_PATH

    cols = (
        "{'doc_id': 'BIGINT', 'text': 'VARCHAR', 'lang': 'VARCHAR', "
        "'source': 'VARCHAR', 'n_chars': 'BIGINT'}"
    )
    return f"""
    SELECT doc_id, lang, source, n_chars, length(text) AS text_len
    FROM read_json('{SAMPLE_PATH}', format='newline_delimited',
                   columns={cols})
    """


@query("source_jsonl_documents", _jsonl_oracle_sql())
def source_jsonl_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest under the hash gate: explicit contract schema (no
    inferSchema pass), PERMISSIVE corrupt-line quarantine
    (sources/jsonl.py), values identical to DuckDB's read_json of the same
    committed fixture. Corrupt-line routing is exercised in pytest."""
    from erigon_extract_spark.sources.jsonl import (
        ensure_sample,
        read_documents_jsonl,
        split_quarantine,
    )

    path = ensure_sample()
    clean, _bad = split_quarantine(read_documents_jsonl(spark, str(path)))
    return clean.select(
        "doc_id", "lang", "source", "n_chars", F.length("text").alias("text_len")
    )


def _csv_oracle_sql() -> str:
    # Same read-only-import discipline as _jsonl_oracle_sql: only the path
    # literal is needed at import time; the query function materializes
    # the fixture at execution.
    from erigon_extract_spark.sources.csvfile import SAMPLE_PATH

    cols = (
        "{'doc_id': 'BIGINT', 'text': 'VARCHAR', 'lang': 'VARCHAR', "
        "'source': 'VARCHAR', 'n_chars': 'BIGINT'}"
    )
    return f"""
    SELECT doc_id, text, lang, source, n_chars
    FROM read_csv('{SAMPLE_PATH}', header=true, columns={cols})
    """


@query("source_csv_documents", _csv_oracle_sql())
def source_csv_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest under the hash gate: explicit contract schema (no
    inference pass), RFC 4180 doubled-quote escaping (Spark's backslash
    default would mis-parse every standard CSV producer's output —
    sources/csvfile.py), splittable single-line records (no multiLine),
    PERMISSIVE quarantine. The fixture's text fields all embed commas and
    every 5th embeds doubled quotes, so the gate hashes the quoting
    corners, not just the happy path. Corrupt-line routing is exercised
    in tests/test_csv_source.py."""
    from erigon_extract_spark.sources.csvfile import (
        ensure_sample,
        read_documents_csv,
        split_quarantine,
    )

    path = ensure_sample()
    clean, _bad = split_quarantine(read_documents_csv(spark, str(path)))
    return clean.select("doc_id", "text", "lang", "source", "n_chars")


_WARC_ORACLE_SQL = """
    WITH gen AS (
      SELECT i,
             '<html><body>doc ' || i || ' & tail ' || (i * i)
               || '</body></html>' AS rest
      FROM generate_series(0, 29) t(i)
    ),
    body AS (
      SELECT i,
             CASE WHEN i % 7 = 0
                  THEN 'line one ' || i || chr(13) || chr(10)
                       || 'line two ' || i || chr(13) || chr(10) || rest
                  ELSE rest
             END AS payload_text
      FROM gen
    )
    SELECT CAST(2 + 2 * i AS INT) AS rec_idx,
           'https://example.org/page/' || i AS target_uri,
           'text/html' AS content_type,
           CAST(length(payload_text) AS BIGINT) AS content_length,
           payload_text
    FROM body
    """


@query("source_warc_documents", _WARC_ORACLE_SQL)
def source_warc_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest under the hash gate (sources/warc.py — the ISO 28500
    crawl-archive format Common Crawl ships): binaryFile per-shard read,
    Arrow-batched record parsing with resync-on-corruption quarantine
    (one producer bug costs one record, not the shard tail), bomb caps on
    header/record/shard sizes. DuckDB reads no WARC, so the oracle
    reconstructs the 30 response records from the fixture's generating
    formula — every 7th payload embeds CRLF pairs so framing is proven to
    come from Content-Length, not separator scanning. The gzip twin
    (one member per record, the CC layout) is pinned byte-identical in
    tests/test_warc_source.py."""
    from erigon_extract_spark.sources.warc import (
        ensure_sample,
        read_warc,
        split_quarantine,
    )

    path = ensure_sample()
    clean, _bad = split_quarantine(read_warc(spark, str(path)))
    return (
        clean.filter(F.col("warc_type") == "response")
        .select(
            "rec_idx",
            "target_uri",
            "content_type",
            "content_length",
            F.col("payload").cast("string").alias("payload_text"),
        )
    )


def _xml_oracle_sql() -> str:
    # DuckDB has no XML reader, so the oracle reconstructs the fixture's
    # rows from the same generating formula (sources/xmlfile.ensure_sample
    # is a pure function of these literals). If the Spark reader
    # mis-decoded an entity reference, a CDATA section, or the rowTag
    # attribute, the value hash diverges. Import-time stays
    # filesystem-read-only: no path literal is even needed.
    return """
    WITH gen AS (
      SELECT i,
             CASE WHEN i % 5 = 0
                  THEN 'raw <b>bold ' || i || '</b> & amp'
                  ELSE 'row ' || i || ' & less < than ' || i
             END AS text
      FROM generate_series(0, 49) t(i)
    )
    SELECT i AS doc_id,
           text,
           (['en', 'de', 'fr', 'es'])[(i % 4) + 1] AS lang,
           'src' || (i % 3) AS source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM gen
    """


@query("source_xml_documents", _xml_oracle_sql())
def source_xml_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest under the hash gate (Spark 4's built-in ``xml`` source,
    sources/xmlfile.py): explicit contract schema (no inference pass),
    rowTag record tokenization (splittable large files — record-per-
    element XML keeps CSV/JSONL's parallelism, unlike multiLine JSON),
    ``doc_id`` carried as a rowTag attribute through attributePrefix,
    PERMISSIVE quarantine. The fixture's text fields all embed entity-
    escaped '&' and '<' and every 5th is a CDATA section carrying raw
    markup, so the gate hashes the two decode conventions, not just the
    happy path. Corrupt-record routing, the write round trip, and the
    streaming twin are exercised in tests/test_xml_source.py."""
    from erigon_extract_spark.sources.xmlfile import (
        ensure_sample,
        read_documents_xml,
        split_quarantine,
    )

    path = ensure_sample()
    clean, _bad = split_quarantine(read_documents_xml(spark, str(path)))
    return clean.select("doc_id", "text", "lang", "source", "n_chars")


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Build-once (uid artifact cache) + per-session catalog registration
    of the bucketed orders/customer pair: 8 buckets on the custkey join
    key, sorted within bucket, one file per bucket (sources/bucketed.py).

    The autoBucketedScan conf is decided at PHYSICAL planning — which is
    lazy, after this function returns — so it must stay set on the
    session rather than save/restored here. ``false`` means "always scan
    with the bucketed layout", which is what enables both the
    zero-Exchange join and SelectedBucketsCount pruning; it affects only
    catalog bucketed-table scans, and these queries are their sole users.

    INVARIANT: any future bucketed-table query added to this session will
    inherit forced bucketed scans from this session-wide conf. If one ever
    needs autoBucketedScan back, scope the conf through a dedicated
    session/conf context instead of flipping it here.
    """
    import os

    from erigon_extract_spark.sources.bucketed import (
        register_bucketed,
        write_bucketed,
    )

    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    out = []
    for table, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        df = _load(spark, sf_dir, table)
        parent = _cached_artifact(
            sf_dir, table, "bkt", f"key={key},n=8",
            lambda tmp, df=df, key=key: write_bucketed(
                df, os.path.join(tmp, "data"), key, 8, [key]
            ),
        )
        tag = os.path.basename(parent).rsplit("_", 1)[-1]
        out.append(
            register_bucketed(
                spark, f"bkt_{table}_{tag}", os.path.join(parent, "data"),
                df, key, 8, [key],
            )
        )
    return out


@query(
    "source_bucketed_join",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def source_bucketed_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join over two catalog-registered bucketed tables — the
    Spark analog of the reference's sorted-table merge join
    (erigon_extract.c's co-ordered scans): both sides bucketed INTO the
    same 8 on the join key, so the sort-merge join runs with ZERO
    Exchange on either side (plan-tested with broadcast disabled,
    tests/test_bucketed.py). At 100 TB this converts the per-job
    corpus-sized shuffle into a one-time bucketed write. The hash gate
    proves the bucketed write+catalog round trip is value-lossless."""
    orders, customer = _bucketed_tables(spark, sf_dir)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("sum_orderkey"),
        )
    )


@query(
    "source_bucketed_pointlookup",
    """
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment
    FROM customer WHERE c_custkey = 42
    """,
)
def source_bucketed_pointlookup_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bucket-pruned point lookup on the bucketed customer table: an
    equality predicate on the bucket column reads 1/8 of the files
    (``SelectedBucketsCount: 1 out of 8`` — plan-tested), the no-index
    analog of the reference's MDBX B-tree point GET (S1 family,
    erigon_extract.c). Key 42 exists at every shipped SF."""
    _, customer = _bucketed_tables(spark, sf_dir)
    return customer.filter(F.col("c_custkey") == 42).select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )


def _month_partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once hive-layout orders fact partitioned by order month —
    the standard 100 TB time-partitioned fact layout (one directory per
    month; a partition-column predicate never touches the other months'
    files)."""
    import os

    parent = _cached_artifact(
        sf_dir, "orders", "pmonth", "p=o_month",
        lambda tmp: (
            _load(spark, sf_dir, "orders")
            .withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
            .write.partitionBy("o_month")
            .parquet(os.path.join(tmp, "data"))
        ),
    )
    return spark.read.parquet(os.path.join(parent, "data"))


def _quarter_dim(spark: SparkSession) -> DataFrame:
    """Tiny month->quarter dimension (1995-2001, the fixture's date range) —
    the date_dim of a star schema, joined on the fact's partition key."""
    rows = [
        (f"{y}-{m:02d}", f"{y}Q{(m - 1) // 3 + 1}")
        for y in range(1995, 2002)
        for m in range(1, 13)
    ]
    return spark.createDataFrame(rows, "o_month string, quarter string")


@query(
    "source_partitioned_dpp",
    """
    SELECT o_month,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey
    FROM (SELECT *, strftime(o_orderdate, '%Y-%m') AS o_month FROM orders)
    WHERE o_month IN ('1996-04', '1996-05', '1996-06')
    GROUP BY o_month
    """,
)
def source_partitioned_dpp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a month-partitioned fact: the
    quarter predicate lives on the DIMENSION, so no static filter can
    prune the fact scan — Spark's DPP turns the broadcast dim results
    into a runtime IN-subquery on the fact's partition column
    (``dynamicpruningexpression`` in PartitionFilters, plan-tested in
    tests/test_bucketed.py) and reads 3 of ~80 month directories. At
    100 TB this is the difference between scanning a week and scanning
    seven years. Values are integer-exact (count + bigint sum)."""
    fact = _month_partitioned_orders(spark, sf_dir)
    dim = _quarter_dim(spark).filter(F.col("quarter") == "1996Q2")
    return (
        fact.join(F.broadcast(dim), "o_month")
        .groupBy("o_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("sum_orderkey"),
        )
    )


@query(
    "maintenance_compact",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang
    """,
)
def maintenance_compact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction under the hash gate: documents rewritten by
    sources/compact.compact_parquet (range-partitioned on doc_id, sorted
    within files so row-group min/max stats become selective again — the
    streaming-sink maintenance job every long-running ingest needs), then
    aggregated from the COMPACTED copy against an oracle reading the
    ORIGINAL — proving the rewrite is value-lossless. File-count sizing
    and the in-place-overwrite refusal are pytest'd (tests/test_cli.py,
    tests/test_bucketing.py)."""
    import os

    from erigon_extract_spark.sources.compact import compact_parquet

    parent = _cached_artifact(
        sf_dir, "documents", "compacted", "rows=200,sort=doc_id",
        lambda tmp: compact_parquet(
            spark,
            f"{sf_dir}/documents.parquet",
            os.path.join(tmp, "data"),
            target_rows_per_file=200,
            sort_cols=["doc_id"],
        ),
    )
    df = spark.read.parquet(os.path.join(parent, "data"))
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def _filestats_oracle_sql() -> str:
    # Path literal only at import time (read-only import discipline);
    # the fixture is committed AND re-materialized by the query function,
    # so DuckDB's parquet_file_metadata always finds the same six shards.
    from erigon_extract_spark.sources.compact import FILESTATS_DIR

    return f"""
    WITH m AS (
      SELECT regexp_extract(file_name, '([^/]+)$', 1) AS file_name,
             num_rows AS n_rows
      FROM parquet_file_metadata('{FILESTATS_DIR}/*.parquet')
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, file_name)
                AS INT) AS file_rank,
           file_name,
           CAST(n_rows AS BIGINT) AS n_rows,
           n_rows < 100 AS is_small
    FROM m
    """


@query("maintenance_file_stats", _filestats_oracle_sql())
def maintenance_file_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file DETECTOR under the hash gate (sources/compact.
    file_stats — compact_parquet is the fixer, maintenance_compact its
    gate): per-file row counts via one distributed input_file_name pass
    (shuffle = one row per FILE, never data-sized), ranked with fragment
    flags. The oracle reads the same committed shard directory through
    DuckDB's parquet_file_metadata — the engines agree not just on data
    values but on the FILE-LEVEL layout metadata a 100 TB maintenance
    loop keys its decisions on."""
    from erigon_extract_spark.sources.compact import (
        ensure_filestats_fixture,
        file_stats,
    )

    path = ensure_filestats_fixture()
    return file_stats(spark, str(path), small_rows=100)


@query(
    "agg_salted_skew",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           MIN(user_id) AS min_user,
           MAX(user_id) AS max_user
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_skew_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.salted_agg) under the
    hash gate: event_type is the all-hot-keys case — a handful of values
    owning every row, the aggregation shape AQE's skew handling does NOT
    fix (it only splits join partitions). Salting fans each hot key over
    16 sub-keys for the partial agg, then merges; the gate proves the
    two-phase decomposition (count->sum, sum->sum, min/max->self) is
    value-identical to the plain GROUP BY the oracle runs."""
    from erigon_extract_spark.operators.skew import salted_agg

    events = _load(spark, sf_dir, "events")
    # salt on the unique event_id: deterministic under task retry
    # (see operators/skew._salt_expr), and keeps the blanket plan audit's
    # no-monotonically_increasing_id invariant
    return salted_agg(
        events,
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "sum_event_id": F.sum("event_id"),
            "min_user": F.min("user_id"),
            "max_user": F.max("user_id"),
        },
        salt_col=F.col("event_id"),
    )


@query(
    "join_salted_skew",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_salted_skew_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated skew join (operators/skew.salted_join) under the
    hash gate: the big side (events) is salted randomly, the dim side is
    replicated across all 16 salt values, and the join runs on
    key+salt — the no-broadcast fallback for a hot-keyed join whose dim
    is too large to broadcast. The gate proves replication+salting emits
    each matched row exactly once (the failure mode to fear here is
    duplicate or lost matches, which a row count alone would miss on a
    reshuffled dup/drop pair)."""
    from erigon_extract_spark.operators.skew import salted_join

    events = _load(spark, sf_dir, "events")
    dim = _load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        events, dim, ["user_id"], salt_buckets=16,
        salt_col=F.col("event_id"),  # deterministic retry-safe salt
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# Golden-value oracle: all outputs are integer-exact sums of a
# deterministic md5-derived corpus (config-sweep verified; see
# erigon_transpose_scale note). tokens_total = 20 tokens x 200k docs and
# bigrams_total = 19 x 200k are independently derivable; the rest pin
# the trained-model math against drift.
@query(
    "curation_scale",
    # DERIVED oracle (r6 verdict directive #7, the transpose/PNG template):
    # the synthetic corpus is a pure md5 formula of (id % 10000, i), so
    # DuckDB REBUILDS the whole probe — token generation, classifier
    # weights, bigram familiarity model — instead of riding pinned
    # engine-computed constants. The previously pinned values
    # (weight_total -26533360, n_keep 97460, familiarity_total 1324528000)
    # are now reproduced independently, not asserted.
    """
    WITH ids AS (SELECT range AS id FROM range(200000)),
    tok AS (
      SELECT id AS doc_id,
             substr(md5(CAST(id % 10000 + i * 131 AS VARCHAR)), 1, 8) AS tok
      FROM ids, UNNEST(generate_series(0, 19)) AS u(i)
    ),
    w AS (
      SELECT doc_id,
             (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024)
               * 2654435761 % 2001 - 1000 AS w
      FROM tok
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS weight_sum
      FROM w GROUP BY doc_id
    ),
    scored AS (
      SELECT weight_sum, n_tokens,
             ROUND(0.5 + (0.5 * (CAST(weight_sum AS DOUBLE)
                                 / CAST(n_tokens * 1000 AS DOUBLE)))
                         / (1.0 + abs(CAST(weight_sum AS DOUBLE)
                                      / CAST(n_tokens * 1000 AS DOUBLE))), 6)
               AS q
      FROM agg
    ),
    q1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
             CAST(SUM(weight_sum) AS BIGINT) AS weight_total,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
             CAST(SUM(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_keep
      FROM scored
    ),
    bg AS (
      SELECT id AS doc_id,
             substr(md5(CAST(id % 10000 + i * 131 AS VARCHAR)), 1, 8)
               || ' ' ||
             substr(md5(CAST(id % 10000 + (i + 1) * 131 AS VARCHAR)), 1, 8)
               AS bg
      FROM ids, UNNEST(generate_series(0, 18)) AS u(i)
    ),
    model AS (SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg),
    fam AS (
      SELECT b.doc_id, COUNT(*) AS n_bigrams, SUM(m.cnt) AS familiarity_sum
      FROM bg b JOIN model m USING (bg) GROUP BY b.doc_id
    ),
    q2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_familiarity,
             CAST(SUM(familiarity_sum) AS BIGINT) AS familiarity_total,
             CAST(SUM(n_bigrams) AS BIGINT) AS bigrams_total
      FROM fam
    )
    SELECT q1.*, q2.* FROM q1, q2
    """,
)
def curation_scale_q(
    spark: SparkSession, sf_dir: str, scale: int = 1
) -> DataFrame:
    """Model-based scoring at benchmark volume: 200k documents (20
    hash-derived tokens each, ~4M token rows) synthesized distributively
    and pushed through BOTH train-then-score passes — the hashed linear
    classifier and the corpus bigram-familiarity model — reduced to one
    summary row. The throughput witness for the curation-scoring family,
    independent of the 5k-doc correctness table (cf. dedup_scale).
    ``scale`` multiplies docs at the fixed Zipf-ish bigram domain (real
    corpora reuse bigrams — domain growth is sublinear in corpus size);
    bench.py's scale section runs scale=10."""
    from erigon_extract_spark.operators.text import (
        bigram_familiarity,
        hashed_linear_quality,
    )

    # token_i is a function of (id % n_uniq, i): 4M token rows but a
    # Zipf-ish bounded bigram domain (19 * n_uniq keys) — real corpora
    # REUSE bigrams heavily; an all-unique-bigram corpus would make the
    # model join degenerate in a way no real dataset does
    n_docs, n_uniq = 200_000 * scale, 10_000
    words = [
        F.substring(
            F.md5(((F.col("id") % n_uniq) + F.lit(i * 131)).cast("string")),
            1,
            8,
        )
        for i in range(20)
    ]
    # materialize the synthetic corpus ONCE (eager, like the iterative
    # probes): the generator is 4M md5 calls, and the two train-then-score
    # branches would otherwise regenerate it per shuffle side — the probe
    # should time the OPERATORS, not the data synthesis
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *words).alias("text"),
        )
        .localCheckpoint()
    )
    # integer-exact aggregates ONLY: float avgs would be partition-order
    # dependent at the ulp level, which forbids the golden-value oracle
    # (weight_sum, n_tokens, familiarity_sum are exact int64 sums;
    # division for human-readable averages is the consumer's one-liner)
    q1 = hashed_linear_quality(docs).agg(
        F.count("*").alias("n_scored"),
        F.sum("weight_sum").cast("long").alias("weight_total"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
    )
    # broadcast_model: this probe's bigram domain is FIXED at 19 * n_uniq
    # keys by construction (the Zipf-ish reuse the docstring describes),
    # so the model side is a bounded dimension — broadcasting it removes
    # the probe's only corpus-sized shuffle (measured: 1.59 GB of
    # SortMergeJoin traffic at x100 -> per-doc aggregate only)
    q2 = bigram_familiarity(docs, broadcast_model=True).agg(
        F.count("*").alias("n_familiarity"),
        F.sum("familiarity_sum").cast("long").alias("familiarity_total"),
        F.sum("n_bigrams").cast("long").alias("bigrams_total"),
    )
    return q1.crossJoin(q2)


def _random_projection_oracle_sql(dim: int = 64, out_dim: int = 16) -> str:
    from erigon_extract_spark.operators.similarity import _hyperplane

    cols = ",\n           ".join(
        "ROUND(list_dot_product(v, ["
        + ", ".join(repr(x) for x in _hyperplane(dim, 7 * 1000 + j))
        + f"]), 6) AS p{j}"
        for j in range(out_dim)
    )
    return f"""
    SELECT vec_id,
           {cols}
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    """


@query("embedding_random_projection", _random_projection_oracle_sql())
def embedding_random_projection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL dimensionality reduction 64→16 with LCG plane constants shared
    verbatim between the Spark plan and the DuckDB oracle
    (operators/similarity.random_projection) — the embedding-pipeline
    storage/ANN precursor, fully value-gated, zero shuffles."""
    from erigon_extract_spark.operators.similarity import random_projection

    emb = _load(spark, sf_dir, "embeddings")
    return random_projection(emb, dim=64, out_dim=16)


@query(
    "embedding_quantize_int8",
    """
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    mm AS (
      SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM vecs
    )
    SELECT vec_id,
           i - 1 AS dim,
           CASE WHEN mx > mn
                THEN LEAST(255, CAST(floor((v[i] - mn) * 255.0 / (mx - mn))
                                     AS BIGINT))
                ELSE 0 END AS code,
           ROUND(mn, 6) AS mn_r,
           ROUND(mx, 6) AS mx_r
    FROM mm, UNNEST(generate_series(1, len(v))) AS u(i)
    """,
)
def embedding_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization codes under the hash gate
    (operators/similarity.quantize_int8): 4x embedding storage compression
    as a pure map pass; reconstruction error bound pinned in pytest."""
    from erigon_extract_spark.operators.similarity import quantize_int8

    emb = _load(spark, sf_dir, "embeddings")
    return quantize_int8(emb)


@query("sim_lsh_index_topk", _lsh_topk_oracle_sql())
def sim_lsh_index_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-index LSH path under the same oracle as the in-memory
    bucket join: build the bucket-partitioned parquet index
    (operators/similarity.build_lsh_index), then answer the probes via a
    partition-pruned read (query_lsh_index). Identical results to
    sim_lsh_topk — the layout changes WHERE candidates are read from (a
    pruned directory subset), not what they are; pruning is asserted in
    tests/test_similarity.py."""
    import os

    from erigon_extract_spark.operators.similarity import (
        build_lsh_index,
        query_lsh_index,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    parent = _cached_artifact(
        sf_dir, "embeddings", "lshidx", "dim=64,n_planes=6",
        lambda tmp: build_lsh_index(
            emb, os.path.join(tmp, "idx"), dim=64, n_planes=6
        ),
    )
    path = os.path.join(parent, "idx")
    out = query_lsh_index(spark, path, probes, dim=64, k=10, n_planes=6)
    return out.select("probe_id", "vec_id", F.round("cosine", 6).alias("cosine"))


@query("text_bpe_tokenize")  # iterative trained merges -> not SQL-expressible;
# rows-only; merge sequence + encodings pinned vs a reference python BPE
# implementation in tests/test_bpe.py
def text_bpe_tokenize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer trained ON the corpus (operators/bpe.py: distributed
    pair counting over the distinct-word table, driver argmax per round,
    Catalyst-fold merge application), then applied to count tokens per
    document. The whitespace count rides along as the ratio baseline."""
    from erigon_extract_spark.operators.bpe import encode_bpe, train_bpe

    docs = _load(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=8, checkpoint_every=4)
    enc = encode_bpe(docs, merges)
    return enc.groupBy("doc_id").agg(
        F.sum("n_word_tokens").alias("n_bpe_tokens"),
        F.count("*").alias("n_words"),
    )


# Fixed corpus for the driver-visible BPE differential gate: small enough
# that the expected tokenization embeds as oracle literals, rich enough to
# exercise real merge competition (shared prefixes/suffixes, ties).
_BPE_CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "lowest newest widest lower",
    "newest lowest low wide new",
    "wider lower low new newest",
]


def _ref_bpe_expected(n_merges: int) -> list[tuple[int, int, str, int]]:
    """Pure-python reference BPE (independent of operators/bpe.py: plain
    dict/Counter loops, no Spark) producing the expected
    (doc_id, word_idx, word, n_word_tokens) rows for _BPE_CORPUS."""
    from collections import Counter

    words = Counter(w for line in _BPE_CORPUS for w in line.split())
    vocab = {w: list(w) for w in words}
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        a, b = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return [
        (d, i, w, len(vocab[w]))
        for d, line in enumerate(_BPE_CORPUS)
        for i, w in enumerate(line.split())
    ]


def _bpe_synthetic_oracle_sql() -> str:
    rows = ",\n      ".join(
        f"({d}, {i}, '{w}', {n})" for d, i, w, n in _ref_bpe_expected(12)
    )
    return f"""
    SELECT CAST(c0 AS BIGINT) AS doc_id,
           CAST(c1 AS BIGINT) AS word_idx,
           c2 AS word,
           CAST(c3 AS BIGINT) AS n_word_tokens
    FROM (VALUES
      {rows}
    ) AS t(c0, c1, c2, c3)
    """


# The driver-visible BPE gate (VERDICT r4 #5): the REAL distributed
# trainer (pair-count aggregations, driver argmax, Catalyst-fold merge
# application) runs on a fixed literal corpus; the oracle's expected
# rows are computed at registration time by an INDEPENDENT pure-python
# BPE (no shared code with operators/bpe.py) — a true differential test
# under the driver's value hash. The corpus-scale variant
# (text_bpe_tokenize, trained on the documents table) stays rows-only:
# its merges depend on corpus content no static SQL can reproduce.
@query("text_bpe_synthetic", _bpe_synthetic_oracle_sql())
def text_bpe_synthetic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from erigon_extract_spark.operators.bpe import encode_bpe

    docs = spark.createDataFrame(
        list(enumerate(_BPE_CORPUS)), "doc_id long, text string"
    )
    merges = _synthetic_merges(spark, 12)
    return encode_bpe(docs, merges).select(
        "doc_id",
        F.col("word_idx").cast("long").alias("word_idx"),
        "word",
        F.col("n_word_tokens").cast("long").alias("n_word_tokens"),
    )


def _pack_bpe_budget_oracle_sql(
    context_tokens: int = 8, n_shards: int = 2
) -> str:
    """Expected packing of _BPE_CORPUS under the reference BPE's token
    counts, computed in plain python (shard = pmod(doc_id, n_shards),
    per-shard exclusive running sum in doc_id order, chunk = cum //
    budget) and embedded as literals — the composed trainer+packer
    differential. n_shards=2 and an 8-token budget are chosen so shards
    hold MULTIPLE docs and both chunk_id and chunk_offset take nonzero
    values (with one doc per shard every accumulator would be zero and
    the packing arithmetic would go untested — r5 review finding)."""
    per_doc: dict[int, int] = {}
    for d, _i, _w, n in _ref_bpe_expected(12):
        per_doc[d] = per_doc.get(d, 0) + n
    rows = []
    cum_by_shard: dict[int, int] = {}
    for d in sorted(per_doc):
        shard = d % n_shards
        cum = cum_by_shard.get(shard, 0)
        rows.append(
            (d, shard, per_doc[d], cum // context_tokens,
             cum % context_tokens)
        )
        cum_by_shard[shard] = cum + per_doc[d]
    assert any(c for _d, _s, _n, c, _o in rows), "chunking untested"
    assert any(o for _d, _s, _n, _c, o in rows), "offsets untested"
    vals = ",\n      ".join(
        f"({d}, {s}, {n}, {c}, {o})" for d, s, n, c, o in rows
    )
    return f"""
    SELECT CAST(c0 AS BIGINT) AS doc_id,
           CAST(c1 AS BIGINT) AS shard,
           CAST(c2 AS BIGINT) AS n_tokens,
           CAST(c3 AS BIGINT) AS chunk_id,
           CAST(c4 AS BIGINT) AS chunk_offset
    FROM (VALUES
      {vals}
    ) AS t(c0, c1, c2, c3, c4)
    """


_BPE_SYNTH_MERGES: dict[int, list] = {}


def _synthetic_merges(spark: SparkSession, n_merges: int) -> list:
    """Train-once cache for the fixed _BPE_CORPUS: both synthetic gates
    need the same merge list, and each training is ~n_merges sequential
    driver rounds — memoize per process (the corpus is a module literal,
    so the result can never go stale)."""
    from erigon_extract_spark.operators.bpe import train_bpe

    if n_merges not in _BPE_SYNTH_MERGES:
        docs = spark.createDataFrame(
            list(enumerate(_BPE_CORPUS)), "doc_id long, text string"
        )
        _BPE_SYNTH_MERGES[n_merges] = train_bpe(
            docs, n_merges=n_merges, checkpoint_every=4
        )
    return _BPE_SYNTH_MERGES[n_merges]


def _pack_under_bpe(docs, merges, *, context_tokens: int, n_shards: int):
    """The trained-tokenizer packing composition (ONE definition — the
    corpus-scale pack_by_bpe_budget and the synthetic gate run literally
    the same code path): BPE token counts per doc feed
    pack_sequences(tokens_col=...)."""
    from erigon_extract_spark.operators.bpe import encode_bpe
    from erigon_extract_spark.operators.packing import pack_sequences

    counts = (
        encode_bpe(docs, merges)
        .groupBy("doc_id")
        .agg(F.sum("n_word_tokens").alias("n_bpe"))
    )
    # LEFT join: a whitespace-only doc yields no encode_bpe rows; it must
    # still pack (n_tokens=0 via the tokens_col coalesce), matching the
    # whitespace-count path's behavior
    return pack_sequences(
        docs.join(counts, "doc_id", "left"),
        context_tokens=context_tokens,
        n_shards=n_shards,
        tokens_col="n_bpe",
    )


# Composed trainer->packer differential gate: the REAL distributed BPE
# feeds pack_sequences(tokens_col=...) on the fixed corpus; expected
# chunk assignments come from the independent python BPE + a python
# mirror of the packing arithmetic. Closes the last trained-BPE surface
# without a driver-visible check (the corpus-scale pack_by_bpe_budget
# stays rows-only for the same reason text_bpe_tokenize does).
@query("pack_bpe_budget_synthetic", _pack_bpe_budget_oracle_sql())
def pack_bpe_budget_synthetic_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = spark.createDataFrame(
        list(enumerate(_BPE_CORPUS)), "doc_id long, text string"
    )
    return _pack_under_bpe(
        docs, _synthetic_merges(spark, 12), context_tokens=8, n_shards=2
    ).select("doc_id", "shard", "n_tokens", "chunk_id", "chunk_offset")


def _profile_oracle_sql() -> str:
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    parts = [
        f"""
    SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_s,
           CAST(MAX({c}) AS VARCHAR) AS max_s
    FROM documents"""
        for c in cols
    ]
    return "\n    UNION ALL".join(parts)


@query("profile_documents", _profile_oracle_sql())
def profile_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profiling report (operators/profile.py):
    null counts, exact cardinalities, string-rendered ranges for every
    documents column in ONE aggregation job — the ingest sanity gate a
    pipeline runs before training on a new data drop."""
    from erigon_extract_spark.operators.profile import profile_table

    docs = _load(spark, sf_dir, "documents")
    return profile_table(docs, exact=True)


@query(
    "corpus_pipeline_v2",
    """
    WITH s AS (
      SELECT doc_id, i AS pos, parts[i] AS sent, md5(parts[i]) AS h
      FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
           UNNEST(generate_series(1, len(parts))) AS u(i)
      WHERE length(parts[i]) > 0
    ),
    freq AS (SELECT h FROM s GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 3),
    m AS (
      SELECT s.doc_id, s.pos, s.sent, (f.h IS NOT NULL) AS is_boiler
      FROM s LEFT JOIN freq f ON s.h = f.h
    ),
    stripped AS (
      SELECT doc_id,
             COALESCE(string_agg(CASE WHEN NOT is_boiler THEN sent END,
                                 '. ' ORDER BY pos), '') AS kept_text,
             CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed
      FROM m GROUP BY doc_id
    ),
    tok AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               UNNEST(string_split(
                 trim(regexp_replace(lower(kept_text), '\\s+', ' ', 'g')), ' '
               )) AS tok
        FROM stripped
      ) WHERE length(tok) > 0
    ),
    w AS (
      SELECT doc_id,
             (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024)
               * 2654435761 % 2001 - 1000 AS w
      FROM tok
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS weight_sum
      FROM w GROUP BY doc_id
    ),
    scored AS (
      SELECT a.doc_id, st.n_removed,
             ROUND(0.5 + (0.5 * (CAST(weight_sum AS DOUBLE)
                                 / CAST(n_tokens * 1000 AS DOUBLE)))
                         / (1.0 + abs(CAST(weight_sum AS DOUBLE)
                                      / CAST(n_tokens * 1000 AS DOUBLE))), 6)
               AS quality_score
      FROM agg a JOIN stripped st USING (doc_id)
    ),
    kept AS (SELECT * FROM scored WHERE quality_score >= 0.5),
    sharded AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('shuf1_' || CAST(doc_id AS VARCHAR)),
                                 1, 8) AS BIGINT) % 8 AS shard,
             md5('shuf1_' || CAST(doc_id AS VARCHAR)) AS hh
      FROM kept
    )
    SELECT k.doc_id, k.n_removed, k.quality_score, sh.shard,
           ROW_NUMBER() OVER (PARTITION BY sh.shard
                              ORDER BY sh.hh, sh.doc_id) AS shard_pos
    FROM kept k JOIN sharded sh USING (doc_id)
    """,
)
def corpus_pipeline_v2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-3 curation operators COMPOSED into one gated plan:
    cross-doc boilerplate strip → model-based quality filter (hashed
    linear classifier on the STRIPPED text) → deterministic training-order
    shard assignment of the survivors. Each stage is independently gated
    elsewhere; this query witnesses that they compose under one hash —
    the corpus_curation_keep_list pattern for the new family."""
    from erigon_extract_spark.operators.sampling import shuffle_order
    from erigon_extract_spark.operators.text import (
        hashed_linear_quality,
        strip_boilerplate,
    )

    docs = _load(spark, sf_dir, "documents")
    stripped = strip_boilerplate(docs, min_docs=3)
    scored = hashed_linear_quality(stripped, text_col="kept_text")
    kept = scored.filter(F.col("keep")).join(
        stripped.select("doc_id", "n_removed"), "doc_id"
    )
    shards = shuffle_order(kept.select("doc_id"), "doc_id")
    return kept.join(shards, "doc_id").select(
        "doc_id", "n_removed", "quality_score", "shard", "shard_pos"
    )


@query(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey,
             md5(concat(
                 CASE WHEN o_custkey IS NULL THEN 'n'
                      ELSE 'v' || md5(CAST(o_custkey AS VARCHAR)) END,
                 CASE WHEN o_orderstatus IS NULL THEN 'n'
                      ELSE 'v' || md5(o_orderstatus) END,
                 CASE WHEN o_orderpriority IS NULL THEN 'n'
                      ELSE 'v' || md5(o_orderpriority) END)) AS fp
      FROM orders WHERE o_orderkey % 7 != 0
    ),
    new AS (
      SELECT o_orderkey,
             md5(concat(
                 CASE WHEN o_custkey IS NULL THEN 'n'
                      ELSE 'v' || md5(CAST(o_custkey AS VARCHAR)) END,
                 CASE WHEN (CASE WHEN o_orderkey % 3 = 0 THEN 'X'
                                 ELSE o_orderstatus END) IS NULL THEN 'n'
                      ELSE 'v' || md5(CASE WHEN o_orderkey % 3 = 0 THEN 'X'
                                           ELSE o_orderstatus END) END,
                 CASE WHEN o_orderpriority IS NULL THEN 'n'
                      ELSE 'v' || md5(o_orderpriority) END)) AS fp
      FROM orders WHERE o_orderkey % 5 != 0
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.fp IS NULL THEN 'added'
                WHEN new.fp IS NULL THEN 'removed'
                WHEN old.fp = new.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old FULL OUTER JOIN new USING (o_orderkey)
    """,
)
def snapshot_diff_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-drop diff under the hash gate (operators/diff.snapshot_diff):
    two deterministic synthetic snapshots of orders (different key filters;
    every 3rd status mutated) produce per-key added/removed/changed/
    unchanged labels via one fingerprint full-outer join. Compare columns
    are string/int only — float→string rendering is not engine-portable,
    per the operator contract."""
    from erigon_extract_spark.operators.diff import snapshot_diff

    orders = _load(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    return snapshot_diff(
        old,
        new,
        ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_orderpriority"],
    )


@query(
    "events_zscore_outliers",
    """
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             STDDEV_SAMP(value) AS sigma,
             COUNT(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.value, 6) AS value,
           ROUND((e.value - s.mu) / s.sigma, 3) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sigma > 0 AND abs(ROUND((e.value - s.mu) / s.sigma, 3)) > 3
    """,
)
def events_zscore_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection: one stats aggregate per
    event_type (map-side combine), broadcast back onto the stream, flag
    |z| > 3. The metric-anomaly primitive of event analytics; z rounded
    to 3 (float aggregation tails differ across engines below that)."""
    ev = _events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.abs(F.round(z, 3)) > 3))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 3).alias("z"),
        )
    )


@query(
    "w_rolling_time_window",
    """
    WITH e AS (
      SELECT event_id, user_id,
             epoch_us(ts) // 1000000 AS tick_s,
             value
      FROM events
    )
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           ROUND(SUM(ROUND(value, 6)) OVER w, 4) AS sum_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY tick_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def w_rolling_time_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling aggregate: per-user trailing-1-hour event count
    and value sum at every event — the VALUE-bounded window frame (rows at
    arbitrary density inside a fixed time span), the frame family the
    rows-frame running sums can't express. Ticks derive from the stored
    ntz value (timestampdiff), never the session timezone; the inner
    ROUND(value, 6) fixes the summand so the oracle accumulates identical
    doubles."""
    ev = _events_raw(spark, sf_dir)
    tick = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
        " ts) div 1000000"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tick_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.select(
            "event_id", "user_id", tick.alias("tick_s"), "value"
        )
        .select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_1h"),
            F.round(F.sum(F.round("value", 6)).over(w), 4).alias("sum_1h"),
        )
    )


@query(
    "corpus_balanced_sample",
    """
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5('bal1_' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
)
def corpus_balanced_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced subset: at most 10 docs per (lang, source) cell in
    stable hash order (operators/sampling.balanced_sample) — deterministic
    balancing that keeps dominant sources from swamping a mix, append-
    stable across corpus regrowth."""
    from erigon_extract_spark.operators.sampling import balanced_sample

    docs = _load(spark, sf_dir, "documents")
    return balanced_sample(docs, ["lang", "source"], "doc_id", 10).select(
        "doc_id", "lang", "source"
    )


@query(
    "events_funnel",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS tick
      FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(tick) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.tick) AS t2
      FROM e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.tick > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.tick) AS t3
      FROM e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.tick > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_step1,
           (SELECT COUNT(*) FROM s2) AS n_step2,
           (SELECT COUNT(*) FROM s3) AS n_step3
    """,
)
def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): each stage is the MIN
    event time strictly AFTER the user's previous stage — the sequential-
    conversion primitive of event analytics. Per-stage min-aggregates with
    map-side combine; joins are user-keyed (co-locatable by bucketing);
    ticks are epoch integers from the stored ntz value."""
    ev = _events_raw(spark, sf_dir)
    tick = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    e = ev.select("user_id", "event_type", tick.alias("tick"))
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tick").alias("t1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("tick") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("tick").alias("t2"))
    )
    s3 = (
        e.join(s2, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("tick") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("tick").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_step1"))
        .crossJoin(s2.agg(F.count("*").alias("n_step2")))
        .crossJoin(s3.agg(F.count("*").alias("n_step3")))
    )


@query(
    "events_retention_cohorts",
    """
    WITH e AS (
      SELECT user_id,
             CAST(epoch_us(ts) // (86400000000 * 7) AS BIGINT) AS week
      FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(week) AS cohort FROM e GROUP BY user_id
    )
    SELECT f.cohort, e.week - f.cohort AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM e JOIN first_seen f USING (user_id)
    GROUP BY f.cohort, e.week - f.cohort
    """,
)
def events_retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, activity counted
    per week offset — the long-format retention matrix. First-seen is a
    min-agg (map-side combine) joined back on the user key; week derives
    from integer epoch arithmetic so the bucketing is session-independent."""
    ev = _events_raw(spark, sf_dir)
    week = (
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        )
        / F.lit(86400000000 * 7)
    ).cast("long")
    e = ev.select("user_id", week.alias("week"))
    first_seen = e.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        e.join(first_seen, "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query("pack_by_bpe_budget")  # trained tokenizer -> rows-only
def pack_by_bpe_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing under the TRAINED tokenizer's budget: BPE token
    counts per doc (operators/bpe.py) feed concat-and-chunk packing
    (operators/packing.pack_sequences tokens_col) — the composition a real
    pretraining assembly runs, where context budgets are tokenizer tokens,
    not whitespace words. Shares the _pack_under_bpe composition with
    the synthetic differential gate — the hash-gated path IS this path."""
    from erigon_extract_spark.operators.bpe import train_bpe

    docs = _load(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=8, checkpoint_every=4)
    return _pack_under_bpe(
        docs, merges, context_tokens=2048, n_shards=8
    ).select("doc_id", "shard", "n_tokens", "chunk_id", "chunk_offset")


@query(
    "text_blocklist_filter",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(
                  lower(text),
                  '\b(spamword|malwarelink|phishbait|clickfarm)\b'))
                AS BIGINT) AS n_blocked_terms,
           len(regexp_extract_all(
                  lower(text),
                  '\b(spamword|malwarelink|phishbait|clickfarm)\b')) = 0
             AS keep
    FROM documents
    """,
)
def text_blocklist_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter (operators/curation.blocklist_filter):
    word-boundary hit counts per doc, keep = zero hits — the same
    RE2/Java-common-subset pattern on both sides."""
    from erigon_extract_spark.operators.curation import blocklist_filter

    docs = _load(spark, sf_dir, "documents")
    return blocklist_filter(docs)


@query(
    "text_chunk_overlap",
    """
    WITH w AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w
      FROM documents
    )
    SELECT doc_id,
           s // 48 AS chunk_idx,
           s + 1 AS chunk_start_token,
           CAST(len(list_slice(w, s + 1, s + 64)) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(list_slice(w, s + 1, s + 64), ' ') AS chunk_text
    FROM w, UNNEST(generate_series(0, greatest(len(w) - 1, 0), 48)) AS u(s)
    WHERE len(w) > 0 AND w[1] != ''
      -- mirror chunk_documents: drop a trailing window fully contained in
      -- the previous one (adds no tokens beyond chunk_tokens - stride)
      AND (s = 0 OR len(list_slice(w, s + 1, s + 64)) > 64 - 48)
    """,
)
def text_chunk_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows every 48 —
    operators/text.chunk_documents): the embedding/RAG prep pass, under
    the hash gate including the reconstructed chunk text."""
    from erigon_extract_spark.operators.text import chunk_documents

    docs = _load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, stride=48)


@query(
    "text_top_terms",
    """
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM tokens WHERE term != '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS ttf
           FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df, df.ttf,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS term_rank
      FROM tf JOIN df USING (term), n
      WHERE df.df * 10 <= n.n_docs * 9
    )
    SELECT doc_id, term_rank, term, tf, df, ttf
    FROM ranked WHERE term_rank <= 3
    """,
)
def text_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-distinctive keyword extraction (operators/text.top_terms):
    integer-exact TF-IDF — rank by (tf DESC, df ASC, term ASC) with the
    9/10-df stopword drop (the synthetic corpus has a 31-term vocabulary,
    so the default majority cutoff would leave almost nothing; 9/10 keeps
    the join + top-k window doing real work) — so the full keyword table
    hash-gates across engines (no float log scores)."""
    from erigon_extract_spark.operators.text import top_terms

    docs = _load(spark, sf_dir, "documents")
    return top_terms(docs, k=3, max_df_num=9, max_df_den=10)


# ---------------------------------------------------------------------------
# Registration order = driver verification priority. The driver's
# correctness gate records the FIRST 50 registered queries; put one
# hash-verified representative of every distinct operator family inside
# that window. Rows-only variants whose family already has a portable
# hash-matched witness (minhash/simhash LSH, LSH top-k, HLL, u256) and
# TPC-H adaptations that share a shape with an in-window query move after
# the window — still registered, still run by pytest/bench, just not
# burning gate slots.
# ---------------------------------------------------------------------------

@query(
    "text_index_and_search",
    """
    WITH toks AS (
      SELECT doc_id, t.term
      FROM documents,
           UNNEST(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}'']+'))
             AS t(term)
      WHERE t.term <> ''
    ),
    p AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term IN ('spark', 'merge')
      GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
           CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM p GROUP BY doc_id
    HAVING COUNT(DISTINCT term) = 2
    """,
)
def text_index_and_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval from the PERSISTED inverted index
    (operators/invindex.py): postings (term, doc_id, tf) partitioned by
    xxhash64 term bucket; the query's terms route to buckets through
    the same Spark expression the writer used, and the scan prunes to
    those bucket directories at planning time (the LSH/IVFPQ index
    convention, now for text). AND semantics = posting-list aggregate,
    never a corpus join. Index built once per dataset fingerprint in
    the uid-scoped cache. Oracle: DuckDB re-derives the postings from
    the same tokenizer class and intersects."""
    import os

    from erigon_extract_spark.operators.invindex import (
        build_inverted_index,
        query_inverted_index,
    )

    docs = _load(spark, sf_dir, "documents")
    parent = _cached_artifact(
        sf_dir, "documents", "invindex", "n_buckets=64,v1",
        lambda tmp: build_inverted_index(
            docs, os.path.join(tmp, "idx"), n_buckets=64
        ),
    )
    return query_inverted_index(
        spark, os.path.join(parent, "idx"), ["spark", "merge"], mode="and"
    )


@query(
    "sample_reservoir_per_key",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(concat(lang, '|', CAST(doc_id AS VARCHAR))),
                        doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 3
    """,
)
def sample_reservoir_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-key uniform sample
    (operators/sampling.reservoir_per_key): rows rank by
    md5(key || '|' || id) within their key — membership independent of
    partitioning, engine, and arrival order, so the oracle reproduces
    the exact sample. The distributed stand-in for per-group reservoir
    sampling (eval-subset carving, per-source spot checks)."""
    from erigon_extract_spark.operators.sampling import reservoir_per_key

    docs = _load(spark, sf_dir, "documents")
    return reservoir_per_key(docs, "lang", "doc_id", k=3).select(
        "doc_id", "lang"
    )


@query(
    "source_csv_roundtrip",
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
)
def source_csv_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink under the value hash: the documents table is
    written as quoted/escaped CSV shards (Spark's native writer — the
    interchange format every upstream dump eventually arrives in) and
    read back with the explicit contract schema (no inferSchema pass;
    multiLine + escape so embedded quotes/newlines survive). The
    reassembled rows must hash-match the original table — the same
    roundtrip discipline as source_webdataset_roundtrip. Shards are
    built once per dataset fingerprint in the uid-scoped cache."""
    import os

    docs = _load(spark, sf_dir, "documents")
    # emptyValue/nullValue pinned on BOTH sides: without them an empty
    # string writes as an unquoted empty field and reads back as NULL —
    # a silent ''/NULL conflation the roundtrip contract must not allow
    parent = _cached_artifact(
        sf_dir, "documents", "csvshards", "v2",
        lambda tmp: docs.repartition(4).write
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", '""')
        .option("nullValue", "\\N")
        .csv(os.path.join(tmp, "csv")),
    )
    return (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", '""')
        .option("nullValue", "\\N")
        .csv(os.path.join(parent, "csv"))
    )


@query(
    "graph_pagerank",
    """
    WITH RECURSIVE gen AS (
      SELECT i FROM UNNEST(generate_series(0, 499)) AS t(i)
    ),
    edges AS (
      SELECT i AS u, (i * 7 + 3) % 500 AS v FROM gen
      UNION
      SELECT i AS u, (i * 13 + 5) % 500 AS v FROM gen
    ),
    deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY u),
    pr AS (
      SELECT i AS node, CAST(1000000000 AS BIGINT) AS rank_fp, 0 AS iter
      FROM gen
      UNION ALL
      SELECT e.v AS node,
             CAST(150000000
                  + SUM((85 * p.rank_fp) // (100 * d.outdeg)) AS BIGINT)
               AS rank_fp,
             MIN(p.iter) + 1 AS iter
      FROM pr p
      JOIN edges e ON e.u = p.node
      JOIN deg d ON d.u = p.node
      WHERE p.iter < 10
      GROUP BY e.v
    )
    SELECT node, rank_fp FROM pr WHERE iter = 10
    """,
)
def graph_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (operators/graph.pagerank, 10
    synchronous iterations, d=0.85, ranks in 1e-9 units): every
    per-edge contribution is floored to an integer BEFORE summation,
    so the result is bit-identical across engines and partitionings —
    float PageRank can't hash-gate because per-vertex float sums vary
    with accumulation order. Graph: the union of two affine functional
    maps x -> 7x+3 and x -> 13x+5 (mod 500) — both invertible mod 500,
    so every node has out- and in-edges (no dangling leak, no
    empty-contribution rows) while out/in degrees still vary where the
    two maps coincide. Oracle: DuckDB recursive CTE running the same
    integer recurrence."""
    from erigon_extract_spark.operators.graph import pagerank

    gen = spark.range(500)
    edges = gen.select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 3) % 500).alias("dst")
    ).unionAll(
        gen.select(
            F.col("id").alias("src"),
            ((F.col("id") * 13 + 5) % 500).alias("dst"),
        )
    )
    return pagerank(edges, n_iter=10)


@query(
    "dedup_levenshtein",
    """
    WITH n AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
    FROM n a JOIN n b
      ON a.lang = b.lang AND b.doc_id > a.doc_id
      AND length(b.t) BETWEEN length(a.t) - 16 AND length(a.t) + 16
    WHERE levenshtein(a.t, b.t) <= 16
    """,
)
def dedup_levenshtein_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT edit-distance near-dup pairs
    (operators/dedup.levenshtein_near_pairs): every same-language pair
    within 16 edits of each other on normalized text — the
    entity-resolution verify stage that upgrades LSH's "probably
    similar" to "provably within k edits". Candidates come from
    length-bucket blocking (edit distance >= |len diff|, so bucket
    floor(len/16) + {-1,0,+1} vs base enumerates exactly the
    qualifying pairs — complete, no LSH recall loss); the levenshtein
    kernel is the built-in JVM function in its THRESHOLDED band-limited
    form (O(k*len) per pair, early exit past k — not O(len^2)) and only
    runs on survivors. Oracle: direct length-banded self-join with
    DuckDB's levenshtein."""
    from erigon_extract_spark.operators.dedup import levenshtein_near_pairs

    docs = _load(spark, sf_dir, "documents")
    return levenshtein_near_pairs(docs, max_dist=16).select(
        "doc_id_a", "doc_id_b", F.col("dist").cast("long").alias("dist")
    )


@query(
    "multimodal_image_ahash",
    """
    WITH px AS (
      SELECT d.d AS d, (y.y // 8) * 8 + (x.x // 8) AS blk,
             ((y.y * (3 + d.d % 40) + x.x * (5 + 2 * (d.d % 40))
               + y.y * x.x) % 251
              + CASE WHEN (y.y * 64 + x.x) % 101 < d.d // 40
                     THEN d.d // 40 ELSE 0 END) AS v
      FROM UNNEST(generate_series(0, 199)) AS d(d),
           UNNEST(generate_series(0, 63)) AS y(y),
           UNNEST(generate_series(0, 63)) AS x(x)
    ),
    blocks AS (SELECT d, blk, SUM(v) AS bs FROM px GROUP BY 1, 2),
    tot AS (SELECT d, SUM(bs) AS t FROM blocks GROUP BY 1),
    bands AS (
      SELECT b.d, b.blk // 16 AS k,
             CAST(SUM(CASE WHEN b.bs * 64 > t.t
                           THEN 1 << (b.blk % 16) ELSE 0 END) AS BIGINT)
               AS bv
      FROM blocks b JOIN tot t USING (d)
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.d AS img_a, b.d AS img_b
      FROM bands a JOIN bands b
        ON a.k = b.k AND a.bv = b.bv AND a.d < b.d
    ),
    wide AS (
      SELECT d,
             MAX(CASE WHEN k = 0 THEN bv END) AS b0,
             MAX(CASE WHEN k = 1 THEN bv END) AS b1,
             MAX(CASE WHEN k = 2 THEN bv END) AS b2,
             MAX(CASE WHEN k = 3 THEN bv END) AS b3
      FROM bands GROUP BY d
    )
    SELECT c.img_a, c.img_b,
           CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
              + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
             AS BIGINT) AS hamming
    FROM cand c
    JOIN wide wa ON wa.d = c.img_a
    JOIN wide wb ON wb.d = c.img_b
    WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
        + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) <= 3
    """,
)
def multimodal_image_ahash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual average-hash over a
    REAL binary image column (operators/multimodal.ahash_from_png +
    ahash_near_pairs): 200 synthetic 64x64 grayscale images — 40 base
    patterns x 5 noise replicas — are PNG-encoded, carried as a binary
    column, decoded through the real codec (functions/png.py), hashed
    with the integer-exact aHash (bit = block_sum*64 > grand_sum — no
    float mean, so the hash is engine-independent), and paired via the
    16-bit-band pigeonhole blocking at hamming <= 3. Replicas measure
    <= 3 bits apart, distinct bases >= 17, so the result is exactly
    the 400 intra-group pairs. Oracle: DuckDB rebuilds the hash from
    the pixel formula (PNG is lossless, so decoded pixels ARE the
    formula) and pairs with the same blocking."""
    import pandas as pd

    from erigon_extract_spark.operators.multimodal import (
        ahash_from_png,
        ahash_near_pairs,
    )

    def synth(batches):
        import numpy as np

        from erigon_extract_spark.functions.png import encode_png

        for pdf in batches:
            yy, xx = np.mgrid[0:64, 0:64]
            rows = []
            for d in pdf["id"]:
                d = int(d)
                g, p = d % 40, d // 40
                base = (yy * (3 + g) + xx * (5 + 2 * g) + yy * xx) % 251
                img = (base + np.where((yy * 64 + xx) % 101 < p, p, 0))
                rows.append((d, encode_png(img.astype("uint8"))))
            yield pd.DataFrame(rows, columns=["img_id", "png"])

    images = spark.range(200).mapInPandas(
        synth, schema="img_id long, png binary"
    )
    return ahash_near_pairs(ahash_from_png(images), threshold=3)


@query(
    "text_lm_logprob",
    """
    WITH w AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                                              'g')), ' ') AS w
      FROM documents
    ),
    big AS (
      SELECT doc_id, w[s] AS w1, w[s + 1] AS w2
      FROM w, UNNEST(generate_series(1, len(w) - 1)) AS g(s)
      WHERE len(w) >= 2
    ),
    vocab AS (
      SELECT COUNT(DISTINCT t.t) AS v
      FROM w, UNNEST(w.w) AS t(t) WHERE t.t != ''
    ),
    counts AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
    ctx AS (SELECT w1, SUM(cb) AS cu FROM counts GROUP BY 1),
    scores AS (
      SELECT c.w1, c.w2,
             CAST(round(ln((c.cb + 1) / (x.cu + vocab.v)) * 1e6)
                  AS BIGINT) AS unats
      FROM counts c JOIN ctx x USING (w1), vocab
    ),
    scored AS (
      SELECT b.doc_id, COUNT(*) AS n, SUM(s.unats) AS lp
      FROM big b JOIN scores s USING (w1, w2)
      GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(q.n, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(q.lp, 0) AS BIGINT) AS logprob_unats
    FROM documents d LEFT JOIN scored q ON d.doc_id = q.doc_id
    """,
)
def text_lm_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM log-probability per document
    (operators/text.bigram_lm_logprob) — the perplexity-filter
    quantity itself (CCNet/KenLM class): an add-one-smoothed bigram LM
    is trained on the corpus, then each doc scores the sum of
    ln P(w2|w1) over its bigram instances, reported in integer
    MICRO-NATS so the per-doc float sum becomes an order-independent
    integer sum and hash-gates across engines. Oracle: DuckDB trains
    the same model and scores with its own ln()."""
    from erigon_extract_spark.operators.text import bigram_lm_logprob

    docs = _load(spark, sf_dir, "documents")
    return bigram_lm_logprob(docs)


@query(
    "source_orc_roundtrip",
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
)
def source_orc_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink under the value hash: the documents table takes a
    full write-to-ORC -> read-back round trip (Spark's built-in
    columnar ORC support — zlib-compressed stripes, predicate-pushdown
    capable like the Parquet path), built once per dataset fingerprint
    in the uid-scoped artifact cache. The oracle reads the ORIGINAL
    parquet, so any value the ORC writer or reader mangles
    (string encoding, nulls, int widths) hash-fails."""
    import os

    docs = _load(spark, sf_dir, "documents")
    parent = _cached_artifact(
        sf_dir, "documents", "orc", "v1",
        lambda tmp: docs.select(
            "doc_id", "text", "lang", "source", "n_chars"
        ).repartition(4).write.orc(os.path.join(tmp, "orc")),
    )
    return spark.read.orc(os.path.join(parent, "orc"))


@query(
    "dedup_containment",
    """
    WITH words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                                              'g')), ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
      FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_a FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b,
             COUNT(*) AS n_common
      FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id != r.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(sa.n_a AS BIGINT) AS n_a,
           CAST((n_common * 1000000) // sa.n_a AS BIGINT)
             AS containment_ppm
    FROM inter JOIN sizes sa ON sa.doc_id = doc_id_a
    WHERE n_common * 1000000 >= 600000 * sa.n_a
    """,
)
def dedup_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT asymmetric shingle containment
    (operators/dedup.containment_pairs, threshold 0.6, 3-gram
    shingles): ordered pairs where >= 60% of A's distinct shingles
    appear in B — the quote/inclusion detector Jaccard cannot express
    (a short doc fully quoted in a long one has containment 1.0 but
    tiny Jaccard). Spark side prunes candidates with one-sided prefix
    filtering (PPJoin adapted to the asymmetric measure: only A's
    rarest |A| - ceil(0.6*|A|) + 1 shingles feed the inverted-index
    join, then exact array_intersect verification — identical results
    to the naive plan). Score and threshold are integer ppm, no float
    crossing engines. Oracle: DuckDB runs the naive quadratic plan."""
    from erigon_extract_spark.operators.dedup import containment_pairs

    docs = _load(spark, sf_dir, "documents")
    return containment_pairs(docs, shingle_n=3, threshold=0.6)


@query(
    "quality_gopher_report",
    """
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
        CASE WHEN t = '' THEN 0
             ELSE len(string_split(t, ' ')) END AS n_words,
        CASE WHEN t = '' THEN 0
             ELSE length(t) - len(string_split(t, ' ')) + 1 END AS sum_wlen,
        len(regexp_extract_all(t, '#'))
          + len(regexp_extract_all(t, '\\.\\.\\.')) AS n_sym,
        len(list_filter(string_split(t, ' '),
                        x -> regexp_matches(x, '[a-z]'))) AS n_alpha_words,
        len(list_intersect(list_distinct(string_split(t, ' ')),
                           ['the','be','to','of','and','that','have','with']))
          AS n_stop
      FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(sum_wlen AS BIGINT) AS sum_wlen,
           CAST(n_sym AS BIGINT) AS n_sym,
           CAST(n_alpha_words AS BIGINT) AS n_alpha_words,
           CAST(n_stop AS BIGINT) AS n_stop,
           n_words BETWEEN 50 AND 100000 AS f_word_count,
           n_words > 0 AND 3 * n_words <= sum_wlen
             AND sum_wlen <= 10 * n_words AS f_mean_wlen,
           10 * n_sym <= n_words AS f_symbol,
           n_words > 0 AND 10 * n_alpha_words >= 8 * n_words AS f_alpha,
           n_stop >= 2 AS f_stop,
           (n_words BETWEEN 50 AND 100000)
             AND (n_words > 0 AND 3 * n_words <= sum_wlen
                  AND sum_wlen <= 10 * n_words)
             AND (10 * n_sym <= n_words)
             AND (n_words > 0 AND 10 * n_alpha_words >= 8 * n_words)
             AND (n_stop >= 2) AS keep
    FROM sig
    """,
)
def quality_gopher_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality report
    (operators/curation.gopher_quality_rules): per-document word count,
    mean-word-length band, symbol ratio, alphabetic-word fraction and
    stop-word presence, each as raw integer signals plus a boolean rule
    flag, combined into ``keep`` — the Rae et al. 2021 repetition-free
    rule subset. Every ratio rule is an integer cross-multiplication
    (3*n_words <= sum_wlen etc.), so the whole report is engine-exact.
    One codegen'd projection, zero shuffles. Oracle: DuckDB recomputes
    every signal from the same normalization."""
    from erigon_extract_spark.operators.curation import gopher_quality_rules

    docs = _load(spark, sf_dir, "documents")
    return gopher_quality_rules(docs)


@query(
    "text_tfidf_cosine",
    """
    WITH wsplit AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                                              'g')), ' ') AS w
      FROM documents
    ),
    words AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS t
      FROM wsplit, UNNEST(generate_series(1, len(w) - 2)) AS g(i)
    ),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    dfq AS (
      SELECT t, COUNT(*) AS df FROM tf GROUP BY 1
      HAVING COUNT(*) <= 100
    ),
    w AS (
      SELECT tf.doc_id, tf.t,
             tf.tf * CAST(round(ln(nd.n_docs / dfq.df) * 1000) AS BIGINT)
               AS w
      FROM tf JOIN dfq USING (t), nd
    ),
    norms AS (SELECT doc_id, SUM(w * w) AS n2 FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             COUNT(*) AS n_shared_terms, SUM(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           CAST(n_shared_terms AS BIGINT) AS n_shared_terms,
           round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
    FROM dots
      JOIN norms na ON na.doc_id = doc_id_a
      JOIN norms nb ON nb.doc_id = doc_id_b
    WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.8
    """,
)
def text_tfidf_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine document similarity
    (operators/text.tfidf_cosine_pairs, 3-gram shingle terms,
    max_df=100, threshold 0.8): the inverted-index bag-of-words
    complement to the dense-embedding similarity stack. Weights are
    integer (tf * milli-rounded idf) so dots and norms are order-free
    integer sums; the final cosine is three correctly-rounded IEEE ops
    on exactly-representable ints — engine-exact before the 6 dp
    round. Terms are word 3-grams because the synthetic corpus has a
    ~31-word vocabulary (every unigram is corpus-wide boilerplate);
    max_df prunes corpus-wide terms from the MEASURE (standard IR
    stop-wording), which also caps the join at sum_t df_t^2 with
    df_t <= 100 — the 100 TB contract. Oracle: DuckDB replays the
    identical weighting."""
    from erigon_extract_spark.operators.text import tfidf_cosine_pairs

    docs = _load(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(docs, max_df=100, threshold=0.8, shingle_n=3)


@query(
    "sink_partitioned_pruned",
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE lang = 'en'
    """,
)
def sink_partitioned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned read: the
    documents table is written once partitionBy(lang) into the artifact
    cache, then read back filtered to lang='en'. The filter must land
    as a planning-time PartitionFilter (directory pruning — only the
    lang=en subtree is ever listed or read; asserted in
    tests/test_round6_ops.py), the storage analog of the reference's
    keyed-cursor seeks. The oracle reads the ORIGINAL parquet, so any
    value the partitioned writer mangles (partition-column round-trip,
    encoding) hash-fails."""
    import os

    docs = _load(spark, sf_dir, "documents")
    parent = _cached_artifact(
        sf_dir, "documents", "bylang", "v1",
        lambda tmp: docs.repartition(4).write.partitionBy("lang").parquet(
            os.path.join(tmp, "p")
        ),
    )
    return (
        spark.read.parquet(os.path.join(parent, "p"))
        .filter(F.col("lang") == "en")
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@query(
    "sim_ivfpq_index_add",
    """
    SELECT vec_id AS probe_id,
           CAST(10 AS BIGINT) AS n_results,
           TRUE AS mean_recall_ok,
           TRUE AS added_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def sim_ivfpq_index_add_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance
    (operators/similarity.add_to_ivfpq_index): the index is built on
    HALF the corpus, the other half is ADDED with the codebooks frozen
    (the FAISS index.add() path — batch cost independent of index
    size, append-only cell directories). Two folded invariants gate
    it: (a) probes answered from the post-add index keep >= 0.3 recall
    against exact brute force over the FULL corpus — impossible if the
    added half were unreachable; (b) a sample of ADDED vectors
    self-probed with every cell scanned and full exact rerank returns
    itself as top-1 — pinning that added rows land in scannable
    partitions with intact vectors. Oracle: the constant fold."""
    import os

    from erigon_extract_spark.operators.similarity import (
        add_to_ivfpq_index,
        brute_force_topk,
        l2_norm,
        query_ivfpq_index,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    norm = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x / l2_norm(F.col("embedding"))
        ).alias("embedding"),
    )
    probes = norm.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = norm.filter(F.col("vec_id") >= 5)
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    added = corpus.filter(F.col("vec_id") % 2 == 1)

    def _build(tmp):
        idx = os.path.join(tmp, "idx")
        build_kwargs = dict(n_lists=8, m=8, n_codes=32)
        from erigon_extract_spark.operators.similarity import (
            build_ivfpq_index,
        )

        build_ivfpq_index(base, idx, **build_kwargs)
        add_to_ivfpq_index(spark, idx, added)

    parent = _cached_artifact(
        sf_dir, "embeddings", "ivfpq_add",
        "n_lists=8,m=8,n_codes=32,seed=42,half=even", _build,
    )
    path = os.path.join(parent, "idx")

    approx = query_ivfpq_index(
        spark, path, probes, k=10, n_probe=4, rerank=50
    )
    exact = brute_force_topk(corpus, probes, k=10)
    hits = (
        approx.select("probe_id", "vec_id")
        .join(exact.select("probe_id", "vec_id"), ["probe_id", "vec_id"])
        .agg(F.count("*").alias("__hits"))
    )
    n_probes = probes.count()
    mean_ok = hits.select(
        (F.col("__hits") >= F.lit(0.3 * n_probes * 10)).alias(
            "mean_recall_ok"
        )
    )
    # invariant (b): 5 added vectors self-probe exactly — every cell
    # scanned (n_probe = n_lists) + rerank beyond the corpus size makes
    # the answer exact, so top-1 must be the vector itself
    self_probes = added.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    n_self = self_probes.count()
    self_top1 = query_ivfpq_index(
        spark, path, self_probes, k=1, n_probe=8, rerank=1_000_000
    )
    added_ok = (
        self_top1.filter(F.col("probe_id") == F.col("vec_id"))
        .agg((F.count("*") == F.lit(n_self)).alias("added_ok"))
    )
    return (
        approx.groupBy("probe_id")
        .agg(F.count("*").alias("n_results"))
        .crossJoin(F.broadcast(mean_ok))
        .crossJoin(F.broadcast(added_ok))
    )


@query(
    "dedup_lsh_then_levenshtein",
    None,  # oracle assembled below (needs the shared minhash CTEs)
)
def dedup_lsh_then_lev_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB near-dup pipeline the levenshtein_near_pairs
    docstring promises: portable MinHash-LSH proposes candidate pairs
    (banded, bucket-local — never corpus^2), then the thresholded
    band-limited levenshtein kernel VERIFIES each candidate exactly —
    'probably similar' upgraded to 'provably within k edits', with the
    expensive kernel running only on LSH survivors. Output: every LSH
    candidate pair within 64 edits on normalized text. Oracle: the
    shared md5-minhash CTE chain + DuckDB's levenshtein."""
    from erigon_extract_spark.operators.dedup import (
        minhash_lsh_pairs_portable,
    )
    from erigon_extract_spark.operators.text import normalize_text

    docs = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_portable(docs).select("doc_id_a", "doc_id_b")
    n = docs.select(
        "doc_id", normalize_text(F.col("text")).alias("t")
    )
    return (
        pairs.join(
            n.select(F.col("doc_id").alias("doc_id_a"),
                     F.col("t").alias("__ta")),
            "doc_id_a",
        )
        .join(
            n.select(F.col("doc_id").alias("doc_id_b"),
                     F.col("t").alias("__tb")),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            F.levenshtein("__ta", "__tb", 64).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 64))
        .select("doc_id_a", "doc_id_b", F.col("dist").cast("long").alias("dist"))
    )


ORACLES["dedup_lsh_then_levenshtein"] = f"""
    WITH {_minhash_portable_ctes()},
    norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    )
    SELECT p.doc_id_a, p.doc_id_b,
           CAST(levenshtein(na.t, nb.t) AS BIGINT) AS dist
    FROM pairs p
      JOIN norm na ON na.doc_id = p.doc_id_a
      JOIN norm nb ON nb.doc_id = p.doc_id_b
    WHERE levenshtein(na.t, nb.t) <= 64
    """


@query(
    "events_interpolate_grid",
    """
    WITH ticks AS (
      SELECT g.g AS tick
      FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-02 23:00:00',
                           INTERVAL 1 HOUR) AS g(g)
    ),
    grid AS (
      SELECT u.user_id, t.tick
      FROM (SELECT DISTINCT user_id FROM events) u, ticks t
    ),
    samples AS (
      -- NULL-valued samples are NO samples (the operator filters them
      -- before bracketing; a kept NULL would desync value/time brackets)
      SELECT user_id, ts, MAX(value) AS v FROM events
      WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    prevq AS (
      SELECT g.user_id, g.tick,
             arg_max(s.v, s.ts) AS pv, MAX(epoch_us(s.ts)) AS pt
      FROM grid g LEFT JOIN samples s
        ON s.user_id = g.user_id AND s.ts <= g.tick
      GROUP BY 1, 2
    ),
    nextq AS (
      SELECT g.user_id, g.tick,
             arg_min(s.v, s.ts) AS nv, MIN(epoch_us(s.ts)) AS nt
      FROM grid g LEFT JOIN samples s
        ON s.user_id = g.user_id AND s.ts > g.tick
      GROUP BY 1, 2
    )
    SELECT p.user_id, p.tick,
           round(CASE
             WHEN p.pt IS NULL THEN n.nv
             WHEN n.nt IS NULL THEN p.pv
             ELSE p.pv + (n.nv - p.pv)
                  * ((epoch_us(p.tick) - p.pt) / (n.nt - p.pt))
           END, 6) AS value_interp
    FROM prevq p JOIN nextq n USING (user_id, tick)
    """,
)
def events_interpolate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation / gap-fill
    (operators/windows.interpolate_at): every user's irregular event
    series resampled onto a 48-tick hourly grid — interpolated between
    bracketing samples, nearest-value-held past the ends, NULL for
    keys with no samples, duplicate-timestamp ties collapsed by
    MAX(value) so bracketing is engine-exact. Spark side is the
    union-and-window classic (both brackets from ONE window over one
    hash shuffle — no per-tick probes); the oracle brackets each tick
    independently with arg_max/arg_min lateral aggregates — same
    fixpoint, structurally different plan. NOTE the oracle's tick-on-
    sample case: Spark's '<= tick' prev bracket makes frac = 0, the
    oracle's prev also uses '<=' — both return the sample itself."""
    from erigon_extract_spark.operators.windows import interpolate_at

    events = _load(spark, sf_dir, "events")
    # grid = distinct users x 48 hourly ticks, built join-free: the tick
    # list is a 48-element literal sequence exploded per user (zero
    # shuffle, no BNLJ — the plan-quality CI forbids nested-loop grids)
    grid = events.select("user_id").distinct().select(
        "user_id",
        F.explode(
            F.expr(
                "sequence(TIMESTAMP '2024-01-01 00:00:00',"
                " TIMESTAMP '2024-01-02 23:00:00', INTERVAL 1 HOUR)"
            )
        ).alias("tick"),
    )
    return interpolate_at(events, grid)


@query(
    "embedding_pca_invariants",
    """
    WITH ux AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS v
      FROM embeddings
    ),
    m AS (SELECT i, avg(v) AS mu, var_pop(v) AS vp FROM ux GROUP BY i),
    tv AS (SELECT round(sum(vp), 6) AS total_var FROM m)
    SELECT ux.vec_id,
           round(sum((ux.v - m.mu) * (ux.v - m.mu)), 6) AS centered_norm_sq,
           tv.total_var AS total_var,
           TRUE AS norm_preserved,
           TRUE AS trace_matches_eigsum,
           TRUE AS top1_ge_axis_var
    FROM ux JOIN m USING (i) CROSS JOIN tv
    GROUP BY ux.vec_id, tv.total_var
    """,
)
def embedding_pca_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA (operators/similarity.pca_fit_project) gated by
    ROTATION INVARIANTS the oracle can verify without a linear-algebra
    library. Float-parity discipline: the cross-engine VALUE columns
    (centered_norm_sq, total_var) are computed by the SAME direct
    formula on both sides (sum of squared centered values / trace of the
    covariance), where the engines differ only by summation order
    (~1e-14) — while the mathematically-equal-but-float-different
    identities ride as TOLERANCE BOOLEANS computed Spark-side:
    (1) norm_preserved — per row, |sum proj_i^2 - sum (v-mu)^2| < 1e-9
    (orthonormal rotations preserve norms: catches centering,
    normalization, eigenvector scaling, and projection bugs);
    (2) trace_matches_eigsum — |sum eigvals - sum cov_diag| < 1e-9;
    (3) top1_ge_axis_var — the Rayleigh bound (catches eigenvalue-order
    mistakes). Hash-gating identity (1) at a fixed rounding grid would
    flip intermittently (~1e-13 identity error vs a 0.5e-6 boundary);
    as a tolerance boolean it is strict AND stable. The fit runs at
    plan-build time (one covariance pass + driver eigh of 64x64)."""
    from erigon_extract_spark.operators.similarity import pca_fit_project

    emb = _load(spark, sf_dir, "embeddings")
    projected, eigvals, mean, cov_diag = pca_fit_project(emb, dim=64)
    total_var = round(sum(cov_diag), 6)
    trace_ok = bool(abs(sum(eigvals) - sum(cov_diag)) < 1e-9)
    top1_ok = bool(eigvals[0] >= max(cov_diag) - 1e-9)
    proj_sq = F.aggregate(
        F.col("proj"), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x
    )
    mu_sql = "array(" + ",".join(f"{float(x)!r}D" for x in mean) + ")"
    direct_sq = F.aggregate(
        F.zip_with(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.expr(mu_sql),
            lambda a, b: a - b,
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x * x,
    )
    base = emb.join(projected, "vec_id")
    return base.select(
        "vec_id",
        F.round(direct_sq, 6).alias("centered_norm_sq"),
        F.lit(total_var).alias("total_var"),
        (F.abs(proj_sq - direct_sq) < 1e-9).alias("norm_preserved"),
        F.lit(trace_ok).alias("trace_matches_eigsum"),
        F.lit(top1_ok).alias("top1_ge_axis_var"),
    )


@query(
    "events_ohlc_hourly",
    """
    WITH e AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, hour,
           round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS sum_value
    FROM e GROUP BY user_id, hour
    """,
)
def events_ohlc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: per (user, hour) OHLC bars —
    the continuous-aggregate downsample every time-series store ships.
    ONE hash aggregation, no window: open/close are min/max over
    (ts, event_id, value) STRUCTS (lexicographic struct ordering = "value
    at the earliest/latest row", ties broken by event_id so the result is
    partitioning-independent), high/low/count/sum are plain partial-agg
    combinators. The oracle reaches the same rows via row_number windows
    — structurally different plan, same fixpoint. Bucketing uses
    date_trunc on the WALL-CLOCK timestamp (TZ-sweep-stable: the ntz →
    timestamp cast preserves wall time, and DuckDB truncates the same
    naive value); sum rides the _dsum decimal pattern so accumulation
    order can't flip the 6 dp round."""
    e = _load(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("__o"),
            F.max(F.struct("ts", "event_id", "value")).alias("__c"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.count("*").alias("n_events"),
            F.round(_dsum(F.col("value")), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            "hour",
            F.round(F.col("__o.value"), 6).alias("open"),
            "high",
            "low",
            F.round(F.col("__c.value"), 6).alias("close"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "agg_quantile_bounds",
    """
    WITH a AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS eq
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           unnest([0.25, 0.5, 0.75, 0.95])::DOUBLE AS q,
           round(unnest(eq), 4) AS exact_q,
           TRUE AS approx_within_bound
    FROM a
    """,
)
def quantile_bounds_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch with its rank-error bound riding through the hash
    (the agg_approx_distinct pattern for ORDER statistics): per return
    flag, the exact interpolated quantile is value-gated at 4 dp, and the
    KLL/GK sketch's guarantee — the approx value's rank is within eps*N
    of q*N for eps = 1/accuracy — is CHECKED, not trusted: the approx
    values join back against the table and c_le = count(x <= approx) /
    c_lt = count(x < approx) must straddle the [q-eps, q+eps] rank band.
    At 100 TB the sketch arm is the plan (mergeable, one pass, constant
    state); the exact arm is the small-scale verifier. One extra shuffle:
    lineitem x 12 broadcast (flag, q) rows -> conditional counts."""
    qs = [0.25, 0.5, 0.75, 0.95]
    eps = 0.01  # = 1/accuracy below
    qs_sql = ", ".join(str(x) for x in qs)
    li = _load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            f"percentile(l_extendedprice, array({qs_sql}))"
        ).alias("__ex"),
        F.percentile_approx("l_extendedprice", qs, 100).alias("__ap"),
        F.count("*").alias("__n"),
    )
    per_q = agg.select(
        "l_returnflag",
        "__n",
        F.posexplode(F.arrays_zip("__ex", "__ap")).alias("__i", "__z"),
    ).select(
        "l_returnflag",
        "__n",
        F.element_at(F.array(*[F.lit(x) for x in qs]), F.col("__i") + 1)
        .alias("q"),
        F.col("__z.__ex").alias("__exact"),
        F.col("__z.__ap").alias("__approx"),
    )
    ranks = (
        li.join(F.broadcast(per_q), "l_returnflag")
        .groupBy("l_returnflag", "q", "__exact", "__approx", "__n")
        .agg(
            F.sum(
                (F.col("l_extendedprice") <= F.col("__approx")).cast("long")
            ).alias("__c_le"),
            F.sum(
                (F.col("l_extendedprice") < F.col("__approx")).cast("long")
            ).alias("__c_lt"),
        )
    )
    within = (
        F.col("__c_le") >= (F.col("q") - eps) * F.col("__n") - 1
    ) & (F.col("__c_lt") <= (F.col("q") + eps) * F.col("__n") + 1)
    return ranks.select(
        "l_returnflag",
        "q",
        F.round("__exact", 4).alias("exact_q"),
        within.alias("approx_within_bound"),
    )


@query(
    "events_asof_nearest",
    """
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    cand AS (
      SELECT p.user_id, p.purchase_id, p.ts, c.click_id, c.click_ts,
             abs(epoch_us(c.click_ts) - epoch_us(p.ts)) * 2
             + CASE WHEN c.click_ts <= p.ts THEN 0 ELSE 1 END AS k,
             abs(epoch_us(c.click_ts) - epoch_us(p.ts)) AS ad
      FROM p LEFT JOIN c ON p.user_id = c.user_id
         AND abs(epoch_us(c.click_ts) - epoch_us(p.ts)) <= 86400000000
    )
    SELECT user_id, purchase_id, ts,
           arg_min(click_id, k) AS click_id,
           arg_min(click_ts, k) AS click_ts,
           min(ad) AS nearest_delta_us
    FROM cand GROUP BY 1, 2, 3
    """,
)
def events_asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of join (operators/asof.as_of_join_nearest; pandas
    merge_asof direction='nearest' + tolerance): every purchase matched to
    the user's temporally CLOSEST click within 24 h, equidistant ties to
    the earlier click. Spark side is the single-shuffle union-and-window
    merge (both brackets out of ONE sort — O(|L|+|R|) per key, no pair
    blowup); the oracle materializes every in-tolerance pair and arg_mins
    a composite (2*|delta| + after-flag) key — quadratic-shaped but
    bounded, the structurally-different verifier. Delta is an exact
    integer microsecond count, so the TZ sweep cancels (both sides shift
    with the session zone) and no float parity is in play. (user_id, ts)
    is unique in events, so bracket choice is deterministic without a
    pre-collapse."""
    from erigon_extract_spark.operators.asof import as_of_join_nearest

    e = _load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return as_of_join_nearest(
        p, c, on=["user_id"], left_time="ts", right_time="click_ts",
        tolerance_us=86_400_000_000,
    )


@query(
    "dedup_unicode_fold",
    """
    WITH base AS (SELECT doc_id, text FROM documents),
    v AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT doc_id + 100000000, replace(text, 'e', 'é') FROM base
      UNION ALL
      SELECT doc_id + 200000000,
             upper(replace(text, 'e', 'e' || chr(769))) FROM base
    ),
    f AS (
      SELECT doc_id,
             lower(strip_accents(nfc_normalize(text))) AS folded
      FROM v
    ),
    g AS (
      SELECT folded, min(doc_id) AS rep_id,
             CAST(count(*) AS BIGINT) AS group_size
      FROM f GROUP BY folded
    )
    SELECT f.doc_id, g.rep_id, g.group_size
    FROM f JOIN g USING (folded)
    """,
)
def dedup_unicode_fold_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-normalization dedup (operators/text.unicode_fold_dedup):
    byte-different, reader-identical strings fingerprint together. The
    fixture decorates every ASCII document with two deterministic
    variants — 'e' -> precomposed U+00E9, and 'e' -> decomposed
    e + U+0301 combining acute, uppercased — and the fold (NFD, strip
    Mn marks, NFC, lower) must reunite each trio under the original
    doc_id (group_size = 3 for every doc containing an 'e'). Two
    INDEPENDENT Unicode implementations agree on the fixpoint: Python
    unicodedata on the Spark side, DuckDB's ICU strip_accents +
    nfc_normalize on the oracle side — the parity IS the test that the
    fold implements the standard, not a house dialect. One fingerprint
    shuffle, exact_dedup's scale shape."""
    from erigon_extract_spark.operators.text import unicode_fold_dedup

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = docs.select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"),
        F.regexp_replace("text", "e", "é").alias("text"),
    )
    v2 = docs.select(
        (F.col("doc_id") + 200_000_000).alias("doc_id"),
        F.upper(F.regexp_replace("text", "e", "e\u0301")).alias("text"),
    )
    return unicode_fold_dedup(docs.unionByName(v1).unionByName(v2))


@query(
    "corpus_pps_sample",
    """
    WITH c AS (
      SELECT doc_id, n_chars,
             sum(n_chars) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS ci
      FROM documents
    )
    SELECT doc_id, n_chars, CAST(ci - n_chars AS BIGINT) AS cum_excl
    FROM c
    WHERE floor((ci - 1) / 4096.0) > floor((ci - n_chars - 1) / 4096.0)
    """,
)
def corpus_pps_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS systematic sampling (operators/windows.pps_systematic_sample):
    deterministic weighted corpus subsampling — every document's char
    count laid end to end, one grid point per 4096 chars, keep the
    interval owners. Selection probability = n_chars/4096 with exact
    spacing, no RNG, no float sort keys: the integer cumsum makes the
    sample bit-stable across engines, partitionings, and appends. The
    Spark side runs the TWO-PHASE distributed scan (bucket-local window
    cumsums + one tiny window over bucket totals — no single-partition
    pass over rows); the oracle is the naive single-window cumsum, the
    structurally-different verifier."""
    from erigon_extract_spark.operators.windows import pps_systematic_sample

    docs = _load(spark, sf_dir, "documents")
    return pps_systematic_sample(
        docs, order_col="doc_id", weight_col="n_chars", stride=4096
    )


@query(
    "agg_cms_join_size",
    """
    SELECT CAST(count(*) AS BIGINT) AS exact_join_size,
           TRUE AS est_ge_exact,
           TRUE AS est_le_bound
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def cms_join_size_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join-cardinality estimation (operators/sketch.
    cms_join_size) — the optimizer-statistics use case: estimate
    |lineitem ⋈ orders| on the order key from two 4x1024-cell count-min
    sketches WITHOUT executing the join, then verify the estimator's
    contract against the exact size: est >= exact ALWAYS (collisions
    only add), and est <= exact + 3 * depth-row expected slack
    (3*|A|*|B|/width) — both booleans ride the hash per the
    agg_approx_distinct pattern, the exact size is value-gated. At
    100 TB the sketches are the only thing that scans; the estimation
    itself is a kilobyte cell join. The exact arm here is the verifier
    the sketch replaces."""
    from erigon_extract_spark.operators.sketch import cms_build, cms_join_size

    width = 1024
    li = _load(spark, sf_dir, "lineitem").select("l_orderkey")
    od = _load(spark, sf_dir, "orders").select("o_orderkey")
    sa = cms_build(li, "l_orderkey", depth=4, width=width)
    sb = cms_build(od, "o_orderkey", depth=4, width=width)
    est = cms_join_size(sa, sb, depth=4)
    exact = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .agg(F.count("*").alias("exact_join_size"))
    )
    # |A| and |B| come from the sketches themselves (row 0's cell counts
    # sum to N) — everything stays lazy, no plan-build actions
    na = sa.filter(F.col("i") == 0).agg(F.sum("cnt").alias("na"))
    nb = sb.filter(F.col("i") == 0).agg(F.sum("cnt").alias("nb"))
    slack = 3.0 * F.col("na") * F.col("nb") / width
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "exact_join_size",
            (F.col("est_join_size") >= F.col("exact_join_size")).alias(
                "est_ge_exact"
            ),
            (
                F.col("est_join_size")
                <= F.col("exact_join_size") + slack
            ).alias("est_le_bound"),
        )
    )


# --- raw-web HTML -> text extraction (r6 verdict directive #5) ------------

# The synthetic corpus is clean text, so both engines wrap every document
# in the SAME deterministic HTML page before extracting — title/style in
# <head>, a <script>, a comment, a pure-link nav <div> (link-density
# boilerplate), a mixed text+link paragraph (density pass), an
# entity-encoded paragraph (decode active), and a one-word <li> (min-words
# drop) — so every branch of the extractor is demonstrably exercised
# under the hash gate (the _PII_SYNTH_SQL pattern).


def _synth_html_df(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "), d,
            F.lit("</title><style>p {color: red}</style></head><body>"
                  "<script>var n = "), d,
            F.lit(";</script><h1>Section heading "), d,
            F.lit("</h1><p>"), F.coalesce(F.col("text"), F.lit("")),
            F.lit("</p><!-- crawler note "), d,
            F.lit(' --><div class="nav"><a href="/home">Home</a> '
                  '<a href="/about">About</a> <a href="/c">Contact</a>'
                  '</div><p>Read the full <a href="/d">details page</a>'
                  " now "), d,
            F.lit("</p><p>See &lt;terms&gt; &amp; conditions &#39;v"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("&#39;</p><ul><li>short</li></ul></body></html>"),
        ).alias("html"),
    )


_HTML_SYNTH_SQL = """
      SELECT doc_id,
             concat('<html><head><title>Doc ', CAST(doc_id AS VARCHAR),
                    '</title><style>p {color: red}</style></head><body>',
                    '<script>var n = ', CAST(doc_id AS VARCHAR),
                    ';</script><h1>Section heading ',
                    CAST(doc_id AS VARCHAR),
                    '</h1><p>', COALESCE(text, ''),
                    '</p><!-- crawler note ', CAST(doc_id AS VARCHAR),
                    ' --><div class="nav"><a href="/home">Home</a> ',
                    '<a href="/about">About</a> <a href="/c">Contact</a>',
                    '</div><p>Read the full <a href="/d">details page</a>',
                    ' now ', CAST(doc_id AS VARCHAR),
                    '</p><p>See &lt;terms&gt; &amp; conditions &#39;v',
                    CAST(doc_id % 7 AS VARCHAR),
                    '&#39;</p><ul><li>short</li></ul></body></html>')
               AS html
      FROM documents
"""


def _html_vis_sql(expr: str) -> str:
    """The SQL mirror of operators/html._visible_text — strip tags, decode
    entities in ENTITIES order ('&amp;' last), collapse whitespace, trim."""
    from erigon_extract_spark.operators.html import ENTITIES

    t = f"regexp_replace({expr}, '<[^>]*>', ' ', 'g')"
    for ent, ch in ENTITIES:
        t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    return f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"


def _html_extract_ctes() -> str:
    """Shared CTE chain: synth page -> strip invisible -> block-split ->
    per-block visible text + anchor length -> keep rule -> per-doc
    reassembly. Mirrors operators/html.html_extract_text stage for stage
    (RELATIONAL form here: UNNEST + GROUP BY instead of array HOFs, so the
    oracle is a structurally different implementation of the same spec)."""
    from erigon_extract_spark.operators.html import BLOCK_TAGS

    anchor = ("array_to_string(regexp_extract_all(raw, "
              r"'(?is)<a\b[^>]*>(.*?)</a\s*>', 1), ' ')")
    strip = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g'), "
        r"'(?is)<head\b[^>]*>.*?</head\s*>', ' ', 'g'), "
        r"'(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'), "
        r"'(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'), "
        f"'(?i)</?(?:{BLOCK_TAGS})" + r"\b[^>]*>', chr(10), 'g')"
    )
    return f"""
    synth AS ({_HTML_SYNTH_SQL}),
    cleaned AS (SELECT doc_id, {strip} AS c FROM synth),
    hblocks AS (
      SELECT doc_id, i AS pos, parts[i] AS raw
      FROM (SELECT doc_id, string_split(c, chr(10)) AS parts FROM cleaned),
           UNNEST(generate_series(1, len(parts))) AS u(i)
    ),
    vis AS (
      SELECT doc_id, pos, {_html_vis_sql('raw')} AS t,
             -- DuckDB's array_to_string([]) is NULL where Spark's
             -- array_join([]) is '' — pin the zero-anchor case to 0
             COALESCE(length({_html_vis_sql(anchor)}), 0) AS alen
      FROM hblocks
    ),
    nonempty AS (
      SELECT doc_id, pos, t,
             (len(string_split(t, ' ')) >= 3
              AND alen * 100 <= length(t) * 50) AS is_kept
      FROM vis WHERE t <> ''
    ),
    extracted AS (
      SELECT d.doc_id,
             COALESCE(a.text, '') AS text,
             CAST(COALESCE(a.n_blocks_total, 0) AS BIGINT) AS n_blocks_total,
             CAST(COALESCE(a.n_blocks_kept, 0) AS BIGINT) AS n_blocks_kept
      FROM documents d LEFT JOIN (
        SELECT doc_id,
               COALESCE(string_agg(CASE WHEN is_kept THEN t END, chr(10)
                                   ORDER BY pos), '') AS text,
               COUNT(*) AS n_blocks_total,
               SUM(CASE WHEN is_kept THEN 1 ELSE 0 END) AS n_blocks_kept
        FROM nonempty GROUP BY doc_id
      ) a USING (doc_id)
    )
"""


@query(
    "text_html_extract",
    f"""
    WITH {_html_extract_ctes()}
    SELECT doc_id, text, n_blocks_total, n_blocks_kept FROM extracted
    """,
)
def text_html_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> main-text extraction (operators/html.html_extract_text):
    the jusText/Readability-class heuristic — strip script/style/head/
    comments, segment on block tags, drop blocks that are >50% anchor
    text or under 3 words, reassemble. One zero-shuffle Catalyst
    projection (regexp chain + array HOFs, no UDF); the oracle rebuilds
    the same spec relationally (UNNEST + GROUP BY)."""
    from erigon_extract_spark.operators.html import html_extract_text

    docs = _load(spark, sf_dir, "documents")
    out = html_extract_text(_synth_html_df(docs))
    return out.select("doc_id", "text", "n_blocks_total", "n_blocks_kept")


@query(
    "corpus_pipeline_v3",
    f"""
    WITH {_html_extract_ctes()},
    tok AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               UNNEST(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '
               )) AS tok
        FROM extracted
      ) WHERE length(tok) > 0
    ),
    w AS (
      SELECT doc_id,
             (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024)
               * 2654435761 % 2001 - 1000 AS w
      FROM tok
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(w) AS weight_sum
      FROM w GROUP BY doc_id
    ),
    scored AS (
      SELECT a.doc_id, e.n_blocks_total, e.n_blocks_kept, a.n_tokens,
             ROUND(0.5 + (0.5 * (CAST(weight_sum AS DOUBLE)
                                 / CAST(n_tokens * 1000 AS DOUBLE)))
                         / (1.0 + abs(CAST(weight_sum AS DOUBLE)
                                      / CAST(n_tokens * 1000 AS DOUBLE))), 6)
               AS quality_score
      FROM agg a JOIN extracted e USING (doc_id)
    )
    SELECT doc_id, n_blocks_total, n_blocks_kept, n_tokens, quality_score
    FROM scored WHERE quality_score >= 0.5
    """,
)
def corpus_pipeline_v3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation chain STARTING FROM RAW HTML (what corpus_pipeline_v2
    assumed away): synthetic page -> html_extract_text -> model-based
    quality filter on the EXTRACTED text -> keep list with per-doc block
    stats. Witnesses that the extractor's output column contract feeds
    the existing text operators without adaptation — the pipeline a
    100 TB crawl actually runs (extract is a zero-shuffle map stage; the
    only shuffle is the classifier's per-doc aggregate)."""
    from erigon_extract_spark.operators.html import html_extract_text
    from erigon_extract_spark.operators.text import hashed_linear_quality

    docs = _load(spark, sf_dir, "documents")
    ext = html_extract_text(_synth_html_df(docs))
    scored = hashed_linear_quality(ext, text_col="text")
    return (
        scored.filter(F.col("keep"))
        .join(ext.select("doc_id", "n_blocks_total", "n_blocks_kept"),
              "doc_id")
        .select("doc_id", "n_blocks_total", "n_blocks_kept", "n_tokens",
                "quality_score")
    )


# --- URL canonicalization / link graph (crawl-frontier curation) ----------

# Two deterministic messy variants per document that must collapse to ONE
# canonical URL: uppercase scheme/host + default port + tracking param +
# fragment + trailing slash vs the already-clean spelling with its query
# params in a different order. Path case is deliberately preserved
# (paths are case-sensitive); both engines build the same strings.


def _synth_urls_df(docs: DataFrame) -> DataFrame:
    d = lambda m: (F.col("doc_id") % m).cast("string")  # noqa: E731
    v1 = docs.select(
        "doc_id",
        F.lit(1).alias("variant"),
        F.concat(
            F.lit("HTTP://Host"), d(50), F.lit(".Example.COM:80/Path"),
            d(20), F.lit("/?utm_source=feed&b="), d(5), F.lit("&a=1#frag"),
        ).alias("url"),
    )
    v2 = docs.select(
        "doc_id",
        F.lit(2).alias("variant"),
        F.concat(
            F.lit("http://host"), d(50), F.lit(".example.com/Path"),
            d(20), F.lit("?a=1&b="), d(5),
        ).alias("url"),
    )
    return v1.unionAll(v2)


_URL_SYNTH_SQL = """
      SELECT doc_id, 1 AS variant,
             'HTTP://Host' || CAST(doc_id % 50 AS VARCHAR)
               || '.Example.COM:80/Path' || CAST(doc_id % 20 AS VARCHAR)
               || '/?utm_source=feed&b=' || CAST(doc_id % 5 AS VARCHAR)
               || '&a=1#frag' AS url
      FROM documents
      UNION ALL
      SELECT doc_id, 2 AS variant,
             'http://host' || CAST(doc_id % 50 AS VARCHAR)
               || '.example.com/Path' || CAST(doc_id % 20 AS VARCHAR)
               || '?a=1&b=' || CAST(doc_id % 5 AS VARCHAR) AS url
      FROM documents
"""

# the SQL mirror of operators/urls.canonicalize_url, stage for stage
_URL_CANON_CTES = (
    """
    u1 AS (
      SELECT doc_id, variant, url,
             lower(regexp_extract(url,
               '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS res
      FROM urls
    ),
    u2 AS (
      SELECT *,
             CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
                    THEN substr(hostport, 1, length(hostport) - 3)
                  WHEN scheme = 'https' AND hostport LIKE '%:443'
                    THEN substr(hostport, 1, length(hostport) - 4)
                  ELSE hostport END AS host,
             regexp_replace(regexp_extract(res, '^([^?]*)', 1),
                            '/+$', '') AS path0,
             list_sort(list_filter(
               string_split(regexp_extract(res, '\\?(.*)$', 1), '&'),
               p -> p <> '' AND NOT regexp_matches(p,
                 '^(utm_[^=]*|fbclid|gclid)(=.*)?$'))) AS params
      FROM u1
    ),
    canon AS (
      SELECT doc_id, variant,
             CASE WHEN scheme = '' THEN '' ELSE
               scheme || '://' || host
                 || CASE WHEN path0 = '' THEN '/' ELSE path0 END
                 || CASE WHEN len(params) > 0
                      THEN '?' || array_to_string(params, '&')
                      ELSE '' END
             END AS canonical_url
      FROM u2
    )
"""
)


@query(
    "curation_url_canonical",
    f"""
    WITH urls AS ({_URL_SYNTH_SQL}),
    {_URL_CANON_CTES}
    SELECT doc_id, variant, canonical_url FROM canon
    """,
)
def curation_url_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3986-style URL canonicalization (operators/urls.
    canonicalize_url): lowercase scheme/host, strip default port,
    fragment, and tracking params (utm_*/fbclid/gclid), sort the
    surviving query params, strip trailing path slashes. One zero-shuffle
    Catalyst projection (regexp_extract splits + one array sort/filter
    HOF); value-gated per (doc, variant) so every normalization rule is
    under the hash."""
    from erigon_extract_spark.operators.urls import canonicalize_url

    docs = _load(spark, sf_dir, "documents")
    urls = _synth_urls_df(docs)
    return urls.select(
        "doc_id", "variant",
        canonicalize_url(F.col("url")).alias("canonical_url"),
    )


@query(
    "dedup_url",
    f"""
    WITH urls AS ({_URL_SYNTH_SQL}),
    {_URL_CANON_CTES}
    SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_urls,
           MIN(doc_id) AS keep_doc
    FROM canon GROUP BY canonical_url
    """,
)
def dedup_url_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup — collapse crawl-frontier spellings BEFORE any
    fetch/extract cost: canonicalize, then one hash-aggregate on the
    canonical string (exact_dedup's shape: a single fingerprint-key
    shuffle, map-side combined; at 100 TB the frontier is the cheapest
    place a web corpus ever gets deduped). Keeper = smallest doc_id,
    deterministic."""
    from erigon_extract_spark.operators.urls import canonicalize_url

    docs = _load(spark, sf_dir, "documents")
    urls = _synth_urls_df(docs)
    return (
        urls.select(canonicalize_url(F.col("url")).alias("canonical_url"),
                    "doc_id")
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_urls"), F.min("doc_id").alias("keep_doc"))
    )


# Link pages: every doc is a page on host (doc_id % 200) linking to the
# two affine peers 7h+3 and 13h+5 (mod 200) — both maps invertible mod
# 200, so the extracted host graph has no dangling nodes (the
# graph_pagerank fixture, but REACHED THROUGH html+url extraction) —
# plus a relative link and a mailto: (host-less rows the graph drops).


def _synth_linkpages_df(docs: DataFrame) -> DataFrame:
    h = F.col("doc_id") % 200
    hs = h.cast("string")
    d = F.col("doc_id").cast("string")
    p1 = ((h * 7 + 3) % 200).cast("string")
    p2 = ((h * 13 + 5) % 200).cast("string")
    return docs.select(
        "doc_id",
        F.concat(F.lit("http://host"), hs, F.lit(".example.com/p"), d)
          .alias("url"),
        F.concat(
            F.lit("<html><body><p>Index page for host"), hs, F.lit("</p>"),
            F.lit('<a href="http://host'), p1,
            F.lit(".example.com/p"), d, F.lit('">peer one</a>'),
            F.lit('<a href="https://host'), p2,
            F.lit(".example.com/q?id="), d,
            F.lit('&amp;utm_source=x">peer two</a>'),
            F.lit('<a href="/local/'), d, F.lit('">self</a>'),
            F.lit('<a href="mailto:admin@host'), hs,
            F.lit('.example.com">mail</a></body></html>'),
        ).alias("html"),
    )


_LINKPAGES_SQL = """
      SELECT doc_id,
             'http://host' || CAST(doc_id % 200 AS VARCHAR)
               || '.example.com/p' || CAST(doc_id AS VARCHAR) AS url,
             '<html><body><p>Index page for host'
               || CAST(doc_id % 200 AS VARCHAR) || '</p>'
               || '<a href="http://host'
               || CAST(((doc_id % 200) * 7 + 3) % 200 AS VARCHAR)
               || '.example.com/p' || CAST(doc_id AS VARCHAR)
               || '">peer one</a>'
               || '<a href="https://host'
               || CAST(((doc_id % 200) * 13 + 5) % 200 AS VARCHAR)
               || '.example.com/q?id=' || CAST(doc_id AS VARCHAR)
               || '&amp;utm_source=x">peer two</a>'
               || '<a href="/local/' || CAST(doc_id AS VARCHAR)
               || '">self</a>'
               || '<a href="mailto:admin@host'
               || CAST(doc_id % 200 AS VARCHAR)
               || '.example.com">mail</a></body></html>' AS html
      FROM documents
"""

# mirrors operators/urls.url_host: authority -> lowercase -> strip
# userinfo (greedy up-to-last-'@') -> strip port
_HOST_OF = (
    "regexp_extract(lower(regexp_extract({col}, "
    "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^(?:.*@)?([^:]*)', 1)"
)

# conformant HTML escapes '&' in attribute values as '&amp;': the
# extractor entity-decodes the href (operators/html.extract_links), so
# the oracle applies the same minimal replace chain, '&amp;' last
_LINKS_SQL = r"""
    rawlinks AS (
      SELECT doc_id, url,
             UNNEST(regexp_extract_all(html,
               '(?is)<a\b[^>]*\bhref\s*=\s*"([^"]*)"', 1)) AS rawhref
      FROM pages
    ),
    links AS (
      SELECT doc_id, url,
             replace(replace(replace(replace(replace(replace(rawhref,
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
               '&nbsp;', ' '), '&amp;', '&') AS href
      FROM rawlinks
    )
"""


@query(
    "text_html_links",
    f"""
    WITH pages AS ({_LINKPAGES_SQL}),
    {_LINKS_SQL}
    SELECT doc_id, href, {_HOST_OF.format(col='href')} AS host
    FROM links
    """,
)
def text_html_links_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link extraction (operators/html.extract_links + operators/urls.
    url_host): one row per href in document order, with the lowercased
    port-less host ('' for relative and mailto: links — the rows a web
    graph drops). Zero-shuffle regexp_extract_all explode."""
    from erigon_extract_spark.operators.html import extract_links
    from erigon_extract_spark.operators.urls import url_host

    docs = _load(spark, sf_dir, "documents")
    pages = _synth_linkpages_df(docs)
    links = extract_links(pages)
    return links.select(
        "doc_id", "href", url_host(F.col("href")).alias("host")
    )


def _pagerank_unrolled_sql(n_iter: int) -> str:
    """pr0..pr{n}: each iteration is nodes LEFT JOIN the contribution
    aggregate — the exact shape of the operator's loop, so zero-in-degree
    nodes keep their base rank instead of silently vanishing (the
    recursive-CTE formulation only re-emitted GROUP BY e.v nodes, which
    happened to cover every host on the full fixture but dropped
    source-only hosts on small/skewed inputs — review finding). Unrolled
    rather than recursive, which also sidesteps DuckDB giving bare UNION
    inside WITH RECURSIVE UNION ALL semantics."""
    steps = ["pr0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank_fp"
             " FROM nodes)"]
    for k in range(n_iter):
        steps.append(f"""
    pr{k + 1} AS (
      SELECT nd.node,
             CAST(150000000 + COALESCE(c.contrib, 0) AS BIGINT) AS rank_fp
      FROM nodes nd LEFT JOIN (
        SELECT e.v AS node,
               SUM((85 * p.rank_fp) // (100 * d.outdeg)) AS contrib
        FROM pr{k} p JOIN edges e ON e.u = p.node
                     JOIN deg d ON d.u = p.node
        GROUP BY e.v
      ) c ON nd.node = c.node
    )""")
    return ",\n    ".join(steps)


@query(
    "graph_pagerank_web",
    f"""
    WITH pages AS ({_LINKPAGES_SQL}),
    {_LINKS_SQL},
    edges AS (
      SELECT DISTINCT {_HOST_OF.format(col='url')} AS u,
             {_HOST_OF.format(col='href')} AS v
      FROM links
      WHERE {_HOST_OF.format(col='href')} <> ''
    ),
    deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY u),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      )
    ),
    {_pagerank_unrolled_sql(10)}
    SELECT node, rank_fp FROM pr10
    """,
)
def graph_pagerank_web_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The web-graph composition: synthetic pages -> extract_links ->
    url_host vertices -> DISTINCT host edges -> fixed-point integer
    PageRank (operators/graph.pagerank). Same affine two-map fixture as
    graph_pagerank, but the graph is RECOVERED from HTML + URL parsing
    rather than synthesized as an edge list — witnessing the crawl
    pipeline end to end (extract and parse are zero-shuffle maps; edge
    distinct + per-iteration join/agg shuffle on host keys only)."""
    from erigon_extract_spark.operators.graph import pagerank
    from erigon_extract_spark.operators.html import extract_links
    from erigon_extract_spark.operators.urls import url_host

    docs = _load(spark, sf_dir, "documents")
    pages = _synth_linkpages_df(docs)
    links = extract_links(pages, keep_cols=("doc_id", "url"))
    edges = (
        links.select(
            url_host(F.col("url")).alias("u"),
            url_host(F.col("href")).alias("v"),
        )
        .filter(F.col("v") != "")
    )
    return pagerank(edges, src="u", dst="v", n_iter=10)


@query(
    "text_topk_ngrams",
    """
    WITH words AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w
      FROM documents
    ),
    bg AS (
      SELECT w[i] || ' ' || w[i + 1] AS bg
      FROM words, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2 AND length(w[i]) > 0
    ),
    cnt AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY bg)
    SELECT bg, cnt FROM cnt ORDER BY cnt DESC, bg ASC LIMIT 50
    """,
)
def text_topk_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics: the 50 most frequent word bigrams with a
    full deterministic tiebreak (count desc, bigram asc) — the corpus-
    report / contamination-screen primitive. Plan shape: explode -> one
    map-side-combined count agg -> TakeOrderedAndProject (per-partition
    partial top-k, only 50xP rows reach the driver-side merge — never a
    global sort of the n-gram table)."""
    docs = _load(spark, sf_dir, "documents")
    words = docs.select(
        F.split(tx.normalize_text(F.col("text")), " ").alias("w")
    ).filter(F.size("w") >= 2)
    bg = words.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> concat(w[i], ' ', w[i + 1]))"
            )
        ).alias("bg")
    ).filter(F.length("bg") > F.lit(1))
    return (
        bg.groupBy("bg")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bg"))
        .limit(50)
    )


@query(
    "curation_domain_stats",
    f"""
    WITH pages AS ({_LINKPAGES_SQL}),
    tok AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               UNNEST(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '
               )) AS tok
        FROM documents
      ) WHERE length(tok) > 0
    ),
    w AS (
      SELECT doc_id,
             (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024)
               * 2654435761 % 2001 - 1000 AS w
      FROM tok
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS weight_sum
      FROM w GROUP BY doc_id
    ),
    scored AS (
      SELECT doc_id, n_tokens, weight_sum,
             (ROUND(0.5 + (0.5 * (CAST(weight_sum AS DOUBLE)
                                  / CAST(n_tokens * 1000 AS DOUBLE)))
                          / (1.0 + abs(CAST(weight_sum AS DOUBLE)
                                       / CAST(n_tokens * 1000 AS DOUBLE))), 6)
              >= 0.5) AS keep
      FROM agg
    ),
    hosts AS (
      SELECT p.doc_id,
             {_HOST_OF.format(col='p.url')} AS host,
             s.n_tokens, s.weight_sum, s.keep
      FROM pages p JOIN scored s ON p.doc_id = s.doc_id
    ),
    dom AS (
      SELECT host,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
             CAST(SUM(weight_sum) AS BIGINT) AS weight_total
      FROM hosts GROUP BY host
    )
    SELECT host, n_docs, n_keep, tokens_total, weight_total,
           ROUND(0.5 + (0.5 * (CAST(weight_total AS DOUBLE)
                               / CAST(tokens_total * 1000 AS DOUBLE)))
                       / (1.0 + abs(CAST(weight_total AS DOUBLE)
                                    / CAST(tokens_total * 1000 AS DOUBLE))), 6)
             AS host_score
    FROM dom
    """,
)
def curation_domain_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation rollup — the per-host filtering stage of web
    pipelines (drop spam hosts wholesale, not doc by doc): page URL ->
    host vertex, per-doc classifier sums aggregated to EXACT integer
    host totals (weight/token sums are order-free BIGINTs; the one float
    squash happens once per host AFTER aggregation, so the host score is
    bit-stable at any parallelism — the hashed_linear_quality
    discipline lifted one level). One doc-key shuffle for the classifier
    plus one host-key agg."""
    from erigon_extract_spark.operators.text import hashed_linear_quality
    from erigon_extract_spark.operators.urls import url_host

    docs = _load(spark, sf_dir, "documents")
    pages = _synth_linkpages_df(docs).select(
        "doc_id", url_host(F.col("url")).alias("host")
    )
    scored = hashed_linear_quality(docs)
    dom = (
        pages.join(scored, "doc_id")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
            F.sum("weight_sum").cast("long").alias("weight_total"),
        )
    )
    raw = F.col("weight_total").cast("double") / (
        F.col("tokens_total") * F.lit(1000)
    ).cast("double")
    return dom.select(
        "host", "n_docs", "n_keep", "tokens_total", "weight_total",
        F.round(
            F.lit(0.5) + (F.lit(0.5) * raw) / (F.lit(1.0) + F.abs(raw)), 6
        ).alias("host_score"),
    )


def _robots_hosts_df(spark: SparkSession) -> DataFrame:
    """The shared robots fixture dimension: every host disallows
    /private, odd hosts also disallow /p (so page URLs flip allowed by
    host parity). Mirrored by the `hosts`/`rules` CTEs in the robots and
    frontier oracles."""
    return spark.range(200).select(
        F.concat(F.lit("host"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.when(F.col("id") % 2 == 1,
               F.array(F.lit("/private"), F.lit("/p")))
         .otherwise(F.array(F.lit("/private"))).alias("disallow"),
    )


@query(
    "curation_robots_filter",
    f"""
    WITH pages AS ({_LINKPAGES_SQL}),
    urls AS (
      SELECT doc_id, url FROM pages
      UNION ALL
      SELECT doc_id,
             'http://host' || CAST(doc_id % 200 AS VARCHAR)
               || '.example.com/private/x' || CAST(doc_id AS VARCHAR)
      FROM documents
    ),
    hosts AS (SELECT range AS h FROM range(200)),
    rules AS (
      SELECT 'host' || CAST(h AS VARCHAR) || '.example.com' AS host,
             '/private' AS pfx
      FROM hosts
      UNION ALL
      SELECT 'host' || CAST(h AS VARCHAR) || '.example.com', '/p'
      FROM hosts WHERE h % 2 = 1
    ),
    flagged AS (
      SELECT u.doc_id, u.url,
             COALESCE(bool_or(
               starts_with(
                 regexp_extract(
                   regexp_extract(u.url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1),
                   '^([^?]*)', 1),
                 r.pfx)), FALSE) AS blocked
      FROM urls u
      LEFT JOIN rules r
        ON r.host = {_HOST_OF.format(col='u.url')}
      GROUP BY u.doc_id, u.url
    )
    SELECT doc_id, url, NOT blocked AS allowed FROM flagged
    """,
)
def curation_robots_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots politeness filter (operators/urls.robots_filter): each
    frontier URL flagged against its host's Disallow prefixes via a
    BROADCAST join of the per-host rule dimension + an exists HOF over
    the rule array — no extra shuffle at frontier scale. Fixture: every
    host disallows /private, odd hosts also disallow /p (so the page
    URLs themselves flip allowed by host parity); the oracle rebuilds
    the rule table relationally and aggregates prefix hits with
    bool_or."""
    from erigon_extract_spark.operators.urls import robots_filter

    docs = _load(spark, sf_dir, "documents")
    pages = _synth_linkpages_df(docs).select("doc_id", "url")
    private = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://host"), (F.col("doc_id") % 200).cast("string"),
            F.lit(".example.com/private/x"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    urls = pages.unionAll(private)
    out = robots_filter(urls, _robots_hosts_df(spark))
    return out.select("doc_id", "url", "allowed")


@query(
    "corpus_frontier_keep",
    f"""
    WITH raw_urls AS (
      SELECT doc_id, 1 AS variant,
             'http://host' || CAST(doc_id % 200 AS VARCHAR)
               || '.example.com/p' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
      UNION ALL
      SELECT doc_id, 2 AS variant,
             'HTTP://Host' || CAST(doc_id % 200 AS VARCHAR)
               || '.Example.COM:80/p' || CAST(doc_id AS VARCHAR)
               || '?utm_source=feed#x'
      FROM documents
      UNION ALL
      SELECT doc_id, 3 AS variant,
             'http://host' || CAST(doc_id % 200 AS VARCHAR)
               || '.example.com/private/x' || CAST(doc_id AS VARCHAR)
      FROM documents
    ),
    hosts AS (SELECT range AS h FROM range(200)),
    rules AS (
      SELECT 'host' || CAST(h AS VARCHAR) || '.example.com' AS host,
             '/private' AS pfx
      FROM hosts
      UNION ALL
      SELECT 'host' || CAST(h AS VARCHAR) || '.example.com', '/p'
      FROM hosts WHERE h % 2 = 1
    ),
    blocked AS (
      SELECT u.doc_id, u.variant, u.url,
             COALESCE(bool_or(
               starts_with(
                 regexp_extract(
                   regexp_extract(u.url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1),
                   '^([^?]*)', 1),
                 r.pfx)), FALSE) AS is_blocked
      FROM raw_urls u
      LEFT JOIN rules r
        ON r.host = {_HOST_OF.format(col='u.url')}
      GROUP BY u.doc_id, u.variant, u.url
    ),
    urls AS (
      SELECT doc_id, variant, url FROM blocked WHERE NOT is_blocked
    ),
    {_URL_CANON_CTES}
    SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_urls,
           MIN(doc_id) AS keep_doc
    FROM canon GROUP BY canonical_url
    """,
)
def corpus_frontier_keep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pre-fetch crawl frontier under ONE hash (the
    corpus_pipeline composition pattern): three spellings per document
    (clean page, messy duplicate with uppercase host + default port +
    tracking param + fragment, and a robots-disallowed /private URL) ->
    robots filter on the ORIGINAL spelling -> canonicalize survivors ->
    frontier dedup. Expected shape: even-host docs survive with exactly
    n_urls=2 spellings collapsing to one canonical; odd hosts (which
    also disallow /p) contribute nothing. Plan: broadcast rule join +
    projection + one hash-agg — the same stage budget as dedup_url."""
    from erigon_extract_spark.operators.urls import (
        canonicalize_url,
        robots_filter,
    )

    docs = _load(spark, sf_dir, "documents")
    h = (F.col("doc_id") % 200).cast("string")
    d = F.col("doc_id").cast("string")
    variants = [
        docs.select("doc_id", F.concat(
            F.lit("http://host"), h, F.lit(".example.com/p"), d
        ).alias("url")),
        docs.select("doc_id", F.concat(
            F.lit("HTTP://Host"), h, F.lit(".Example.COM:80/p"), d,
            F.lit("?utm_source=feed#x"),
        ).alias("url")),
        docs.select("doc_id", F.concat(
            F.lit("http://host"), h, F.lit(".example.com/private/x"), d
        ).alias("url")),
    ]
    urls = variants[0].unionAll(variants[1]).unionAll(variants[2])
    allowed = robots_filter(urls, _robots_hosts_df(spark)).filter(
        F.col("allowed")
    )
    return (
        allowed.select(
            canonicalize_url(F.col("url")).alias("canonical_url"), "doc_id"
        )
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_urls"), F.min("doc_id").alias("keep_doc"))
    )


@query(
    "text_sitemap_locs",
    """
    WITH sitemaps AS (
      SELECT doc_id,
             concat('<?xml version="1.0" encoding="UTF-8"?>',
                    '<urlset><url><loc>http://host',
                    CAST(doc_id % 200 AS VARCHAR), '.example.com/p',
                    CAST(doc_id AS VARCHAR), '</loc>',
                    '<lastmod>2024-01-0', CAST(doc_id % 9 + 1 AS VARCHAR),
                    '</lastmod></url><url><loc> http://host',
                    CAST(doc_id % 200 AS VARCHAR),
                    '.example.com/q?a=1&amp;b=',
                    CAST(doc_id % 5 AS VARCHAR),
                    ' </loc></url></urlset>') AS xml
      FROM documents
    ),
    locs AS (
      SELECT doc_id,
             trim(UNNEST(regexp_extract_all(xml,
               '(?is)<loc\\s*>\\s*(.*?)\\s*</loc\\s*>', 1))) AS raw
      FROM sitemaps
    )
    SELECT doc_id,
           replace(replace(replace(replace(replace(replace(raw,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
             '&nbsp;', ' '), '&amp;', '&') AS loc
    FROM locs
    """,
)
def text_sitemap_locs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap <loc> extraction (operators/html.extract_sitemap_locs) —
    the second crawl-discovery feed besides page links: two <loc>
    entries per synthetic sitemap (one clean, one whitespace-padded with
    the &amp; escaping the sitemaps.org protocol REQUIRES inside loc),
    entity-decoded, in document order. Zero-shuffle explode; the output
    column feeds canonicalize_url/robots_filter/dedup_url unchanged."""
    from erigon_extract_spark.operators.html import extract_sitemap_locs

    docs = _load(spark, sf_dir, "documents")
    h = (F.col("doc_id") % 200).cast("string")
    d = F.col("doc_id").cast("string")
    sitemaps = docs.select(
        "doc_id",
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                  "<urlset><url><loc>http://host"), h,
            F.lit(".example.com/p"), d, F.lit("</loc><lastmod>2024-01-0"),
            (F.col("doc_id") % 9 + 1).cast("string"),
            F.lit("</lastmod></url><url><loc> http://host"), h,
            F.lit(".example.com/q?a=1&amp;b="),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(" </loc></url></urlset>"),
        ).alias("xml"),
    )
    return extract_sitemap_locs(sitemaps)


# the SQL mirror of operators/html.decode_entities ('&amp;' last)
def _decode_ent_sql(col: str) -> str:
    return (
        "replace(replace(replace(replace(replace(replace(" + col + ", "
        "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), "
        "'&nbsp;', ' '), '&amp;', '&')"
    )


# --- sitemap-index recursion + RSS/Atom feeds (crawl discovery, r8) -------

# Sitemap corpus: every doc is a fetched <urlset> file smD.xml with two
# page locs (one carrying the protocol-required &amp; escaping); every
# 20th doc ALSO contributes an index file idxD.xml listing the child
# sitemaps smD.xml and sm(D+1).xml — the (D+1) child is missing from the
# corpus when D+1 >= n_docs, exercising the unresolved-reference path in
# both engines identically (the join drops it).


def _synth_sitemap_corpus_df(docs: DataFrame) -> DataFrame:
    h = (F.col("doc_id") % 200).cast("string")
    d = F.col("doc_id").cast("string")
    base = F.concat(F.lit("http://host"), h, F.lit(".example.com"))
    urlsets = docs.select(
        F.concat(base, F.lit("/sm"), d, F.lit(".xml")).alias("url"),
        F.concat(
            F.lit("<urlset><url><loc>"), base, F.lit("/p"), d,
            F.lit("</loc></url><url><loc>"), base,
            F.lit("/q?a=1&amp;b="), (F.col("doc_id") % 5).cast("string"),
            F.lit("</loc></url></urlset>"),
        ).alias("xml"),
    )
    idx = docs.filter(F.col("doc_id") % 20 == 0)
    h1 = ((F.col("doc_id") + 1) % 200).cast("string")
    d1 = (F.col("doc_id") + 1).cast("string")
    indexes = idx.select(
        F.concat(base, F.lit("/idx"), d, F.lit(".xml")).alias("url"),
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>"), base, F.lit("/sm"), d,
            F.lit(".xml</loc></sitemap><sitemap><loc>http://host"), h1,
            F.lit(".example.com/sm"), d1,
            F.lit(".xml</loc></sitemap></sitemapindex>"),
        ).alias("xml"),
    )
    return urlsets.unionByName(indexes)


_SITEMAP_CORPUS_SQL = """
      SELECT 'http://host' || CAST(doc_id % 200 AS VARCHAR)
               || '.example.com/sm' || CAST(doc_id AS VARCHAR)
               || '.xml' AS url,
             '<urlset><url><loc>http://host'
               || CAST(doc_id % 200 AS VARCHAR) || '.example.com/p'
               || CAST(doc_id AS VARCHAR)
               || '</loc></url><url><loc>http://host'
               || CAST(doc_id % 200 AS VARCHAR) || '.example.com/q?a=1&amp;b='
               || CAST(doc_id % 5 AS VARCHAR)
               || '</loc></url></urlset>' AS xml
      FROM documents
      UNION ALL
      SELECT 'http://host' || CAST(doc_id % 200 AS VARCHAR)
               || '.example.com/idx' || CAST(doc_id AS VARCHAR)
               || '.xml',
             '<sitemapindex><sitemap><loc>http://host'
               || CAST(doc_id % 200 AS VARCHAR) || '.example.com/sm'
               || CAST(doc_id AS VARCHAR)
               || '.xml</loc></sitemap><sitemap><loc>http://host'
               || CAST((doc_id + 1) % 200 AS VARCHAR) || '.example.com/sm'
               || CAST(doc_id + 1 AS VARCHAR)
               || '.xml</loc></sitemap></sitemapindex>'
      FROM documents WHERE doc_id % 20 = 0
"""


_SITEMAP_LOC_DECODED_SQL = _decode_ent_sql(
    "trim(UNNEST(regexp_extract_all(xml,"
    " '(?is)<loc\\s*>\\s*(.*?)\\s*</loc\\s*>', 1)))"
)


@query(
    "text_sitemap_index_resolve",
    f"""
    WITH smdocs AS ({_SITEMAP_CORPUS_SQL}),
    tagged AS (
      SELECT url, xml,
             regexp_matches(xml, '(?is)<sitemapindex[\\s>]') AS is_index
      FROM smdocs
    ),
    locs AS (
      SELECT url, is_index,
             {_SITEMAP_LOC_DECODED_SQL} AS loc
      FROM tagged
    ),
    pages0 AS (
      SELECT url AS root_url, loc, 0 AS depth
      FROM locs WHERE NOT is_index
    ),
    child_pages AS (
      SELECT c.url AS root_url, l.loc, 1 AS depth
      FROM locs c JOIN locs l ON l.url = c.loc AND NOT l.is_index
      WHERE c.is_index
    )
    SELECT root_url, loc, depth FROM pages0
    UNION ALL
    SELECT root_url, loc, depth FROM child_pages
    """,
)
def text_sitemap_index_resolve_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-level <sitemapindex> resolution over a fetched sitemap corpus
    (operators/html.resolve_sitemap_index): root-tag classification, page
    locs from urlsets at depth 0, child-loc -> corpus equi-join pulling
    pages from indexed child urlsets at depth 1, missing children
    dropped. The protocol forbids nested indexes, so depth 1 is the
    complete walk — no driver loop. Classification + extraction are
    zero-shuffle projections; the resolution join is the one exchange."""
    from erigon_extract_spark.operators.html import resolve_sitemap_index

    docs = _load(spark, sf_dir, "documents")
    corpus = _synth_sitemap_corpus_df(docs)
    return resolve_sitemap_index(corpus)


# Feed corpus: even docs publish RSS 2.0 (channel link + two item links,
# one whitespace-padded with conformant &amp; escaping), odd docs publish
# Atom (self link + two entry links, one with &amp; and one upper-cased
# tag) — both syndication dialects under one extractor.


def _synth_feeds_df(docs: DataFrame) -> DataFrame:
    h = (F.col("doc_id") % 200).cast("string")
    d = F.col("doc_id").cast("string")
    base = F.concat(F.lit("http://host"), h, F.lit(".example.com"))
    rss = F.concat(
        F.lit("<rss><channel><link>"), base,
        F.lit("/</link><item><title>t</title><link> "), base,
        F.lit("/r"), d, F.lit("?a=1&amp;b="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(" </link></item><item><link>"), base, F.lit("/s"), d,
        F.lit("</link></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed><link href="'), base,
        F.lit('/feed.xml" rel="self"/><entry><link href="'), base,
        F.lit("/e"), d, F.lit("?x=1&amp;y="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('"/></entry><entry><LINK HREF="'), base, F.lit("/f"), d,
        F.lit('"/></entry></feed>'),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom).alias("xml"),
    )


_FEEDS_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN
               '<rss><channel><link>http://host'
                 || CAST(doc_id % 200 AS VARCHAR)
                 || '.example.com/</link><item><title>t</title><link> http://host'
                 || CAST(doc_id % 200 AS VARCHAR) || '.example.com/r'
                 || CAST(doc_id AS VARCHAR) || '?a=1&amp;b='
                 || CAST(doc_id % 5 AS VARCHAR)
                 || ' </link></item><item><link>http://host'
                 || CAST(doc_id % 200 AS VARCHAR) || '.example.com/s'
                 || CAST(doc_id AS VARCHAR)
                 || '</link></item></channel></rss>'
             ELSE
               '<feed><link href="http://host'
                 || CAST(doc_id % 200 AS VARCHAR)
                 || '.example.com/feed.xml" rel="self"/><entry><link href="http://host'
                 || CAST(doc_id % 200 AS VARCHAR) || '.example.com/e'
                 || CAST(doc_id AS VARCHAR) || '?x=1&amp;y='
                 || CAST(doc_id % 7 AS VARCHAR)
                 || '"/></entry><entry><LINK HREF="http://host'
                 || CAST(doc_id % 200 AS VARCHAR) || '.example.com/f'
                 || CAST(doc_id AS VARCHAR) || '"/></entry></feed>'
             END AS xml
      FROM documents
"""

_FEED_LINKS_CTES = f"""
    rawfeed AS (
      SELECT doc_id,
             UNNEST(regexp_extract_all(xml,
               '(?is)<link\\s*>\\s*(.*?)\\s*</link\\s*>', 1)) AS raw
      FROM feeds
      UNION ALL
      SELECT doc_id,
             UNNEST(regexp_extract_all(xml,
               '(?is)<link\\b[^>]*\\bhref\\s*=\\s*"([^"]*)"', 1))
      FROM feeds
    ),
    feedlinks AS (
      SELECT doc_id, {_decode_ent_sql("raw")} AS link FROM rawfeed
    )
"""


@query(
    "text_feed_links",
    f"""
    WITH feeds AS ({_FEEDS_SQL}),
    {_FEED_LINKS_CTES}
    SELECT doc_id, link FROM feedlinks
    """,
)
def text_feed_links_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom link extraction (operators/html.extract_feed_links) —
    the third crawl-discovery feed: RSS text-content <link> elements and
    Atom <link href> attributes in one pass, entity-decoded and
    whitespace-trimmed. Zero-shuffle: two regexp_extract_all arrays
    concatenated and exploded in a single projection."""
    from erigon_extract_spark.operators.html import extract_feed_links

    docs = _load(spark, sf_dir, "documents")
    return extract_feed_links(_synth_feeds_df(docs))


@query(
    "corpus_feed_frontier",
    f"""
    WITH feeds AS ({_FEEDS_SQL}),
    {_FEED_LINKS_CTES},
    urls AS (SELECT doc_id, 0 AS variant, link AS url FROM feedlinks),
    {_URL_CANON_CTES}
    SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_urls,
           MIN(doc_id) AS keep_doc
    FROM canon GROUP BY canonical_url
    """,
)
def corpus_feed_frontier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feed-discovery frontier end to end: RSS/Atom corpus ->
    extract_feed_links -> canonicalize_url -> URL dedup (dedup_url's
    one-hash-exchange shape; keeper = smallest doc_id). Witnesses that
    the feed extractor's output column feeds the existing frontier chain
    unchanged — channel/self links shared by same-host feeds collapse to
    one frontier row here, exactly the pre-fetch dedup a crawl wants."""
    from erigon_extract_spark.operators.html import extract_feed_links
    from erigon_extract_spark.operators.urls import canonicalize_url

    docs = _load(spark, sf_dir, "documents")
    links = extract_feed_links(_synth_feeds_df(docs))
    return (
        links.select(
            canonicalize_url(F.col("link")).alias("canonical_url"),
            "doc_id",
        )
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_urls"), F.min("doc_id").alias("keep_doc"))
    )


# --- per-language corpus routing (multilingual curation, r8) --------------

# Per-language policy: thresholds straddle the classifier's 0.5 center
# so the keep decision genuinely flips BY LANGUAGE (en keeps more, de
# keeps less than a global 0.5 cut would); shard counts differ so the
# routing arithmetic is exercised per language. 'und' is deliberately
# absent — it exercises the default fallback path.
_LANG_POLICY = [
    ("en", 0.48, 4),
    ("de", 0.52, 2),
    ("fr", 0.50, 2),
    ("es", 0.50, 3),
]

_LANG_POLICY_SQL = ", ".join(
    f"('{lang}', {ms}, {ns})" for lang, ms, ns in _LANG_POLICY
)


@query(
    "corpus_route_by_language",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               string_split_regex(lower(text), '[^a-z0-9'']+'),
               x -> len(x) > 0) AS w
      FROM documents
    ),
    votes AS (
      SELECT doc_id,
        len(list_filter(w, t -> list_contains(
          ['the','and','of','to','in','is','that','it','for','was'], t))) AS en,
        len(list_filter(w, t -> list_contains(
          ['der','die','und','das','ist','nicht','ein','mit','auf','zu'], t))) AS de,
        len(list_filter(w, t -> list_contains(
          ['le','la','les','et','de','un','une','est','que','pour'], t))) AS fr,
        len(list_filter(w, t -> list_contains(
          ['el','la','los','de','que','y','en','un','una','es'], t))) AS es
      FROM toks
    ),
    langd AS (
      SELECT doc_id,
             CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                  WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                  WHEN de >= fr AND de >= es THEN 'de'
                  WHEN fr >= es THEN 'fr'
                  ELSE 'es' END AS lang_pred
      FROM votes
    ),
    ctok AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               UNNEST(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '
               )) AS tok
        FROM documents
      ) WHERE length(tok) > 0
    ),
    cw AS (
      SELECT doc_id,
             (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024)
               * 2654435761 % 2001 - 1000 AS w
      FROM ctok
    ),
    cagg AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS weight_sum
      FROM cw GROUP BY doc_id
    ),
    scored AS (
      SELECT doc_id,
             ROUND(0.5 + (0.5 * (CAST(weight_sum AS DOUBLE)
                                 / CAST(n_tokens * 1000 AS DOUBLE)))
                         / (1.0 + abs(CAST(weight_sum AS DOUBLE)
                                      / CAST(n_tokens * 1000 AS DOUBLE))), 6)
               AS quality_score
      FROM cagg
    ),
    policy (lang, min_score, n_shards) AS (VALUES {_LANG_POLICY_SQL})
    SELECT s.doc_id, l.lang_pred, s.quality_score,
           s.quality_score >= COALESCE(p.min_score, 0.55) AS keep,
           s.doc_id % COALESCE(p.n_shards, 1) AS shard
    FROM scored s
    JOIN langd l USING (doc_id)
    LEFT JOIN policy p ON p.lang = l.lang_pred
    """,
)
def corpus_route_by_language_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The multilingual pipeline stage (operators/curation.
    route_by_language): lang_id vote -> model-based quality score ->
    per-LANGUAGE keep threshold + shard assignment via a broadcast
    policy dimension, with a default fallback for languages absent from
    the policy ('und' here). The per-language cut is the standard fix
    for a global threshold over-dropping languages whose heuristic
    scores skew lower. Plan: lang projection is zero-shuffle, the
    classifier is one doc-key shuffle, the policy join is broadcast —
    the thin (doc, lang) join is the only extra exchange."""
    from erigon_extract_spark.operators import text as tx
    from erigon_extract_spark.operators.curation import route_by_language
    from erigon_extract_spark.operators.text import hashed_linear_quality

    docs = _load(spark, sf_dir, "documents")
    langd = docs.select(
        "doc_id", tx.lang_id(F.col("text")).alias("lang_pred")
    )
    scored = hashed_linear_quality(docs)
    policy = spark.createDataFrame(
        _LANG_POLICY, "lang string, min_score double, n_shards int"
    )
    routed = route_by_language(scored.join(langd, "doc_id"), policy)
    return routed.select(
        "doc_id", "lang_pred", "quality_score", "keep", "shard"
    )


@query(
    "stream_band_join_batch",
    """
    SELECT a.user_id AS user_id,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT a.event_id) AS n_events_with_neighbor
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts BETWEEN a.ts - INTERVAL 30 MINUTE AND a.ts + INTERVAL 30 MINUTE
     AND a.event_id <> b.event_id
    GROUP BY a.user_id
    """,
)
def stream_band_join_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING band-join builder itself (streaming/stream_join.
    stream_band_self_join), oracle-gated in batch mode — the
    stream_latest_state_batch pattern: withWatermark is a batch no-op
    and the watermarked two-sided-bound join degrades to a plain join,
    so the hash gate verifies the exact pair semantics the availableNow
    replay test executes across micro-batches. Keyed per USER (not per
    event_type) so each equi-join group stays small — the batch
    execution is join-linear here, while the production batch path for
    corpus-sized bands stays operators/rangejoin.band_self_join's
    bucketed rewrite. The streaming plan's 100 TB property is state
    eviction: each side buffers only band+delay of event time
    (StreamingSymmetricHashJoin), so state ∝ rate x window, never
    history."""
    from erigon_extract_spark.streaming.stream_join import (
        stream_band_self_join,
    )

    events = _events_raw(spark, sf_dir)
    pairs = stream_band_self_join(
        events, ["user_id"], "ts", band_seconds=1800, id_col="event_id"
    )
    return pairs.groupBy(F.col("a_user_id").alias("user_id")).agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct(F.col("a_event_id")).alias("n_events_with_neighbor"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (round 10)
# ---------------------------------------------------------------------------

_CDC_CHUNKS_CTE = """
    d AS (
      SELECT doc_id, source, text AS t, length(text) AS L
      FROM documents WHERE length(text) > 0
    ),
    pos AS (
      SELECT doc_id, i,
          CAST(ord(substr(t, CAST(i     AS INTEGER), 1)) % 251 AS BIGINT)
            * 662062621900811
        + CAST(ord(substr(t, CAST(i + 1 AS INTEGER), 1)) % 251 AS BIGINT)
            * 5053913144281
        + CAST(ord(substr(t, CAST(i + 2 AS INTEGER), 1)) % 251 AS BIGINT)
            * 38579489651
        + CAST(ord(substr(t, CAST(i + 3 AS INTEGER), 1)) % 251 AS BIGINT)
            * 294499921
        + CAST(ord(substr(t, CAST(i + 4 AS INTEGER), 1)) % 251 AS BIGINT)
            * 2248091
        + CAST(ord(substr(t, CAST(i + 5 AS INTEGER), 1)) % 251 AS BIGINT)
            * 17161
        + CAST(ord(substr(t, CAST(i + 6 AS INTEGER), 1)) % 251 AS BIGINT)
            * 131
        + CAST(ord(substr(t, CAST(i + 7 AS INTEGER), 1)) % 251 AS BIGINT)
            AS h
      FROM d, UNNEST(generate_series(1, L - 7)) AS u(i)
      WHERE L >= 8
    ),
    ends AS (
      SELECT doc_id, i + 7 AS e FROM pos WHERE h % 64 = 0
      UNION
      SELECT doc_id, CAST(L AS BIGINT) AS e FROM d
    ),
    bounds AS (
      SELECT doc_id, e,
             COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS pe,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY e) - 1
               AS chunk_idx
      FROM ends
    ),
    chunks AS (
      SELECT o.doc_id, o.chunk_idx, o.pe + 1 AS start, o.e - o.pe AS len,
             md5(substr(d.t, CAST(o.pe + 1 AS INTEGER),
                        CAST(o.e - o.pe AS INTEGER))) AS chunk_md5,
             d.source
      FROM bounds o JOIN d USING (doc_id)
    )
"""


@query(
    "dedup_cdc_chunks",
    f"""
    WITH {_CDC_CHUNKS_CTE}
    SELECT doc_id, chunk_idx, start, len, chunk_md5
    FROM chunks WHERE doc_id < 120
    """,
)
def dedup_cdc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/dedup.cdc_chunks): Rabin-style
    rolling-hash boundaries (w=8, base 131, boundary when H % 64 == 0,
    int64-exact polynomial over codepoint%251 values), so identical
    content regions chunk identically at ANY byte offset — the property
    that makes chunk-level dedup find shared boilerplate that document
    hashing misses. One Arrow-batched map-only pass, zero shuffle; the
    oracle rebuilds the exact boundary set relationally (positions x
    8-term polynomial, UNION final end, LAG over ordered boundaries).
    The full chunk table for the first 120 docs — every boundary
    position, length, and content md5 — is under the value hash."""
    from erigon_extract_spark.operators.dedup import cdc_chunks

    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return cdc_chunks(docs)


_CDC_CLAMPED_SQL = """
WITH RECURSIVE
    d AS (
      SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS L
      FROM documents WHERE length(text) > 0 AND doc_id < 120
    ),
    pos AS (
      SELECT doc_id, i,
          CAST(ord(substr(t, CAST(i     AS INTEGER), 1)) % 251 AS BIGINT)
            * 662062621900811
        + CAST(ord(substr(t, CAST(i + 1 AS INTEGER), 1)) % 251 AS BIGINT)
            * 5053913144281
        + CAST(ord(substr(t, CAST(i + 2 AS INTEGER), 1)) % 251 AS BIGINT)
            * 38579489651
        + CAST(ord(substr(t, CAST(i + 3 AS INTEGER), 1)) % 251 AS BIGINT)
            * 294499921
        + CAST(ord(substr(t, CAST(i + 4 AS INTEGER), 1)) % 251 AS BIGINT)
            * 2248091
        + CAST(ord(substr(t, CAST(i + 5 AS INTEGER), 1)) % 251 AS BIGINT)
            * 17161
        + CAST(ord(substr(t, CAST(i + 6 AS INTEGER), 1)) % 251 AS BIGINT)
            * 131
        + CAST(ord(substr(t, CAST(i + 7 AS INTEGER), 1)) % 251 AS BIGINT)
            AS h
      FROM d, UNNEST(generate_series(1, L - 7)) AS u(i)
      WHERE L >= 8
    ),
    cand AS (SELECT doc_id, i + 7 AS e FROM pos WHERE h % 64 = 0),
    -- the LBFS clamp walk is inherently sequential (each cut's
    -- eligibility window depends on the previous cut), so the oracle
    -- re-derives it as a per-document recursion over the SAME candidate
    -- set: first candidate with 32 <= e - pos AND e <= pos + 128, else
    -- a forced cut at pos + 128, else the end of the document.
    -- Recursion depth = chunks per document (bounded by ceil(L/32)),
    -- working set = one row per unfinished document.
    walk AS (
      SELECT doc_id, CAST(0 AS BIGINT) AS e, -1 AS chunk_idx, L FROM d
      UNION ALL
      SELECT w.doc_id,
             COALESCE(
               (SELECT MIN(c.e) FROM cand c
                WHERE c.doc_id = w.doc_id
                  AND c.e - w.e >= 32 AND c.e <= w.e + 128),
               CASE WHEN w.e + 128 < w.L THEN w.e + 128 ELSE w.L END),
             w.chunk_idx + 1, w.L
      FROM walk w WHERE w.e < w.L
    ),
    bounds AS (
      SELECT doc_id, e,
             COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0)
               AS pe,
             chunk_idx
      FROM walk WHERE chunk_idx >= 0
    )
SELECT b.doc_id, b.chunk_idx, b.pe + 1 AS start, b.e - b.pe AS len,
       md5(substr(d.t, CAST(b.pe + 1 AS INTEGER),
                  CAST(b.e - b.pe AS INTEGER))) AS chunk_md5
FROM bounds b JOIN d USING (doc_id)
"""


@query("dedup_cdc_chunks_clamped", _CDC_CLAMPED_SQL)
def dedup_cdc_chunks_clamped_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LBFS-clamped content-defined chunking
    (operators/dedup.cdc_chunks with min_size=32, max_size=128): the
    production form of CDC. The stateless textbook chunker
    (`dedup_cdc_chunks`) has an adversarial worst case — a document
    whose every window hashes to a boundary chunks per-character — so
    real chunk stores (LBFS, Muhlemann) clamp: take the first hash
    boundary at least min_size past the previous cut and at most
    max_size, forcing a cut at max_size when no boundary lands inside
    the window. Chunk count is bounded by ceil(L/min_size) and every
    chunk by max_size, while boundaries still resynchronize after
    insertions once the clamp windows realign
    (tests/test_clustering.py pins both properties). Same scale shape
    as the unclamped gate: ONE Arrow-batched map-only pass, zero
    shuffle; the sequential clamp walk lives entirely inside the
    per-document kernel. The oracle re-derives the walk as a
    per-document recursive CTE over the same candidate-boundary set."""
    from erigon_extract_spark.operators.dedup import cdc_chunks

    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return cdc_chunks(docs, min_size=32, max_size=128).select(
        "doc_id", "chunk_idx", "start", "len", "chunk_md5"
    )


@query(
    "dedup_cdc_savings",
    f"""
    WITH {_CDC_CHUNKS_CTE},
    per_chunk AS (
      SELECT source, chunk_md5, COUNT(*) AS n, MAX(len) AS len
      FROM chunks GROUP BY source, chunk_md5
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_chunks,
           COUNT(*) AS n_uniq,
           CAST(SUM(n * len) AS BIGINT) AS total_chars,
           CAST(SUM(len) AS BIGINT) AS uniq_chars,
           ROUND(CAST(SUM(len) AS DOUBLE) / CAST(SUM(n * len) AS DOUBLE), 6)
             AS dedup_ratio
    FROM per_chunk GROUP BY source
    """,
)
def dedup_cdc_savings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-store savings per source (operators/dedup.cdc_savings): CDC
    chunk the whole corpus, then report per source how many chunks, how
    many distinct, and the char-volume dedup ratio. Scale shape: the
    chunk TEXT never crosses the wire — one map-only chunking pass, one
    data-proportional shuffle of (source, md5, len) triples, then a
    5-row aggregate."""
    from erigon_extract_spark.operators.dedup import cdc_savings

    return cdc_savings(_load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Deterministic oracle-gated Lloyd k-means (round 10)
# ---------------------------------------------------------------------------

def _kmeans_oracle(
    k: int,
    iters: int,
    dim: int,
    final_select: str,
    train_where: str = "",
    assign_where: str = "",
) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs, sharing every
    quantization decision with operators/clustering.kmeans_lloyd:
    6-dp-rounded init/means, 9-dp-quantized squared-L2 argmin with
    smallest-cid ties, empty clusters keeping their centroid.
    ``train_where``/``assign_where`` (full "WHERE ..." fragments) split
    the training corpus from the final-assignment batch — the
    incremental train-once/assign-forever gate; both default to the
    whole table."""
    dist = (
        "round(list_sum(list_transform(generate_series(1, {dim}), dd ->"
        " power(CAST(e.embedding[dd] AS DOUBLE) - c.cent[dd], 2))), 9)"
    ).format(dim=dim)
    parts = [
        f"""
    emb AS (SELECT vec_id, embedding FROM embeddings {train_where}),
    asg_src AS (SELECT vec_id, embedding FROM embeddings {assign_where}),
    c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS cid,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6))
               AS cent
      FROM (SELECT vec_id, embedding FROM emb
            ORDER BY vec_id LIMIT {k})
    )"""
    ]
    for it in range(1, iters + 1):
        parts.append(f"""
    a{it} AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (
          PARTITION BY e.vec_id
          ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM emb e CROSS JOIN c{it - 1} c
      ) WHERE rn = 1
    ),
    u{it} AS (
      SELECT cid, list(mv ORDER BY d) AS cent FROM (
        SELECT a.cid, t.d,
               round(avg(CAST(e.embedding[t.d] AS DOUBLE)), 6) AS mv
        FROM a{it} a JOIN emb e USING (vec_id)
        CROSS JOIN UNNEST(generate_series(1, {dim})) AS t(d)
        GROUP BY a.cid, t.d
      ) GROUP BY cid
    ),
    c{it} AS (
      SELECT * FROM u{it}
      UNION ALL
      SELECT p.cid, p.cent FROM c{it - 1} p
      WHERE p.cid NOT IN (SELECT cid FROM u{it})
    )""")
    parts.append(f"""
    af AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (
          PARTITION BY e.vec_id
          ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM asg_src e CROSS JOIN c{iters} c
      ) WHERE rn = 1
    )""")
    return "WITH " + ",".join(parts) + "\n" + final_select


@query(
    "embedding_kmeans_assign",
    _kmeans_oracle(8, 3, 64, "SELECT vec_id, cid FROM af"),
)
def embedding_kmeans_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means, full assignment table
    (operators/clustering.kmeans_lloyd; k=8, 3 iterations). Unlike the
    seeded-but-engine-specific MLlib KMeans the PQ/IVF trainers use
    internally, every nondeterminism source is pinned (smallest-id init,
    9-dp-quantized distances, 6-dp-rounded means, smallest-cid ties), so
    the CLUSTERING ITSELF sits under the value hash — the oracle unrolls
    the same three Lloyd iterations as SQL CTEs. Scale shape: each
    iteration is one map-only pass emitting k x n_batches partial sums
    (the DataFrame form of MLlib's treeAggregate); the corpus is never
    shuffled and the driver reduce is bounded by k x n_batches rows."""
    from erigon_extract_spark.operators.clustering import kmeans_lloyd

    emb = _load(spark, sf_dir, "embeddings")
    # persist=True: the Lloyd lifecycle otherwise scans the corpus
    # iters+2 times (init, per-iteration partials, final assign) — the
    # cache bounds it at ~2 scans at any SF (r11 round, guide §5)
    assignments, _ = kmeans_lloyd(emb, k=8, iters=3, persist=True)
    return assignments


@query(
    "embedding_kmeans",
    _kmeans_oracle(
        8, 3, 64,
        """
    SELECT c.cid,
           CAST(COALESCE(n.n, 0) AS BIGINT) AS n,
           round(list_sum(c.cent), 6) AS cent_sum,
           round(sqrt(list_sum(list_transform(c.cent, x -> x * x))), 6)
             AS cent_norm
    FROM c3 c
    LEFT JOIN (SELECT cid, COUNT(*) AS n FROM af GROUP BY cid) n
      USING (cid)
    """,
    ),
)
def embedding_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster signature of the deterministic k-means fit
    (operators/clustering.kmeans_summary): member count plus two scalar
    centroid checksums (elementwise sum, L2 norm — scalars so the hash
    is representation-independent). Driven from the centroid table
    LEFT-joined with counts, so an empty cluster still shows n = 0 on
    both engines."""
    from erigon_extract_spark.operators.clustering import kmeans_summary

    return kmeans_summary(
        _load(spark, sf_dir, "embeddings"), k=8, iters=3, persist=True
    )


@query(
    "embedding_kmeans_incremental",
    _kmeans_oracle(
        8, 3, 64,
        "SELECT vec_id, cid FROM af",
        train_where="WHERE vec_id < 400",
        assign_where="WHERE vec_id >= 400",
    ),
)
def embedding_kmeans_incremental_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train-once / assign-forever — the production k-means lifecycle:
    fit on the existing corpus (vec_id < 400), then assign a NEW vector
    batch (vec_id >= 400) against the FROZEN centroids with
    ``kmeans_assign`` — no retrain, no training-corpus read, one
    stateless map pass over the new batch (the same maintain-in-place
    discipline as `sim_ivfpq_index_add` and the erigon incremental
    gates). The oracle re-derives the frozen centroids from the
    training subset and assigns the held-out batch relationally."""
    from erigon_extract_spark.operators.clustering import (
        kmeans_assign,
        kmeans_lloyd,
    )

    emb = _load(spark, sf_dir, "embeddings")
    _, cent = kmeans_lloyd(emb.filter(F.col("vec_id") < 400), k=8, iters=3)
    return kmeans_assign(emb.filter(F.col("vec_id") >= 400), cent)


@query(
    "corpus_cluster_balanced_sample",
    _kmeans_oracle(
        8, 3, 64,
        """
    SELECT vec_id, cid FROM (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY cid ORDER BY vec_id) AS rn
      FROM af
    ) WHERE rn <= 10
    """,
    ),
)
def corpus_cluster_balanced_sample_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-balanced sampling: k-means the embedding space, then take
    a fixed per-cluster quota (10 smallest ids per cluster) — the
    diversity-preserving selection step SemDeDup-style pipelines run
    after clustering (sample the clusters evenly, not the density). The
    composition is the point: the deterministic k-means output feeds a
    per-group top-n (one partial-agg'd exchange on cid), so the whole
    train-assign-sample chain sits under ONE value hash. At 100 TB the
    quota read is a per-cluster top-n, never a global sort."""
    from erigon_extract_spark.operators.clustering import kmeans_lloyd

    emb = _load(spark, sf_dir, "embeddings")
    # persist=True: same iters+2 scan-count rationale as
    # embedding_kmeans_assign (r11 round, guide §5)
    assignments, _ = kmeans_lloyd(emb, k=8, iters=3, persist=True)
    w = Window.partitionBy("cid").orderBy("vec_id")
    return (
        assignments.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("vec_id", "cid")
    )


# ROUND-6 ROTATION — now MECHANICAL (VERDICT r5 directive #2). Rounds
# 1-5 hand-maintained this list and produced exactly one systematic
# miss: agg_approx_distinct went red in r1 (no_oracle), gained its
# error-bound oracle, and then sat outside four consecutive windows
# while never-gated greens queued ahead of it. The window is now the
# first 50 of a total order COMPUTED from the committed
# CORRECTNESS_r*.json ledger itself (erigon_extract_spark/rotation.py):
#   1. red-at-last-appearance      (re-admit fixed defects FIRST)
#   2. never-gated, oracle-backed  (first evidence, strongest check)
#   3. never-gated, rows-only      (first evidence, weaker rows check)
#   4. once-green, oldest first    (single green row -> durable)
#   5. durable, oldest-last-green  (freshness refresh)
#   6. rows-only with any driver row (retired — r7 fix: the driver can
#      only re-record the same row count, so these never again displace
#      hash-verifiable queries from the window)
# with registration order breaking ties. On the r1-r5 ledger this
# composes: agg_approx_distinct, then the 13 never-gated oracle-backed
# r5 additions (JPEG roundtrip, PQ/IVF/IVFPQ + persisted index,
# SemDeDup, BPE/pack synthetic gates, the golden-value scale probes),
# then the 3 rows-only surfaces (scalar_keccak256, text_bpe_tokenize,
# pack_by_bpe_budget — a driver row count is still evidence), then 33
# durability seconds for the oldest once-green rows (all 24 r4
# first-timers + the earliest 9 of the r5 wave). The composition is
# CI-pinned: tests/test_oracle_gate.py replays the rule on the
# committed ledger and asserts the live window matches, so neither the
# rule nor the ledger can drift silently.
_REGISTRATION_ORDER = list(QUERIES)
_GATE_PRIORITY = rotation.compute_gate_priority(
    rotation.load_ledger(), _REGISTRATION_ORDER, set(ORACLES)
)

def _reorder_registry() -> None:
    missing = [n for n in _GATE_PRIORITY if n not in QUERIES]
    if missing:  # fail loudly: a renamed query must update the priority list
        raise KeyError(f"_GATE_PRIORITY names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in _GATE_PRIORITY}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    osorted = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(osorted)


_reorder_registry()
