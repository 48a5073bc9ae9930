"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the W1 priority-queue pop (the crawl
engine's core operator) over the sf0.001 events table.

``queries()`` / ``oracle_sql()`` — operator conformance suite mapping
SURVEY.md §2's inventory onto the driver-generated tables, checked
against DuckDB at sf0.01.  Crawl-specific end-to-end semantics
(politeness, seen-set, resume) are covered by ``tests/`` + the
pure-Python simulator instead (non-SQL-expressible).

Column aliases match between Spark and SQL exactly (the driver's
compare is name-sorted).  Timestamps are emitted as 'yyyy-MM-dd'
strings and floats rounded to 6 decimals to keep value-hashes
engine-stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [
        spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names
    ]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: W1 window-ranked priority pop at sf0.001."""
    return q_w1_priority_pop(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Windows / sorts / top-k (W1/W2/W3/W5, J2)
# ---------------------------------------------------------------------------

def q_w1_priority_pop(spark, sf_dir):
    """The frontier pop shape: per-partition ascending-cost top-k with
    deterministic tie-break (SURVEY.md W1; db.py:103-140 semantics)."""
    (events,) = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (
        # project before the window exchange: only the three needed
        # columns cross the shuffle (guide §2.3)
        events.select("user_id", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id",
                F.round("value", 6).alias("value"), "rn")
    )


def q_w2_pagination(spark, sf_dir):
    """W2: order_by + skip/limit pagination (db.py:595-600)."""
    (customer,) = _load(spark, sf_dir, "customer")
    return (
        customer.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .select("c_custkey", "c_name", F.round("c_acctbal", 6).alias("c_acctbal"))
        .offset(10)
        .limit(20)
    )


def q_w3_reverse_chron(spark, sf_dir):
    """W3: reverse-chronological job list (db.py:1028-1040)."""
    (orders,) = _load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderstatus",
        )
        .limit(50)
    )


def q_w5_earliest_expiry(spark, sf_dir):
    """W5: earliest-expiry selection per group (rate_limiter heap).

    r6: same ``min_by`` hash-aggregate rewrite as J2 (map-side partial
    aggregation, no sort; event_id unique ⇒ identical row per group)."""
    (events,) = _load(spark, sf_dir, "events")
    return (
        events.select("event_type", "event_id", "ts")
        .groupBy("event_type")
        .agg(F.min_by(F.struct("event_id", "ts"),
                      F.struct("ts", "event_id")).alias("_m"))
        .select(
            "event_type", F.col("_m.event_id").alias("event_id"),
            F.date_format("_m.ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        )
    )


def q_j2_latest_per_group(spark, sf_dir):
    """J2: latest-job-per-schedule lookup (db.py:500-521).

    r6: latest-row-per-group as ONE ``max_by`` hash aggregate with
    map-side partial aggregation instead of a window (exchange + full
    sort + rank): each map task pre-collapses its rows per custkey and
    nothing is ever sorted (guide §2.3 "aggregate before you shuffle").
    (o_orderkey is unique, so max over the (date, key) struct is
    exactly the window's rn=1 row — verified row-set-identical.)"""
    (orders,) = _load(spark, sf_dir, "orders")
    return (
        orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max_by(
                F.struct("o_orderkey", "o_orderdate"),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("_m")
        )
        .select(
            "custkey",
            F.col("_m.o_orderkey").alias("latest_orderkey"),
            F.date_format("_m.o_orderdate", "yyyy-MM-dd").alias("latest_date"),
        )
    )


# ---------------------------------------------------------------------------
# Scans / filters / predicates (S2/S3, P1-P7)
# ---------------------------------------------------------------------------

def q_s2_frontier_size(spark, sf_dir):
    """S2: grouped size scan (db.py:142-156)."""
    (orders,) = _load(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_pending")
    )


def q_s3_existence_probe(spark, sf_dir):
    """S3: existence semi-join (any_in_flight, db.py:81-101)."""
    customer, orders = _load(spark, sf_dir, "customer", "orders")
    open_orders = orders.where(F.col("o_orderstatus") == "O")
    return (
        customer.join(open_orders, customer.c_custkey == open_orders.o_custkey,
                      "semi")
        .select("c_custkey", "c_name")
    )


def q_p4_range_predicate(spark, sf_dir):
    """P4: range predicate on sort/partition key → pruned scan."""
    (lineitem,) = _load(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
    )


def q_p5_boolean_filter(spark, sf_dir):
    """P5: boolean-expression filter (success/error selection)."""
    (orders,) = _load(spark, sf_dir, "orders")
    return orders.where(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
        | (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority",
             F.round("o_totalprice", 6).alias("o_totalprice"))


def q_p6_array_contains(spark, sf_dir):
    """P6: array-contains filter (tags.contains, db.py:1033)."""
    (documents,) = _load(spark, sf_dir, "documents")
    return documents.where(
        F.array_contains(F.split(F.col("text"), " "), "spark")
    ).select("doc_id", "lang", "n_chars")


def q_p7_cost_gate(spark, sf_dir):
    """P7: cost-gate predicate 0 < cost ≤ max (extractor.py:91-93)."""
    (lineitem,) = _load(spark, sf_dir, "lineitem")
    cost = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.withColumn("cost", F.round(cost, 6))
        .where((F.col("cost") > 0) & (F.col("cost") <= 20000))
        .select("l_orderkey", "l_linenumber", "cost")
    )


# ---------------------------------------------------------------------------
# Joins (J1/J4/J5)
# ---------------------------------------------------------------------------

def q_j1_ordered_left_join(spark, sf_dir):
    """J1: order-preserving left join response⋈body (db.py:979-1002)."""
    customer, orders = _load(spark, sf_dir, "customer", "orders")
    # r6: distributed sort moved BELOW the broadcast join.  A final
    # orderBy range-partitions by sampling its child, which executes
    # the whole join subtree twice (once for sampling, once for real);
    # range-partitioning the narrow fact side FIRST samples only the
    # scan, and the per-row broadcast-hash left join (customer is
    # unique on c_custkey) preserves both row order within partitions
    # and the partitions' range order, so the trailing local sort
    # yields the identical global (o_orderkey) order.  Partition count
    # comes from spark.sql.shuffle.partitions (scale-adaptive).
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .repartitionByRange("o_orderkey")
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              orders.o_custkey == customer.c_custkey, "left")
        .select(
            "o_orderkey", "o_custkey", "c_name",
            F.round("o_totalprice", 6).alias("o_totalprice"),
        )
        .sortWithinPartitions("o_orderkey")
    )


def q_j4_anti_join(spark, sf_dir):
    """J4: seen-set anti-join (extractor.py:105-116)."""
    customer, orders = _load(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey,
                      "left_anti")
        .select("c_custkey", "c_name")
    )


def q_j5_broadcast_lookup(spark, sf_dir):
    """J5: broadcast dimension lookups (domain_login/captcha by id)."""
    supplier, nation, region = _load(spark, sf_dir, "supplier", "nation",
                                     "region")
    return (
        supplier.join(F.broadcast(nation),
                      supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "s_suppkey", "s_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (A1/A2/A3)
# ---------------------------------------------------------------------------

def q_a1_grouped_count(spark, sf_dir):
    (events,) = _load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_a2_max_sequence(spark, sf_dir):
    """A2: indexed max (get_max_sequence, db.py:295-315)."""
    (orders,) = _load(spark, sf_dir, "orders")
    return orders.agg(F.max("o_orderkey").alias("max_sequence"))


def q_a3_status_counts(spark, sf_dir):
    """A3: per-status counter map (http_status_counts, db.py:440-453)."""
    (orders,) = _load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_orderstatus").alias("status")
    ).agg(F.count("*").alias("n"))


def q_a3_exception_classes(spark, sf_dir):
    """A3/P5: three-way success/error/EXCEPTION classification where an
    exception is a NULL status code (reference db.py:963-993 — the
    same expression drives crawl counters and get_job_items filters).
    The status is derived deterministically since testdata carries no
    natural nulls."""
    (orders,) = _load(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", F.lit(200))
        .when(F.col("o_orderstatus") == "O", F.lit(503))   # 'P' → NULL
    )
    df = orders.withColumn("status_code", status)
    cls = (
        F.when(F.col("status_code").isNull(), "exception")
        .when(F.floor(F.col("status_code") / 100) == 2, "success")
        .otherwise("error")
    )
    return df.groupBy(cls.alias("class")).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Scalar functions (F5/F6/F14/F15)
# ---------------------------------------------------------------------------

def q_f5_regex_chain(spark, sf_dir):
    """F5: first-match regex rule chain (policy.py:748-771 shape)."""
    (part,) = _load(spark, sf_dir, "part")
    category = (
        F.when(F.col("p_type").rlike("^PROMO"), "promo")
        .when(F.col("p_type").rlike("BRASS$"), "brass")
        .when(F.col("p_type").rlike("ECONOMY"), "economy")
        .otherwise("other")
    )
    return part.withColumn("category", category).groupBy("category").agg(
        F.count("*").alias("n"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
    )


def q_f6_cost_arithmetic(spark, sf_dir):
    """F6: ADD/MULTIPLY cost actions as column arithmetic."""
    (lineitem,) = _load(spark, sf_dir, "lineitem")
    new_cost = (
        F.when(F.col("l_returnflag") == "R",
               F.col("l_extendedprice") * 0.0)
        .when(F.col("l_linestatus") == "O", F.col("l_extendedprice") + 100.0)
        .otherwise(F.col("l_extendedprice") * 1.1)
    )
    return (
        lineitem.withColumn("new_cost", F.round(new_cost, 6))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("new_cost"), 4).alias("total_cost"))
    )


def q_f14_duration(spark, sf_dir):
    """F14: duration = completed-started (downloader.py:108-110)."""
    (events,) = _load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("span_seconds"),
        F.count("*").alias("n_events"),
    )


def q_f15_calendar(spark, sf_dir):
    """F15: calendar arithmetic with month-end clamping
    (schedule.py:28-54)."""
    (orders,) = _load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 1), "yyyy-MM-dd").alias(
            "next_month"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias(
            "month_end"
        ),
    )


# ---------------------------------------------------------------------------
# Analytics flagships (A-axis: classic OLAP shapes)
# ---------------------------------------------------------------------------

def q_tpch_q1_pricing(spark, sf_dir):
    (lineitem,) = _load(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q3_shipping(spark, sf_dir):
    customer, orders, lineitem = _load(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    # r6: same inner-join tree, but built so the SMALL side is the
    # broadcast build side.  The planner's size estimate previously
    # picked lineitem (the fact table) as the broadcast relation for
    # the second join — a multi-million-row driver collect + hash
    # relation per query (guide §3.1: "estimates are often badly wrong
    # ... use an explicit broadcast()").  customer⋈orders projected to
    # o_orderkey is the provably small side; lineitem is only probed.
    co = (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .select("o_orderkey")
    )
    return (
        lineitem.join(F.broadcast(co),
                      lineitem.l_orderkey == co.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Training-data ops: text analysis (oracle-able)
# ---------------------------------------------------------------------------

def q_text_token_count(spark, sf_dir):
    from starbelly_spark.functions.text import token_count_expr

    (documents,) = _load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id", token_count_expr(F.col("text")).alias("n_tokens")
    )


def q_text_fingerprint(spark, sf_dir):
    from starbelly_spark.functions.text import fingerprint_expr

    (documents,) = _load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id", fingerprint_expr(F.col("text")).alias("fingerprint")
    )


def q_text_lang_id(spark, sf_dir):
    from starbelly_spark.functions.text import lang_id_expr
    from starbelly_spark.spread import spread

    (documents,) = _load(spark, sf_dir, "documents")
    # the stopword regex scans are per-row heavy and the documents file
    # is a single unsplittable row group — spread so they parallelize
    return spread(documents.select("doc_id", "text")).select(
        "doc_id", lang_id_expr(F.col("text")).alias("lang_guess")
    )


def q_dedup_exact(spark, sf_dir):
    from starbelly_spark.operators.dedup import exact_dedup

    (documents,) = _load(spark, sf_dir, "documents")
    return exact_dedup(documents).select("doc_id", "lang", "n_chars")


def q_dedup_exact_groups(spark, sf_dir):
    from starbelly_spark.operators.dedup import exact_dup_groups

    (documents,) = _load(spark, sf_dir, "documents")
    return exact_dup_groups(documents)


# ---------------------------------------------------------------------------
# Training-data ops: similarity / near-dup (UDF-based → rows-only checks
# where SQL can't express them; exact-cosine variants carry oracles)
# ---------------------------------------------------------------------------

_QUERY_VEC_SEED = 7


def _fixed_query_vec(dim: int = 64) -> list[float]:
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(_QUERY_VEC_SEED))
    v = rng.standard_normal(dim)
    return [float(x) for x in (v / np.linalg.norm(v))]


def q_ann_cosine_topk(spark, sf_dir):
    from starbelly_spark.operators.similarity import cosine_topk

    (embeddings,) = _load(spark, sf_dir, "embeddings")
    out = cosine_topk(embeddings, _fixed_query_vec(), k=10)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_dedup_embedding_cosine_exact(spark, sf_dir):
    """All-pairs cosine ≥ τ (exact; the oracle-checked baseline for the
    LSH variant below).

    r6: same values, ~6× less per-pair arithmetic.  (a) The vector
    norms are per-VECTOR quantities, so they are computed once per row
    BELOW the pair join instead of twice per pair inside cosine_expr —
    the identical sqrt(aggregate(v²)) fold over the identical cast
    array, just relocated, so every double is bit-identical.  (b) The
    projected (id_a, id_b, cosine) pairs are persisted before the
    threshold filter: the filter otherwise pushes below the projection
    and re-evaluates the whole cosine expression per pair (the JVM
    flavor of optimization-guide §4.4 duplication)."""
    from starbelly_spark.spread import spread

    (embeddings,) = _load(spark, sf_dir, "embeddings")

    def _norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v * v))

    # spread the STREAMED side: the broadcast nested-loop join streams
    # the left scan, and the embeddings table is one unsplittable row
    # group — without the spread the entire all-pairs cosine pass ran
    # on ONE task (guide §2.5 input skew)
    l = spread(embeddings.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("_va"),
    )).withColumn("_na", _norm(F.col("_va")))
    r = embeddings.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("_vb"),
    ).withColumn("_nb", _norm(F.col("_vb")))
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    pairs = (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(dot / (F.col("_na") * F.col("_nb")), 6).alias("cosine"),
        )
        .persist()
    )
    return pairs.where(F.col("cosine") >= 0.4)


def q_dedup_embedding_cosine_lsh(spark, sf_dir):
    """Scale path: hyperplane-LSH bucketed near-dup.  Fully oracled:
    the plane matrix is deterministic float64, so DuckDB replicates
    the sign-bucketing from SQL literals (see oracle_sql)."""
    from starbelly_spark.operators.dedup import embedding_near_dups

    (embeddings,) = _load(spark, sf_dir, "embeddings")
    out = embedding_near_dups(embeddings, threshold=0.4, n_planes=6)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_ann_lsh_topk(spark, sf_dir):
    """ANN via hyperplane buckets + 1-bit multiprobe.  Fully oracled:
    probe-bucket set and plane literals are deterministic."""
    from starbelly_spark.operators.similarity import lsh_topk

    (embeddings,) = _load(spark, sf_dir, "embeddings")
    out = lsh_topk(embeddings, _fixed_query_vec(), k=10, n_planes=8)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


# Recall-gated forms for the non-SQL-expressible approximate family
# (minhash / simhash / winnowing are hash-procedural): the output is
# the EXACT ground-truth pair set (pure-JVM shingle join — DuckDB
# mirrors it in SQL) plus a constant `recall_ok` column asserting the
# approximate operator recovered ≥ MIN_RECALL of it.  A recall
# regression flips every row → value-hash mismatch → red.

MIN_RECALL = 0.9
# precision side of the gate: the approximate operator may emit at
# most this many × |exact| distinct pairs (both operators currently
# sit at ratio 1.0 on the sf corpora — 8× headroom, explosion fails)
MAX_CAND_RATIO = 8.0


# Clustered-fixture parameters for the IVF entry: the raw synthetic
# embeddings are isotropic gaussians (no cluster structure — IVF
# recall there ≈ probed fraction, meaningless), so the entry derives a
# clustered dataset deterministically from the input table:
# v' = v + IVF_SCALE · offset[vec_id % IVF_CLUSTERS].  Real corpora
# cluster; this makes the recall gate hold at a production-shaped
# n_probe = 4/16 instead of the r2 caveat's 12/16.
IVF_CLUSTERS = 16
IVF_SCALE = 3.0
IVF_SEED = 77
IVF_N_PROBE = 4


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN (bounded driver-side centroid training, cell-pruned
    probe) over the clustered fixture.  Output = the EXACT cosine
    top-k on the clustered vectors (fully oracled: the cluster offsets
    are float64-exact SQL literals) plus a recall gate: the IVF probe
    at n_probe=4/16 must recover ≥ MIN_RECALL of it."""
    from starbelly_spark.operators.similarity import (
        cluster_offsets,
        clustered_embedding_col,
        cosine_topk,
        ivf_topk,
        train_centroids,
    )

    from starbelly_spark.spread import spread

    (embeddings,) = _load(spark, sf_dir, "embeddings")
    offsets = cluster_offsets(64, IVF_CLUSTERS, IVF_SEED)
    # spread + persist: the clustered projection (a 64-dim zip_with per
    # row) feeds THREE consumers (exact top-k, centroid training, the
    # IVF probe) and the embeddings scan is one unsplittable row group
    # — without this it was recomputed per consumer on one task
    clustered = spread(embeddings).withColumn(
        "clustered",
        clustered_embedding_col(F.col("embedding"), F.col("vec_id"),
                                offsets, IVF_SCALE),
    ).persist()
    q = [float(x) for x in offsets[5]]      # a query near cluster 5
    exact = cosine_topk(clustered, q, k=10, vec_col="clustered")
    cents = train_centroids(clustered, n_centroids=IVF_CLUSTERS,
                            vec_col="clustered")
    ivf_ids = {
        r["vec_id"] for r in ivf_topk(clustered, q, cents, k=10,
                                      n_probe=IVF_N_PROBE,
                                      vec_col="clustered").collect()
    }
    exact_ids = [r["vec_id"] for r in exact.collect()]
    recall = (
        sum(1 for i in exact_ids if i in ivf_ids) / len(exact_ids)
        if exact_ids else 1.0
    )
    return exact.select(
        "vec_id", F.round("cosine", 6).alias("cosine"),
        F.lit(bool(recall >= MIN_RECALL)).alias("recall_ok"),
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    from starbelly_spark.operators.dedup import (
        exact_jaccard_pairs,
        minhash_near_dups,
        recall_gated_pairs,
    )

    (documents,) = _load(spark, sf_dir, "documents")
    exact = exact_jaccard_pairs(documents, threshold=0.5, shingle_n=3)
    found = minhash_near_dups(documents, threshold=0.5, shingle_n=3)
    out = recall_gated_pairs(exact, found, MIN_RECALL)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"),
                      "recall_ok")


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Standalone exact n-gram-Jaccard near-dup (task brief): the
    pure-JVM shingle-join operator, directly oracled (no UDF, no
    gate)."""
    from starbelly_spark.operators.dedup import exact_jaccard_pairs

    (documents,) = _load(spark, sf_dir, "documents")
    out = exact_jaccard_pairs(documents, threshold=0.7, shingle_n=2)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_simhash(spark, sf_dir):
    from starbelly_spark.operators.dedup import (
        exact_jaccard_pairs,
        recall_gated_pairs,
        simhash_near_dups,
    )

    (documents,) = _load(spark, sf_dir, "documents")
    exact = exact_jaccard_pairs(documents, threshold=0.8, shingle_n=2)
    # t=10 (11 pigeonhole chunks): jaccard-0.8 pairs on this corpus
    # span hammings up to ~9; production web-scale simhash runs t=3
    # with 16-bit chunks — t is a recall/bucket-width dial, and the
    # pigeonhole guarantee holds at any t (chunks = t+1)
    found = simhash_near_dups(documents, max_hamming=10, shingle_n=2)
    # cand_ok closes the r2 verdict's one-sided-gate blind spot: a
    # false-positive explosion (found ≫ exact) flips it via the same
    # value-hash mechanism a recall regression flips recall_ok
    out = recall_gated_pairs(exact, found, MIN_RECALL,
                             max_candidate_ratio=MAX_CAND_RATIO)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"),
                      "recall_ok", "cand_ok")


def q_text_winnow(spark, sf_dir):
    from starbelly_spark.functions.text import winnow_pairs
    from starbelly_spark.operators.dedup import (
        exact_jaccard_pairs,
        recall_gated_pairs,
    )

    (documents,) = _load(spark, sf_dir, "documents")
    exact = exact_jaccard_pairs(documents, threshold=0.9, shingle_n=3)
    found = winnow_pairs(documents)
    out = recall_gated_pairs(exact, found, MIN_RECALL,
                             max_candidate_ratio=MAX_CAND_RATIO)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"),
                      "recall_ok", "cand_ok")


def q_f13_header_flatten(spark, sf_dir):
    """F13: map → alternating [K1,V1,...] array, keys uppercased
    (storage.py:90-94); emitted joined as a string for the oracle."""
    from starbelly_spark.functions.records import header_flatten_expr

    (events,) = _load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("props"), F.col("props")
    )
    return events.select(
        "event_id",
        F.array_join(header_flatten_expr(m), "|").alias("flat_headers"),
    )


def q_a4_set_union(spark, sf_dir):
    """A4: set-union aggregate (seen-set reload shape)."""
    (events,) = _load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set("event_type")), ","
        ).alias("event_types"),
        F.count("*").alias("n"),
    )


def q_w4_sync_scan(spark, sf_dir):
    """W4/S12: ordered scan after a sequence cursor (db.py:1074-1109)."""
    (events,) = _load(spark, sf_dir, "events")
    return (
        events.where(F.col("event_id") > 9000)
        .orderBy("event_id")
        .select("event_id", "event_type",
                F.round("value", 6).alias("value"))
    )


def q_f12_mime_parse(spark, sf_dir):
    """F12: MIME type/subtype split (extractor.py:147)."""
    from starbelly_spark.functions.records import (
        mime_subtype_expr,
        mime_type_expr,
    )

    (part,) = _load(spark, sf_dir, "part")
    ct = F.concat(F.lit("text/"), F.lower(F.col("p_brand")),
                  F.lit("; charset=utf-8"))
    return part.select(
        "p_partkey",
        mime_type_expr(ct).alias("mime_type"),
        mime_subtype_expr(ct).alias("mime_subtype"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "w1_priority_pop": q_w1_priority_pop,
        "w2_pagination": q_w2_pagination,
        "w3_reverse_chron": q_w3_reverse_chron,
        "w5_earliest_expiry": q_w5_earliest_expiry,
        "j2_latest_per_group": q_j2_latest_per_group,
        "s2_frontier_size": q_s2_frontier_size,
        "s3_existence_probe": q_s3_existence_probe,
        "p4_range_predicate": q_p4_range_predicate,
        "p5_boolean_filter": q_p5_boolean_filter,
        "p6_array_contains": q_p6_array_contains,
        "p7_cost_gate": q_p7_cost_gate,
        "j1_ordered_left_join": q_j1_ordered_left_join,
        "j4_anti_join": q_j4_anti_join,
        "j5_broadcast_lookup": q_j5_broadcast_lookup,
        "a1_grouped_count": q_a1_grouped_count,
        "a2_max_sequence": q_a2_max_sequence,
        "a3_status_counts": q_a3_status_counts,
        "a3_exception_classes": q_a3_exception_classes,
        "f5_regex_chain": q_f5_regex_chain,
        "f6_cost_arithmetic": q_f6_cost_arithmetic,
        "f14_duration": q_f14_duration,
        "f15_calendar": q_f15_calendar,
        "tpch_q1_pricing": q_tpch_q1_pricing,
        "tpch_q3_shipping": q_tpch_q3_shipping,
        "text_token_count": q_text_token_count,
        "text_fingerprint": q_text_fingerprint,
        "text_lang_id": q_text_lang_id,
        "dedup_exact": q_dedup_exact,
        "dedup_exact_groups": q_dedup_exact_groups,
        "ann_cosine_topk": q_ann_cosine_topk,
        "dedup_embedding_cosine_exact": q_dedup_embedding_cosine_exact,
        "dedup_embedding_cosine_lsh": q_dedup_embedding_cosine_lsh,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "text_winnow": q_text_winnow,
        "f13_header_flatten": q_f13_header_flatten,
        "a4_set_union": q_a4_set_union,
        "w4_sync_scan": q_w4_sync_scan,
        "f12_mime_parse": q_f12_mime_parse,
    }


def _lang_id_sql() -> str:
    """CASE-chain mirror of functions/text.lang_id_expr."""
    from starbelly_spark.functions.text import STOPWORDS

    score = {
        lang: (
            "len(regexp_extract_all(lower(text), "
            f"'\\b({'|'.join(words)})\\b'))"
        )
        for lang, words in STOPWORDS.items()
    }
    # same fold as the Spark expression: iterate langs alphabetically,
    # strictly-greater replaces
    langs = sorted(score)
    expr_lang, expr_score = "'und'", "0"
    for lang in langs:
        s = score[lang]
        expr_lang = f"CASE WHEN {s} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {s} > {expr_score} THEN {s} ELSE {expr_score} END"
    return f"SELECT doc_id, {expr_lang} AS lang_guess FROM documents"


def _exact_jaccard_sql(shingle_n: int, threshold: float,
                       with_gate: bool = True,
                       with_cand: bool = False) -> str:
    """DuckDB mirror of operators.dedup.exact_jaccard_pairs +
    recall_gated_pairs output (the gate columns are literal true: a
    Spark-side recall regression or candidate explosion flips them
    and fails the hash)."""
    concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(shingle_n))
    return rf"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN []
                      ELSE regexp_split_to_array(trim(lower(text)), '\s+')
                 END AS t
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 CASE WHEN len(t) = 0 THEN []
                      WHEN len(t) < {shingle_n} THEN [array_to_string(t, ' ')]
                      ELSE list_distinct(list_transform(
                             generate_series(1, len(t) - {shingle_n - 1}),
                             i -> {concat}))
                 END AS s_arr
          FROM toks
        ), expl AS (
          SELECT doc_id, len(s_arr) AS n_sh, unnest(s_arr) AS s FROM sh
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.n_sh AS na, b.n_sh AS nb, count(*) AS i
          FROM expl a JOIN expl b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4
        )
        SELECT id_a, id_b,
               round(i::DOUBLE / (na + nb - i), 6) AS jaccard
               {", true AS recall_ok" if with_gate else ""}
               {", true AS cand_ok" if with_cand else ""}
        FROM inter WHERE i::DOUBLE / (na + nb - i) >= {threshold}
    """


def _ivf_clustered_sql() -> str:
    """DuckDB mirror of the IVF entry's EXACT top-k over the clustered
    fixture: the cluster offsets are float32-quantized float64
    literals, so ``embedding + scale·offset[vec_id % n]`` is
    bit-identical in both engines (same IEEE ops, same fold order)."""
    from starbelly_spark.operators.similarity import cluster_offsets_as_lists

    offs = cluster_offsets_as_lists(64, IVF_CLUSTERS, IVF_SEED)
    cent_lit = "[" + ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]" for row in offs
    ) + "]::DOUBLE[][]"
    q_lit = "[" + ", ".join(repr(x) for x in offs[5]) + "]::DOUBLE[]"
    return f"""
        SELECT vec_id,
               round(list_cosine_similarity(
                   list_transform(generate_series(1, 64),
                       i -> (embedding::DOUBLE[])[i]
                            + {IVF_SCALE} * (({cent_lit})[(vec_id % {IVF_CLUSTERS}) + 1])[i]),
                   {q_lit}), 6) AS cosine,
               true AS recall_ok
        FROM embeddings
        ORDER BY cosine DESC, vec_id LIMIT 10
    """


def _bucket_sql(n_planes: int, seed: int = 42, dim: int = 64) -> str:
    """Hyperplane sign-bucket id as a DuckDB expression over
    `embedding` — the plane matrix emitted as SQL literals (it is a
    deterministic function of (dim, n_planes, seed), float64 exact)."""
    from starbelly_spark.operators.similarity import hyperplanes_as_lists

    terms = []
    for j, plane in enumerate(hyperplanes_as_lists(dim, n_planes, seed)):
        vec = ", ".join(repr(x) for x in plane)
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
            f"[{vec}]::DOUBLE[]) > 0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


def _ann_lsh_probe_buckets(n_planes: int = 8, seed: int = 42) -> list[int]:
    from starbelly_spark.operators.similarity import hyperplane_bucket_of

    qb = hyperplane_bucket_of(_fixed_query_vec(), n_planes, seed)
    return sorted({qb} | {qb ^ (1 << i) for i in range(n_planes)})


def oracle_sql() -> dict[str, str]:
    qv = ", ".join(str(x) for x in _fixed_query_vec())
    return {
        "w1_priority_pop": """
            SELECT user_id, event_id, round(value, 6) AS value, rn FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value, event_id) AS rn
              FROM events) WHERE rn <= 3
        """,
        "w2_pagination": """
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
            FROM customer ORDER BY c_acctbal DESC, c_custkey
            LIMIT 20 OFFSET 10
        """,
        "w3_reverse_chron": """
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_orderstatus
            FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 50
        """,
        "w5_earliest_expiry": """
            SELECT event_type, event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts FROM (
              SELECT event_type, event_id, ts,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn = 1
        """,
        "j2_latest_per_group": """
            SELECT o_custkey AS custkey, o_orderkey AS latest_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS latest_date FROM (
              SELECT *, row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders) WHERE rn = 1
        """,
        "s2_frontier_size": """
            SELECT o_custkey AS custkey, count(*) AS n_pending
            FROM orders GROUP BY o_custkey
        """,
        "s3_existence_probe": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        """,
        "p4_range_predicate": """
            SELECT l_returnflag, count(*) AS n_items,
                   round(sum(l_quantity), 6) AS sum_qty
            FROM lineitem
            WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
            GROUP BY l_returnflag
        """,
        "p5_boolean_filter": """
            SELECT o_orderkey, o_orderstatus, o_orderpriority,
                   round(o_totalprice, 6) AS o_totalprice
            FROM orders
            WHERE (o_orderstatus = 'F' AND o_totalprice > 150000)
               OR o_orderpriority = '1-URGENT'
        """,
        "p6_array_contains": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE list_contains(string_split(text, ' '), 'spark')
        """,
        "p7_cost_gate": """
            SELECT l_orderkey, l_linenumber, cost FROM (
              SELECT l_orderkey, l_linenumber,
                     round(l_extendedprice * (1 - l_discount), 6) AS cost
              FROM lineitem)
            WHERE cost > 0 AND cost <= 20000
        """,
        "j1_ordered_left_join": """
            SELECT o_orderkey, o_custkey, c_name,
                   round(o_totalprice, 6) AS o_totalprice
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey
        """,
        "j4_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "j5_broadcast_lookup": """
            SELECT s_suppkey, s_name, n_name AS nation, r_name AS region
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "a1_grouped_count": """
            SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY event_type
        """,
        "a2_max_sequence": "SELECT max(o_orderkey) AS max_sequence FROM orders",
        "a3_status_counts": """
            SELECT o_orderstatus AS status, count(*) AS n
            FROM orders GROUP BY o_orderstatus
        """,
        "a3_exception_classes": """
            SELECT CASE WHEN status_code IS NULL THEN 'exception'
                        WHEN status_code // 100 = 2 THEN 'success'
                        ELSE 'error' END AS class,
                   count(*) AS n
            FROM (SELECT CASE WHEN o_orderstatus = 'F' THEN 200
                              WHEN o_orderstatus = 'O' THEN 503 END
                           AS status_code
                  FROM orders)
            GROUP BY 1
        """,
        "f5_regex_chain": """
            SELECT category, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
            FROM (
              SELECT CASE WHEN regexp_matches(p_type, '^PROMO') THEN 'promo'
                          WHEN regexp_matches(p_type, 'BRASS$') THEN 'brass'
                          WHEN regexp_matches(p_type, 'ECONOMY') THEN 'economy'
                          ELSE 'other' END AS category, p_retailprice
              FROM part) GROUP BY category
        """,
        "f6_cost_arithmetic": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(new_cost), 4) AS total_cost FROM (
              SELECT l_returnflag, l_linestatus,
                     round(CASE WHEN l_returnflag = 'R' THEN l_extendedprice * 0.0
                          WHEN l_linestatus = 'O' THEN l_extendedprice + 100.0
                          ELSE l_extendedprice * 1.1 END, 6) AS new_cost
              FROM lineitem) GROUP BY l_returnflag, l_linestatus
        """,
        "f14_duration": """
            SELECT user_id,
                   floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT
                     AS span_seconds,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "f15_calendar": """
            SELECT o_orderkey,
                   strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
                   strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
            FROM orders
        """,
        "tpch_q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3_shipping": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "text_token_count": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "text_fingerprint": r"""
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                     AS fingerprint
            FROM documents
        """,
        "text_lang_id": _lang_id_sql(),
        "dedup_exact": r"""
            SELECT doc_id, lang, n_chars FROM (
              SELECT doc_id, lang, n_chars,
                     row_number() OVER (
                       PARTITION BY md5(regexp_replace(lower(trim(text)),
                                                       '\s+', ' ', 'g'))
                       ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
        "dedup_exact_groups": r"""
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                     AS fingerprint,
                   count(*) AS n_dups, min(doc_id) AS keep_id
            FROM documents
            GROUP BY 1 HAVING count(*) > 1
        """,
        "ann_cosine_topk": f"""
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                                                [{qv}]::DOUBLE[]), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "dedup_embedding_cosine_exact": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6)
                     AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 6) >= 0.4
        """,
        "f13_header_flatten": """
            SELECT event_id,
                   'TYPE|' || event_type || '|PROPS|' || props AS flat_headers
            FROM events
        """,
        "a4_set_union": """
            SELECT user_id,
                   string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                     AS event_types,
                   count(*) AS n
            FROM events GROUP BY user_id
        """,
        "w4_sync_scan": """
            SELECT event_id, event_type, round(value, 6) AS value
            FROM events WHERE event_id > 9000 ORDER BY event_id
        """,
        "f12_mime_parse": """
            SELECT p_partkey, 'text' AS mime_type,
                   lower(p_brand) AS mime_subtype
            FROM part
        """,
        "ann_ivf_topk": _ivf_clustered_sql(),
        "dedup_minhash_lsh": _exact_jaccard_sql(shingle_n=3, threshold=0.5),
        "dedup_simhash": _exact_jaccard_sql(shingle_n=2, threshold=0.8,
                                            with_cand=True),
        "dedup_ngram_jaccard": _exact_jaccard_sql(
            shingle_n=2, threshold=0.7, with_gate=False
        ),
        "text_winnow": _exact_jaccard_sql(shingle_n=3, threshold=0.9,
                                          with_cand=True),
        "dedup_embedding_cosine_lsh": f"""
            WITH b AS (
              SELECT vec_id, embedding, {_bucket_sql(6)} AS bucket
              FROM embeddings
            )
            SELECT a.vec_id AS id_a, c.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]), 6)
                     AS cosine
            FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         c.embedding::DOUBLE[]) >= 0.4
        """,
        "ann_lsh_topk": f"""
            WITH b AS (
              SELECT vec_id, embedding, {_bucket_sql(8)} AS bucket
              FROM embeddings
            )
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                                                [{qv}]::DOUBLE[]), 6) AS cosine
            FROM b
            WHERE bucket IN ({", ".join(map(str, _ann_lsh_probe_buckets()))})
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
    }
