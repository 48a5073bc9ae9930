"""Seen-set filters: no false negatives, low FP rate, (de)serialization,
cuckoo delete, Spark probe/update/split paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from starbelly_spark.functions.urls import url_hash
from starbelly_spark.seen import (
    BlockedBloom,
    CuckooFilter,
    SeenParams,
    _as_matrix,
    add_to_segments,
    empty_segments,
    partition_col,
    partition_of,
    probe_seen,
    split_new_urls,
)


def _hashes(n, prefix="u"):
    return _as_matrix([url_hash(f"http://x.test/{prefix}{i}") for i in range(n)])


def test_bloom_no_false_negatives_and_low_fp():
    f = BlockedBloom(1 << 16, salt=7)
    inserted = _hashes(2000, "in")
    f.add(inserted)
    assert f.contains(inserted).all()
    other = _hashes(4000, "out")
    fp_rate = f.contains(other).mean()
    assert fp_rate < 0.05, fp_rate


def test_bloom_serialization_roundtrip():
    f = BlockedBloom(1 << 13, salt=3)
    f.add(_hashes(100))
    g = BlockedBloom.from_bytes(f.to_bytes())
    assert g.salt == f.salt and g.bits == f.bits
    assert np.array_equal(g.words, f.words)
    assert g.contains(_hashes(100)).all()


def test_cuckoo_membership_and_delete():
    f = CuckooFilter(1 << 11, salt=5)
    h = _hashes(1500, "c")
    assert f.add(h) == 0          # well under capacity → no failures
    assert f.contains(h).all()
    other = _hashes(3000, "d")
    assert f.contains(other).mean() < 0.05
    # delete the first 100, they must disappear
    f.delete(h[:100])
    assert not f.contains(h[:100]).any()
    assert f.contains(h[100:]).all()


def test_cuckoo_serialization_roundtrip():
    f = CuckooFilter(1 << 8, salt=9)
    h = _hashes(200, "s")
    f.add(h)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.contains(h).all()


def test_partition_col_matches_python(spark):
    urls = [f"http://h{i}.test/p" for i in range(50)]
    rows = [(u, url_hash(u)) for u in urls]
    df = spark.createDataFrame(rows, "url string, url_hash binary")
    out = df.withColumn("pid", partition_col(F.col("url_hash"), 8)).collect()
    for r in out:
        assert r.pid == partition_of(bytes(r.url_hash), 8), r.url


@pytest.fixture()
def params():
    return SeenParams(n_partitions=4, bloom_bits=1 << 13, cuckoo_buckets=1 << 8)


def test_probe_update_split_cycle(spark, params):
    job = "jobX"
    urls1 = [f"http://s.test/{i}" for i in range(50)]
    urls2 = [f"http://s.test/{i}" for i in range(30, 80)]  # 20 overlap

    def df_of(urls):
        return spark.createDataFrame(
            [(u, url_hash(u)) for u in urls], "url string, url_hash binary"
        )

    segs = empty_segments(spark)
    exact = spark.createDataFrame([], "url_hash binary")

    # round 1: all new
    new1 = split_new_urls(df_of(urls1), segs, exact, params, job)
    assert sorted(r.url for r in new1.collect()) == sorted(urls1)

    segs = add_to_segments(df_of(urls1), segs, params, job)
    segs.cache()
    exact = df_of(urls1).select("url_hash")

    # probe: everything in round 1 now reads maybe_seen
    probed = probe_seen(df_of(urls1), segs, params, job)
    assert all(r.maybe_seen for r in probed.collect())

    # round 2: only the 30 unseen survive (exact — FPs rescued)
    new2 = split_new_urls(df_of(urls2), segs, exact, params, job)
    assert sorted(r.url for r in new2.collect()) == sorted(
        f"http://s.test/{i}" for i in range(50, 80)
    )


def test_segments_survive_untouched_partitions(spark, params):
    """Partitions with no new URLs must pass through unchanged."""
    job = "jobY"

    def df_of(urls):
        return spark.createDataFrame(
            [(u, url_hash(u)) for u in urls], "url string, url_hash binary"
        )

    segs = add_to_segments(
        df_of([f"http://a.test/{i}" for i in range(40)]),
        empty_segments(spark), params, job,
    )
    n_parts_before = segs.select("partition_id").distinct().count()
    # add a single URL (touches one partition)
    segs2 = add_to_segments(df_of(["http://b.test/only"]), segs, params, job)
    assert segs2.select("partition_id").distinct().count() == n_parts_before
    # old URLs still present in the new segments
    probed = probe_seen(
        df_of([f"http://a.test/{i}" for i in range(40)]), segs2, params, job
    )
    assert all(r.maybe_seen for r in probed.collect())


def test_cuckoo_overflow_no_false_negatives_via_probe(spark):
    """Overfill a tiny cuckoo: probe must still report every inserted
    URL as maybe_seen (bloom carries the no-FN guarantee)."""
    from starbelly_spark.seen import CuckooFilter

    params = SeenParams(n_partitions=1, bloom_bits=1 << 17,
                        cuckoo_buckets=1 << 4)   # 64-slot cuckoo
    job = "jobZ"
    urls = [f"http://o.test/{i}" for i in range(500)]
    df = spark.createDataFrame(
        [(u, url_hash(u)) for u in urls], "url string, url_hash binary"
    )
    segs = add_to_segments(df, empty_segments(spark), params, job)
    probed = probe_seen(df, segs, params, job)
    assert all(r.maybe_seen for r in probed.collect())
    # and the filter is indeed overflowed
    seg = [r for r in segs.collect() if r.kind == "cuckoo"][0]
    assert CuckooFilter.from_bytes(bytes(seg.segment)).overflowed


def test_cuckoo_overflow_insert_is_fast():
    import time

    from starbelly_spark.seen import CuckooFilter

    f = CuckooFilter(1 << 4, salt=1)   # 64 slots
    h = _hashes(20000, "of")
    t0 = time.perf_counter()
    f.add(h)
    assert time.perf_counter() - t0 < 5.0
    assert f.overflowed
