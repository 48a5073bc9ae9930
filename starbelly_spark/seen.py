"""Partitioned URL-seen set: blocked bloom + cuckoo filter (north rule).

The reference keeps the seen set as an unbounded in-RAM Python set of
blake2b-16 digests, pickled to the job document on pause
(``/root/reference/starbelly/job.py:332-340,227-243``) — its own docs
flag that as the scale ceiling.  Here the seen set is **partitioned by
url_hash**, each partition owning:

* a **blocked bloom filter** (512-bit cache-line blocks, k=7) — the
  fast prefilter; and
* a **cuckoo filter** (4-way buckets, 16-bit fingerprints) — supports
  deletion (job cancel) and ~3%-FP membership at 95% load.

Both are salted per (job, partition) so adversarial URL sets can't
saturate one block pattern across partitions.  Serialized segments are
checkpointed per micro-batch (seen_segments table) — resumable state.

Exactness: a filter "hit" may be a false positive, so filter answers
are only a pre-filter.  ``split_new_urls`` routes "definitely new"
(filter miss — bloom has no false negatives) straight to the frontier
and rescues the "maybe seen" residue with an exact ``left_anti`` join
against the exact seen table (SURVEY.md J4).  At steady state the
residue is dominated by true duplicates, so the expensive exact join
runs on a small fraction of discovered links.

Scale: bloom @ 10 bits/URL for 10^10 URLs ≈ 12.5 GB total → ~12 MB per
partition at 1024 partitions, living in executors via cogrouped
``applyInPandas`` (never on the driver).  The exact seen table is
bucketed by url_hash so the rescue anti-join co-locates.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEGMENT_SCHEMA = "partition_id int, kind string, segment binary"
_BLOOM_MAGIC = b"SBBL"
_CUCKOO_MAGIC = b"SBCK"


@dataclass(frozen=True)
class SeenParams:
    n_partitions: int = 8
    bloom_bits: int = 1 << 16        # per partition; power of two
    cuckoo_buckets: int = 1 << 11    # per partition; power of two
    seed: int = 42

    def salt(self, job_id: str, partition_id: int) -> int:
        return zlib.crc32(f"{job_id}|{partition_id}|{self.seed}".encode())


def partition_of(url_hash: bytes, n_partitions: int) -> int:
    return int.from_bytes(url_hash[:4], "little") % n_partitions


def partition_col(url_hash_col, n_partitions: int):
    """Same partition routing as a JVM-side column expression."""
    # little-endian uint32 of the first 4 bytes
    b = [F.conv(F.hex(F.substring(url_hash_col, i + 1, 1)), 16, 10).cast("long")
         for i in range(4)]
    val = b[0] + b[1] * 256 + b[2] * 65536 + b[3] * 16777216
    return (val % F.lit(n_partitions)).cast("int")


def _words(hashes: np.ndarray, salt: int) -> tuple[np.ndarray, np.ndarray]:
    """Split N×16 hash bytes into two salted uint64 word arrays."""
    w = hashes.view("<u8").reshape(-1, 2)
    s = np.uint64(salt * 0x9E3779B97F4A7C15 % (1 << 64))
    return w[:, 0] ^ s, w[:, 1] ^ np.uint64(s >> np.uint64(1))


def _as_matrix(hash_list) -> np.ndarray:
    if len(hash_list) == 0:
        return np.empty((0, 16), dtype=np.uint8)
    return np.frombuffer(b"".join(hash_list), dtype=np.uint8).reshape(-1, 16)


class BlockedBloom:
    """512-bit-block bloom filter, k=7, vectorized over hash batches."""

    K = 7

    def __init__(self, bits: int, salt: int, words: np.ndarray | None = None):
        assert bits % 512 == 0 and bits & (bits - 1) == 0
        self.bits = bits
        self.salt = salt
        self.n_blocks = bits // 512
        self.words = (
            words if words is not None
            else np.zeros(self.n_blocks * 8, dtype=np.uint64)
        )

    def _positions(self, hashes: np.ndarray):
        w0, w1 = _words(hashes, self.salt)
        block = (w0 % np.uint64(self.n_blocks)).astype(np.int64)
        idx = np.empty((len(w0), self.K), dtype=np.int64)
        mask = np.empty((len(w0), self.K), dtype=np.uint64)
        for i in range(self.K):
            pos = (w1 >> np.uint64(9 * i)) & np.uint64(511)
            idx[:, i] = block * 8 + (pos >> np.uint64(6)).astype(np.int64)
            mask[:, i] = np.uint64(1) << (pos & np.uint64(63))
        return idx, mask

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx, mask = self._positions(hashes)
        np.bitwise_or.at(self.words, idx.ravel(), mask.ravel())

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        idx, mask = self._positions(hashes)
        return ((self.words[idx] & mask) == mask).all(axis=1)

    def to_bytes(self) -> bytes:
        head = _BLOOM_MAGIC + struct.pack("<QI", self.bits, self.salt & 0xFFFFFFFF)
        return head + self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BlockedBloom":
        assert data[:4] == _BLOOM_MAGIC
        bits, salt = struct.unpack("<QI", data[4:16])
        words = np.frombuffer(data[16:], dtype=np.uint64).copy()
        return cls(bits, salt, words)


class CuckooFilter:
    """4-way cuckoo filter with 16-bit fingerprints (supports delete).

    When an insert fails (filter at capacity even after eviction
    kicks) the filter marks itself ``overflowed`` — persisted in the
    serialized header — and membership answers become unreliable for
    NEGATIVES (an evicted-away element would read as absent).  Callers
    that need the no-false-negative guarantee must treat an overflowed
    cuckoo as "maybe contains anything" (see probe_seen).
    """

    SLOTS = 4
    MAX_KICKS = 64

    def __init__(self, n_buckets: int, salt: int, table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0
        self.n_buckets = n_buckets
        self.salt = salt
        self.table = (
            table if table is not None
            else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        )
        self._kick_state = salt or 1
        self.overflowed = False

    def _fp_and_buckets(self, hashes: np.ndarray):
        w0, w1 = _words(hashes, self.salt)
        fp = ((w1 % np.uint64(65535)) + np.uint64(1)).astype(np.uint16)
        i1 = (w0 % np.uint64(self.n_buckets)).astype(np.int64)
        i2 = self._alt(i1, fp)
        return fp, i1, i2

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(self.n_buckets)
        return (idx.astype(np.uint64) ^ h).astype(np.int64) % self.n_buckets

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_and_buckets(hashes)
        fpc = fp[:, None]
        return ((self.table[i1] == fpc) | (self.table[i2] == fpc)).any(axis=1)

    def add(self, hashes: np.ndarray) -> int:
        """Insert; returns number of items that failed (filter full).
        A failure marks the filter overflowed; further failed inserts
        skip the eviction loop (fast-fail) — correctness is preserved
        by the caller treating an overflowed filter as all-maybe."""
        fails = 0
        if len(hashes) == 0:
            return 0
        fp, i1, i2 = self._fp_and_buckets(hashes)
        for j in range(len(fp)):
            if not self._insert_one(int(fp[j]), int(i1[j]), int(i2[j]),
                                    kicks=0 if self.overflowed else self.MAX_KICKS):
                fails += 1
                self.overflowed = True
        return fails

    def _insert_one(self, fp: int, i1: int, i2: int,
                    kicks: int | None = None) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict deterministically (xorshift on persistent state)
        idx = i1
        for _ in range(self.MAX_KICKS if kicks is None else kicks):
            self._kick_state ^= (self._kick_state << 13) & 0xFFFFFFFF
            self._kick_state ^= self._kick_state >> 17
            self._kick_state ^= (self._kick_state << 5) & 0xFFFFFFFF
            slot = self._kick_state % self.SLOTS
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = int(
                self._alt(np.array([idx], dtype=np.int64),
                          np.array([fp], dtype=np.uint16))[0]
            )
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False

    def delete(self, hashes: np.ndarray) -> None:
        fp, i1, i2 = self._fp_and_buckets(hashes)
        for j in range(len(fp)):
            for idx in (int(i1[j]), int(i2[j])):
                row = self.table[idx]
                hit = np.nonzero(row == fp[j])[0]
                if len(hit):
                    row[hit[0]] = 0
                    break

    def to_bytes(self) -> bytes:
        head = _CUCKOO_MAGIC + struct.pack(
            "<QIIB", self.n_buckets, self.salt & 0xFFFFFFFF,
            self._kick_state & 0xFFFFFFFF, 1 if self.overflowed else 0,
        )
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        assert data[:4] == _CUCKOO_MAGIC
        n_buckets, salt, kick, over = struct.unpack("<QIIB", data[4:21])
        table = (
            np.frombuffer(data[21:], dtype=np.uint16)
            .reshape(n_buckets, cls.SLOTS)
            .copy()
        )
        f = cls(n_buckets, salt, table)
        f._kick_state = kick or 1
        f.overflowed = bool(over)
        return f


# ---------------------------------------------------------------------------
# Spark integration (cogrouped applyInPandas — segments live on executors)
# ---------------------------------------------------------------------------

def empty_segments(spark) -> DataFrame:
    return spark.createDataFrame([], SEGMENT_SCHEMA)


def latest_segments(seg_log: DataFrame) -> DataFrame:
    """Resolve a log-structured segments table (SEGMENT_SCHEMA +
    ``batch_id``) to the newest segment per (partition_id, kind).

    The segments store is merge-on-read: each micro-batch appends only
    the partitions it TOUCHED (at 1024 partitions × ~12 MB, a full
    snapshot rewrite would be a ~12 GB write per batch).  Readers
    resolve the latest version with this tiny window (O(#partitions ×
    #dirs-since-compaction) rows of metadata + blobs)."""
    w = Window.partitionBy("partition_id", "kind").orderBy(
        F.col("batch_id").desc()
    )
    return (
        seg_log.withColumn("_v", F.row_number().over(w))
        .where(F.col("_v") == 1)
        .drop("_v", "batch_id")
    )


def _load_filters(seg_pdf: pd.DataFrame, params: SeenParams, job_id: str,
                  pid: int):
    bloom = cuckoo = None
    for _, row in seg_pdf.iterrows():
        if row["kind"] == "bloom":
            bloom = BlockedBloom.from_bytes(bytes(row["segment"]))
        elif row["kind"] == "cuckoo":
            cuckoo = CuckooFilter.from_bytes(bytes(row["segment"]))
    salt = params.salt(job_id, pid)
    if bloom is None:
        bloom = BlockedBloom(params.bloom_bits, salt)
    if cuckoo is None:
        cuckoo = CuckooFilter(params.cuckoo_buckets, salt)
    return bloom, cuckoo


def probe_seen(
    candidates: DataFrame,
    segments: DataFrame,
    params: SeenParams,
    job_id: str,
) -> DataFrame:
    """Tag candidate URLs with ``maybe_seen`` via the partitioned filters.

    candidates: must carry ``url_hash`` (binary).  Output adds
    ``partition_id int, maybe_seen boolean``.  No false negatives:
    maybe_seen=False ⇒ definitely new.
    """
    cand = candidates.withColumn(
        "partition_id", partition_col(F.col("url_hash"), params.n_partitions)
    )
    import pyspark.sql.types as T

    cols = [f.name for f in cand.schema.fields]
    out_schema = T.StructType(
        list(cand.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def _probe(key, cand_pdf: pd.DataFrame, seg_pdf: pd.DataFrame):
        pid = int(key[0])
        bloom, cuckoo = _load_filters(seg_pdf, params, job_id, pid)
        hashes = _as_matrix([bytes(h) for h in cand_pdf["url_hash"]])
        # bloom has no false negatives by construction; the cuckoo only
        # tightens the FP rate while healthy — once overflowed it could
        # produce false negatives (evicted entries), so it is ignored
        hit = bloom.contains(hashes)
        if not cuckoo.overflowed:
            hit &= cuckoo.contains(hashes)
        out = cand_pdf[cols].copy()
        out["maybe_seen"] = hit
        return out

    return (
        cand.groupBy("partition_id")
        .cogroup(segments.groupBy("partition_id"))
        .applyInPandas(_probe, schema=out_schema)
    )


def add_to_segments(
    new_urls: DataFrame,
    segments: DataFrame,
    params: SeenParams,
    job_id: str,
    touched_only: bool = False,
) -> DataFrame:
    """Fold newly-seen url_hashes into the filter segments.

    ``touched_only=False``: returns the FULL new segments table (all
    partitions, including untouched) — a snapshot write.
    ``touched_only=True``: returns ONLY the partitions that received
    new hashes — the merge-on-read append path (see latest_segments);
    the write per batch is O(touched partitions), not O(all)."""
    nu = new_urls.select(
        partition_col(F.col("url_hash"), params.n_partitions).alias("partition_id"),
        "url_hash",
    )
    if touched_only:
        touched = nu.select("partition_id").distinct()
        segments = segments.join(F.broadcast(touched), "partition_id", "semi")

    def _update(key, nu_pdf: pd.DataFrame, seg_pdf: pd.DataFrame):
        pid = int(key[0])
        bloom, cuckoo = _load_filters(seg_pdf, params, job_id, pid)
        hashes = _as_matrix([bytes(h) for h in nu_pdf["url_hash"]])
        bloom.add(hashes)
        cuckoo.add(hashes)
        return pd.DataFrame(
            {
                "partition_id": [pid, pid],
                "kind": ["bloom", "cuckoo"],
                "segment": [bloom.to_bytes(), cuckoo.to_bytes()],
            }
        )

    return (
        nu.groupBy("partition_id")
        .cogroup(segments.groupBy("partition_id"))
        .applyInPandas(_update, schema=SEGMENT_SCHEMA)
    )


def split_new_urls(
    candidates: DataFrame,
    segments: DataFrame,
    exact_seen: DataFrame,
    params: SeenParams,
    job_id: str,
) -> DataFrame:
    """The full J4 path: filter prefilter + exact rescue.

    Returns the candidates that are genuinely new (exact semantics).
    ``exact_seen``: (url_hash) table of all URLs ever enqueued.

    r5 shape (Arrow-bytes bound): the probe cogroup ships ONLY
    ``url_hash`` through the Python workers — never the full candidate
    rows (url/host/cost rode through at ~8× the bytes before), and the
    plan is single-pass: the old definitely-new ∪ rescued union
    referenced the probe subtree twice, so the cogroup kernel (and the
    whole extract lineage below the exchange) EXECUTED twice per
    batch.  Now:

      maybe      = probe(url_hash only)  — hits: FP ∪ true dups
      truly_seen = maybe ⋉ exact_seen    — exact members only
      new        = candidates ▷ truly_seen (anti)

    Exactness: the bloom has no false negatives, so maybe ⊇
    (candidates ∩ seen); truly_seen = candidates ∩ seen exactly; the
    anti-join removes exactly those.  ``truly_seen`` is batch-bounded
    (≤ |candidates|), so the final anti-join never shuffles more than
    the batch; only the semi-join scans the (growing) exact table —
    the unavoidable exact-membership check, at 16 B/row.
    """
    probed = probe_seen(
        candidates.select("url_hash"), segments, params, job_id
    )
    maybe = probed.where(F.col("maybe_seen")).select("url_hash")
    truly_seen = maybe.join(exact_seen.select("url_hash"), "url_hash", "semi")
    return candidates.join(truly_seen, "url_hash", "left_anti")
