"""Streaming CDC apply (streaming/cdc_apply.py): merge parity with the
batch operator, append-only copy-on-write granularity, time travel,
exactly-once batch tracking, compaction and vacuum."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.operators.cdc import merge_upsert
from bustub_vectordb_spark.streaming.cdc_apply import BUCKET_COL, StreamUpsertSink


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(i, "s", float(i)) for i in range(40)], "k bigint, st string, v double"
    )


def _apply(sink, spark, rows, batch_id=0):
    delta = spark.createDataFrame(rows, "k bigint, st string, v double")
    sink.process_batch(delta, batch_id)


def test_stream_state_matches_batch_merge(spark, base, tmp_path):
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=4)
    rows = [(3, "u", 99.0), (100, "n", 1.0)]
    _apply(sink, spark, rows)
    want = merge_upsert(
        base, spark.createDataFrame(rows, "k bigint, st string, v double"), ["k"]
    )
    got = sink.state_df()
    assert got.count() == 41
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_append_only_touched_buckets(spark, base, tmp_path):
    """A delta writes a new version dir containing ONLY the buckets its
    keys hash to; every v0 file stays byte-identical."""
    d = str(tmp_path / "st")
    sink = StreamUpsertSink(spark, base, "k", d, n_buckets=4)
    v0 = {f: os.stat(f).st_mtime_ns for f in glob.glob(f"{d}/v0/*/*.parquet")}
    _apply(sink, spark, [(5, "u", 0.0), (9, "u", 0.0)])
    assert {f: os.stat(f).st_mtime_ns for f in glob.glob(f"{d}/v0/*/*.parquet")} == v0
    want = sorted(
        {
            f"{BUCKET_COL}={r['b']}"
            for r in spark.createDataFrame([(5,), (9,)], "k bigint")
            .select(sink._bucket().alias("b"))
            .collect()
        }
    )
    new_buckets = sorted(os.path.basename(p) for p in glob.glob(f"{d}/v1/{BUCKET_COL}=*"))
    assert new_buckets == want
    assert len(new_buckets) <= 2 < sink.n_buckets  # a strict subset was touched
    got = {r["k"]: r["st"] for r in sink.state_df().collect()}
    assert got[5] == "u" and got[9] == "u" and got[4] == "s"


def test_time_travel_versions(spark, base, tmp_path):
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=4)
    _apply(sink, spark, [(7, "first", 1.0)], batch_id=0)
    _apply(sink, spark, [(7, "second", 2.0), (300, "n", 3.0)], batch_id=1)
    as_of = lambda v: {r["k"]: r["st"] for r in sink.state_df(version=v).collect()}
    assert as_of(0)[7] == "s" and 300 not in as_of(0)
    assert as_of(1)[7] == "first" and 300 not in as_of(1)
    assert as_of(2)[7] == "second" and as_of(2)[300] == "n"
    assert as_of(None) == as_of(2)


def test_replayed_batch_id_skipped(spark, base, tmp_path):
    """At-least-once redelivery: the manifest already records the batch_id,
    so the replay must not mint a new version."""
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=4)
    _apply(sink, spark, [(7, "u", 1.5)], batch_id=42)
    versions = [e["v"] for e in sink.versions]
    _apply(sink, spark, [(7, "u", 1.5)], batch_id=42)
    assert [e["v"] for e in sink.versions] == versions
    assert {r["k"]: r["st"] for r in sink.state_df().collect()}[7] == "u"


def test_resume_from_manifest(spark, base, tmp_path):
    d = str(tmp_path / "st")
    sink = StreamUpsertSink(spark, base, "k", d, n_buckets=4)
    _apply(sink, spark, [(11, "u", 1.0)], batch_id=0)
    resumed = StreamUpsertSink(spark, base.limit(0), "k", d, n_buckets=4)
    assert [e["v"] for e in resumed.versions] == [0, 1]
    assert {r["k"]: r["st"] for r in resumed.state_df().collect()}[11] == "u"


def test_compact_and_vacuum(spark, base, tmp_path):
    d = str(tmp_path / "st")
    sink = StreamUpsertSink(spark, base, "k", d, n_buckets=4)
    _apply(sink, spark, [(1, "a", 1.0)], batch_id=0)
    _apply(sink, spark, [(2, "b", 2.0)], batch_id=1)
    before = sorted(map(tuple, sink.state_df().collect()))
    v = sink.compact()
    assert sorted(map(tuple, sink.state_df().collect())) == before
    removed = sink.vacuum(retain_from=v)
    assert set(removed) == {0, 1, 2}
    assert not os.path.exists(f"{d}/v0") and os.path.exists(f"{d}/v{v}")
    assert sorted(map(tuple, sink.state_df().collect())) == before
    # time travel below the vacuum floor is gone
    with pytest.raises(Exception):
        sink.state_df(version=0).collect()


def test_later_batch_wins(spark, base, tmp_path):
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=4)
    _apply(sink, spark, [(11, "first", 1.0)], batch_id=0)
    _apply(sink, spark, [(11, "second", 2.0)], batch_id=1)
    got = {r["k"]: (r["st"], r["v"]) for r in sink.state_df().collect()}
    assert got[11] == ("second", 2.0)


def test_tombstone_batch_and_emptied_bucket(spark, tmp_path):
    """A change batch with an _op column deletes tombstoned keys; a bucket
    emptied entirely must read as EMPTY afterwards (the absent dir in the
    new version must not fall back to the older version's rows)."""
    base = spark.createDataFrame(
        [(1, "a"), (5, "b"), (2, "c")], "k bigint, st string"
    )  # buckets (4): 1 -> {1, 5}, 2 -> {2}
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=4)
    ch = spark.createDataFrame(
        [(1, None, "D"), (5, None, "D"), (2, "C", "U")],
        "k bigint, st string, _op string",
    )
    sink.process_batch(ch, 0)
    got = {r["k"]: r["st"] for r in sink.state_df().collect()}
    assert got == {2: "C"}
    # time travel still sees the pre-delete rows
    old = {r["k"]: r["st"] for r in sink.state_df(version=0).collect()}
    assert old == {1: "a", 5: "b", 2: "c"}


def test_resume_after_tombstones_keeps_schema(spark, tmp_path):
    base = spark.createDataFrame([(1, "a")], "k bigint, st string")
    d = str(tmp_path / "st")
    sink = StreamUpsertSink(spark, base, "k", d, n_buckets=2)
    sink.process_batch(
        spark.createDataFrame([(1, None, "D")], "k bigint, st string, _op string"), 0
    )
    resumed = StreamUpsertSink(spark, base.limit(0), "k", d, n_buckets=2)
    assert resumed.state_df().count() == 0
    assert [f.name for f in resumed.schema.fields] == ["k", "st"]


def test_resume_ignores_mismatched_n_buckets(spark, tmp_path):
    """n_buckets is part of the on-disk identity: a resume with a
    different constructor value must keep the manifest's (else keys route
    to the wrong dirs and duplicate on merge)."""
    base = spark.createDataFrame([(i, "s") for i in range(10)], "k bigint, st string")
    d = str(tmp_path / "st")
    StreamUpsertSink(spark, base, "k", d, n_buckets=4)
    resumed = StreamUpsertSink(spark, base.limit(0), "k", d, n_buckets=8)
    assert resumed.n_buckets == 4
    resumed.process_batch(
        spark.createDataFrame([(5, "u")], "k bigint, st string"), 0
    )
    got = sorted(map(tuple, resumed.state_df().collect()))
    assert got.count((5, "u")) == 1 and (5, "s") not in got


def test_vacuum_refuses_future_floor(spark, tmp_path):
    base = spark.createDataFrame([(1, "a")], "k bigint, st string")
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=2)
    with pytest.raises(ValueError, match="newest committed"):
        sink.vacuum(retain_from=99)
    assert sink.state_df().count() == 1  # nothing was dropped


def test_multi_key_sink(spark, tmp_path):
    """Composite keys bucket by xxhash64 over all key columns; merge and
    tombstones address the full key tuple."""
    base = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)],
        "k1 bigint, k2 string, v double",
    )
    sink = StreamUpsertSink(spark, base, ["k1", "k2"], str(tmp_path / "st"), n_buckets=4)
    ch = spark.createDataFrame(
        [(1, "a", 99.0, "U"), (2, "a", 0.0, "D"), (3, "c", 1.0, "U")],
        "k1 bigint, k2 string, v double, _op string",
    )
    sink.process_batch(ch, 0)
    got = {(r["k1"], r["k2"]): r["v"] for r in sink.state_df().collect()}
    assert got == {(1, "a"): 99.0, (1, "b"): 20.0, (3, "c"): 1.0}


def test_string_key_sink(spark, tmp_path):
    """A non-numeric STRING key must bucket correctly — the old long-cast
    bucketing yielded NULL buckets, landing the whole base under
    __HIVE_DEFAULT_PARTITION__ where _resolve never looks (silent
    full-table row loss; ADVICE r7)."""
    base = spark.createDataFrame(
        [("alice", 1.0), ("bob", 2.0), ("carol", 3.0)], "name string, v double"
    )
    d = str(tmp_path / "st")
    sink = StreamUpsertSink(spark, base, "name", d, n_buckets=4)
    assert sink.bucket_fn == "xxhash64"
    # every base row is visible (no NULL-bucket dir exists)
    assert sink.state_df().count() == 3
    assert not glob.glob(f"{d}/v0/*HIVE_DEFAULT*")
    sink.process_batch(
        spark.createDataFrame([("bob", 99.0), ("dave", 4.0)], "name string, v double"), 0
    )
    got = {r["name"]: r["v"] for r in sink.state_df().collect()}
    assert got == {"alice": 1.0, "bob": 99.0, "carol": 3.0, "dave": 4.0}


def test_vacuum_floor_blocks_partial_snapshots(spark, tmp_path):
    """After vacuum(retain_from=N), state_df(version<N) must raise even
    when SOME older dirs still resolve (e.g. the v0 base survives because
    newer versions reference its untouched buckets) — reading them would
    fabricate a snapshot that never existed (ADVICE r7)."""
    base = spark.createDataFrame(
        [(i, "s", float(i)) for i in range(40)], "k bigint, st string, v double"
    )
    d = str(tmp_path / "st")
    sink = StreamUpsertSink(spark, base, "k", d, n_buckets=4)
    _apply(sink, spark, [(1, "a", 1.0)], batch_id=0)   # v1: one bucket
    _apply(sink, spark, [(2, "b", 2.0)], batch_id=1)   # v2: one bucket
    removed = sink.vacuum(retain_from=2)
    # v0 must survive (v2's resolution still reads its untouched buckets)
    assert os.path.exists(f"{d}/v0") and sink.vacuum_floor == 2
    for v in (0, 1):
        with pytest.raises(ValueError, match="vacuum floor"):
            sink.state_df(version=v)
    # the floor survives a resume
    resumed = StreamUpsertSink(spark, base.limit(0), "k", d, n_buckets=4)
    assert resumed.vacuum_floor == 2
    with pytest.raises(ValueError, match="vacuum floor"):
        resumed.state_df(version=1)
    # at-or-above the floor still works (both deltas updated existing keys)
    assert resumed.state_df(version=2).count() == 40
    got = {r["k"]: r["st"] for r in resumed.state_df(version=2).collect()}
    assert got[1] == "a" and got[2] == "b" and got[3] == "s"


@pytest.mark.slow
def test_auto_compaction_bounds_files_and_versions(spark, tmp_path):
    """compact_every + auto_vacuum: over N batches the on-disk parquet
    file count and the resolver's version chain stay bounded (the Delta
    OPTIMIZE cadence), while contents keep matching the sequential merge
    fold and replay detection survives the vacuum (VERDICT r7 #6)."""
    base = spark.createDataFrame(
        [(i, "s", float(i)) for i in range(40)], "k bigint, st string, v double"
    )
    d = str(tmp_path / "st")
    sink = StreamUpsertSink(
        spark, base, "k", d, n_buckets=4, compact_every=3, auto_vacuum=True
    )
    import pyspark.sql as psql

    expect = {i: ("s", float(i)) for i in range(40)}
    max_files, max_versions = 0, 0
    for b in range(12):
        rows = [(b * 3 + j, f"b{b}", float(b)) for j in range(2)]
        for k, st, v in rows:
            expect[k] = (st, v)
        _apply(sink, spark, rows, batch_id=b)
        nfiles = len(glob.glob(f"{d}/v*/*/*.parquet"))
        max_files = max(max_files, nfiles)
        max_versions = max(max_versions, len(sink.versions))
    # chain: at most one full version + compact_every deltas (+1 in-flight)
    assert max_versions <= sink.compact_every + 2, max_versions
    # file bound: a full version is <= n_buckets dirs of files; deltas add
    # a handful each — well under the unbounded ~12-version accumulation
    assert max_files <= (sink.compact_every + 2) * 4 * 4, max_files
    got = {r["k"]: (r["st"], r["v"]) for r in sink.state_df().collect()}
    assert got == expect
    # replays of long-vacuumed batches are still recognized (watermark,
    # not version-entry membership)
    before = [e["v"] for e in sink.versions]
    _apply(sink, spark, [(0, "REPLAY", 0.0)], batch_id=0)
    assert [e["v"] for e in sink.versions] == before
    assert {r["k"]: r["st"] for r in sink.state_df().collect()}[0] != "REPLAY"
    # watermark survives a resume
    resumed = StreamUpsertSink(spark, base.limit(0), "k", d, n_buckets=4)
    assert resumed.max_batch_id == 11
