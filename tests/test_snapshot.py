"""Snapshot table format: isolation, time travel, copy-on-write merge
granularity, commit conflicts, vacuum (sources/snapshot.py — the
Delta/Iceberg-style manifest log over plain parquet)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_fiap_spark.sources import snapshot as S


def _orders(spark, sf_smoke):
    from aws_etl_fiap_spark.sources.readers import load_table

    return load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_create_and_read_roundtrip(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    assert S.create_table(spark, src, path, n_files=4) == 1
    assert S.current_version(spark, path) == 1
    assert _rows(S.read_table(spark, path)) == _rows(src)
    (h,) = S.history(spark, path)
    assert h["version"] == 1 and h["op"] == "create"
    assert len(h["files"]) == 4 and h["n_rows"] == src.count()


def test_upsert_semantics_and_time_travel(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=4)

    updates = (
        src.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
    )
    inserts = src.filter(F.col("o_orderkey") % 97 == 3).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000)
    )
    dels = src.filter(
        (F.col("o_orderkey") % 89 == 7) & (F.col("o_orderkey") % 13 != 0)
    ).select("o_orderkey")
    stats = S.upsert(
        spark, path, updates.unionByName(inserts), ["o_orderkey"], deletes=dels
    )
    assert stats["new_version"] == 2

    expect = (
        src.filter(F.col("o_orderkey") % 13 != 0)
        .join(dels, "o_orderkey", "left_anti")
        .unionByName(updates)
        .unionByName(inserts)
    )
    assert _rows(S.read_table(spark, path)) == _rows(expect)
    # time travel: version 1 still reads the original table
    assert _rows(S.read_table(spark, path, version=1)) == _rows(src)


def test_reader_pinned_before_commit_is_isolated(spark, sf_smoke, tmp_path):
    """The core ACID property: a reader that resolved its snapshot BEFORE a
    concurrent merge commits must collect the pre-merge table, however late
    the collect happens."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=4)

    pinned = S.read_table(spark, path)  # resolves the v1 manifest NOW
    updates = src.withColumn("o_totalprice", F.col("o_totalprice") + F.lit(9.0))
    S.upsert(spark, path, updates, ["o_orderkey"])
    assert S.current_version(spark, path) == 2

    assert _rows(pinned) == _rows(src)  # collected after the commit
    assert _rows(S.read_table(spark, path)) == _rows(updates)


def test_cow_rewrites_only_affected_files(spark, sf_smoke, tmp_path):
    """File-granular copy-on-write + manifest-stats pruning: with a
    range-clustered layout and footer stats in the manifest, a narrow-key
    batch PRUNES most files from the affected-file scan and rewrites a
    sliver — the pair of properties that makes merge affordable at
    100 TB."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    clustered = src.repartitionByRange(8, "o_orderkey")
    S.create_table(
        spark, clustered, path, n_files=None, stats_cols=["o_orderkey"]
    )
    assert all(
        "o_orderkey" in per
        for per in S._read_manifest(spark, path, 1)["stats"].values()
    )
    lo, hi = 1, int(src.agg(F.expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY o_orderkey)")).first()[0])
    updates = src.filter(F.col("o_orderkey").between(lo, hi)).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    stats = S.upsert(spark, path, updates, ["o_orderkey"])
    assert stats["rewritten_files"] <= 2, stats
    assert stats["carried_files"] >= 6, stats
    assert stats["pruned_files"] >= 6, stats  # skipped without scanning
    # and the merge is still correct
    expect = src.join(updates.select("o_orderkey"), "o_orderkey", "left_anti").unionByName(updates)
    assert _rows(S.read_table(spark, path)) == _rows(expect)
    # the merged version re-recorded stats for its new files: a SECOND
    # narrow merge still prunes
    again = S.upsert(
        spark, path,
        src.filter(F.col("o_orderkey").between(lo, hi)).withColumn(
            "o_totalprice", F.lit(1.0)
        ),
        ["o_orderkey"],
    )
    assert again["pruned_files"] >= 6, again


def test_scattered_batch_prunes_nothing_but_stays_correct(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(
        spark,
        src.repartitionByRange(8, "o_orderkey"),
        path,
        n_files=None,
        stats_cols=["o_orderkey"],
    )
    scattered = src.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    stats = S.upsert(spark, path, scattered, ["o_orderkey"])
    assert stats["pruned_files"] == 0, stats  # bounds span the whole table
    expect = src.join(
        scattered.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(scattered)
    assert _rows(S.read_table(spark, path)) == _rows(expect)


def test_commit_conflict_raises_and_leaves_winner_intact(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=2)
    # Loser transaction: resolves base=1 and stages its new files FIRST...
    m1 = S._read_manifest(spark, path, 1)
    loser_files, loser_rows = S._stage_files(
        spark, src.limit(10).withColumn("o_totalprice", F.lit(1.0)), path, 2, 1
    )
    # ...then a racing writer wins version 2 (carries v1's files forward).
    S._commit(spark, path, 2, m1["files"], m1["file_rows"], op="merge")
    with pytest.raises(S.CommitConflict):
        S._commit(spark, path, 2, loser_files, loser_rows, op="merge")
    # the winner's state is untouched; the loser's files are orphans
    assert S.current_version(spark, path) == 2
    assert _rows(S.read_table(spark, path)) == _rows(src)
    swept = S.vacuum(spark, path, keep_last=1, retain_seconds=0)
    assert swept["deleted_files"] > 0  # the lost transaction's orphans
    assert _rows(S.read_table(spark, path)) == _rows(src)


def test_vacuum_drops_history_keeps_latest(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=2)
    updates = src.withColumn("o_totalprice", F.col("o_totalprice") + F.lit(2.0))
    S.upsert(spark, path, updates, ["o_orderkey"])

    swept = S.vacuum(spark, path, keep_last=1, retain_seconds=0)
    assert swept["dropped_manifests"] == 1
    assert swept["deleted_files"] > 0
    assert _rows(S.read_table(spark, path)) == _rows(updates)
    with pytest.raises(FileNotFoundError):
        S._read_manifest(spark, path, 1)


def test_schema_evolution_additive_column(spark, sf_smoke, tmp_path):
    """Additive evolution through merge: new columns must be ASKED for
    (silent drop refused), evolved reads merge footers so un-rewritten
    files surface NULL, and time travel still reads the old schema."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src.repartitionByRange(4, "o_orderkey"), path, n_files=None)

    evolved = src.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_channel", F.lit("online")
    )
    with pytest.raises(ValueError, match="new columns"):
        S.upsert(spark, path, evolved, ["o_orderkey"])

    stats = S.upsert(
        spark, path, evolved, ["o_orderkey"], allow_new_columns=True
    )
    assert stats["new_version"] == 2
    cur = S.read_table(spark, path)
    assert "o_channel" in cur.columns
    got = {r["o_orderkey"]: r["o_channel"] for r in cur.collect()}
    for k, v in got.items():
        assert v == ("online" if k % 7 == 0 else None)
    # rows and untouched values intact
    assert cur.count() == src.count()
    # time travel: v1 still has the pre-evolution schema
    assert "o_channel" not in S.read_table(spark, path, version=1).columns


def test_compact_consolidates_small_files(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(
        spark,
        src.repartitionByRange(8, "o_orderkey"),
        path,
        n_files=None,
        stats_cols=["o_orderkey"],
    )
    # Three narrow merges litter small files (CoW adds files per commit).
    for lo in (1, 50, 100):
        S.upsert(
            spark, path,
            src.filter(F.col("o_orderkey").between(lo, lo + 30)).withColumn(
                "o_totalprice", F.lit(float(lo))
            ),
            ["o_orderkey"],
        )
    before = S._read_manifest(spark, path, S.current_version(spark, path))
    pre_rows = _rows(S.read_table(spark, path))

    stats = S.compact(spark, path, target_rows=10_000_000)  # everything small
    assert stats["compacted_files"] == len(before["files"])
    assert stats["new_files"] < len(before["files"])
    after = S._read_manifest(spark, path, stats["new_version"])
    assert after["op"] == "compact"
    assert after["n_rows"] == before["n_rows"]
    # values byte-identical; stats re-derived so merges keep pruning
    assert _rows(S.read_table(spark, path)) == pre_rows
    assert all("o_orderkey" in per for per in after["stats"].values())
    # the pre-compaction version is still time-travel readable
    assert _rows(S.read_table(spark, path, version=stats["new_version"] - 1)) == pre_rows


def test_merge_on_read_delete_rewrites_nothing(spark, sf_smoke, tmp_path):
    """Deletion vectors: a delete commits a position sidecar and touches
    ZERO data files; reads exclude the rows, time travel still sees them,
    and stats pruning bounds the position scan."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(
        spark,
        src.repartitionByRange(8, "o_orderkey"),
        path,
        n_files=None,
        stats_cols=["o_orderkey"],
    )
    m1 = S._read_manifest(spark, path, 1)
    doomed = src.filter(F.col("o_orderkey").between(1, 100)).select("o_orderkey")
    n_doomed = doomed.count()
    assert n_doomed > 0

    stats = S.delete(spark, path, doomed, ["o_orderkey"])
    assert stats["new_version"] == 2
    assert stats["pruned_files"] >= 6, stats  # narrow range, stats pruning
    m2 = S._read_manifest(spark, path, 2)
    assert m2["files"] == m1["files"]  # zero data files rewritten
    assert m2["n_deleted"] == n_doomed
    assert m2["n_rows"] == m1["n_rows"]  # physical rows unchanged

    live = S.read_table(spark, path)
    assert live.count() == src.count() - n_doomed
    assert live.filter(F.col("o_orderkey").between(1, 100)).count() == 0
    # time travel: v1 still sees every row
    assert S.read_table(spark, path, version=1).count() == src.count()

    # a second delete accumulates
    doomed2 = src.filter(F.col("o_orderkey").between(200, 260)).select("o_orderkey")
    S.delete(spark, path, doomed2, ["o_orderkey"])
    expect = src.join(
        doomed.unionByName(doomed2), "o_orderkey", "left_anti"
    )
    assert _rows(S.read_table(spark, path)) == _rows(expect)


def test_upsert_after_delete_respects_and_absorbs_dvs(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(
        spark,
        src.repartitionByRange(8, "o_orderkey"),
        path,
        n_files=None,
        stats_cols=["o_orderkey"],
    )
    doomed = src.filter(F.col("o_orderkey") % 11 == 0).select("o_orderkey")
    S.delete(spark, path, doomed, ["o_orderkey"])

    # update a disjoint key set: deleted rows must stay gone, including in
    # the files the merge rewrites (their DV positions are absorbed)
    updates = src.filter(F.col("o_orderkey") % 7 == 3).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    S.upsert(spark, path, updates, ["o_orderkey"])
    expect = (
        src.join(doomed, "o_orderkey", "left_anti")
        .join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(updates.join(doomed, "o_orderkey", "left_anti"))
    )
    # note: updates for deleted keys would RE-INSERT them (replace-by-key
    # semantics); the % 7 == 3 batch overlaps % 11 == 0, so carve those out
    reinserted = updates.join(doomed, "o_orderkey", "left_semi")
    expect = expect.unionByName(reinserted)
    assert _rows(S.read_table(spark, path)) == _rows(expect)


def test_compact_absorbs_deletion_vectors(spark, sf_smoke, tmp_path):
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=6)
    doomed = src.filter(F.col("o_orderkey") % 5 == 0).select("o_orderkey")
    S.delete(spark, path, doomed, ["o_orderkey"])
    live_before = _rows(S.read_table(spark, path))

    stats = S.compact(spark, path, target_rows=10_000_000)  # rewrite all
    m = S._read_manifest(spark, path, stats["new_version"])
    assert m["delete_files"] == []  # debt fully paid down
    assert m["n_deleted"] == 0
    assert m["n_rows"] == src.count() - doomed.count()  # physically gone
    assert _rows(S.read_table(spark, path)) == live_before

    swept = S.vacuum(spark, path, keep_last=1, retain_seconds=0)
    assert swept["deleted_files"] > 0  # old data files AND the DV sidecars
    assert _rows(S.read_table(spark, path)) == live_before


def test_dv_anti_join_is_broadcast(spark, sf_smoke, tmp_path):
    """Plan gate: the deletion-vector anti-join must BROADCAST the DV side
    (positions are delete-sized, never table-sized) — a shuffled anti-join
    here would tax every read of a 100 TB table with a full exchange."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=4)
    S.delete(
        spark, path,
        src.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey"),
        ["o_orderkey"],
    )
    plan = (
        S.read_table(spark, path)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_streaming_foreachbatch_commits_versions(spark, sf_smoke, tmp_path):
    """Integration: a real file-source readStream drives snapshot.upsert
    through foreachBatch — every micro-batch lands as an isolated
    versioned commit, a reader pinned mid-stream keeps its snapshot, and
    the final state equals the batch-computed merge.  This is the
    streaming-ingest + ACID-table composition an incremental 100 TB
    pipeline actually runs."""
    import os

    from pyspark.sql import functions as F

    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    S.create_table(spark, src.repartitionByRange(4, "o_orderkey"), path,
                   n_files=None, stats_cols=["o_orderkey"])
    pinned_v1 = S.read_table(spark, path)

    b0 = src.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(5.0)
    ).withColumn("seq", F.lit(0))
    b1 = src.filter(F.col("o_orderkey") % 4 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(11.0)
    ).withColumn("seq", F.lit(1))
    b0.coalesce(1).write.parquet(os.path.join(inbox, "seq=0_batch"))
    b1.coalesce(1).write.parquet(os.path.join(inbox, "seq=1_batch"))

    def merge_batch(batch_df, _batch_id):
        seqs = sorted(r["seq"] for r in batch_df.select("seq").distinct().collect())
        for s in seqs:
            S.upsert(
                spark, path,
                batch_df.filter(F.col("seq") == s).drop("seq"),
                ["o_orderkey"],
            )

    stream = spark.readStream.schema(b0.schema).parquet(os.path.join(inbox, "*"))
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # one commit per applied sub-batch, in seq order
    ops = [m["op"] for m in S.history(spark, path)]
    assert ops[0] == "create" and all(o == "merge" for o in ops[1:])
    assert S.current_version(spark, path) == 1 + 2

    expect = src.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 4 == 0, F.col("o_totalprice") + 11.0)
        .when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 5.0)
        .otherwise(F.col("o_totalprice")),
    )
    assert _rows(S.read_table(spark, path)) == _rows(expect)
    # the reader pinned before the stream started still sees v1
    assert _rows(pinned_v1) == _rows(src)


def test_model_based_random_op_sequences(spark, sf_smoke, tmp_path):
    """Model-based check of the whole table-format surface: a seeded
    random sequence of upsert / CoW-delete / MoR-delete / compact ops runs
    against BOTH the snapshot table and a plain dict model; after every
    commit the table must equal the model exactly, and at the end every
    surviving historical version must still time-travel to the state the
    model had at that commit.  One property run subsumes dozens of
    hand-written interaction cases (e.g. MoR delete followed by CoW merge
    of the same file, compact mid-history)."""
    import random

    rng = random.Random(20260814)
    src = _orders(spark, sf_smoke).filter(F.col("o_orderkey") <= 2000)
    rows = {r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
            for r in src.collect()}
    path = str(tmp_path / "snap")
    S.create_table(
        spark,
        src.repartitionByRange(4, "o_orderkey"),
        path,
        n_files=None,
        stats_cols=["o_orderkey"],
    )
    model = dict(rows)
    history_states = {1: dict(model)}

    def df_of(key_vals):
        return spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in key_vals],
            "o_orderkey bigint, o_orderstatus string, o_totalprice double",
        )

    all_keys = sorted(rows)
    for step in range(8):
        op = rng.choice(["upsert", "cow_delete", "mor_delete", "compact"])
        if op == "upsert":
            ks = rng.sample(all_keys, 40)
            ins = [k + 1_000_000 + step * 10_000 for k in rng.sample(all_keys, 5)]
            batch = [(k, (rows[k][0], round(rng.uniform(1, 9e4), 2))) for k in ks]
            batch += [(k, ("N", float(k % 997))) for k in ins]
            S.upsert(spark, path, df_of(batch), ["o_orderkey"])
            model.update(dict(batch))
        elif op == "cow_delete":
            ks = [k for k in rng.sample(all_keys, 30) if k in model]
            dels = spark.createDataFrame([(k,) for k in ks] or [(-1,)], "o_orderkey bigint")
            S.upsert(spark, path, df_of([]).limit(0), ["o_orderkey"], deletes=dels)
            for k in ks:
                model.pop(k, None)
        elif op == "mor_delete":
            ks = [k for k in rng.sample(all_keys, 30) if k in model]
            dels = spark.createDataFrame([(k,) for k in ks] or [(-1,)], "o_orderkey bigint")
            S.delete(spark, path, dels, ["o_orderkey"])
            for k in ks:
                model.pop(k, None)
        else:
            S.compact(spark, path, target_rows=rng.choice([200, 10_000_000]))
        v = S.current_version(spark, path)
        history_states[v] = dict(model)
        got = {
            r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
            for r in S.read_table(spark, path).collect()
        }
        assert got == model, f"divergence after step {step} ({op}) at v{v}"

    # every historical version still time-travels to its exact state
    for v, state in history_states.items():
        got = {
            r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
            for r in S.read_table(spark, path, version=v).collect()
        }
        assert got == state, f"time travel to v{v} diverged"


def test_table_changes_cdf(spark, sf_smoke, tmp_path):
    """Change data feed: the v1->v2 diff of a CoW merge yields exactly the
    inserted/updated/deleted keys, reads ONLY removed+added files (carried
    files pruned — checked via inputFiles), compaction diffs to empty, and
    the MoR-delete fallback still classifies correctly."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(
        spark,
        src.repartitionByRange(8, "o_orderkey"),
        path,
        n_files=None,
        stats_cols=["o_orderkey"],
    )
    lo, hi = 1, 120
    upd = src.filter(F.col("o_orderkey").between(lo, hi)).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )
    ins = src.limit(3).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(9_000_000))
    dels = src.filter(
        F.col("o_orderkey").between(200, 240)
    ).select("o_orderkey")
    S.upsert(spark, path, upd.unionByName(ins), ["o_orderkey"], deletes=dels)

    cdf = S.table_changes(spark, path, 1, 2, ["o_orderkey"])
    got = {r["o_orderkey"]: r["change_type"] for r in cdf.collect()}
    exp_upd = {r["o_orderkey"] for r in upd.collect()}
    exp_ins = {r["o_orderkey"] for r in ins.collect()}
    exp_del = {r["o_orderkey"] for r in dels.collect()}
    assert {k for k, v in got.items() if v == "updated"} == exp_upd
    assert {k for k, v in got.items() if v == "inserted"} == exp_ins
    assert {k for k, v in got.items() if v == "deleted"} == exp_del

    # file pruning: the diff plan touches only removed+added files
    m1, m2 = S._read_manifest(spark, path, 1), S._read_manifest(spark, path, 2)
    changed = (set(m1["files"]) ^ set(m2["files"]))
    touched = {f.rsplit("/", 1)[-1] for f in cdf.inputFiles()}
    assert touched <= changed, (touched, changed)
    assert len(changed) < len(m2["files"]), "test needs carried files"

    # compaction changes the layout, not the data: CDF must be empty
    S.compact(spark, path, target_rows=10_000_000)
    assert S.table_changes(spark, path, 2, 3, ["o_orderkey"]).count() == 0

    # merge-on-read delete -> DV sets differ -> full-snapshot fallback
    mor = src.filter(F.col("o_orderkey").between(300, 330)).select("o_orderkey")
    S.delete(spark, path, mor, ["o_orderkey"])
    cdf2 = S.table_changes(spark, path, 3, 4, ["o_orderkey"])
    got2 = {r["o_orderkey"]: r["change_type"] for r in cdf2.collect()}
    assert got2 == {
        r["o_orderkey"]: "deleted" for r in mor.collect()
    }


def test_vacuum_retention_spares_recent_orphans(spark, sf_smoke, tmp_path):
    """The concurrent-writer safety window (round-7 ADVICE): an in-flight
    transaction stages data files before its manifest commit, so a vacuum
    with the default retention must NOT delete fresh unreferenced files —
    the in-flight commit then lands intact.  retain_seconds=0 (single-
    writer maintenance) still sweeps them."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=2)

    # Simulate an in-flight writer: files staged+renamed into data/, no
    # manifest yet (exactly the state between _stage_files and _commit).
    inflight_files, inflight_rows = S._stage_files(
        spark, src.limit(7).withColumn("o_totalprice", F.lit(42.0)), path, 2, 1
    )

    swept = S.vacuum(spark, path, keep_last=1)  # default 7-day window
    assert swept["deleted_files"] == 0
    assert swept["retained_recent_files"] >= len(inflight_files), swept

    # the in-flight transaction commits successfully after the vacuum
    m1 = S._read_manifest(spark, path, 1)
    carried = [f for f in m1["files"]]
    S._commit(
        spark, path, 2, carried + inflight_files,
        {**m1["file_rows"], **inflight_rows}, op="merge",
    )
    assert S.read_table(spark, path).count() == src.count() + 7

    # and a zero-window vacuum still removes true orphans
    orphans, _ = S._stage_files(spark, src.limit(3), path, 3, 1)
    swept0 = S.vacuum(spark, path, keep_last=1, retain_seconds=0)
    assert swept0["deleted_files"] >= len(orphans)


def test_table_changes_spans_schema_evolution(spark, sf_smoke, tmp_path):
    """CDF across an additive-evolution commit (round-7 ADVICE): default
    compare_cols derive from the NEW snapshot, whose added column the old
    generation's files lack — the old side must NULL-pad it, classify the
    touched keys as updated, and not raise an unresolved-column error."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(
        spark, src.repartitionByRange(6, "o_orderkey"), path,
        n_files=None, stats_cols=["o_orderkey"],
    )
    evolved = src.filter(F.col("o_orderkey").between(1, 90)).withColumn(
        "o_channel", F.lit("online")
    )
    S.upsert(spark, path, evolved, ["o_orderkey"], allow_new_columns=True)

    cdf = S.table_changes(spark, path, 1, 2, ["o_orderkey"])
    got = {r["o_orderkey"]: r["change_type"] for r in cdf.collect()}
    exp = {r["o_orderkey"] for r in evolved.collect()}
    # every touched key gained a non-null o_channel -> updated; nothing else
    assert {k for k, v in got.items() if v == "updated"} == exp
    assert set(got.values()) <= {"updated"}

    # explicit compare_cols absent from both versions fail loudly
    with pytest.raises(KeyError, match="absent"):
        S.table_changes(
            spark, path, 1, 2, ["o_orderkey"], compare_cols=["nope"]
        ).collect()


def test_upsert_with_retry_recomputes_against_new_base(spark, sf_smoke, tmp_path, monkeypatch):
    """OCC client loop: when a racing writer wins the version mid-commit,
    the retry must RECOMPUTE the merge on the new base — the final state
    holds BOTH writers' changes (a stale re-commit would drop the
    winner's)."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=2)

    winner = src.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.lit(111.0)
    )
    real_commit = S._commit
    state = {"raced": False}

    def racing_commit(spark_, path_, version, files, file_rows, op, **kw):
        if not state["raced"] and op == "merge":
            state["raced"] = True
            # the racing writer lands the SAME version number first
            S.upsert(spark_, path_, winner, ["o_orderkey"])
        return real_commit(spark_, path_, version, files, file_rows, op, **kw)

    monkeypatch.setattr(S, "_commit", racing_commit)
    loser = src.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.lit(222.0)
    )
    out = S.upsert_with_retry(spark, path, loser, ["o_orderkey"])
    assert out["attempts"] == 2 and state["raced"]
    monkeypatch.setattr(S, "_commit", real_commit)

    got = {r["o_orderkey"]: r["o_totalprice"] for r in S.read_table(spark, path).collect()}
    for r in src.collect():
        k = r["o_orderkey"]
        if k % 7 == 0:
            assert got[k] == 222.0  # loser retried on the new base
        elif k % 5 == 0:
            assert got[k] == 111.0  # winner's changes survived
        else:
            assert got[k] == r["o_totalprice"]


def test_inflight_temp_manifest_is_never_a_version(spark, sf_smoke, tmp_path):
    """A half-written temp manifest (crashed or in-flight commit) must be
    invisible to version listing and reads — suffix-matching the manifest
    pattern would let a reader resolve an incomplete file."""
    import os

    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=2)
    sdir = os.path.join(path, "_snapshots")
    # simulate a crashed commit: partial garbage under a temp name
    with open(os.path.join(sdir, "_tmp_v00000002_deadbeef.json"), "w") as fh:
        fh.write('{"version": 2, "files": [')  # truncated JSON
    assert S.current_version(spark, path) == 1
    assert _rows(S.read_table(spark, path)) == _rows(src)
    # and the next real commit still lands as version 2
    S.upsert(spark, path, src.limit(5).withColumn("o_totalprice", F.lit(1.0)),
             ["o_orderkey"])
    assert S.current_version(spark, path) == 2


def test_insert_only_batch_still_enforces_schema(spark, sf_smoke, tmp_path):
    """An insert-only batch (no matching keys, so no file rewrites) with
    new columns must be refused/flagged exactly like the rewrite path —
    otherwise the new files silently fork the table schema."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=2)
    ins = src.limit(4).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(5_000_000)
    ).withColumn("o_channel", F.lit("online"))
    with pytest.raises(ValueError, match="new columns"):
        S.upsert(spark, path, ins, ["o_orderkey"])
    S.upsert(spark, path, ins, ["o_orderkey"], allow_new_columns=True)
    assert S._read_manifest(spark, path, 2)["merge_schema"] is True
    cur = S.read_table(spark, path)
    got = {r["o_orderkey"]: r["o_channel"] for r in cur.collect()}
    assert sum(v == "online" for v in got.values()) == 4
    assert cur.count() == src.count() + 4


def _orders_dated(spark, sf_smoke):
    from aws_etl_fiap_spark.sources.readers import load_table

    return load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


def test_hidden_partition_month_prunes_files(spark, sf_smoke, tmp_path):
    path = str(tmp_path / "snap")
    src = _orders_dated(spark, sf_smoke)
    S.append_partitioned(spark, src, path, "month", "o_orderdate")
    man = S._read_manifest(spark, path, 1)
    n_months = len({p["value"] for p in man["partitions"].values()})
    assert len(man["files"]) >= n_months > 3

    pruned = S.read_table_pruned(
        spark, path, "o_orderdate", "1995-01-01", "1995-03-31"
    )
    # metadata-level pruning: the scan plan holds only Q1-1995 files
    scanned = [
        f for f in pruned.inputFiles() if f.split("/")[-1] in man["files"]
    ]
    expect = {
        n for n, p in man["partitions"].items()
        if "1995-01" <= p["value"] <= "1995-03"
    }
    assert {f.split("/")[-1] for f in scanned} == expect
    assert len(expect) < len(man["files"])
    # scan + residual predicate == direct filter on the source
    got = pruned.filter(
        F.col("o_orderdate").between("1995-01-01", "1995-03-31 23:59:59")
    ).count()
    want = src.filter(
        F.col("o_orderdate").between("1995-01-01", "1995-03-31 23:59:59")
    ).count()
    assert got == want > 0


def test_hidden_partition_bucket_equality_prunes_to_one_bucket(
    spark, sf_smoke, tmp_path
):
    path = str(tmp_path / "snap")
    src = _orders_dated(spark, sf_smoke)
    S.append_partitioned(spark, src, path, "bucket", "o_orderkey", arg=8)
    man = S._read_manifest(spark, path, 1)
    assert len({p["value"] for p in man["partitions"].values()}) == 8

    key = src.select("o_orderkey").first()["o_orderkey"]
    pruned = S.read_table_pruned(spark, path, "o_orderkey", key)
    scanned = {f.split("/")[-1] for f in pruned.inputFiles()}
    assert len({man["partitions"][n]["value"] for n in scanned}) == 1
    rows = pruned.filter(F.col("o_orderkey") == key).count()
    assert rows == src.filter(F.col("o_orderkey") == key).count() == 1


def test_partition_spec_evolution_prunes_per_file(spark, sf_smoke, tmp_path):
    path = str(tmp_path / "snap")
    src = _orders_dated(spark, sf_smoke)
    old = src.filter(F.col("o_orderdate") < "1997-01-01")
    new = src.filter(F.col("o_orderdate") >= "1997-01-01")
    S.append_partitioned(spark, old, path, "month", "o_orderdate")
    # spec evolves: later commits partition DAILY on the same column
    S.append_partitioned(spark, new, path, "day", "o_orderdate")
    man = S._read_manifest(spark, path, 2)
    transforms = {p["transform"] for p in man["partitions"].values()}
    assert transforms == {"month", "day"}

    # a range spanning the boundary prunes month-files by month and
    # day-files by day, and the union equals the source filter
    pruned = S.read_table_pruned(
        spark, path, "o_orderdate", "1996-12-01", "1997-01-15"
    )
    got = pruned.filter(
        F.col("o_orderdate").between("1996-12-01", "1997-01-15 23:59:59")
    ).count()
    want = src.filter(
        F.col("o_orderdate").between("1996-12-01", "1997-01-15 23:59:59")
    ).count()
    assert got == want > 0
    scanned = {f.split("/")[-1] for f in pruned.inputFiles()}
    by_t = {"month": set(), "day": set()}
    for n in scanned:
        p = man["partitions"][n]
        by_t[p["transform"]].add(p["value"])
    assert by_t["month"] <= {"1996-12", "1997-01"}
    assert all(v.startswith("1997-01-0") or v == "1997-01-15" or
               v.startswith("1997-01-1") for v in by_t["day"])


def test_pruning_keeps_files_without_partition_record(spark, sf_smoke, tmp_path):
    path = str(tmp_path / "snap")
    src = _orders_dated(spark, sf_smoke)
    # v1: UN-partitioned create (no partition records at all)
    S.create_table(spark, src.filter(F.col("o_orderkey") % 2 == 0), path, n_files=2)
    # v2: partitioned append of the other half
    S.append_partitioned(
        spark, src.filter(F.col("o_orderkey") % 2 == 1), path,
        "month", "o_orderdate",
    )
    pruned = S.read_table_pruned(
        spark, path, "o_orderdate", "1995-01-01", "1995-01-31"
    )
    got = pruned.filter(
        F.col("o_orderdate").between("1995-01-01", "1995-01-31 23:59:59")
    ).count()
    want = src.filter(
        F.col("o_orderdate").between("1995-01-01", "1995-01-31 23:59:59")
    ).count()
    # the un-recorded v1 files are always scanned (never guessed away)
    man = S._read_manifest(spark, path, 2)
    scanned = {f.split("/")[-1] for f in pruned.inputFiles()}
    v1_files = {n for n in man["files"] if n not in man["partitions"]}
    assert v1_files <= scanned
    assert got == want > 0


def test_pruned_read_empty_range_returns_schema_and_zero_rows(
    spark, sf_smoke, tmp_path
):
    path = str(tmp_path / "snap")
    src = _orders_dated(spark, sf_smoke)
    S.append_partitioned(spark, src, path, "month", "o_orderdate")
    out = S.read_table_pruned(
        spark, path, "o_orderdate", "1901-01-01", "1901-12-31"
    )
    assert out.count() == 0
    assert set(out.columns) == set(src.columns)


def test_identity_pruning_numeric_is_typed_not_lexicographic(
    spark, sf_smoke, tmp_path
):
    """Round-8 advice: identity range pruning compared partition values as
    STRINGS, and '9' > '10' lexicographically — a [9, 100] predicate on an
    int partition column silently dropped the 10..100 files.  The compare
    must go through the file record's coltype."""
    path = str(tmp_path / "snap")
    src = spark.range(0, 300).select(
        (F.col("id") % F.lit(3) * F.lit(91) + F.lit(9))
        .cast("int")
        .alias("bucket_id"),  # values 9, 100, 191
        F.col("id").alias("payload"),
    )
    S.append_partitioned(spark, src, path, "identity", "bucket_id")
    man = S._read_manifest(spark, path, 1)
    vals = {p["value"] for p in man["partitions"].values()}
    assert vals == {"9", "100", "191"}

    pruned = S.read_table_pruned(spark, path, "bucket_id", 9, 100)
    scanned_vals = {
        man["partitions"][f.split("/")[-1]]["value"]
        for f in pruned.inputFiles()
    }
    # lexicographic would keep only {'9'} ('100' < '9'); typed keeps both
    # overlapping partitions and still prunes the provably-disjoint 191.
    assert scanned_vals == {"9", "100"}
    got = pruned.filter(F.col("bucket_id").between(9, 100)).count()
    want = src.filter(F.col("bucket_id").between(9, 100)).count()
    assert got == want == 200

    # equality point-lookup on a numeric identity partition, same contract
    point = S.read_table_pruned(spark, path, "bucket_id", 100)
    assert {
        man["partitions"][f.split("/")[-1]]["value"]
        for f in point.inputFiles()
    } == {"100"}


def test_identity_may_overlap_keeps_on_doubt():
    """Pruning may only drop PROVABLY-disjoint files: unknown coltype
    (pre-coltype manifests, timestamps) or unparseable values keep."""
    ok = S._identity_may_overlap
    assert ok("int", "10", 9, 100) is True
    assert ok("int", "191", 9, 100) is False
    assert ok("bigint", "9", 9, 100) is True
    assert ok("double", "10.5", 9.0, 100.0) is True
    assert ok("decimal(10,2)", "150.00", 9, 100) is False
    assert ok("string", "banana", "apple", "cherry") is True
    assert ok("date", "1995-02-01", "1995-01-01", "1995-03-31") is True
    assert ok("date", "1996-02-01", "1995-01-01", "1995-03-31") is False
    # doubt => keep
    assert ok(None, "10", 9, 100) is True          # pre-coltype manifest
    assert ok("timestamp", "whatever", 9, 100) is True  # no provable order
    assert ok("int", "not-a-number", 9, 100) is True    # unparseable value
    assert ok("int", "10", "x", "y") is True            # unparseable bound


def test_maintenance_commits_carry_partition_records(spark, sf_smoke, tmp_path):
    """Late-r9 review: upsert/delete/compact committed without the
    manifest 'partitions' key, permanently disabling hidden-partition
    pruning for every carried file after ONE maintenance commit."""
    path = str(tmp_path / "snap")
    src = _orders(spark, sf_smoke).withColumn(
        "o_orderdate", F.to_date(F.lit("1995-03-15"))
    ).limit(40).union(
        _orders(spark, sf_smoke).withColumn(
            "o_orderdate", F.to_date(F.lit("1997-08-02"))
        ).limit(40)
    )
    S.append_partitioned(spark, src, path, "month", "o_orderdate")
    assert S._read_manifest(spark, path, 1).get("partitions")

    # merge-on-read delete: data files unchanged -> ALL records carry
    some = src.limit(3).select("o_orderkey")
    S.delete(spark, path, some, ["o_orderkey"])
    m2 = S._read_manifest(spark, path, 2)
    assert m2.get("partitions") == S._read_manifest(spark, path, 1).get(
        "partitions"
    )

    # CoW upsert: carried files keep their records, rewritten files drop out
    batch = src.limit(1).withColumn("o_totalprice", F.lit(1.0))
    S.upsert(spark, path, batch, ["o_orderkey"])
    m3 = S._read_manifest(spark, path, 3)
    carried_with_rec = [n for n in m3["files"] if n in (m3.get("partitions") or {})]
    assert carried_with_rec, "carried files lost their partition records"
    # and pruning still works after the maintenance commits
    pruned = S.read_table_pruned(spark, path, "o_orderdate", "1995-01-01", "1995-12-31")
    got = {r["o_orderdate"].isoformat() for r in pruned.select("o_orderdate").distinct().collect()}
    assert got == {"1995-03-15"}


def test_append_partitioned_enforces_schema_contract(spark, sf_smoke, tmp_path):
    """Late-r9 review: an append with extra or missing columns silently
    forked the table schema (mergeSchema-off reads then resolve from ONE
    arbitrary footer).  Extra columns need allow_new_columns; missing
    columns always refuse."""
    path = str(tmp_path / "snap")
    src = _orders(spark, sf_smoke).withColumn(
        "o_orderdate", F.to_date(F.lit("1995-03-15"))
    ).limit(20)
    S.append_partitioned(spark, src, path, "month", "o_orderdate")

    with pytest.raises(ValueError, match="new columns"):
        S.append_partitioned(
            spark, src.withColumn("channel", F.lit("web")), path,
            "month", "o_orderdate",
        )
    with pytest.raises(ValueError, match="missing table columns"):
        S.append_partitioned(
            spark, src.drop("o_totalprice"), path, "month", "o_orderdate"
        )

    S.append_partitioned(
        spark, src.withColumn("channel", F.lit("web")), path,
        "month", "o_orderdate", allow_new_columns=True,
    )
    m = S._read_manifest(spark, path, 2)
    assert m["merge_schema"] is True
    assert "channel" in S.read_table(spark, path).columns


def test_insert_only_upsert_refuses_missing_columns(spark, sf_smoke, tmp_path):
    """Late-r9 review: the insert-only path checked extra columns but not
    missing ones, silently writing narrower-schema files."""
    path = str(tmp_path / "snap")
    S.create_table(spark, _orders(spark, sf_smoke).limit(20), path, n_files=2)
    narrow = spark.createDataFrame([(10**9,)], "o_orderkey long")
    with pytest.raises(ValueError, match="missing table columns"):
        S.upsert(spark, path, narrow, ["o_orderkey"])


def test_append_to_stats_tracked_table_keeps_pruning_enabled(
    spark, sf_smoke, tmp_path
):
    """Late-r9 review: append_partitioned landed stat-less files on a
    stats-tracked table, failing _prune_by_stats' all-files check and
    disabling merge pruning forever."""
    path = str(tmp_path / "snap")
    src = _orders(spark, sf_smoke).withColumn(
        "o_orderdate", F.to_date(F.lit("1995-03-15"))
    ).limit(30)
    S.create_table(
        spark,
        src.repartitionByRange(2, "o_orderkey"),
        path, n_files=None, stats_cols=["o_orderkey"],
    )
    S.append_partitioned(spark, src, path, "month", "o_orderdate")
    m = S._read_manifest(spark, path, 2)
    assert all("o_orderkey" in m["stats"].get(n, {}) for n in m["files"]), (
        "appended files lack footer stats — merge pruning would be disabled"
    )


def test_compact_tolerates_missing_row_counts(spark, sf_smoke, tmp_path):
    """Late-r9 review: compact selected stat-less files via .get but then
    summed with file_rows[n] — KeyError on legacy/external manifests."""
    import json

    path = str(tmp_path / "snap")
    S.create_table(spark, _orders(spark, sf_smoke).limit(30), path, n_files=3)
    mf_path = tmp_path / "snap" / "_snapshots" / "v00000001.json"
    m = json.loads(mf_path.read_text())
    dropped = m["files"][0]
    del m["file_rows"][dropped]  # legacy manifest: one entry lost its count
    mf_path.write_text(json.dumps(m))
    (mf_path.parent / f".{mf_path.name}.crc").unlink(missing_ok=True)
    out = S.compact(spark, path, target_rows=10**9)
    assert out["compacted_files"] == 3
    assert S.read_table(spark, path).count() == 30


def test_bucket_pruning_keeps_file_without_coltype(spark, sf_smoke, tmp_path):
    """Late-r9 review: a pre-coltype manifest made bucket pruning hash an
    uncast literal (width-sensitive xxhash64 -> wrong bucket -> live file
    silently pruned).  No provable type => keep the file."""
    import json

    path = str(tmp_path / "snap")
    src = _orders(spark, sf_smoke).limit(40)
    S.append_partitioned(spark, src, path, "bucket", "o_orderkey", arg=8)
    mf_path = tmp_path / "snap" / "_snapshots" / "v00000001.json"
    m = json.loads(mf_path.read_text())
    for rec in m["partitions"].values():
        rec.pop("coltype", None)  # simulate a pre-coltype manifest
    mf_path.write_text(json.dumps(m))
    (mf_path.parent / f".{mf_path.name}.crc").unlink(missing_ok=True)

    key = src.first()["o_orderkey"]
    pruned = S.read_table_pruned(spark, path, "o_orderkey", key)
    # with no provable type nothing may prune...
    m2 = S._read_manifest(spark, path, 1)
    assert pruned.filter(F.col("o_orderkey") == key).count() == src.filter(
        F.col("o_orderkey") == key
    ).count()
    # ...and the scan must keep EVERY file (doubt-policy), which we can see
    # from the input files of the plan
    assert pruned.inputFiles() and len(pruned.inputFiles()) == len(m2["files"])


def test_changed_sides_empty_side_sees_evolved_schema(spark, sf_smoke, tmp_path):
    """Late-r9 review: the empty-side schema probe read files[:1], which
    under merge_schema can predate an added column — a pure-append diff
    then failed to resolve the new column on the old side."""
    path = str(tmp_path / "snap")
    base = _orders(spark, sf_smoke).limit(20)
    S.create_table(spark, base, path, n_files=2)
    evolved = spark.createDataFrame(
        [(10**9, "O", 1.0, "web")],
        "o_orderkey long, o_orderstatus string, o_totalprice double, channel string",
    )
    S.upsert(spark, path, evolved, ["o_orderkey"], allow_new_columns=True)
    # v2 -> v3: pure append (no file removed), so old_side is the empty probe
    more = spark.createDataFrame(
        [(10**9 + 1, "O", 2.0, "app")],
        "o_orderkey long, o_orderstatus string, o_totalprice double, channel string",
    )
    S.upsert(spark, path, more, ["o_orderkey"])
    old_side, new_side = S.changed_sides(spark, path, 2, 3)
    assert "channel" in old_side.columns  # files[:1] probe would miss it
    out = S.table_changes(spark, path, 2, 3, ["o_orderkey"])
    got = {(r["o_orderkey"], r["change_type"]) for r in out.collect()}
    assert (10**9 + 1, "inserted") in got


def test_vacuum_sweeps_crashed_writer_orphans(spark, sf_smoke, tmp_path):
    """Late-r9 review: vacuum never removed abandoned _tmp_v* manifests or
    _staging_* directories, so crashed writers leaked them forever.  Old
    orphans sweep; young ones (possible in-flight writers) are retained."""
    import os

    path = str(tmp_path / "snap")
    S.create_table(spark, _orders(spark, sf_smoke).limit(10), path, n_files=1)
    snap_dir = tmp_path / "snap" / "_snapshots"
    stale_tmp = snap_dir / "_tmp_v00000002_deadbeef.json"
    stale_tmp.write_text("{}")
    stale_stage = tmp_path / "snap" / "_staging_v00000002_deadbeef"
    stale_stage.mkdir()
    (stale_stage / "part-0.parquet").write_bytes(b"x")
    old = 1_000_000_000  # epoch 2001 — far past any retention window
    os.utime(stale_tmp, (old, old))
    os.utime(stale_stage, (old, old))
    # r10: the sweep keys on FILE mtimes (dir mtimes are synthetic on
    # object stores) — "stale" means every file inside is old too.
    os.utime(stale_stage / "part-0.parquet", (old, old))
    fresh_tmp = snap_dir / "_tmp_v00000003_cafebabe.json"
    fresh_tmp.write_text("{}")

    out = S.vacuum(spark, path, keep_last=1, retain_seconds=3600)
    assert out["swept_tmp_manifests"] == 1 and out["swept_staging_dirs"] == 1
    assert not stale_tmp.exists() and not stale_stage.exists()
    assert fresh_tmp.exists()  # young: possibly an in-flight writer
    # and the table is untouched
    assert S.read_table(spark, path).count() == 10


def test_vacuum_staging_liveness_keys_on_file_mtimes(spark, sf_smoke, tmp_path):
    """r9 ADVICE item 3: a slow in-flight writer's staging dir must survive
    the sweep even where directory mtimes are synthetic/stale (object
    stores).  Liveness = the start-of-write .heartbeat marker OR the newest
    file inside; the dir's own mtime alone must not condemn it."""
    import os

    path = str(tmp_path / "snap")
    S.create_table(spark, _orders(spark, sf_smoke).limit(10), path, n_files=1)

    old = 1_000_000_000  # epoch 2001
    # In-flight writer: dir mtime ancient (synthetic), heartbeat fresh,
    # no part files landed yet — the exact mid-write window the advice
    # flagged.  Must be retained.
    live = tmp_path / "snap" / "_staging_v00000002_aaaaaaaa"
    live.mkdir()
    (tmp_path / "snap" / "_staging_v00000002_aaaaaaaa.heartbeat").touch()
    os.utime(live, (old, old))

    # Second in-flight shape: ancient dir mtime AND ancient heartbeat, but
    # a part file landed recently (long-running multi-task write).  Must
    # also be retained.
    live2 = tmp_path / "snap" / "_staging_v00000003_bbbbbbbb"
    live2.mkdir()
    beat2 = tmp_path / "snap" / "_staging_v00000003_bbbbbbbb.heartbeat"
    beat2.touch()
    (live2 / "part-0.parquet").write_bytes(b"x")
    os.utime(live2, (old, old))
    os.utime(beat2, (old, old))

    out = S.vacuum(spark, path, keep_last=1, retain_seconds=3600)
    assert out["swept_staging_dirs"] == 0
    assert live.exists() and live2.exists()

    # Once everything inside is old too, the crashed writer sweeps —
    # including its heartbeat marker.
    os.utime(live2 / "part-0.parquet", (old, old))
    beat1 = tmp_path / "snap" / "_staging_v00000002_aaaaaaaa.heartbeat"
    os.utime(beat1, (old, old))
    out2 = S.vacuum(spark, path, keep_last=1, retain_seconds=3600)
    assert out2["swept_staging_dirs"] == 2
    assert not live.exists() and not live2.exists()
    assert not beat1.exists() and not beat2.exists()


def test_vacuum_sweeps_orphan_heartbeats(spark, sf_smoke, tmp_path):
    """A writer crashing between the heartbeat touch and the Spark write
    leaves a heartbeat with no staging dir; old ones must sweep, young
    ones are retained (the write may be about to start)."""
    import os

    path = str(tmp_path / "snap")
    S.create_table(spark, _orders(spark, sf_smoke).limit(10), path, n_files=1)
    old_beat = tmp_path / "snap" / "_staging_v00000009_dddddddd.heartbeat"
    old_beat.touch()
    os.utime(old_beat, (1_000_000_000, 1_000_000_000))
    young_beat = tmp_path / "snap" / "_staging_v00000009_eeeeeeee.heartbeat"
    young_beat.touch()

    S.vacuum(spark, path, keep_last=1, retain_seconds=3600)
    assert not old_beat.exists()
    assert young_beat.exists()


def test_writers_leave_no_staging_or_heartbeat(spark, sf_smoke, tmp_path):
    """Every staging site (plain, partitioned, DV) cleans up both the
    staging dir and its heartbeat on success."""
    import os

    src = _orders(spark, sf_smoke).limit(50)
    path = str(tmp_path / "snap")
    S.create_table(spark, src, path, n_files=2)
    S.append_partitioned(
        spark,
        src.limit(10).withColumn("o_orderkey", F.col("o_orderkey") + 10**9),
        path, "bucket", "o_orderkey", 4,
    )
    S.delete(
        spark, path, src.limit(5).select("o_orderkey"), ["o_orderkey"]
    )
    leftovers = [
        n for n in os.listdir(path) if n.startswith("_staging_")
    ]
    assert leftovers == [], leftovers


def test_identity_overlap_decimal_is_exact(spark):
    """r9 ADVICE item 1: decimal identity-partition values compare via
    decimal.Decimal, not float().  Beyond 2^53, float() collapses distinct
    decimals onto one double — exact comparison both prunes provably-
    disjoint files float math would keep AND never drops an overlapping
    one; unparseable values keep the file."""
    may = S._identity_may_overlap
    v = "100000000000000000000001"          # 1e23 + 1: float(v) == float(1e23)
    hi = 10**23
    # float would say "equal -> overlap"; exact arithmetic prunes.
    assert may("decimal(38,0)", v, 0, hi) is False
    # the true-boundary twin stays kept
    assert may("decimal(38,0)", str(10**23), 0, hi) is True
    # fractional decimals compare exactly too
    assert may("decimal(38,18)", "0.100000000000000000", 0, "0.1") is True
    assert may("decimal(38,18)", "0.100000000000000001", 0, "0.1") is False
    # doubt keeps the file
    assert may("decimal(38,0)", "not-a-number", 0, hi) is True


def test_snapshot_commit_algebra_property(spark):
    """Property (r9 verdict task 8): an arbitrary interleaving of
    upsert / MoR-delete / compact commits must equal the trivial
    dict-model fold at EVERY version — current reads after each commit,
    and time travel to every recorded version at the end.  This pins the
    commit algebra itself (CoW rewrite + DV anti-join + compaction
    absorption composing in any order), not one hand-picked scenario."""
    import shutil
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.integers(min_value=1, max_value=12)
    batch = st.dictionaries(
        keys, st.integers(min_value=0, max_value=99), min_size=1, max_size=6
    )
    op = st.one_of(
        st.tuples(st.just("upsert"), batch),
        st.tuples(st.just("delete"), st.sets(keys, min_size=1, max_size=4)),
        st.tuples(st.just("compact"), st.none()),
    )

    @settings(max_examples=5, deadline=None)
    @given(batch, st.lists(op, min_size=1, max_size=4))
    def prop(init, ops):
        tmp = tempfile.mkdtemp(prefix="snapprop_")
        path = tmp + "/t"
        try:
            model = dict(init)
            S.create_table(
                spark,
                spark.createDataFrame(sorted(init.items()), "k int, v int"),
                path,
                n_files=2,
            )
            snaps = {1: dict(model)}
            for kind, arg in ops:
                if kind == "upsert":
                    S.upsert(
                        spark, path,
                        spark.createDataFrame(sorted(arg.items()), "k int, v int"),
                        ["k"],
                    )
                    model.update(arg)
                elif kind == "delete":
                    # deletes may name absent keys — must be a no-op for them
                    S.delete(
                        spark, path,
                        spark.createDataFrame([(k,) for k in sorted(arg)], "k int"),
                        ["k"],
                    )
                    for k in arg:
                        model.pop(k, None)
                else:
                    S.compact(spark, path, target_rows=1_000)
                ver = S.current_version(spark, path)
                got = {(r["k"], r["v"]) for r in S.read_table(spark, path).collect()}
                assert got == set(model.items()), (kind, arg)
                snaps[ver] = dict(model)
            # CDF (late-r10 extension): table_changes between EVERY adjacent
            # committed pair — and the whole v1->tip range — must equal the
            # dict-model diff: inserts/updates/deletes value-compared, a
            # compaction (pure rewrite, identical values) an EMPTY feed.
            vers = sorted(snaps)
            for a, b in list(zip(vers, vers[1:])) + (
                [(vers[0], vers[-1])] if len(vers) > 1 else []
            ):
                feed = {
                    r["k"]: r["change_type"]
                    for r in S.table_changes(spark, path, a, b, ["k"]).collect()
                }
                olds, news = snaps[a], snaps[b]
                want = {}
                for k in olds.keys() | news.keys():
                    if k not in news:
                        want[k] = "deleted"
                    elif k not in olds:
                        want[k] = "inserted"
                    elif olds[k] != news[k]:
                        want[k] = "updated"
                assert feed == want, f"CDF v{a}->v{b}"
            for ver, snap in snaps.items():
                got = {
                    (r["k"], r["v"])
                    for r in S.read_table(spark, path, version=ver).collect()
                }
                assert got == set(snap.items()), f"time travel to v{ver}"
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    prop()


def test_vacuum_matches_file_liveness_model_property(spark):
    """Property (r11, from the r10 verdict's task 5 + r9 ADVICE item 3):
    vacuum's whole sweep — manifest drops, data/DV deletion vs retention,
    _tmp_ manifest sweep, staging-dir liveness (heartbeat + newest inner
    file), orphan heartbeats — must equal a pure set-algebra model over
    the BEFORE-listing of the table directory.  The model reads manifests
    with json.load directly (independent of snapshot._read_manifest) and
    classifies every file by (referenced?, mtime vs cutoff); vacuum must
    remove exactly the model's kill set and report matching counters.
    This pins the heartbeat contract's residual bound: an in-flight
    writer whose newest FILE mtime is fresh survives even when the dir
    and heartbeat are stale, and nothing referenced is ever deleted."""
    import json as _json
    import os
    import shutil
    import tempfile
    import time

    from hypothesis import given, settings
    from hypothesis import strategies as st

    # Base table built ONCE: 3 commits (create + upsert + MoR delete) so
    # there are manifests to drop, unreferenced data files, and DV files.
    base = tempfile.mkdtemp(prefix="vacprop_base_")
    bpath = base + "/t"
    src = spark.createDataFrame([(k, k * 10) for k in range(1, 13)], "k int, v int")
    S.create_table(spark, src, bpath, n_files=2)
    S.upsert(
        spark, bpath,
        spark.createDataFrame([(k, k * 100) for k in range(1, 7)], "k int, v int"),
        ["k"],
    )
    S.delete(spark, bpath, spark.createDataFrame([(1,), (2,)], "k int"), ["k"])
    OLD = time.time() - 3600.0   # safely before the cutoff
    FRESH = time.time() + 60.0   # safely after the cutoff
    RETAIN = 600.0               # cutoff = vacuum-call-time - 600s
    # Backdate every base file so real unreferenced files are sweepable.
    for root, _dirs, files in os.walk(base):
        for f in files:
            os.utime(os.path.join(root, f), (OLD, OLD))

    age = st.sampled_from(["old", "fresh"])
    artifact = st.one_of(
        st.tuples(st.just("orphan_data"), age),
        st.tuples(st.just("orphan_dv"), age),
        st.tuples(st.just("tmp_manifest"), age),
        # staging dir: (beat age or None=no heartbeat, inner-file age)
        st.tuples(st.just("staging"), st.tuples(st.one_of(st.none(), age), age)),
        st.tuples(st.just("orphan_beat"), age),
    )

    def ts(a):
        return OLD if a == "old" else FRESH

    @settings(max_examples=10, deadline=None)
    @given(st.lists(artifact, min_size=0, max_size=6), st.integers(1, 4))
    def prop(artifacts, keep_last):
        tmp = tempfile.mkdtemp(prefix="vacprop_")
        path = tmp + "/t"
        try:
            shutil.copytree(bpath, path, copy_function=shutil.copy2)
            # Plant artifacts with pinned mtimes.
            for i, (kind, arg) in enumerate(artifacts):
                if kind == "orphan_data":
                    p = f"{path}/data/orphan_{i}.parquet"
                    open(p, "w").write("x")
                    os.utime(p, (ts(arg), ts(arg)))
                elif kind == "orphan_dv":
                    os.makedirs(f"{path}/_deletes", exist_ok=True)
                    p = f"{path}/_deletes/orphan_{i}.parquet"
                    open(p, "w").write("x")
                    os.utime(p, (ts(arg), ts(arg)))
                elif kind == "tmp_manifest":
                    p = f"{path}/_snapshots/_tmp_v99_{i}.json"
                    open(p, "w").write("{}")
                    os.utime(p, (ts(arg), ts(arg)))
                elif kind == "staging":
                    beat_age, file_age = arg
                    d = f"{path}/_staging_{i}"
                    os.makedirs(d)
                    p = d + "/part-0.parquet"
                    open(p, "w").write("x")
                    os.utime(p, (ts(file_age), ts(file_age)))
                    os.utime(d, (OLD, OLD))  # dir mtime synthetic-old
                    if beat_age is not None:
                        b = d + ".heartbeat"
                        open(b, "w").close()
                        os.utime(b, (ts(beat_age), ts(beat_age)))
                else:  # orphan_beat
                    p = f"{path}/_staging_lost{i}.heartbeat"
                    open(p, "w").close()
                    os.utime(p, (ts(arg), ts(arg)))

            def listing():
                out = {}
                for root, _dirs, files in os.walk(path):
                    for f in files:
                        if f.startswith("."):
                            continue  # Hadoop .crc sidecars ride their file
                        p = os.path.join(root, f)
                        out[os.path.relpath(p, path)] = os.path.getmtime(p)
                return out

            before = listing()
            # ---- the model ----
            versions = sorted(
                int(f[1:9])
                for f in os.listdir(f"{path}/_snapshots")
                if f.startswith("v") and f.endswith(".json")
            )
            kept = versions[-max(1, keep_last):]
            referenced, referenced_dv = set(), set()
            for v in kept:
                with open(f"{path}/_snapshots/v{v:08d}.json") as fh:
                    m = _json.load(fh)
                referenced |= set(m["files"])
                referenced_dv |= set(m.get("delete_files") or [])
            kill = {
                f"_snapshots/v{v:08d}.json" for v in versions if v not in kept
            }
            n_deleted = n_retained = 0
            cutoff = time.time() - RETAIN  # vacuum runs within seconds
            for rel, mt in before.items():
                d, _, name = rel.rpartition("/")
                if d == "data" and name.endswith(".parquet") and name not in referenced:
                    if mt < cutoff:
                        kill.add(rel); n_deleted += 1
                    else:
                        n_retained += 1
                elif d == "_deletes" and name.endswith(".parquet") and name not in referenced_dv:
                    if mt < cutoff:
                        kill.add(rel); n_deleted += 1
                    else:
                        n_retained += 1
                elif d == "_snapshots" and name.startswith("_tmp_") and mt < cutoff:
                    kill.add(rel)
            # staging liveness: newest of (beat, any inner file) vs cutoff
            # (dir mtime is pinned OLD so it never decides).
            staging_dirs = {
                rel.split("/", 1)[0]
                for rel in before
                if rel.startswith("_staging_") and "/" in rel
            }
            n_staging = 0
            for sd in staging_dirs:
                newest = max(
                    mt
                    for rel, mt in before.items()
                    if rel.startswith(sd + "/") or rel == sd + ".heartbeat"
                )
                if newest < cutoff:
                    n_staging += 1
                    for rel in list(before):
                        if rel.startswith(sd + "/") or rel == sd + ".heartbeat":
                            kill.add(rel)
            for rel, mt in before.items():
                if (
                    "/" not in rel
                    and rel.startswith("_staging_")
                    and rel.endswith(".heartbeat")
                    and rel[: -len(".heartbeat")] not in staging_dirs
                    and mt < cutoff
                ):
                    kill.add(rel)
            # ---- run vacuum, compare ----
            got = S.vacuum(spark, path, keep_last=keep_last, retain_seconds=RETAIN)
            after = listing()
            assert set(after) == set(before) - kill, (
                sorted(set(before) - kill - set(after)),
                sorted(set(after) - (set(before) - kill)),
            )
            assert got["dropped_manifests"] == len(versions) - len(kept)
            assert got["deleted_files"] == n_deleted
            assert got["retained_recent_files"] == n_retained
            assert got["swept_staging_dirs"] == n_staging
            # Every kept version must still read (no live file deleted).
            for v in kept:
                S.read_table(spark, path, version=v).count()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    try:
        prop()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_hidden_partition_pruning_matches_overlap_model_property(spark):
    """Property (r11): read_table_pruned's file-keep decision must equal a
    pure-Python overlap model over the manifest's per-file partition
    records — for arbitrary typed data (ints incl. negatives, ISO dates
    across month boundaries, exact decimals, strings), all four
    transforms, point and range predicates, and spec evolution (a second
    append partitioned on a DIFFERENT column, whose files must always be
    kept).  Two laws per example: (1) soundness+exactness of the ANSWER —
    predicate-filtered rows through the pruned read equal the full-table
    filter (a wrong prune silently drops live rows; this is the law the
    r8/r9 lexicographic-int and float-rounded-decimal bugs broke); and
    (2) exactness of the KEPT SET — the pruned-but-unfiltered frame holds
    exactly the rows whose partition value the model keeps (pruning that
    keeps everything would pass law 1 while doing nothing)."""
    import datetime as _dt
    import shutil
    import tempfile
    from decimal import Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    ints = st.integers(-12, 12)
    dates = st.dates(_dt.date(2023, 11, 15), _dt.date(2024, 2, 15))
    decs = st.integers(-400, 400).map(lambda c: Decimal(c) / 100)
    words = st.sampled_from(["ab", "b", "ba", "z", "9", "10", "-1"])
    case = st.one_of(
        st.tuples(st.just("int"), st.lists(ints, min_size=1, max_size=12),
                  st.sampled_from(["identity", "bucket"]), ints, ints),
        st.tuples(st.just("date"), st.lists(dates, min_size=1, max_size=12),
                  st.sampled_from(["identity", "month", "day"]), dates, dates),
        st.tuples(st.just("decimal"), st.lists(decs, min_size=1, max_size=12),
                  st.just("identity"), decs, decs),
        st.tuples(st.just("string"), st.lists(words, min_size=1, max_size=12),
                  st.sampled_from(["identity", "bucket"]), words, words),
    )

    SPARK_TYPE = {"int": "int", "date": "date",
                  "decimal": "decimal(10,2)", "string": "string"}

    def fmt(tag, v):
        """Spark's collected rendering: decimal(10,2) normalizes to two
        places (Decimal('2.5') collects as '2.50'); everything else is
        its ISO/str form."""
        return f"{v:.2f}" if tag == "decimal" else str(v)

    def pv_string(tag, transform, v):
        if transform == "month":
            return str(v)[:7]
        if transform == "day":
            return str(v)[:10]
        if tag == "decimal":
            return f"{v:.2f}"
        return str(v)

    def model_keep(tag, transform, pv, lo, hi):
        if transform == "bucket":
            return None  # handled via a Spark-computed literal bucket
        if transform in ("month", "day"):
            plo = str(lo)[:7] if transform == "month" else str(lo)[:10]
            phi = str(hi)[:7] if transform == "month" else str(hi)[:10]
            return plo <= pv <= phi
        # identity, typed by column type
        if tag == "int":
            return int(lo) <= int(pv) <= int(hi)
        if tag == "decimal":
            return Decimal(str(lo)) <= Decimal(pv) <= Decimal(str(hi))
        return str(lo) <= pv <= str(hi)  # string + date: lexicographic ISO

    counter = [0]

    @settings(max_examples=10, deadline=None)
    @given(case, st.booleans(), st.booleans())
    def prop(c, point_lookup, evolve_spec):
        tag, vals, transform, p1, p2 = c
        lo, hi = (p1, p2) if str(p1) <= str(p2) else (p2, p1)
        if tag in ("int", "decimal"):
            lo, hi = min(p1, p2), max(p1, p2)
        if point_lookup:
            hi = None
        counter[0] += 1
        tmp = tempfile.mkdtemp(prefix="pruneprop_")
        path = tmp + "/t"
        try:
            arg = 4 if transform == "bucket" else None
            df = spark.createDataFrame(
                [(i, v) for i, v in enumerate(vals)],
                f"rid int, k {SPARK_TYPE[tag]}",
            )
            S.append_partitioned(spark, df, path, transform, "k", arg=arg)
            if evolve_spec:
                S.append_partitioned(
                    spark,
                    spark.createDataFrame(
                        [(100 + i, v) for i, v in enumerate(vals[:3])],
                        f"rid int, k {SPARK_TYPE[tag]}",
                    ),
                    path, "identity", "rid",
                )
            pruned = S.read_table_pruned(spark, path, "k", lo, hi)
            got_all = sorted((r.rid, str(r.k)) for r in pruned.collect())
            # ---- law 2: kept rows == model ----
            eff_hi = lo if hi is None else hi
            if transform == "bucket":
                if hi is None:
                    # The literal's bucket and each row's bucket come from
                    # ONE Spark job each (xxhash64 has no Python twin here);
                    # the DECISION under test — keep iff buckets equal,
                    # range predicates keep everything — stays in Python.
                    blit = (
                        spark.range(1)
                        .select(
                            F.pmod(
                                F.xxhash64(F.lit(lo).cast(SPARK_TYPE[tag])),
                                F.lit(arg),
                            ).cast("string").alias("b")
                        )
                        .first()["b"]
                    )
                    bvals = [
                        r["b"]
                        for r in spark.createDataFrame(
                            [(v,) for v in vals], f"k {SPARK_TYPE[tag]}"
                        )
                        .select(
                            F.pmod(F.xxhash64("k"), F.lit(arg))
                            .cast("string")
                            .alias("b")
                        )
                        .collect()
                    ]
                    expected_first = sorted(
                        (i, fmt(tag, v))
                        for (i, v), b in zip(enumerate(vals), bvals)
                        if b == blit
                    )
                else:
                    expected_first = sorted(
                        (i, fmt(tag, v)) for i, v in enumerate(vals)
                    )  # range over buckets keeps every file
            else:
                expected_first = sorted(
                    (i, fmt(tag, v))
                    for i, v in enumerate(vals)
                    if model_keep(
                        tag, transform, pv_string(tag, transform, v), lo, eff_hi
                    )
                )
            expected = expected_first + (
                sorted((100 + i, fmt(tag, v)) for i, v in enumerate(vals[:3]))
                if evolve_spec
                else []
            )
            assert got_all == sorted(expected), (c, lo, hi, got_all, expected)
            # ---- law 1: the filtered ANSWER is prune-invariant ----
            full = S.read_table(spark, path)
            pred = (
                (F.col("k") == F.lit(lo))
                if hi is None
                else F.col("k").between(F.lit(lo), F.lit(hi))
            )
            a = sorted((r.rid, str(r.k)) for r in pruned.filter(pred).collect())
            b = sorted((r.rid, str(r.k)) for r in full.filter(pred).collect())
            assert a == b, (c, lo, hi, a, b)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    prop()


def test_time_travel_vacuum_interplay_property(spark, sf_smoke, tmp_path):
    """Property (r12, verdict task 5): TIME TRAVEL x VACUUM RETENTION.
    A seeded random op sequence (upsert / MoR delete / compact) builds
    history; readers PIN several versions BEFORE vacuum runs.  After
    ``vacuum(keep_last=k, retain=0)``:

    * every KEPT version still time-travels to its exact model state;
    * every DROPPED version's manifest is gone — read_table raises
      FileNotFoundError, never a silent wrong answer;
    * a frame pinned pre-vacuum at a dropped version behaves by FILE
      LIVENESS: if every data+delete file it references is also referenced
      by a kept manifest, the collect still returns the exact historical
      state (manifest isolation outlives the manifest); if any referenced
      file was reclaimed, the collect FAILS — it must never silently
      return partial rows from the surviving subset.
    """
    import random
    import time as _time

    rng = random.Random(20260816)
    src = _orders(spark, sf_smoke).filter(F.col("o_orderkey") <= 1500)
    rows = {r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
            for r in src.collect()}
    path = str(tmp_path / "snap")
    S.create_table(
        spark, src.repartitionByRange(3, "o_orderkey"), path, n_files=None
    )
    model = dict(rows)
    states = {1: dict(model)}
    all_keys = sorted(rows)

    def df_of(kv):
        return spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in kv],
            "o_orderkey bigint, o_orderstatus string, o_totalprice double",
        )

    for step in range(6):
        op = rng.choice(["upsert", "mor_delete", "compact"])
        if op == "upsert":
            ks = rng.sample(all_keys, 25)
            batch = [(k, (rows[k][0], float(step * 1000 + k % 97))) for k in ks]
            S.upsert(spark, path, df_of(batch), ["o_orderkey"])
            model.update(dict(batch))
        elif op == "mor_delete":
            ks = [k for k in rng.sample(all_keys, 20) if k in model]
            dels = spark.createDataFrame(
                [(k,) for k in ks] or [(-1,)], "o_orderkey bigint"
            )
            S.delete(spark, path, dels, ["o_orderkey"])
            for k in ks:
                model.pop(k, None)
        else:
            S.compact(spark, path, target_rows=rng.choice([300, 10_000_000]))
        states[S.current_version(spark, path)] = dict(model)

    versions = sorted(states)
    manifests = {v: S._read_manifest(spark, path, v) for v in versions}
    pinned = {v: S.read_table(spark, path, version=v) for v in versions}

    keep_last = rng.choice([1, 2, 3])
    kept = set(versions[-keep_last:])
    live: set = set()
    for v in kept:
        live.update(manifests[v]["files"])
        live.update(manifests[v].get("delete_files") or [])
    _time.sleep(1.2)  # all file mtimes strictly older than the cutoff
    stats = S.vacuum(spark, path, keep_last=keep_last, retain_seconds=0)
    assert stats["dropped_manifests"] == len(versions) - len(kept)

    def snap_of(df):
        return {
            r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
            for r in df.collect()
        }

    for v in versions:
        if v in kept:
            assert snap_of(S.read_table(spark, path, version=v)) == states[v]
            assert snap_of(pinned[v]) == states[v]
            continue
        with pytest.raises(FileNotFoundError):
            S.read_table(spark, path, version=v)
        needed = set(manifests[v]["files"]) | set(
            manifests[v].get("delete_files") or []
        )
        if needed <= live:
            # every referenced file survived via a kept manifest: the
            # pinned plan still reproduces the historical state exactly
            assert snap_of(pinned[v]) == states[v], f"pinned v{v} diverged"
        else:
            # some file was reclaimed: the pinned read must FAIL, not
            # silently return the surviving subset
            with pytest.raises(Exception):
                pinned[v].collect()


def test_cdf_spans_partition_spec_evolution_property(spark, tmp_path):
    """Property (r12, verdict task 5): CHANGE DATA FEED x HIDDEN-PARTITION
    SPEC EVOLUTION.  Append-only history where EVERY commit lands under a
    different partition spec (identity/bucket on the key, month/day on the
    date — per-file records, the Iceberg evolution model).  For every
    version pair a < b, table_changes(a, b) must classify exactly the keys
    appended in (a, b] as inserted — no phantom updates/deletes from spec
    boundaries — and the pruned read at ANY version must equal the model
    filter even though its file set mixes four specs."""
    import datetime
    import random

    rng = random.Random(20260817)
    path = str(tmp_path / "snap_specs")
    specs = [
        ("identity", "k", None),
        ("bucket", "k", 4),
        ("month", "d", None),
        ("day", "d", None),
    ]
    rng.shuffle(specs)
    base_date = datetime.date(1995, 1, 1)
    inserted_at = {}  # version -> set of keys
    model = {}  # key -> (date, value)
    next_key = 0
    for rnd, (transform, col, arg) in enumerate(specs):
        batch = []
        for _ in range(rng.randint(8, 20)):
            d = base_date + datetime.timedelta(days=rng.randint(0, 400))
            batch.append((next_key, d, float(rnd * 100 + next_key % 13)))
            next_key += 1
        df = spark.createDataFrame(batch, "k bigint, d date, v double")
        ver = S.append_partitioned(spark, df, path, transform, col, arg)
        inserted_at[ver] = {k for k, _, _ in batch}
        model.update({k: (d, v) for k, d, v in batch})

    versions = sorted(inserted_at)
    man = S._read_manifest(spark, path, versions[-1])
    assert {p["transform"] for p in man["partitions"].values()} == {
        "identity", "bucket", "month", "day"
    }

    for _ in range(4):
        a, b = sorted(rng.sample(versions, 2))
        cdf = S.table_changes(spark, path, a, b, ["k"])
        got = {r["k"]: r["change_type"] for r in cdf.collect()}
        want_keys = set().union(
            *(inserted_at[v] for v in versions if a < v <= b)
        )
        assert got == {k: "inserted" for k in want_keys}, (a, b)

    # pruned reads stay exact across the spec mix, at every version
    for ver in versions:
        visible = set().union(*(inserted_at[v] for v in versions if v <= ver))
        lo = rng.randint(0, next_key // 2)
        hi = lo + rng.randint(0, next_key)
        pruned = S.read_table_pruned(spark, path, "k", lo, hi, version=ver)
        got_keys = {
            r["k"] for r in pruned.filter(F.col("k").between(lo, hi)).collect()
        }
        assert got_keys == {k for k in visible if lo <= k <= hi}, (ver, lo, hi)
    # and a date-range pruned read against the month/day files
    lo_d, hi_d = datetime.date(1995, 4, 1), datetime.date(1995, 9, 30)
    pruned = S.read_table_pruned(spark, path, "d", str(lo_d), str(hi_d))
    got_keys = {
        r["k"]
        for r in pruned.filter(F.col("d").between(str(lo_d), str(hi_d))).collect()
    }
    assert got_keys == {k for k, (d, _) in model.items() if lo_d <= d <= hi_d}


def test_compact_x_hidden_partitioning_interplay(spark, sf_smoke, tmp_path):
    """r13 interplay property: compact() consolidates ACROSS partitions, so
    its rewritten files legitimately have no single partition value — the
    doubt-policy ("files with no record are ALWAYS kept") must make every
    pruned read stay EXACT, trading pruning for correctness on exactly the
    rewritten files and nothing else:

    - values and row counts survive the rewrite bit-for-bit;
    - pruned reads on the post-compact version equal the row-level filter
      (rewritten files scanned-and-filtered, never skipped wrongly);
    - the PRE-compact version still prunes fully under time travel;
    - a fresh append re-establishes metadata pruning for the new month
      (one maintenance pass must not disable the mechanism forward)."""
    path = str(tmp_path / "snap_cx")
    months = ["1995-03-15", "1996-07-04", "1997-11-20"]
    frames = [
        _orders(spark, sf_smoke)
        .withColumn("o_orderdate", F.to_date(F.lit(m)))
        .limit(30)
        for m in months
    ]
    for fr in frames:
        S.append_partitioned(spark, fr, path, "month", "o_orderdate")
    v_pre = S.current_version(spark, path)
    pre_rows = sorted(
        (r["o_orderkey"], r["o_orderdate"].isoformat())
        for r in S.read_table(spark, path).collect()
    )
    pre_pruned_files = len(
        S.read_table_pruned(
            spark, path, "o_orderdate", "1996-01-01", "1996-12-31"
        ).inputFiles()
    )
    total_files = len(S._read_manifest(spark, path, v_pre)["files"])
    assert pre_pruned_files < total_files  # pruning is live before compact

    stats = S.compact(spark, path, target_rows=10_000_000)  # rewrite all
    assert stats["compacted_files"] == total_files, stats

    # values survive the cross-partition rewrite exactly
    post_rows = sorted(
        (r["o_orderkey"], r["o_orderdate"].isoformat())
        for r in S.read_table(spark, path).collect()
    )
    assert post_rows == pre_rows

    # pruned read on the compacted version: exact result, doubt-kept files
    pruned = S.read_table_pruned(
        spark, path, "o_orderdate", "1996-01-01", "1996-12-31"
    )
    got = sorted(
        (r["o_orderkey"], r["o_orderdate"].isoformat())
        for r in pruned.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") <= F.lit("1996-12-31"))
        ).collect()
    )
    want = [t for t in pre_rows if t[1].startswith("1996")]
    assert got == want

    # time travel to the pre-compact version keeps FULL metadata pruning
    tt_files = len(
        S.read_table_pruned(
            spark, path, "o_orderdate", "1996-01-01", "1996-12-31",
            version=v_pre,
        ).inputFiles()
    )
    assert tt_files == pre_pruned_files

    # a post-compact append re-establishes pruning for the new month
    S.append_partitioned(
        spark,
        _orders(spark, sf_smoke)
        .withColumn("o_orderdate", F.to_date(F.lit("1998-01-05")))
        .limit(30),
        path,
        "month",
        "o_orderdate",
    )
    m_now = S._read_manifest(spark, path, S.current_version(spark, path))
    new_recs = [
        n for n, rec in (m_now.get("partitions") or {}).items()
        if rec.get("value", "").startswith("1998")
    ]
    assert new_recs, "fresh append lost its partition records after compact"
    # a 1995 query must NOT scan the 1998 file (its record proves disjoint)
    pruned95 = S.read_table_pruned(
        spark, path, "o_orderdate", "1995-01-01", "1995-12-31"
    )
    assert not set(new_recs) & {
        f.rsplit("/", 1)[-1] for f in pruned95.inputFiles()
    }


def test_table_changes_across_compact_is_empty(spark, sf_smoke, tmp_path):
    """r13 interplay: a compact() commit moves every row to a new file
    without changing values — CDF across it must classify NOTHING (the
    moved rows meet on key and null-safe-compare equal), and a window
    spanning [real upsert, compact] must surface exactly the upsert's
    keys, never the layout rewrite."""
    src = _orders(spark, sf_smoke)
    path = str(tmp_path / "snap_cdf_cx")
    S.create_table(
        spark, src.repartitionByRange(6, "o_orderkey"), path,
        n_files=None, stats_cols=["o_orderkey"],
    )
    batch = src.limit(4).withColumn("o_totalprice", F.lit(999.0))
    S.upsert(spark, path, batch, ["o_orderkey"])        # v2: real change
    S.compact(spark, path, target_rows=10_000_000)      # v3: layout only

    over_compact = S.table_changes(spark, path, 2, 3, ["o_orderkey"])
    assert over_compact.count() == 0

    spanning = S.table_changes(spark, path, 1, 3, ["o_orderkey"])
    got = {r["o_orderkey"]: r["change_type"] for r in spanning.collect()}
    assert set(got) == {r["o_orderkey"] for r in batch.collect()}
    assert set(got.values()) <= {"updated"}
