"""Replicator: publish/sync/read with incremental segment shipping."""

import os

import pytest

from lucene_spark.index import build_index, read_index, write_index
from lucene_spark.replicator import publish_revision, read_replica, sync_replica
from lucene_spark.search import search

CORPUS = [(f"u{i}", f"alpha beta w{i % 7} gamma" + (" delta" if i % 3 == 0 else ""))
          for i in range(40)]


@pytest.fixture(scope="module")
def published(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("primary"))
    pages = spark.createDataFrame(CORPUS, "url string, text string")
    idx = build_index(spark, pages, text_col="text", key_col="url", seg_size=16)
    write_index(idx, src)
    manifest = publish_revision(src)
    return src, manifest


def test_publish_manifest(published):
    src, manifest = published
    assert manifest["version"] == 1
    assert any(rel.startswith("postings") for rel in manifest["files"])
    assert any(rel.startswith("stats") for rel in manifest["files"])


def test_full_sync_then_search_identical(spark, published, tmp_path_factory):
    src, _ = published
    dst = str(tmp_path_factory.mktemp("replica"))
    stats = sync_replica(src, dst)
    assert stats["version"] == 1 and stats["copied"] > 0 and stats["deleted"] == 0
    replica = read_replica(spark, dst)
    primary = read_index(spark, src)
    for q in ("alpha", "delta w0", "beta gamma"):
        a = search(primary, q, k=10, precision="float64", prune=True)
        b = search(replica, q, k=10, precision="float64", prune=True)
        assert a.docids.tolist() == b.docids.tolist()
        assert a.scores.tolist() == b.scores.tolist()


def test_incremental_sync_skips_unchanged(spark, published, tmp_path_factory):
    src, _ = published
    dst = str(tmp_path_factory.mktemp("replica2"))
    first = sync_replica(src, dst)
    assert first["copied"] > 0
    # no new revision content: a re-sync copies nothing
    again = sync_replica(src, dst)
    assert again["copied"] == 0 and again["skipped"] == first["copied"]
    # repair: delete a replica file, resync copies exactly the damage
    victim = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(dst, "postings"))
        for f in fs if f.endswith(".parquet")
    )
    os.remove(victim)
    with pytest.raises(IOError):
        read_replica(spark, dst)
    repair = sync_replica(src, dst)
    assert repair["copied"] == 1
    assert read_replica(spark, dst).doc_count == 40


def test_second_revision_ships_delta(spark, published, tmp_path_factory):
    src, _ = published
    dst = str(tmp_path_factory.mktemp("replica3"))
    sync_replica(src, dst)
    # re-publish after appending tombstones (a delete-only commit: one small
    # new table; the immutable seg partitions are untouched)
    primary = read_index(spark, src)
    deleted = primary.delete_docs(spark.createDataFrame([(0,), (1,)], "docid long"))
    deleted.write_tombstones(src)
    manifest2 = publish_revision(src)
    assert manifest2["version"] == 2
    stats = sync_replica(src, dst)
    total = len(manifest2["files"])
    assert stats["copied"] >= 1 and stats["copied"] < total // 2
    assert stats["skipped"] + stats["copied"] >= total
    replica = read_replica(spark, dst)
    td = search(replica, "alpha", k=50, precision="float64")
    assert 0 not in td.docids.tolist() and 1 not in td.docids.tolist()


def test_unsynced_replica_refuses(spark, tmp_path_factory):
    empty = str(tmp_path_factory.mktemp("notareplica"))
    with pytest.raises(FileNotFoundError):
        read_replica(spark, empty)
