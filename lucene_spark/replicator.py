"""Replicator: incremental index shipping to read replicas.

Reference: lucene/replicator — a publisher exposes each commit as a Revision
(replicator/src/java/org/apache/lucene/replicator/IndexRevision.java:45 — the
commit's file list with sizes), ReplicationClient pulls ONLY the files the
replica is missing (ReplicationClient.java:44 "copies the files from the
server to its index directory ... required files"), and
IndexReplicationHandler makes the cutover atomic by syncing every segment
file BEFORE the segments_N pointer so a reader never observes a partial
commit (IndexReplicationHandler.java:89-113 "if a reader sees the new
segments_N, all other segment files are there").

Spark analog: a persisted index directory is immutable seg-partitioned
parquet (write_index) — the segment-file role — plus small metadata tables.
A revision manifest lists (relpath, size, mtime) of every data file;
``sync_replica`` copies only files absent-or-different at the replica,
removes files no longer referenced, and LAST writes the ``_rev.json``
pointer (the segments_N analog) — readers of the replica open via
``read_replica`` which validates the pointer.  On a real cluster the same
manifest diff drives a distributed FileSystem copy (or an Iceberg
snapshot export); parquet immutability means size+mtime identity is exact
for our writers, and each re-publish creates new file names (Spark part-UUID
naming), so stale reads are structurally impossible — the same immutability
argument Lucene's per-commit file names make.
"""

from __future__ import annotations

import json
import os
import shutil
import time

_REV_FILE = "_rev.json"


def _walk_files(root: str) -> dict[str, tuple[int, float]]:
    out: dict[str, tuple[int, float]] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn == _REV_FILE or fn.endswith(".crc"):
                continue
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            st = os.stat(p)
            out[rel] = (st.st_size, st.st_mtime)
    return out


def publish_revision(index_dir: str) -> dict:
    """Snapshot the directory's current file list as a revision manifest
    (IndexRevision analog: the commit's files + sizes).  Returns the manifest;
    also written to ``index_dir/_rev.json`` so replicas can validate what
    they pulled.  Monotonic version = previous + 1."""
    files = _walk_files(index_dir)
    prev = 0
    rev_path = os.path.join(index_dir, _REV_FILE)
    if os.path.exists(rev_path):
        with open(rev_path) as f:
            prev = json.load(f).get("version", 0)
    manifest = {
        "version": prev + 1,
        "files": {rel: {"size": sz} for rel, (sz, _mt) in files.items()},
    }
    tmp = rev_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, rev_path)  # atomic publish
    return manifest


def sync_replica(src_dir: str, dst_dir: str) -> dict:
    """Pull the publisher's current revision into ``dst_dir``, copying ONLY
    files the replica lacks (matched by relpath + size — our parquet writers
    never rewrite a file in place; re-publishes create new part-file names).
    Files not in the manifest are removed (old segment cleanup,
    IndexReplicationHandler.cleanupOldIndexFiles analog).  The revision
    pointer lands LAST — a crash mid-sync leaves the replica readable at its
    previous revision.  Returns {"version", "copied", "skipped", "deleted"}.
    """
    rev_path = os.path.join(src_dir, _REV_FILE)
    if not os.path.exists(rev_path):
        raise FileNotFoundError(
            f"{src_dir} has no published revision (run publish_revision first)"
        )
    with open(rev_path) as f:
        manifest = json.load(f)
    want: dict[str, int] = {rel: m["size"] for rel, m in manifest["files"].items()}
    os.makedirs(dst_dir, exist_ok=True)
    have = {rel: sz for rel, (sz, _mt) in _walk_files(dst_dir).items()}
    copied = skipped = deleted = 0
    for rel, size in want.items():
        if have.get(rel) == size:
            skipped += 1
            continue
        src = os.path.join(src_dir, rel)
        dst = os.path.join(dst_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
        copied += 1
    for rel in set(have) - set(want):
        os.remove(os.path.join(dst_dir, rel))
        deleted += 1
    # the segments_N analog: pointer written last, atomically
    tmp = os.path.join(dst_dir, _REV_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump({**manifest, "synced_at": time.time()}, f)
    os.replace(tmp, os.path.join(dst_dir, _REV_FILE))
    return {
        "version": manifest["version"],
        "copied": copied,
        "skipped": skipped,
        "deleted": deleted,
    }


def read_replica(spark, replica_dir: str):
    """Open a synced replica for searching: validates the revision pointer
    (a replica without one was never fully synced — refuse, exactly like a
    directory without segments_N has no commit) and verifies every
    manifest file is present with the right size before handing the
    directory to read_index."""
    rev_path = os.path.join(replica_dir, _REV_FILE)
    if not os.path.exists(rev_path):
        raise FileNotFoundError(f"{replica_dir} has no synced revision")
    with open(rev_path) as f:
        manifest = json.load(f)
    have = {rel: sz for rel, (sz, _mt) in _walk_files(replica_dir).items()}
    missing = [
        rel for rel, m in manifest["files"].items() if have.get(rel) != m["size"]
    ]
    if missing:
        raise IOError(
            f"replica {replica_dir} is incomplete vs revision "
            f"{manifest['version']}: {missing[:5]}"
        )
    from .index import read_index

    return read_index(spark, replica_dir)
