"""LogMergePolicy selection — hand-traced vectors against
index/LogMergePolicy.java findMerges (:464-580) and
findForcedMergesMaxNumSegments (:243-299)."""

from lucene_spark.streaming import select_forced_merges, select_log_merges


def test_log_levels_basic():
    # mergeFactor 3, min_merge_size 2 (levelFloor = ln2/ln3):
    # three level-4 segs merge, three level-1 segs merge, the level-0
    # tail (below the floor window's bottom after clamping) merges in the
    # floor pass
    sizes = [81, 81, 81, 3, 3, 3, 1, 1, 1, 1]
    assert select_log_merges(sizes, merge_factor=3, min_merge_size=2) == [
        (0, 3), (3, 6), (6, 9)]


def test_log_levels_partial_runs_left_alone():
    # only two same-level segments -> no full mergeFactor window -> nothing
    assert select_log_merges([100, 100], merge_factor=3) == []
    # ten equal segments at factor 10 -> one merge
    assert select_log_merges([5] * 10, merge_factor=10) == [(0, 10)]


def test_log_levels_too_large_skipped_but_consumed():
    # a window containing an over-limit segment is skipped, and the walk
    # continues AFTER it (start = end), so the next full window merges
    sizes = [100, 100, 100, 100, 100, 100]
    got = select_log_merges(sizes, merge_factor=3, max_merge_size=100)
    assert got == []
    got = select_log_merges(sizes, merge_factor=3, max_merge_size=101)
    assert got == [(0, 3), (3, 6)]


def test_log_levels_merging_aborts_window():
    sizes = [10, 10, 10, 10, 10, 10]
    got = select_log_merges(sizes, merge_factor=3, merging={1})
    # first window contains an in-flight segment -> skipped; second merges
    assert got == [(3, 6)]


def test_big_segment_starts_new_window():
    # a small-tail window: one huge segment then small ones; the huge one
    # alone is upto'd by levelBottom and the small run merges separately
    sizes = [10**9, 4, 4, 4]
    got = select_log_merges(sizes, merge_factor=3, min_merge_size=2)
    assert got == [(1, 4)]


def test_forced_merges_full_then_none():
    # 25 segments down to 5 at factor 10: two full merges off the end,
    # NO partial (full merges pending)
    assert select_forced_merges([10] * 25, 5) == [(15, 25), (5, 15)]


def test_forced_merge_to_one():
    assert select_forced_merges([10] * 4, 1, merge_factor=10) == [(0, 4)]


def test_forced_partial_least_cost_window():
    # down to 3 from 5 -> finalMergeSize 3; best-start scan picks the
    # cheapest window that isn't lopsided vs its left neighbour
    sizes = [100, 1, 1, 1, 50]
    # windows: i=0 sum 102; i=1 sum 3 (3 < 2*100 and < 102); i=2 sum 52
    # (52 < 2*1? no) -> best (1, 4)
    assert select_forced_merges(sizes, 3, merge_factor=10) == [(1, 4)]


def test_forced_deletes_merges():
    from lucene_spark.streaming import select_forced_deletes_merges

    # runs of deleted segments merge mergeFactor at a time; clean segments
    # break the run; a trailing run merges at the end
    dels = [0, 1, 1, 1, 1, 0, 2, 2, 0, 3]
    assert select_forced_deletes_merges(dels, merge_factor=3) == [
        (1, 4), (4, 5), (6, 8), (9, 10)]
    assert select_forced_deletes_merges([0, 0, 0]) == []
    assert select_forced_deletes_merges([5], merge_factor=2) == [(0, 1)]


# ------------------------------------------------------- TieredMergePolicy

def seg(name, size, dels=0, max_doc=100, merging=False, raw=None):
    return {"name": name, "size": size, "bytes": raw or size,
            "del_count": dels, "max_doc": max_doc, "merging": merging}


def test_tiered_equal_segments_one_tier_merge():
    from lucene_spark.streaming import select_tiered_merges

    segs = [seg(f"s{i:02d}", 1 << 20) for i in range(20)]
    got = select_tiered_merges(segs)
    # allowed count = 10 (one full tier at the 2MB floor); one mergeFactor
    # window of the name-ordered equal segments brings it to 10
    assert got == [[f"s{i:02d}" for i in range(10)]]


def test_tiered_under_allowed_count_no_merge():
    from lucene_spark.streaming import select_tiered_merges

    segs = [seg(f"s{i}", 1 << 20) for i in range(5)]
    assert select_tiered_merges(segs) == []


def test_tiered_delete_budget_forces_merge():
    from lucene_spark.streaming import select_tiered_merges

    segs = [seg(f"s{i}", 10 << 20) for i in range(4)]
    segs.append(seg("sdel", 1 << 20, dels=900, max_doc=1000))
    got = select_tiered_merges(segs)
    # 5 <= allowed segments, but 900 deletes exceed the 33% budget -> the
    # lowest-score window (all five) reclaims them
    assert got and "sdel" in got[0]


def test_tiered_too_big_segments_graced_out():
    from lucene_spark.streaming import select_tiered_merges

    big = seg("big", 3 * 1024 * 1024 * 1024, dels=0)
    small = [seg(f"s{i:02d}", 1 << 20) for i in range(20)]
    got = select_tiered_merges([big] + small)
    assert all("big" not in m for m in got)


def test_tiered_singleton_needs_deletes():
    from lucene_spark.streaming import select_tiered_merges

    # force the allowed count below the segment count with huge spread:
    # 11 segments, each ~maxMerged/3 so a window holds only 3
    sz = (5 * 1024 * 1024 * 1024) // 3
    segs = [seg(f"s{i:02d}", sz) for i in range(12)]
    got = select_tiered_merges(segs)
    for m in got:
        assert len(m) > 1 or any(s["name"] == m[0] and s["del_count"] > 0
                                 for s in segs)


def test_tiered_merging_segments_leave_pool():
    from lucene_spark.streaming import select_tiered_merges

    segs = [seg(f"s{i:02d}", 1 << 20, merging=(i < 10)) for i in range(20)]
    got = select_tiered_merges(segs)
    for m in got:
        assert all(not n.startswith("s0") for n in m)


def test_tiered_forced_merge_to_one_small_case():
    from lucene_spark.streaming import select_tiered_forced_merges

    segs = [seg(f"s{i:02d}", 1 << 20) for i in range(5)]
    # fewer than maxMergeAtOnceExplicit, down to 1, all fit -> one merge
    assert select_tiered_forced_merges(segs, 1) == [
        [f"s{i:02d}" for i in range(5)]]


def test_tiered_forced_merge_count_satisfied_no_deletes():
    from lucene_spark.streaming import select_tiered_forced_merges

    segs = [seg(f"s{i}", 1 << 20) for i in range(3)]
    assert select_tiered_forced_merges(segs, 5) == []
    # but deleted docs force work even at a satisfied count... only when
    # the packing loop still has something to do (resulting > maxCount);
    # here 3 <= 5 so the packing loop ships nothing
    segs[0]["del_count"] = 50
    assert select_tiered_forced_merges(segs, 5) == []


def test_tiered_forced_merge_packs_from_smallest():
    from lucene_spark.streaming import select_tiered_forced_merges

    # 40 equal 1MB segments -> down to 2: packing from the smallest fills
    # maxMergeAtOnceExplicit (30) first, then the remainder
    segs = [seg(f"s{i:02d}", 1 << 20) for i in range(40)]
    got = select_tiered_forced_merges(segs, 2)
    assert len(got[0]) == 30
    # first candidate consumes the smallest-sorted tail: s39..s10 reversed
    assert got[0][0] == "s39" and got[0][-1] == "s10"
    # second merge brings 40-29=11 -> ... down to 2
    assert sum(len(m) - 1 for m in got) == 40 - 2


def test_tiered_forced_merge_in_flight_defers_final():
    from lucene_spark.streaming import select_tiered_forced_merges

    segs = [seg(f"s{i}", 1 << 20, merging=(i == 0)) for i in range(5)]
    # final merge (few segments) + another force-merge running -> defer
    assert select_tiered_forced_merges(segs, 1) == []


def test_tiered_forced_deletes_merges():
    from lucene_spark.streaming import select_tiered_forced_deletes_merges

    segs = [seg(f"s{i}", 10 << 20, dels=(20 if i < 3 else 0), max_doc=100)
            for i in range(6)]
    got = select_tiered_forced_deletes_merges(segs)
    # only the >10%-deleted segments participate, merged in one pass
    assert got == [["s0", "s1", "s2"]]
    # below the pct threshold -> no work
    segs = [seg("a", 1 << 20, dels=5, max_doc=100)]
    assert select_tiered_forced_deletes_merges(segs) == []
