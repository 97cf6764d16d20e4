"""UnifiedHighlighter break iterators: CustomSeparator, Whole, and
LengthGoalBreakIterator — reference TestLengthGoalBreakIterator goldens
(passages computed via the FieldHighlighter protocol, including the
CustomSeparatorBreakIterator CharacterIterator off-by-ones)."""

import pytest

from lucene_spark.highlight import (
    custom_separator_boundaries,
    length_goal_passage,
    sentence_boundaries,
    whole_boundaries,
)

CONTENT = "Aa bb. Cc dd. Ee ff"     # '.' at 5 and 12
CONTENT3 = "Aa bbcc ddxyzee ffgg hh."


def test_boundary_sources():
    assert whole_boundaries(CONTENT) == [0, 19]
    assert custom_separator_boundaries(CONTENT, ".") == [0, 6, 13, 19]
    assert custom_separator_boundaries("a.b.", ".") == [0, 2, 4]
    assert sentence_boundaries("One. Two! Three") == [0, 5, 10, 15]


@pytest.mark.parametrize("match,goal,align,minimum,want", [
    # testTargetLen (createClosestToLength), query 'aa' = (0, 2)
    ((0, 2), 7, 0.0, False, (0, 6)),      # almost two sent A
    ((0, 2), 15, 0.5, False, (0, 6)),     # almost two sent B
    ((0, 2), 64, 1.0, False, (0, 6)),     # almost two sent C
    ((0, 2), 8, 0.0, False, (0, 13)),     # barely two sent A
    ((0, 2), 16, 0.5, False, (0, 13)),    # barely two sent B
    ((0, 2), 14, 0.0, False, (0, 19)),    # long goal A
    ((0, 2), 28, 0.5, False, (0, 19)),    # long goal B
    # query 'dd' = (10, 12)
    ((10, 12), 0, 0.0, False, (6, 13)),   # short goal
    ((10, 12), 3, 1.0, False, (6, 13)),
    ((10, 12), 11, 0.0, False, (6, 19)),
    # testMinLen (createMinLength)
    ((10, 12), 0, 0.0, True, (6, 13)),    # almost two sent A
    ((10, 12), 1, 0.5, True, (6, 13)),    # almost two sent B
    ((10, 12), 5, 1.0, True, (6, 13)),    # almost two sent C
    ((10, 12), 1, 0.0, True, (6, 19)),    # barely two sent A
    ((10, 12), 2, 0.5, True, (6, 19)),    # barely two sent B
    ((10, 12), 7, 1.0, True, (0, 13)),    # barely two sent C
    ((10, 12), 2, 0.55, True, (6, 13)),   # barely two sent D/a
    ((10, 12), 3, 0.55, True, (6, 19)),   # barely two sent D/b
    ((10, 12), 10, 0.5, True, (6, 19)),   # barely two sent E/a
    ((10, 12), 10, 0.7, True, (0, 19)),   # barely two sent E/b
    ((10, 12), 9, 0.9, True, (0, 13)),    # barely two sent E/c
])
def test_length_goal_reference_goldens(match, goal, align, minimum, want):
    bounds = custom_separator_boundaries(CONTENT, ".")
    got = length_goal_passage(bounds, len(CONTENT), match[0], match[1],
                              goal, align, minimum)
    assert got == want


def test_length_goal_fragment_from_match_middle():
    # testMinLen CONTENT3: the fragment search starts from the middle of
    # the match (FieldHighlighter center), query 'ddxyzee' = (8, 15)
    bounds = custom_separator_boundaries(CONTENT3, " ")
    assert length_goal_passage(bounds, len(CONTENT3), 8, 15, 7, 0.5,
                               True) == (8, 16)
    assert length_goal_passage(bounds, len(CONTENT3), 8, 15, 8, 0.5,
                               True) == (3, 21)


def test_alignment_validation_and_whole():
    with pytest.raises(ValueError):
        length_goal_passage([0, 19], 19, 0, 2, 5, 1.5)
    # whole-text boundaries: passage is the whole text
    assert length_goal_passage(whole_boundaries(CONTENT), 19, 10, 12,
                               5, 0.0, False, custom_separator=False) \
        == (0, 19)


# ------------------------------------------- FVH boundary scanners

TEXT_FVH = ("Apache Lucene(TM) is a high-performance, full-featured\n"
            "text search engine library written entirely in Java.")


def test_simple_boundary_scanner_reference_vectors():
    from lucene_spark.highlight import (
        simple_boundary_end, simple_boundary_start,
    )

    # TestSimpleBoundaryScanner.java vectors
    start = len(TEXT_FVH) + 1
    assert simple_boundary_start(TEXT_FVH, start) == start
    assert simple_boundary_start(TEXT_FVH, 0) == 0
    start = TEXT_FVH.index("formance")
    assert simple_boundary_start(TEXT_FVH, start) == TEXT_FVH.index(
        "high-performance")
    start = TEXT_FVH.index("che")
    assert simple_boundary_start(TEXT_FVH, start) == TEXT_FVH.index("Apache")
    start = len(TEXT_FVH) + 1
    assert simple_boundary_end(TEXT_FVH, start) == start
    assert simple_boundary_end(TEXT_FVH, -1) == -1
    start = TEXT_FVH.index("full-")
    assert simple_boundary_end(TEXT_FVH, start) == TEXT_FVH.index("\ntext")


def test_break_iterator_boundary_scanner():
    from lucene_spark.highlight import (
        break_iterator_boundary_end, break_iterator_boundary_start,
        sentence_boundaries,
    )

    text = "One sentence. Two sentence. Three."
    bounds = sentence_boundaries(text)
    mid = text.index("Two") + 1
    assert break_iterator_boundary_start(bounds, mid, len(text)) <= mid
    assert break_iterator_boundary_end(bounds, mid, len(text)) > mid
    # out-of-range passthrough
    assert break_iterator_boundary_start(bounds, 0, len(text)) == 0
    n = len(text) + 1
    assert break_iterator_boundary_start(bounds, n, len(text)) == n
