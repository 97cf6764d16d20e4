"""Beider-Morse engine goldens: every reference TestBeiderMorseFilter
vector through the curated generic-exact ruleset."""

from lucene_spark.beidermorse import beider_morse, beider_morse_filter


def test_basic_usage_goldens():
    # TestBeiderMorseFilter.testBasicUsage — order is the sorted set
    assert beider_morse("Angelo") == [
        "anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo"]
    assert beider_morse("D'Angelo") == [
        "anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo",
        "danZelo", "dandZelo", "dangelo", "danhelo", "danjelo", "danxelo"]


def test_language_set_golden():
    # testLanguageSet: restricted to italian/greek/spanish origins
    assert beider_morse("Angelo",
                        languages={"italian", "greek", "spanish"}) == \
        ["andZelo", "angelo", "anxelo"]


def test_numbers_pass_through_and_empty():
    # testNumbers: unencodable tokens pass through; testEmptyTerm
    assert beider_morse_filter(["1234"]) == (["1234"], [0])
    assert beider_morse("") == []
    assert beider_morse_filter([""]) == ([""], [0])


def test_filter_position_sharing():
    # all codes of one token share its position (posinc 1 then 0)
    toks, poss = beider_morse_filter(["Angelo", "ok"])
    assert poss == [0] * 6 + [1]
    assert toks[-1] == "ok"


def test_language_guessing_gates_branches():
    # 'sch' pins german/russian: soft-g renders only the hard way there
    assert beider_morse("schgei") == ["Sgei"]
    # concat/prefix cleaning strips punctuation and spaces
    assert beider_morse("van gelo")  # dutch guess, still encodes
