"""Tokenizer-slot tests — vectors from the reference test suites
(analysis/common/src/test/.../path/TestPathHierarchyTokenizer.java,
TestReversePathHierarchyTokenizer.java, core tokenizer tests)."""

from lucene_spark.analysis import Analyzer
from lucene_spark.tokenizers import (
    keyword_analyzer,
    keyword_tokenize,
    letter_tokenize,
    path_hierarchy_tokenizer,
    reverse_path_hierarchy_tokenizer,
    simple_analyzer,
    stop_analyzer,
    url_email_analyzer,
    url_email_tokenize,
    whitespace_analyzer,
    whitespace_tokenize,
)


def _toks(tok, text):
    out = tok(text)
    return out[0] if isinstance(out, tuple) else out


class TestPathHierarchy:
    def test_basic(self):
        t = path_hierarchy_tokenizer()
        assert _toks(t, "/a/b/c") == ["/a", "/a/b", "/a/b/c"]

    def test_end_of_delimiter(self):
        t = path_hierarchy_tokenizer()
        assert _toks(t, "/a/b/c/") == ["/a", "/a/b", "/a/b/c", "/a/b/c/"]

    def test_startofchar(self):
        t = path_hierarchy_tokenizer()
        assert _toks(t, "a/b/c") == ["a", "a/b", "a/b/c"]

    def test_startofchar_end(self):
        t = path_hierarchy_tokenizer()
        assert _toks(t, "a/b/c/") == ["a", "a/b", "a/b/c", "a/b/c/"]

    def test_only_delimiter(self):
        t = path_hierarchy_tokenizer()
        assert _toks(t, "/") == ["/"]

    def test_only_delimiters(self):
        t = path_hierarchy_tokenizer()
        assert _toks(t, "//") == ["/", "//"]

    def test_replace(self):
        t = path_hierarchy_tokenizer(delimiter="\\", replacement="/")
        assert _toks(t, "c:\\a\\b\\c") == ["c:", "c:/a", "c:/a/b", "c:/a/b/c"]

    def test_windows_delimiter(self):
        t = path_hierarchy_tokenizer(delimiter="\\")
        assert _toks(t, "\\a\\b\\c") == ["\\a", "\\a\\b", "\\a\\b\\c"]

    def test_skip_basic(self):
        t = path_hierarchy_tokenizer(skip=1)
        assert _toks(t, "/a/b/c") == ["/b", "/b/c"]

    def test_skip_end(self):
        t = path_hierarchy_tokenizer(skip=1)
        assert _toks(t, "/a/b/c/") == ["/b", "/b/c", "/b/c/"]

    def test_skip_startofchar(self):
        t = path_hierarchy_tokenizer(skip=1)
        assert _toks(t, "a/b/c") == ["/b", "/b/c"]

    def test_skip_startofchar_end(self):
        t = path_hierarchy_tokenizer(skip=1)
        assert _toks(t, "a/b/c/") == ["/b", "/b/c", "/b/c/"]

    def test_positions_all_zero(self):
        t = path_hierarchy_tokenizer()
        toks, poss = t("/a/b/c")
        assert poss == [0, 0, 0]


class TestReversePathHierarchy:
    def test_basic(self):
        t = reverse_path_hierarchy_tokenizer()
        assert _toks(t, "/a/b/c") == ["/a/b/c", "a/b/c", "b/c", "c"]

    def test_end_of_delimiter(self):
        t = reverse_path_hierarchy_tokenizer()
        assert _toks(t, "/a/b/c/") == ["/a/b/c/", "a/b/c/", "b/c/", "c/"]

    def test_startofchar(self):
        t = reverse_path_hierarchy_tokenizer()
        assert _toks(t, "a/b/c") == ["a/b/c", "b/c", "c"]

    def test_startofchar_end(self):
        t = reverse_path_hierarchy_tokenizer()
        assert _toks(t, "a/b/c/") == ["a/b/c/", "b/c/", "c/"]

    def test_only_delimiter(self):
        t = reverse_path_hierarchy_tokenizer()
        assert _toks(t, "/") == ["/"]

    def test_only_delimiters(self):
        t = reverse_path_hierarchy_tokenizer()
        assert _toks(t, "//") == ["//", "/"]

    def test_skip(self):
        t = reverse_path_hierarchy_tokenizer(skip=1)
        assert _toks(t, "/a/b/c") == ["/a/b/", "a/b/", "b/"]

    def test_skip_startofchar(self):
        t = reverse_path_hierarchy_tokenizer(skip=1)
        assert _toks(t, "a/b/c") == ["a/b/", "b/"]

    def test_skip_end_of_delimiter(self):
        t = reverse_path_hierarchy_tokenizer(skip=1)
        assert _toks(t, "a/b/c/") == ["a/b/", "b/"]

    def test_domain_style(self):
        t = reverse_path_hierarchy_tokenizer(delimiter=".")
        assert _toks(t, "www.site.co.uk") == [
            "www.site.co.uk", "site.co.uk", "co.uk", "uk"]


class TestCoreTokenizers:
    def test_whitespace(self):
        assert whitespace_tokenize("Foo  Bar\tbaz\n") == ["Foo", "Bar", "baz"]
        assert whitespace_tokenize("") == []

    def test_keyword(self):
        assert keyword_tokenize("one two three") == ["one two three"]
        assert keyword_tokenize("") == []

    def test_letter(self):
        assert letter_tokenize("ab12cd ef_gh") == ["ab", "cd", "ef", "gh"]

    def test_url_email(self):
        toks = url_email_tokenize(
            "mail bob.smith@example.co.uk or see https://ex.org/a/b?q=1 "
            "and www.example.com today")
        assert "bob.smith@example.co.uk" in toks
        assert "https://ex.org/a/b?q=1" in toks
        assert "www.example.com" in toks
        assert "mail" in toks and "today" in toks

    def test_url_email_plain_text_matches_standard(self):
        from lucene_spark.analysis import tokenize

        text = "it's a test of 3.14 and 1,000 words"
        assert url_email_tokenize(text) == tokenize(text)


class TestAnalyzerIntegration:
    def test_whitespace_analyzer_no_casing(self):
        a = whitespace_analyzer()
        assert a.analyze_text("The QUICK brown")[0] == [
            "The", "QUICK", "brown"]

    def test_simple_analyzer(self):
        a = simple_analyzer()
        assert a.analyze_text("The quick-brown 12 fox")[0] == [
            "the", "quick", "brown", "fox"]

    def test_keyword_analyzer_verbatim(self):
        a = keyword_analyzer()
        toks, poss = a.analyze_text("New York City")
        assert toks == ["New York City"] and poss == [0]

    def test_stop_analyzer(self):
        a = stop_analyzer()
        assert a.analyze_text("the quick fox")[0] == ["quick", "fox"]

    def test_url_email_analyzer_lowercases(self):
        a = url_email_analyzer()
        toks, _ = a.analyze_text("Email Bob@Example.COM now")
        assert "bob@example.com" in toks

    def test_path_analyzer_positions_shared(self):
        a = Analyzer(stopwords=frozenset(),
                     tokenizer=path_hierarchy_tokenizer())
        toks, poss = a.analyze_text("/usr/local/bin")
        assert toks == ["/usr", "/usr/local", "/usr/local/bin"]
        assert poss == [0, 0, 0]

    def test_offsets_entry_rejects_custom_tokenizer(self):
        import pytest

        from lucene_spark.analysis import analyze_with_offsets

        with pytest.raises(ValueError, match="tokenizer"):
            analyze_with_offsets("/a/b", Analyzer(
                stopwords=frozenset(), tokenizer=path_hierarchy_tokenizer()))
