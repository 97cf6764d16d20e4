"""Property-based fuzzing (hypothesis) — no Spark, pure driver code.

Targets the reference's randomized-test strategy (SURVEY §5: Lucene leans on
RandomizedRunner + random codecs/IndexOptions per run; e.g.
test-framework/.../util/LuceneTestCase.java): feed the kernels randomized
inputs and assert the CONTRACT rather than golden values.

  - classic parser totality: parse_query never raises on arbitrary text
    (the CLI feeds it raw user input)
  - surround parser: returns an AST or raises ValueError — never any other
    exception, never hangs
  - codec roundtrips: postings/positions encode→decode is the identity for
    any sorted docid set (any block mix: full FOR/PFor blocks + vInt tail)
  - Damerau-Levenshtein: symmetry, identity, cap behavior, and the
    transposition axiom that distinguishes it from plain Levenshtein
  - MemoryIndex duel: for ANY single-doc corpus and term query, the
    in-RAM index scores EXACTLY like the exhaustive oracle over a one-doc
    corpus (same analyzer, same float32 BM25)
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.codecs import (
    decode_positions,
    decode_postings,
    encode_positions,
    encode_postings,
)
from lucene_spark.memory import memory_search
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import damerau_levenshtein, parse_query
from lucene_spark.surround import parse_surround

# --- parsers ----------------------------------------------------------------

_QUERY_ALPHABET = st.text(
    alphabet='abcO R()"~^*?[]{}+-:0123456789 ', min_size=0, max_size=60
)


@settings(max_examples=300, deadline=None)
@given(_QUERY_ALPHABET)
def test_classic_parser_is_total(q):
    node = parse_query(q)
    assert isinstance(node, tuple) and len(node) >= 1


@settings(max_examples=300, deadline=None)
@given(_QUERY_ALPHABET)
def test_surround_parser_raises_only_valueerror(q):
    try:
        node = parse_surround(q)
    except ValueError:
        return
    assert isinstance(node, tuple)


_SURROUND_OPS = {"or", "and", "not", "w", "n"}
_TERM = st.from_regex(r"[a-z]{1,6}", fullmatch=True).filter(
    lambda t: t not in _SURROUND_OPS and not __import__("re").fullmatch(
        r"([2-9][0-9]?|1[0-9])?[wn]", t
    )
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_TERM, min_size=2, max_size=5),
       st.integers(min_value=2, max_value=99),
       st.booleans())
def test_surround_infix_chain_equals_prefix_form(terms, dist, ordered):
    op = f"{dist}{'w' if ordered else 'n'}"
    infix = parse_surround(f" {op} ".join(terms))
    prefix = parse_surround(f"{op}({', '.join(terms)})")
    assert infix == prefix
    assert infix[0] == "span_near" and infix[2] == dist - 1 and infix[3] is ordered


# --- codecs -----------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**20), min_size=1,
             max_size=400, unique=True),
    st.data(),
)
def test_postings_roundtrip_any_block_mix(docid_list, data):
    docids = np.array(sorted(docid_list), dtype=np.int64)
    freqs = np.array(
        data.draw(st.lists(st.integers(min_value=1, max_value=1000),
                           min_size=len(docids), max_size=len(docids))),
        dtype=np.int64,
    )
    enc = encode_postings(docids, freqs)
    nblocks = len(enc["block_last_docid"])
    d, f = decode_postings(enc["doc_blob"], enc["freq_blob"],
                           enc["tail_blob"], int(enc["n_tail"]), nblocks)[:2]
    assert np.array_equal(d, docids)
    assert np.array_equal(f, freqs)
    # skip metadata contract: block_last_docid[i] == last docid of block i
    if nblocks:
        assert np.array_equal(
            np.asarray(enc["block_last_docid"], dtype=np.int64),
            d[127::128][:nblocks],
        )


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_positions_roundtrip(data):
    freqs = np.array(
        data.draw(st.lists(st.integers(min_value=1, max_value=20),
                           min_size=1, max_size=50)),
        dtype=np.int64,
    )
    # per-doc positions must be strictly increasing
    flat = []
    for f in freqs:
        start = data.draw(st.integers(min_value=0, max_value=100))
        gaps = data.draw(st.lists(st.integers(min_value=1, max_value=9),
                                  min_size=int(f) - 1, max_size=int(f) - 1))
        pos = [start]
        for g in gaps:
            pos.append(pos[-1] + g)
        flat.extend(pos)
    flat = np.array(flat, dtype=np.int64)
    blob = encode_positions(flat, freqs)
    out = decode_positions(blob, freqs)
    assert np.array_equal(out, flat)


# --- Damerau-Levenshtein ----------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcd", max_size=8), st.text(alphabet="abcd", max_size=8))
def test_damerau_symmetric_and_capped(a, b):
    d1, d2 = damerau_levenshtein(a, b), damerau_levenshtein(b, a)
    assert d1 == d2
    assert 0 <= d1 <= 3  # cap=2 → max reported 3
    assert (d1 == 0) == (a == b)


@settings(max_examples=200, deadline=None)
@given(st.from_regex(r"[a-z]{2,7}", fullmatch=True), st.data())
def test_damerau_adjacent_transposition_is_one_edit(w, data):
    i = data.draw(st.integers(min_value=0, max_value=len(w) - 2))
    if w[i] == w[i + 1]:
        return
    t = w[:i] + w[i + 1] + w[i] + w[i + 2:]
    assert damerau_levenshtein(w, t) == 1


# --- MemoryIndex vs exhaustive oracle ---------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(_TERM, min_size=1, max_size=30),   # document tokens
    st.lists(_TERM, min_size=1, max_size=3),    # query terms
)
def test_memory_index_duels_single_doc_oracle(doc_toks, q_terms):
    text = " ".join(doc_toks)
    query = " ".join(q_terms)
    mem = memory_search(text, query, precision="lucene")
    want = OracleIndex(["u0"], [text]).search(query, k=1, precision="lucene")
    if len(want) == 0:
        assert mem == 0.0
    else:
        assert mem == float(want["score"].iloc[0])
