"""Vectorized NT parser vs the scalar conformance parser (which is itself
pinned to common.go:41-66 by test_core), plus property-style round-trips."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ntto_ray.core import Triple, parse_ntriple
from ntto_ray.stages.ntparse import parse_nt_batch, render_nt_batch

CASES = [
    "<http://d-nb.info/gnd/1-2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://d-nb.info/standards/elementset/gnd#SeriesOfConferenceOrEvent> .",
    "a b c .",
    'a b "the deep blue c" .',
    "<a> <b> <the deep blue c> .",
    "<a> <b> <the deep blue c>",
    "<a>    <b>  <the         deep blue c>",
    "a b c.",
    "a b c d",
    "a b c d .",
    "  s  p  o  ",
    '<s> <p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<s> <p> "foo"@en .',
    "_:b1 <p> _:b2 .",
]


def _batch(lines):
    return pa.table({"text": lines})


def test_batch_parser_matches_scalar():
    out = parse_nt_batch(_batch(CASES))
    for i, line in enumerate(CASES):
        want = parse_ntriple(line)
        got = Triple(
            out["subj"][i].as_py(), out["pred"][i].as_py(), out["obj"][i].as_py()
        )
        assert got == want, f"line {line!r}: {got} != {want}"


def test_batch_parser_error_policies():
    with pytest.raises(Exception, match="broken input"):
        parse_nt_batch(_batch(["a b"]))
    out = parse_nt_batch(_batch(["a b", "a b c"]), on_error="drop")
    assert out.num_rows == 1
    assert out["subj"][0].as_py() == "a"


# printable ASCII tokens without whitespace or the trim set — the naive
# "identity round-trip" expectation only holds there (whitespace-bearing
# tokens legitimately split/mangle per the reference semantics)
_token = st.text(
    alphabet=st.characters(
        codec="ascii",
        min_codepoint=0x21,
        max_codepoint=0x7E,
        exclude_characters='<>"',
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(_token, _token, _token)
def test_roundtrip_property(s, p, o):
    """render(parse) identity for bracket-free single-token fields."""
    rendered = render_nt_batch(
        pa.table({"subj": [s], "pred": [p], "obj": [o]})
    )["line"][0].as_py()
    t = parse_ntriple(rendered)
    assert t == Triple(s.strip('<>"'), p.strip('<>"'), o.strip('<>"'))
    out = parse_nt_batch(_batch([rendered]))
    assert (
        out["subj"][0].as_py(),
        out["pred"][0].as_py(),
        out["obj"][0].as_py(),
    ) == (t.s, t.p, t.o)


@settings(max_examples=100, deadline=None)
@given(st.lists(_token, min_size=3, max_size=7))
def test_batch_equals_scalar_property(tokens):
    line = " ".join(tokens)
    want = parse_ntriple(line)
    out = parse_nt_batch(_batch([line]))
    assert (
        out["subj"][0].as_py(),
        out["pred"][0].as_py(),
        out["obj"][0].as_py(),
    ) == (want.s, want.p, want.o)


def test_triple_pr_vs_reference_fixtures():
    """The north-rule gate: triple precision/recall >= 0.95 vs the
    reference's own parser fixtures (common_test.go:185-218 cases, as
    ported into test_core.PARSE_NT_CASES). The engine's vectorized parse
    reproduces every quirk, so measured P/R is 1.0; this test computes
    the number rather than assuming it."""
    from tests.test_core import PARSE_NT_CASES

    lines = [line for line, _ in PARSE_NT_CASES]
    want = [(t.s, t.p, t.o) for _, t in PARSE_NT_CASES]
    out = parse_nt_batch(_batch(lines))
    got = [
        (out["subj"][i].as_py(), out["pred"][i].as_py(), out["obj"][i].as_py())
        for i in range(out.num_rows)
    ]
    tp = sum(1 for g, w in zip(got, want) if g == w)
    precision = tp / len(got)
    recall = tp / len(want)
    print(f"triple P/R vs reference fixtures: P={precision:.3f} R={recall:.3f}")
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0
