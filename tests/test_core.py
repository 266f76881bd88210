"""Ports of the reference's table-driven unit tests (common_test.go:9-218)
plus NDJSON-marshal parity checks. Pure Python — no Ray needed."""

import pytest

from ntto_ray.core import (
    BrokenInputError,
    BrokenRuleError,
    Rule,
    Triple,
    apply_rules_ordered,
    default_rules,
    dump_rules,
    parse_ntriple,
    parse_rules,
    partition_rules,
    render_ndjson_line,
    replacify,
    sedify,
)

# --- TestParseRules (common_test.go:9-67) ---------------------------------

PARSE_RULES_OK = [
    ("a hello\n      b world", [Rule("a", "hello"), Rule("b", "world")]),
    (
        "a hello\n      // just a comment\n      b world",
        [Rule("a", "hello"), Rule("b", "world")],
    ),
    (
        "a hello\n      # just a comment\n\n      b world",
        [Rule("a", "hello"), Rule("b", "world")],
    ),
    (
        "a hello\n\n      // do not mix, unless you have to\n"
        "      # just a comment\n\n      b world",
        [Rule("a", "hello"), Rule("b", "world")],
    ),
]


@pytest.mark.parametrize("text,expected", PARSE_RULES_OK)
def test_parse_rules(text, expected):
    assert parse_rules(text) == expected


def test_parse_rules_broken():
    text = "a\n\n      // do not mix, unless you have to\n      # just a comment\n\n      b world"
    with pytest.raises(BrokenRuleError, match="broken rule: a"):
        parse_rules(text)


# --- TestPartitionRules (common_test.go:69-116) ---------------------------

AB = [Rule("a", "aaaa"), Rule("b", "bbbb")]
ABC = AB + [Rule("c", "cccc")]


@pytest.mark.parametrize(
    "rules,count,expected",
    [
        (AB, 2, [[AB[0]], [AB[1]]]),
        (AB, 1, [AB]),
        (ABC, 3, [[ABC[0]], [ABC[1]], [ABC[2]]]),
        (AB, 5, [[AB[0]], [AB[1]]]),  # count clamped to len(rules)
    ],
)
def test_partition_rules(rules, count, expected):
    assert partition_rules(rules, count) == expected


# --- TestSedify (common_test.go:118-183) ----------------------------------

ABCDEF = [
    Rule("a", "aaaa"), Rule("b", "bbbb"), Rule("c", "cccc"),
    Rule("d", "dddd"), Rule("e", "eeee"), Rule("f", "ffff"),
]

SEDIFY_CASES = [
    (AB, 2, "", "LANG=C perl -lnpe 's@aaaa@a:@g' | LANG=C perl -lnpe 's@bbbb@b:@g'"),
    (AB, 1, "", "LANG=C perl -lnpe 's@aaaa@a:@g; s@bbbb@b:@g'"),
    (AB, 1, "hello.txt", "LANG=C perl -lnpe 's@aaaa@a:@g; s@bbbb@b:@g' < 'hello.txt'"),
    (
        AB, 2, "hello.txt",
        "LANG=C perl -lnpe 's@aaaa@a:@g' < 'hello.txt' | LANG=C perl -lnpe 's@bbbb@b:@g'",
    ),
    (
        ABCDEF, 2, "hello.txt",
        "LANG=C perl -lnpe 's@aaaa@a:@g; s@cccc@c:@g; s@eeee@e:@g' < 'hello.txt'"
        " | LANG=C perl -lnpe 's@bbbb@b:@g; s@dddd@d:@g; s@ffff@f:@g'",
    ),
    (
        ABCDEF, 4, "hello.txt",
        "LANG=C perl -lnpe 's@aaaa@a:@g; s@eeee@e:@g' < 'hello.txt'"
        " | LANG=C perl -lnpe 's@bbbb@b:@g; s@ffff@f:@g'"
        " | LANG=C perl -lnpe 's@cccc@c:@g'"
        " | LANG=C perl -lnpe 's@dddd@d:@g'",
    ),
]


@pytest.mark.parametrize("rules,p,infile,expected", SEDIFY_CASES)
def test_sedify(rules, p, infile, expected):
    assert sedify(rules, p, infile) == expected


def test_replacify():
    # common.go:133-143 exact spacing
    assert (
        replacify(AB, "in.nt")
        == "replace  'aaaa' 'a:'  'bbbb' 'b:'  < in.nt"
    )


# --- TestParseNTriple (common_test.go:185-218) ----------------------------

PARSE_NT_CASES = [
    (
        "<http://d-nb.info/gnd/1-2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        " <http://d-nb.info/standards/elementset/gnd#SeriesOfConferenceOrEvent> .",
        Triple(
            "http://d-nb.info/gnd/1-2",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://d-nb.info/standards/elementset/gnd#SeriesOfConferenceOrEvent",
        ),
    ),
    ("a b c .", Triple("a", "b", "c")),
    ('a b "the deep blue c" .', Triple("a", "b", "the deep blue c")),
    ('a <b> "the deep blue c" .', Triple("a", "b", "the deep blue c")),
    ('<a> <b> "the deep blue c" .', Triple("a", "b", "the deep blue c")),
    ("<a> <b> <the deep blue c> .", Triple("a", "b", "the deep blue c")),
    ("<a> <b> <the deep blue c>", Triple("a", "b", "the deep blue c")),
    ("<a> <b> <the deep blue c>", Triple("a", "b", "the deep blue c")),
    ("<a>    <b>  <the         deep blue c>", Triple("a", "b", "the deep blue c")),
]


@pytest.mark.parametrize("line,expected", PARSE_NT_CASES)
def test_parse_ntriple(line, expected):
    assert parse_ntriple(line) == expected


def test_parse_ntriple_quirks():
    # 4-token quoted object: 4th token silently dropped (common.go:52-54)
    assert parse_ntriple('a b "x y"') == Triple("a", "b", "x")
    # with trailing '.' it is 5 tokens → join minus the dot
    assert parse_ntriple('a b "x y" .') == Triple("a", "b", "x y")
    # typed literal mangles: both-ends trim only (common.go:61-63)
    t = parse_ntriple('<s> <p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .')
    assert t.o == '5"^^<http://www.w3.org/2001/XMLSchema#integer'
    # language tag survives
    assert parse_ntriple('<s> <p> "foo"@en .').o == 'foo"@en'
    # blank node untouched
    assert parse_ntriple("_:b1 <p> _:b2 .") == Triple("_:b1", "p", "_:b2")
    with pytest.raises(BrokenInputError, match=r"broken input: \[a b\]"):
        parse_ntriple("a b")


# --- default rules / dump / ordered apply ---------------------------------

def test_default_rules_table():
    rules = default_rules()
    assert len(rules) == 223
    assert Rule("dbp", "http://dbpedia.org/resource/") in rules
    assert Rule("gnd", "http://d-nb.info/gnd/") in rules
    # dump is sorted lexicographically, one shortcut\tprefix per line
    dumped = dump_rules(rules).split("\n")
    assert dumped == sorted(dumped)
    assert len(dumped) == 223


def test_apply_rules_ordered_shadowing():
    # rules.go:4 (dbp) precedes rules.go:141 (category): ordered-replace
    # shadows the longer prefix — the reference's documented behavior.
    rules = default_rules()
    out = apply_rules_ordered("http://dbpedia.org/resource/Category:X", rules)
    assert out == "dbp:Category:X"


def test_apply_rules_null_sentinel():
    rules = [Rule("<NULL>", "http://kill.me/"), Rule("a", "aaaa")]
    assert apply_rules_ordered("http://kill.me/x aaaa", rules) == "x a:"


# --- NDJSON marshal parity (ntto.go:36-50, Go encoding/json) --------------

def test_render_ndjson_basic():
    assert (
        render_ndjson_line(Triple("s1", "p1", "o1"))
        == '{"s":"s1","p":"p1","o":"o1"}'
    )


def test_render_ndjson_go_escaping():
    # Go json.Marshal HTML-escapes < > & and escapes control chars;
    # raw UTF-8 passes through un-escaped.
    line = render_ndjson_line(Triple('a"b\\c', "x<y>&", "Zürich\n\x01"))
    assert line == (
        '{"s":"a\\"b\\\\c","p":"x\\u003cy\\u003e\\u0026","o":"Zürich\\n\\u0001"}'
    )
