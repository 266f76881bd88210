"""Conformance kernel: exact re-implementation of the reference's record
semantics (miku/ntto) in pure Python, with no Ray dependency.

This module is the P/R oracle for the distributed pipeline: every quirk of
the reference parser and rule engine is reproduced here and pinned by
``tests/test_core.py`` (ports of the reference's table-driven cases,
``common_test.go:9-218``).

Reference citations (all into /root/reference/):
  - ``Triple`` struct               common.go:15-20
  - ``Rule`` struct                 common.go:22-25
  - ``DumpRules`` / ``Rule.String`` common.go:27-38
  - ``ParseNTriple``                common.go:41-66
  - ``ParseRules``                  common.go:69-85
  - ``PartitionRules``              common.go:88-96
  - ``Sedify``/``SedifyNull``       common.go:99-127
  - ``Replacify``/``ReplacifyNull`` common.go:129-143
  - NDJSON marshalling              cmd/ntto/ntto.go:36-50
  - default rule table (data)       rules.go:3-242 (re-serialized as
    ``data/default_rules.txt`` — pure data, public namespace prefixes)
"""

from __future__ import annotations

import importlib.resources
from dataclasses import dataclass

APP_VERSION = "0.4.2-ray"

NULL_SENTINEL = "<NULL>"


@dataclass(frozen=True)
class Triple:
    """A parsed (subject, predicate, object) record. All fields are plain
    strings; IRI brackets and surrounding quotes are stripped at parse time
    (common.go:61-63) and never reconstructed."""

    s: str
    p: str
    o: str


@dataclass(frozen=True)
class Rule:
    """A namespace-abbreviation rule (common.go:22-25): replace ``prefix``
    with ``shortcut + ':'`` (or with the empty string when ``shortcut`` is
    the null sentinel, common.go:111-112)."""

    shortcut: str
    prefix: str

    def render(self) -> str:
        # Rule.String, common.go:36-38
        return f"{self.shortcut}\t{self.prefix}"


class BrokenRuleError(ValueError):
    pass


class BrokenInputError(ValueError):
    pass


def parse_rules(text: str) -> list[Rule]:
    """Parse RULES-format text into a rule list (common.go:69-85).

    Blank lines and lines starting with ``#`` or ``//`` are skipped. A line
    with fewer than 2 whitespace-separated fields raises ``BrokenRuleError``
    with the reference's message shape (``broken rule: <line>``); extra
    fields beyond the first two are ignored (fields[0]=shortcut,
    fields[1]=prefix).
    """
    rules: list[Rule] = []
    for raw in text.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith("//"):
            continue
        fields = line.split()
        if len(fields) < 2:
            raise BrokenRuleError(f"broken rule: {line}")
        rules.append(Rule(shortcut=fields[0], prefix=fields[1]))
    return rules


def default_rules() -> list[Rule]:
    """The built-in 223-entry rule table (data parity with rules.go:3-242),
    in original order (order matters for sed-parity mode)."""
    text = (
        importlib.resources.files("ntto_ray")
        .joinpath("data/default_rules.txt")
        .read_text()
    )
    return parse_rules(text)


def dump_rules(rules: list[Rule]) -> str:
    """Format rules one per line ``shortcut<TAB>prefix``, sorted
    lexicographically by the rendered line (common.go:27-34)."""
    return "\n".join(sorted(r.render() for r in rules))


# Go's unicode.IsSpace set (strings.Fields / TrimSpace): ASCII \t\n\v\f\r
# and space, NEL, NBSP, and the Unicode space separators. NOTE: narrower
# than Python's str.split() whitespace — Python also splits on the ASCII
# separator controls \x1c-\x1f, Go does not.
import re as _re

_GO_WS = "\t\n\v\f\r \x85\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005" \
    "\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
_GO_WS_RX = _re.compile("[" + _GO_WS + "]+")


def _go_trim_space(s: str) -> str:
    return s.strip(_GO_WS)


def parse_ntriple(line: str) -> Triple:
    """Parse one N-Triples line exactly as the reference does
    (common.go:41-66). Deliberately simplistic; quirks are load-bearing
    and pinned by the ported fixtures (common_test.go:185-218):

    - tokens split on any whitespace run → internal whitespace in the
      object collapses to single spaces;
    - fewer than 3 tokens → ``BrokenInputError`` rendering the token list
      (not the line) in Go slice syntax, matching ``broken input: [a b]``;
    - 3 or 4 tokens → object is token 3 ONLY (a 4th token is silently
      dropped whether it is the terminal ``.`` or real data);
    - more than 4 tokens → object is tokens[2:] joined by single spaces,
      minus the last token iff the trimmed line ends with ``.``;
    - every field is trimmed of any mix of ``<``, ``>``, ``"`` from both
      ends only (inner occurrences survive, so typed literals mangle).
    """
    line = _go_trim_space(line)
    words = [w for w in _GO_WS_RX.split(line) if w]
    if len(words) < 3:
        rendered = "[" + " ".join(words) + "]"
        raise BrokenInputError(f"broken input: {rendered}")
    s, p = words[0], words[1]
    if len(words) <= 4:
        o = words[2]
    else:
        if line.endswith("."):
            o = " ".join(words[2:-1])
        else:
            o = " ".join(words[2:])
    trim = "<>\""
    return Triple(s.strip(trim), p.strip(trim), o.strip(trim))


def partition_rules(rules: list[Rule], count: int) -> list[list[Rule]]:
    """Round-robin partition of the rule list into ``min(count, len)``
    slices by index modulo (common.go:88-96)."""
    count = min(len(rules), count)
    parts: list[list[Rule]] = [[] for _ in range(count)]
    for i, rule in enumerate(rules):
        parts[i % count].append(rule)
    return parts


def sedify(rules: list[Rule], p: int, infile: str) -> str:
    return sedify_null(rules, p, infile, NULL_SENTINEL)


def sedify_null(rules: list[Rule], p: int, infile: str, null: str) -> str:
    """Build the reference's perl pipeline command string
    (common.go:104-127): rules round-robin partitioned into ``p`` piped
    ``LANG=C perl -lnpe`` stages, ``< 'infile'`` attached to the first
    stage only when ``infile`` is non-empty. Exact string parity is pinned
    by the ported ``TestSedify`` cases (common_test.go:118-183)."""
    parts = partition_rules(rules, p)
    stages: list[str] = []
    for i, part in enumerate(parts):
        cmds = []
        for rule in part:
            if rule.shortcut == null:
                cmds.append(f"s@{rule.prefix}@@g")
            else:
                cmds.append(f"s@{rule.prefix}@{rule.shortcut}:@g")
        body = "; ".join(cmds)
        if i == 0 and infile != "":
            stages.append(f"LANG=C perl -lnpe '{body}' < '{infile}'")
        else:
            stages.append(f"LANG=C perl -lnpe '{body}'")
    return " | ".join(stages)


def replacify(rules: list[Rule], infile: str) -> str:
    return replacify_null(rules, infile, NULL_SENTINEL)


def replacify_null(rules: list[Rule], infile: str, null: str) -> str:
    """Build the reference's ``replace``-utility command string
    (common.go:133-143), including its exact spacing."""
    buf = []
    for rule in rules:
        if rule.shortcut == null:
            buf.append(f" '{rule.prefix}' '' ")
        else:
            buf.append(f" '{rule.prefix}' '{rule.shortcut}:' ")
    return f"replace {''.join(buf)} < {infile}"


def apply_rules_ordered(value: str, rules: list[Rule], null: str = NULL_SENTINEL) -> str:
    """Sed-parity semantics: global substring replace for every rule, in
    rule order, anywhere in the string (common.go:104-127 applied via perl
    ``s@..@..@g``). Order-dependent, not longest-match — e.g. with the
    default table ``http://dbpedia.org/resource/Category:X`` becomes
    ``dbp:Category:X`` because the ``dbp`` rule precedes ``category``
    (rules.go:4 vs rules.go:141)."""
    for rule in rules:
        repl = "" if rule.shortcut == null else rule.shortcut + ":"
        value = value.replace(rule.prefix, repl)
    return value


# --- NDJSON rendering, byte-compatible with Go's json.Marshal -------------

_GO_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "<": "\\u003c",
    ">": "\\u003e",
    "&": "\\u0026",
    "\u2028": "\\u2028",
    "\u2029": "\\u2029",
}


def _go_escape(s: str) -> str:
    out = []
    for ch in s:
        esc = _GO_ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ch < " ":
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def render_ndjson_line(t: Triple) -> str:
    """Render one triple as the reference's Marshaller does
    (cmd/ntto/ntto.go:36-50): key order s,p,o from the struct tags
    (common.go:15-20), Go ``encoding/json`` HTML-escaping of ``<``, ``>``,
    ``&`` (→ ``\\u003c``/``\\u003e``/``\\u0026``), control characters, and
    U+2028/U+2029; non-ASCII emitted as raw UTF-8 (unlike Python's default
    ``ensure_ascii``)."""
    return (
        '{"s":"' + _go_escape(t.s)
        + '","p":"' + _go_escape(t.p)
        + '","o":"' + _go_escape(t.o) + '"}'
    )
