"""CLI surface tests — byte parity of the -a (abbreviate-only) path with
the reference's semantics: ordered global replaces over RAW lines
(common.go:104-127); literals, terminal dots and spacing are untouched.
The expected output is computed independently with sequential
str.replace — the same chain perl's ``s@prefix@shortcut:@g`` applies."""

import glob

from ntto_ray.cli import main
from ntto_ray.core import NULL_SENTINEL, parse_rules

RULES_TXT = """
gnd http://d-nb.info/gnd/
dbp http://dbpedia.org/resource/
<NULL> http://drop.me/
"""

LINES = [
    '<http://d-nb.info/gnd/118540238> <http://dbpedia.org/resource/knows> "a literal with http://d-nb.info/gnd/999 inside" .',
    "<http://dbpedia.org/resource/Berlin> <http://p/> <http://unknown.example/x> .",
    '<http://drop.me/s> <http://p/> "keep  double  spaces" .',
]


def _expected(lines, rules):
    out = []
    for line in lines:
        for r in rules:
            repl = "" if r.shortcut == NULL_SENTINEL else r.shortcut + ":"
            line = line.replace(r.prefix, repl)
        out.append(line)
    return out


def test_cli_abbrev_only_byte_parity(ray_session, tmp_path):
    src = tmp_path / "in.nt"
    src.write_text("\n".join(LINES) + "\n")
    rules_file = tmp_path / "rules.txt"
    rules_file.write_text(RULES_TXT)
    out_dir = tmp_path / "out"

    rc = main(["-a", "-r", str(rules_file), "-o", str(out_dir), str(src)])
    assert rc == 0

    got = []
    for f in sorted(glob.glob(f"{out_dir}/*")):
        with open(f, "rb") as fh:
            got.extend(fh.read().decode("utf-8").splitlines())
    want = _expected(LINES, parse_rules(RULES_TXT))
    assert sorted(got) == sorted(want)
    # reference quirks preserved byte-for-byte: quoted literal object
    # (with an abbreviated IRI inside it), terminal dot, double spaces
    assert any('"a literal with gnd:999 inside" .' in l for l in got)
    assert any("keep  double  spaces" in l for l in got)
    # NULL rule deletes its prefix anywhere in the line
    assert any(l.startswith("<s> ") for l in got)


def test_cli_dump_rules(capsys):
    rc = main(["-d", "-r", "/dev/null"])
    assert rc == 0
