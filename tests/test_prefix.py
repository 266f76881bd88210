"""Unit tests for the vectorized prefix-cut: anchored longest-match vs
the reference's ordered-replace (sed-parity) semantics."""

import pyarrow as pa

from ntto_ray.core import Rule, apply_rules_ordered, default_rules
from ntto_ray.stages.prefix import (
    CompiledRules,
    PrefixCut,
    apply_rules_ordered_array,
)


def test_anchored_longest_match_fixes_shadowing():
    rules = default_rules()
    c = CompiledRules(rules)
    # ordered mode: dbp (rules.go:4) fires first → dbp:Category:X
    assert (
        apply_rules_ordered("http://dbpedia.org/resource/Category:X", rules)
        == "dbp:Category:X"
    )
    # anchored longest-match: the longer category prefix (rules.go:141) wins
    assert c.cut_str("http://dbpedia.org/resource/Category:X") == "category:X"
    assert c.cut_str("http://dbpedia.org/resource/Berlin") == "dbp:Berlin"
    assert c.cut_str("http://unknown.example/x") == "http://unknown.example/x"


def test_modes_agree_on_nonoverlapping_rules():
    rules = [Rule("gnd", "http://d-nb.info/gnd/"), Rule("foaf", "http://xmlns.com/foaf/0.1/")]
    c = CompiledRules(rules)
    vals = [
        "http://d-nb.info/gnd/1-2",
        "http://xmlns.com/foaf/0.1/name",
        "plain literal",
        "",
    ]
    anchored = c.cut_array(pa.array(vals)).to_pylist()
    ordered = apply_rules_ordered_array(pa.array(vals), rules).to_pylist()
    assert anchored == ordered == ["gnd:1-2", "foaf:name", "plain literal", ""]


def test_null_sentinel_deletes_prefix():
    rules = [Rule("<NULL>", "http://kill.me/")]
    c = CompiledRules(rules)
    assert c.cut_str("http://kill.me/rest") == "rest"
    assert apply_rules_ordered_array(pa.array(["x http://kill.me/y"]), rules).to_pylist() == ["x y"]


def test_ordered_replaces_anywhere_anchored_only_at_start():
    rules = [Rule("a", "http://x/")]
    c = CompiledRules(rules)
    v = "see http://x/thing"
    assert c.cut_str(v) == v  # anchored: not at start → unchanged
    assert apply_rules_ordered_array(pa.array([v]), rules).to_pylist() == ["see a:thing"]


def test_duplicate_prefix_first_wins():
    # georss (rules.go:160) precedes grs (rules.go:163) for the same prefix;
    # both modes must let the first rule fire.
    rules = default_rules()
    c = CompiledRules(rules)
    out = c.cut_str("http://www.georss.org/georss/point")
    assert out == "georss:point"
    assert (
        apply_rules_ordered("http://www.georss.org/georss/point", rules)
        == "georss:point"
    )


def test_prefix_cut_stage_batch():
    stage = PrefixCut(rules=[("gnd", "http://d-nb.info/gnd/")])
    batch = pa.table(
        {
            "subj": ["http://d-nb.info/gnd/9"],
            "pred": ["http://d-nb.info/gnd/p"],
            "obj": ["o"],
            "conv_id": ["c"],
            "turn_idx": pa.array([0], type=pa.int32()),
        }
    )
    out = stage(batch)
    assert out["subj"].to_pylist() == ["gnd:9"]
    assert out["pred"].to_pylist() == ["gnd:p"]
    assert out["obj"].to_pylist() == ["o"]


def test_compiled_rules_parent_chain():
    # nested prefixes: ab, a — value matching neither candidate directly
    rules = [Rule("A", "a"), Rule("AB", "ab"), Rule("B", "b")]
    c = CompiledRules(rules)
    assert c.cut_str("abc") == "AB:c"
    assert c.cut_str("az") == "A:z"
    assert c.cut_str("b") == "B:"
    assert c.cut_str("c") == "c"
