"""Shared specification of the synthetic transcript corpus and the KG
extraction semantics, plus DuckDB-SQL generators that mirror each stage.

The engine's input (per the target contract) is a Parquet table of
multi-turn conversation/agent transcripts with columns
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``. The sandbox test data has no such table, so we
synthesize one DETERMINISTICALLY from the driver's ``documents`` table:
every document becomes one conversation of ``TURNS_PER_CONV`` turns whose
text embeds IRIs (entity mentions) plus a slice of the document text
(alias mentions for the entity linker). Because the synthesis is pure and
SQL-expressible, every downstream KG stage (extract → prefix-cut →
canonicalize → adjacency) has an exact DuckDB oracle over the
``documents`` view — the generators below emit that SQL from the same
constants the Ray stages use.

Triple vocabulary (all example.org — disjoint from the default
namespace-rule table so abbreviation behavior is controlled):

  (conv_iri,  ont:hasTurn,        turn_iri)          structural
  (turn_iri,  rdf:type,           ont:<role>)        structural
  (turn_iri,  ont:mentions,       <iri found in text>)   mention detector
  (turn_iri,  ont:mentionsEntity, <linked alias iri>)    entity linker
"""

from __future__ import annotations

TURNS_PER_CONV = 6
CHUNK = 37  # characters of document text embedded per turn
EPOCH = "2025-01-01 00:00:00"
TOPIC_MOD = 211
GND_MOD = 97
STATUS_MOD = 7

ROLES = ("user", "assistant", "tool")

ONT = "http://example.org/ont#"
CONV_NS = "http://example.org/conv/"
SOURCE_NS = "http://example.org/source/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

P_HAS_TURN = ONT + "hasTurn"
P_MENTIONS = ONT + "mentions"
P_MENTIONS_ENTITY = ONT + "mentionsEntity"
# conversation-level edge, emitted once per mentioning TURN — so the same
# (conv, discusses, entity) triple recurs across turns and the
# canonicalize shuffle has real multiplicities to collapse (cnt > 1)
P_DISCUSSES = ONT + "discusses"

# Entity-linker gazetteer: token → canonical IRI. Tokens are drawn from the
# synthetic documents' vocabulary; chosen so no alias is a proper
# prefix/suffix of another.
ALIASES: dict[str, str] = {
    "spark": "http://dbpedia.org/resource/Apache_Spark",
    "window": "http://dbpedia.org/resource/Window_function",
    "hash": "http://dbpedia.org/resource/Hash_function",
    "vector": "http://dbpedia.org/resource/Euclidean_vector",
    "stream": "http://dbpedia.org/resource/Stream_processing",
    "merge": "http://dbpedia.org/resource/Merge_algorithm",
}

# IRI mention pattern used by the detector AND by the SQL oracle
# (regexp_extract_all group 1).
IRI_PATTERN = r"<([^<> ]+)>"

# Extra abbreviation rules for the pipeline's own namespaces, applied on
# top of the built-in default table (core.default_rules).
EXTRA_RULES = [
    ("exconv", CONV_NS),
    ("exsrc", SOURCE_NS),
    ("exont", ONT),
]


# --------------------------------------------------------------------------
# SQL generators (DuckDB dialect). Each returns a SELECT usable as a CTE.
# --------------------------------------------------------------------------

def transcripts_sql(documents: str = "documents") -> str:
    """SQL producing exactly the rows of the synthesized transcripts table."""
    c = CHUNK
    return f"""
SELECT
  printf('conv-%08d', d.doc_id)                       AS conv_id,
  CAST(ks.k AS INTEGER)                               AS turn_idx,
  CASE ks.k % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
  CASE ks.k % 3
    WHEN 0 THEN substr(d.text, 1 + ks.k*{c}, {c})
      || ' please look into <http://dbpedia.org/resource/Topic_' || (d.doc_id % {TOPIC_MOD})
      || '> and ' || d.lang
    WHEN 1 THEN substr(d.text, 1 + ks.k*{c}, {c})
      || ' found <http://dbpedia.org/resource/Topic_' || (d.doc_id % {TOPIC_MOD})
      || '> see also <http://d-nb.info/gnd/' || (d.doc_id % {GND_MOD}) || '-' || ks.k || '>'
    ELSE 'result ' || substr(d.text, 1 + ks.k*{c}, {c})
      || ' from <{SOURCE_NS}' || d.source || '> status ' || (d.doc_id % {STATUS_MOD})
  END                                                 AS text,
  CASE ks.k % 3 WHEN 2 THEN 'search' ELSE '' END      AS tool,
  TIMESTAMP '{EPOCH}' + INTERVAL (d.doc_id*60 + ks.k*5) SECOND AS ts
FROM {documents} d, (SELECT unnest(range({TURNS_PER_CONV})) AS k) ks
""".strip()


def turn_iri_sql(conv_id: str = "conv_id", turn_idx: str = "turn_idx") -> str:
    return f"'{CONV_NS}' || {conv_id} || '/turn/' || {turn_idx}"


def triples_raw_sql(documents: str = "documents") -> str:
    """SQL mirroring extract (detector + linker + emit): one row per raw
    triple, with lineage columns (conv_id, turn_idx). DISTINCT within turn
    for mention/alias triples, matching the engine's per-turn dedup."""
    alias_values = ",\n    ".join(
        f"('{tok}', '{iri}')" for tok, iri in sorted(ALIASES.items())
    )
    return f"""
WITH t AS ({transcripts_sql(documents)}),
structural AS (
  SELECT '{CONV_NS}' || conv_id AS subj, '{P_HAS_TURN}' AS pred,
         {turn_iri_sql()} AS obj, conv_id, turn_idx FROM t
  UNION ALL
  SELECT {turn_iri_sql()} AS subj, '{RDF_TYPE}' AS pred,
         '{ONT}' || role AS obj, conv_id, turn_idx FROM t
),
mentions AS (
  SELECT DISTINCT {turn_iri_sql("t.conv_id", "t.turn_idx")} AS subj,
         '{P_MENTIONS}' AS pred, u.iri AS obj, t.conv_id, t.turn_idx
  FROM t, unnest(regexp_extract_all(t.text, '{IRI_PATTERN}', 1)) AS u(iri)
),
aliases(tok, iri) AS (VALUES
    {alias_values}
),
linked AS (
  SELECT DISTINCT {turn_iri_sql("t.conv_id", "t.turn_idx")} AS subj,
         '{P_MENTIONS_ENTITY}' AS pred, a.iri AS obj, t.conv_id, t.turn_idx
  FROM t, unnest(string_split(t.text, ' ')) AS w(tok)
  JOIN aliases a ON a.tok = w.tok
)
SELECT * FROM structural
UNION ALL SELECT * FROM mentions
UNION ALL SELECT * FROM linked
UNION ALL SELECT '{CONV_NS}' || conv_id AS subj, '{P_DISCUSSES}' AS pred,
       obj, conv_id, turn_idx FROM mentions
UNION ALL SELECT '{CONV_NS}' || conv_id AS subj, '{P_DISCUSSES}' AS pred,
       obj, conv_id, turn_idx FROM linked
""".strip()


def rules_values_sql(rules) -> str:
    """VALUES list for a (shortcut, prefix) rule table CTE."""
    rows = ",\n    ".join(
        "('{}', '{}')".format(r.shortcut.replace("'", "''"), r.prefix.replace("'", "''"))
        for r in rules
    )
    return f"(VALUES\n    {rows})"


def prefix_cut_col_sql(col: str, rules_cte: str = "rules", null: str = "<NULL>") -> str:
    """Anchored longest-prefix-match abbreviation of one column, mirroring
    the engine's default (documented-divergence) semantics: the longest
    rule prefix matching at the START of the value is cut to
    ``shortcut || ':'`` (or '' for the null sentinel); no match → value
    unchanged."""
    return f"""coalesce(
  (SELECT CASE WHEN r.shortcut = '{null}' THEN '' ELSE r.shortcut || ':' END
            || substr({col}, length(r.prefix) + 1)
   FROM {rules_cte} r
   WHERE starts_with({col}, r.prefix)
   ORDER BY length(r.prefix) DESC, r.shortcut
   LIMIT 1),
  {col})"""


def triples_abbrev_sql(rules, documents: str = "documents") -> str:
    return f"""
WITH raw AS ({triples_raw_sql(documents)}),
rules(shortcut, prefix) AS {rules_values_sql(rules)}
SELECT {prefix_cut_col_sql("raw.subj")} AS subj,
       {prefix_cut_col_sql("raw.pred")} AS pred,
       {prefix_cut_col_sql("raw.obj")} AS obj,
       raw.conv_id, raw.turn_idx
FROM raw
""".strip()


def triples_canonical_sql(rules, documents: str = "documents") -> str:
    return f"""
WITH abbrev AS ({triples_abbrev_sql(rules, documents)})
SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS cnt
FROM abbrev GROUP BY subj, pred, obj
""".strip()


def adjacency_sql(rules, documents: str = "documents") -> str:
    return f"""
WITH canon AS ({triples_canonical_sql(rules, documents)})
SELECT subj, CAST(count(*) AS BIGINT) AS degree, CAST(sum(cnt) AS BIGINT) AS weight
FROM canon GROUP BY subj
""".strip()
