"""Prefix abbreviation — ntto's core algorithm as a vectorized Arrow
string transform.

Two modes (see SURVEY.md §2.4):

- **anchored** (default): the rule table is compiled into a
  longest-prefix-match structure (sorted prefix array + parent chain — a
  flattened trie) and applied at the START of each field. Vectorized with
  numpy ``searchsorted`` over the whole column; the per-rule suffix cut is
  grouped by matched rule (≤ #rules kernel calls per batch, each on a
  disjoint row subset). This is the target's documented divergence from
  the reference: order-independent and strictly more precise than the
  reference's ordered global replace (fixes the ``dbp:``/``category:``
  shadowing of rules.go:4 vs rules.go:141).

- **sed-parity**: the reference's exact semantics — global substring
  replace anywhere in the string, rule order (common.go:104-127, perl
  ``s@prefix@shortcut:@g`` applied rule by rule). One
  ``pc.replace_substring`` kernel pass per rule.

On the reference's own fixtures the two agree (no overlapping prefixes
there); tests/test_prefix.py pins both modes and their agreement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ntto_ray.core import NULL_SENTINEL, Rule


class CompiledRules:
    """Longest-prefix-match table: prefixes sorted lexicographically with a
    parent pointer to each prefix's longest proper prefix also in the set.

    Lookup for a value v: binary search for the lexicographic predecessor
    prefix, then walk the parent chain until a true prefix of v is found
    (standard LPM trick; chain depth = max prefix nesting, ~2-3 for real
    namespace tables).
    """

    def __init__(self, rules: list[Rule], null: str = NULL_SENTINEL):
        # Last rule wins for duplicate prefixes (dict semantics); the
        # reference's ordered mode instead lets the FIRST occurrence fire
        # (georss vs grs, rules.go:160,163) — for anchored mode we keep
        # first-wins to match: skip prefixes already seen.
        seen: dict[str, str] = {}
        for r in rules:
            if r.prefix not in seen:
                seen[r.prefix] = "" if r.shortcut == null else r.shortcut + ":"
        order = np.argsort(np.array(list(seen.keys()), dtype=object))
        self.prefixes = np.array(list(seen.keys()), dtype=object)[order]
        self.repls = np.array(list(seen.values()), dtype=object)[order]
        self.plens = np.array([len(p) for p in self.prefixes], dtype=np.int64)
        # parent[i] = index of longest proper prefix of prefixes[i] in the
        # set, else -1
        idx_of = {p: i for i, p in enumerate(self.prefixes)}
        parent = np.full(len(self.prefixes), -1, dtype=np.int64)
        for i, p in enumerate(self.prefixes):
            q = p[:-1]
            while q:
                j = idx_of.get(q)
                if j is not None:
                    parent[i] = j
                    break
                q = q[:-1]
        self.parent = parent
        self._prefixes_u = self.prefixes.astype("U")
        self._prefix_list = list(self.prefixes)
        self._max_plen = int(self.plens.max()) if len(self.plens) else 0

    def match(self, values: np.ndarray) -> np.ndarray:
        """Vectorized longest-prefix match. ``values``: numpy str (U) array.
        Returns int64 array of matched rule indices (-1 = no match)."""
        cand = np.searchsorted(self._prefixes_u, values, side="right") - 1
        cand = cand.astype(np.int64)
        active = cand >= 0
        result = np.full(len(values), -1, dtype=np.int64)
        # walk parent chains; bounded by max nesting depth
        while active.any():
            ai = np.flatnonzero(active)
            c = cand[ai]
            # prefix check as truncate-and-compare, grouped by prefix
            # length: values[:L] == prefix is a C memcmp per row, ~9×
            # faster than np.char.startswith (which loops str objects)
            ok = np.zeros(len(ai), dtype=bool)
            vals = values[ai]
            pl = self.plens[c]
            for L in np.unique(pl):
                m = pl == L
                ok[m] = vals[m].astype(f"U{int(L)}") == self._prefixes_u[c[m]]
            hit = ai[ok]
            result[hit] = c[ok]
            miss = ai[~ok]
            cand[miss] = self.parent[cand[miss]]
            active[:] = False
            active[miss] = cand[miss] >= 0
        return result

    def match_str(self, value: str) -> int:
        """Scalar longest-prefix match (bisect + parent chain)."""
        import bisect

        c = bisect.bisect_right(self._prefix_list, value) - 1
        while c >= 0:
            if value.startswith(self._prefix_list[c]):
                return c
            c = int(self.parent[c])
        return -1

    def cut_array(self, arr: pa.Array) -> pa.Array:
        """Apply anchored longest-prefix abbreviation to a string array.

        The match is decided by each value's first ``max_plen``
        characters (no rule prefix is longer), so: slice heads →
        ``dictionary_encode`` → scalar-LPM only the UNIQUE heads →
        scatter via the dictionary indices. Namespace-shaped data has few
        distinct heads (IRIs cluster by namespace), so the Python work is
        O(unique heads), not O(rows); everything row-scale is an Arrow
        kernel. The cut itself runs one slice+concat kernel per distinct
        matched rule over disjoint row subsets, reassembled with a single
        ``take`` (O(n) total, no per-row Python strings)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        heads = pc.utf8_slice_codeunits(arr, start=0, stop=self._max_plen)
        enc = heads.dictionary_encode()
        uniq = enc.dictionary.to_numpy(zero_copy_only=False)
        # vectorized LPM over the unique heads (searchsorted + parent
        # chain) — on entity-suffixed IRIs most heads are DISTINCT, so a
        # scalar per-head loop is O(rows) Python (measured 100+ ms per
        # 65k heads vs ~5 ms vectorized)
        m_per_head = self.match(uniq.astype("U"))
        matched = m_per_head[
            enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ]
        if (matched < 0).all():
            return arr
        # group rows by matched rule; unmatched (-1) come first
        order = np.argsort(matched, kind="stable")
        sorted_m = matched[order]
        bounds = np.searchsorted(
            sorted_m, np.arange(-1, len(self.prefixes) + 1)
        )
        pieces: list[pa.Array] = []
        if bounds[1] > 0:  # unmatched subset, passed through
            pieces.append(arr.take(pa.array(order[: bounds[1]])))
        for r in np.unique(sorted_m[sorted_m >= 0]):
            rows = order[bounds[r + 1] : bounds[r + 2]]
            sub = arr.take(pa.array(rows))
            cut = pc.utf8_slice_codeunits(sub, start=int(self.plens[r]))
            pieces.append(
                pc.binary_join_element_wise(
                    pa.scalar(str(self.repls[r])), cut, ""
                )
            )
        merged = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in pieces]
        )
        inverse = np.empty(len(order), dtype=np.int64)
        inverse[order] = np.arange(len(order))
        return merged.take(pa.array(inverse))

    def cut_str(self, value: str) -> str:
        """Scalar convenience (tests, CLI)."""
        out = self.cut_array(pa.array([value]))
        return out[0].as_py()


def apply_rules_ordered_array(
    arr: pa.Array | pa.ChunkedArray, rules: list[Rule], null: str = NULL_SENTINEL
) -> pa.Array:
    """Sed-parity mode, vectorized: one global replace_substring pass per
    rule, in rule order — exactly the reference's perl pipeline semantics
    (common.go:104-127) over an Arrow column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    for r in rules:
        repl = "" if r.shortcut == null else r.shortcut + ":"
        arr = pc.replace_substring(arr, pattern=r.prefix, replacement=repl)
    return arr


class RawLineAbbrev:
    """``-a``-only CLI stage with byte parity to the reference: the
    reference's abbreviate path never parses — it pipes raw NT lines
    through ordered global replaces (``perl s@prefix@shortcut:@g`` per
    rule, common.go:104-127) — so this stage applies the same ordered
    replace chain directly to the raw ``text`` column. Literal objects,
    terminal dots and whitespace all round-trip byte-identically
    (round 1 parsed + re-rendered, which rewrote literals as IRIs)."""

    def __init__(self, rules: list[tuple[str, str]], null: str = NULL_SENTINEL):
        self._rules = [Rule(shortcut=s, prefix=p) for s, p in rules]
        self._null = null

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = apply_rules_ordered_array(batch["text"], self._rules, self._null)
        return pa.table({"line": out})


class PrefixCut:
    """Actor-pool ``map_batches`` stage applying abbreviation to the triple
    columns. The compiled rule table is built once per actor in
    ``__init__`` (from plain rule tuples shipped via
    ``fn_constructor_kwargs`` — a few KB, serialized once per actor)."""

    def __init__(
        self,
        rules: list[tuple[str, str]],
        columns: tuple[str, ...] = ("subj", "pred", "obj"),
        mode: str = "anchored",
        null: str = NULL_SENTINEL,
    ):
        self._rules = [Rule(shortcut=s, prefix=p) for s, p in rules]
        self._columns = columns
        self._mode = mode
        self._null = null
        self._compiled = CompiledRules(self._rules, null=null) if mode == "anchored" else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col in self._columns:
            i = batch.column_names.index(col)
            arr = batch[col]
            if self._mode == "anchored":
                cut = self._compiled.cut_array(arr)
            else:
                cut = apply_rules_ordered_array(arr, self._rules, self._null)
            batch = batch.set_column(i, col, cut)
        return batch
