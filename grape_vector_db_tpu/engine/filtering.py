"""Filter engine — payload predicates, geo filters, SQL WHERE parsing.

Rebuilds the reference's FilterEngine (src/filtering.rs): the condition
vocabulary (Comparison/Logical/Geospatial/Nested/TextSearch, filtering.rs:39-148),
per-field value/numeric/text indexes (filtering.rs:201-333), an R-tree-equivalent
geo index (vectorized haversine over packed coordinate arrays — filtering.rs
uses `rstar`; at vector-DB candidate counts a vectorized scan is faster on this
architecture and has no pointer-chasing), set algebra for AND/OR/NOT
(filtering.rs:439-488), and a SQL WHERE-clause parser (filtering.rs:763-940;
hand-rolled recursive descent here since we take no parser dependency).

Unlike the reference — where many operators are stubbed to `Ok(Vec::new())`
(filtering.rs:430-431, 572-592) — every operator below is implemented.

The engine also compiles filters to slot-aligned boolean masks
(``mask_for_slots``) so the device index can run masked top-k in one kernel.
"""

from __future__ import annotations

import fnmatch
import math
import re
import threading
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Sequence, Set, Tuple, Union

import numpy as np

from grape_vector_db_tpu.errors import InvalidArgumentError
from grape_vector_db_tpu.types import Condition, Filter

__all__ = ["FilterEngine", "FilterStatistics", "parse_sql_where", "haversine_m"]

_EARTH_R_M = 6_371_000.0


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters (vectorized)."""
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * _EARTH_R_M * np.arcsin(np.sqrt(a))


def _flatten(meta: Dict[str, Any], prefix: str = "") -> Iterable[Tuple[str, Any]]:
    """Flatten nested payload dicts to dotted paths (JsonPath-style nested access,
    filtering.rs Nested operators)."""
    for k, v in meta.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict) and not _is_geo_dict(v):
            yield from _flatten(v, path + ".")
        else:
            yield path, v


def _is_geo_dict(v: Any) -> bool:
    return isinstance(v, dict) and {"lat", "lon"} <= set(v.keys())


@dataclass
class FilterStatistics:
    """filtering.rs:740-761."""

    indexed_documents: int = 0
    indexed_fields: int = 0
    geo_points: int = 0
    filters_executed: int = 0


class FilterEngine:
    """Per-field indexes + filter AST evaluation."""

    def __init__(self) -> None:
        self._lock = threading.RLock()
        # field -> value(hashable) -> set(ids)
        self._value_index: Dict[str, Dict[Any, Set[str]]] = {}
        # field -> id -> float
        self._numeric: Dict[str, Dict[str, float]] = {}
        # field -> id -> str
        self._text: Dict[str, Dict[str, str]] = {}
        # field -> id -> (lat, lon)
        self._geo: Dict[str, Dict[str, Tuple[float, float]]] = {}
        # id -> set of fields present
        self._doc_fields: Dict[str, Set[str]] = {}
        # field -> id -> list (for array_contains)
        self._arrays: Dict[str, Dict[str, List[Any]]] = {}
        self._stats = FilterStatistics()

    # -- indexing ----------------------------------------------------------------

    def index_document(self, id_: str, metadata: Dict[str, Any]) -> None:
        with self._lock:
            self._index_locked(id_, metadata)
            self._refresh_stats_locked()

    def index_documents(self, items) -> None:
        """Batch indexing: one lock acquisition and one stats refresh for the
        whole ingest batch (the per-doc stats recompute walked every field
        map per document — a measurable slice of the write path)."""
        with self._lock:
            for id_, metadata in items:
                self._index_locked(id_, metadata)
            self._refresh_stats_locked()

    def _index_locked(self, id_: str, metadata: Dict[str, Any]) -> None:
        # Ingest hot loop (8.1 us/doc measured -> ~1/3 of the end-to-end
        # write budget at 39k docs/s): exact-type dispatch instead of the
        # isinstance cascade, and an explicit stack instead of the _flatten
        # generator. Exotic values (numpy scalars, subclasses) fall through
        # to the original isinstance path so semantics are unchanged.
        if id_ in self._doc_fields:
            self._remove_locked(id_)
        fields: Set[str] = set()
        add_field = fields.add
        vi = self._value_index
        stack = [("", metadata or {})]
        while stack:
            prefix, m = stack.pop()
            for k, v in m.items():
                path = prefix + k
                t = type(v)
                if t is str:
                    add_field(path)
                    self._text.setdefault(path, {})[id_] = v
                    vi.setdefault(path, {}).setdefault(v, set()).add(id_)
                elif t is int or t is float:
                    add_field(path)
                    self._numeric.setdefault(path, {})[id_] = float(v)
                    vi.setdefault(path, {}).setdefault(v, set()).add(id_)
                elif t is bool:
                    add_field(path)
                    vi.setdefault(path, {}).setdefault(v, set()).add(id_)
                elif t is dict:
                    if "lat" in v and "lon" in v:
                        add_field(path)
                        self._geo.setdefault(path, {})[id_] = (
                            float(v["lat"]), float(v["lon"]))
                    else:
                        stack.append((path + ".", v))
                elif t is list or t is tuple:
                    add_field(path)
                    self._arrays.setdefault(path, {})[id_] = list(v)
                    for item in v:
                        if isinstance(item, (str, int, float, bool)):
                            vi.setdefault(path, {}).setdefault(
                                item, set()).add(id_)
                elif v is None:
                    pass  # null == absent for exists/is_null
                else:
                    self._index_value_slow(id_, path, v, fields, stack)
        self._doc_fields[id_] = fields

    def _index_value_slow(self, id_: str, path: str, v: Any,
                          fields: Set[str], stack: list) -> None:
        """Original isinstance-cascade semantics for values whose exact type
        the fast dispatch doesn't know (numpy scalars, str/dict subclasses)."""
        fields.add(path)
        if _is_geo_dict(v):
            self._geo.setdefault(path, {})[id_] = (float(v["lat"]), float(v["lon"]))
        elif isinstance(v, dict):
            fields.discard(path)
            stack.append((path + ".", v))
        elif isinstance(v, bool):
            self._value_index.setdefault(path, {}).setdefault(v, set()).add(id_)
        elif isinstance(v, (int, float)):
            self._numeric.setdefault(path, {})[id_] = float(v)
            self._value_index.setdefault(path, {}).setdefault(v, set()).add(id_)
        elif isinstance(v, str):
            self._text.setdefault(path, {})[id_] = v
            self._value_index.setdefault(path, {}).setdefault(v, set()).add(id_)
        elif isinstance(v, (list, tuple)):
            self._arrays.setdefault(path, {})[id_] = list(v)
            for item in v:
                if isinstance(item, (str, int, float, bool)):
                    self._value_index.setdefault(path, {}).setdefault(
                        item, set()).add(id_)

    def _refresh_stats_locked(self) -> None:
        self._stats.indexed_documents = len(self._doc_fields)
        self._stats.indexed_fields = len(
            set(self._value_index) | set(self._numeric) | set(self._text) | set(self._geo)
        )
        self._stats.geo_points = sum(len(m) for m in self._geo.values())

    def remove_document(self, id_: str) -> None:
        with self._lock:
            self._remove_locked(id_)

    def _remove_locked(self, id_: str) -> None:
        if id_ not in self._doc_fields:
            return
        for vmap in self._value_index.values():
            for s in vmap.values():
                s.discard(id_)
        for m in self._numeric.values():
            m.pop(id_, None)
        for m in self._text.values():
            m.pop(id_, None)
        for m in self._geo.values():
            m.pop(id_, None)
        for m in self._arrays.values():
            m.pop(id_, None)
        del self._doc_fields[id_]
        self._stats.indexed_documents = len(self._doc_fields)

    def clear(self) -> None:
        with self._lock:
            # Reset in place; replacing the lock via __init__ would break
            # concurrent holders of the old lock.
            self._value_index = {}
            self._numeric = {}
            self._text = {}
            self._geo = {}
            self._doc_fields = {}
            self._arrays = {}
            self._stats = FilterStatistics()

    # -- evaluation ------------------------------------------------------------------

    def all_ids(self) -> Set[str]:
        return set(self._doc_fields.keys())

    def execute_filter(self, filt: Union[Filter, Condition]) -> List[str]:
        """Evaluate a filter to a doc-id list (filtering.rs:374-400)."""
        with self._lock:
            self._stats.filters_executed += 1
            return sorted(self._eval(filt))

    def _eval(self, node: Union[Filter, Condition]) -> Set[str]:
        if isinstance(node, Condition):
            return self._eval_condition(node)
        if isinstance(node, Filter):
            universe: Optional[Set[str]] = None
            if node.must:
                universe = self._eval(node.must[0])
                for child in node.must[1:]:
                    universe &= self._eval(child)
            if node.should:
                s: Set[str] = set()
                for child in node.should:
                    s |= self._eval(child)
                universe = s if universe is None else (universe & s)
            if node.must_not:
                base = universe if universe is not None else self.all_ids()
                for child in node.must_not:
                    base = base - self._eval(child)
                universe = base
            return universe if universe is not None else self.all_ids()
        raise InvalidArgumentError(f"bad filter node: {node!r}")

    def _eval_condition(self, c: Condition) -> Set[str]:
        op = c.op
        f = c.field
        if op == "eq":
            return set(self._value_index.get(f, {}).get(c.value, set()))
        if op == "ne":
            has_field = {i for i, fl in self._doc_fields.items() if f in fl}
            return has_field - self._value_index.get(f, {}).get(c.value, set())
        if op in ("gt", "gte", "lt", "lte"):
            nums = self._numeric.get(f, {})
            v = float(c.value)
            cmp = {
                "gt": lambda x: x > v,
                "gte": lambda x: x >= v,
                "lt": lambda x: x < v,
                "lte": lambda x: x <= v,
            }[op]
            return {i for i, x in nums.items() if cmp(x)}
        if op == "like":
            # SQL LIKE compiled to an anchored regex: everything except the SQL
            # wildcards is escaped, so literal *, ?, [ ] in the pattern match
            # themselves (fnmatch treated them as glob metacharacters).
            parts = []
            for ch in str(c.value):
                if ch == "%":
                    parts.append(".*")
                elif ch == "_":
                    parts.append(".")
                else:
                    parts.append(re.escape(ch))
            rx = re.compile("(?s)^" + "".join(parts) + "$", re.IGNORECASE)
            texts = self._text.get(f, {})
            return {i for i, s in texts.items() if rx.match(s)}
        if op == "in":
            vmap = self._value_index.get(f, {})
            out: Set[str] = set()
            for v in (c.value or []):
                out |= vmap.get(v, set())
            return out
        if op == "is_null":
            return {i for i, fl in self._doc_fields.items() if f not in fl}
        if op in ("is_not_null", "exists"):
            return {i for i, fl in self._doc_fields.items() if f in fl}
        if op == "array_contains":
            return set(self._value_index.get(f, {}).get(c.value, set()))
        if op == "text_match":
            needle = str(c.value).lower()
            texts = self._text.get(f, {})
            return {i for i, s in texts.items() if needle in s.lower()}
        if op == "geo_within_distance":
            return self._geo_within(f, c.value)
        if op == "geo_bounding_box":
            return self._geo_bbox(f, c.value)
        raise InvalidArgumentError(f"unknown filter op: {op}")

    def _geo_within(self, f: str, spec: Dict[str, Any]) -> Set[str]:
        """{"lat":..,"lon":..,"radius_m":..} — haversine radius (filtering.rs Near/WithinDistance)."""
        pts = self._geo.get(f, {})
        if not pts:
            return set()
        ids = list(pts.keys())
        arr = np.asarray([pts[i] for i in ids], dtype=np.float64)
        d = haversine_m(arr[:, 0], arr[:, 1], float(spec["lat"]), float(spec["lon"]))
        keep = d <= float(spec["radius_m"])
        return {ids[i] for i in np.nonzero(keep)[0]}

    def _geo_bbox(self, f: str, spec: Dict[str, Any]) -> Set[str]:
        """{"min_lat","min_lon","max_lat","max_lon"} box (filtering.rs Within)."""
        pts = self._geo.get(f, {})
        out = set()
        for i, (lat, lon) in pts.items():
            if (float(spec["min_lat"]) <= lat <= float(spec["max_lat"])
                    and float(spec["min_lon"]) <= lon <= float(spec["max_lon"])):
                out.add(i)
        return out

    # -- device mask compilation -----------------------------------------------------

    def mask_for_slots(self, filt: Union[Filter, Condition, Set[str]],
                       slot_to_id: Sequence[Optional[str]],
                       id_to_slot: Optional[Dict[str, int]] = None) -> np.ndarray:
        """Compile a filter to a slot-aligned boolean mask for masked device top-k
        (SURVEY.md §2.1 filter row: 'filters compile to boolean masks').

        ``filt`` may be a Filter/Condition (evaluated here) or an already
        evaluated allowed-id set. With ``id_to_slot`` the mask is built in
        O(|allowed|) — the production planner path for selective filters over
        large corpora; without it, the O(capacity) slot scan is used."""
        allowed = filt if isinstance(filt, (set, frozenset)) else self._eval(filt)
        return mask_from_allowed(allowed, slot_to_id, id_to_slot)

    def get_stats(self) -> FilterStatistics:
        return self._stats

    # -- SQL ---------------------------------------------------------------------------

    def parse_sql(self, where_clause: str) -> Filter:
        return parse_sql_where(where_clause)


def mask_from_allowed(allowed: Set[str],
                      slot_to_id: Sequence[Optional[str]],
                      id_to_slot: Optional[Dict[str, int]] = None) -> np.ndarray:
    """Slot-aligned boolean mask from an allowed-id set. With ``id_to_slot``
    the build is O(|allowed|) (the hot path for selective filters)."""
    if id_to_slot is not None:
        mask = np.zeros(len(slot_to_id), dtype=bool)
        for id_ in allowed:
            slot = id_to_slot.get(id_)
            if slot is not None:
                mask[slot] = True
        return mask
    return np.asarray([(i is not None and i in allowed) for i in slot_to_id], dtype=bool)


# ---------------------------------------------------------------------------------
# SQL WHERE parser (filtering.rs:763-940 SqlFilterParser, dependency-free)
# ---------------------------------------------------------------------------------

_TOKEN_SPEC = [
    ("WS", r"\s+"),
    ("NUMBER", r"-?\d+(\.\d+)?"),
    ("STRING", r"'(?:[^'\\]|\\.)*'"),
    ("OP", r"<>|!=|>=|<=|=|>|<"),
    ("LPAREN", r"\("),
    ("RPAREN", r"\)"),
    ("COMMA", r","),
    ("IDENT", r"[A-Za-z_][A-Za-z0-9_.]*"),
]
_TOKEN_RE = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC))
_KEYWORDS = {"and", "or", "not", "in", "like", "is", "null", "between", "true", "false"}


@dataclass
class _Tok:
    kind: str
    value: str


def _lex(sql: str) -> List[_Tok]:
    toks: List[_Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise InvalidArgumentError(f"bad SQL at: {sql[pos:pos+20]!r}")
        kind = m.lastgroup
        text = m.group(0)
        pos = m.end()
        if kind == "WS":
            continue
        if kind == "IDENT" and text.lower() in _KEYWORDS:
            toks.append(_Tok(text.lower().upper(), text.lower()))
        else:
            toks.append(_Tok(kind, text))
    toks.append(_Tok("EOF", ""))
    return toks


class _Parser:
    """expr := and_expr (OR and_expr)* ; and_expr := unary (AND unary)* ;
    unary := NOT unary | primary ; primary := '(' expr ')' | predicate"""

    def __init__(self, toks: List[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> _Tok:
        t = self.next()
        if t.kind != kind:
            raise InvalidArgumentError(f"expected {kind}, got {t.kind} {t.value!r}")
        return t

    def parse(self) -> Filter:
        node = self.expr()
        self.expect("EOF")
        return node if isinstance(node, Filter) else Filter(must=[node])

    def expr(self):
        left = self.and_expr()
        branches = [left]
        while self.peek().kind == "OR":
            self.next()
            branches.append(self.and_expr())
        if len(branches) == 1:
            return left
        return Filter(should=branches)

    def and_expr(self):
        left = self.unary()
        parts = [left]
        while self.peek().kind == "AND":
            self.next()
            parts.append(self.unary())
        if len(parts) == 1:
            return left
        return Filter(must=parts)

    def unary(self):
        if self.peek().kind == "NOT":
            self.next()
            return Filter(must_not=[self.unary()])
        return self.primary()

    def primary(self):
        if self.peek().kind == "LPAREN":
            self.next()
            node = self.expr()
            self.expect("RPAREN")
            return node
        return self.predicate()

    def literal(self) -> Any:
        t = self.next()
        if t.kind == "NUMBER":
            return float(t.value) if "." in t.value else int(t.value)
        if t.kind == "STRING":
            return t.value[1:-1].replace("\\'", "'")
        if t.kind == "TRUE":
            return True
        if t.kind == "FALSE":
            return False
        raise InvalidArgumentError(f"expected literal, got {t.kind} {t.value!r}")

    def predicate(self):
        fieldname = self.expect("IDENT").value
        t = self.peek()
        if t.kind == "OP":
            self.next()
            val = self.literal()
            op = {"=": "eq", "!=": "ne", "<>": "ne", ">": "gt", ">=": "gte",
                  "<": "lt", "<=": "lte"}[t.value]
            return Condition(fieldname, op, val)
        if t.kind == "LIKE":
            self.next()
            return Condition(fieldname, "like", self.literal())
        if t.kind == "IN":
            self.next()
            self.expect("LPAREN")
            vals = [self.literal()]
            while self.peek().kind == "COMMA":
                self.next()
                vals.append(self.literal())
            self.expect("RPAREN")
            return Condition(fieldname, "in", vals)
        if t.kind == "IS":
            self.next()
            if self.peek().kind == "NOT":
                self.next()
                self.expect("NULL")
                return Condition(fieldname, "is_not_null")
            self.expect("NULL")
            return Condition(fieldname, "is_null")
        if t.kind == "BETWEEN":
            self.next()
            lo = self.literal()
            self.expect("AND")
            hi = self.literal()
            return Filter(must=[Condition(fieldname, "gte", lo), Condition(fieldname, "lte", hi)])
        raise InvalidArgumentError(f"bad predicate after field {fieldname!r}: {t.kind}")


def parse_sql_where(where_clause: str) -> Filter:
    """Parse a SQL WHERE clause into a Filter AST.

    Supports =, !=, <>, <, <=, >, >=, LIKE, IN (...), IS [NOT] NULL, BETWEEN,
    AND/OR/NOT, parentheses — the operator set of the reference's SqlFilterParser
    (filtering.rs:763-940)."""
    clause = where_clause.strip()
    if clause.lower().startswith("where "):
        clause = clause[6:]
    return _Parser(_lex(clause)).parse()
