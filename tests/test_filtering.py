"""Filter engine tests: every operator, set algebra, geo, SQL parsing —
including the operators the reference left stubbed (filtering.rs:430-431,
572-592)."""

import numpy as np
import pytest

from grape_vector_db_tpu.engine.filtering import FilterEngine, haversine_m, parse_sql_where
from grape_vector_db_tpu.types import Condition, Filter


@pytest.fixture
def engine():
    e = FilterEngine()
    docs = {
        "d1": {"category": "tech", "price": 10, "tags": ["gpu", "tpu"],
               "loc": {"lat": 37.77, "lon": -122.42}, "title": "TPU guide"},
        "d2": {"category": "tech", "price": 50, "tags": ["cpu"],
               "loc": {"lat": 40.71, "lon": -74.00}, "title": "CPU handbook"},
        "d3": {"category": "food", "price": 5, "nested": {"a": {"b": 7}},
               "title": "Pasta recipes"},
        "d4": {"category": "food", "price": 20, "tags": ["pasta", "tpu"]},
    }
    for i, m in docs.items():
        e.index_document(i, m)
    return e


def q(engine, node):
    return set(engine.execute_filter(node))


def test_eq_ne_in(engine):
    assert q(engine, Condition("category", "eq", "tech")) == {"d1", "d2"}
    assert q(engine, Condition("category", "ne", "tech")) == {"d3", "d4"}
    assert q(engine, Condition("category", "in", ["tech", "food"])) == {"d1", "d2", "d3", "d4"}


def test_numeric_ranges(engine):
    assert q(engine, Condition("price", "gt", 10)) == {"d2", "d4"}
    assert q(engine, Condition("price", "gte", 10)) == {"d1", "d2", "d4"}
    assert q(engine, Condition("price", "lt", 10)) == {"d3"}
    assert q(engine, Condition("price", "lte", 10)) == {"d1", "d3"}


def test_like_and_text_match(engine):
    assert q(engine, Condition("title", "like", "%guide%")) == {"d1"}
    assert q(engine, Condition("title", "like", "C_U handbook")) == {"d2"}
    assert q(engine, Condition("title", "text_match", "pasta")) == {"d3"}


def test_exists_null_array(engine):
    assert q(engine, Condition("tags", "exists")) == {"d1", "d2", "d4"}
    assert q(engine, Condition("tags", "is_null")) == {"d3"}
    assert q(engine, Condition("tags", "array_contains", "tpu")) == {"d1", "d4"}


def test_nested_paths(engine):
    assert q(engine, Condition("nested.a.b", "eq", 7)) == {"d3"}
    assert q(engine, Condition("nested.a.b", "gte", 5)) == {"d3"}


def test_logical_combinators(engine):
    f = Filter(
        must=[Condition("category", "eq", "tech")],
        must_not=[Condition("price", "gt", 20)],
    )
    assert q(engine, f) == {"d1"}
    f2 = Filter(should=[Condition("price", "lt", 6), Condition("price", "gt", 40)])
    assert q(engine, f2) == {"d2", "d3"}
    nested = Filter(must=[f2, Condition("category", "eq", "food")])
    assert q(engine, nested) == {"d3"}


def test_geo_within_distance(engine):
    # 10 km around San Francisco: only d1
    got = q(engine, Condition("loc", "geo_within_distance",
                              {"lat": 37.7749, "lon": -122.4194, "radius_m": 10_000}))
    assert got == {"d1"}
    # coast-to-coast radius captures both
    got = q(engine, Condition("loc", "geo_within_distance",
                              {"lat": 39.0, "lon": -98.0, "radius_m": 4_000_000}))
    assert got == {"d1", "d2"}


def test_geo_bbox(engine):
    got = q(engine, Condition("loc", "geo_bounding_box",
                              {"min_lat": 35, "max_lat": 39, "min_lon": -125, "max_lon": -120}))
    assert got == {"d1"}


def test_haversine_known_distance():
    # SF -> NYC ~ 4130 km
    d = haversine_m(37.7749, -122.4194, 40.7128, -74.0060)
    assert 4.0e6 < float(d) < 4.3e6


def test_remove_and_reindex(engine):
    engine.remove_document("d1")
    assert q(engine, Condition("category", "eq", "tech")) == {"d2"}
    engine.index_document("d1", {"category": "food"})
    assert q(engine, Condition("category", "eq", "food")) == {"d1", "d3", "d4"}


def test_mask_for_slots(engine):
    slots = ["d1", "d2", None, "d3", "d4"]
    mask = engine.mask_for_slots(Condition("category", "eq", "tech"), slots)
    np.testing.assert_array_equal(mask, [True, True, False, False, False])


# -- SQL parser ----------------------------------------------------------------


def test_sql_simple(engine):
    f = parse_sql_where("category = 'tech' AND price >= 10")
    assert q(engine, f) == {"d1", "d2"}


def test_sql_or_not_parens(engine):
    f = parse_sql_where("(category = 'food' OR price > 40) AND NOT price < 6")
    assert q(engine, f) == {"d2", "d4"}


def test_sql_like_in_null(engine):
    assert q(engine, parse_sql_where("title LIKE '%handbook%'")) == {"d2"}
    assert q(engine, parse_sql_where("category IN ('food')")) == {"d3", "d4"}
    assert q(engine, parse_sql_where("tags IS NULL")) == {"d3"}
    assert q(engine, parse_sql_where("tags IS NOT NULL")) == {"d1", "d2", "d4"}


def test_sql_between(engine):
    assert q(engine, parse_sql_where("price BETWEEN 6 AND 25")) == {"d1", "d4"}


def test_sql_where_prefix_and_errors(engine):
    assert q(engine, parse_sql_where("WHERE price = 5")) == {"d3"}
    from grape_vector_db_tpu.errors import InvalidArgumentError
    with pytest.raises(InvalidArgumentError):
        parse_sql_where("price ===")


def test_like_literal_glob_metachars(engine):
    """Literal glob metacharacters in LIKE patterns match themselves."""
    engine.index_document("g1", {"title": "file[1].txt"})
    engine.index_document("g2", {"title": "file1.txt"})
    engine.index_document("g3", {"title": "anything at all"})
    assert q(engine, Condition("title", "like", "file[1]%")) == {"g1"}
    assert q(engine, Condition("title", "like", "%*%")) == set()  # literal *


def test_sql_parser_fuzz_roundtrip(rng):
    """Property fuzz: random filter ASTs rendered to SQL parse back to an
    equivalent filter (same evaluation on random documents)."""
    import random

    r = random.Random(7)
    eng = FilterEngine()
    for i in range(200):
        eng.index_document(f"f{i}", {
            "a": r.randint(0, 20),
            "b": r.choice(["x", "y", "z z", "it's"]),
            "c": r.random() * 100,
        })

    def rand_cond():
        kind = r.choice(["num", "str", "in", "null", "between", "like"])
        if kind == "num":
            op = r.choice([("gt", ">"), ("gte", ">="), ("lt", "<"),
                           ("lte", "<="), ("eq", "="), ("ne", "!=")])
            v = r.randint(0, 20)
            return Condition("a", op[0], v), f"a {op[1]} {v}"
        if kind == "str":
            v = r.choice(["x", "y", "z z", "it's"])
            sql_v = v.replace("'", "\\'")
            return Condition("b", "eq", v), f"b = '{sql_v}'"
        if kind == "in":
            vs = r.sample([0, 1, 2, 5, 9, 13], 3)
            return Condition("a", "in", vs), f"a IN ({', '.join(map(str, vs))})"
        if kind == "null":
            neg = r.random() < 0.5
            return (Condition("missing", "is_not_null" if neg else "is_null"),
                    f"missing IS {'NOT ' if neg else ''}NULL")
        if kind == "between":
            lo, hi = sorted((r.randint(0, 20), r.randint(0, 20)))
            return (Filter(must=[Condition("c", "gte", lo), Condition("c", "lte", hi)]),
                    f"c BETWEEN {lo} AND {hi}")
        return Condition("b", "like", "%z%"), "b LIKE '%z%'"

    def rand_tree(depth):
        if depth == 0 or r.random() < 0.4:
            return rand_cond()
        left_ast, left_sql = rand_tree(depth - 1)
        right_ast, right_sql = rand_tree(depth - 1)
        if r.random() < 0.5:
            return (Filter(must=[left_ast, right_ast]),
                    f"({left_sql}) AND ({right_sql})")
        return (Filter(should=[left_ast, right_ast]),
                f"({left_sql}) OR ({right_sql})")

    for _ in range(60):
        ast, sql = rand_tree(2)
        direct = set(eng.execute_filter(ast))
        parsed = set(eng.execute_filter(parse_sql_where(sql)))
        assert direct == parsed, (sql, direct ^ parsed)
