"""SQL dialect preprocessor unit tests: scanner, UNION BYUPDATE rewrite,
WITH RECURSIVE parsing (grammar: SQLParser.scala:328-374)."""

from __future__ import annotations

import pytest

from seccosql_spark.sql.preprocessor import (
    _find_top_level_keyword,
    _matching_paren,
    _parse_ctes,
    _split_recursive_body,
    rewrite_union_by_update,
)


def test_top_level_keyword_ignores_nested_and_quoted():
    sql = "SELECT ' UNION BYUPDATE ' FROM (SELECT 1 UNION BYUPDATE x (SELECT 2)) t"
    assert _find_top_level_keyword(sql, "UNION BYUPDATE") == -1


def test_matching_paren():
    s = "(a (b) c) d"
    assert _matching_paren(s, 0) == 8


def test_byupdate_rewrite_shape():
    out = rewrite_union_by_update("(SELECT a, b FROM t1) UNION BYUPDATE a (SELECT a, b FROM t2)")
    assert "LEFT ANTI JOIN" in out
    assert "USING (a)" in out
    assert out.count("SELECT a, b FROM t2") == 2


def test_byupdate_multiple_keys():
    out = rewrite_union_by_update("(SELECT * FROM t1) UNION BYUPDATE k1, k2 (SELECT * FROM t2)")
    assert "USING (k1, k2)" in out


def test_byupdate_requires_parens():
    with pytest.raises(ValueError):
        rewrite_union_by_update("SELECT 1 UNION BYUPDATE a (SELECT 2)")


def test_parse_ctes_two():
    ctes, main = _parse_ctes("a AS (SELECT 1), b(x, y) AS (SELECT 2, 3) SELECT * FROM b")
    assert [c.name for c in ctes] == ["a", "b"]
    assert ctes[1].cols == ["x", "y"]
    assert main.strip() == "SELECT * FROM b"


def test_split_recursive_body():
    body = "SELECT src, dst FROM e UNION SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src"
    split = _split_recursive_body(body, "r")
    assert split is not None
    base, step, is_all = split
    assert base == "SELECT src, dst FROM e"
    assert not is_all
    assert "JOIN e" in step


def test_split_non_recursive_returns_none():
    assert _split_recursive_body("SELECT 1 UNION SELECT 2", "r") is None
