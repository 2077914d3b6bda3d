"""ES SQL endpoint (``POST /_sql``): a SQL front-end over one index.

ES translates its SQL dialect into the same search/agg primitives the DSL
uses; this engine translates the equivalent subset into DataFrame
operations, which Catalyst then plans — the filter rides the scan, a
GROUP BY is one partial/final hash aggregation, ORDER BY + LIMIT becomes
TakeOrderedAndProject. The translator's output is ordinary declarative
Spark, never an interpreter.

Supported subset (ANSI-compatible on purpose — a query accepted here runs
verbatim on DuckDB/Postgres, which is exactly how the oracle checks it):

* ``SELECT col | agg | ROUND(agg, n) [AS alias], ... FROM <table>``
  with aggs ``COUNT(*) | COUNT(col) | SUM | AVG | MIN | MAX``; aggregates
  MUST be aliased (engines disagree on default names).
* ``WHERE`` with ``= <> != < <= > >=``, ``AND/OR/NOT`` + parentheses,
  ``[NOT] IN (...)``, ``[NOT] LIKE``, ``[NOT] BETWEEN a AND b``
  (inclusive), ``IS [NOT] NULL``.
* ``GROUP BY`` on plain columns; ``HAVING`` over select-list ALIASES.
* ``ORDER BY col|alias [ASC|DESC], ...`` and ``LIMIT n``.

Anything else — subqueries, JOINs (one index, like ES), expressions in
SELECT, ES's MATCH()/SCORE() full-text extensions — raises loudly with
the offending token. The full-text path is the query DSL / EQL surface;
this endpoint is the tabular one.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["es_sql"]

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*))"
)

_AGG_FNS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}
_KEYWORDS = {"SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER",
             "LIMIT", "AND", "OR", "NOT", "IN", "LIKE", "BETWEEN", "IS",
             "NULL", "AS", "ASC", "DESC", "ROUND", "TRUE", "FALSE"}


def _tokenize(sql: str) -> list[tuple[str, object]]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise ValueError(f"ES SQL: cannot tokenize at {sql[pos:pos+20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            t = m.group("num")
            out.append(("num", float(t) if "." in t else int(t)))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("ident") is not None:
            word = m.group("ident")
            up = word.upper()
            if up in _KEYWORDS or up in _AGG_FNS:
                out.append(("kw", up))
            else:
                out.append(("ident", word))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", None))
    return out


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_kw(self, kw: str):
        k, v = self.next()
        if k != "kw" or v != kw:
            raise ValueError(f"ES SQL: expected {kw}, got {v!r}")

    def accept_kw(self, kw: str) -> bool:
        k, v = self.peek()
        if k == "kw" and v == kw:
            self.i += 1
            return True
        return False

    def accept_op(self, op: str) -> bool:
        k, v = self.peek()
        if k == "op" and v == op:
            self.i += 1
            return True
        return False

    # ---- select items -------------------------------------------------
    def select_item(self):
        """-> (kind, payload, alias) with kind col|agg; agg payload =
        (fn, arg_col|None for *, round_digits|None)."""
        k, v = self.peek()
        if k == "kw" and v in (_AGG_FNS | {"ROUND"}):
            item = self._agg_call()
            alias = self._alias(required=True)
            return ("agg", item, alias)
        if k == "ident":
            self.next()
            nk, nv = self.peek()
            if nk == "op" and nv == "(":
                raise ValueError(
                    f"ES SQL: unsupported function {v!r} (COUNT/SUM/AVG/"
                    "MIN/MAX/ROUND only)"
                )
            alias = self._alias(required=False) or v
            return ("col", v, alias)
        raise ValueError(f"ES SQL: unsupported select item near {v!r}")

    def _agg_call(self):
        k, fn = self.next()
        digits = None
        if fn == "ROUND":
            if not self.accept_op("("):
                raise ValueError("ES SQL: ROUND needs (")
            inner = self._agg_call()
            if not self.accept_op(","):
                raise ValueError("ES SQL: ROUND(agg, digits)")
            dk, dv = self.next()
            if dk != "num":
                raise ValueError("ES SQL: ROUND digits must be a number")
            if not self.accept_op(")"):
                raise ValueError("ES SQL: ROUND missing )")
            fn2, arg, _ = inner
            return (fn2, arg, int(dv))
        if fn not in _AGG_FNS:
            raise ValueError(f"ES SQL: unsupported function {fn!r}")
        if not self.accept_op("("):
            raise ValueError(f"ES SQL: {fn} needs (")
        if self.accept_op("*"):
            if fn != "COUNT":
                raise ValueError(f"ES SQL: {fn}(*) is not a thing")
            arg = None
        else:
            ak, av = self.next()
            if ak != "ident":
                raise ValueError(f"ES SQL: {fn} argument must be a column")
            arg = av
        if not self.accept_op(")"):
            raise ValueError(f"ES SQL: {fn} missing )")
        return (fn, arg, digits)

    def _alias(self, required: bool):
        if self.accept_kw("AS"):
            k, v = self.next()
            if k != "ident":
                raise ValueError(f"ES SQL: bad alias {v!r}")
            return v
        k, v = self.peek()
        if k == "ident":  # bare alias
            self.i += 1
            return v
        if required:
            raise ValueError(
                "ES SQL: aggregates must be aliased (engines disagree on "
                "default aggregate column names)"
            )
        return None

    # ---- boolean expressions ------------------------------------------
    def expr(self, cols) -> Column:
        left = self.and_expr(cols)
        while self.accept_kw("OR"):
            left = left | self.and_expr(cols)
        return left

    def and_expr(self, cols) -> Column:
        left = self.not_expr(cols)
        while self.accept_kw("AND"):
            left = left & self.not_expr(cols)
        return left

    def not_expr(self, cols) -> Column:
        if self.accept_kw("NOT"):
            return ~self.not_expr(cols)
        if self.accept_op("("):
            e = self.expr(cols)
            if not self.accept_op(")"):
                raise ValueError("ES SQL: missing )")
            return e
        return self.predicate(cols)

    def _literal(self):
        k, v = self.next()
        if k in ("num", "str"):
            return v
        if k == "kw" and v in ("TRUE", "FALSE"):
            return v == "TRUE"
        raise ValueError(f"ES SQL: expected a literal, got {v!r}")

    def predicate(self, cols) -> Column:
        k, v = self.next()
        if k != "ident":
            raise ValueError(f"ES SQL: expected a column, got {v!r}")
        c = cols(v)
        neg = self.accept_kw("NOT")
        if self.accept_kw("IS"):
            if neg:
                raise ValueError("ES SQL: NOT IS is malformed")
            isnot = self.accept_kw("NOT")
            self.expect_kw("NULL")
            return c.isNotNull() if isnot else c.isNull()
        if self.accept_kw("IN"):
            if not self.accept_op("("):
                raise ValueError("ES SQL: IN needs (")
            vals = [self._literal()]
            while self.accept_op(","):
                vals.append(self._literal())
            if not self.accept_op(")"):
                raise ValueError("ES SQL: IN missing )")
            e = c.isin(vals)
            return ~e if neg else e
        if self.accept_kw("LIKE"):
            lk, lv = self.next()
            if lk != "str":
                raise ValueError("ES SQL: LIKE needs a string pattern")
            e = c.like(lv)
            return ~e if neg else e
        if self.accept_kw("BETWEEN"):
            lo = self._literal()
            self.expect_kw("AND")
            hi = self._literal()
            e = (c >= F.lit(lo)) & (c <= F.lit(hi))
            return ~e if neg else e
        if neg:
            raise ValueError("ES SQL: NOT must precede IN/LIKE/BETWEEN")
        ok, ov = self.next()
        if ok != "op" or ov not in ("=", "<>", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"ES SQL: unsupported comparison {ov!r}")
        lit = F.lit(self._literal())
        return {
            "=": c == lit, "<>": c != lit, "!=": c != lit,
            "<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit,
        }[ov]


def _agg_col(fn: str, arg: str | None, digits: int | None, alias: str) -> Column:
    if fn == "COUNT":
        out = F.count(F.lit(1)) if arg is None else F.count(F.col(arg))
    else:
        out = {"SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}[fn](
            F.col(arg)
        )
    if digits is not None:
        out = F.round(out, digits)
    return out.alias(alias)


def es_sql(sql: str, tables: dict[str, DataFrame]) -> DataFrame:
    """Run an ES-SQL query against ``tables`` (index name → DataFrame)."""
    p = _Parser(sql)
    p.expect_kw("SELECT")
    items = [p.select_item()]
    while p.accept_op(","):
        items.append(p.select_item())
    p.expect_kw("FROM")
    tk, tname = p.next()
    if tk != "ident" or tname not in tables:
        raise ValueError(
            f"ES SQL: unknown index {tname!r} (have {sorted(tables)})"
        )
    df = tables[tname]

    if p.accept_kw("WHERE"):
        df = df.filter(p.expr(F.col))

    group_cols: list[str] = []
    if p.accept_kw("GROUP"):
        p.expect_kw("BY")
        gk, gv = p.next()
        if gk != "ident":
            raise ValueError("ES SQL: GROUP BY needs columns")
        group_cols = [gv]
        while p.accept_op(","):
            gk, gv = p.next()
            if gk != "ident":
                raise ValueError("ES SQL: GROUP BY needs columns")
            group_cols.append(gv)

    aggs = [(pay, alias) for kind, pay, alias in items if kind == "agg"]
    plain = [(pay, alias) for kind, pay, alias in items if kind == "col"]
    if group_cols:
        bad = [c for c, _ in plain if c not in group_cols]
        if bad:
            raise ValueError(
                f"ES SQL: selected columns {bad} are not in GROUP BY"
            )
        out = df.groupBy(*group_cols).agg(
            *[_agg_col(fn, arg, d, alias) for (fn, arg, d), alias in aggs]
        )
        renames = {c: a for c, a in plain if a != c}
        for c, a in renames.items():
            out = out.withColumnRenamed(c, a)
        keep = [a for _, _, a in items]
        out = out.select(*keep)
    elif aggs:
        if plain:
            raise ValueError(
                "ES SQL: mixing aggregates and plain columns needs GROUP BY"
            )
        out = df.agg(
            *[_agg_col(fn, arg, d, alias) for (fn, arg, d), alias in aggs]
        )
    else:
        out = df.select(*[F.col(c).alias(a) for c, a in plain])

    if p.accept_kw("HAVING"):
        if not group_cols:
            raise ValueError("ES SQL: HAVING needs GROUP BY")
        out = out.filter(p.expr(F.col))

    order = []
    if p.accept_kw("ORDER"):
        p.expect_kw("BY")
        while True:
            ok_, ov = p.next()
            if ok_ != "ident":
                raise ValueError("ES SQL: ORDER BY needs columns/aliases")
            c = F.col(ov)
            if p.accept_kw("DESC"):
                c = c.desc()
            else:
                p.accept_kw("ASC")
                c = c.asc()
            order.append(c)
            if not p.accept_op(","):
                break
        out = out.orderBy(*order)

    if p.accept_kw("LIMIT"):
        nk, nv = p.next()
        if nk != "num" or isinstance(nv, float) or nv < 0:
            raise ValueError("ES SQL: LIMIT needs a non-negative integer")
        out = out.limit(int(nv))

    k, v = p.next()
    if k != "end":
        raise ValueError(f"ES SQL: trailing input at {v!r}")
    return out
