"""Lucene ``query_string`` / ``simple_query_string`` parsers: the last
ES-DSL front-end the engine lacked — the *string* syntax users type into
Kibana search bars, compiled onto the existing ``plans.search`` Query tree
(so everything downstream — predicates, constant-weight scoring, top-k,
the oracle story — is shared, not reimplemented).

``query_string`` surface (parse_query_string):

* ``field:term``, bare terms against ``default_field``
* ``"quoted phrase"`` → MatchPhrase (analyzed) or exact equality (keyword)
* boolean operators ``AND``/``&&``, ``OR``/``||``, ``NOT``/``!`` with the
  standard precedence NOT > AND > OR (a DOCUMENTED divergence from
  Lucene's classic parser, whose single-level occur rewriting is widely
  considered a bug — e.g. ``a OR b AND c`` here parses as
  ``a OR (b AND c)``)
* ``+term`` (must) / ``-term`` (must_not) prefixes inside a group
* grouping ``( ... )`` and field-scoped groups ``field:(a OR b)``
* wildcards: trailing-``*``-only → Prefix (sargable LIKE), general
  ``*``/``?`` → Wildcard
* fuzziness ``term~`` / ``term~1`` (keyword → Fuzzy; analyzed → Match
  with fuzziness)
* ranges ``field:[a TO b]`` / ``{a TO b}`` (inclusive/exclusive, ``*`` =
  open end) and one-sided ``field:>n``, ``>=n``, ``<n``, ``<=n``
* ``term^2`` boosts (clause weight in the constant-score sum)
* ``_exists_:field`` → Exists
* ``\\`` escapes the next character inside a term

Scoring: each matched leaf contributes its boost (default 1.0) and a
group sums its clauses — the engine's constant-weight model (the
reference's own ``weight`` semantics, plans/search.py Query.CONSTANT_
SCORE). ES would BM25-score text leaves; a user who wants that composes
``BM25Match`` via the builder — the parser keeps scores oracle-able.

``simple_query_string`` surface (parse_simple_query_string): ``|`` (OR),
``+`` (AND), ``-`` (NOT), ``"phrase"``, trailing ``*`` (prefix), ``~N``
(fuzzy), ``( )`` grouping; ``+``/``|`` associate left at EQUAL precedence
(Lucene SimpleQueryParser's contract). Its defining property is kept: it
NEVER raises on malformed input — unbalanced quotes/parens degrade to
plain terms, dangling operators are dropped — so it is safe to wire
directly to user input.

Both parsers are driver-side string work (micro-seconds, zero data
motion): the output is a Query tree whose predicate/score compile to the
same scan-riding Column expressions as every other search query, so at
100 TB the cost model is identical to the hand-built tree.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from tweets_elastic_spark.plans.search import (
    Bool,
    Exists,
    Fuzzy,
    Match,
    MatchAll,
    MatchPhrase,
    MatchPhrasePrefix,
    Prefix,
    Query,
    Range,
    Term,
    Wildcard,
)

# ---------------------------------------------------------------------------
# shared tokenizer


@dataclass
class _Tok:
    kind: str  # LPAREN RPAREN AND OR NOT PLUS MINUS PHRASE TERM RANGE
    text: str = ""
    field: str | None = None  # field-scope carried on PHRASE/TERM/RANGE/LPAREN
    boost: float = 1.0
    fuzzy: int | None = None  # edit distance from ~ / ~N (None = not fuzzy)


_TERM_CHARS = re.compile(r"[^\s()\"^~:|&]")


class QueryStringSyntaxError(ValueError):
    pass


def _read_escaped(
    s: str, i: int, stop, keep_escapes: bool = False
) -> tuple[str, int]:
    """Consume chars until ``stop(c)`` is true, honoring backslash escapes.
    ``keep_escapes`` preserves the backslashes in the output (term values
    need them so the wildcard scan can tell ``a\\*b`` from ``a*b``).
    Returns (text, next_index)."""
    out = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            out.append(s[i:i + 2] if keep_escapes else s[i + 1])
            i += 2
            continue
        if stop(c):
            break
        out.append(c)
        i += 1
    return "".join(out), i


def _tokenize(s: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("LPAREN"))
            i += 1
            continue
        if c == ")":
            # Lucene supports group boosts — '(a OR b)^2' — so the
            # suffix reader runs after a closing paren too
            tok = _Tok("RPAREN")
            i = _read_suffix(s, i + 1, tok)
            toks.append(tok)
            continue
        if c == "+":
            toks.append(_Tok("PLUS"))
            i += 1
            continue
        if c == "-":
            toks.append(_Tok("MINUS"))
            i += 1
            continue
        if c == "!":
            toks.append(_Tok("NOT"))
            i += 1
            continue
        if s.startswith("&&", i):
            toks.append(_Tok("AND"))
            i += 2
            continue
        if s.startswith("||", i):
            toks.append(_Tok("OR"))
            i += 2
            continue
        if c == '"':
            text, j = _read_escaped(s, i + 1, lambda ch: ch == '"')
            if j >= n:
                raise QueryStringSyntaxError(
                    f"unbalanced quote starting at offset {i}: {s!r}"
                )
            tok = _Tok("PHRASE", text)
            i = _read_suffix(s, j + 1, tok)
            toks.append(tok)
            continue
        if c in "[{":
            text, j = _read_escaped(s, i + 1, lambda ch: ch in "]}")
            if j >= n:
                raise QueryStringSyntaxError(
                    f"unbalanced range bracket at offset {i}: {s!r}"
                )
            tok = _Tok("RANGE", c + text + s[j])
            i = _read_suffix(s, j + 1, tok)
            toks.append(tok)
            continue
        # bare term (may carry a field: prefix, handled by the parser via
        # a COLON-glued lookahead below)
        text, j = _read_escaped(
            s, i, lambda ch: not _TERM_CHARS.match(ch), keep_escapes=True
        )
        if not text:
            raise QueryStringSyntaxError(
                f"unexpected character {c!r} at offset {i} in {s!r}"
            )
        if j < n and s[j] == ":":
            # field prefix: attach to the NEXT value token
            field = re.sub(r"\\(.)", r"\1", text)
            i = j + 1
            if i < n and s[i] in "<>":
                # one-sided range sugar: field:>5, field:<=2026-01-01
                op = s[i]
                i += 1
                eq = i < n and s[i] == "="
                if eq:
                    i += 1
                val, i = _read_escaped(
                    s, i, lambda ch: not _TERM_CHARS.match(ch)
                )
                if not val:
                    raise QueryStringSyntaxError(
                        f"dangling comparison after {field!r}: in {s!r}"
                    )
                kind = {
                    (">", False): "gt", (">", True): "gte",
                    ("<", False): "lt", ("<", True): "lte",
                }[(op, eq)]
                tok = _Tok("RANGE", f"{kind}\x00{val}", field=field)
                i = _read_suffix(s, i, tok)
                toks.append(tok)
                continue
            # mark the next token with the field scope
            pending_field = field
            if i < n and s[i] == "(":
                toks.append(_Tok("LPAREN", field=pending_field))
                i += 1
                continue
            if i < n and s[i] == '"':
                text2, j2 = _read_escaped(s, i + 1, lambda ch: ch == '"')
                if j2 >= n:
                    raise QueryStringSyntaxError(
                        f"unbalanced quote after {field!r}: in {s!r}"
                    )
                tok = _Tok("PHRASE", text2, field=pending_field)
                i = _read_suffix(s, j2 + 1, tok)
                toks.append(tok)
                continue
            if i < n and s[i] in "[{":
                text2, j2 = _read_escaped(s, i + 1, lambda ch: ch in "]}")
                if j2 >= n:
                    raise QueryStringSyntaxError(
                        f"unbalanced range bracket after {field!r}: in {s!r}"
                    )
                tok = _Tok("RANGE", s[i] + text2 + s[j2], field=pending_field)
                i = _read_suffix(s, j2 + 1, tok)
                toks.append(tok)
                continue
            val, i2 = _read_escaped(
                s, i, lambda ch: not _TERM_CHARS.match(ch), keep_escapes=True
            )
            if not val:
                raise QueryStringSyntaxError(
                    f"dangling field prefix {field!r}: in {s!r}"
                )
            tok = _Tok("TERM", val, field=pending_field)
            i = _read_suffix(s, i2, tok)
            toks.append(tok)
            continue
        if text == "AND":
            toks.append(_Tok("AND"))
        elif text == "OR":
            toks.append(_Tok("OR"))
        elif text == "NOT":
            toks.append(_Tok("NOT"))
        else:
            tok = _Tok("TERM", text)
            j = _read_suffix(s, j, tok)
            toks.append(tok)
        i = j
    return toks


def _read_suffix(s: str, i: int, tok: _Tok) -> int:
    """Consume ``~``/``~N`` (fuzziness/slop) and ``^boost`` after a value."""
    n = len(s)
    while i < n and s[i] in "~^":
        if s[i] == "~":
            i += 1
            m = re.match(r"\d+", s[i:])
            if m:
                tok.fuzzy = int(m.group())
                i += len(m.group())
            else:
                tok.fuzzy = -1  # AUTO
        else:
            i += 1
            m = re.match(r"\d+(?:\.\d+)?", s[i:])
            if not m:
                raise QueryStringSyntaxError(
                    f"^ must be followed by a number at offset {i} in {s!r}"
                )
            tok.boost = float(m.group())
            i += len(m.group())
    return i


# ---------------------------------------------------------------------------
# leaf compilation (shared by both parsers)


def _split_wild(text: str) -> tuple[str, list[tuple[int, str]]]:
    """Unescape a term while recording which ``*``/``?`` are OPERATORS
    (unescaped). Returns (plain_text, [(position_in_plain, wildcard)])."""
    out: list[str] = []
    wilds: list[tuple[int, str]] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "\\" and i + 1 < n:
            out.append(text[i + 1])
            i += 2
            continue
        if c in "*?":
            wilds.append((len(out), c))
        out.append(c)
        i += 1
    return "".join(out), wilds


def _tokenize_simple(s: str) -> list[_Tok]:
    """SimpleQueryParser tokenizer: ONLY ``+ | - " ( ) ~N`` (and trailing
    ``*``, handled at leaf level) are syntax; every other character —
    including AND/OR/NOT, ``&&``, ``!``, ``:``, ``^``, brackets — is term
    text. Never raises: an unbalanced quote turns the rest of the input
    into one phrase."""
    toks: list[_Tok] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("LPAREN"))
            i += 1
            continue
        if c == ")":
            toks.append(_Tok("RPAREN"))
            i += 1
            continue
        if c == "+":
            toks.append(_Tok("PLUS"))
            i += 1
            continue
        if c == "-":
            toks.append(_Tok("MINUS"))
            i += 1
            continue
        if c == "|":
            toks.append(_Tok("OR"))
            while i < n and s[i] == "|":
                i += 1
            continue
        if c == '"':
            text, j = _read_escaped(s, i + 1, lambda ch: ch == '"')
            tok = _Tok("PHRASE", text)
            if j < n:  # balanced quote: consume it + optional ~N slop
                j += 1
                m = re.match(r"~(\d+)", s[j:])
                if m:
                    tok.fuzzy = int(m.group(1))
                    j += len(m.group())
            toks.append(tok)  # unbalanced: rest of input is the phrase
            i = j
            continue
        text, j = _read_escaped(
            s, i, lambda ch: ch.isspace() or ch in '()+-|"~',
            keep_escapes=True,
        )
        if not text:  # lone '~' with nothing before it: drop
            i += 1
            continue
        tok = _Tok("TERM", text)
        if j < n and s[j] == "~":
            j += 1
            m = re.match(r"\d+", s[j:])
            if m:
                tok.fuzzy = int(m.group())
                j += len(m.group())
            else:
                tok.fuzzy = -1
        toks.append(tok)
        i = j
    return toks


def _num_or_str(v: str):
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def _leaf(
    tok: _Tok,
    default_field: str,
    analyzers: dict[str, str],
    tokens_cols: dict[str, str],
) -> Query:
    field = tok.field or default_field
    analyzer = analyzers.get(field)
    tokens_col = tokens_cols.get(field)
    if tok.kind == "PHRASE":
        if analyzer is None:
            return Term(field, tok.text)
        return MatchPhrase(
            field, tok.text, analyzer, tokens_col=tokens_col,
            slop=max(tok.fuzzy or 0, 0),
        )
    if tok.kind == "RANGE":
        if "\x00" in tok.text:  # one-sided sugar gt\x00value
            kind, _, raw = tok.text.partition("\x00")
            return Range(field, **{kind: _num_or_str(raw)})
        lo_inc = tok.text[0] == "["
        hi_inc = tok.text[-1] == "]"
        body = tok.text[1:-1]
        m = re.match(r"\s*(\S+)\s+TO\s+(\S+)\s*$", body)
        if not m:
            raise QueryStringSyntaxError(
                f"range must be '[lo TO hi]', got {tok.text!r}"
            )
        lo, hi = m.group(1), m.group(2)
        bounds = {}
        if lo != "*":
            bounds["gte" if lo_inc else "gt"] = _num_or_str(lo)
        if hi != "*":
            bounds["lte" if hi_inc else "lt"] = _num_or_str(hi)
        if not bounds:
            return MatchAll()
        return Range(field, **bounds)
    # TERM — tok.text still carries backslash escapes so operator
    # wildcards can be told apart from escaped-literal ones
    plain, wilds = _split_wild(tok.text)
    if tok.field == "_exists_":
        return Exists(plain)
    if wilds:
        if sum(plain.count(c) for c in "*?") != len(wilds):
            raise QueryStringSyntaxError(
                f"term {tok.text!r} mixes operator wildcards with "
                "escaped-literal ones; the Wildcard node cannot express "
                "that — escape all or none"
            )
        if wilds == [(len(plain) - 1, "*")]:
            if analyzer is not None:
                # Lucene wildcards match TERMS: on an analyzed field a
                # prefix expands against the token stream, not the raw
                # column — the 1-term MatchPhrasePrefix is that exists
                return MatchPhrasePrefix(
                    field, plain[:-1], analyzer, tokens_col=tokens_col
                )
            return Prefix(field, plain[:-1])
        if analyzer is not None:
            raise QueryStringSyntaxError(
                f"non-trailing wildcards on the analyzed field {field!r} "
                "are unsupported (term-level wildcard expansion needs the "
                "stored term dictionary — see indexing.fuzzy_expand for "
                "the dictionary route); only trailing * (prefix) compiles"
            )
        return Wildcard(field, plain)
    if tok.fuzzy is not None:
        fz = "AUTO" if tok.fuzzy < 0 else tok.fuzzy
        if analyzer is None:
            return Fuzzy(field, plain, fuzziness=fz)
        return Match(
            field, plain, analyzer=analyzer, tokens_col=tokens_col,
            fuzziness=fz,
        )
    if analyzer is None:
        return Term(field, plain)
    return Match(field, plain, analyzer=analyzer, tokens_col=tokens_col)


def _group(clauses: list[tuple[str, Query, float]]) -> Query:
    """Compile a list of (occur, query, boost) into one Bool. occur ∈
    {must, must_not, should}. A lone unmarked clause passes through."""
    if len(clauses) == 1 and clauses[0][0] == "should" \
            and clauses[0][2] == 1.0:
        return clauses[0][1]
    must = [q for occ, q, _ in clauses if occ == "must"]
    must_not = [q for occ, q, _ in clauses if occ == "must_not"]
    should = [(q, b) for occ, q, b in clauses if occ == "should"]
    # scoring clauses: every positive clause contributes its boost when it
    # matches (must clauses score too, as in Lucene) — so musts ALSO enter
    # the should list, while predicate() keeps them mandatory
    scored = [(q, b) for occ, q, b in clauses if occ == "must"] + should
    # Bool's implicit rule supplies Lucene's occur semantics: with no
    # must/filter, ≥1 should must match (so `a OR -b` still requires a);
    # with musts present the shoulds stay optional/scoring-only.
    return Bool(must=must, must_not=must_not, should=scored)


# ---------------------------------------------------------------------------
# query_string recursive-descent parser


class _Parser:
    def __init__(
        self,
        toks: list[_Tok],
        default_field: str,
        analyzers: dict[str, str],
        tokens_cols: dict[str, str],
        default_operator: str,
    ):
        self.toks = toks
        self.i = 0
        self.default_field = default_field
        self.analyzers = analyzers
        self.tokens_cols = tokens_cols
        self.default_operator = default_operator

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    # query := or_expr
    def parse(self) -> Query:
        q = self.or_expr(self.default_field)
        if self.peek() is not None:
            raise QueryStringSyntaxError(
                f"unexpected {self.peek().kind} after end of query"
            )
        return q

    def or_expr(self, scope_field: str) -> Query:
        groups = [self.and_expr(scope_field)]
        while True:
            tok = self.peek()
            if tok is not None and tok.kind == "OR":
                self.next()
                groups.append(self.and_expr(scope_field))
            elif tok is not None and tok.kind not in ("RPAREN",) \
                    and self.default_operator == "or":
                # implicit operator between adjacent clauses
                groups.append(self.and_expr(scope_field))
            else:
                break
        if len(groups) == 1:
            return _group(groups[0])
        merged: list[tuple[str, Query, float]] = []
        for g in groups:
            if len(g) == 1:
                merged.append(g[0])
            else:
                merged.append(("should", _group(g), 1.0))
        # pure disjunction unless a clause carries +/-: _group handles both
        return _group(merged)

    def and_expr(self, scope_field: str) -> list[tuple[str, Query, float]]:
        """Returns the clause list for ONE implicit group: explicit AND
        promotes both sides to must; +/- prefixes set occur; with
        default_operator='and', adjacency behaves like AND."""
        clauses = [self.unary(scope_field)]
        while True:
            tok = self.peek()
            if tok is not None and tok.kind == "AND":
                self.next()
                if clauses[-1][0] == "should":
                    occ, q, b = clauses[-1]
                    clauses[-1] = ("must", q, b)
                nxt = self.unary(scope_field)
                if nxt[0] == "should":
                    nxt = ("must", nxt[1], nxt[2])
                clauses.append(nxt)
            elif tok is not None and tok.kind not in ("RPAREN", "OR") \
                    and self.default_operator == "and":
                nxt = self.unary(scope_field)
                if clauses[-1][0] == "should":
                    occ, q, b = clauses[-1]
                    clauses[-1] = ("must", q, b)
                if nxt[0] == "should":
                    nxt = ("must", nxt[1], nxt[2])
                clauses.append(nxt)
            else:
                break
        return clauses

    def unary(self, scope_field: str) -> tuple[str, Query, float]:
        tok = self.peek()
        if tok is None:
            raise QueryStringSyntaxError("unexpected end of query")
        if tok.kind in ("NOT", "MINUS"):
            self.next()
            occ, q, b = self.unary(scope_field)
            if occ == "must_not":  # double negation
                return ("must", q, b)
            return ("must_not", q, b)
        if tok.kind == "PLUS":
            self.next()
            occ, q, b = self.unary(scope_field)
            return ("must" if occ == "should" else occ, q, b)
        return ("should",) + self.primary(scope_field)

    def primary(self, scope_field: str) -> tuple[Query, float]:
        tok = self.next()
        if tok.kind == "LPAREN":
            inner_scope = tok.field or scope_field
            q = self.or_expr(inner_scope)
            closing = self.peek()
            if closing is None or closing.kind != "RPAREN":
                raise QueryStringSyntaxError("unbalanced parenthesis")
            self.next()
            if closing.fuzzy is not None:
                raise QueryStringSyntaxError(
                    "~ fuzziness/slop applies to terms and phrases, not "
                    "to groups"
                )
            return q, closing.boost  # Lucene group boost: (a OR b)^2
        if tok.kind in ("TERM", "PHRASE", "RANGE"):
            if tok.field is None and scope_field != "":
                tok = _Tok(tok.kind, tok.text, field=scope_field,
                           boost=tok.boost, fuzzy=tok.fuzzy)
            return (
                _leaf(tok, self.default_field, self.analyzers,
                      self.tokens_cols),
                tok.boost,
            )
        raise QueryStringSyntaxError(f"unexpected {tok.kind} in query")


def parse_query_string(
    query: str,
    *,
    default_field: str,
    analyzers: dict[str, str] | None = None,
    tokens_cols: dict[str, str] | None = None,
    default_operator: str = "or",
) -> Query:
    """Parse a Lucene query_string into the Query tree. Raises
    QueryStringSyntaxError on malformed input (ES's query_string does
    too — use parse_simple_query_string for never-throws semantics)."""
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be 'or'/'and', got {default_operator!r}"
        )
    toks = _tokenize(query)
    if not toks:
        return MatchAll()
    return _Parser(
        toks, default_field, analyzers or {}, tokens_cols or {},
        default_operator,
    ).parse()


# ---------------------------------------------------------------------------
# simple_query_string


def parse_simple_query_string(
    query: str,
    *,
    default_field: str,
    analyzers: dict[str, str] | None = None,
    tokens_cols: dict[str, str] | None = None,
    default_operator: str = "or",
) -> Query:
    """Lucene SimpleQueryParser semantics: ``|`` OR, ``+`` AND, ``-`` NOT,
    quotes (with ``"..."~N`` slop), trailing-``*`` prefix, ``~N`` fuzzy,
    parens; ``+``/``|`` bind left-to-right at equal precedence. ONLY those
    characters are syntax — ``AND``/``OR``/``NOT``, ``&&``, ``!``, ``:``,
    ``^``, brackets, and NON-trailing ``*``/``?`` are literal text (the
    SimpleQueryParser contract, so 'Fish AND Chips' searches the word
    'and' and 'Wham!' keeps its bang), which is why this parser has its
    OWN tokenizer instead of sharing query_string's. NEVER raises:
    malformed syntax degrades (unbalanced quote → the rest is one phrase;
    unbalanced paren → treated as if closed at end; dangling operator →
    dropped)."""
    analyzers = analyzers or {}
    tokens_cols = tokens_cols or {}

    toks = _tokenize_simple(query)
    if not toks:
        return MatchAll()

    def leaf(tok: _Tok) -> Query:
        analyzer = analyzers.get(default_field)
        tokens_col = tokens_cols.get(default_field)
        if tok.kind == "PHRASE":
            if analyzer is None:
                return Term(default_field, tok.text)
            return MatchPhrase(
                default_field, tok.text, analyzer, tokens_col=tokens_col,
                slop=max(tok.fuzzy or 0, 0),
            )
        # TERM: only a TRAILING unescaped '*' is syntax (prefix); every
        # other '*'/'?' is literal text in simple mode
        plain, wilds = _split_wild(tok.text)
        if wilds and wilds[-1] == (len(plain) - 1, "*"):
            if analyzer is not None:
                # analyzed field: prefix means TOKEN prefix (Lucene
                # expands against the term dictionary) — the 1-term
                # MatchPhrasePrefix is exactly exists(startswith)
                return MatchPhrasePrefix(
                    default_field, plain[:-1], analyzer,
                    tokens_col=tokens_col,
                )
            return Prefix(default_field, plain[:-1])
        if tok.fuzzy is not None:
            fz = "AUTO" if tok.fuzzy < 0 else tok.fuzzy
            if analyzer is None:
                return Fuzzy(default_field, plain, fuzziness=fz)
            return Match(default_field, plain, analyzer=analyzer,
                         tokens_col=tokens_col, fuzziness=fz)
        if analyzer is None:
            return Term(default_field, plain)
        return Match(default_field, plain, analyzer=analyzer,
                     tokens_col=tokens_col)

    pos = 0

    def parse_seq() -> Query | None:
        nonlocal pos
        acc: Query | None = None
        pending_op: str | None = None
        negate_next = False
        while pos < len(toks):
            tok = toks[pos]
            if tok.kind == "RPAREN":
                pos += 1
                break
            if tok.kind in ("OR",):
                pending_op, pos = "or", pos + 1
                continue
            if tok.kind == "PLUS" or tok.kind == "AND":
                pending_op, pos = "and", pos + 1
                continue
            if tok.kind in ("MINUS", "NOT"):
                negate_next, pos = True, pos + 1
                continue
            if tok.kind == "LPAREN":
                pos += 1
                q = parse_seq()
            else:
                q = leaf(tok)
                pos += 1
            if q is None:
                continue
            if negate_next:
                q = Bool(must_not=[q])
                negate_next = False
            if acc is None:
                acc = q
            else:
                op = pending_op or default_operator
                if op == "and":
                    acc = Bool(must=[acc, q],
                               should=[(acc, 1.0), (q, 1.0)])
                else:
                    acc = Bool(should=[(acc, 1.0), (q, 1.0)],
                               minimum_should_match=1)
            pending_op = None
        return acc

    out = parse_seq()
    # anything after an unbalanced ')' — keep consuming with the same rule
    while pos < len(toks):
        more = parse_seq()
        if more is not None:
            out = more if out is None else Bool(
                should=[(out, 1.0), (more, 1.0)], minimum_should_match=1
            )
    return out if out is not None else MatchAll()


# ---------------------------------------------------------------------------
# KQL (Kibana Query Language) — the 8.17 ES|QL KQL() function's syntax.
# Strictly SIMPLER than query_string: `and`/`or`/`not` words
# (case-insensitive, precedence not > and > or), `field:value`,
# `field:"phrase"`, `field:(a or b)` value groups inheriting the field,
# `field > n` comparisons, trailing-* prefix, `field:*` exists, bare
# terms against the caller's default field. NO fuzziness, boosts,
# bracket ranges, or regex (KQL's documented differences from Lucene).
# KQL runs in FILTER context upstream — no scoring; callers get a
# predicate-only Query tree (constant score 0).

_KQL_TOKEN_RE = re.compile(
    r"\s*(?:(?P<lp>\()|(?P<rp>\))|(?P<colon>:)"
    r"|(?P<cmp><=|>=|<|>)"
    r'|(?P<phrase>"(?:[^"\\]|\\.)*")'
    r"|(?P<lbrace>\{)"
    r'|(?P<word>[^\s():<>"{}]+))'
)


def _kql_tokens(s: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(s):
        m = _KQL_TOKEN_RE.match(s, i)
        if m is None or m.end() == i:
            if s[i:].strip() == "":
                break
            raise QueryStringSyntaxError(
                f"KQL: cannot lex at {s[i:i + 10]!r}")
        i = m.end()
        if m.group("lp"):
            out.append(("LP", ""))
        elif m.group("rp"):
            out.append(("RP", ""))
        elif m.group("colon"):
            out.append(("COLON", ""))
        elif m.group("cmp"):
            out.append(("CMP", m.group("cmp")))
        elif m.group("lbrace"):
            raise QueryStringSyntaxError(
                "KQL: nested-object syntax `field:{ ... }` is "
                "unsupported (no nested doc store); flatten the path "
                "or use the DSL's nested query"
            )
        elif m.group("phrase"):
            body = m.group("phrase")[1:-1]
            out.append(("PHRASE", re.sub(r"\\(.)", r"\1", body)))
        else:
            w = m.group("word")
            lw = w.lower()
            if lw in ("and", "or", "not"):
                out.append((lw.upper(), w))
            else:
                out.append(("WORD", w))
    return out


def _kql_leaf(
    field: str | None,
    kind: str,
    text: str,
    default_field: str | None,
    analyzers: dict[str, str],
    tokens_cols: dict[str, str],
) -> Query:
    if field is None:
        if default_field is None:
            raise QueryStringSyntaxError(
                f"KQL: bare term {text!r} has no field and no default "
                "field is bound (ES resolves these via the index "
                "default_field setting, which has no analog here) — "
                "field-scope the term or bind exactly one analyzer"
            )
        field = default_field
    analyzer = analyzers.get(field)
    tokens_col = tokens_cols.get(field)
    if kind == "PHRASE":
        if analyzer is None:
            return Term(field, text)
        return MatchPhrase(field, text, analyzer, tokens_col=tokens_col)
    if text == "*":
        return Exists(field)
    if text.endswith("*") and "*" not in text[:-1] and "?" not in text:
        stem = text[:-1]
        if analyzer is not None:
            return MatchPhrasePrefix(
                field, stem, analyzer, tokens_col=tokens_col)
        return Prefix(field, stem)
    if "*" in text or "?" in text:
        if analyzer is not None:
            raise QueryStringSyntaxError(
                f"KQL: non-trailing wildcards on the analyzed field "
                f"{field!r} are unsupported (same term-dictionary "
                "limit as query_string); only trailing * compiles"
            )
        return Wildcard(field, text)
    if analyzer is None:
        return Term(field, text)
    return Match(field, text, analyzer=analyzer, tokens_col=tokens_col)


class _KqlParser:
    def __init__(self, toks, default_field, analyzers, tokens_cols):
        self.toks = toks
        self.i = 0
        self.default_field = default_field
        self.analyzers = analyzers
        self.tokens_cols = tokens_cols

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind):
        t = self.peek()
        if t is None or t[0] != kind:
            raise QueryStringSyntaxError(
                f"KQL: expected {kind}, got "
                f"{t[0] if t else 'end of query'}")
        return self.next()

    # --- top level: field context flows down -----------------------------
    def or_q(self, field):
        q = self.and_q(field)
        while self.peek() is not None and self.peek()[0] == "OR":
            self.next()
            q = Bool(should=[(q, 1.0), (self.and_q(field), 1.0)],
                     minimum_should_match=1)
        return q

    def and_q(self, field):
        q = self.not_q(field)
        while self.peek() is not None and self.peek()[0] == "AND":
            self.next()
            q = Bool(must=[q, self.not_q(field)])
        return q

    def not_q(self, field):
        if self.peek() is not None and self.peek()[0] == "NOT":
            self.next()
            return Bool(must_not=[self.not_q(field)])
        return self.primary(field)

    def primary(self, field):
        t = self.peek()
        if t is None:
            raise QueryStringSyntaxError("KQL: expected a clause, got "
                                         "end of query")
        if t[0] == "LP":
            self.next()
            q = self.or_q(field)
            self.expect("RP")
            return q
        if t[0] == "PHRASE":
            self.next()
            return _kql_leaf(field, "PHRASE", t[1], self.default_field,
                             self.analyzers, self.tokens_cols)
        if t[0] == "WORD":
            self.next()
            nxt = self.peek()
            if field is None and nxt is not None and nxt[0] == "COLON":
                # field:value / field:"phrase" / field:(group)
                self.next()
                vt = self.peek()
                if vt is not None and vt[0] == "LP":
                    self.next()
                    q = self.or_q(t[1])
                    self.expect("RP")
                    return q
                if vt is None or vt[0] not in ("WORD", "PHRASE"):
                    raise QueryStringSyntaxError(
                        f"KQL: field {t[1]!r} needs a value after ':'")
                self.next()
                return _kql_leaf(
                    t[1], vt[0], vt[1], self.default_field,
                    self.analyzers, self.tokens_cols)
            if field is None and nxt is not None and nxt[0] == "CMP":
                self.next()
                vt = self.peek()
                if vt is None or vt[0] != "WORD":
                    raise QueryStringSyntaxError(
                        f"KQL: comparison on {t[1]!r} needs a literal")
                self.next()
                op = {">": "gt", ">=": "gte",
                      "<": "lt", "<=": "lte"}[nxt[1]]
                return Range(t[1], **{op: _num_or_str(vt[1])})
            return _kql_leaf(field, "WORD", t[1], self.default_field,
                             self.analyzers, self.tokens_cols)
        raise QueryStringSyntaxError(
            f"KQL: unexpected {t[0]} where a clause was expected")


def parse_kql(
    query: str,
    *,
    default_field: str | None = None,
    analyzers: dict[str, str] | None = None,
    tokens_cols: dict[str, str] | None = None,
) -> Query:
    """Parse a KQL query into the Query tree. Unlike query_string, KQL
    REQUIRES explicit and/or between clauses — adjacent clauses raise
    (upstream KQL errors there too), and unknown syntax raises
    QueryStringSyntaxError with a pointer. `*` alone is match-all."""
    toks = _kql_tokens(query)
    if not toks:
        return MatchAll()
    if toks == [("WORD", "*")]:
        return MatchAll()
    p = _KqlParser(toks, default_field, analyzers or {},
                   tokens_cols or {})
    q = p.or_q(None)
    if p.peek() is not None:
        raise QueryStringSyntaxError(
            "KQL: adjacent clauses need an explicit and/or between "
            f"them (stopped before {p.peek()!r})"
        )
    return q
