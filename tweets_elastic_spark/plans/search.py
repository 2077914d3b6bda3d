"""Search-query layer: the ES-DSL analogue as DataFrame plans (SURVEY §2.7).

The reference's one query language beyond SQL is the Elasticsearch DSL; its
showcase query (/root/reference/src/used_queries/elastic_queries.json:1-46)
composes ``function_score`` → ``bool`` with a weighted ``should`` (nested
match) and a non-scoring ``filter`` (two ranges + a nested exists). This
module re-expresses that surface as a small query tree that compiles to

    df.filter(<mandatory predicates>)
      .withColumn(score, <sum of matched should-weights>)
      .orderBy(desc(score), tiebreak).limit(k)

Scatter-gather-merge over shards (SURVEY §3.3) maps to Spark's
``TakeOrderedAndProject``: per-partition top-k, then a merge on the driver —
the same plan shape Lucene executes, for free, at any partition count.

Scoring fidelity (SURVEY §7 risk 4): the default implements exactly what
the reference exercises — constant ``weight`` per should-clause
(elastic_queries.json:20), keyword equality inside ``nested`` scopes
(domain.name is a keyword field, mapping.json:77), analyzed token-overlap
for text fields. Real relevance is ``BM25Match`` (Okapi BM25 over
materialized token columns, corpus- or index-backed stats), reachable
from the JSON DSL too: ``from_es_json(..., bm25_stats_for=...)`` compiles
bound ``match``/``multi_match`` clauses to BM25 — what ES does implicitly
for text fields — while the reference artifact's tree stays
byte-identical.

Match semantics for text fields mirror ES's two-sided analysis: the query
string is analyzed with the target field's analyzer at query time
(``analyze_text``) and compared against the field's index-time token column
(``materialize_tokens``) or an inline analysis — token overlap = match.
At 100 TB: materialize token columns at ingest; the match then compiles to
``arrays_overlap(tokens_col, lit(query_tokens))``, a codegen'd expression
with full predicate pushdown on the non-analyzed filters next to it.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_elastic_spark.functions.analyzers import analyze, analyze_text

# A resolver maps a field path ("author.following_count", "domain.name") to
# a Column, either at the row scope (F.col) or inside a nested-array lambda
# (struct element getter).
Resolver = object


def _col_resolver(path: str) -> Column:
    return F.col(path)


def _element_resolver(element: Column):
    def resolve(path: str) -> Column:
        c = element
        for part in path.split("."):
            c = c[part]
        return c

    return resolve


@dataclass
class Query:
    """Base node. ``predicate`` = does the row/element match (non-scoring);
    ``score`` = the clause's score contribution when matched.

    ``CONSTANT_SCORE`` marks clauses whose score is 1.0 whenever they match
    (every v1 node — the reference only exercises constant ``weight``
    scoring, elastic_queries.json:20). Bool.score exploits it to evaluate
    such clauses' predicates ONCE instead of predicate+score — Catalyst
    does not CSE the duplicated expression trees, and for analyzed matches
    each tree re-runs the full analyzer pipeline per row. A future BM25
    node sets CONSTANT_SCORE = False."""

    CONSTANT_SCORE = True

    def predicate(self, spark: SparkSession, resolve) -> Column:
        raise NotImplementedError

    def score(self, spark: SparkSession, resolve) -> Column:
        p = self.predicate(spark, resolve)
        return F.when(p, F.lit(1.0)).otherwise(F.lit(0.0))


@dataclass
class MatchAll(Query):
    """Q8 (docs/protokol.md:545-550): the identity."""

    def predicate(self, spark, resolve) -> Column:
        return F.lit(True)


@dataclass
class MatchNone(Query):
    """ES ``match_none``: the empty set — match_all's inverse (the
    placeholder ES template-built queries compile to when every optional
    clause is absent)."""

    def predicate(self, spark, resolve) -> Column:
        return F.lit(False)


@dataclass
class Term(Query):
    """Exact keyword equality (non-analyzed string fields, SURVEY §1.3)."""

    field: str
    value: object

    def predicate(self, spark, resolve) -> Column:
        return resolve(self.field) == F.lit(self.value)


@dataclass
class Match(Query):
    """Q5: analyzed full-text match. With ``analyzer=None`` the field is a
    keyword → equality (exactly what the reference query needs for
    ``context_annotations.domain.name`` = "Person"). With an analyzer, the
    query text is analyzed at query time and matched against ``tokens_col``
    (materialized) or an inline analysis. ES's match options:

    * ``operator="or"`` (default): any query token present — arrays_overlap.
    * ``operator="and"``: EVERY query token present — a conjunction of
      array_contains (each a codegen'd expression; no HOF loop).
    * ``minimum_should_match=n``: at least n query tokens present — the
      middle ground, a sum of matched-token indicators.
    * ``fuzziness`` (int or "AUTO", per-term tiering like the fuzzy query):
      a query token matches any FIELD token within that edit distance — an
      ``exists(tokens, levenshtein ≤ d)`` HOF per query term, scan-local
      (no shuffle; O(tokens · terms) per row). At index scale the faster
      route is the stored term dictionary: expand each fuzzy term against
      the bounded vocabulary driver-side (Lucene's Levenshtein-automaton
      walk re-expressed), then match exactly — see
      queries/search_q.fuzzy_expand.
    """

    field: str
    text: str
    analyzer: str | None = None
    tokens_col: str | None = None
    operator: str = "or"
    minimum_should_match: int = 0
    fuzziness: object = None

    def _token_pred(self, field_tokens: Column, t: str) -> Column:
        if self.fuzziness is None:
            return F.array_contains(field_tokens, t)
        d = Fuzzy(self.field, t, fuzziness=self.fuzziness).max_edits()
        if d == 0:
            return F.array_contains(field_tokens, t)
        return F.exists(
            field_tokens, lambda x: F.levenshtein(x, F.lit(t)) <= d
        )

    def predicate(self, spark, resolve) -> Column:
        if self.operator not in ("or", "and"):
            raise ValueError(f"match operator must be 'or'/'and', got {self.operator!r}")
        if self.analyzer is None:
            return resolve(self.field) == F.lit(self.text)
        query_tokens = analyze_text(spark, self.text, self.analyzer)
        if not query_tokens:
            return F.lit(False)
        field_tokens = (
            resolve(self.tokens_col)
            if self.tokens_col is not None
            else analyze(resolve(self.field), self.analyzer)
        )

        def pred_over(ft: Column) -> Column:
            if self.operator == "and":
                out = self._token_pred(ft, query_tokens[0])
                for t in query_tokens[1:]:
                    out = out & self._token_pred(ft, t)
                return out
            if self.minimum_should_match > 1:
                matched = sum(
                    (
                        self._token_pred(ft, t).cast("int")
                        for t in query_tokens
                    ),
                    start=F.lit(0),
                )
                return matched >= self.minimum_should_match
            if self.fuzziness is None:
                return F.arrays_overlap(
                    ft, F.array(*[F.lit(t) for t in query_tokens])
                )
            out = self._token_pred(ft, query_tokens[0])
            for t in query_tokens[1:]:
                out = out | self._token_pred(ft, t)
            return out

        if self.tokens_col is None and len(query_tokens) > 1:
            # inline analysis referenced once per query token on the
            # and/msm/fuzzy paths — bind it once (Catalyst does not CSE
            # repeated subtrees, so each reference would re-run the
            # analyzer); a materialized column is already an O(1)
            # attribute read and needs no binding
            return F.element_at(
                F.transform(F.array(field_tokens), pred_over), 1
            )
        return pred_over(field_tokens)


@dataclass
class Terms(Query):
    """ES ``terms``: keyword membership in a literal list (the multi-value
    Term). Compiles to ``isin`` — an IN-list the scan can push down."""

    field: str
    values: list

    def predicate(self, spark, resolve) -> Column:
        return resolve(self.field).isin(list(self.values))


@dataclass
class TermsSet(Query):
    """ES ``terms_set``: like ``terms`` over a multi-valued field, but a
    document matches only when at least N of the supplied terms are
    present — N being either a constant (``minimum_should_match``) or a
    PER-DOCUMENT numeric field (``minimum_should_match_field``, ES's
    required_matches pattern: each doc declares how many of its terms are
    mandatory). Compiles to a sum of array_contains indicators compared
    against the bound — codegen'd conjunction arithmetic riding the scan,
    no HOF loop, fully oracle-able (sum of list_contains CASEs)."""

    field: str
    terms: list
    minimum_should_match: int | None = None
    minimum_should_match_field: str | None = None

    def predicate(self, spark, resolve) -> Column:
        if not self.terms:
            raise ValueError("terms_set needs a non-empty terms list")
        if (self.minimum_should_match is None) == (
            self.minimum_should_match_field is None
        ):
            raise ValueError(
                "terms_set needs exactly one of minimum_should_match / "
                "minimum_should_match_field"
            )
        arr = resolve(self.field)
        matched = sum(
            (F.array_contains(arr, t).cast("int") for t in self.terms),
            start=F.lit(0),
        )
        if self.minimum_should_match_field is not None:
            bound = resolve(self.minimum_should_match_field)
        else:
            bound = F.lit(int(self.minimum_should_match))
        return matched >= bound


def _like_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


@dataclass
class Prefix(Query):
    """ES ``prefix``: keyword starts-with. Compiles to ``LIKE 'p%'`` (the
    form range-index pruning understands on both engines)."""

    field: str
    value: str

    def predicate(self, spark, resolve) -> Column:
        return resolve(self.field).like(_like_escape(self.value) + "%")


@dataclass
class Wildcard(Query):
    """ES ``wildcard``: ``*`` = any run, ``?`` = any one char, translated to
    SQL LIKE (``%``/``_``) with the target's own LIKE specials escaped —
    identical semantics in Spark and DuckDB, so fully oracle-able."""

    field: str
    pattern: str

    def predicate(self, spark, resolve) -> Column:
        like = _like_escape(self.pattern).replace("*", "%").replace("?", "_")
        return resolve(self.field).like(like)


@dataclass
class Regexp(Query):
    """ES ``regexp``: anchored regular-expression match on a keyword field.
    Lucene regexps implicitly match the ENTIRE term (no ^/$ anchors), so
    the pattern compiles to ``rlike('^(?:pat)$')``. The supported surface
    is Lucene's CORE operator set — ``. ? + * | ( ) [ ] { }`` plus
    literals and escapes — which Java regex (Spark) and PCRE-ish RE2-style
    engines (DuckDB ``regexp_full_match``) interpret identically, so the
    node is fully oracle-able. Lucene's OPTIONAL operators (``~`` negation,
    ``&`` intersection, ``<>`` numeric interval, ``@`` any-string) have no
    Java-regex equivalent and are rejected loudly rather than silently
    mis-matched."""

    field: str
    pattern: str

    def _translate(self) -> str:
        """Validate against Lucene's optional operators and translate the
        core syntax to Java/RE2 regex: ``^`` and ``$`` are LITERALS in
        Lucene (its match is always whole-term), so they are escaped —
        except ``^`` directly after ``[``, which both dialects read as
        class negation."""
        out = []
        i, n = 0, len(self.pattern)
        in_class = False
        while i < n:
            c = self.pattern[i]
            if c == "\\":
                out.append(self.pattern[i:i + 2])
                i += 2
                continue
            if not in_class and c in "~&@<>":
                raise ValueError(
                    f"regexp pattern {self.pattern!r} uses Lucene optional "
                    f"operator {c!r} (negation/intersection/interval/"
                    "any-string), which has no portable regex equivalent; "
                    "rewrite with core operators"
                )
            if c == "[":
                in_class = True
                out.append(c)
            elif c == "]" and in_class:
                in_class = False
                out.append(c)
            elif c == "^" and not (
                in_class and out and out[-1] == "["
            ):
                out.append("\\^")
            elif c == "$":
                out.append("\\$")
            else:
                out.append(c)
            i += 1
        return "".join(out)

    def predicate(self, spark, resolve) -> Column:
        return resolve(self.field).rlike("^(?:" + self._translate() + ")$")


@dataclass
class Fuzzy(Query):
    """ES ``fuzzy``: keyword match within bounded Levenshtein edit distance.
    ``fuzziness`` is an int or ``"AUTO"`` (ES's tiering: 0 edits for terms
    of ≤2 chars, 1 for 3–5, 2 for ≥6). Compiles to the built-in
    ``levenshtein(field, lit) <= d`` — a codegen'd JVM expression DuckDB
    mirrors verbatim (``levenshtein``), so the node is fully oracle-able.
    Lucene's fuzzy machinery is a Levenshtein AUTOMATON over the term
    dictionary — an index-side optimization of the same predicate; at scale
    the materialized term dictionary (indexing.build_term_dict) bounds the
    distinct-value side exactly like Lucene's."""

    field: str
    value: str
    fuzziness: object = "AUTO"

    def max_edits(self) -> int:
        if isinstance(self.fuzziness, str):
            if self.fuzziness.upper() != "AUTO":
                raise ValueError(
                    f"fuzziness must be an int or 'AUTO', got {self.fuzziness!r}"
                )
            n = len(self.value)
            return 0 if n <= 2 else (1 if n <= 5 else 2)
        return int(self.fuzziness)

    def predicate(self, spark, resolve) -> Column:
        d = self.max_edits()
        if d == 0:
            return resolve(self.field) == F.lit(self.value)
        return F.levenshtein(resolve(self.field), F.lit(self.value)) <= d


@dataclass
class Ids(Query):
    """ES ``ids``: document-key membership. ES resolves ``_id`` metadata;
    this engine binds it to the corpus id column (``from_es_json``'s
    ``id_field``, default ``doc_id``) — an IN-list the scan pushes down."""

    values: list
    id_field: str = "doc_id"

    def predicate(self, spark, resolve) -> Column:
        return resolve(self.id_field).isin(list(self.values))


@dataclass
class MultiMatch(Query):
    """ES ``multi_match``: the query text runs against several fields,
    each analyzed by its OWN mapping analyzer; a document matches if any
    field matches. ``type`` picks the score combination: ``best_fields``
    (the default) takes the best single field — greatest(boost_i ·
    matched_i); ``most_fields`` SUMS the per-field scores, ES's shape for
    "the same text analyzed different ways, every matching variant adds
    evidence". Fields without an analyzer binding are keywords →
    whole-string equality, exactly the per-field Match semantics. Either
    way the score is one codegen'd expression, no per-field subquery."""

    CONSTANT_SCORE = False

    fields: list  # [(field, boost), ...]
    text: str
    analyzers: dict
    tokens_cols: dict
    type: str = "best_fields"
    tie_breaker: float = 0.0

    def __post_init__(self):
        if self.type not in ("best_fields", "most_fields"):
            raise ValueError(
                f"unsupported multi_match type: {self.type!r} "
                "(best_fields/most_fields)"
            )
        if not (0.0 <= self.tie_breaker <= 1.0):
            raise ValueError(
                f"tie_breaker must be in [0, 1], got {self.tie_breaker}"
            )
        if self.tie_breaker and self.type != "best_fields":
            raise ValueError(
                "tie_breaker applies to best_fields (most_fields already "
                "sums every matching leg)"
            )

    def _legs(self, spark, resolve) -> list[tuple[Column, float]]:
        legs = []
        for field, boost in self.fields:
            m = Match(
                field, self.text,
                analyzer=self.analyzers.get(field),
                tokens_col=self.tokens_cols.get(field),
            )
            legs.append((m.predicate(spark, resolve), float(boost)))
        return legs

    def predicate(self, spark, resolve) -> Column:
        legs = self._legs(spark, resolve)
        out = legs[0][0]
        for p, _ in legs[1:]:
            out = out | p
        return out

    def score(self, spark, resolve) -> Column:
        scored = [
            F.when(p, F.lit(b)).otherwise(F.lit(0.0))
            for p, b in self._legs(spark, resolve)
        ]
        if len(scored) == 1:
            return scored[0]
        if self.type == "most_fields":
            total = scored[0]
            for s in scored[1:]:
                total = total + s
            return total
        best = F.greatest(*scored)
        if self.tie_breaker == 0.0:
            return best
        # ES best_fields tie_breaker: best + tb · (sum − best), DisMax's
        # combination over the per-field legs
        total = scored[0]
        for s in scored[1:]:
            total = total + s
        return best + F.lit(float(self.tie_breaker)) * (total - best)


@dataclass
class MatchPhrase(Query):
    """ES ``match_phrase``: the query's analyzed tokens must appear
    CONSECUTIVELY in the field's token sequence. Without positional
    postings (Lucene's phrase machinery), the exact equivalent over a token
    array is substring containment in the NUL-joined token stream:

        instr(0x00 || join(tokens, 0x00) || 0x00,
              0x00 || join(phrase, 0x00) || 0x00) > 0

    — one codegen'd string op per row, no HOF loop, and DuckDB mirrors it
    verbatim (array_to_string + position), so the node is oracle-able.
    Analyzer tokens never contain NUL (the tokenizers split on it)."""

    field: str
    text: str
    analyzer: str
    tokens_col: str | None = None
    slop: int = 0

    def predicate(self, spark, resolve) -> Column:
        phrase = analyze_text(spark, self.text, self.analyzer)
        if not phrase:
            return F.lit(False)
        toks = (
            resolve(self.tokens_col)
            if self.tokens_col is not None
            else analyze(resolve(self.field), self.analyzer)
        )
        if self.slop:
            # Sloppy phrase (ES match_phrase slop), Lucene's semantics
            # (SloppyPhraseMatcher): each phrase slot's document positions
            # are ADJUSTED by its phrase offset (p - q); the phrase matches
            # iff some assignment of DISTINCT document positions (Lucene's
            # rule for repeated terms) - one per slot - has
            #     max(adjusted) - min(adjusted) <= slop
            # - the "matchLength" Lucene sweeps for, equal to the number of
            # position-moves to edit the document arrangement into the
            # query's (a transposition of adjacent terms costs 2: gap + 1).
            # Expressed scan-locally: the optimal window starts AT one of
            # the adjusted positions (anchor a); slot (t, q) may then use
            # any p in P(t) ∩ [a+q, a+q+slop]. Distinctness across
            # DISTINCT tokens is automatic (one token per position); within
            # a token repeated at offsets q_1<...<q_m, a system of distinct
            # representatives for the equal-length candidate intervals
            # exists iff Hall's condition holds on every CONTIGUOUS offset
            # range (sufficient for equal-length sorted intervals: any
            # overlap-connected subset of slots is bounded by the count
            # over its hull range):
            #     |P(t) ∩ ∪_{k in [i,j]} [a+q_k, a+q_k+slop]| >= j-i+1
            # - sum of m_t(m_t+1)/2 size(filter(...)) checks, all
            # scan-local HOFs over position arrays, no shuffle. For
            # all-distinct phrases (every m_t = 1) this reduces to one
            # window-membership exists per term.
            slop = int(self.slop)

            offsets: dict[str, list[int]] = {}
            for q, t in enumerate(phrase):
                offsets.setdefault(t, []).append(q)
            terms = list(offsets)

            def check(ts: Column) -> Column:
                # ts = the token array, BOUND once (Catalyst does not CSE
                # repeated subtrees — an unbound `toks` would re-run the
                # whole analyzer per position-array reference). The
                # per-term position arrays are likewise bound once as a
                # struct before the anchor sweep references them
                # n + Σ m_t(m_t+1)/2 times each.
                def positions(term: str) -> Column:
                    return F.filter(
                        F.transform(
                            ts,
                            lambda x, i: F.when(
                                x == F.lit(term), i
                            ).otherwise(-1),
                        ),
                        lambda p: p >= 0,
                    )

                pos_struct = F.struct(*[
                    positions(t).alias(f"p{i}") for i, t in enumerate(terms)
                ])

                def sweep(ps: Column) -> Column:
                    pos_by_term = {
                        t: ps[f"p{i}"] for i, t in enumerate(terms)
                    }

                    def adjust(term: str, offset: int) -> Column:
                        # bind offset eagerly: PySpark HOF lambdas must
                        # stay single-parameter (arity drives (x) vs
                        # (x, i) dispatch)
                        off = F.lit(offset)
                        return F.transform(
                            pos_by_term[term], lambda p: p - off
                        )

                    starts = F.flatten(F.array(*[
                        adjust(t, q)
                        for t, qs in offsets.items() for q in qs
                    ]))

                    def window_covers(a: Column) -> Column:
                        cond = None
                        for t, qs in offsets.items():
                            pt = pos_by_term[t]
                            for i in range(len(qs)):
                                for j in range(i, len(qs)):
                                    need = j - i + 1
                                    ks = tuple(qs[i:j + 1])

                                    # single-parameter on purpose (HOF
                                    # arity dispatch); `ks` is a closure,
                                    # safe because F.exists/F.filter
                                    # invoke it eagerly this iteration
                                    def member(p) -> Column:
                                        m = None
                                        for q in ks:
                                            rng = (p >= a + F.lit(q)) & (
                                                p <= a + F.lit(q + slop)
                                            )
                                            m = rng if m is None else m | rng
                                        return m

                                    c = (
                                        F.exists(pt, member)
                                        if need == 1
                                        else F.size(F.filter(pt, member))
                                        >= need
                                    )
                                    cond = c if cond is None else cond & c
                        return cond

                    return F.exists(starts, window_covers)

                return F.element_at(
                    F.transform(F.array(pos_struct), sweep), 1
                )

            return F.element_at(F.transform(F.array(toks), check), 1)
        nul = "\x00"
        hay = F.concat(
            F.lit(nul), F.array_join(toks, nul), F.lit(nul)
        )
        needle = nul + nul.join(phrase) + nul
        return F.instr(hay, needle) > 0


@dataclass
class Intervals(Query):
    """ES ``intervals`` query (r8 — the general positional front-end the
    sloppy-phrase machinery specializes): the field's analyzed token
    stream must contain an interval satisfying the rule tree.

    Supported rules (the ones ES's docs lead with; the rest raise):

    * ``match``: the rule's analyzed terms all occur within one interval.
      ``max_gaps`` (default -1 = unlimited) bounds the number of
      non-matching positions INSIDE the interval: an interval of width w
      containing the n terms has w - n gaps. ``ordered`` (default false)
      additionally requires the terms at strictly increasing positions in
      query order (Lucene's non-overlapping ordered-interval rule).
    * ``any_of``: OR over sub-rules.
    * ``all_of`` (r8, documented subset): composition of CONTIGUOUS
      children — each child a ``match`` that is a single term or
      carries ``max_gaps: 0`` (a phrase). One occurrence per child,
      non-overlapping, with the composed interval's gaps — span width
      minus the children's combined width, Lucene's ``gaps()`` —
      bounded by ``max_gaps``. ``ordered: true`` requires each child
      strictly after the previous child's end; UNORDERED (r12, formerly
      a loud refusal) is exact for <= 4 children by ORing the ordered
      chain over every child permutation (ES's all_of intervals must
      not overlap, so any valid assignment sorts into some
      permutation). This is the multi-phrase proximity query ("'vector
      merge' … then 'order', near"). Gappy (variable-width) children
      still raise loudly: their minimal-interval enumeration has no
      bounded scan-local form here.

    Evaluation is scan-local HOFs over per-term position arrays — no
    shuffle, no UDF — reusing the bind-once discipline of the sloppy
    phrase (plans/search.py MatchPhrase.slop):

    * unordered: a valid assignment of distinct positions with
      max-min+1-n <= max_gaps exists iff SOME window [a, a+n+max_gaps-1]
      anchored at a term position contains every term with multiplicity
      (|P(t) ∩ W| >= m_t — Hall's condition is this simple here because
      all of a repeated term's slots share one candidate window).
    * ordered: anchor at each position of the first query term, then
      greedily take the smallest next position of each following term
      (earliest-next minimizes the interval end for a fixed start, so
      greedy is exact); check width at the end.
    """

    field: str
    rule: dict
    analyzer: str
    tokens_col: str | None = None

    _RULE_KINDS = ("match", "any_of", "all_of", "prefix", "wildcard")

    def __post_init__(self):
        self._validate(self.rule)

    @classmethod
    def _validate(cls, rule) -> None:
        if not isinstance(rule, dict) or len(rule) != 1:
            raise ValueError(
                "intervals rule must be a single-key object, got "
                f"{rule!r}"
            )
        (kind, body), = rule.items()
        if kind in ("prefix", "wildcard"):
            # unit-width rules: one token position per match. The
            # prefix/pattern is lowercased to meet the lowercase-bearing
            # analyzers' token stream (ES normalizes through the
            # analyzer chain); ``use_field`` (a DIFFERENT field's token
            # stream) is out of scope and rejected loudly.
            want = "prefix" if kind == "prefix" else "pattern"
            if not isinstance(body, dict) or want not in body:
                raise ValueError(
                    f"intervals {kind} needs {{'{want}': ...}}"
                )
            extra = set(body) - {want, "analyzer"}
            if extra:
                raise ValueError(
                    f"unsupported intervals {kind} options: "
                    f"{sorted(extra)}"
                    + (" (use_field is out of scope)"
                       if "use_field" in extra else "")
                )
            if not isinstance(body[want], str) or not body[want]:
                raise ValueError(
                    f"intervals {kind}.{want} must be a non-empty string"
                )
            return
        if kind == "match":
            if not isinstance(body, dict) or "query" not in body:
                raise ValueError("intervals match needs {'query': ...}")
            extra = set(body) - {"query", "max_gaps", "ordered", "analyzer"}
            if extra:
                raise ValueError(
                    f"unsupported intervals match options: {sorted(extra)}"
                )
            if int(body.get("max_gaps", -1)) < -1:
                raise ValueError("intervals max_gaps must be >= -1")
        elif kind == "any_of":
            if (not isinstance(body, dict) or set(body) != {"intervals"}
                    or not isinstance(body["intervals"], list)
                    or not body["intervals"]):
                raise ValueError(
                    "intervals any_of needs {'intervals': [rule, ...]}"
                )
            for sub in body["intervals"]:
                cls._validate(sub)
        elif kind == "all_of":
            extra = set(body) - {"intervals", "max_gaps", "ordered"}
            if extra:
                raise ValueError(
                    f"unsupported all_of options: {sorted(extra)}"
                )
            subs = body.get("intervals")
            if not isinstance(subs, list) or not subs:
                raise ValueError(
                    "intervals all_of needs {'intervals': [rule, ...]}"
                )
            if not body.get("ordered") and len(subs) > 4:
                raise ValueError(
                    "unordered all_of supports at most 4 children (the "
                    "exact evaluation ORs the ordered chain over child "
                    "permutations — 4! = 24 is the expression-size cap)"
                )
            if int(body.get("max_gaps", -1)) < -1:
                raise ValueError("intervals max_gaps must be >= -1")
            for sub in subs:
                if not (isinstance(sub, dict) and len(sub) == 1
                        and next(iter(sub)) in ("match", "prefix",
                                                "wildcard")):
                    raise ValueError(
                        "all_of children must be match/prefix/wildcard "
                        f"rules (got {sub!r})"
                    )
                cls._validate(sub)
        else:
            raise ValueError(
                f"unsupported intervals rule {kind!r} "
                f"(supported: {list(cls._RULE_KINDS)})"
            )

    def predicate(self, spark, resolve) -> Column:
        toks = (
            resolve(self.tokens_col)
            if self.tokens_col is not None
            else analyze(resolve(self.field), self.analyzer)
        )

        def check(ts: Column) -> Column:
            return self._compile(spark, ts, self.rule)

        # bind the analyzed token array ONCE (Catalyst does not CSE)
        return F.element_at(F.transform(F.array(toks), check), 1)

    def _compile(self, spark, ts: Column, rule: dict) -> Column:
        (kind, body), = rule.items()
        if kind == "any_of":
            cond = None
            for sub in body["intervals"]:
                c = self._compile(spark, ts, sub)
                cond = c if cond is None else cond | c
            return cond
        if kind == "all_of":
            return self._compile_all_of(spark, ts, body)
        if kind in ("prefix", "wildcard"):
            return F.size(self._unit_positions(ts, kind, body)) > 0
        # match
        tokens = analyze_text(
            spark, body["query"], body.get("analyzer", self.analyzer)
        )
        if not tokens:
            return F.lit(False)
        n = len(tokens)
        max_gaps = int(body.get("max_gaps", -1))
        ordered = bool(body.get("ordered", False))
        terms = list(dict.fromkeys(tokens))
        mult = {t: tokens.count(t) for t in terms}

        def positions(term: str) -> Column:
            tl = F.lit(term)
            return F.filter(
                F.transform(
                    ts,
                    lambda x, i: F.when(x == tl, i).otherwise(-1),
                ),
                lambda p: p >= 0,
            )

        pos_struct = F.struct(*[
            positions(t).alias(f"p{i}") for i, t in enumerate(terms)
        ])

        def sweep(ps: Column) -> Column:
            pos_by_term = {t: ps[f"p{i}"] for i, t in enumerate(terms)}
            if ordered:
                first = pos_by_term[tokens[0]]

                def chain_ok(a: Column) -> Column:
                    p = a
                    for t in tokens[1:]:
                        prev = p
                        p = F.array_min(
                            F.filter(pos_by_term[t], lambda x: x > prev)
                        )

                    def fin(pn: Column) -> Column:
                        ok = pn.isNotNull()
                        if max_gaps >= 0:
                            ok = ok & (pn - a + 1 - n <= max_gaps)
                        return ok

                    # bind the chain's end once (it is referenced twice)
                    return F.element_at(
                        F.transform(F.array(p), fin), 1
                    )

                return F.coalesce(F.exists(first, chain_ok), F.lit(False))
            if max_gaps < 0:
                cond = None
                for t in terms:
                    c = F.size(pos_by_term[t]) >= mult[t]
                    cond = c if cond is None else cond & c
                return cond
            width = n + max_gaps
            starts = F.flatten(F.array(*[pos_by_term[t] for t in terms]))

            def window_ok(a: Column) -> Column:
                cond = None
                for t in terms:
                    c = F.size(F.filter(
                        pos_by_term[t],
                        lambda p: (p >= a) & (p <= a + F.lit(width - 1)),
                    )) >= mult[t]
                    cond = c if cond is None else cond & c
                return cond

            return F.coalesce(F.exists(starts, window_ok), F.lit(False))

        return F.element_at(F.transform(F.array(pos_struct), sweep), 1)

    def _unit_positions(self, ts: Column, kind: str, body: dict) -> Column:
        """Token positions matching a unit-width (single-position) rule:
        ``prefix`` = tokens starting with the (lowercased) prefix,
        ``wildcard`` = tokens matching the (lowercased) ``*``/``?``
        pattern as an anchored regex — one scan-local HOF, no UDF."""
        if kind == "prefix":
            lit = F.lit(body["prefix"].lower())
            pred = lambda x: x.startswith(lit)
        else:
            import re as _re

            rx = "".join(
                ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
                for ch in body["pattern"].lower()
            )
            pred = lambda x: x.rlike("^" + rx + "$")
        return F.filter(
            F.transform(
                ts, lambda x, i: F.when(pred(x), i).otherwise(-1)
            ),
            lambda p: p >= 0,
        )

    def _compile_all_of(self, spark, ts: Column, body: dict) -> Column:
        """Ordered all_of over contiguous children: each child's
        occurrence-start array is one scan-local expression (positions s
        where slice(ts, s+1, n_c) equals the child's token literal;
        prefix/wildcard children are unit-width position filters); the
        anchor sweep greedily takes each following child's earliest start
        strictly after the previous child's end (earliest-next minimizes
        the composed end for a fixed anchor ⇒ exact), then bounds
        gaps = span width − Σ child widths."""
        max_gaps = int(body.get("max_gaps", -1))
        children: list[tuple[str, object]] = []
        for sub in body["intervals"]:
            (ckind, cbody), = sub.items()
            if ckind in ("prefix", "wildcard"):
                children.append((ckind, cbody))
                continue
            mbody = cbody
            toks = analyze_text(
                spark, mbody["query"], mbody.get("analyzer", self.analyzer)
            )
            if not toks:
                return F.lit(False)
            if len(toks) > 1 and int(mbody.get("max_gaps", -1)) != 0:
                raise ValueError(
                    "all_of children must be contiguous: a multi-term "
                    f"child needs max_gaps: 0 (got {mbody!r})"
                )
            if mbody.get("ordered") not in (None, True) and len(toks) > 1:
                # a contiguous (max_gaps=0) match is inherently ordered
                raise ValueError(
                    "all_of children with max_gaps: 0 are ordered by "
                    "construction; ordered: false is contradictory"
                )
            children.append(("match", toks))
        widths = [1 if k != "match" else len(p) for k, p in children]
        total_w = sum(widths)
        n_doc = F.size(ts)

        def starts_of(ctoks: list[str]) -> Column:
            lit = F.array(*[F.lit(t) for t in ctoks])
            nc = len(ctoks)
            return F.when(
                n_doc >= nc,
                F.filter(
                    F.transform(
                        F.sequence(F.lit(0), n_doc - nc),
                        lambda s: F.when(
                            F.slice(ts, s + 1, nc) == lit, s
                        ).otherwise(-1),
                    ),
                    lambda p: p >= 0,
                ),
            ).otherwise(F.array().cast("array<int>"))

        starts_struct = F.struct(*[
            (starts_of(p) if k == "match"
             else self._unit_positions(ts, k, p)).alias(f"c{i}")
            for i, (k, p) in enumerate(children)
        ])

        # unordered (r12, formerly a loud refusal): ES all_of intervals
        # must not overlap, so a valid any-order assignment exists iff
        # SOME permutation chains in order — OR the ordered chain over
        # every child permutation (validated <= 4 children = 24 chains,
        # all reading the same bound starts struct). Exactness: sort any
        # valid assignment by start to get its permutation; the greedy
        # earliest-next chain anchored at that assignment's first start
        # ends no later, so its gap count can only be smaller.
        import itertools

        perms = (
            [tuple(range(len(children)))] if body.get("ordered")
            else list(itertools.permutations(range(len(children))))
        )

        def sweep(ss: Column) -> Column:
            def make_chain_ok(perm):
                # factory, NOT a default arg: HOF lambdas are
                # arity-dispatched, so a second parameter would receive
                # the element index
                def chain_ok(a: Column) -> Column:
                    end = a + F.lit(widths[perm[0]] - 1)
                    for i in perm[1:]:
                        prev_end = end
                        s_i = F.array_min(
                            F.filter(ss[f"c{i}"], lambda x: x > prev_end)
                        )
                        end = s_i + F.lit(widths[i] - 1)

                    def fin(e: Column) -> Column:
                        ok = e.isNotNull()
                        if max_gaps >= 0:
                            ok = ok & (e - a + 1 - total_w <= max_gaps)
                        return ok

                    return F.element_at(F.transform(F.array(end), fin), 1)

                return chain_ok

            conds = []
            for perm in perms:
                first = ss[f"c{perm[0]}"]
                conds.append(
                    F.coalesce(F.exists(first, make_chain_ok(perm)),
                               F.lit(False))
                )
            out = conds[0]
            for c in conds[1:]:
                out = out | c
            return out

        return F.element_at(F.transform(F.array(starts_struct), sweep), 1)


@dataclass
class MatchPhrasePrefix(Query):
    """ES ``match_phrase_prefix`` (search-as-you-type): the analyzed terms
    must appear consecutively, with the LAST term matching as a PREFIX of
    a field token. Same NUL-joined containment as MatchPhrase, with the
    needle's trailing NUL dropped after the last term's prefix — so
    '\\0spark\\0mer' finds 'spark' followed by any token starting 'mer'.
    One codegen'd string op per row; DuckDB mirrors it (position over
    array_to_string), so the node is fully oracle-able. A single-term
    query degrades to a token-prefix exists (the startswith HOF)."""

    field: str
    text: str
    analyzer: str
    tokens_col: str | None = None

    def predicate(self, spark, resolve) -> Column:
        phrase = analyze_text(spark, self.text, self.analyzer)
        if not phrase:
            return F.lit(False)
        toks = (
            resolve(self.tokens_col)
            if self.tokens_col is not None
            else analyze(resolve(self.field), self.analyzer)
        )
        nul = "\x00"
        if len(phrase) == 1:
            return F.exists(toks, lambda t: t.startswith(phrase[0]))
        hay = F.concat(F.lit(nul), F.array_join(toks, nul), F.lit(nul))
        needle = nul + nul.join(phrase)  # no trailing NUL: prefix match
        return F.instr(hay, needle) > 0


@dataclass
class MatchBoolPrefix(Query):
    """ES ``match_bool_prefix``: every analyzed term must be present
    (operator='and' here — ES defaults to 'or'; both supported), except
    the LAST, which matches as a token prefix ANYWHERE in the field (the
    position-free sibling of match_phrase_prefix — the type-ahead query
    for bag-of-words boxes)."""

    field: str
    text: str
    analyzer: str
    tokens_col: str | None = None
    operator: str = "or"

    def predicate(self, spark, resolve) -> Column:
        if self.operator not in ("or", "and"):
            raise ValueError(
                f"operator must be 'or'/'and', got {self.operator!r}"
            )
        phrase = analyze_text(spark, self.text, self.analyzer)
        if not phrase:
            return F.lit(False)
        toks = (
            resolve(self.tokens_col)
            if self.tokens_col is not None
            else analyze(resolve(self.field), self.analyzer)
        )
        last = phrase[-1]
        prefix_pred = F.exists(toks, lambda t: t.startswith(last))
        full_preds = [F.array_contains(toks, t) for t in phrase[:-1]]
        preds = full_preds + [prefix_pred]
        out = preds[0]
        for p in preds[1:]:
            out = (out & p) if self.operator == "and" else (out | p)
        return out


@dataclass
class RankFeature(Query):
    """ES ``rank_feature``: score a document by a numeric feature field
    through a saturating function — the query that folds popularity /
    pagerank / freshness features into relevance. Matches when the
    feature is present and positive (ES's contract); scores:

    * ``saturation``: boost * x / (x + pivot)      (default)
    * ``log``: boost * ln(scaling_factor + x)
    * ``sigmoid``: boost * x^exp / (x^exp + pivot^exp)

    All pure Column arithmetic riding the scan, oracle-able verbatim."""

    CONSTANT_SCORE = False

    field: str
    function: str = "saturation"
    pivot: float = 1.0
    scaling_factor: float = 1.0
    exponent: float = 1.0
    boost: float = 1.0

    def predicate(self, spark, resolve) -> Column:
        c = resolve(self.field)
        return c.isNotNull() & (c > 0)

    def score(self, spark, resolve) -> Column:
        x = resolve(self.field).cast("double")
        if self.function == "saturation":
            s = x / (x + F.lit(float(self.pivot)))
        elif self.function == "log":
            s = F.log(F.lit(float(self.scaling_factor)) + x)
        elif self.function == "sigmoid":
            e = float(self.exponent)
            s = F.pow(x, e) / (F.pow(x, e) + F.lit(float(self.pivot) ** e))
        else:
            raise ValueError(
                f"rank_feature function must be saturation/log/sigmoid, "
                f"got {self.function!r}"
            )
        return F.when(
            self.predicate(spark, resolve), F.lit(float(self.boost)) * s
        ).otherwise(F.lit(0.0))


@dataclass
class Pinned(Query):
    """ES ``pinned``: promote specific document ids to the top of the
    result list, organic matches ranked below by their own score. The
    promoted scores are a descending constant ladder ABOVE any organic
    score (ES pins with float-max-adjacent constants; here pin i of k
    scores ``pin_base + (k - i)`` so earlier ids in the list rank
    higher), implemented as pure CASE arithmetic on the id column."""

    CONSTANT_SCORE = False

    ids: list
    organic: Query
    id_field: str = "doc_id"
    pin_base: float = 1e9

    def predicate(self, spark, resolve) -> Column:
        return resolve(self.id_field).isin(list(self.ids)) | \
            self.organic.predicate(spark, resolve)

    def score(self, spark, resolve) -> Column:
        idc = resolve(self.id_field)
        out = self.organic.score(spark, resolve)
        k = len(self.ids)
        for i, pid in enumerate(self.ids):
            out = F.when(
                idc == F.lit(pid), F.lit(self.pin_base + (k - i))
            ).otherwise(out)
        return out


@dataclass
class DistanceFeature(Query):
    """ES ``distance_feature``: score by PROXIMITY to an origin — the
    recency/nearness boost (newer documents rank higher). For numeric and
    timestamp fields: ``boost * pivot / (pivot + |value - origin|)``,
    where pivot is the distance at which the score halves. Timestamp
    origins/pivots are given in seconds (callers convert ES's date-math
    strings); matches when the field is present — pure scan arithmetic,
    oracle-able verbatim."""

    CONSTANT_SCORE = False

    field: str
    origin: float
    pivot: float
    boost: float = 1.0

    def predicate(self, spark, resolve) -> Column:
        return resolve(self.field).isNotNull()

    def score(self, spark, resolve) -> Column:
        c = resolve(self.field)
        # cast-to-double works for numerics AND timestamps (epoch seconds
        # WITH fraction — unix_timestamp would truncate and drift from
        # engines that keep sub-second precision)
        v = c.cast("double")
        if self.pivot <= 0:
            raise ValueError(f"pivot must be > 0, got {self.pivot}")
        dist = F.abs(v - F.lit(float(self.origin)))
        s = F.lit(float(self.boost)) * F.lit(float(self.pivot)) / (
            F.lit(float(self.pivot)) + dist
        )
        return F.when(self.predicate(spark, resolve), s).otherwise(
            F.lit(0.0)
        )


@dataclass
class Bm25Stats:
    """Corpus statistics BM25 needs: doc count, mean doc length (in tokens),
    and document frequency per query token. Computed in ONE aggregation job
    by ``bm25_stats``; at production scale these live with the index
    (materialized at ingest alongside the token columns), exactly like
    Lucene's segment statistics."""

    n_docs: float
    avgdl: float
    df: dict[str, float]


def bm25_stats(df: DataFrame, tokens_col: str, query_tokens: list[str]) -> Bm25Stats:
    aggs = [
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg(F.size(F.col(tokens_col))).alias("_avgdl"),
    ] + [
        F.sum(F.array_contains(F.col(tokens_col), t).cast("long"))
        .cast("double")
        .alias(f"_df_{i}")
        for i, t in enumerate(query_tokens)
    ]
    row = df.agg(*aggs).head()
    return Bm25Stats(
        n_docs=float(row["_n"]),
        avgdl=float(row["_avgdl"]),
        df={t: float(row[f"_df_{i}"]) for i, t in enumerate(query_tokens)},
    )


def corpus_bm25_provider(spark: SparkSession, docs: DataFrame):
    """A ``bm25_stats_for`` provider (see ``from_es_json``) that computes
    corpus statistics with one aggregation over ``docs`` — the inline path
    when no materialized index exists. Memoized per (tokens_col, analyzer,
    text): a DSL tree reusing the same match in scoring and filter context
    pays for ONE stats job. At index scale prefer
    ``indexing.index_bm25_provider`` (term-dictionary lookup, no scan)."""
    cache: dict[tuple, Bm25Stats] = {}

    def provider(field: str, tokens_col: str, analyzer: str, text: str) -> Bm25Stats:
        key = (tokens_col, analyzer, text)
        if key not in cache:
            cache[key] = bm25_stats(
                docs, tokens_col, analyze_text(spark, text, analyzer)
            )
        return cache[key]

    return provider


@dataclass
class BM25Match(Query):
    """Q5 with real relevance: Okapi BM25 over a materialized token column
    (the scoring ES applies to ``match``, which v1 scoped to constant
    weights — SURVEY §7 risk 4). Per query token t:

        idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))          (Lucene idf)
        tf_sat = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))  (saturation)
        score  = Σ idf(t) · tf_sat(t, doc)

    All per-doc math is JVM Column expressions over the token array
    (``size(filter(tokens, = t))``); corpus stats arrive as literals from
    ``bm25_stats``. Absent tokens contribute 0 naturally (tf = 0).

    ``operator``/``minimum_should_match`` gate WHICH documents match with
    the same semantics as ``Match`` (ES: match options pick the candidate
    set; BM25 then scores the candidates); ``boost`` multiplies the final
    score (the ``field^boost`` convention ``multi_match`` compiles to)."""

    CONSTANT_SCORE = False

    field: str
    text: str
    analyzer: str
    tokens_col: str
    stats: Bm25Stats
    k1: float = 1.2
    b: float = 0.75
    operator: str = "or"
    minimum_should_match: int = 0
    boost: float = 1.0

    def _query_tokens(self, spark) -> list[str]:
        return analyze_text(spark, self.text, self.analyzer)

    def predicate(self, spark, resolve) -> Column:
        if self.operator not in ("or", "and"):
            raise ValueError(
                f"match operator must be 'or'/'and', got {self.operator!r}"
            )
        qt = self._query_tokens(spark)
        if not qt:
            return F.lit(False)
        toks = resolve(self.tokens_col)
        if self.operator == "and":
            out = F.array_contains(toks, qt[0])
            for t in qt[1:]:
                out = out & F.array_contains(toks, t)
            return out
        if self.minimum_should_match > 1:
            matched = sum(
                (F.array_contains(toks, t).cast("int") for t in qt),
                start=F.lit(0),
            )
            return matched >= self.minimum_should_match
        return F.arrays_overlap(toks, F.array(*[F.lit(t) for t in qt]))

    def score(self, spark, resolve) -> Column:
        import math

        toks = resolve(self.tokens_col)
        dl = F.size(toks).cast("double")
        total = F.lit(0.0)
        for t in self._query_tokens(spark):
            df_t = self.stats.df.get(t, 0.0)
            idf = math.log(
                1.0 + (self.stats.n_docs - df_t + 0.5) / (df_t + 0.5)
            )
            tf = F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("double")
            sat = (tf * F.lit(self.k1 + 1.0)) / (
                tf
                + F.lit(self.k1)
                * (F.lit(1.0 - self.b) + F.lit(self.b) * dl / F.lit(self.stats.avgdl))
            )
            total = total + F.lit(idf) * sat
        if self.boost != 1.0:
            total = total * F.lit(float(self.boost))
        return total


def combined_bm25_stats(
    df: DataFrame, fields: list[tuple[str, float]], query_tokens: list[str]
) -> Bm25Stats:
    """Corpus statistics for the ``combined_fields`` pseudo-field: doc
    length = Σ_f weight_f·len_f, and per-token df = docs containing the
    token in ANY field. One aggregation job, like ``bm25_stats``. The
    union-df is EXACT — Lucene's CombinedFieldQuery approximates the
    pseudo-df by merging per-field term stats because the inverted index
    can't see the union; a scan-side engine can, a documented
    strictly-more-principled divergence."""
    dl = None
    for col_name, w in fields:
        term = F.size(F.col(col_name)).cast("double") * F.lit(float(w))
        dl = term if dl is None else dl + term
    aggs = [
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg(dl).alias("_avgdl"),
    ]
    for i, t in enumerate(query_tokens):
        any_f = None
        for col_name, _ in fields:
            c = F.array_contains(F.col(col_name), t)
            any_f = c if any_f is None else (any_f | c)
        aggs.append(
            F.sum(any_f.cast("long")).cast("double").alias(f"_df_{i}")
        )
    row = df.agg(*aggs).head()
    return Bm25Stats(
        n_docs=float(row["_n"]),
        avgdl=float(row["_avgdl"]),
        df={t: float(row[f"_df_{i}"]) for i, t in enumerate(query_tokens)},
    )


def corpus_combined_provider(spark: SparkSession, docs: DataFrame):
    """A ``combined_stats_for`` provider for ``from_es_json`` computing
    combined-pseudo-field statistics with one aggregation over ``docs``
    (memoized per (fields, analyzer, text), like ``corpus_bm25_provider``).
    At index scale the union-df belongs with the segment stats, same as
    the per-field term dictionary."""
    cache: dict[tuple, Bm25Stats] = {}

    def provider(tok_fields, analyzer: str, text: str) -> Bm25Stats:
        key = (tuple(tok_fields), analyzer, text)
        if key not in cache:
            cache[key] = combined_bm25_stats(
                docs, list(tok_fields), analyze_text(spark, text, analyzer)
            )
        return cache[key]

    return provider


@dataclass
class CombinedFields(Query):
    """ES ``combined_fields``: BM25F-style scoring that treats several
    text fields as ONE combined field (the principled multi-field query —
    vs multi_match's per-field score combination):

        tf_c(t)  = Σ_f weight_f · tf_f(t)
        dl_c     = Σ_f weight_f · dl_f
        score    = Σ_t idf(union_df) · tf_c·(k1+1) /
                   (tf_c + k1·(1 - b + b·dl_c/avgdl_c))

    ES requires all fields to share one analyzer; enforced at compile.
    Per-doc math is JVM Column expressions over the token arrays; corpus
    stats arrive as literals from ``combined_bm25_stats``. operator /
    minimum_should_match gate candidates on presence in ANY field."""

    CONSTANT_SCORE = False

    fields: list[tuple[str, float]]  # (tokens_col, weight)
    text: str
    analyzer: str
    stats: Bm25Stats
    k1: float = 1.2
    b: float = 0.75
    operator: str = "or"
    minimum_should_match: int = 0
    boost: float = 1.0

    def _query_tokens(self, spark) -> list[str]:
        return analyze_text(spark, self.text, self.analyzer)

    def _contains(self, resolve, t: str) -> Column:
        out = None
        for col_name, _ in self.fields:
            c = F.array_contains(resolve(col_name), t)
            out = c if out is None else (out | c)
        return out

    def predicate(self, spark, resolve) -> Column:
        if self.operator not in ("or", "and"):
            raise ValueError(
                f"combined_fields operator must be 'or'/'and', "
                f"got {self.operator!r}"
            )
        qt = self._query_tokens(spark)
        if not qt:
            return F.lit(False)
        per_tok = [self._contains(resolve, t) for t in qt]
        if self.operator == "and":
            out = per_tok[0]
            for c in per_tok[1:]:
                out = out & c
            return out
        if self.minimum_should_match > 1:
            matched = sum((c.cast("int") for c in per_tok), start=F.lit(0))
            return matched >= self.minimum_should_match
        out = per_tok[0]
        for c in per_tok[1:]:
            out = out | c
        return out

    def score(self, spark, resolve) -> Column:
        import math

        dl = None
        for col_name, w in self.fields:
            term = F.size(resolve(col_name)).cast("double") * F.lit(float(w))
            dl = term if dl is None else dl + term
        total = F.lit(0.0)
        for t in self._query_tokens(spark):
            df_t = self.stats.df.get(t, 0.0)
            idf = math.log(
                1.0 + (self.stats.n_docs - df_t + 0.5) / (df_t + 0.5)
            )
            tf = None
            for col_name, w in self.fields:
                c = (
                    F.size(F.filter(resolve(col_name), lambda x: x == F.lit(t)))
                    .cast("double") * F.lit(float(w))
                )
                tf = c if tf is None else tf + c
            sat = (tf * F.lit(self.k1 + 1.0)) / (
                tf
                + F.lit(self.k1)
                * (F.lit(1.0 - self.b)
                   + F.lit(self.b) * dl / F.lit(self.stats.avgdl))
            )
            total = total + F.lit(idf) * sat
        if self.boost != 1.0:
            total = total * F.lit(float(self.boost))
        return total


@dataclass
class Range(Query):
    """Q7 (elastic_queries.json:25,28): numeric/temporal comparisons."""

    field: str
    gt: object = None
    gte: object = None
    lt: object = None
    lte: object = None

    def predicate(self, spark, resolve) -> Column:
        c = resolve(self.field)
        conds = []
        if self.gt is not None:
            conds.append(c > F.lit(self.gt))
        if self.gte is not None:
            conds.append(c >= F.lit(self.gte))
        if self.lt is not None:
            conds.append(c < F.lit(self.lt))
        if self.lte is not None:
            conds.append(c <= F.lit(self.lte))
        if not conds:
            raise ValueError(
                f"Range({self.field!r}) needs at least one bound (gt/gte/lt/lte)"
            )
        out = conds[0]
        for extra in conds[1:]:
            out = out & extra
        return out


#: ES's mean earth radius (GeoUtils.EARTH_MEAN_RADIUS), meters.
EARTH_RADIUS_M = 6371008.7714


def haversine_meters(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters between two (lat, lon) degree
    pairs — the haversine formula with ES's mean earth radius, as pure
    JVM math (radians/sin/cos/asin/sqrt), so it rides whole-stage codegen
    and mirrors verbatim into a SQL oracle."""
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def parse_distance_meters(v) -> float:
    """ES distance strings ('200km', '500m', '3mi') or a bare number of
    meters."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    s = str(v).strip().lower()
    for suffix, mult in (("km", 1000.0), ("mi", 1609.344), ("m", 1.0)):
        if s.endswith(suffix):
            return float(s[: -len(suffix)]) * mult
    raise ValueError(
        f"bad distance {v!r} (expected meters, or '<n>m'/'<n>km'/'<n>mi')"
    )


@dataclass
class GeoDistance(Query):
    """ES ``geo_distance`` query: documents within ``distance_m`` meters
    of an origin point. This engine has no geo_point type — a location is
    a PAIR of numeric degree columns (``lat_field``, ``lon_field``),
    which is also how a columnar store holds points at scale — so the
    clause names both columns explicitly instead of one mapped field
    (documented divergence). The haversine predicate is scan-local JVM
    math; like every ES geo filter it is non-scoring (constant score)."""

    lat_field: str
    lon_field: str
    lat: float
    lon: float
    distance_m: float

    def __post_init__(self):
        if not (-90.0 <= self.lat <= 90.0) or not (-180.0 <= self.lon <= 180.0):
            raise ValueError(
                f"origin out of range: lat={self.lat}, lon={self.lon}"
            )
        if self.distance_m <= 0:
            raise ValueError(f"distance must be > 0, got {self.distance_m}")

    def predicate(self, spark, resolve) -> Column:
        d = haversine_meters(
            resolve(self.lat_field).cast("double"),
            resolve(self.lon_field).cast("double"),
            F.lit(float(self.lat)), F.lit(float(self.lon)),
        )
        return d <= F.lit(float(self.distance_m))


@dataclass
class GeoBoundingBox(Query):
    """ES ``geo_bounding_box`` query (r8): documents whose point lies
    inside the [bottom, top] × [left, right] degree box. Same numeric
    degree-column-pair location convention as GeoDistance. A box whose
    ``left > right`` crosses the antimeridian and matches the WRAPPED
    longitude range (lon ≥ left OR lon ≤ right), ES's contract. Pure
    scan-local comparisons — pushdown-eligible, non-scoring."""

    lat_field: str
    lon_field: str
    top: float
    left: float
    bottom: float
    right: float

    def __post_init__(self):
        if not (-90.0 <= self.bottom <= self.top <= 90.0):
            raise ValueError(
                f"bad latitude bounds: top={self.top}, bottom={self.bottom}"
            )
        for name, v in (("left", self.left), ("right", self.right)):
            if not -180.0 <= v <= 180.0:
                raise ValueError(f"bad longitude bound {name}={v}")

    def predicate(self, spark, resolve) -> Column:
        lat = resolve(self.lat_field).cast("double")
        lon = resolve(self.lon_field).cast("double")
        lat_ok = (lat >= F.lit(self.bottom)) & (lat <= F.lit(self.top))
        if self.left <= self.right:
            lon_ok = (lon >= F.lit(self.left)) & (lon <= F.lit(self.right))
        else:  # antimeridian crossing: wrapped range
            lon_ok = (lon >= F.lit(self.left)) | (lon <= F.lit(self.right))
        return lat_ok & lon_ok


@dataclass
class GeoPolygon(Query):
    """ES ``geo_polygon`` query (late r8): documents whose point lies
    inside the closed polygon given as a (lat, lon) vertex list. Same
    numeric degree-column-pair location convention as GeoDistance.
    Containment is the EVEN-ODD (ray casting) rule over planar degree
    coordinates — exactly how ES's legacy geo_polygon evaluates
    (LegacyGeoPointShapeQueryProcessor's planar crossing count), one
    indicator per edge summed into a parity test: a fixed-size
    codegen'd expression, no UDF, non-scoring. Points ON an edge follow
    the half-open crossing convention (deterministic, engine-portable).
    Polygons crossing the antimeridian are out of scope and cannot be
    expressed (vertex longitudes are clamped to [-180, 180]); split
    such polygons into two clauses under a bool should."""

    lat_field: str
    lon_field: str
    points: list  # [(lat, lon), ...] — >= 3 vertices, implicit closure

    def __post_init__(self):
        if not isinstance(self.points, list) or len(self.points) < 3:
            raise ValueError(
                f"geo_polygon needs >= 3 vertices, got {self.points!r}"
            )
        for p in self.points:
            lat, lon = p
            if not (-90.0 <= float(lat) <= 90.0):
                raise ValueError(f"vertex latitude out of range: {lat}")
            if not (-180.0 <= float(lon) <= 180.0):
                raise ValueError(f"vertex longitude out of range: {lon}")

    def predicate(self, spark, resolve) -> Column:
        lat = resolve(self.lat_field).cast("double")
        lon = resolve(self.lon_field).cast("double")
        verts = [(float(a), float(o)) for a, o in self.points]
        # drop an explicitly repeated closing vertex; closure is implicit
        if verts[0] == verts[-1] and len(verts) > 3:
            verts = verts[:-1]
        crossings: Column = F.lit(0)
        n = len(verts)
        for i in range(n):
            y1, x1 = verts[i]
            y2, x2 = verts[(i + 1) % n]
            if y1 == y2:
                continue  # horizontal edge never crosses the ray
            cond = (
                ((F.lit(y1) > lat) != (F.lit(y2) > lat))
                & (lon < (F.lit(x2 - x1) * (lat - F.lit(y1))
                          / F.lit(y2 - y1) + F.lit(x1)))
            )
            crossings = crossings + F.when(cond, 1).otherwise(0)
        return (
            lat.isNotNull() & lon.isNotNull() & (crossings % 2 == 1)
        )


@dataclass
class Exists(Query):
    """Q6 (elastic_queries.json:33-36): field present and non-null."""

    field: str

    def predicate(self, spark, resolve) -> Column:
        return resolve(self.field).isNotNull()


@dataclass
class Nested(Query):
    """Q4 (elastic_queries.json:9-18): scope an inner query to single
    elements of an array-of-structs — the match must occur within ONE
    element, which is precisely the higher-order ``exists`` semantics."""

    path: str
    query: Query

    def predicate(self, spark, resolve) -> Column:
        return F.exists(
            resolve(self.path),
            lambda el: self.query.predicate(spark, _element_resolver(el)),
        )


@dataclass
class Bool(Query):
    """Q2/Q3 (elastic_queries.json:5-41). ``filter`` and ``must`` are
    mandatory; ``must_not`` mandatory-negative; ``should`` optional and
    scoring (weight added when the clause matches — the reference's
    ``weight: 5`` semantics)."""

    # a Bool's own score is the weighted sum of its should-clauses — NOT a
    # constant — so a nested Bool inside another Bool's should list must go
    # through the weight * score path, not the constant fast path
    CONSTANT_SCORE = False

    must: list[Query] = dc_field(default_factory=list)
    filter: list[Query] = dc_field(default_factory=list)
    should: list[tuple[Query, float]] = dc_field(default_factory=list)
    must_not: list[Query] = dc_field(default_factory=list)
    minimum_should_match: int = 0

    def predicate(self, spark, resolve) -> Column:
        out = F.lit(True)
        for q in self.must + self.filter:
            out = out & q.predicate(spark, resolve)
        for q in self.must_not:
            out = out & ~q.predicate(spark, resolve)
        # ES semantics: a bool with ONLY should clauses requires at least
        # one of them to match (implicit minimum_should_match=1); with
        # must/filter present, should stays purely optional/scoring
        msm = self.minimum_should_match
        if msm == 0 and self.should and not (self.must or self.filter):
            msm = 1
        if msm > 0 and self.should:
            matched = sum(
                (
                    F.when(q.predicate(spark, resolve), 1).otherwise(0)
                    for q, _ in self.should
                ),
                start=F.lit(0),
            )
            out = out & (matched >= msm)
        return out

    def should_contributions(self, spark, resolve) -> list[Column]:
        """One score-contribution Column per should clause — the SINGLE
        definition both Bool.score and the _explain breakdown
        (score_parts) compile from, so the explanation can never drift
        from the actual scoring expression."""
        contributions = []
        for q, w in self.should:
            p = q.predicate(spark, resolve)
            if q.CONSTANT_SCORE:
                c = F.when(p, F.lit(float(w))).otherwise(F.lit(0.0))
            else:
                c = F.when(p, F.lit(w) * q.score(spark, resolve)).otherwise(
                    F.lit(0.0)
                )
            contributions.append(c)
        return contributions

    def score(self, spark, resolve) -> Column:
        contributions = self.should_contributions(spark, resolve)
        if not contributions:
            return F.lit(0.0)
        total = contributions[0]
        for c in contributions[1:]:
            total = total + c
        return total


@dataclass
class ConstantScore(Query):
    """ES ``constant_score``: wrap a filter context; every matching
    document scores exactly ``boost``. The filter's own scoring machinery
    is never evaluated — the ES idiom for 'I want this clause's matches,
    not its relevance'."""

    CONSTANT_SCORE = False  # scores `boost`, not 1.0

    filter: Query
    boost: float = 1.0

    def predicate(self, spark, resolve) -> Column:
        return self.filter.predicate(spark, resolve)

    def score(self, spark, resolve) -> Column:
        p = self.filter.predicate(spark, resolve)
        return F.when(p, F.lit(float(self.boost))).otherwise(F.lit(0.0))


@dataclass
class DisMax(Query):
    """ES ``dis_max``: union of clauses where the BEST-matching clause
    dominates the score instead of summing — ``max(scores) + tie_breaker ·
    (sum(scores) − max(scores))``. The standard shape for 'same text
    searched in several fields, don't double-count'. A document matches if
    ANY clause matches; non-matching clauses contribute 0."""

    CONSTANT_SCORE = False

    queries: list[Query]
    tie_breaker: float = 0.0

    def __post_init__(self):
        if not self.queries:
            raise ValueError("dis_max needs at least one query")
        if not (0.0 <= self.tie_breaker <= 1.0):
            raise ValueError(
                f"tie_breaker must be in [0, 1], got {self.tie_breaker}"
            )

    def predicate(self, spark, resolve) -> Column:
        out = self.queries[0].predicate(spark, resolve)
        for q in self.queries[1:]:
            out = out | q.predicate(spark, resolve)
        return out

    def score(self, spark, resolve) -> Column:
        scores = [q.score(spark, resolve) for q in self.queries]
        if len(scores) == 1:
            return scores[0]
        best = F.greatest(*scores)
        if self.tie_breaker == 0.0:
            return best
        total = scores[0]
        for s in scores[1:]:
            total = total + s
        return best + F.lit(float(self.tie_breaker)) * (total - best)


@dataclass
class Boosting(Query):
    """ES ``boosting``: demote-without-excluding. Documents must match
    ``positive``; those ALSO matching ``negative`` keep their positive
    score multiplied by ``negative_boost`` (0 ≤ nb < 1 demotes; ES allows
    any non-negative value)."""

    CONSTANT_SCORE = False

    positive: Query
    negative: Query
    negative_boost: float = 0.5

    def __post_init__(self):
        if self.negative_boost < 0:
            raise ValueError(
                f"negative_boost must be >= 0, got {self.negative_boost}"
            )

    def predicate(self, spark, resolve) -> Column:
        return self.positive.predicate(spark, resolve)

    def score(self, spark, resolve) -> Column:
        base = self.positive.score(spark, resolve)
        demote = F.when(
            self.negative.predicate(spark, resolve),
            F.lit(float(self.negative_boost)),
        ).otherwise(F.lit(1.0))
        return base * demote


_FVF_MODIFIERS = {
    "none": lambda c: c,
    "log1p": lambda c: F.log1p(c),
    "sqrt": lambda c: F.sqrt(c),
    "square": lambda c: c * c,
}


@dataclass
class FieldValueFactor:
    """ES ``field_value_factor`` scoring function: ``modifier(factor ·
    field)`` — rank by a document attribute (recency, popularity, length)
    without a script. ``missing`` substitutes for NULL field values (ES
    requires it to score docs lacking the field)."""

    field: str
    factor: float = 1.0
    modifier: str = "none"
    missing: float | None = None

    def value(self, spark, resolve) -> Column:
        if self.modifier not in _FVF_MODIFIERS:
            raise ValueError(
                f"unsupported field_value_factor modifier {self.modifier!r} "
                f"(supported: {sorted(_FVF_MODIFIERS)})"
            )
        c = resolve(self.field).cast("double")
        if self.missing is not None:
            c = F.coalesce(c, F.lit(float(self.missing)))
        return _FVF_MODIFIERS[self.modifier](c * F.lit(float(self.factor)))


@dataclass
class DecayFunction:
    """ES decay scoring functions (``gauss``/``exp``/``linear``) on a
    NUMERIC field: score 1.0 at ``origin`` (within ``offset``), decaying to
    ``decay`` at distance ``scale`` — the recency/proximity ranking shape.
    Per ES's documented formulas with d = max(0, |x − origin| − offset):

        gauss:  exp(−d² / (2σ²)),  σ² = −scale² / (2·ln(decay))
        exp:    exp(λ·d),          λ  = ln(decay) / scale
        linear: max(0, (s − d)/s), s  = scale / (1 − decay)

    Date fields decay the same way once expressed as a numeric distance
    (epoch seconds / days); pass the numeric projection as ``field``.
    Documents with a NULL field score 1.0, ES's contract."""

    kind: str
    field: str
    origin: float
    scale: float
    offset: float = 0.0
    decay: float = 0.5

    def value(self, spark, resolve) -> Column:
        import math

        if self.kind not in ("gauss", "exp", "linear"):
            raise ValueError(f"unsupported decay function: {self.kind!r}")
        if not (0.0 < self.decay < 1.0) or self.scale <= 0:
            raise ValueError(
                f"decay needs 0 < decay < 1 and scale > 0, got "
                f"decay={self.decay}, scale={self.scale}"
            )
        x = resolve(self.field).cast("double")
        d = F.greatest(
            F.lit(0.0),
            F.abs(x - F.lit(float(self.origin))) - F.lit(float(self.offset)),
        )
        if self.kind == "gauss":
            sigma2 = -self.scale * self.scale / (2.0 * math.log(self.decay))
            val = F.exp(-(d * d) / F.lit(2.0 * sigma2))
        elif self.kind == "exp":
            lam = math.log(self.decay) / self.scale
            val = F.exp(F.lit(lam) * d)
        else:
            s = self.scale / (1.0 - self.decay)
            val = F.greatest(F.lit(0.0), (F.lit(s) - d) / F.lit(s))
        return F.when(x.isNull(), F.lit(1.0)).otherwise(val)


@dataclass
class WeightFunction:
    """ES filtered ``weight`` function: a constant that applies only to
    documents matching its filter (1.0 — the neutral element under every
    score_mode this engine supports — otherwise)."""

    weight: float
    filter: Query | None = None

    def value(self, spark, resolve) -> Column:
        w = F.lit(float(self.weight))
        if self.filter is None:
            return w
        return F.when(self.filter.predicate(spark, resolve), w).otherwise(
            F.lit(1.0)
        )


@dataclass
class FunctionScore(Query):
    """Q1 (elastic_queries.json:3): wraps a query and exposes its score.
    With ``functions``, the full ES contract: each function yields a
    per-document value, ``score_mode`` combines them (sum/multiply/max/
    min/avg), and ``boost_mode`` combines the result with the wrapped
    query's score (multiply — the default — /sum/replace). Everything
    compiles to one arithmetic Column expression over the scan."""

    CONSTANT_SCORE = False  # passes through the wrapped query's score

    query: Query
    functions: list = dc_field(default_factory=list)
    score_mode: str = "multiply"
    boost_mode: str = "multiply"

    def predicate(self, spark, resolve) -> Column:
        return self.query.predicate(spark, resolve)

    def score(self, spark, resolve) -> Column:
        base = self.query.score(spark, resolve)
        if not self.functions:
            return base
        vals = [fn.value(spark, resolve) for fn in self.functions]
        if self.score_mode == "sum":
            fscore = sum(vals[1:], start=vals[0])
        elif self.score_mode == "multiply":
            fscore = vals[0]
            for v in vals[1:]:
                fscore = fscore * v
        elif self.score_mode == "max":
            fscore = vals[0] if len(vals) == 1 else F.greatest(*vals)
        elif self.score_mode == "min":
            fscore = vals[0] if len(vals) == 1 else F.least(*vals)
        elif self.score_mode == "avg":
            fscore = sum(vals[1:], start=vals[0]) / F.lit(float(len(vals)))
        else:
            raise ValueError(f"unsupported score_mode: {self.score_mode!r}")
        if self.boost_mode == "multiply":
            return base * fscore
        if self.boost_mode == "sum":
            return base + fscore
        if self.boost_mode == "replace":
            return fscore
        raise ValueError(f"unsupported boost_mode: {self.boost_mode!r}")


_PAINLESS_FUNCS = {
    "Math.log": (1, F.log),       # natural log, as in Java
    "Math.log10": (1, F.log10),
    "Math.sqrt": (1, F.sqrt),
    "Math.exp": (1, F.exp),
    "Math.abs": (1, F.abs),
    "Math.max": (2, F.greatest),
    "Math.min": (2, F.least),
    "Math.pow": (2, F.pow),
}


def _tokenize_painless(src: str) -> list[tuple[str, object]]:
    import re as _re

    token_re = _re.compile(
        r"\s*(?:(?P<num>\d+\.\d+|\d+|\.\d+)"
        r"|(?P<doc>doc\[\s*'(?P<field>[A-Za-z0-9_.]+)'\s*\]\s*\.\s*value)"
        r"|(?P<param>params\.(?P<pname>[A-Za-z_][A-Za-z0-9_]*))"
        r"|(?P<score>_score)"
        r"|(?P<func>Math\.[A-Za-z0-9]+)"
        r"|(?P<cmp>>=|<=|==|!=|>|<)"
        r"|(?P<op>[()+\-*/,]))"
    )
    out, pos = [], 0
    while pos < len(src):
        if src[pos:].isspace():
            break
        m = token_re.match(src, pos)
        if m is None or m.end() == pos:
            raise ValueError(
                f"script_score: cannot tokenize {src[pos:pos+20]!r} "
                f"(supported: numbers, _score, doc['field'].value, "
                f"params.name, {sorted(_PAINLESS_FUNCS)}, comparisons, "
                f"+ - * / parentheses)"
            )
        pos = m.end()
        if m.group("num"):
            out.append(("num", float(m.group("num"))))
        elif m.group("doc"):
            out.append(("doc", m.group("field")))
        elif m.group("param"):
            out.append(("param", m.group("pname")))
        elif m.group("score"):
            out.append(("score", None))
        elif m.group("func"):
            out.append(("func", m.group("func")))
        elif m.group("cmp"):
            out.append(("cmp", m.group("cmp")))
        else:
            out.append(("op", m.group("op")))
    return out


def compile_painless(
    source: str,
    *,
    score: Column | None = None,
    resolve_doc=None,
    params: dict | None = None,
    compare: bool = False,
) -> Column:
    """Compile the Painless ARITHMETIC SUBSET to one Catalyst Column:
    numbers, ``+ - * /`` with standard precedence, unary minus,
    parentheses, ``Math.log/log10/sqrt/exp/abs/max/min/pow``, and the
    variable forms each caller enables — ``_score`` (``score=``),
    ``doc['field'].value`` (``resolve_doc=``), ``params.name`` (a Column
    per name, the ``bucket_script``/``bucket_selector`` binding). With
    ``compare=True`` one top-level comparison (``> >= < <= == !=``) is
    allowed and the result is boolean — the bucket_selector contract.
    Unknown syntax raises at compile time, never silently mis-scores."""
    toks = _tokenize_painless(source)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else ("end", None)

    def eat(kind, val=None):
        nonlocal pos
        t = peek()
        if t[0] != kind or (val is not None and t[1] != val):
            raise ValueError(
                f"script_score: unexpected {t!r} at token {pos} "
                f"in {source!r}"
            )
        pos += 1
        return t[1]

    def primary() -> Column:
        kind, val = peek()
        if kind == "num":
            eat("num")
            return F.lit(float(val))
        if kind == "score":
            eat("score")
            if score is None:
                raise ValueError(
                    f"_score is not available in this context: {source!r}"
                )
            return score
        if kind == "doc":
            eat("doc")
            if resolve_doc is None:
                raise ValueError(
                    f"doc[...] is not available in this context: {source!r}"
                )
            return resolve_doc(val)
        if kind == "param":
            eat("param")
            if params is None or val not in params:
                raise ValueError(
                    f"unknown params.{val} (have: "
                    f"{sorted(params) if params else []}) in {source!r}"
                )
            return params[val]
        if kind == "func":
            eat("func")
            arity, fn = _PAINLESS_FUNCS.get(val, (None, None))
            if fn is None:
                raise ValueError(
                    f"script_score: unsupported function {val!r} "
                    f"(supported: {sorted(_PAINLESS_FUNCS)})"
                )
            eat("op", "(")
            args = [expr()]
            while peek() == ("op", ","):
                eat("op", ",")
                args.append(expr())
            eat("op", ")")
            if len(args) != arity:
                raise ValueError(
                    f"script_score: {val} takes {arity} args, got {len(args)}"
                )
            return fn(*args)
        if kind == "op" and val == "(":
            eat("op", "(")
            e = expr()
            eat("op", ")")
            return e
        if kind == "op" and val == "-":
            eat("op", "-")
            return -primary()
        raise ValueError(
            f"script_score: unexpected {kind}:{val!r} in {source!r}"
        )

    def term() -> Column:
        e = primary()
        while peek()[0] == "op" and peek()[1] in "*/":
            op = eat("op")
            rhs = primary()
            e = e * rhs if op == "*" else e / rhs
        return e

    def expr() -> Column:
        e = term()
        while peek()[0] == "op" and peek()[1] in "+-":
            op = eat("op")
            rhs = term()
            e = e + rhs if op == "+" else e - rhs
        return e

    out = expr()
    if compare and peek()[0] == "cmp":
        op = eat("cmp")
        rhs = expr()
        out = {
            ">": out > rhs, ">=": out >= rhs,
            "<": out < rhs, "<=": out <= rhs,
            "==": out == rhs, "!=": out != rhs,
        }[op]
    if peek()[0] != "end":
        raise ValueError(f"script_score: trailing tokens in {source!r}")
    return out


@dataclass
class ScriptScore(Query):
    """ES ``script_score``: replace the wrapped query's score with an
    arithmetic expression over document fields and ``_score``. The script
    ``source`` is the PAINLESS ARITHMETIC SUBSET — numbers, ``_score``,
    ``doc['field'].value``, ``+ - * /`` with standard precedence, unary
    minus, parentheses, and ``Math.log/log10/sqrt/exp/abs/max/min/pow`` —
    compiled ONCE at plan time by a recursive-descent parser into a single
    Catalyst Column expression riding the scan (never a per-row UDF:
    Painless runs scripted, this engine runs codegen'd). Unknown syntax
    raises at compile time, never silently mis-scores. Like ES, a script
    returning a negative score is an error class left to the caller; NULL
    fields propagate NULL → treated as 0.0 via the final coalesce."""

    CONSTANT_SCORE = False

    query: Query
    source: str
    params: dict | None = None

    def predicate(self, spark, resolve) -> Column:
        return self.query.predicate(spark, resolve)

    def score(self, spark, resolve) -> Column:
        # ES script params (``params.name`` in the source): numeric
        # constants shipped separately so the script text is reusable —
        # bound here as literal Columns, still one codegen'd expression
        params = {
            k: F.lit(float(v)) for k, v in (self.params or {}).items()
        }
        out = compile_painless(
            self.source,
            score=self.query.score(spark, resolve),
            resolve_doc=lambda f: resolve(f).cast("double"),
            params=params or None,
        )
        return F.coalesce(out, F.lit(0.0))


@dataclass
class SparseVectorQuery(Query):
    """ES ``sparse_vector`` query (8.15+, the ELSER/learned-sparse
    retrieval shape): the document field is a token→weight MAP column,
    the query carries its own token weights, and the score is the dot
    product over the token intersection — Σ q_w(t) · doc_w(t). A doc
    matches when it contains ANY query token (ES's contract).

    The query vocabulary is small (a few dozen expanded tokens), so the
    whole score compiles to a fixed-size sum of map lookups — one
    codegen'd expression riding the scan, no UDF, no explode, no
    shuffle. At index scale the map column is stored at ingest exactly
    like the token columns (indexing.build_index's pattern), so the
    scan stays columnar. ES's ``inference_id`` variant (server-side
    text→vector expansion) requires a model runtime and is rejected
    loudly; callers pass the expanded ``query_vector`` directly."""

    CONSTANT_SCORE = False

    field: str
    query_vector: dict  # token -> weight

    def __post_init__(self):
        if not isinstance(self.query_vector, dict) or not self.query_vector:
            raise ValueError(
                "sparse_vector needs a non-empty query_vector "
                "{token: weight, ...}"
            )
        bad = {
            t: w for t, w in self.query_vector.items()
            if not isinstance(w, (int, float)) or isinstance(w, bool)
        }
        if bad:
            raise ValueError(
                f"sparse_vector weights must be numeric: {bad!r}"
            )

    def predicate(self, spark, resolve) -> Column:
        m = resolve(self.field)
        cond = None
        for t in self.query_vector:
            c = m.getItem(t).isNotNull()
            cond = c if cond is None else cond | c
        return cond

    def score(self, spark, resolve) -> Column:
        m = resolve(self.field)
        total: Column = F.lit(0.0)
        for t, w in self.query_vector.items():
            total = total + F.coalesce(
                m.getItem(t).cast("double"), F.lit(0.0)
            ) * F.lit(float(w))
        return total


@dataclass
class ScriptQuery(Query):
    """ES ``script`` query: a Painless boolean predicate in filter
    context (``{"script": {"script": {"source": "doc['f'].value > 3"}}}``).
    The source is the Painless ARITHMETIC SUBSET with exactly one
    top-level comparison (the same contract as ``bucket_selector``),
    compiled once into a codegen'd boolean Column riding the scan —
    vs ES, where the script query is the per-doc interpreted slow path
    that cannot use the index at all. Numeric ``params`` bind as literal
    Columns. A source with no comparison raises at plan time (an
    arithmetic result is not a predicate); NULL fields make the
    comparison NULL → the doc does not match (ES: missing doc values
    throw unless guarded — our NULL-contract divergence is the safer
    one and is pinned in the tests)."""

    source: str
    params: dict | None = None

    def predicate(self, spark, resolve) -> Column:
        if not any(k == "cmp" for k, _ in _tokenize_painless(self.source)):
            raise ValueError(
                "script query source must be a boolean comparison "
                f"(> >= < <= == !=): {self.source!r}"
            )
        params = {
            k: F.lit(float(v)) for k, v in (self.params or {}).items()
        }
        out = compile_painless(
            self.source,
            resolve_doc=lambda f: resolve(f).cast("double"),
            params=params or None,
            compare=True,
        )
        return F.coalesce(out, F.lit(False))


def score_parts(
    query: Query, spark, resolve
) -> list[tuple[str, Column]]:
    """ES ``_explain`` analogue: the labeled additive components of a
    query's score — one (label, contribution) pair per scoring clause,
    guaranteed to SUM to ``query.score(...)``. Walks the same tree the
    score compiles from, so the explanation can never drift from the
    actual scoring expression. Non-composite queries explain as a single
    component."""
    if isinstance(query, Bool):
        contribs = query.should_contributions(spark, resolve)
        parts = [
            (f"should[{i}]:{type(q).__name__}", c)
            for (i, (q, _)), c in zip(enumerate(query.should), contribs)
        ]
        return parts or [("no_scoring_clauses", F.lit(0.0))]
    if isinstance(query, FunctionScore) and query.boost_mode == "sum":
        # boost_mode=sum is the one FunctionScore combination that
        # decomposes additively: base query score + the functions term
        # (query.score minus the base reproduces it exactly)
        base = score_parts(query.query, spark, resolve)
        base_total: Column = F.lit(0.0)
        for _, c in base:
            base_total = base_total + c
        return base + [
            ("functions", query.score(spark, resolve) - base_total)
        ]
    return [(type(query).__name__, query.score(spark, resolve))]


def explain_score(
    df: DataFrame,
    query: Query,
    *,
    score_col: str = "score",
    parts_col: str = "score_parts",
) -> DataFrame:
    """Attach the score AND its labeled breakdown (map<label,double>) to
    every matching row — the relevance-debugging surface of ES's
    ``_explain``/``explain=true``. Pure expression work riding the same
    scan as search(); no extra pass."""
    spark = df.sparkSession
    parts = score_parts(query, spark, _col_resolver)
    # map keys must be unique (Spark's mapKeyDedupPolicy=EXCEPTION): a
    # tree can legitimately repeat a label (two FunctionScores in one
    # should list both contribute "functions") — suffix duplicates
    seen: dict[str, int] = {}
    uniq = []
    for lbl, c in parts:
        n = seen.get(lbl, 0)
        seen[lbl] = n + 1
        uniq.append((f"{lbl}#{n + 1}" if n else lbl, c))
    parts = uniq
    out = df.filter(query.predicate(spark, _col_resolver))
    labels = F.array(*[F.lit(lbl) for lbl, _ in parts])
    values = F.array(*[c.cast("double") for _, c in parts])
    return out.withColumn(
        score_col, query.score(spark, _col_resolver)
    ).withColumn(parts_col, F.map_from_arrays(labels, values))


def _rebind_analyzed(query: Query, bind) -> Query:
    """Rewrite a query tree so every inline-analyzed leaf reads a shared
    materialized token column instead (``bind(field, analyzer)`` returns
    the column name, registering it). Containers recurse; ``Nested``
    subtrees are left alone (their fields resolve inside the array
    element scope, not at row scope); unknown node kinds pass through
    unchanged. Pure plan rewrite — match/score values are identical, the
    analyzer chain just runs once per row instead of once per reference
    (guide §4.4)."""
    import dataclasses as _dc

    if isinstance(
        query, (Match, MatchPhrase, MatchPhrasePrefix, MatchBoolPrefix)
    ):
        if query.analyzer is not None and query.tokens_col is None:
            return _dc.replace(
                query, tokens_col=bind(query.field, query.analyzer)
            )
        return query
    if isinstance(query, Intervals):
        if query.tokens_col is None:
            return _dc.replace(
                query, tokens_col=bind(query.field, query.analyzer)
            )
        return query
    if isinstance(query, MultiMatch):
        new_cols = dict(query.tokens_cols)
        changed = False
        for field, _ in query.fields:
            an = query.analyzers.get(field)
            if an and not new_cols.get(field):
                new_cols[field] = bind(field, an)
                changed = True
        return _dc.replace(query, tokens_cols=new_cols) if changed else query
    if isinstance(query, Bool):
        return _dc.replace(
            query,
            must=[_rebind_analyzed(q, bind) for q in query.must],
            filter=[_rebind_analyzed(q, bind) for q in query.filter],
            must_not=[_rebind_analyzed(q, bind) for q in query.must_not],
            should=[
                (_rebind_analyzed(q, bind), b) for q, b in query.should
            ],
        )
    if isinstance(query, ConstantScore):
        return _dc.replace(query, filter=_rebind_analyzed(query.filter, bind))
    if isinstance(query, DisMax):
        return _dc.replace(
            query, queries=[_rebind_analyzed(q, bind) for q in query.queries]
        )
    if isinstance(query, Boosting):
        return _dc.replace(
            query,
            positive=_rebind_analyzed(query.positive, bind),
            negative=_rebind_analyzed(query.negative, bind),
        )
    if isinstance(query, FunctionScore):
        functions = [
            _dc.replace(fn, filter=_rebind_analyzed(fn.filter, bind))
            if isinstance(fn, WeightFunction) and fn.filter is not None
            else fn
            for fn in query.functions
        ]
        return _dc.replace(
            query,
            query=_rebind_analyzed(query.query, bind),
            functions=functions,
        )
    if isinstance(query, Pinned):
        return _dc.replace(query, organic=_rebind_analyzed(query.organic, bind))
    if isinstance(query, ScriptScore):
        return _dc.replace(query, query=_rebind_analyzed(query.query, bind))
    return query


def bind_analyzed_tokens(
    df: DataFrame, query: Query
) -> tuple[DataFrame, Query, list[str]]:
    """Materialize every (field, analyzer) pair the tree analyzes INLINE
    as one pinned token column and rebind the tree to read it.

    Without this, ``search()`` evaluates the Arrow-UDF analyzer chain at
    least twice per document — once inside the compiled filter predicate
    and once inside the score expression — and the optimizer's filter
    pushdown can duplicate it again below the scan projection (two
    ArrowEvalPython nodes, guide §4.4). Bound + pinned
    (``pin_computed``), the chain is ONE ArrowEvalPython node whose
    output both the filter and the score read as an attribute. Queries
    that already pass ``tokens_col`` (index-backed token columns) are
    untouched."""
    from tweets_elastic_spark.functions.analyzers import pin_computed

    bound: dict[tuple[str, str], str] = {}

    def bind(field: str, analyzer: str) -> str:
        key = (field, analyzer)
        if key not in bound:
            bound[key] = f"__toks_{field.replace('.', '_')}__{analyzer}"
        return bound[key]

    rebound = _rebind_analyzed(query, bind)
    out = df
    for (field, analyzer), name in bound.items():
        out = out.withColumn(
            name, pin_computed(analyze(_col_resolver(field), analyzer))
        )
    return out, rebound, list(bound.values())


def search(
    df: DataFrame,
    query: Query,
    k: int | None = 10,
    tiebreak: str | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Compile the query tree to filter → score → top-k (SURVEY §2.7).

    ``tiebreak`` (an id column) makes the hit list fully deterministic —
    ES breaks score ties by internal doc id, which isn't reproducible; an
    explicit key is. ``k=None`` returns all hits scored, unsorted."""
    spark = df.sparkSession
    df, query, helpers = bind_analyzed_tokens(df, query)
    out = df.filter(query.predicate(spark, _col_resolver))
    out = out.withColumn(score_col, query.score(spark, _col_resolver))
    if helpers:
        out = out.drop(*helpers)
    if k is None:
        return out
    order = [F.col(score_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    return out.orderBy(*order).limit(k)


def match_terms_by_field(query: Query, spark) -> dict[str, list[str]]:
    """Walk a compiled query tree and collect the ANALYZED query terms per
    field — what ES's highlighter extracts from the query to decide which
    words to tag. Covers every analyzed-match node (Match, MatchPhrase,
    BM25Match, MultiMatch legs with an analyzer binding); keyword-equality
    legs contribute nothing (ES highlights analyzed text fields)."""
    out: dict[str, list[str]] = {}

    def add(field: str, tokens: list[str]) -> None:
        seen = out.setdefault(field, [])
        for t in tokens:
            if t not in seen:
                seen.append(t)

    def walk(q: Query) -> None:
        if isinstance(q, (Match, MatchPhrase, BM25Match)) and q.analyzer:
            add(q.field, analyze_text(spark, q.text, q.analyzer))
        elif isinstance(q, MultiMatch):
            for field, _ in q.fields:
                analyzer = q.analyzers.get(field)
                if analyzer:
                    add(field, analyze_text(spark, q.text, analyzer))
        elif isinstance(q, Bool):
            for child in q.must + q.filter + q.must_not:
                walk(child)
            for child, _ in q.should:
                walk(child)
        elif isinstance(q, (FunctionScore, Nested)):
            walk(q.query)

    walk(query)
    return out


def nested_paths_from_mapping(mapping: dict) -> set[str]:
    """Dotted paths of every ``"type": "nested"`` field in an ES index
    mapping (the reference declares context_annotations, annotations, links
    and conversation_references nested — src/config/mapping.json). The DSL
    compiler uses these to auto-scope bare leaf queries on nested fields,
    exactly as ES resolves them against the mapping at parse time."""
    out: set[str] = set()

    def walk(props: dict, prefix: str) -> None:
        for name, spec in props.items():
            if not isinstance(spec, dict):
                continue
            path = f"{prefix}{name}"
            if spec.get("type") == "nested":
                out.add(path)
            sub = spec.get("properties")
            if isinstance(sub, dict):
                walk(sub, f"{path}.")

    walk(mapping.get("properties", mapping), "")
    return out


def _scalar_or_list(v) -> list:
    return v if isinstance(v, list) else [v]


def from_es_json(
    dsl: dict,
    *,
    analyzers: dict[str, str] | None = None,
    tokens_cols: dict[str, str] | None = None,
    nested_paths: set[str] | frozenset[str] = frozenset(),
    id_field: str = "doc_id",
    bm25_stats_for=None,
    combined_stats_for=None,
    lookup_indices: dict[str, tuple[DataFrame, str]] | None = None,
) -> Query:
    """Compile an Elasticsearch query-DSL JSON object into the Query tree —
    the front-end that lets the reference's own query artifact
    (src/used_queries/elastic_queries.json:1-46) run unmodified.

    Supported surface = what the reference exercises plus the tree's other
    nodes: ``function_score``, ``bool`` (must/filter/should/must_not/
    minimum_should_match, scalar-or-list clauses, the reference's
    ``{"query": ..., "weight": w}`` should shape), ``nested``, ``match``
    (with ``operator``/``minimum_should_match``), ``multi_match``
    (best_fields, ``field^boost`` syntax), ``match_phrase``,
    ``match_phrase_prefix``, ``match_bool_prefix``, ``intervals``
    (``match`` with ``max_gaps``/``ordered``, ``any_of``),
    ``rank_feature``, ``term``,
    ``terms``, ``terms_set``, ``prefix``, ``wildcard``, ``regexp`` (anchored, core
    operator set), ``fuzzy``, ``ids`` (bound to ``id_field``), ``range``,
    ``exists``, ``match_all``, ``constant_score``, ``dis_max``,
    ``boosting``, ``pinned``, ``distance_feature`` (numeric origin/pivot —
    date-math strings convert before compiling), ``geo_distance``,
    ``geo_bounding_box`` (antimeridian-aware), and ``script_score``
    (Painless arithmetic subset).
    Unknown clause types raise (never silently drop a predicate).

    Mapping-driven resolution, as in ES:

    * ``analyzers``/``tokens_cols`` map a FULL field path to its analyzer /
      materialized token column (query JSON never carries analyzers; the
      index mapping does).
    * ``nested_paths`` (see ``nested_paths_from_mapping``) auto-scopes a
      bare leaf query on ``links.url`` into ``Nested("links",
      Exists("url"))`` — the artifact's exists filter relies on this.
    * Inside an explicit ``nested`` clause, the inner query's fields carry
      the full path (ES convention); the compiler strips the scope prefix
      so the element resolver sees element-relative paths.

    A single-must-only ``bool`` unwraps to its clause (identity for
    filtering AND more faithful for scoring: ES propagates the inner score,
    while a Bool node scores only its should list).

    BM25 relevance (ES scores every ``match``/``multi_match`` on a text
    field with BM25; VERDICT r6 item 1): pass ``bm25_stats_for``, a
    callable ``(field, tokens_col, analyzer, text) -> Bm25Stats`` (use
    ``corpus_bm25_provider`` for inline corpora or
    ``indexing.index_bm25_provider`` for term-dictionary lookups against a
    materialized index). A ``match`` whose field has BOTH an analyzer and a
    tokens_col binding then compiles to ``BM25Match`` instead of
    token-overlap scoring (``operator``/``minimum_should_match`` carry
    over; they gate the candidate set, BM25 scores it); a ``multi_match``
    whose fields ALL have both bindings compiles to per-field BM25 legs
    combined per its ``type`` — ``best_fields`` → ``DisMax``,
    ``most_fields`` → score-summing ``Bool`` — with ``field^boost``
    multiplying that field's BM25 score. Everything else is unchanged, so
    the reference artifact (elastic_queries.json — keyword match inside a
    nested scope, constant ``weight: 5``) compiles to the IDENTICAL tree
    with or without a provider (pinned by test). Deliberate fallbacks to
    overlap scoring, each the documented v1 semantics: fuzziness (ES
    BM25-scores fuzzy expansions per expanded term — needs the term
    dictionary), fields under a nested path (ES nested scoring modes), and
    fields missing either binding (keyword semantics / inline analysis)."""
    analyzers = analyzers or {}
    tokens_cols = tokens_cols or {}
    nested_paths = set(nested_paths)

    def bm25_or_none(
        field: str, text: str, operator: str, msm: int, fuzziness,
        scope, boost: float = 1.0,
    ) -> Query | None:
        """BM25Match for this match clause, or None → caller falls back to
        the overlap-scoring Match path (row scope only: nested-scoped BM25
        is a documented fallback, see docstring)."""
        if bm25_stats_for is None or fuzziness is not None or scope is not None:
            return None
        analyzer, tok_col = analyzers.get(field), tokens_cols.get(field)
        if analyzer is None or tok_col is None:
            return None
        if any(field.startswith(np + ".") for np in nested_paths):
            return None
        return BM25Match(
            field, text, analyzer=analyzer, tokens_col=tok_col,
            stats=bm25_stats_for(field, tok_col, analyzer, text),
            operator=operator, minimum_should_match=msm, boost=boost,
        )

    def leaf_field(field: str, scope: str | None) -> str:
        if scope is not None and field.startswith(scope + "."):
            return field[len(scope) + 1:]
        return field

    def auto_nest(field: str, make, scope: str | None) -> Query:
        """Wrap a leaf on a nested-typed path in its Nested scope (row scope
        only — inside an explicit nested clause ES forbids deeper implicit
        scoping)."""
        if scope is None:
            for np in sorted(nested_paths, key=len, reverse=True):
                if field.startswith(np + "."):
                    return Nested(np, make(field[len(np) + 1:]))
        return make(leaf_field(field, scope))

    def compile_node(node: dict, scope: str | None) -> Query:
        if not isinstance(node, dict) or len(node) != 1:
            raise ValueError(
                f"expected a single-key query object, got: {node!r}"
            )
        (kind, body), = node.items()
        if kind == "query":  # the artifact's wrapper shape, and the top level
            return compile_node(body, scope)
        if kind == "function_score":
            extra = set(body) - {"query", "functions", "score_mode", "boost_mode"}
            if extra:
                raise ValueError(
                    f"unsupported function_score keys: {extra}"
                )
            functions = []
            for fspec in body.get("functions", []):
                fkeys = set(fspec) - {"filter"}
                if fkeys == {"field_value_factor"}:
                    fvf = fspec["field_value_factor"]
                    bad = set(fvf) - {"field", "factor", "modifier", "missing"}
                    if bad:
                        raise ValueError(
                            f"unsupported field_value_factor keys: {bad}"
                        )
                    if "filter" in fspec:
                        raise ValueError(
                            "field_value_factor with a filter is unsupported"
                        )
                    functions.append(FieldValueFactor(
                        fvf["field"],
                        factor=float(fvf.get("factor", 1.0)),
                        modifier=fvf.get("modifier", "none"),
                        missing=fvf.get("missing"),
                    ))
                elif fkeys == {"weight"}:
                    flt = fspec.get("filter")
                    functions.append(WeightFunction(
                        float(fspec["weight"]),
                        filter=None if flt is None else compile_node(flt, scope),
                    ))
                elif fkeys and next(iter(fkeys)) in ("gauss", "exp", "linear") \
                        and len(fkeys) == 1:
                    (dkind,) = fkeys
                    if "filter" in fspec:
                        raise ValueError(
                            f"{dkind} decay with a filter is unsupported"
                        )
                    (dfield, dbody), = fspec[dkind].items()
                    bad = set(dbody) - {"origin", "scale", "offset", "decay"}
                    if bad:
                        raise ValueError(f"unsupported decay keys: {bad}")
                    functions.append(DecayFunction(
                        dkind, dfield,
                        origin=float(dbody["origin"]),
                        scale=float(dbody["scale"]),
                        offset=float(dbody.get("offset", 0.0)),
                        decay=float(dbody.get("decay", 0.5)),
                    ))
                else:
                    raise ValueError(
                        f"unsupported scoring function: {sorted(fkeys)}"
                    )
            return FunctionScore(
                compile_node(body["query"], scope),
                functions=functions,
                score_mode=body.get("score_mode", "multiply"),
                boost_mode=body.get("boost_mode", "multiply"),
            )
        if kind == "bool":
            extra = set(body) - {
                "must", "filter", "should", "must_not", "minimum_should_match"
            }
            if extra:
                raise ValueError(f"unsupported bool keys: {extra}")
            must = [compile_node(c, scope) for c in _scalar_or_list(body.get("must", []))]
            filt = [compile_node(c, scope) for c in _scalar_or_list(body.get("filter", []))]
            must_not = [
                compile_node(c, scope) for c in _scalar_or_list(body.get("must_not", []))
            ]
            should = []
            for c in _scalar_or_list(body.get("should", [])):
                if isinstance(c, dict) and "weight" in c:
                    inner = c.get("query")
                    if inner is None or set(c) - {"query", "weight"}:
                        raise ValueError(f"bad weighted should clause: {c!r}")
                    should.append((compile_node(inner, scope), float(c["weight"])))
                else:
                    should.append((compile_node(c, scope), 1.0))
            msm = int(body.get("minimum_should_match", 0))
            if len(must) == 1 and not (filt or should or must_not or msm):
                return must[0]
            return Bool(
                must=must, filter=filt, should=should, must_not=must_not,
                minimum_should_match=msm,
            )
        if kind == "constant_score":
            extra = set(body) - {"filter", "boost"}
            if extra:
                raise ValueError(f"unsupported constant_score keys: {extra}")
            return ConstantScore(
                compile_node(body["filter"], scope),
                boost=float(body.get("boost", 1.0)),
            )
        if kind == "dis_max":
            extra = set(body) - {"queries", "tie_breaker"}
            if extra:
                raise ValueError(f"unsupported dis_max keys: {extra}")
            return DisMax(
                [compile_node(c, scope) for c in body["queries"]],
                tie_breaker=float(body.get("tie_breaker", 0.0)),
            )
        if kind == "boosting":
            extra = set(body) - {"positive", "negative", "negative_boost"}
            if extra:
                raise ValueError(f"unsupported boosting keys: {extra}")
            return Boosting(
                compile_node(body["positive"], scope),
                compile_node(body["negative"], scope),
                negative_boost=float(body.get("negative_boost", 0.5)),
            )
        if kind == "script_score":
            extra = set(body) - {"query", "script"}
            if extra:
                raise ValueError(f"unsupported script_score keys: {extra}")
            script = body["script"]
            src = script["source"] if isinstance(script, dict) else script
            params = None
            if isinstance(script, dict):
                bad = set(script) - {"source", "params"}
                if bad:
                    raise ValueError(f"unsupported script keys: {bad}")
                params = script.get("params")
                if params is not None and not all(
                    isinstance(v, (int, float)) and not isinstance(v, bool)
                    for v in params.values()
                ):
                    raise ValueError(
                        "script params must be NUMERIC (they bind as "
                        "literal Columns in the compiled expression)"
                    )
            return ScriptScore(
                compile_node(body["query"], scope), src, params=params
            )
        if kind == "script":
            # filter-context Painless predicate: {"script": {"script":
            # {"source": ..., "params": ...}}}
            extra = set(body) - {"script", "boost"}
            if extra:
                raise ValueError(f"unsupported script query keys: {extra}")
            script = body["script"]
            src = script["source"] if isinstance(script, dict) else script
            params = None
            if isinstance(script, dict):
                bad = set(script) - {"source", "params", "lang"}
                if bad:
                    raise ValueError(f"unsupported script keys: {bad}")
                if script.get("lang", "painless") != "painless":
                    raise ValueError(
                        f"unsupported script lang: {script['lang']!r}"
                    )
                params = script.get("params")
                if params is not None and not all(
                    isinstance(v, (int, float)) and not isinstance(v, bool)
                    for v in params.values()
                ):
                    raise ValueError(
                        "script params must be NUMERIC (they bind as "
                        "literal Columns in the compiled expression)"
                    )
            return ScriptQuery(src, params=params)
        if kind == "sparse_vector":
            extra = set(body) - {"field", "query_vector"}
            if extra:
                raise ValueError(
                    f"unsupported sparse_vector keys: {sorted(extra)}"
                    + (" (inference_id needs a model runtime — pass the "
                       "expanded query_vector directly)"
                       if "inference_id" in extra else "")
                )
            return SparseVectorQuery(body["field"], body["query_vector"])
        if kind == "wrapper":
            # {"wrapper": {"query": "<base64 of a JSON query>"}} — ES's
            # escape hatch for embedding a query through systems that
            # mangle JSON; decodes and compiles like any inline clause
            import base64
            import json as _json

            extra = set(body) - {"query"}
            if extra:
                raise ValueError(f"unsupported wrapper keys: {extra}")
            try:
                inner = _json.loads(base64.b64decode(body["query"]))
            except Exception as e:
                raise ValueError(f"wrapper query is not base64 JSON: {e}")
            return compile_node(inner, scope)
        if kind == "regexp":
            (field, spec), = body.items()
            if isinstance(spec, dict):
                extra = set(spec) - {"value"}
                if extra:
                    raise ValueError(
                        f"unsupported regexp options: {extra} (flags "
                        "enabling Lucene optional operators are rejected "
                        "by the node itself)"
                    )
                pattern = spec["value"]
            else:
                pattern = spec
            return auto_nest(field, lambda f: Regexp(f, pattern), scope)
        if kind == "nested":
            extra = set(body) - {"path", "query"}
            if extra:
                raise ValueError(f"unsupported nested keys: {extra}")
            path = leaf_field(body["path"], scope)
            return Nested(path, compile_node(body["query"], body["path"]))
        if kind == "match":
            (field, spec), = body.items()
            if isinstance(spec, dict):
                extra = set(spec) - {
                    "query", "operator", "minimum_should_match", "fuzziness"
                }
                if extra:
                    raise ValueError(f"unsupported match options: {extra}")
                text = spec["query"]
                operator = spec.get("operator", "or")
                msm = int(spec.get("minimum_should_match", 0))
                fuzziness = spec.get("fuzziness")
            else:
                text, operator, msm, fuzziness = spec, "or", 0, None
            bm = bm25_or_none(field, text, operator, msm, fuzziness, scope)
            if bm is not None:
                return bm
            return auto_nest(
                field,
                lambda f: Match(
                    f, text,
                    analyzer=analyzers.get(field),
                    tokens_col=tokens_cols.get(field),
                    operator=operator,
                    minimum_should_match=msm,
                    fuzziness=fuzziness,
                ),
                scope,
            )
        if kind == "multi_match":
            extra = set(body) - {"query", "fields", "type", "tie_breaker",
                                 "operator"}
            if extra:
                raise ValueError(f"unsupported multi_match options: {extra}")
            if body.get("type") == "cross_fields":
                # ES cross_fields blends per-field term statistics into a
                # term-centric score; combined_fields is ES's own
                # documented successor with principled BM25F semantics —
                # cross_fields routes there (documented mapping; needs
                # the combined_stats_for provider like combined_fields).
                if body.get("tie_breaker"):
                    raise ValueError(
                        "tie_breaker does not apply to cross_fields "
                        "(term-centric scoring has no per-field legs)"
                    )
                return compile_node({"combined_fields": {
                    "query": body["query"],
                    "fields": body["fields"],
                    "operator": body.get("operator", "or"),
                }}, scope)
            if "operator" in body:
                raise ValueError(
                    "multi_match operator is supported for type "
                    "cross_fields only in this engine"
                )
            fields = []
            for spec in body["fields"]:
                field, _, boost = spec.partition("^")
                fields.append((field, float(boost) if boost else 1.0))
            if not fields:
                raise ValueError("multi_match needs at least one field")
            mm_type = body.get("type", "best_fields")
            if mm_type not in ("best_fields", "most_fields"):
                raise ValueError(
                    f"unsupported multi_match type: {mm_type!r} "
                    "(best_fields/most_fields)"
                )
            tb = float(body.get("tie_breaker", 0.0))
            if tb and mm_type != "best_fields":
                raise ValueError(
                    "tie_breaker applies to best_fields (most_fields "
                    "already sums every matching leg)"
                )
            legs = [
                bm25_or_none(f, body["query"], "or", 0, None, scope, boost=b)
                for f, b in fields
            ]
            if all(leg is not None for leg in legs):
                # all fields BM25-scorable → per-field legs combined per
                # ES's type semantics
                if mm_type == "most_fields":
                    return Bool(should=[(leg, 1.0) for leg in legs])
                if len(legs) == 1:
                    return legs[0]
                return DisMax(legs, tie_breaker=tb)
            return MultiMatch(
                fields, body["query"], analyzers=analyzers,
                tokens_cols=tokens_cols,
                type=mm_type, tie_breaker=tb,
            )
        if kind == "combined_fields":
            # BM25F: fields fused into one pseudo-field before scoring.
            # Needs corpus stats over the COMBINED field (union df,
            # weighted length), so a combined_stats_for provider is
            # required — there is no constant-score fallback that would
            # preserve the query's meaning, refuse instead.
            extra = set(body) - {"query", "fields", "operator",
                                 "minimum_should_match", "boost"}
            if extra:
                raise ValueError(
                    f"unsupported combined_fields options: {sorted(extra)}"
                )
            if combined_stats_for is None:
                raise ValueError(
                    "combined_fields needs a combined_stats_for provider "
                    "(corpus_combined_provider / an index-backed one) — "
                    "its BM25F scoring has no constant-score fallback"
                )
            cf_fields = []
            for spec in body["fields"]:
                field, _, w = spec.partition("^")
                cf_fields.append((field, float(w) if w else 1.0))
            if not cf_fields:
                raise ValueError("combined_fields needs at least one field")
            cf_analyzers = {analyzers.get(f) for f, _ in cf_fields}
            if len(cf_analyzers) != 1 or None in cf_analyzers:
                raise ValueError(
                    "combined_fields requires every field to share one "
                    f"analyzer binding (ES's contract); got "
                    f"{ {f: analyzers.get(f) for f, _ in cf_fields} }"
                )
            (cf_analyzer,) = cf_analyzers
            tok_fields = []
            for f, w in cf_fields:
                tc = tokens_cols.get(f)
                if tc is None:
                    raise ValueError(
                        f"combined_fields field {f!r} has no token-column "
                        "binding"
                    )
                tok_fields.append((tc, w))
            msm = int(body.get("minimum_should_match", 0))
            return CombinedFields(
                tok_fields, body["query"], analyzer=cf_analyzer,
                stats=combined_stats_for(
                    tuple(tok_fields), cf_analyzer, body["query"]
                ),
                operator=body.get("operator", "or"),
                minimum_should_match=msm,
                boost=float(body.get("boost", 1.0)),
            )
        if kind == "fuzzy":
            (field, spec), = body.items()
            if isinstance(spec, dict):
                extra = set(spec) - {"value", "fuzziness"}
                if extra:
                    raise ValueError(f"unsupported fuzzy options: {extra}")
                value, fuzziness = spec["value"], spec.get("fuzziness", "AUTO")
            else:
                value, fuzziness = spec, "AUTO"
            return auto_nest(
                field, lambda f: Fuzzy(f, value, fuzziness=fuzziness), scope
            )
        if kind == "ids":
            values = body.get("values")
            if not isinstance(values, list):
                raise ValueError(f"ids expects {{'values': [...]}}, got {body!r}")
            return Ids(values, id_field=id_field)
        if kind == "term":
            (field, spec), = body.items()
            value = spec["value"] if isinstance(spec, dict) else spec
            return auto_nest(field, lambda f: Term(f, value), scope)
        if kind == "terms":
            (field, values), = body.items()
            if isinstance(values, dict):
                # ES terms LOOKUP: {"index", "id", "path"} — ES's
                # coordinator GETs that one document and expands its
                # array into a regular terms query (capped by
                # index.max_terms_count = 65536); the compile-time fetch
                # here is the same bounded 1-document read, through the
                # lookup_indices binding.
                extra = set(values) - {"index", "id", "path", "routing"}
                if extra:
                    raise ValueError(
                        f"unsupported terms-lookup keys: {sorted(extra)}"
                    )
                if lookup_indices is None or values["index"] not in lookup_indices:
                    raise ValueError(
                        f"terms lookup needs lookup_indices[{values['index']!r}] "
                        "bound to a DataFrame"
                    )
                lk_df, lk_id = lookup_indices[values["index"]]
                rows = (
                    lk_df.filter(F.col(lk_id) == F.lit(values["id"]))
                    .select(F.col(values["path"]).alias("__terms"))
                    .limit(2)
                    .collect()
                )
                if len(rows) != 1:
                    raise ValueError(
                        f"terms lookup expects exactly one document with "
                        f"{lk_id} == {values['id']!r} in "
                        f"{values['index']!r}, found {len(rows)}"
                    )
                terms = list(rows[0]["__terms"] or [])
                if len(terms) > 65536:
                    raise ValueError(
                        "terms lookup document expands to more than "
                        "65536 terms (ES's index.max_terms_count)"
                    )
                return auto_nest(field, lambda f: Terms(f, terms), scope)
            if not isinstance(values, list):
                raise ValueError(f"terms expects a list, got: {values!r}")
            return auto_nest(field, lambda f: Terms(f, values), scope)
        if kind == "terms_set":
            (field, spec), = body.items()
            extra = set(spec) - {"terms", "minimum_should_match",
                                 "minimum_should_match_field"}
            if extra:
                raise ValueError(f"unsupported terms_set keys: {extra}")
            return auto_nest(field, lambda f: TermsSet(
                f, spec["terms"],
                minimum_should_match=spec.get("minimum_should_match"),
                minimum_should_match_field=spec.get(
                    "minimum_should_match_field"),
            ), scope)
        if kind == "prefix":
            (field, spec), = body.items()
            value = spec["value"] if isinstance(spec, dict) else spec
            return auto_nest(field, lambda f: Prefix(f, value), scope)
        if kind == "wildcard":
            (field, spec), = body.items()
            pattern = (
                spec["value"] if isinstance(spec, dict) else spec
            )
            return auto_nest(field, lambda f: Wildcard(f, pattern), scope)
        if kind == "match_phrase":
            (field, spec), = body.items()
            if isinstance(spec, dict):
                extra = set(spec) - {"query", "slop"}
                if extra:
                    raise ValueError(
                        f"unsupported match_phrase options: {extra}"
                    )
                text = spec["query"]
                slop = int(spec.get("slop", 0))
            else:
                text, slop = spec, 0
            analyzer = analyzers.get(field)
            if analyzer is None:
                raise ValueError(
                    f"match_phrase on {field!r} needs an analyzer binding "
                    "(pass analyzers={...}: phrase semantics are defined "
                    "over analyzed token sequences)"
                )
            return auto_nest(
                field,
                lambda f: MatchPhrase(
                    f, text, analyzer=analyzer,
                    tokens_col=tokens_cols.get(field), slop=slop,
                ),
                scope,
            )
        if kind == "span_first":
            # Lucene span_first: the inner span must end within the
            # first `end` token positions. For span_term (and span_or of
            # span_terms — the expressible inner shapes here, as with
            # span_near) that is simply "the analyzed value occurs among
            # the first `end` tokens": one slice + overlap expression,
            # scan-local. Richer inner spans route to intervals.
            end_pos = int(body.get("end", 0))
            if end_pos <= 0:
                raise ValueError("span_first needs end > 0")
            inner = body.get("match")
            if not isinstance(inner, dict):
                raise ValueError("span_first needs a 'match' span")
            (ik, ib), = inner.items()

            def term_of(node_body) -> tuple[str, str]:
                (f, v), = node_body.items()
                if isinstance(v, dict):
                    v = v["value"]
                return f, str(v)

            if ik == "span_term":
                leaves = [term_of(ib)]
            elif ik == "span_or":
                leaves = [term_of(c["span_term"]) for c in ib["clauses"]]
            else:
                raise ValueError(
                    f"span_first match must be span_term/span_or here "
                    f"(got {ik!r}); richer spans via intervals"
                )
            sf_fields = {f for f, _ in leaves}
            if len(sf_fields) != 1:
                raise ValueError("span_first terms must share one field")
            (field,) = sf_fields
            analyzer = analyzers.get(field)
            tok_col = tokens_cols.get(field)
            if analyzer is None or tok_col is None:
                raise ValueError(
                    f"span_first on {field!r} needs analyzer + token-"
                    "column bindings (positional semantics are over "
                    "analyzed token sequences)"
                )
            class _SpanFirst(Query):
                # query-term analysis happens at predicate time (like
                # Intervals) — compile has no SparkSession
                def predicate(self, spark_, resolve) -> Column:
                    values = []
                    for _, v in leaves:
                        toks = analyze_text(spark_, v, analyzer)
                        if len(toks) != 1:
                            raise ValueError(
                                f"span_first term {v!r} analyzes to "
                                f"{len(toks)} tokens; span terms are "
                                "single-token"
                            )
                        values.append(toks[0])
                    head = F.slice(resolve(tok_col), 1, end_pos)
                    return F.arrays_overlap(
                        head, F.array(*[F.lit(t) for t in values])
                    )

            return _SpanFirst()
        if kind in ("span_term", "span_or", "span_near", "span_multi"):
            # Lucene span queries, translated onto the intervals
            # machinery (ES itself recommends intervals over spans —
            # intervals are the modern positional surface and strictly
            # generalize these):
            #   span_term {f: v}            -> intervals f: match v
            #   span_multi {match: {prefix|wildcard: {f: v}}}
            #       (r13, formerly a refusal) -> intervals f:
            #       prefix/wildcard — Lucene's multi-term-as-unit-span
            #       wrapper; both engines place one span per MATCHING
            #       TOKEN position, so the translation is exact.
            #       fuzzy/regexp/range inner queries refuse loudly
            #       (no interval twin here).
            #   span_or   {clauses: [...]}  -> intervals any_of
            #   span_near {clauses, slop, in_order}
            #     in_order=true  -> all_of(ordered, max_gaps=slop)
            #     in_order=false, all-term clauses
            #                    -> match(joined terms, max_gaps=slop)
            #     in_order=false with a span_multi clause
            #                    -> all_of(unordered) — the <=4-children
            #                       expression cap applies and refuses
            #                       loudly past it.
            # span_not takes span_multi include/exclude via its own
            # predicate-position machinery below; span_containing stays
            # term-only; field_masking_span remains the one span refusal
            # (cross-field position alignment needs multi-field
            # mappings this engine does not model — intervals is the
            # supported surface).
            def span_leaf(node: dict) -> tuple[str, dict, bool]:
                """-> (field, interval child rule, is_plain_term)."""
                (nk, nb), = node.items()
                if nk == "span_term":
                    (f, v), = nb.items()
                    if isinstance(v, dict):
                        v = v["value"]
                    return f, {"match": {"query": str(v)}}, True
                if nk == "span_multi":
                    if set(nb) != {"match"}:
                        raise ValueError(
                            "span_multi takes exactly {'match': "
                            "<multi-term query>}"
                        )
                    (mk, mb), = nb["match"].items()
                    if mk not in ("prefix", "wildcard"):
                        raise ValueError(
                            f"span_multi supports prefix/wildcard inner "
                            f"queries here (got {mk!r}); fuzzy/regexp "
                            "have no interval twin — use the fuzzy/"
                            "regexp document queries"
                        )
                    (f, v), = mb.items()
                    if isinstance(v, dict):
                        v = v.get("value", v.get(
                            "prefix" if mk == "prefix" else "pattern"))
                    want = "prefix" if mk == "prefix" else "pattern"
                    return f, {mk: {want: str(v)}}, False
                raise ValueError(
                    f"span clauses must be span_term/span_multi here "
                    f"(got {nk!r}); express richer compositions "
                    "with the intervals query directly"
                )

            if kind in ("span_term", "span_multi"):
                field, rule, _ = span_leaf({kind: body})
            elif kind == "span_or":
                leaves = [span_leaf(c) for c in body["clauses"]]
                fields = {f for f, _, _ in leaves}
                if len(fields) != 1:
                    raise ValueError(
                        f"span_or clauses must share one field, got "
                        f"{sorted(fields)}"
                    )
                (field,) = fields
                rule = {"any_of": {"intervals": [r for _, r, _ in leaves]}}
            else:
                extra = set(body) - {"clauses", "slop", "in_order"}
                if extra:
                    raise ValueError(
                        f"unsupported span_near keys: {sorted(extra)}"
                    )
                leaves = [span_leaf(c) for c in body["clauses"]]
                if not leaves:
                    raise ValueError("span_near needs clauses")
                fields = {f for f, _, _ in leaves}
                if len(fields) != 1:
                    raise ValueError(
                        f"span_near clauses must share one field, got "
                        f"{sorted(fields)}"
                    )
                (field,) = fields
                slop = int(body.get("slop", 0))
                all_terms = all(t for _, _, t in leaves)
                if body.get("in_order", False):
                    rule = {"all_of": {
                        "ordered": True, "max_gaps": slop,
                        "intervals": [r for _, r, _ in leaves],
                    }}
                elif all_terms:
                    rule = {"match": {
                        "query": " ".join(r["match"]["query"]
                                          for _, r, _ in leaves),
                        "max_gaps": slop, "ordered": False,
                    }}
                else:
                    rule = {"all_of": {
                        "ordered": False, "max_gaps": slop,
                        "intervals": [r for _, r, _ in leaves],
                    }}
            return compile_node({"intervals": {field: rule}}, scope)
        if kind == "span_not":
            # Lucene span_not (r12, formerly a refusal): include spans
            # that do not overlap any exclude span expanded by `pre`
            # positions before and `dist`/`post` after. Unit-width
            # include/exclude (span_term, or span_or of span_terms)
            # reduce overlap to one window test per include position —
            # scan-local HOFs on the analyzed token stream. Wider
            # spans route to intervals, same policy as span_first.
            extra = set(body) - {"include", "exclude", "pre", "post",
                                 "dist"}
            if extra:
                raise ValueError(
                    f"unsupported span_not keys: {sorted(extra)}"
                )
            if "dist" in body and ("pre" in body or "post" in body):
                raise ValueError(
                    "span_not takes dist OR pre/post, not both (ES)"
                )
            pre = int(body.get("pre", body.get("dist", 0)))
            post = int(body.get("post", body.get("dist", 0)))
            if pre < 0 or post < 0:
                raise ValueError("span_not pre/post/dist must be >= 0")

            def unit_terms(
                node: dict, role: str
            ) -> tuple[str, list, list]:
                """-> (field, literal terms, pattern specs) where specs
                are ("prefix", lowered) / ("wildcard", anchored regex) —
                span_multi wrappers (r13) contribute unit-width PATTERN
                positions next to the literal term positions."""
                (nk, nb), = node.items()
                if nk == "span_term":
                    (f, v), = nb.items()
                    return f, [str(v["value"] if isinstance(v, dict)
                                   else v)], []
                if nk == "span_multi":
                    if set(nb) != {"match"}:
                        raise ValueError(
                            "span_multi takes exactly {'match': "
                            "<multi-term query>}"
                        )
                    (mk, mb), = nb["match"].items()
                    if mk not in ("prefix", "wildcard"):
                        raise ValueError(
                            f"span_multi supports prefix/wildcard "
                            f"inner queries here (got {mk!r})"
                        )
                    (f, v), = mb.items()
                    if isinstance(v, dict):
                        v = v.get("value", v.get(
                            "prefix" if mk == "prefix" else "pattern"))
                    v = str(v).lower()
                    if mk == "prefix":
                        return f, [], [("prefix", v)]
                    import re as _re

                    rx = "".join(
                        ".*" if ch == "*" else "." if ch == "?"
                        else _re.escape(ch) for ch in v
                    )
                    return f, [], [("wildcard", "^" + rx + "$")]
                if nk == "span_or":
                    triples = [unit_terms(c, role) for c in nb["clauses"]]
                    fields_ = {f for f, _, _ in triples}
                    if len(fields_) != 1:
                        raise ValueError(
                            f"span_not {role} clauses must share one "
                            f"field, got {sorted(fields_)}"
                        )
                    return (triples[0][0],
                            [v for _, vs, _ in triples for v in vs],
                            [s for _, _, ss in triples for s in ss])
                raise ValueError(
                    f"span_not {role} must be span_term/span_or/"
                    f"span_multi here (got {nk!r}); richer spans via "
                    "intervals"
                )

            inc_field, inc_vals, inc_specs = unit_terms(
                body["include"], "include")
            exc_field, exc_vals, exc_specs = unit_terms(
                body["exclude"], "exclude")
            if inc_field != exc_field:
                raise ValueError(
                    "span_not include/exclude must share one field "
                    f"(got {inc_field!r} vs {exc_field!r})"
                )
            sn_analyzer = analyzers.get(inc_field)
            sn_tok = tokens_cols.get(inc_field)  # optional, like Intervals
            if sn_analyzer is None:
                raise ValueError(
                    f"span_not on {inc_field!r} needs an analyzer "
                    "binding (positional semantics are over analyzed "
                    "token sequences)"
                )

            class _SpanNot(Query):
                def predicate(self, spark_, resolve) -> Column:
                    def one_tok(v: str) -> str:
                        toks_ = analyze_text(spark_, v, sn_analyzer)
                        if len(toks_) != 1:
                            raise ValueError(
                                f"span_not term {v!r} analyzes to "
                                f"{len(toks_)} tokens; span terms are "
                                "single-token"
                            )
                        return toks_[0]

                    ts = (resolve(sn_tok) if sn_tok is not None
                          else analyze(resolve(inc_field), sn_analyzer))

                    def pos_of(vals: list, specs: list) -> Column:
                        toks_lit = [one_tok(v) for v in vals]

                        def hit(x: Column) -> Column:
                            cond = F.lit(False)
                            if toks_lit:
                                cond = cond | F.array_contains(
                                    F.array(*[F.lit(t) for t in toks_lit]),
                                    x,
                                )
                            for skind, sval in specs:
                                if skind == "prefix":
                                    cond = cond | x.startswith(F.lit(sval))
                                else:
                                    cond = cond | x.rlike(sval)
                            return cond

                        return F.filter(
                            F.transform(
                                ts,
                                lambda x, i: F.when(hit(x), i)
                                .otherwise(-1),
                            ),
                            lambda p: p >= 0,
                        )

                    def check(st: Column) -> Column:
                        ip, ep = st["i"], st["e"]
                        return F.coalesce(
                            F.exists(ip, lambda p: ~F.exists(
                                ep,
                                lambda q: (q >= p - F.lit(pre))
                                & (q <= p + F.lit(post)),
                            )),
                            F.lit(False),
                        )

                    # bind both position arrays once (Catalyst no-CSE)
                    st = F.struct(
                        pos_of(inc_vals, inc_specs).alias("i"),
                        pos_of(exc_vals, exc_specs).alias("e"),
                    )
                    return F.element_at(
                        F.transform(F.array(st), check), 1
                    )

            return _SpanNot()
        if kind in ("span_containing", "span_within"):
            # Lucene span_containing / span_within (r12, formerly
            # refusals): containment between a BIG span (span_near of
            # unit terms with slop/in_order — the engine's minimal
            # greedy-chain span per anchor, the documented all_of
            # semantics — or a single span_term) and a LITTLE unit span
            # (span_term / span_or). As document-level FILTER predicates
            # the two kinds coincide — "some big span contains some
            # little span" — they differ only in WHICH span is returned
            # for scoring/highlighting, out of scope for every
            # positional node here (documented).
            extra = set(body) - {"big", "little"}
            if extra:
                raise ValueError(
                    f"unsupported {kind} keys: {sorted(extra)}"
                )

            def unit_list(node: dict, role: str) -> tuple[str, list]:
                (nk, nb), = node.items()
                if nk == "span_term":
                    (f, v), = nb.items()
                    return f, [str(v["value"] if isinstance(v, dict)
                                   else v)]
                if nk == "span_or":
                    pairs = [unit_list(c, role) for c in nb["clauses"]]
                    fs = {f for f, _ in pairs}
                    if len(fs) != 1:
                        raise ValueError(
                            f"{kind} {role} clauses must share one field"
                        )
                    return pairs[0][0], [v for _, vs in pairs for v in vs]
                raise ValueError(
                    f"{kind} {role} must be span_term/span_or"
                    + ("/span_near" if role == "big" else "")
                    + f" here (got {nk!r}); richer spans via intervals"
                )

            (bk, bb), = body["big"].items()
            if bk == "span_near":
                big_field_terms = [unit_list(c, "big clause")
                                   for c in bb["clauses"]]
                if not big_field_terms:
                    raise ValueError(f"{kind} big span_near needs clauses")
                if any(len(ts) != 1 for _, ts in big_field_terms):
                    raise ValueError(
                        f"{kind} big span_near clauses must be span_term"
                    )
                if not bb.get("in_order", False):
                    raise ValueError(
                        f"{kind} big span_near must be in_order: true "
                        "(the minimal greedy-chain span is defined for "
                        "ordered composition; unordered big spans via "
                        "intervals)"
                    )
                slop = int(bb.get("slop", 0))
                big_terms = [ts[0] for _, ts in big_field_terms]
                big_fields = {f for f, _ in big_field_terms}
            else:
                f, ts = unit_list(body["big"], "big")
                big_terms, big_fields, slop = ts[:1], {f}, 0
                if len(ts) != 1:
                    raise ValueError(
                        f"{kind} big must be one span_term or span_near"
                    )
            lit_field, lit_terms = unit_list(body["little"], "little")
            fields_ = big_fields | {lit_field}
            if len(fields_) != 1:
                raise ValueError(
                    f"{kind} big/little must share one field, got "
                    f"{sorted(fields_)}"
                )
            (sc_field,) = fields_
            sc_analyzer = analyzers.get(sc_field)
            sc_tok = tokens_cols.get(sc_field)
            if sc_analyzer is None:
                raise ValueError(
                    f"{kind} on {sc_field!r} needs an analyzer binding"
                )
            n_big = len(big_terms)

            class _SpanContaining(Query):
                def predicate(self, spark_, resolve) -> Column:
                    def one_tok(v: str) -> str:
                        toks_ = analyze_text(spark_, v, sc_analyzer)
                        if len(toks_) != 1:
                            raise ValueError(
                                f"{kind} term {v!r} analyzes to "
                                f"{len(toks_)} tokens; span terms are "
                                "single-token"
                            )
                        return toks_[0]

                    ts = (resolve(sc_tok) if sc_tok is not None
                          else analyze(resolve(sc_field), sc_analyzer))

                    def pos_of(vals: list) -> Column:
                        arr = F.array(*[F.lit(one_tok(v)) for v in vals])
                        return F.filter(
                            F.transform(
                                ts,
                                lambda x, i: F.when(
                                    F.array_contains(arr, x), i
                                ).otherwise(-1),
                            ),
                            lambda p: p >= 0,
                        )

                    st = F.struct(
                        *[pos_of([t]).alias(f"b{j}")
                          for j, t in enumerate(big_terms)],
                        pos_of(lit_terms).alias("lit"),
                    )

                    def check(s: Column) -> Column:
                        def chain_ok(a: Column) -> Column:
                            e = a
                            for j in range(1, n_big):
                                prev = e
                                e = F.array_min(F.filter(
                                    s[f"b{j}"], lambda x: x > prev))

                            def fin(end: Column) -> Column:
                                ok = end.isNotNull() \
                                    & (end - a + 1 - n_big
                                       <= F.lit(slop))
                                return ok & F.coalesce(F.exists(
                                    s["lit"],
                                    lambda q: (q >= a) & (q <= end),
                                ), F.lit(False))

                            return F.element_at(
                                F.transform(F.array(e), fin), 1)

                        return F.coalesce(
                            F.exists(s["b0"], chain_ok), F.lit(False))

                    return F.element_at(
                        F.transform(F.array(st), check), 1)

            return _SpanContaining()
        if kind == "field_masking_span":
            raise ValueError(
                "field_masking_span is not supported — it re-reads "
                "positions from a sibling multi-field (text vs "
                "text.stemmed), and this engine does not model "
                "multi-field mappings whose token streams are "
                "position-aligned; use the intervals query (match/"
                "any_of/all_of/prefix/wildcard), the modern positional "
                "surface ES itself recommends over spans"
            )
        if kind == "intervals":
            (field, rule), = body.items()
            analyzer = analyzers.get(field)
            if analyzer is None:
                raise ValueError(
                    f"intervals on {field!r} needs an analyzer binding "
                    "(pass analyzers={...}: interval semantics are defined "
                    "over analyzed token sequences)"
                )
            return auto_nest(
                field,
                lambda f: Intervals(
                    f, rule, analyzer=analyzer,
                    tokens_col=tokens_cols.get(field),
                ),
                scope,
            )
        if kind in ("match_phrase_prefix", "match_bool_prefix"):
            (field, spec), = body.items()
            if isinstance(spec, dict):
                extra = set(spec) - ({"query", "operator"}
                                     if kind == "match_bool_prefix"
                                     else {"query"})
                if extra:
                    raise ValueError(f"unsupported {kind} options: {extra}")
                text = spec["query"]
                operator = spec.get("operator", "or")
            else:
                text, operator = spec, "or"
            analyzer = analyzers.get(field)
            if analyzer is None:
                raise ValueError(
                    f"{kind} on {field!r} needs an analyzer binding "
                    "(prefix semantics are defined over analyzed tokens)"
                )
            if kind == "match_phrase_prefix":
                return auto_nest(field, lambda f: MatchPhrasePrefix(
                    f, text, analyzer=analyzer,
                    tokens_col=tokens_cols.get(field),
                ), scope)
            return auto_nest(field, lambda f: MatchBoolPrefix(
                f, text, analyzer=analyzer,
                tokens_col=tokens_cols.get(field), operator=operator,
            ), scope)
        if kind == "pinned":
            extra = set(body) - {"ids", "organic"}
            if extra:
                raise ValueError(f"unsupported pinned keys: {sorted(extra)}")
            if "ids" not in body or "organic" not in body:
                raise ValueError(
                    "pinned expects {'ids': [...], 'organic': {...}}"
                )
            return Pinned(
                ids=list(body["ids"]),
                organic=compile_node(body["organic"], scope),
                id_field=id_field,
            )
        if kind == "distance_feature":
            extra = set(body) - {"field", "origin", "pivot", "boost"}
            if extra:
                raise ValueError(
                    f"unsupported distance_feature keys: {sorted(extra)}"
                )
            origin, pivot = body["origin"], body["pivot"]
            if not isinstance(origin, (int, float)) or \
                    not isinstance(pivot, (int, float)):
                raise ValueError(
                    "distance_feature origin/pivot must be NUMERIC here "
                    "(epoch seconds for timestamp fields); ES date-math "
                    "strings ('now-1d', '7d') are not parsed — convert "
                    "before compiling"
                )
            return DistanceFeature(
                body["field"], origin=float(origin), pivot=float(pivot),
                boost=float(body.get("boost", 1.0)),
            )
        if kind == "rank_feature":
            spec = dict(body)
            if "field" not in spec:
                raise ValueError(
                    f"rank_feature expects {{'field': ...}}, got {body!r}"
                )
            field = spec.pop("field")
            boost = float(spec.pop("boost", 1.0))
            unknown = set(spec) - {"saturation", "log", "sigmoid"}
            if unknown:
                raise ValueError(f"unsupported rank_feature keys: {unknown}")
            if len(spec) > 1:
                raise ValueError(
                    f"rank_feature takes at most one function, got "
                    f"{sorted(spec)}"
                )
            if not spec:
                return RankFeature(field, boost=boost)
            (fn, fb), = spec.items()
            fb = fb or {}
            return RankFeature(
                field, function=fn, boost=boost,
                pivot=float(fb.get("pivot", 1.0)),
                scaling_factor=float(fb.get("scaling_factor", 1.0)),
                exponent=float(fb.get("exponent", 1.0)),
            )
        if kind == "geo_distance":
            extra = set(body) - {"distance", "field", "origin"}
            if extra:
                raise ValueError(
                    f"unsupported geo_distance keys: {sorted(extra)}"
                )
            fld, origin = body.get("field"), body.get("origin")
            if not (isinstance(fld, dict) and {"lat", "lon"} <= set(fld)):
                raise ValueError(
                    "geo_distance needs 'field': {'lat': col, 'lon': col} "
                    "(no geo_point type here — a location is a numeric "
                    "degree column pair)"
                )
            if not (isinstance(origin, dict) and {"lat", "lon"} <= set(origin)):
                raise ValueError(
                    "geo_distance needs 'origin': {'lat': deg, 'lon': deg}"
                )
            return GeoDistance(
                fld["lat"], fld["lon"],
                lat=float(origin["lat"]), lon=float(origin["lon"]),
                distance_m=parse_distance_meters(body["distance"]),
            )
        if kind == "geo_polygon":
            extra = set(body) - {"field", "points"}
            if extra:
                raise ValueError(
                    f"unsupported geo_polygon keys: {sorted(extra)}"
                )
            fld = body.get("field")
            if not (isinstance(fld, dict) and {"lat", "lon"} <= set(fld)):
                raise ValueError(
                    "geo_polygon needs 'field': {'lat': col, 'lon': col} "
                    "(no geo_point type here — a location is a numeric "
                    "degree column pair)"
                )
            pts = [
                (float(p["lat"]), float(p["lon"]))
                if isinstance(p, dict) else (float(p[0]), float(p[1]))
                for p in body.get("points", [])
            ]
            return GeoPolygon(fld["lat"], fld["lon"], pts)
        if kind == "geo_bounding_box":
            extra = set(body) - {"field", "top_left", "bottom_right"}
            if extra:
                raise ValueError(
                    f"unsupported geo_bounding_box keys: {sorted(extra)}"
                )
            fld = body.get("field")
            if not (isinstance(fld, dict) and {"lat", "lon"} <= set(fld)):
                raise ValueError(
                    "geo_bounding_box needs 'field': {'lat': col, "
                    "'lon': col} (a location is a numeric degree column "
                    "pair)"
                )
            tl, br = body.get("top_left"), body.get("bottom_right")
            for name, corner in (("top_left", tl), ("bottom_right", br)):
                if not (isinstance(corner, dict)
                        and {"lat", "lon"} <= set(corner)):
                    raise ValueError(
                        f"geo_bounding_box needs '{name}': "
                        "{'lat': deg, 'lon': deg}"
                    )
            return GeoBoundingBox(
                fld["lat"], fld["lon"],
                top=float(tl["lat"]), left=float(tl["lon"]),
                bottom=float(br["lat"]), right=float(br["lon"]),
            )
        if kind == "geo_shape":
            # ES geo_shape against POINT documents (the degree-column-pair
            # convention): inline envelope / polygon shapes, GeoJSON
            # [lon, lat] coordinate order. For point docs `intersects`
            # and `within` coincide (point-in-shape) and `disjoint` is
            # the negation; `contains` (a point containing a shape) is
            # degenerate and refuses. Envelope boxes delegate to the
            # bounding-box node (antimeridian wrap included), polygons to
            # the even-odd ray-casting node; indexed-shape references and
            # multi-ring polygons refuse loudly.
            extra = set(body) - {"field", "shape", "relation"}
            if extra:
                raise ValueError(
                    f"unsupported geo_shape keys: {sorted(extra)}"
                )
            fld = body.get("field")
            if not (isinstance(fld, dict) and {"lat", "lon"} <= set(fld)):
                raise ValueError(
                    "geo_shape needs 'field': {'lat': col, 'lon': col} "
                    "(a location is a numeric degree column pair)"
                )
            shape = body.get("shape")
            if not (isinstance(shape, dict) and "type" in shape):
                raise ValueError(
                    "geo_shape needs an inline 'shape' object "
                    "(indexed_shape references are unsupported)"
                )
            relation = body.get("relation", "intersects")
            if relation not in ("intersects", "within", "disjoint"):
                raise ValueError(
                    f"unsupported geo_shape relation {relation!r} for "
                    "point documents (intersects/within/disjoint)"
                )
            stype = str(shape["type"]).lower()
            if stype == "envelope":
                (l_lon, t_lat), (r_lon, b_lat) = shape["coordinates"]
                inner: Query = GeoBoundingBox(
                    fld["lat"], fld["lon"],
                    top=float(t_lat), left=float(l_lon),
                    bottom=float(b_lat), right=float(r_lon),
                )
            elif stype == "polygon":
                rings = shape["coordinates"]
                if len(rings) != 1:
                    raise ValueError(
                        "geo_shape polygon holes (multiple rings) are "
                        "unsupported"
                    )
                pts = [(float(lat), float(lon)) for lon, lat in rings[0]]
                inner = GeoPolygon(fld["lat"], fld["lon"], pts)
            else:
                raise ValueError(
                    f"unsupported geo_shape type {stype!r} "
                    "(envelope/polygon)"
                )
            if relation == "disjoint":
                return Bool(must_not=[inner])
            return inner
        if kind == "range":
            (field, bounds), = body.items()
            extra = set(bounds) - {"gt", "gte", "lt", "lte"}
            if extra:
                raise ValueError(f"unsupported range keys: {extra}")
            return auto_nest(field, lambda f: Range(f, **bounds), scope)
        if kind == "exists":
            return auto_nest(body["field"], Exists, scope)
        if kind == "match_all":
            return MatchAll()
        if kind == "match_none":
            return MatchNone()
        raise ValueError(f"unsupported query clause: {kind!r}")

    return compile_node(dsl, None)


def reference_query() -> Query:
    """The reference's showcase query, verbatim
    (src/used_queries/elastic_queries.json:1-46): function_score(bool(
    should=[nested match on context_annotations.domain.name="Person",
    weight 5], filter=[author.following_count>100,
    author.followers_count>100, nested exists links.url]))."""
    return FunctionScore(
        Bool(
            should=[
                (
                    Nested(
                        "context_annotations",
                        Match("domain.name", "Person", analyzer=None),
                    ),
                    5.0,
                )
            ],
            filter=[
                Range("author.following_count", gt=100),
                Range("author.followers_count", gt=100),
                Nested("links", Exists("url")),
            ],
        )
    )


def more_like_this(
    docs: DataFrame,
    seed_id,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "standard",
    max_query_terms: int = 12,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    max_doc_freq_frac: float = 0.25,
    minimum_should_match: float = 0.3,
    k: int = 10,
) -> DataFrame:
    """ES ``more_like_this``: find documents similar to a seed document.
    ES's algorithm, declaratively: analyze the seed, keep its terms with
    tf ≥ ``min_term_freq`` and corpus df in [``min_doc_freq``,
    ``max_doc_freq_frac``·N] (the stopword guard), select the top
    ``max_query_terms`` by tf·idf (idf = ln(N/df), ties by term), then
    score every OTHER document by the sum of selected-term idfs it
    matches, requiring ≥ ceil(``minimum_should_match`` · |terms|) matches
    (ES's percent form).

    Everything stays in-plan — no driver-side term collection: the
    selected-terms relation is ≤ max_query_terms rows and BROADCASTS to
    the candidate join; the per-doc distinct-token explode feeds one
    aggregation keyed by the id the explode preserves. Cost: two token
    aggregations + a broadcast join + TakeOrderedAndProject, each linear
    in posting count — at index scale the df lookup is the stored term
    dictionary instead of the first aggregation.

    Returns (id, n_matched, score) for the top-k, score = Σ idf rounded
    to 6 dp (summation-order portability)."""
    from tweets_elastic_spark.functions.analyzers import analyze

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(analyze(F.col(text_col), analyzer))
        ).alias("_t"),
    )
    # term frequency WITHIN the seed needs multiplicity — separate explode
    seed_tf = (
        docs.filter(F.col(id_col) == F.lit(seed_id))
        .select(F.explode(analyze(F.col(text_col), analyzer)).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .filter(F.col("_tf") >= int(min_term_freq))
    )
    n_total = docs.select(F.count(F.lit(1)).alias("_n"))
    dfs = (
        toks.join(F.broadcast(seed_tf.select("_t")), "_t", "leftsemi")
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    sel = (
        seed_tf.join(dfs, "_t")
        .crossJoin(F.broadcast(n_total))
        .filter(
            (F.col("_df") >= int(min_doc_freq))
            & (F.col("_df") <= F.col("_n") * F.lit(float(max_doc_freq_frac)))
        )
        .withColumn("_idf", F.log(F.col("_n") / F.col("_df")))
        .orderBy((F.col("_tf") * F.col("_idf")).desc(), F.col("_t").asc())
        .limit(int(max_query_terms))
        .select("_t", "_idf")
    )
    n_sel = sel.agg(F.count(F.lit(1)).alias("_k"))
    matched = (
        toks.filter(F.col("_id") != F.lit(seed_id))
        .join(F.broadcast(sel), "_t")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.sum("_idf"), 6).alias("score"),
        )
        .crossJoin(F.broadcast(n_sel))
        .filter(
            # ES rounds a positive minimum_should_match percentage DOWN
            F.col("n_matched")
            >= F.floor(F.col("_k") * F.lit(float(minimum_should_match)))
        )
    )
    return (
        matched.select(F.col("_id").alias(id_col), "n_matched", "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def rrf_fuse(
    legs: list[DataFrame],
    *,
    id_col: str = "doc_id",
    k: int = 10,
    rank_constant: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (ES 8's ``rank: {rrf: ...}`` — the hybrid
    lexical+vector retrieval combiner): each leg is an ALREADY-TRUNCATED
    ranked result (id, score); a document's fused score is
    Σ_legs 1/(rank_constant + rank_in_leg), documents absent from a leg
    contribute nothing — ES's contract, scoreless by design so wildly
    different score scales (BM25 vs cosine) fuse without calibration.

    Scale shape: each leg arrives as a top-N (TakeOrderedAndProject —
    never pass an untruncated corpus-sized relation here); the rank
    window then runs over leg-sized rows (the coordinator-side shape, as
    with pipeline aggs), and the fusion is a union + one tiny groupBy.

    Returns (id, score, n_legs) — fused score rounded at 6 dp, top-k by
    (score desc, id asc)."""
    from pyspark.sql.window import Window

    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    fused = None
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    for leg in legs:
        r = leg.select(
            F.col(id_col),
            (
                F.lit(1.0)
                / (F.lit(float(rank_constant)) + F.row_number().over(w))
            ).alias("_rrf"),
        )
        fused = r if fused is None else fused.unionByName(r)
    return (
        fused.groupBy(id_col)
        .agg(
            F.round(F.sum("_rrf"), 6).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_legs"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def es_retriever(
    df: DataFrame,
    retriever: dict,
    *,
    id_col: str = "doc_id",
    size: int = 10,
    analyzers: dict[str, str] | None = None,
    tokens_cols: dict[str, str] | None = None,
) -> DataFrame:
    """ES 8.14+ ``retriever`` tree: the request-level composition surface
    that replaced the top-level query/knn/rank split. Leaves produce a
    ranked (id, score) relation; compound nodes fuse their children:

    * ``standard`` — {"query": ...}: from_es_json-compiled scoring, the
      classic search leg (optional ``filter`` pre-applies).
    * ``knn`` — {"field", "query_vector", "k"}: exact cosine top-k over
      the (optionally ``filter``ed) scan — the documented strictly-more-
      accurate divergence from HNSW shared with the knn request clause;
      ``num_candidates`` is accepted and trivially satisfied.
    * ``rrf`` — {"retrievers": [...], "rank_window_size",
      "rank_constant", "filter"}: children evaluate recursively,
      truncate to rank_window_size each, and fuse via rrf_fuse (adds
      ``n_legs``).
    * ``linear`` — {"retrievers": [{"retriever": ..., "weight",
      "normalizer"}], "rank_window_size", "filter"}: weighted sum of
      per-leg normalized scores; ``minmax`` rescales each leg to [0, 1]
      (single-score legs normalize to 1.0 — the max IS the score),
      ``none`` uses raw scores. Docs absent from a leg contribute 0.

    Compound-level ``filter`` (ES 8.16) on rrf/linear pre-applies to
    the scan every child leg reads — ES's attach-to-each-child
    semantics, expressed once so Catalyst pushes it into the shared
    scan. Every branch guards its key set: an option this engine does
    not honor raises instead of silently changing the result.

    Every leg truncates BEFORE fusion (TakeOrderedAndProject), so the
    rank windows and fusion groupBys run on leg-sized relations — the
    coordinator-side shape rrf_fuse documents. Ties everywhere break by
    ``id_col`` ascending (ES's internal-doc-id tiebreak is not
    reproducible; the explicit key is the same determinism trade as
    search()'s tiebreak)."""
    from tweets_elastic_spark.functions.vectors import cosine, lit_vector

    if not (isinstance(retriever, dict) and len(retriever) == 1):
        raise ValueError(
            f"a retriever is one {{kind: body}} object, got {retriever!r}"
        )
    (kind, body), = retriever.items()

    def ranked(out: DataFrame, window: int) -> DataFrame:
        # leg scores round to 6 dp BEFORE ranking (the registry-wide
        # cross-engine determinism convention: raw float ties near the
        # truncation boundary would otherwise rank engine-dependently)
        return (
            out.select(
                F.col(id_col),
                F.round(F.col("score").cast("double"), 6).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(int(window))
        )

    if kind == "standard":
        extra = set(body) - {"query", "filter"}
        if extra:
            raise ValueError(
                f"unsupported standard retriever keys: {sorted(extra)}"
            )
        scan = df
        if body.get("filter") is not None:
            pre = from_es_json({"query": body["filter"]},
                               analyzers=analyzers, tokens_cols=tokens_cols)
            scan = scan.filter(pre.predicate(scan.sparkSession,
                                             _col_resolver))
        tree = from_es_json({"query": body["query"]}, analyzers=analyzers,
                            tokens_cols=tokens_cols)
        return ranked(search(scan, tree, k=None), size)
    if kind == "knn":
        extra = set(body) - {"field", "query_vector", "k",
                             "num_candidates", "filter"}
        if extra:
            raise ValueError(
                f"unsupported knn retriever keys: {sorted(extra)}"
            )
        scan = df
        if body.get("filter") is not None:
            pre = from_es_json({"query": body["filter"]},
                               analyzers=analyzers, tokens_cols=tokens_cols)
            scan = scan.filter(pre.predicate(scan.sparkSession,
                                             _col_resolver))
        k = int(body.get("k", size))
        out = scan.select(
            F.col(id_col),
            cosine(F.col(body["field"]),
                   lit_vector([float(x) for x in body["query_vector"]]))
            .alias("score"),
        )
        return ranked(out, min(k, size))
    if kind == "text_similarity_reranker":
        # ES 8.15 semantic reranker: re-score the child retriever's
        # rank window by a text-similarity model between
        # ``inference_text`` and ``field``. ES calls an inference
        # endpoint (a cross-encoder / ELSER deployment); this engine
        # has no model server, so the similarity model is the
        # DETERMINISTIC lexical one the dedup family already ships:
        # token-set Jaccard between the analyzed query and the analyzed
        # field (standard analyzer) — the documented model-free
        # divergence, same class as sampler's sort_field. Plan: the
        # child's window (<= rank_window_size rows of ids) broadcasts
        # back onto the doc scan, the similarity is one scan-local HOF
        # expression, and the re-rank is a TakeOrdered over window-sized
        # rows — no new shuffle.
        extra = set(body) - {"retriever", "field", "inference_text",
                             "inference_id", "rank_window_size"}
        if extra:
            raise ValueError(
                f"unsupported text_similarity_reranker keys: "
                f"{sorted(extra)}"
            )
        child, field = body.get("retriever"), body.get("field")
        qtext = body.get("inference_text")
        if child is None or field is None or qtext is None:
            raise ValueError(
                "text_similarity_reranker needs 'retriever', 'field' "
                "and 'inference_text'"
            )
        from tweets_elastic_spark.functions.analyzers import (
            analyze, analyze_text,
        )

        window = int(body.get("rank_window_size", size))
        leg = es_retriever(df, child, id_col=id_col, size=window,
                           analyzers=analyzers, tokens_cols=tokens_cols
                           ).select(id_col)
        qtok = sorted(set(analyze_text(df.sparkSession, qtext, "standard")))
        doctoks = F.array_distinct(analyze(F.col(field), "standard"))
        qarr = F.array(*[F.lit(t) for t in qtok])
        inter = F.size(F.array_intersect(doctoks, qarr))
        union = F.size(doctoks) + F.lit(len(qtok)) - inter
        sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
        rescored = df.join(F.broadcast(leg), id_col).select(
            F.col(id_col), sim.alias("score")
        )
        return ranked(rescored, size)
    if kind == "rrf":
        # Same never-silently-ignore contract as the other branches: an
        # unknown body key (a typo'd rank_window_size, an 8.16 option
        # this engine lacks) must raise, not return differently-shaped
        # results. ES 8.16's compound-level `filter` IS supported: it
        # pre-applies to the scan every child leg reads — equivalent to
        # ES attaching it as a pre-filter to each child.
        extra = set(body) - {"retrievers", "rank_window_size",
                             "rank_constant", "filter"}
        if extra:
            raise ValueError(
                f"unsupported rrf retriever keys: {sorted(extra)}"
            )
        children = body.get("retrievers")
        if not (isinstance(children, list) and len(children) >= 2):
            raise ValueError("rrf retriever needs >= 2 child retrievers")
        scan = df
        if body.get("filter") is not None:
            pre = from_es_json({"query": body["filter"]},
                               analyzers=analyzers, tokens_cols=tokens_cols)
            scan = scan.filter(pre.predicate(scan.sparkSession,
                                             _col_resolver))
        window = int(body.get("rank_window_size", size))
        legs = [
            es_retriever(scan, c, id_col=id_col, size=window,
                         analyzers=analyzers, tokens_cols=tokens_cols)
            .select(id_col, "score")
            for c in children
        ]
        return rrf_fuse(legs, id_col=id_col, k=size,
                        rank_constant=int(body.get("rank_constant", 60)))
    if kind == "linear":
        extra = set(body) - {"retrievers", "rank_window_size", "filter"}
        if extra:
            raise ValueError(
                f"unsupported linear retriever keys: {sorted(extra)}"
            )
        children = body.get("retrievers")
        if not (isinstance(children, list) and children):
            raise ValueError("linear retriever needs child retrievers")
        scan = df
        if body.get("filter") is not None:
            pre = from_es_json({"query": body["filter"]},
                               analyzers=analyzers, tokens_cols=tokens_cols)
            scan = scan.filter(pre.predicate(scan.sparkSession,
                                             _col_resolver))
        window = int(body.get("rank_window_size", size))
        fused = None
        for c in children:
            if not isinstance(c, dict):
                raise ValueError(
                    "each linear child is {'retriever': ..., 'weight', "
                    "'normalizer'}"
                )
            child_extra = set(c) - {"retriever", "weight", "normalizer"}
            if child_extra:
                raise ValueError(
                    f"unsupported linear child keys: "
                    f"{sorted(child_extra)}"
                )
            spec = c.get("retriever")
            if spec is None:
                raise ValueError(
                    "each linear child is {'retriever': ..., 'weight', "
                    "'normalizer'}"
                )
            weight = float(c.get("weight", 1.0))
            norm = c.get("normalizer", "none")
            if norm not in ("none", "minmax"):
                raise ValueError(
                    f"unsupported linear normalizer {norm!r} "
                    "(none/minmax)"
                )
            leg = es_retriever(scan, spec, id_col=id_col, size=window,
                               analyzers=analyzers, tokens_cols=tokens_cols
                               ).select(id_col, "score")
            if norm == "minmax":
                # leg-sized relation: the min/max aggregate is a 1-row
                # broadcast over at most rank_window_size rows
                mm = leg.agg(F.min("score").alias("_lo"),
                             F.max("score").alias("_hi"))
                leg = leg.crossJoin(F.broadcast(mm)).select(
                    id_col,
                    F.when(F.col("_hi") == F.col("_lo"), F.lit(1.0))
                    .otherwise((F.col("score") - F.col("_lo"))
                               / (F.col("_hi") - F.col("_lo")))
                    .alias("score"),
                )
            leg = leg.select(id_col,
                             (F.col("score") * F.lit(weight)).alias("_c"))
            fused = leg if fused is None else fused.unionByName(leg)
        return (
            fused.groupBy(id_col)
            .agg(F.round(F.sum("_c"), 6).alias("score"),
                 F.count(F.lit(1)).cast("int").alias("n_legs"))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(int(size))
        )
    raise ValueError(f"unsupported retriever kind {kind!r}")
