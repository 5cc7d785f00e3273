"""Function queries: the ValueSourceParser registry as a string->Column compiler.

Reference: Solr's ``func`` QParser (solr/core/src/java/org/apache/solr/search/
FunctionQParser.java) parses function-query strings like
``recip(ms(NOW,warc_ts),3.16e-11,1,1)`` against the standard ValueSource
registry (solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:90
``addParser`` calls).  Here every value source compiles to a Catalyst Column —
JVM-side, whole-stage-codegen'd, no UDFs — so function queries sort/boost/
filter at native speed and push down like any expression.

Semantics notes (matching the reference):
- ``log`` is base-10 (Lucene LogFloatFunction), ``ln`` natural.
- ``recip(x,m,a,b) = a/(m*x+b)`` (ReciprocalFloatFunction).
- ``linear(x,m,c) = m*x+c`` (LinearFloatFunction).
- ``map(x,min,max,target)``: x in [min,max] -> target else x (RangeMapFloatFunction).
- ``ms(a,b)``: millisecond difference; ``ms(NOW,field)`` uses the pinned
  ``now`` epoch passed to the parser — determinism requires an explicit NOW
  (Solr pins NOW per request for the same reason).
- ``strdist(a,b,edit)``: normalized Levenshtein similarity
  1 - dist/greatest(len(a),len(b)) (StrDistanceFunction + commons
  getDistance semantics).
- ``exists(f)`` -> NOT NULL; ``def(f,d)`` -> coalesce; ``if(t,a,b)`` ->
  CASE WHEN (BoolFunction family).
- ``scale(x,min,max)`` is the DataFrame-level ``with_scale`` helper (it
  needs a global min/max pass: one tiny aggregate broadcast back, no driver
  collect); ``ord``/``rord`` and ``termfreq`` likewise need frame-level
  passes and live as ``with_ord`` / ``with_termfreq``.
- ``dist``/``sqedist``/``hsin``/``geodist`` (VectorDistanceFunction /
  HaversineFunction): pure column math; ``geodist`` takes degrees and
  returns km over the spatial4j mean earth radius; ``hsin`` takes a radius
  plus radian coordinates.
- ``docfreq``/``idf``/``maxdoc``/``numdocs``/``sumtotaltermfreq``/
  ``totaltermfreq`` compile to scalar literals resolved against the
  ``index=`` argument's term dictionary (one bounded single-term collect —
  the discipline the BM25 scorer already uses for query-term stats).

Field references resolve to columns of whatever DataFrame the caller applies
the Column to; bare identifiers that are not function names are fields.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+\.?\d*(?:[eE][+-]?\d+)?)
      | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
      | (?P<dollar>\$[A-Za-z_][A-Za-z0-9_.]*)
      | (?P<str>"[^"]*"|'[^']*')
      | (?P<lp>\()
      | (?P<rp>\))
      | (?P<comma>,)
    )""",
    re.VERBOSE,
)


def _lev_sim(a: Column, b: Column) -> Column:
    dist = F.levenshtein(a, b).cast("double")
    mx = F.greatest(F.length(a), F.length(b)).cast("double")
    return F.when(mx == 0, F.lit(1.0)).otherwise(1.0 - dist / mx)


# name -> (min_args, max_args, builder(list[Column]) -> Column)
FUNCTIONS: dict[str, tuple[int, int, callable]] = {
    # arithmetic (SumFloatFunction & friends, ValueSourceParser.java:90-200)
    "sum": (2, 99, lambda a: _chain(a, lambda x, y: x + y)),
    "add": (2, 99, lambda a: _chain(a, lambda x, y: x + y)),
    "sub": (2, 2, lambda a: a[0] - a[1]),
    "product": (2, 99, lambda a: _chain(a, lambda x, y: x * y)),
    "mul": (2, 99, lambda a: _chain(a, lambda x, y: x * y)),
    "div": (2, 2, lambda a: a[0] / a[1]),
    "mod": (2, 2, lambda a: a[0] % a[1]),
    "abs": (1, 1, lambda a: F.abs(a[0])),
    "log": (1, 1, lambda a: F.log10(a[0])),
    "ln": (1, 1, lambda a: F.log(a[0])),
    "sqrt": (1, 1, lambda a: F.sqrt(a[0])),
    "cbrt": (1, 1, lambda a: F.cbrt(a[0])),
    "pow": (2, 2, lambda a: F.pow(a[0], a[1])),
    "exp": (1, 1, lambda a: F.exp(a[0])),
    "ceil": (1, 1, lambda a: F.ceil(a[0])),
    "floor": (1, 1, lambda a: F.floor(a[0])),
    "rint": (1, 1, lambda a: F.rint(a[0])),
    "min": (2, 99, lambda a: F.least(*a)),
    "max": (2, 99, lambda a: F.greatest(*a)),
    # sin/cos/... (trig group in ValueSourceParser)
    "sin": (1, 1, lambda a: F.sin(a[0])),
    "cos": (1, 1, lambda a: F.cos(a[0])),
    "tan": (1, 1, lambda a: F.tan(a[0])),
    "asin": (1, 1, lambda a: F.asin(a[0])),
    "acos": (1, 1, lambda a: F.acos(a[0])),
    "atan": (1, 1, lambda a: F.atan(a[0])),
    "sinh": (1, 1, lambda a: F.sinh(a[0])),
    "cosh": (1, 1, lambda a: F.cosh(a[0])),
    "tanh": (1, 1, lambda a: F.tanh(a[0])),
    "rad": (1, 1, lambda a: F.radians(a[0])),
    "deg": (1, 1, lambda a: F.degrees(a[0])),
    "atan2": (2, 2, lambda a: F.atan2(a[0], a[1])),
    "hypot": (2, 2, lambda a: F.hypot(a[0], a[1])),
    # shaping functions
    "linear": (3, 3, lambda a: a[1] * a[0] + a[2]),
    "recip": (4, 4, lambda a: a[2] / (a[1] * a[0] + a[3])),
    "map": (
        4,
        4,
        lambda a: F.when((a[0] >= a[1]) & (a[0] <= a[2]), a[3]).otherwise(a[0]),
    ),
    # boolean / conditional (BoolFunction family)
    "if": (3, 3, lambda a: F.when(a[0].cast("boolean"), a[1]).otherwise(a[2])),
    "exists": (1, 1, lambda a: a[0].isNotNull()),
    "def": (2, 2, lambda a: F.coalesce(a[0], a[1])),
    "not": (1, 1, lambda a: ~a[0].cast("boolean")),
    "and": (2, 99, lambda a: _chain(a, lambda x, y: x.cast("boolean") & y.cast("boolean"))),
    "or": (2, 99, lambda a: _chain(a, lambda x, y: x.cast("boolean") | y.cast("boolean"))),
    # xor (ValueSourceParser.java addParser("xor"): MultiBoolFunction true
    # iff the sources are NOT all-true and NOT all-false)
    "xor": (2, 99, lambda a: (
        _chain(a, lambda x, y: x.cast("boolean") | y.cast("boolean"))
        & ~_chain(a, lambda x, y: x.cast("boolean") & y.cast("boolean"))
    )),
    # top(vs) is a no-op passthrough (ValueSourceParser.java:136-143)
    "top": (1, 1, lambda a: a[0]),
    # date: ms(a[,b]) in milliseconds (DateValueSourceParser)
    "ms": (1, 2, lambda a: (a[0] - a[1]) if len(a) == 2 else a[0]),
    # constants (ValueSourceParser.java addParser("pi"/"e"/"true"/"false"))
    "pi": (0, 0, lambda a: F.lit(3.141592653589793)),
    "e": (0, 0, lambda a: F.lit(2.718281828459045)),
    "true": (0, 0, lambda a: F.lit(True)),
    "false": (0, 0, lambda a: F.lit(False)),
    # string distance (StrDistanceFunction, 'edit' == normalized Levenshtein)
    "strdist": (2, 3, lambda a: _lev_sim(a[0], a[1])),
    # vector/geo distances (DistanceFunction group, ValueSourceParser.java:
    # addParser("dist"/"sqedist"/"hsin"/"geodist"))
    "sqedist": (2, 98, lambda a: _sqedist(a)),
    "dist": (3, 99, lambda a: a),  # built in expr() — needs the literal power
    "hsin": (5, 5, lambda a: a[0] * _haversine(a[1], a[2], a[3], a[4])),
    "geodist": (
        4,
        4,
        lambda a: F.lit(EARTH_MEAN_RADIUS_KM)
        * _haversine(*[F.radians(x) for x in a]),
    ),
    # geohash family (ValueSourceParser.java addParser("geohash"/"ghhsin"):
    # GeohashFunction / GeohashHaversineFunction; spatial4j precision 12)
    "geohash": (2, 2, lambda a: _geohash_encode(a)),
    # ghhsin is parsed specially in _Parser._ghhsin (literal radius; its
    # geohash args stay in quantized cell coordinates — no string
    # round-trip, whose nested tree explodes Catalyst analysis)
    # norm(field) (NormValueSource.java): the similarity-decoded norm byte,
    # i.e. byte315ToFloat(norm_byte) — reads the docs table's norm_byte column
    "norm": (1, 1, lambda a: _norm_decode_col()),
    # termfreq/tf need a per-doc postings join — not expressible as a pure
    # Column; with_termfreq() is the DataFrame-level realization
    "termfreq": (2, 2, lambda a: _raise(ValueError(
        "termfreq(field,term) needs a postings join - use with_termfreq()"))),
    "tf": (2, 2, lambda a: _raise(ValueError(
        "tf() is TFIDFSimilarity-only (TFValueSource); this engine is BM25 - "
        "use termfreq()/with_termfreq() for the raw count"))),
    # cscore() (CollapseScoreFunction via addParser("cscore"),
    # ValueSourceParser.java:226-231): the doc's query score inside a
    # {!collapse} min=/max= selector — our collapse frame always carries
    # the score column, so it compiles directly
    "cscore": (0, 0, lambda a: F.col("score")),
    # joindf(field,qfield) (JoinDocFreqValueSource.java:46-82) needs the
    # qfield term dictionary joined per doc — with_joindf() is the
    # DataFrame-level realization
    "joindf": (2, 2, lambda a: _raise(ValueError(
        "joindf(field,qfield) needs a dictionary join - use with_joindf()"))),
}

# index-statistic functions (ValueSourceParser.java addParser("docfreq"/
# "idf"/"maxdoc"/"numdocs"/"sumtotaltermfreq"/"totaltermfreq"): compiled to
# scalar literals resolved against the passed IndexTables — a bounded
# one-term collect, the same discipline the BM25 scorer uses for term stats.
_INDEX_STAT_FNS = {
    "docfreq", "idf", "maxdoc", "numdocs",
    "sumtotaltermfreq", "sttf", "totaltermfreq", "ttf",
}

EARTH_MEAN_RADIUS_KM = 6371.0087714  # DistanceUtils.EARTH_MEAN_RADIUS_KM


def _raise(e):
    raise e


def _sqedist(a: list[Column]) -> Column:
    """SquaredEuclideanFunction: args split into two equal-length vectors."""
    if len(a) % 2:
        raise ValueError("sqedist takes two equal-length vectors")
    h = len(a) // 2
    return _chain(
        [(x - y) * (x - y) for x, y in zip(a[:h], a[h:])], lambda x, y: x + y
    )


def _dist(power: float, a: list[Column]) -> Column:
    """VectorDistanceFunction: Minkowski p-norm between two vectors.
    power 0 counts differing dimensions (sparseness), 1 = Manhattan,
    2 = Euclidean, other finite p = (sum |d|^p)^(1/p)."""
    if len(a) % 2:
        raise ValueError("dist takes a power then two equal-length vectors")
    h = len(a) // 2
    diffs = [x - y for x, y in zip(a[:h], a[h:])]
    if power == 0.0:
        return _chain(
            [(d != 0).cast("int") for d in diffs], lambda x, y: x + y
        ).cast("double")
    if power == 1.0:
        return _chain([F.abs(d) for d in diffs], lambda x, y: x + y)
    if power == 2.0:
        return F.sqrt(_chain([d * d for d in diffs], lambda x, y: x + y))
    s = _chain([F.pow(F.abs(d), F.lit(power)) for d in diffs], lambda x, y: x + y)
    return F.pow(s, F.lit(1.0 / power))


def _haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Unit-sphere haversine distance over RADIAN coordinates
    (HaversineFunction.java distance())."""
    dlat, dlon = (lat2 - lat1) / 2, (lon2 - lon1) / 2
    h = F.sin(dlat) * F.sin(dlat) + (
        F.cos(lat1) * F.cos(lat2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * F.asin(F.sqrt(h))


def _norm_decode_col() -> Column:
    """byte315ToFloat(norm_byte) lookup as a 256-entry array literal."""
    import numpy as np

    from lucene_solr_spark.smallfloat import byte315_to_float

    vals = byte315_to_float(np.arange(256))
    return F.element_at(
        F.array(*[F.lit(float(v)) for v in vals]),
        F.col("norm_byte").cast("int") + 1,
    )


def _chain(args: list[Column], op) -> Column:
    out = args[0]
    for x in args[1:]:
        out = op(out, x)
    return out


class _Parser:
    def __init__(
        self,
        text: str,
        now_epoch_ms: int | None,
        index=None,
        params: dict[str, str] | None = None,
    ):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if not m or m.end() == m.start():
                raise ValueError(f"bad function query at {text[pos:pos+20]!r}")
            for kind in ("num", "name", "dollar", "str", "lp", "rp", "comma"):
                if m.group(kind) is not None:
                    self.toks.append((kind, m.group(kind)))
                    break
            pos = m.end()
        self.i = 0
        self.now = now_epoch_ms
        self.index = index
        self.params = params or {}
        # query() subqueries needing a frame-level (docid, score) join:
        # list of (column_name, query_string, default_value)
        self.subqueries: list[tuple[str, str, float]] = []
        self._now_cols: set[int] = set()  # id()s of NOW literal columns
        self._str_lits: dict[int, str] = {}  # id(col) -> raw string literal
        self._num_lits: dict[int, float] = {}  # id(col) -> numeric literal
        # vector(...) sources (VectorValueSource): id(marker) -> components;
        # dist/sqedist expand markers back into their component list
        self._vec_lits: dict[int, list[Column]] = {}

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expr(self) -> Column:
        kind, val = self.take()
        if kind == "num":
            c = F.lit(float(val) if ("." in val or "e" in val.lower()) else int(val))
            self._num_lits[id(c)] = float(val)
            return c
        if kind == "str":
            c = F.lit(val[1:-1])
            self._str_lits[id(c)] = val[1:-1]
            return c
        if kind != "name":
            raise ValueError(f"unexpected token {val!r}")
        if val == "NOW":
            if self.now is None:
                raise ValueError("ms(NOW,...) requires now_epoch_ms (pinned NOW)")
            c = F.lit(self.now)
            self._now_cols.add(id(c))
            return c
        nxt = self.peek()
        if nxt and nxt[0] == "lp":
            if val.lower() in _INDEX_STAT_FNS:
                return self._index_stat(val.lower())
            if val.lower() == "query":
                return self._query_source()
            if val.lower() == "ghhsin":
                return self._ghhsin()
            if val.lower() == "field":
                # FieldValueSource front door (addParser("field")): the arg
                # is a field NAME (bare or quoted), not a value source
                args = self._raw_args()
                if len(args) != 1:
                    raise ValueError("field() takes exactly one field name")
                return F.col(args[0])
            if val.lower() == "literal":
                # LiteralValueSource (ValueSourceParser.java:104-109): a
                # constant string value source
                args = self._raw_args()
                if len(args) != 1:
                    raise ValueError("literal() takes exactly one argument")
                c = F.lit(args[0])
                self._str_lits[id(c)] = args[0]
                return c
            if val.lower() == "currency":
                # ConvertedCurrencyValueSource (ValueSourceParser.java:
                # 393-407): currency(field[,CODE]) -> major-units double in
                # CODE (default: the field's default currency)
                from lucene_solr_spark.functions.currency import (
                    converted_currency_col,
                )

                args = self._raw_args()
                if not 1 <= len(args) <= 2:
                    raise ValueError("currency(field[,CODE]) takes 1..2 args")
                return converted_currency_col(
                    F.col(args[0]), args[1] if len(args) == 2 else None
                )
            if val.lower() == "boost":
                return self._boost_source()
            if val.lower() == "vector":
                return self._vector_source()
            self.take()  # (
            args: list[Column] = []
            while True:
                nxt = self.peek()
                if nxt and nxt[0] == "rp":
                    self.take()
                    break
                args.append(self.expr())
                nxt = self.peek()
                if nxt and nxt[0] == "comma":
                    self.take()
            fname = val.lower()
            if fname not in FUNCTIONS:
                raise ValueError(f"unknown function {val!r}")
            lo, hi, build = FUNCTIONS[fname]
            if not (lo <= len(args) <= hi):
                raise ValueError(f"{val} takes {lo}..{hi} args, got {len(args)}")
            if fname == "strdist" and len(args) == 3:
                # StrDistanceFunction: the 3rd arg picks the measure; only
                # 'edit' (normalized Levenshtein) is implemented — reject
                # anything else instead of silently answering with the
                # wrong measure (Solr would dispatch to e.g. JaroWinkler).
                measure = self._str_lits.get(id(args[2]))
                if measure != "edit":
                    raise ValueError(
                        "strdist: only measure 'edit' is supported, got "
                        f"{measure!r}"
                    )
            if fname == "ms":
                # timestamp args -> epoch millis; the NOW literal already is
                args = [
                    a if id(a) in self._now_cols else _to_ms(a) for a in args
                ]
            if fname in ("sqedist", "dist"):
                # expand vector(...) markers into their components — the
                # reference's MultiValueSource flattening (VectorValueSource)
                args = [
                    c for a in args for c in self._vec_lits.get(id(a), [a])
                ]
            if fname == "dist":
                # VectorDistanceFunction: the first arg is the Minkowski
                # power and must be a literal (it picks the formula)
                power = self._num_lits.get(id(args[0]))
                if power is None:
                    raise ValueError("dist: power must be a numeric literal")
                return _dist(power, args[1:])
            return build(args)
        # bare identifier -> field column
        return F.col(val)

    def _raw_args(self) -> list[str]:
        """Consume '(' raw args ')' as plain strings (for functions whose
        args are names/literals, not value sources)."""
        self.take()  # (
        out: list[str] = []
        while True:
            nxt = self.peek()
            if nxt is None:
                raise ValueError("unterminated argument list")
            if nxt[0] == "rp":
                self.take()
                return out
            if nxt[0] == "comma":
                self.take()
                continue
            kind, val = self.take()
            out.append(val[1:-1] if kind == "str" else val)

    def _query_source(self) -> Column:
        """query(subquery[,default]) (ValueSourceParser.java:274-283,
        QueryValueSource.java): the per-doc score of a nested query,
        ``default`` (0.0) for non-matching docs.  A per-doc subquery score
        is not expressible as a pure Column — the parser records the
        subquery and emits a placeholder column; callers realize it with
        ``resolve_query_sources`` (one docid left-join + coalesce per
        subquery).  The subquery is a ``$param`` deref or a quoted string
        (FunctionQParser.parseNestedQuery)."""
        args = self._raw_args()
        if not 1 <= len(args) <= 2:
            raise ValueError("query(q[,default]) takes 1..2 args")
        qstr = args[0]
        if qstr.startswith("$"):
            name = qstr[1:]
            if name not in self.params:
                raise ValueError(f"query(${name}): no request param {name!r}")
            qstr = self.params[name]
        default = float(args[1]) if len(args) == 2 else 0.0
        col = f"_qscore{len(self.subqueries)}"
        self.subqueries.append((col, qstr, default))
        return F.col(col)

    def _boost_source(self) -> Column:
        """boost(subquery, vs) (ValueSourceParser.java:286-293): a
        BoostedQuery wrapped in QueryValueSource(default=0) — per-doc
        subquery score times the value source for matching docs, 0.0
        otherwise.  The subquery score rides the same placeholder-column
        mechanism as query(); multiplying the coalesced-to-0 score keeps
        non-matching docs at 0 regardless of vs (0 * x == 0 for finite x,
        matching the reference, which never evaluates vs off-match)."""
        self._expect("lp")
        kind, val = self.take()
        if kind == "str":
            qstr = val[1:-1]
        elif kind == "dollar":
            name = val[1:]
            if name not in self.params:
                raise ValueError(f"boost(${name}): no request param {name!r}")
            qstr = self.params[name]
        else:
            raise ValueError(
                "boost(q, vs): q must be a quoted string or $param"
            )
        self._expect("comma")
        vs = self.expr()
        self._expect("rp")
        col = f"_qscore{len(self.subqueries)}"
        self.subqueries.append((col, qstr, 0.0))
        return F.col(col) * vs

    def _vector_source(self) -> Column:
        """vector(a,b,...) (ValueSourceParser.java:268-273,
        VectorValueSource): a multi-valued source consumed by dist/sqedist.
        Returns an array marker; the consumers flatten it back to its
        component columns (the marker itself is a valid array column if a
        caller projects it directly)."""
        self.take()  # (
        parts: list[Column] = []
        while True:
            nxt = self.peek()
            if nxt and nxt[0] == "rp":
                self.take()
                break
            parts.append(self.expr())
            nxt = self.peek()
            if nxt and nxt[0] == "comma":
                self.take()
        if not parts:
            raise ValueError("vector() needs at least one source")
        marker = F.array(*parts)
        self._vec_lits[id(marker)] = parts
        return marker

    def _expect(self, kind: str) -> None:
        t = self.peek()
        if t is None or t[0] != kind:
            raise ValueError(f"expected {kind}, got {t!r}")
        self.take()

    def _ghhsin(self) -> Column:
        """ghhsin(radius, gh1, gh2) (GeohashHaversineFunction.java) —
        radius is a numeric literal; each gh arg is a geohash(...) call
        (kept in cell coordinates, no base-32 rendering), a string literal
        (decoded driver-side), or a string column (bit de-interleave)."""
        from lucene_solr_spark.functions.geohash import (
            decode_quant_cols,
            ghhsin_from_quants,
            quant_of_hash,
        )

        self._expect("lp")
        radius_col = self.expr()
        radius = self._num_lits.get(id(radius_col))
        if radius is None:
            raise ValueError("ghhsin: radius must be a numeric literal")
        quants = []
        for _ in range(2):
            self._expect("comma")
            nxt = self.peek()
            if nxt and nxt[0] == "name" and nxt[1].lower() == "geohash":
                self.take()
                self._expect("lp")
                lat = self.expr()
                self._expect("comma")
                lon = self.expr()
                self._expect("rp")
                from lucene_solr_spark.functions.geohash import quant_cols

                quants.append(quant_cols(lat, lon))
            elif nxt and nxt[0] == "str":
                self.take()
                quants.append(quant_of_hash(nxt[1][1:-1]))
            else:
                quants.append(decode_quant_cols(self.expr()))
        self._expect("rp")
        return ghhsin_from_quants(radius, quants[0], quants[1])

    def _index_stat(self, fname: str) -> Column:
        """Index-statistic value sources (ValueSourceParser.java addParser
        "docfreq"/"idf"/"maxdoc"/"numdocs"/"sumtotaltermfreq"/
        "totaltermfreq"): scalar literals resolved against the index's term
        dictionary — one bounded single-term collect, the same discipline
        the BM25 scorer uses for query-term stats."""
        import math

        args = self._raw_args()
        if self.index is None:
            raise ValueError(f"{fname}() needs an index= passed to the parser")
        if fname in ("maxdoc", "numdocs"):
            # numdocs == maxdoc here: IndexTables carries no deletes (the
            # store applies delete generations before queries see docs)
            if len(args) > 0:
                raise ValueError(f"{fname} takes no arguments")
            return F.lit(int(self.index.max_doc))
        if fname in ("sumtotaltermfreq", "sttf"):
            if len(args) > 1:
                raise ValueError(f"{fname} takes at most a field argument")
            return F.lit(int(self.index.sum_total_term_freq))
        # (field, term) forms; the field names the single indexed text field
        if len(args) != 2:
            raise ValueError(f"{fname} takes (field, term), got {args}")
        term = args[1]
        row = (
            self.index.term_stats()
            .filter(F.col("term") == term)
            .collect()
        )
        df_, cf_ = (int(row[0].df), int(row[0].cf)) if row else (0, 0)
        if fname == "docfreq":
            return F.lit(df_)
        if fname in ("totaltermfreq", "ttf"):
            return F.lit(cf_)
        # idf: BM25Similarity.java:65-66, same float64 op order as the scorer
        n = self.index.max_doc
        return F.lit(math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5)))


def _geohash_encode(a: list[Column]) -> Column:
    from lucene_solr_spark.functions.geohash import geohash_encode_col

    return geohash_encode_col(a[0], a[1])


def _to_ms(c: Column) -> Column:
    """Timestamp column -> epoch milliseconds (ms() operates on date fields).

    unix_millis keeps sub-second precision (unix_timestamp truncates to
    whole seconds); the timestamp cast lifts TIMESTAMP_NTZ inputs (identity
    under the session's UTC timezone) since unix_millis rejects NTZ."""
    return F.unix_millis(c.cast("timestamp"))


def parse_function_query(
    text: str,
    now_epoch_ms: int | None = None,
    index=None,
    params: dict[str, str] | None = None,
    subqueries: list | None = None,
) -> Column:
    """Compile a Solr function-query string to a Catalyst Column.

    ``now_epoch_ms`` pins NOW for ``ms(NOW,field)`` — required for
    determinism (Solr pins NOW per request).  ``index`` (IndexTables)
    enables the index-statistic functions (docfreq/idf/maxdoc/numdocs/
    sumtotaltermfreq/totaltermfreq), which compile to scalar literals.
    ``params`` supplies request params for ``query($name)`` dereferencing;
    ``subqueries`` is the caller's accumulator for query() placeholders —
    pass a list and realize it with ``resolve_query_sources`` (query()
    without an accumulator is an error, since the column can't stand
    alone)."""
    p = _Parser(text, now_epoch_ms, index=index, params=params)
    out = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens from {p.peek()!r}")
    if p.subqueries:
        if subqueries is None:
            raise ValueError(
                "query(...) needs a subqueries accumulator + "
                "resolve_query_sources at the frame level"
            )
        subqueries.extend(p.subqueries)
    return out


def resolve_query_sources(df, index, subqueries, round_dp: int = 4):
    """Realize query() placeholders: for each recorded (col, qstr, default),
    left-join the subquery's FULL scored set on docid and coalesce misses
    to the default (QueryValueSource.java float default 0.0).

    Scale shape: each subquery is one term-pruned scored frame (the
    standard BM25 plan) joined on the docid key the caller's frame already
    carries — no new shuffle kind; the join is semi-bounded by the
    subquery's match set."""
    from lucene_solr_spark.search.bm25 import search_parsed

    for col, qstr, default in subqueries:
        sc = search_parsed(
            index, qstr, k=(1 << 31) - 1, round_dp=round_dp, ordered=False
        ).withColumnRenamed("score", col)
        df = df.join(sc, "docid", "left").withColumn(
            col, F.coalesce(F.col(col), F.lit(float(default)))
        )
    return df


def with_joindf(df, index, field: str, out: str = "joindf"):
    """``joindf(field,qfield)`` (JoinDocFreqValueSource.java:46-82): the
    doc's value of ``field`` looked up as a TERM in the index's
    dictionary; the function yields that term's docfreq, 0 when absent
    (termsEnum.seekExact miss).  The engine indexes one analyzed text
    field, so qfield is the index's own dictionary.

    Realized as a left join against the segments dictionary (term, df) —
    bounded-width vocabulary rows; AQE picks broadcast vs shuffle by
    dictionary size, and the df frame never widens beyond one int."""
    dictionary = index.segments.select(
        F.col("term").alias("__jt__"), F.col("df").alias("__jdf__")
    )
    return (
        df.join(dictionary, df[field] == F.col("__jt__"), "left")
        .withColumn(out, F.coalesce(F.col("__jdf__"), F.lit(0)))
        .drop("__jt__", "__jdf__")
    )


def with_termfreq(df, index, term: str, out: str = "termfreq"):
    """``termfreq(field,term)`` (TermFreqValueSource.java): the raw in-doc
    frequency of ``term``, 0 where absent.

    Realized as a left join against the postings of that ONE term — the
    postings side is term-pruned before the join (a predicate-pushdown scan
    at store scale), so the join ships df(term) rows, never the corpus."""
    tf = index.postings.filter(F.col("term") == term).select(
        "docid", F.col("tf").alias("__tf__")
    )
    return (
        df.join(tf, "docid", "left")
        .withColumn(out, F.coalesce(F.col("__tf__"), F.lit(0)))
        .drop("__tf__")
    )


def with_ord(df, field: str, out: str = "ord", reverse: bool = False):
    """``ord(field)`` / ``rord(field)`` (OrdFieldSource.java /
    ReverseOrdFieldSource.java): the 1-based position of the doc's value in
    the sorted unique-value list (0 for missing); rord counts from the top.

    The unique-value ranking is a window over the DISTINCT values only —
    vocabulary-sized, not corpus-sized — broadcast back against the frame.
    At extreme cardinality swap the broadcast for a sort-merge join; the
    ranking pass itself stays vocabulary-bounded either way."""
    from pyspark.sql import Window

    v = "__ordv__"
    vals = df.select(F.col(field).alias(v)).where(F.col(v).isNotNull()).distinct()
    order = F.col(v).desc() if reverse else F.col(v).asc()
    ranked = vals.withColumn(out, F.row_number().over(Window.orderBy(order)))
    return (
        df.join(F.broadcast(ranked), df[field] == ranked[v], "left")
        .withColumn(out, F.coalesce(F.col(out), F.lit(0)))
        .drop(v)
    )


def with_scale(
    df,
    source: Column,
    min_target: float,
    max_target: float,
    out: str = "scaled",
):
    """``scale(x, minTarget, maxTarget)`` (ScaleFloatFunction.java:74-115):
    rescale ``source`` over the WHOLE doc set into [minTarget, maxTarget] —
    value = (val - minSource) * scale + minTarget, where scale = 0 when the
    source range is degenerate (:109).

    The global min/max that made this an extension point for the column-only
    compiler is one tiny aggregate broadcast back against the frame — a
    map-side join, no shuffle of ``df`` and no driver collect."""
    lo, hi = "__scale_min__", "__scale_max__"  # names no doc frame carries
    bounds = df.agg(
        F.min(source).cast("double").alias(lo),
        F.max(source).cast("double").alias(hi),
    )
    scale = F.when(F.col(hi) - F.col(lo) == 0.0, F.lit(0.0)).otherwise(
        F.lit(float(max_target) - float(min_target)) / (F.col(hi) - F.col(lo))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out,
            (source.cast("double") - F.col(lo)) * scale
            + F.lit(float(min_target)),
        )
        .drop(lo, hi)
    )


def with_external_file(
    df, eff, key_col: str = "doc_id", out: str = "eff", default: float = 0.0
):
    """ExternalFileField (solr/core/src/java/org/apache/solr/schema/
    ExternalFileField.java + search/function/FileFloatSource.java): per-key
    float scores maintained OUTSIDE the index — the popularity/CTR boost
    that updates without reindexing.  ``eff`` is a (key, value) frame (the
    external_<field>.txt analog); keys missing from it take ``defVal``
    (FileFloatSource.java:66-125), values parse as float32 like the file
    format.

    Frame pass like with_joindf: one broadcast join on the key (external
    files are small next to the corpus), one coalesce — the resulting
    column drops into any function-query composition (boost, sort, frange).
    """
    e = eff.select(
        F.col("key").alias(key_col),
        F.col("value").cast("float").cast("double").alias(out),
    )
    return df.join(F.broadcast(e), key_col, "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(float(default)))
    )
