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
  collect).  ``ord``/``rord``/``query($q)`` are omitted: ordinal functions
  are index-internal (obsolete under columnar storage).

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
      | (?P<str>"[^"]*")
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
    "atan2": (2, 2, lambda a: F.atan2(a[0], a[1])),
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
    # date: ms(a[,b]) in milliseconds (DateValueSourceParser)
    "ms": (1, 2, lambda a: (a[0] - a[1]) if len(a) == 2 else a[0]),
    # string distance (StrDistanceFunction, 'edit' == normalized Levenshtein)
    "strdist": (2, 3, lambda a: _lev_sim(a[0], a[1])),
}


def _chain(args: list[Column], op) -> Column:
    out = args[0]
    for x in args[1:]:
        out = op(out, x)
    return out


class _Parser:
    def __init__(self, text: str, now_epoch_ms: int | None):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if not m or m.end() == m.start():
                raise ValueError(f"bad function query at {text[pos:pos+20]!r}")
            for kind in ("num", "name", "str", "lp", "rp", "comma"):
                if m.group(kind) is not None:
                    self.toks.append((kind, m.group(kind)))
                    break
            pos = m.end()
        self.i = 0
        self.now = now_epoch_ms
        self._now_cols: set[int] = set()  # id()s of NOW literal columns
        self._str_lits: dict[int, str] = {}  # id(col) -> raw string literal

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expr(self) -> Column:
        kind, val = self.take()
        if kind == "num":
            return F.lit(float(val) if ("." in val or "e" in val.lower()) else int(val))
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
            return build(args)
        # bare identifier -> field column
        return F.col(val)


def _to_ms(c: Column) -> Column:
    """Timestamp column -> epoch milliseconds (ms() operates on date fields).

    unix_millis keeps sub-second precision (unix_timestamp truncates to
    whole seconds); the timestamp cast lifts TIMESTAMP_NTZ inputs (identity
    under the session's UTC timezone) since unix_millis rejects NTZ."""
    return F.unix_millis(c.cast("timestamp"))


def parse_function_query(text: str, now_epoch_ms: int | None = None) -> Column:
    """Compile a Solr function-query string to a Catalyst Column.

    ``now_epoch_ms`` pins NOW for ``ms(NOW,field)`` — required for
    determinism (Solr pins NOW per request)."""
    p = _Parser(text, now_epoch_ms)
    out = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens from {p.peek()!r}")
    return out


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
