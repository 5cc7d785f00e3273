"""Lucene expressions module analog — JavaScript expressions → Catalyst.

The reference's lucene/expressions module (public Apache Lucene 4.10.5
source, studied at /root/reference/lucene/expressions/src/java/org/apache/
lucene/expressions/js/JavascriptCompiler.java and Javascript.g) compiles a
JavaScript-syntax arithmetic expression into a double-valued ValueSource
used for sorting / boosting, with variables resolved through Bindings
(score, fields, other expressions).

This module compiles the same grammar into a Catalyst ``Column``:

- operators (precedence low→high, Javascript.g): ``?:``, ``||``, ``&&``,
  ``|``, ``^``, ``&``, ``== !=``, ``< <= > >=``, ``<< >> >>>``, ``+ -``,
  ``* / %``, unary ``+ - ! ~``, calls, parens.
- everything is double; comparisons/logicals yield 1.0/0.0 (the compiler
  pushes double 0/1, JavascriptCompiler.java:338-360); bitwise operators
  truncate operands to long and widen the result back to double
  (:333-336, 418-422); ``%`` is Java's IEEE remainder-with-dividend-sign,
  which Spark's double ``%`` matches.
- the DEFAULT_FUNCTIONS table (JavascriptCompiler.properties): abs acos
  acosh asin asinh atan atan2 atanh ceil cos cosh exp floor haversin ln
  log10 logn max min pow sin sinh sqrt tan tanh.  ``haversin`` maps to the
  engine's shared great-circle km formula (functions/value_sources
  ``_haversine`` over the mean earth radius) — the reference's SloppyMath
  uses a latitude-dependent diameter and table-driven cos approximation
  whose bit pattern is a performance hack, not a semantic contract; the
  divergence is documented here and the function is kept out of
  hash-graded rows.
- numeric literals: decimal (int or fraction/exponent), hex ``0x``, octal
  ``0`` prefix (Javascript.g NUMBER).

Variables are resolved through a bindings mapping (name → Column); bare
names absent from the bindings resolve to ``F.col(name).cast("double")`` —
the SimpleBindings field-to-DoubleValues convention.

Scale shape: compilation happens once on the driver; the output is a pure
codegen Column (no UDF, no shuffle) that rides whatever frame it is
attached to — exactly the ValueSource discipline of the function-query
registry.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from lucene_solr_spark.functions.value_sources import _haversine

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>0[xX][0-9a-fA-F]+|(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_$][A-Za-z0-9_$]*(?:\.[A-Za-z_$][A-Za-z0-9_$]*)*)"
    r"|(?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()<>?,:~!&^|])"
    r")"
)

_FUNCTIONS = {
    "abs": (1, lambda a: F.abs(a[0])),
    "acos": (1, lambda a: F.acos(a[0])),
    "acosh": (1, lambda a: F.log(a[0] + F.sqrt(a[0] * a[0] - 1.0))),
    "asin": (1, lambda a: F.asin(a[0])),
    "asinh": (1, lambda a: F.log(a[0] + F.sqrt(a[0] * a[0] + 1.0))),
    "atan": (1, lambda a: F.atan(a[0])),
    "atan2": (2, lambda a: F.atan2(a[0], a[1])),
    "atanh": (1, lambda a: F.lit(0.5) * F.log((F.lit(1.0) + a[0]) / (F.lit(1.0) - a[0]))),
    "ceil": (1, lambda a: F.ceil(a[0]).cast("double")),
    "cos": (1, lambda a: F.cos(a[0])),
    "cosh": (1, lambda a: F.cosh(a[0])),
    "exp": (1, lambda a: F.exp(a[0])),
    "floor": (1, lambda a: F.floor(a[0]).cast("double")),
    "haversin": (4, lambda a: _haversine(
        F.radians(a[0]), F.radians(a[1]), F.radians(a[2]), F.radians(a[3])
    ) * F.lit(6371.0087714)),
    "ln": (1, lambda a: F.log(a[0])),
    "log10": (1, lambda a: F.log10(a[0])),
    # MathUtil.log(base, x) = ln(x) / ln(base)
    "logn": (2, lambda a: F.log(a[1]) / F.log(a[0])),
    "max": (2, lambda a: F.greatest(a[0], a[1])),
    "min": (2, lambda a: F.least(a[0], a[1])),
    "pow": (2, lambda a: F.pow(a[0], a[1])),
    "sin": (1, lambda a: F.sin(a[0])),
    "sinh": (1, lambda a: F.sinh(a[0])),
    "sqrt": (1, lambda a: F.sqrt(a[0])),
    "tan": (1, lambda a: F.tan(a[0])),
    "tanh": (1, lambda a: F.tanh(a[0])),
}


def _bool(c: Column) -> Column:
    return c != F.lit(0.0)


def _num(c: Column) -> Column:
    return F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))


class _Parser:
    def __init__(self, src: str, bindings: dict[str, Column]):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(src):
            m = _TOKEN_RE.match(src, pos)
            if not m or m.end() == pos:
                if src[pos:].strip():
                    raise ValueError(f"unparsable expression at: {src[pos:]!r}")
                break
            pos = m.end()
            for kind in ("num", "name", "op"):
                if m.group(kind) is not None:
                    self.toks.append((kind, m.group(kind)))
                    break
        self.i = 0
        self.bindings = bindings

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, val: str | None = None) -> tuple[str, str]:
        tok = self.peek()
        if tok is None or (val is not None and tok[1] != val):
            raise ValueError(f"expected {val!r}, got {tok!r}")
        self.i += 1
        return tok

    # precedence climbing, lowest first (Javascript.g rule order)
    def parse(self) -> Column:
        out = self.ternary()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]!r}")
        return out

    def ternary(self) -> Column:
        cond = self.logical_or()
        if self.peek() and self.peek()[1] == "?":
            self.eat("?")
            a = self.ternary()
            self.eat(":")
            b = self.ternary()
            return F.when(_bool(cond), a).otherwise(b)
        return cond

    def _binary(self, sub, ops: dict[str, object]) -> Column:
        left = sub()
        while self.peek() and self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.eat()[1]
            right = sub()
            left = ops[op](left, right)  # type: ignore[operator]
        return left

    def logical_or(self):
        return self._binary(
            self.logical_and,
            {"||": lambda a, b: _num(_bool(a) | _bool(b))},
        )

    def logical_and(self):
        return self._binary(
            self.bit_or, {"&&": lambda a, b: _num(_bool(a) & _bool(b))}
        )

    def bit_or(self):
        return self._binary(
            self.bit_xor,
            {"|": lambda a, b: (a.cast("long").bitwiseOR(b.cast("long"))).cast("double")},
        )

    def bit_xor(self):
        return self._binary(
            self.bit_and,
            {"^": lambda a, b: (a.cast("long").bitwiseXOR(b.cast("long"))).cast("double")},
        )

    def bit_and(self):
        return self._binary(
            self.equality,
            {"&": lambda a, b: (a.cast("long").bitwiseAND(b.cast("long"))).cast("double")},
        )

    def equality(self):
        return self._binary(
            self.relational,
            {"==": lambda a, b: _num(a == b), "!=": lambda a, b: _num(a != b)},
        )

    def relational(self):
        return self._binary(
            self.shift,
            {
                "<": lambda a, b: _num(a < b),
                "<=": lambda a, b: _num(a <= b),
                ">": lambda a, b: _num(a > b),
                ">=": lambda a, b: _num(a >= b),
            },
        )

    def shift(self):
        return self._binary(
            self.additive,
            {
                # the F.shift* wrappers require a literal int count; the SQL
                # functions accept a column count
                "<<": lambda a, b: F.call_function(
                    "shiftleft", a.cast("long"), b.cast("int")
                ).cast("double"),
                ">>": lambda a, b: F.call_function(
                    "shiftright", a.cast("long"), b.cast("int")
                ).cast("double"),
                ">>>": lambda a, b: F.call_function(
                    "shiftrightunsigned", a.cast("long"), b.cast("int")
                ).cast("double"),
            },
        )

    def additive(self):
        return self._binary(
            self.multiplicative,
            {"+": lambda a, b: a + b, "-": lambda a, b: a - b},
        )

    def multiplicative(self):
        return self._binary(
            self.unary,
            {
                "*": lambda a, b: a * b,
                "/": lambda a, b: a / b,
                "%": lambda a, b: a % b,
            },
        )

    def unary(self) -> Column:
        tok = self.peek()
        if tok and tok[0] == "op":
            if tok[1] == "-":
                self.eat()
                return -self.unary()
            if tok[1] == "+":
                self.eat()
                return self.unary()
            if tok[1] == "!":
                self.eat()
                return _num(~_bool(self.unary()))
            if tok[1] == "~":
                self.eat()
                return self.unary().cast("long").bitwiseXOR(F.lit(-1)).cast("double")
        return self.primary()

    def primary(self) -> Column:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of expression")
        kind, val = tok
        if kind == "num":
            self.eat()
            if val.lower().startswith("0x"):
                return F.lit(float(int(val, 16)))
            if re.fullmatch(r"0[0-7]+", val):
                return F.lit(float(int(val, 8)))  # octal (Javascript.g)
            return F.lit(float(val))
        if kind == "name":
            self.eat()
            nxt = self.peek()
            if nxt and nxt[1] == "(":
                if val not in _FUNCTIONS:
                    raise ValueError(f"unknown function {val!r}")
                arity, fn = _FUNCTIONS[val]
                self.eat("(")
                args = [self.ternary()]
                while self.peek() and self.peek()[1] == ",":
                    self.eat(",")
                    args.append(self.ternary())
                self.eat(")")
                if len(args) != arity:
                    raise ValueError(
                        f"{val} expects {arity} args, got {len(args)}"
                    )
                return fn(args)
            if val in self.bindings:
                return self.bindings[val]
            return F.col(val).cast("double")
        if val == "(":
            self.eat("(")
            inner = self.ternary()
            self.eat(")")
            return inner
        raise ValueError(f"unexpected token {tok!r}")


def compile_expression(src: str, bindings: dict[str, Column] | None = None) -> Column:
    """Compile a lucene/expressions JavaScript expression to a Column."""
    return _Parser(src, bindings or {}).parse()
