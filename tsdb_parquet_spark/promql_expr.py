"""PromQL expression frontend: parse + evaluate a practical subset of the
language over the wide tsdb layout.

The reference names the Thanos PromQL engine as its end goal
(``/root/reference/README.md:9``) but ships only hand-built matchers
(``hello.go:517``).  ``matchers.parse_selector`` covers the selector
syntax; ``promql.py`` the evaluation primitives; this module is the glue:
a tokenizer + recursive-descent parser producing a tiny AST, and an
evaluator that composes the primitives into ONE Spark plan per expression
(instant) or one plan per range query — never a per-step or per-node job.

Grammar (the working subset)::

    expr      := term (('+'|'-') on? term)*        # vector/scalar arith
    term      := unary (('*'|'/') on? unary)*
    on        := 'on' '(' labels ')'               # explicit vector matching
    unary     := number | call | aggregate | selector_expr | '(' expr ')'
    call      := FUNC '(' expr '[' duration ']' ')'        # range function
               | 'topk' '(' number ',' expr ')'
               | 'histogram_quantile' '(' number ',' expr ')'
               | SCALAR_FN '(' expr (',' number)* ')'      # abs/clamp/...
    aggregate := OP (('by'|'without') '(' labels ')')? '(' expr ')'
    selector  := (metric? '{' matchers '}' | metric) ('offset' duration)?

Range functions: rate, increase, avg/min/max/sum/count/last_over_time,
delta.  Aggregations: sum, avg, min, max, count.  Binary ops between two
vectors match on the intersection of their label columns (PromQL's
default one-to-one matching on all shared labels); scalar-vector ops
broadcast the scalar.

Evaluation semantics: every vector node evaluates to a DataFrame of
(labels…, value) at one instant ``at_ms`` (with the 5-min
lookback/staleness rule), or (labels…, step_ts, value) over a grid via
``eval_range`` — the composition rules are identical, so one AST serves
both, exactly like a PromQL engine's instant vs range entry points.

Scale: parsing is driver-side string work on a sub-KB expression; the
produced plan is whatever the composed primitives plan (selector pushdown
into the scan, one agg per rollup, bounded explodes for grids).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .matchers import Matcher, apply_matchers, parse_selector
from .timeseries import TIME_COL, VALUE_COL, label_columns

_RANGE_FNS = {
    "rate", "increase", "delta",
    "avg_over_time", "min_over_time", "max_over_time",
    "sum_over_time", "count_over_time", "last_over_time",
}
_AGG_OPS = {"sum", "avg", "min", "max", "count"}
# instant-vector scalar functions: value-wise, labels unchanged
_SCALAR_FNS = {
    "abs": lambda v, args: F.abs(v),
    "ceil": lambda v, args: F.ceil(v).cast("double"),
    "floor": lambda v, args: F.floor(v).cast("double"),
    "sqrt": lambda v, args: F.sqrt(v),
    "exp": lambda v, args: F.exp(v),
    "ln": lambda v, args: F.log(v),
    "clamp_min": lambda v, args: F.greatest(v, F.lit(args[0])),
    "clamp_max": lambda v, args: F.least(v, F.lit(args[0])),
    "clamp": lambda v, args: F.least(F.greatest(v, F.lit(args[0])), F.lit(args[1])),
}

_DURATION_RE = re.compile(r"^(\d+)(ms|s|m|h|d|w)$")
_DURATION_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
                "d": 86_400_000, "w": 604_800_000}


def parse_duration_ms(s: str) -> int:
    m = _DURATION_RE.match(s)
    if not m:
        raise ValueError(f"bad duration {s!r}")
    return int(m.group(1)) * _DURATION_MS[m.group(2)]


# ---------------------------------------------------------------------------
# AST

@dataclass
class Node:
    pass


@dataclass
class Scalar(Node):
    value: float


@dataclass
class Selector(Node):
    matchers: list[Matcher] = field(default_factory=list)
    offset_ms: int = 0  # `offset 5m` time-shift modifier


@dataclass
class RangeFn(Node):
    fn: str
    arg: Selector
    window_ms: int


@dataclass
class Agg(Node):
    op: str
    by: list[str]
    arg: Node
    without: bool = False


@dataclass
class TopK(Node):
    k: int
    arg: Node


@dataclass
class BinOp(Node):
    op: str
    left: Node
    right: Node
    on: list[str] = field(default_factory=list)  # `on (labels)` matching


@dataclass
class ScalarFn(Node):
    fn: str
    arg: Node
    args: list[float] = field(default_factory=list)


@dataclass
class HistogramQuantile(Node):
    q: float
    arg: Node


# ---------------------------------------------------------------------------
# tokenizer + recursive descent

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<number>\d+\.\d+|\d+(?!\w))          |
        (?P<duration>\d+(?:ms|s|m|h|d|w))       |
        (?P<ident>[a-zA-Z_:][a-zA-Z0-9_:]*)     |
        (?P<brace>\{(?:[^"}]|"(?:[^"\\]|\\.)*")*\}) |
        (?P<op>[-+*/(),\[\]])
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {s[pos:]!r}")
        for kind in ("duration", "number", "ident", "brace", "op"):
            if m.group(kind):
                out.append((kind, m.group(kind)))
                break
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], metric_label: str):
        self.toks = tokens
        self.i = 0
        self.metric_label = metric_label

    def peek(self, k: int = 0) -> Optional[tuple[str, str]]:
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def eat(self, want: str | None = None) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of expression")
        kind, val = self.toks[self.i]
        if want is not None and val != want and kind != want:
            raise ValueError(f"expected {want!r}, got {val!r}")
        self.i += 1
        return kind, val

    def parse(self) -> Node:
        node = self.expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def _on_clause(self) -> list[str]:
        if not (self.peek() and self.peek()[1] == "on"):
            return []
        self.eat("on")
        self.eat("(")
        out: list[str] = []
        while self.peek() and self.peek()[1] != ")":
            out.append(self.eat("ident")[1])
            if self.peek() and self.peek()[1] == ",":
                self.eat(",")
        self.eat(")")
        return out

    def expr(self) -> Node:
        node = self.term()
        while self.peek() and self.peek()[1] in ("+", "-"):
            op = self.eat()[1]
            on = self._on_clause()
            node = BinOp(op, node, self.term(), on)
        return node

    def term(self) -> Node:
        node = self.unary()
        while self.peek() and self.peek()[1] in ("*", "/"):
            op = self.eat()[1]
            on = self._on_clause()
            node = BinOp(op, node, self.unary(), on)
        return node

    def unary(self) -> Node:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of expression")
        kind, val = tok
        if val == "(":
            self.eat("(")
            node = self.expr()
            self.eat(")")
            return node
        if kind == "number":
            self.eat()
            return Scalar(float(val))
        if kind == "ident":
            if val in _RANGE_FNS:
                return self.range_fn()
            if val == "topk":
                return self.topk()
            if val == "histogram_quantile":
                return self.histogram_quantile()
            if val in _SCALAR_FNS and self.peek(1) and self.peek(1)[1] == "(":
                return self.scalar_fn()
            if val in _AGG_OPS and self.peek(1) and self.peek(1)[1] in ("by", "without", "("):
                return self.aggregate()
            return self.selector()
        if kind == "brace":
            return self.selector()
        raise ValueError(f"unexpected token {val!r}")

    def selector(self) -> Selector:
        parts = []
        kind, val = self.peek()
        if kind == "ident":
            parts.append(self.eat()[1])
        if self.peek() and self.peek()[0] == "brace":
            parts.append(self.eat()[1])
        if not parts:
            raise ValueError("empty selector")
        offset_ms = 0
        if self.peek() and self.peek()[1] == "offset":
            self.eat("offset")
            offset_ms = parse_duration_ms(self.eat("duration")[1])
        return Selector(parse_selector("".join(parts), self.metric_label), offset_ms)

    def range_fn(self) -> RangeFn:
        fn = self.eat()[1]
        self.eat("(")
        sel = self.selector()
        self.eat("[")
        dur = self.eat("duration")[1]
        self.eat("]")
        # PromQL places `offset` after the range: rate(m[5m] offset 1h)
        if self.peek() and self.peek()[1] == "offset":
            self.eat("offset")
            sel.offset_ms = parse_duration_ms(self.eat("duration")[1])
        self.eat(")")
        return RangeFn(fn, sel, parse_duration_ms(dur))

    def aggregate(self) -> Agg:
        op = self.eat()[1]
        by: list[str] = []
        without = False
        if self.peek() and self.peek()[1] in ("by", "without"):
            without = self.eat()[1] == "without"
            self.eat("(")
            while self.peek() and self.peek()[1] != ")":
                by.append(self.eat("ident")[1])
                if self.peek() and self.peek()[1] == ",":
                    self.eat(",")
            self.eat(")")
        self.eat("(")
        arg = self.expr()
        self.eat(")")
        return Agg(op, by, arg, without)

    def scalar_fn(self) -> ScalarFn:
        fn = self.eat()[1]
        self.eat("(")
        arg = self.expr()
        args: list[float] = []
        while self.peek() and self.peek()[1] == ",":
            self.eat(",")
            args.append(float(self.eat("number")[1]))
        self.eat(")")
        want = {"clamp_min": 1, "clamp_max": 1, "clamp": 2}.get(fn, 0)
        if len(args) != want:
            raise ValueError(f"{fn} takes {want} numeric arg(s), got {len(args)}")
        return ScalarFn(fn, arg, args)

    def topk(self) -> TopK:
        self.eat("topk")
        self.eat("(")
        k = int(float(self.eat("number")[1]))
        self.eat(",")
        arg = self.expr()
        self.eat(")")
        return TopK(k, arg)

    def histogram_quantile(self) -> HistogramQuantile:
        self.eat("histogram_quantile")
        self.eat("(")
        q = float(self.eat("number")[1])
        self.eat(",")
        arg = self.expr()
        self.eat(")")
        return HistogramQuantile(q, arg)


def parse_expr(expr: str, metric_label: str = "name") -> Node:
    """Parse a PromQL expression string into the module AST."""
    return _Parser(_tokenize(expr), metric_label).parse()


# ---------------------------------------------------------------------------
# evaluator

class PromQLEngine:
    """Evaluate parsed expressions against a wide-layout tsdb DataFrame.

    ``eval_instant(expr, at_ms)`` → DataFrame (labels…, value).
    ``eval_range(expr, start, end, step)`` → (labels…, step_ts, value) —
    every node evaluates gridded, so composition needs no per-step loop.
    """

    def __init__(self, df: DataFrame, metric_label: str = "name",
                 staleness_ms: int = 300_000):
        self.df = df
        self.metric_label = metric_label
        self.staleness_ms = staleness_ms

    # -- instant ----------------------------------------------------------

    def eval_instant(self, expr: str | Node, at_ms: int) -> DataFrame:
        node = parse_expr(expr, self.metric_label) if isinstance(expr, str) else expr
        out = self._inst(node, at_ms)
        if not isinstance(out, DataFrame):
            raise ValueError("expression is a scalar; instant vectors only")
        return out

    def _inst(self, node: Node, at: int):
        from . import promql

        if isinstance(node, Scalar):
            return node.value
        if isinstance(node, Selector):
            sel = apply_matchers(self.df, node.matchers)
            iv = promql.instant_vector(
                sel, at - node.offset_ms, staleness_ms=self.staleness_ms
            ).drop("sample_time")
            return iv
        if isinstance(node, RangeFn):
            sel = apply_matchers(self.df, node.arg.matchers)
            at_eff = at - node.arg.offset_ms
            w = sel.filter(
                (F.col(TIME_COL) <= at_eff)
                & (F.col(TIME_COL) > at_eff - node.window_ms)
            )
            labels = label_columns(w)
            return self._range_fn_agg(node, w, labels, [])
        if isinstance(node, Agg):
            arg = self._inst(node.arg, at)
            by = self._agg_keys(arg, node)
            v = F.col(VALUE_COL)
            exprs = {
                "sum": F.sum(v.cast("decimal(28,6)")).cast("double"),
                "avg": (F.sum(v.cast("decimal(28,6)")).cast("double") / F.count(v)),
                "min": F.min(v),
                "max": F.max(v),
                "count": F.count(F.lit(1)).cast("double"),
            }
            return arg.groupBy(*by).agg(exprs[node.op].alias(VALUE_COL))
        if isinstance(node, TopK):
            arg = self._inst(node.arg, at)
            labels = [c for c in arg.columns if c != VALUE_COL]
            order = [F.desc(VALUE_COL)] + [F.asc_nulls_first(c) for c in labels]
            return arg.orderBy(*order).limit(node.k)
        if isinstance(node, ScalarFn):
            arg = self._inst(node.arg, at)
            return arg.withColumn(
                VALUE_COL, _SCALAR_FNS[node.fn](F.col(VALUE_COL), node.args)
            )
        if isinstance(node, HistogramQuantile):
            from .promql import histogram_quantile

            arg = self._inst(node.arg, at)
            if "label_le" not in arg.columns:
                raise ValueError("histogram_quantile needs a label_le column")
            labels = [c for c in arg.columns if c not in (VALUE_COL, "label_le")]
            return histogram_quantile(arg, node.q, labels, time_col=None).withColumnRenamed(
                "quantile", VALUE_COL
            )
        if isinstance(node, BinOp):
            return self._binop(node, self._inst(node.left, at), self._inst(node.right, at), [])
        raise TypeError(f"unknown node {node!r}")

    # -- range ------------------------------------------------------------

    def eval_range(self, expr: str | Node, start_ms: int, end_ms: int,
                   step_ms: int) -> DataFrame:
        node = parse_expr(expr, self.metric_label) if isinstance(expr, str) else expr
        out = self._rng(node, start_ms, end_ms, step_ms)
        if not isinstance(out, DataFrame):
            raise ValueError("expression is a scalar; range vectors only")
        return out

    def _rng(self, node: Node, start: int, end: int, step: int):
        from . import promql

        if isinstance(node, Scalar):
            return node.value
        if isinstance(node, Selector):
            sel = apply_matchers(self.df, node.matchers)
            off = node.offset_ms
            out = promql.range_query(
                sel, start - off, end - off, step, staleness_ms=self.staleness_ms
            ).drop("sample_time")
            return self._shift_steps(out, off)
        if isinstance(node, RangeFn):
            sel = apply_matchers(self.df, node.arg.matchers)
            labels = label_columns(sel)
            off = node.arg.offset_ms
            if node.fn in ("rate", "increase"):
                rr = promql.range_rate(
                    sel, start - off, end - off, step, node.window_ms, labels
                )
                keep = "rate" if node.fn == "rate" else "increase"
                out = rr.select(*labels, "step_ts", F.col(keep).alias(VALUE_COL))
            else:
                out = self._over_time_grid(
                    node, sel, labels, start - off, end - off, step
                )
            return self._shift_steps(out, off)
        if isinstance(node, Agg):
            arg = self._rng(node.arg, start, end, step)
            by = self._agg_keys(arg, node, keep=("step_ts",))
            v = F.col(VALUE_COL)
            exprs = {
                "sum": F.sum(v.cast("decimal(28,6)")).cast("double"),
                "avg": (F.sum(v.cast("decimal(28,6)")).cast("double") / F.count(v)),
                "min": F.min(v),
                "max": F.max(v),
                "count": F.count(F.lit(1)).cast("double"),
            }
            return arg.groupBy("step_ts", *by).agg(exprs[node.op].alias(VALUE_COL))
        if isinstance(node, TopK):
            from pyspark.sql import Window

            arg = self._rng(node.arg, start, end, step)
            labels = [c for c in arg.columns if c not in (VALUE_COL, "step_ts")]
            w = Window.partitionBy("step_ts").orderBy(
                F.desc(VALUE_COL), *[F.asc_nulls_first(c) for c in labels]
            )
            return (
                arg.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= node.k)
                .drop("_rk")
            )
        if isinstance(node, ScalarFn):
            arg = self._rng(node.arg, start, end, step)
            return arg.withColumn(
                VALUE_COL, _SCALAR_FNS[node.fn](F.col(VALUE_COL), node.args)
            )
        if isinstance(node, HistogramQuantile):
            from .promql import histogram_quantile

            arg = self._rng(node.arg, start, end, step)
            if "label_le" not in arg.columns:
                raise ValueError("histogram_quantile needs a label_le column")
            labels = [c for c in arg.columns
                      if c not in (VALUE_COL, "label_le", "step_ts")]
            return histogram_quantile(
                arg, node.q, labels, time_col="step_ts"
            ).withColumnRenamed("quantile", VALUE_COL)
        if isinstance(node, BinOp):
            return self._binop(
                node,
                self._rng(node.left, start, end, step),
                self._rng(node.right, start, end, step),
                ["step_ts"],
            )
        raise TypeError(f"unknown node {node!r}")

    # -- shared helpers ---------------------------------------------------

    @staticmethod
    def _shift_steps(df: DataFrame, offset_ms: int) -> DataFrame:
        """Map an offset-evaluated grid back onto the caller's step axis
        (`m offset 1h` at step T reports under T, evaluated at T - 1h)."""
        if not offset_ms:
            return df
        return df.withColumn("step_ts", F.col("step_ts") + F.lit(offset_ms))

    def _agg_keys(self, arg: DataFrame, node: Agg, keep: tuple[str, ...] = ()) -> list[str]:
        """Grouping keys for by(...) / without(...) aggregation over the
        evaluated vector.  ``keep`` = non-label framework columns
        (step_ts) that stay grouping keys regardless."""
        if not node.without:
            return [self._label_col(arg, l) for l in node.by]
        dropped = set()
        for l in node.by:
            try:
                dropped.add(self._label_col(arg, l))
            except ValueError:
                pass  # `without` on an absent label is a no-op
        return [
            c for c in arg.columns
            if c not in (VALUE_COL, *keep) and c not in dropped
        ]

    def _label_col(self, df: DataFrame, label: str) -> str:
        wide = f"label_{label}"
        if wide in df.columns:
            return wide
        if label in df.columns:
            return label
        raise ValueError(f"unknown grouping label {label!r} in {df.columns}")

    def _range_fn_agg(self, node: RangeFn, w: DataFrame, labels: list[str],
                      extra_keys: list[str]) -> DataFrame:
        """Whole-window (instant) evaluation of a range function."""
        v = F.col(VALUE_COL)
        if node.fn in ("rate", "increase"):
            from .timeseries import counter_rate

            cr = counter_rate(w, labels)
            keep = "rate" if node.fn == "rate" else "increase"
            return cr.select(*labels, F.col(keep).alias(VALUE_COL))
        fn = node.fn.removesuffix("_over_time") if node.fn.endswith("_over_time") else node.fn
        exprs = {
            "avg": (F.sum(v.cast("decimal(28,6)")).cast("double") / F.count(v)),
            "min": F.min(v),
            "max": F.max(v),
            "sum": F.sum(v.cast("decimal(28,6)")).cast("double"),
            "count": F.count(F.lit(1)).cast("double"),
            "last": F.max_by(v, F.col(TIME_COL)),
            "delta": F.max_by(v, F.col(TIME_COL)) - F.min_by(v, F.col(TIME_COL)),
        }
        return w.groupBy(*labels, *extra_keys).agg(exprs[fn].alias(VALUE_COL))

    def _over_time_grid(self, node: RangeFn, sel: DataFrame, labels: list[str],
                        start: int, end: int, step: int) -> DataFrame:
        """<fn>_over_time / delta over a grid: same bounded explode as
        promql.range_query, with the window = the function's range."""
        n_steps = (end - start) // step
        t = F.col(TIME_COL)
        k_min = F.greatest(F.lit(0), F.ceil((t - F.lit(start)) / F.lit(step)).cast("bigint"))
        k_max = F.least(
            F.lit(n_steps),
            F.floor((t + F.lit(node.window_ms - 1) - F.lit(start)) / F.lit(step)).cast("bigint"),
        )
        exploded = (
            sel.filter((t <= end) & (t > start - node.window_ms))
            .filter(k_min <= k_max)
            .withColumn("_k", F.explode(F.sequence(k_min, k_max)))
            .withColumn("step_ts", F.lit(start) + F.col("_k") * F.lit(step))
        )
        return self._range_fn_agg(node, exploded, labels, ["step_ts"]).select(
            *labels, "step_ts", VALUE_COL
        )

    def _binop(self, node: BinOp, left, right, extra_keys: list[str]):
        ops = {
            "+": lambda a, b: a + b,
            "-": lambda a, b: a - b,
            "*": lambda a, b: a * b,
            "/": lambda a, b: F.when(b != 0, a / b),
        }
        op = ops[node.op]
        if not isinstance(left, DataFrame) and not isinstance(right, DataFrame):
            raise ValueError("scalar-scalar expressions are not vectors")
        if not isinstance(left, DataFrame):
            return right.withColumn(VALUE_COL, op(F.lit(left), F.col(VALUE_COL)))
        if not isinstance(right, DataFrame):
            return left.withColumn(VALUE_COL, op(F.col(VALUE_COL), F.lit(right)))
        # vector-vector: match on `on (labels)` when given, else the
        # intersection of label columns; keep the LEFT side's full label
        # set — the many-to-one (`group_left`-like) semantics
        # `v / sum by (x)(v)` needs.  Framework keys (step_ts) always join.
        if node.on:
            keys = [self._label_col(left, l) for l in node.on] + list(extra_keys)
        else:
            keys = [c for c in left.columns
                    if c in right.columns and c != VALUE_COL]
        if not keys:
            raise ValueError("no shared labels to match on")
        keep = [c for c in left.columns if c != VALUE_COL]
        l = left.withColumnRenamed(VALUE_COL, "_lv")
        r = right.select(*keys, F.col(VALUE_COL).alias("_rv"))
        return l.join(r, keys).select(
            *keep, op(F.col("_lv"), F.col("_rv")).alias(VALUE_COL)
        )


def query_instant(spark_df: DataFrame, expr: str, at_ms: int,
                  metric_label: str = "name") -> DataFrame:
    """One-shot instant query: ``query_instant(tsdb, 'sum by (handler) (...)', T)``."""
    return PromQLEngine(spark_df, metric_label).eval_instant(expr, at_ms)


def query_range(spark_df: DataFrame, expr: str, start_ms: int, end_ms: int,
                step_ms: int, metric_label: str = "name") -> DataFrame:
    """One-shot range query — the Prometheus ``query_range`` API shape."""
    return PromQLEngine(spark_df, metric_label).eval_range(
        expr, start_ms, end_ms, step_ms
    )


_ = SparkSession  # typing reference only
