"""Prometheus label-matcher compiler → Spark ``Column`` predicates.

This is the engine's query-language frontend, the PySpark counterpart of the
reference's ``promMatchersToFrostDBExprs`` (``/root/reference/hello.go:302-318``),
which translates the four Prometheus matcher types into engine expressions:

- ``=``   equality        → ``Col(name).Eq(Literal(v))``      (hello.go:306-307)
- ``!=``  not-equal       → ``Col(name).NotEq(Literal(v))``   (hello.go:308-309)
- ``=~``  regex           → ``Col(name).RegexMatch(v)``       (hello.go:310-311)
- ``!~``  negated regex   → ``Col(name).RegexNotMatch(v)``    (hello.go:312-313)

and AND-combines them (hello.go:317).

Semantics notes (SURVEY.md §2.1 R10-R12):

- The reference's ``!=`` / ``!~`` inherit SQL three-valued logic from the
  underlying engine: a NULL label value makes the predicate NULL and the row
  is dropped.  Real Prometheus treats an absent label as the empty string, so
  ``label != "v"`` *matches* series without the label.  Both behaviors are
  real query semantics a user may want, so the compiler exposes
  ``null_semantics``: ``"sql"`` (reference behavior, 3VL) or ``"prometheus"``
  (NULL label counts as a non-match of the positive form, i.e. negative
  matchers keep NULL rows).
- The reference forwards regex patterns **unanchored** to the engine
  (hello.go:310-311) even though Prometheus itself anchors ``^(?:...)$``
  internally before matchers reach storage.  We anchor by default
  (``anchored=True``) for Prometheus parity; pass ``anchored=False`` for the
  reference's literal behavior.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MatchType = Literal["=", "!=", "=~", "!~"]
NullSemantics = Literal["sql", "prometheus"]


@dataclass(frozen=True)
class Matcher:
    """One Prometheus label matcher, e.g. ``Matcher("=", "job", "prometheus")``."""

    op: MatchType
    name: str
    value: str


_SELECTOR_RE = re.compile(
    r'\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*(=~|!~|!=|=)\s*"((?:[^"\\]|\\.)*)"\s*'
)


_ESCAPES = {"\\": "\\", '"': '"', "n": "\n", "t": "\t", "r": "\r"}


def _unescape(s: str) -> str:
    """Decode PromQL string escapes (``\\\\ \\" \\n \\t \\r``) on an
    already-unicode string.  NOT ``unicode_escape`` — that round-trips
    through latin-1 and mangles non-ASCII label values (``café`` →
    ``cafÃ©``), silently matching nothing.  Unknown escapes pass through
    verbatim (Prometheus raises; lenient pass-through keeps the previous
    permissive behavior for e.g. regex ``\\d`` typed in a quoted value).
    """
    return re.sub(
        r"\\(.)", lambda m: _ESCAPES.get(m.group(1), "\\" + m.group(1)), s
    )


def parse_selector(selector: str, metric_label: str = "name") -> list[Matcher]:
    """Parse a PromQL-style instant-vector selector into matchers — the
    query-language frontend seed the reference stops short of (its stated
    end goal is a PromQL engine, ``README.md:9``; its matchers are
    hand-built at ``hello.go:517``).

    Accepts ``metric{name="v",n2=~"re"}``, bare ``metric``, or a bare
    ``{...}`` matcher block.  The metric name desugars to an equality
    matcher on ``metric_label`` (Prometheus's ``__name__``; this engine's
    fixture stores it as the ``name`` label, hence the default).
    """
    s = selector.strip()
    out: list[Matcher] = []
    brace = s.find("{")
    if brace == -1:
        metric, body = s, ""
    else:
        metric, body = s[:brace].strip(), s[brace + 1 :].rstrip()
        if not body.endswith("}"):
            raise ValueError(f"unterminated matcher block in {selector!r}")
        body = body[:-1]
    if metric:
        if not re.fullmatch(r"[a-zA-Z_:][a-zA-Z0-9_:]*", metric):
            raise ValueError(f"bad metric name {metric!r}")
        out.append(Matcher("=", metric_label, metric))
    pos = 0
    while pos < len(body):
        m = _SELECTOR_RE.match(body, pos)
        if not m:
            raise ValueError(f"bad matcher at {body[pos:]!r}")
        value = _unescape(m.group(3))
        out.append(Matcher(m.group(2), m.group(1), value))  # type: ignore[arg-type]
        pos = m.end()
        if pos < len(body):
            if body[pos] != ",":
                raise ValueError(f"expected ',' at {body[pos:]!r}")
            pos += 1
    return out


def wide_label_col(name: str) -> Column:
    """Label accessor for the wide physical layout (one ``label_<name>``
    string column per label name — the FrostDB ``labels.<name>`` dynamic
    column model, hello.go:139-147)."""
    return F.col(f"label_{name}")


def map_label_col(name: str) -> Column:
    """Label accessor for the long/canonical layout (``labels`` MAP column)."""
    return F.col("labels").getItem(name)


def hybrid_label_col(df: DataFrame) -> Callable[[str], Column]:
    """The map-predicate → wide-column REDIRECT (SURVEY.md §4 optional
    extension 1), as an API-layer rewrite rather than a Catalyst rule.

    Returns a label accessor bound to ``df``'s actual schema that resolves
    each label name to the cheapest physical form available:

    1. a materialized wide column ``label_<name>`` if one exists — a plain
       string column, so equality/inequality matchers compiled against it
       reach the Parquet scan as ``PushedFilters`` (row-group min/max +
       dictionary skipping; plan-asserted in tests/test_hybrid_redirect.py);
    2. else the canonical ``labels`` MAP entry — ``map`` element access is
       never pushable in any engine (SURVEY.md §4 O1), so these evaluate
       post-scan, exactly like the reference's regex matchers;
    3. else a typed NULL — the label exists nowhere in this layout, which
       under ``null_semantics="prometheus"`` coalesces to ``""`` (Prometheus
       treats an absent label as the empty string) instead of failing
       analysis the way a bare ``F.col`` reference would.

    The redirect is what makes the HYBRID layout (hot labels materialized
    wide for pushdown, long-tail labels folded into one map for schema
    stability — ``timeseries.ensure_hybrid_label_layout``) transparent to
    matcher queries: callers write ``labels['k'] = 'v'`` semantics once and
    the accessor picks pushable columns wherever the layout provides them.
    Resolution is driver-side against the cached schema — no data access.
    """
    columns = set(df.columns)
    has_map = "labels" in columns

    def col_fn(name: str) -> Column:
        wide = f"label_{name}"
        if wide in columns:
            return F.col(wide)
        if has_map:
            return F.col("labels").getItem(name)
        return F.lit(None).cast("string")

    return col_fn


def _anchor(pattern: str) -> str:
    return f"^(?:{pattern})$"


def matcher_to_column(
    m: Matcher,
    label_col: Callable[[str], Column] = wide_label_col,
    null_semantics: NullSemantics = "sql",
    anchored: bool = True,
) -> Column:
    """Compile one matcher to a boolean ``Column``."""
    c = label_col(m.name)
    pat = _anchor(m.value) if anchored else m.value

    # Prometheus treats an absent label as the empty string, for ALL four
    # operators: coalescing the label to "" before comparing reproduces
    # that uniformly (e.g. `=~".*"` matches series without the label,
    # `!=""` excludes them) with no per-case special-casing.
    if null_semantics == "prometheus":
        c = F.coalesce(c, F.lit(""))

    if m.op == "=":
        return c == F.lit(m.value)
    if m.op == "!=":
        return c != F.lit(m.value)
    if m.op == "=~":
        return c.rlike(pat)
    if m.op == "!~":
        return ~c.rlike(pat)
    raise ValueError(f"unknown matcher op: {m.op!r}")


def matchers_to_column(
    matchers: list[Matcher],
    label_col: Callable[[str], Column] = wide_label_col,
    null_semantics: NullSemantics = "sql",
    anchored: bool = True,
) -> Column:
    """AND-combine a matcher list into one predicate (hello.go:317's
    ``logicalplan.And``).  Empty list → ``lit(True)``."""
    if not matchers:
        return F.lit(True)
    out = matcher_to_column(matchers[0], label_col, null_semantics, anchored)
    for m in matchers[1:]:
        out = out & matcher_to_column(m, label_col, null_semantics, anchored)
    return out


def apply_matchers(
    df: DataFrame,
    matchers: list[Matcher],
    label_col: Callable[[str], Column] = wide_label_col,
    null_semantics: NullSemantics = "sql",
    anchored: bool = True,
) -> DataFrame:
    """Filter a DataFrame by a matcher list.

    On the wide layout these predicates are plain-column comparisons, so
    Catalyst pushes equality/inequality down to the Parquet scan (row-group
    min/max + dictionary skipping) — the Spark equivalent of the reference's
    index-assisted selection.  Regex predicates evaluate post-scan in both
    engines (SURVEY.md §4 O1).
    """
    return df.filter(matchers_to_column(matchers, label_col, null_semantics, anchored))
