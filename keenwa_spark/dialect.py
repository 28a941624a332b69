"""SQL dialect conformance layer.

Mirrors keenwa's SELECT-only frontend accept/reject matrix
(reference src/sql/mod.rs):

- only SELECT/VALUES queries — every other statement rejected
  (build_statement, src/sql/mod.rs:102-144)
- recursive CTEs rejected (:210)
- GROUPING SETS / CUBE / ROLLUP rejected (:341-343)
- LATERAL rejected (:539), UNNEST rejected (:561)
- FETCH rejected (:174)
- NULLS FIRST/LAST rejected (:594)
- named windows rejected (:1235-1237)
- window ORDER BY / frames rejected (:1339-1340)
- 3+-part compound identifiers rejected (:610)
- WITHIN GROUP ordered-set aggregates rejected (:1230)

We keep the *statement-level* rejections as hard errors (parity with
keenwa's surface) but — unlike keenwa — ACCEPT the richer intra-SELECT
surface Spark supports (window ORDER BY, frames, NULLS FIRST/LAST,
grouping sets) when the engine is constructed with ``strict=False``
(the default): rejecting capability Spark gives for free would make the
engine strictly worse. ``strict=True`` gives exact keenwa-matrix
behavior for conformance tests.

Validation is a lightweight token scan (no third-party SQL parser is
available in this environment); Spark's own parser remains the real
gatekeeper for syntax. The scan strips strings/comments first so
literals can't trigger false rejections.
"""

from __future__ import annotations

import re

from keenwa_spark.errors import NotSupportedError

_STATEMENT_KEYWORDS = (
    "INSERT",
    "UPDATE",
    "DELETE",
    "MERGE",
    "CREATE",
    "DROP",
    "ALTER",
    "TRUNCATE",
    "GRANT",
    "REVOKE",
    "SET",
    "USE",
    "SHOW",
    "DESCRIBE",
    "ANALYZE",
    "EXPLAIN",
    "COPY",
    "CALL",
)

# Constructs keenwa rejects inside SELECT (strict mode only).
_STRICT_REJECTS: list[tuple[str, str]] = [
    (r"\bGROUPING\s+SETS\b", "GROUP BY expressions with modifiers (GROUPING SETS)"),
    (r"\bCUBE\s*\(", "GROUP BY expressions with modifiers (CUBE)"),
    (r"\bROLLUP\s*\(", "GROUP BY expressions with modifiers (ROLLUP)"),
    (r"\bLATERAL\b", "LATERAL"),
    (r"\bUNNEST\s*\(", "UNNEST"),
    (r"\bFETCH\s+(FIRST|NEXT)\b", "FETCH"),
    (r"\bNULLS\s+(FIRST|LAST)\b", "NULLS FIRST/LAST in ORDER BY"),
    (r"\bWINDOW\s+\w+\s+AS\s*\(", "named WINDOW definitions"),
    (r"\bROWS\s+BETWEEN\b", "window frames"),
    (r"\bRANGE\s+BETWEEN\b", "window frames"),
    # window ORDER BY (reference build_window_spec, sql/mod.rs:1339 —
    # only OVER (PARTITION BY ...) is accepted)
    (r"\bOVER\s*\([^)]*\bORDER\s+BY\b", "window ORDER BY"),
    # 3+-part compound identifiers (reference build_scalar_expr,
    # sql/mod.rs:610: CompoundIdentifier with len > 2 → not_implemented)
    (r"\b[A-Z_][A-Z_0-9]*\.[A-Z_][A-Z_0-9]*\.[A-Z_][A-Z_0-9]*\b",
     "compound identifier expression (3+ parts)"),
    # WITHIN GROUP ordered-set aggregates (reference sql/mod.rs:1230)
    (r"\bWITHIN\s+GROUP\b", "aggregate WITHIN GROUP ordering"),
    # array slice with a stride (reference scalar/expr.rs:93-98 models
    # arr[lo:hi:stride]; Spark's slice() has no stride argument, so the
    # form is explicitly rejected instead of silently absent — SURVEY
    # "shim or reject")
    (r"\[[^\[\]:]*:[^\[\]:]*:[^\[\]:]*\]", "array slice with stride (arr[lo:hi:stride])"),
]

# Constructs keenwa rejects at statement level in ALL modes.
_ALWAYS_REJECTS: list[tuple[str, str]] = [
    (r"\bWITH\s+RECURSIVE\b", "recursive CTEs"),
]


def _strip_literals(sql: str) -> str:
    """Remove string literals and comments so they can't false-match.

    Handles BOTH quote-escape conventions Spark accepts: doubled quotes
    ('don''t') and backslash escapes ('don\\'t') — a literal like
    'don\\'t INSERT INTO t' must not terminate early and leak its tail
    into the keyword scan (ADVICE r02)."""
    sql = re.sub(r"--[^\n]*", " ", sql)
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.S)
    sql = re.sub(r"'(?:[^'\\]|\\.|'')*'", "''", sql)
    sql = re.sub(r'"(?:[^"\\]|\\.|"")*"', '""', sql)
    return sql


def _has_nested_over(upper: str) -> bool:
    """True if a window (OVER) clause itself contains another OVER —
    keenwa rejects nested window functions anywhere, including in
    PARTITION BY expressions (reference builder/mod.rs:1250-1308).
    Balanced-paren walk on the literal-stripped text."""
    for m in re.finditer(r"\bOVER\s*\(", upper):
        depth = 1
        i = m.end()
        while i < len(upper) and depth:
            ch = upper[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if re.search(r"\bOVER\b", upper[m.end() : i - 1]):
            return True
    return False


def validate(sql: str, strict: bool = False) -> None:
    """Raise NotSupportedError for constructs outside the dialect.

    ``strict=True`` applies keenwa's exact reject matrix; the default
    only enforces SELECT-only statements and recursive-CTE rejection.
    """
    stripped = _strip_literals(sql).strip()
    if not stripped:
        raise NotSupportedError("empty query")

    first_word = re.match(r"[A-Za-z]+", stripped)
    head = first_word.group(0).upper() if first_word else ""
    if head in _STATEMENT_KEYWORDS:
        raise NotSupportedError(f"statement type not supported: {head} (SELECT-only engine)")
    if head not in ("SELECT", "WITH", "VALUES", "TABLE", ""):
        raise NotSupportedError(f"statement type not supported: {head!r}")
    # CTE-prefixed DML would bypass the first-token check ("WITH t AS
    # (...) INSERT INTO ..." — ADVICE r01): scan the whole statement for
    # top-level-ish DML keywords. 'SELECT ... INTO' style false positives
    # are acceptable: the dialect has no INTO either.
    dml = re.search(
        r"\b(INSERT\s+INTO|INSERT\s+OVERWRITE|UPDATE\s+\w+\s+SET|DELETE\s+FROM|MERGE\s+INTO)\b",
        stripped,
        flags=re.I,
    )
    if dml:
        raise NotSupportedError(
            f"statement type not supported: {dml.group(1).split()[0].upper()} "
            "(SELECT-only engine)"
        )

    upper = stripped.upper()
    for pattern, label in _ALWAYS_REJECTS:
        if re.search(pattern, upper):
            raise NotSupportedError(f"not supported: {label}")
    if strict:
        for pattern, label in _STRICT_REJECTS:
            if re.search(pattern, upper):
                raise NotSupportedError(f"not supported: {label}")
        if _has_nested_over(upper):
            raise NotSupportedError("not supported: nested window functions")
