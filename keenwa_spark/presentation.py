"""Plan presentation: render a Spark logical plan in keenwa's plan-text
vocabulary (reference ``src/operators/format.rs`` OperatorTreeFormatter,
and the plan-text corpus shape of ``src/sql/testing/logical_plan.rs`` /
``src/sql/*.yaml``: one operator per line, labeled children indented).

This is a PRESENTATION layer only — Catalyst's plan is the truth; the
renderer maps Catalyst node names onto the reference's logical-operator
vocabulary (LogicalProjection / LogicalSelect / LogicalJoin / ... —
reference ``src/operators/relational/logical/mod.rs:38-67``) so a
keenwa user can read this engine's plans in the names they know, and so
golden tests can pin plan SHAPE the way the reference's YAML corpus
does. Catalyst nodes with no reference analog (Sort as a logical node,
Generate, Window frames) keep an honest ``Logical``-prefixed Spark name
rather than pretending the reference had them.

Determinism: expression ids (``#123``) are stripped, table names come
from the view/alias (never file paths), and rendering walks the
analyzed plan — stable text across runs and sessions for use in golden
tests (tests/test_presentation.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: Catalyst logical node -> reference logical operator name
#: (reference src/operators/relational/logical/mod.rs:38-67)
NODE_NAMES = {
    "Project": "LogicalProjection",
    "Filter": "LogicalSelect",
    "Join": "LogicalJoin",
    "Aggregate": "LogicalAggregate",
    "Window": "LogicalWindowAggregate",
    "Union": "LogicalUnion",
    "Intersect": "LogicalIntersect",
    "Except": "LogicalExcept",
    "Distinct": "LogicalDistinct",
    "GlobalLimit": "LogicalLimit",
    "Offset": "LogicalOffset",
    "LocalRelation": "LogicalValues",
    "OneRowRelation": "LogicalEmpty",
    "Range": "LogicalValues",
    # no reference analog — honest Spark-derived names:
    "Sort": "LogicalSort",
    "Generate": "LogicalGenerate",
    "Expand": "LogicalExpand",
    # CTEs: the reference inlines non-recursive CTEs; Catalyst keeps a
    # def/ref structure — presented compactly under these names
    "WithCTE": "LogicalWithCTE",
    "CTERelationDef": "CTEDef",
    "CTERelationRef": "CTERef",
}

#: id suffixes in Catalyst strings: col#123, col#123L, sum(x)#45
_EXPR_ID = re.compile(r"#\d+L?")
_MULTI_SPACE = re.compile(r"\s+")


def _clean(s: str) -> str:
    return _MULTI_SPACE.sub(" ", _EXPR_ID.sub("", s)).strip()


def _seq(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def _out_cols(node) -> str:
    return ", ".join(a.name() for a in _seq(node.output()))


def _detail(node, name: str) -> str:
    """The per-operator attribute string, in the reference's
    ``key=value`` style, from the Catalyst node's argString."""
    arg = _clean(node.argString(200))
    if name == "LogicalJoin":
        # argString: "Inner, (a = b)" -> type=Inner on=(a = b)
        jt, _, cond = arg.partition(", ")
        out = f"type={jt or 'Cross'}"
        if cond:
            out += f" on={cond}"
        return out
    if name == "LogicalAggregate":
        # argString: "[keys], [aggrs]" (grouped) or just "[aggrs]"
        # (global aggregate omits the empty key list entirely). The
        # aggrs group is GREEDY to the final bracket: aggregate lists
        # legitimately contain "], " inside bracketed auto-aliases
        # (e.g. "arr[0] AS arr[0], count(1)"), which a lazy match
        # would truncate at.
        m = re.match(r"\[(.*?)\], \[(.*)\]$", arg)
        if m:
            return f"groups=[{m.group(1)}] aggrs=[{m.group(2)}]"
        m = re.match(r"\[(.*)\]$", arg)
        if m:
            return f"groups=[] aggrs=[{m.group(1)}]"
        return arg
    if name == "LogicalProjection":
        return f"exprs: [{arg.strip('[]')}]"
    if name == "LogicalSelect":
        return f"filter={arg}"
    if name == "LogicalLimit":
        return f"rows={arg}"
    if name == "LogicalOffset":
        return f"rows={arg}"
    if name == "LogicalEmpty":
        return "return_one_row=true"
    if name in ("LogicalIntersect", "LogicalExcept"):
        # argString is the isAll flag
        return f"all={'true' if arg.startswith('true') else 'false'}"
    if name == "LogicalWindowAggregate":
        m = re.match(r"\[(.*)\], \[(.*)\], \[(.*)\]$", arg)
        if m:
            return (
                f"exprs=[{m.group(1)}] partition=[{m.group(2)}]"
                f" order=[{m.group(3)}]"
            )
        return arg
    if name == "LogicalUnion":
        # Catalyst's Union node is always ALL; UNION DISTINCT appears
        # as Distinct(Union) and is collapsed by the walker
        return "all=true"
    if name == "LogicalSort":
        m = re.match(r"\[(.*)\], (?:true|false)$", arg)
        return f"ordering=[{m.group(1)}]" if m else arg
    if name == "LogicalValues":
        return ""
    if name == "LogicalWithCTE":
        return ""
    if name == "CTEDef":
        # argString: "<id>, <underSubquery>"
        return f"id={arg.split(',')[0]}"
    if name == "CTERef":
        # argString: "<id>, <resolved>, [cols], <isStreaming>, ..."
        m = re.match(r"(\d+), \w+, \[(.*?)\]", arg)
        return f"id={m.group(1)} cols=[{m.group(2)}]" if m else arg
    return arg


def render_plan(df: DataFrame, max_lines: int = 200) -> str:
    """keenwa-style plan text for ``df``'s analyzed logical plan."""
    plan = df._jdf.queryExecution().analyzed()  # type: ignore[attr-defined]
    lines: list[str] = []
    dropped = False

    def walk(node, depth: int, label: str) -> None:
        nonlocal dropped
        if len(lines) >= max_lines:
            dropped = True
            return
        name = node.nodeName()
        children = _seq(node.children())
        # transparent nodes: aliases over a scan become LogicalGet; any
        # other alias/view wrapper just forwards to its child
        if name in ("SubqueryAlias", "View"):
            child = children[0]
            inner = child
            # View wraps Project over the relation for temp views
            while inner.nodeName() in ("SubqueryAlias", "View"):
                inner = _seq(inner.children())[0]
            if inner.nodeName() in ("LogicalRelation", "Relation", "LocalRelation"):
                ident = _clean(node.argString(200)).split(" ")[0]
                ident = ident.split(".")[-1]
                op = (
                    "LogicalValues"
                    if inner.nodeName() == "LocalRelation"
                    else "LogicalGet"
                )
                pad = "  " * depth
                lines.append(f"{pad}{label}{op} {ident} cols=[{_out_cols(node)}]")
                return
            walk(child, depth, label)
            return
        if name in ("LogicalRelation", "Relation"):
            lines.append(
                "  " * depth + f"{label}LogicalGet ? cols=[{_out_cols(node)}]"
            )
            return
        # GlobalLimit(LocalLimit(x)) is ONE logical limit
        if name == "GlobalLimit" and children and children[0].nodeName() == "LocalLimit":
            children = _seq(children[0].children())
        if name == "LocalLimit":
            name = "GlobalLimit"  # bare local limit renders as the limit
        # Distinct(Union) is the reference's LogicalUnion all=false
        if (
            name == "Distinct"
            and children
            and children[0].nodeName() == "Union"
        ):
            pad = "  " * depth
            lines.append(f"{pad}{label}LogicalUnion all=false")
            for i, c in enumerate(_seq(children[0].children())):
                walk(c, depth + 1, f"input[{i}]: ")
            return
        # "Intersect All"/"Except All" are distinct Catalyst node names
        if name in ("Intersect All", "Except All"):
            name = name.split(" ")[0]
        mapped = NODE_NAMES.get(name, name)
        detail = _detail(node, mapped)
        pad = "  " * depth
        lines.append(f"{pad}{label}{mapped}" + (f" {detail}" if detail else ""))
        # subquery plans referenced from this node's expressions render
        # as labeled sub-trees — the reference's SubQueriesFormatter
        # presentation (format.rs), not an opaque expression token
        for i, sq in enumerate(_seq(node.subqueries())):
            walk(sq, depth + 1, f"subquery[{i}]: ")
        if mapped == "LogicalJoin" and len(children) == 2:
            walk(children[0], depth + 1, "left: ")
            walk(children[1], depth + 1, "right: ")
        elif len(children) == 1:
            walk(children[0], depth + 1, "input: ")
        else:
            for i, c in enumerate(children):
                walk(c, depth + 1, f"input[{i}]: ")

    walk(plan, 0, "")
    if dropped:
        lines.append("... (truncated)")
    text = "\n".join(lines)
    # Catalyst's CTERelationDef ids come from a SESSION-GLOBAL counter,
    # so the raw numbers depend on how many CTE queries ran before this
    # one. Normalize to per-plan indices (0, 1, ...) in order of first
    # appearance so the text is stable — matching the reference's
    # per-plan CTE numbering (src/operators/format.rs renders local
    # binding names, never global ids).
    raw_ids = []
    for m in re.finditer(r"\bCTE(?:Def|Ref) id=(\d+)", text):
        if m.group(1) not in raw_ids:
            raw_ids.append(m.group(1))
    if raw_ids:
        remap = {raw: str(i) for i, raw in enumerate(raw_ids)}
        text = re.sub(
            r"\b(CTE(?:Def|Ref) id=)(\d+)",
            lambda m: m.group(1) + remap[m.group(2)],
            text,
        )
    return text
