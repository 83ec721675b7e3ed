"""Expression helpers.

- ``attr_expr``: the reference's ``[colname]`` attribute indirection
  (reference extends.py:41-47 ``Query``) resolved at plan-build time into
  ``F.col`` vs ``F.lit`` — a correlated parameter becomes a real Column so
  Catalyst can still push/prune around it.

- ``compile_python_script``: the reference's ``PythonTF`` runs
  ``eval(Script, {'value': row[Column]}, row)`` per row (reference
  etl.py:431-442). Row-at-a-time eval is the canonical UDF slow path, so we
  compile the safe subset (arithmetic, comparisons, bool ops, conditional
  expressions, int/float/str/abs/len casts, column names) straight to Column
  expressions — Catalyst then folds/pushes them like any native expr. Scripts
  outside the subset raise; callers may fall back to a pandas UDF.

- ``xpath_lite``: evaluator for the XPath subset the reference actually uses
  (absolute ``/tag[i]/.../@attr`` paths, ``//tag``, ``[@attr='v']``
  predicates — see reference project.xml:16-28,48,58 and spider.py:54-64)
  over ``xml.etree`` trees, since lxml is not in the environment.
"""

from __future__ import annotations

import ast
import re
import xml.etree.ElementTree as ET
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_COLREF = re.compile(r"^\[(.+)\]$")


def is_col_ref(value: Any) -> bool:
    return isinstance(value, str) and _COLREF.match(value) is not None


def attr_expr(value: Any, cast: str | None = None) -> Column:
    """Resolve a stage attribute: ``'[page]'`` → col('page'), else lit(value)."""
    m = _COLREF.match(value) if isinstance(value, str) else None
    e = F.col(m.group(1)) if m else F.lit(value)
    return e.cast(cast) if cast else e


_ALLOWED_CALLS = {
    "int": lambda a: a[0].cast("long"),  # Python int() truncates toward zero; so does Spark's cast
    "float": lambda a: a[0].cast("double"),
    "str": lambda a: a[0].cast("string"),
    "abs": lambda a: F.abs(a[0]),
    "len": lambda a: F.length(a[0].cast("string")),
    "round": lambda a: F.round(*a),
    "min": lambda a: F.least(*a),
    "max": lambda a: F.greatest(*a),
}

_BINOPS = {
    ast.Add: lambda l, r: l + r,
    ast.Sub: lambda l, r: l - r,
    ast.Mult: lambda l, r: l * r,
    ast.Div: lambda l, r: l / r,
    ast.FloorDiv: lambda l, r: F.floor(l / r),
    ast.Mod: lambda l, r: l % r,
    ast.Pow: lambda l, r: F.pow(l, r),
}

_CMPOPS = {
    ast.Eq: lambda l, r: l == r,
    ast.NotEq: lambda l, r: l != r,
    ast.Lt: lambda l, r: l < r,
    ast.LtE: lambda l, r: l <= r,
    ast.Gt: lambda l, r: l > r,
    ast.GtE: lambda l, r: l >= r,
}


class UnsupportedScript(ValueError):
    pass


def compile_python_script(script: str, value_col: str | None = None) -> Column:
    """Compile a PythonTF-style expression to a Column.

    ``value`` resolves to ``value_col`` (the stage's Column); any other bare
    name resolves to that row column (reference eval locals = the row dict,
    etl.py:438).
    """
    try:
        tree = ast.parse(script, mode="eval")
    except SyntaxError as e:  # pragma: no cover
        raise UnsupportedScript(f"not an expression: {script!r}") from e

    def emit(node: ast.AST) -> Column:
        if isinstance(node, ast.Expression):
            return emit(node.body)
        if isinstance(node, ast.Constant):
            return F.lit(node.value)
        if isinstance(node, ast.Name):
            if node.id == "value":
                if value_col is None:
                    raise UnsupportedScript("'value' used but no Column set")
                return F.col(value_col)
            return F.col(node.id)
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            return _BINOPS[type(node.op)](emit(node.left), emit(node.right))
        if isinstance(node, ast.UnaryOp):
            if isinstance(node.op, ast.USub):
                return -emit(node.operand)
            if isinstance(node.op, ast.Not):
                return ~emit(node.operand)
        if isinstance(node, ast.Compare) and len(node.ops) == 1 and type(node.ops[0]) in _CMPOPS:
            return _CMPOPS[type(node.ops[0])](emit(node.left), emit(node.comparators[0]))
        if isinstance(node, ast.BoolOp):
            parts = [emit(v) for v in node.values]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if isinstance(node.op, ast.And) else (out | p)
            return out
        if isinstance(node, ast.IfExp):
            return F.when(emit(node.test), emit(node.body)).otherwise(emit(node.orelse))
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) and node.func.id in _ALLOWED_CALLS:
            return _ALLOWED_CALLS[node.func.id]([emit(a) for a in node.args])
        raise UnsupportedScript(f"unsupported construct {ast.dump(node)[:80]} in {script!r}")

    return emit(tree)


# ---------------------------------------------------------------------------
# XPath-lite over xml.etree (reference spider.py:54-64, GetDataFromXPath)

_STEP = re.compile(r"^(?P<tag>[\w*\-]+)(\[(?P<pred>[^\]]+)\])?$")


def _node_text(node: ET.Element) -> str:
    """Recursive concatenated text (reference spider.py:168-182 getnodetext)."""
    return "".join(node.itertext())


def xpath_lite(root: ET.Element, path: str) -> list[Any]:
    """Evaluate the reference's XPath subset; returns elements or attr strings.

    Supports: ``/a[1]/b[2]/@attr[1]``, ``//tag``, ``//*[@id="x"]/a``,
    relative ``a[2]/b``. Indices are 1-based per XPath.
    """
    path = path.strip()
    attr = None
    parts = [p for p in path.split("/") if p != ""]
    descend_next = path.startswith("//")
    if parts and parts[-1].startswith("@"):
        attr = re.sub(r"\[\d+\]$", "", parts[-1][1:])
        parts = parts[:-1]

    nodes: list[ET.Element] = [root]
    first = True
    i = 0
    raw = path.lstrip("/")
    # Re-split tracking '//' descents: build (step, is_descend) pairs.
    steps: list[tuple[str, bool]] = []
    buf = path
    if buf.startswith("//"):
        buf = buf[2:]
        descend = True
    elif buf.startswith("/"):
        buf = buf[1:]
        descend = False
    else:
        descend = False
    while buf:
        j = buf.find("/")
        if j == -1:
            steps.append((buf, descend))
            break
        steps.append((buf[:j], descend))
        buf = buf[j + 1 :]
        if buf.startswith("/"):
            buf = buf[1:]
            descend = True
        else:
            descend = False
    if steps and steps[-1][0].startswith("@"):
        steps = steps[:-1]

    for step, descend in steps:
        m = _STEP.match(step)
        if not m:
            raise ValueError(f"unsupported xpath step: {step!r} in {path!r}")
        tag, pred = m.group("tag"), m.group("pred")
        nxt: list[ET.Element] = []
        for n in nodes:
            cand = list(n.iter()) if descend else list(n)
            if descend and cand and cand[0] is n:
                cand = cand[1:]
            if tag != "*":
                cand = [c for c in cand if c.tag == tag]
            if pred:
                if pred.isdigit():
                    k = int(pred)
                    if k <= len(cand):
                        cand = [cand[k - 1]]
                    else:
                        cand = []
                elif pred.startswith("@"):
                    am = re.match(r"^@([\w\-]+)\s*=\s*['\"](.*)['\"]$", pred)
                    if am:
                        cand = [c for c in cand if c.get(am.group(1)) == am.group(2)]
                    else:
                        cand = [c for c in cand if c.get(pred[1:]) is not None]
                else:
                    raise ValueError(f"unsupported predicate {pred!r}")
            nxt.extend(cand)
        nodes = nxt
    if attr is not None:
        return [n.get(attr) for n in nodes if n.get(attr) is not None]
    return nodes


_BOX = re.compile(r"\[\d{1,3}\]")


def get_max_compare_xpath(xpaths: list[str]) -> str | None:
    """Infer the repeating-container root from a set of item XPaths
    (reference spider.py:38-49 ``GetMaxCompareXPath``): walk the paths
    segment-by-segment; at the first differing segment, return that path's
    prefix through the differing segment with its trailing ``[N]`` index
    stripped (reference ``RemoveFinalNum``, spider.py:29-35). Returns None
    when no segment differs (e.g. a single item) — callers fall back to
    flat positional extraction."""
    parts = [p.split("/") for p in xpaths]
    if not parts:
        return None
    minlen = min(len(p) for p in parts)
    c = None
    for i in range(minlen):
        for idx, path in enumerate(parts):
            if idx == 0:
                c = path[i]
            elif c != path[i]:
                first = list(path[: i + 1])
                m = _BOX.search(first[-1])
                if m:
                    first[-1] = first[-1].replace(m.group(0), "", 1)
                return "/".join(first)
    return None


def xpath_lite_doc(root: ET.Element, path: str) -> list[Any]:
    """Document-absolute evaluation: in ``/html/body/div`` the first step
    names the document element itself (lxml ``tree.xpath`` semantics, which
    the reference's RootXPath values use — project.xml:48), remaining steps
    descend from it. ``//`` and relative paths delegate to xpath_lite."""
    p = path.strip()
    if p.startswith("/") and not p.startswith("//"):
        seg = p[1:].split("/", 1)
        m = _STEP.match(seg[0])
        if m and m.group("tag") in (root.tag, "*") and not m.group("pred"):
            rest = seg[1] if len(seg) > 1 else ""
            return xpath_lite(root, rest) if rest else [root]
    return xpath_lite(root, path)


def xpath_lite_text(root: ET.Element, path: str) -> list[str]:
    out = []
    for r in xpath_lite(root, path):
        out.append(r if isinstance(r, str) else _node_text(r))
    return out
