"""Column lineage derived from the DataFrame's analyzed logical plan.

The reference records column lineage only when callers hand-author
``ColumnLineage`` entries (``src/lineage/lineage_tracker.py:96-113``); here
the engine DERIVES them from Catalyst's analyzed plan (SURVEY.md §4's
"optionally enrich from the plan" note): every output column maps to the
set of source-relation columns it transitively references.

Implementation: ``queryExecution().analyzed().toJSON()`` serializes the
plan as a flattened preorder list of operators, each expression as a
flattened subtree with ``AttributeReference`` leaves carrying stable
``exprId``s. We rebuild the operator tree, then propagate
exprId → {source columns} bottom-up:

* leaf relations bind their own outputs,
* Project/Aggregate/Window/Generate define new exprIds from referenced ones,
* every other operator passes its children's bindings through (a join is
  the union of both sides).

Driver-side metadata work — no Spark job runs.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

__all__ = ["column_lineage_from_plan"]

_ATTR = "org.apache.spark.sql.catalyst.expressions.AttributeReference"
_ALIAS = "org.apache.spark.sql.catalyst.expressions.Alias"

# operator keys that define new output expressions
_DEFINING_KEYS = ("projectList", "aggregateExpressions", "windowExpressions",
                  "generatorOutput")


def _expr_id(e: dict) -> tuple[int, str]:
    x = e["exprId"]
    return (x["id"], x["jvmId"])


def _build_tree(nodes: list[dict], start: int = 0) -> tuple[dict, int]:
    """Rebuild one operator subtree from the flattened preorder list.
    Returns (node-with-_children, next_index)."""
    node = dict(nodes[start])
    n = node.get("num-children", 0)
    children, idx = [], start + 1
    for _ in range(n):
        child, idx = _build_tree(nodes, idx)
        children.append(child)
    node["_children"] = children
    return node, idx


def _attr_refs(expr_tree: list[dict]) -> list[dict]:
    return [e for e in expr_tree if e.get("class") == _ATTR]


def _resolve(node: dict) -> dict[tuple[int, str], set[str]]:
    """exprId -> source-column names for every attribute this subtree
    can emit."""
    bound: dict[tuple[int, str], set[str]] = {}
    for child in node["_children"]:
        bound.update(_resolve(child))

    cls = node.get("class", "")
    if node.get("output") and not node["_children"]:
        # leaf relation: its outputs ARE source columns
        for out in node["output"]:
            for e in out if isinstance(out, list) else [out]:
                if e.get("class") == _ATTR:
                    bound[_expr_id(e)] = {e["name"]}
        return bound

    for key in _DEFINING_KEYS:
        for expr_tree in node.get(key) or []:
            tree = expr_tree if isinstance(expr_tree, list) else [expr_tree]
            root = tree[0]
            sources: set[str] = set()
            for ref in _attr_refs(tree[1:] if root.get("class") == _ALIAS
                                  else tree):
                sources |= bound.get(_expr_id(ref), {ref["name"]})
            if root.get("class") == _ALIAS:
                bound[_expr_id(root)] = sources or set()
            elif root.get("class") == _ATTR:
                bound.setdefault(_expr_id(root), {root["name"]})
    return bound


def column_lineage_from_plan(df: DataFrame) -> dict[str, list[str]]:
    """Map each output column of ``df`` to the sorted list of source
    columns it derives from (empty list = literal/computed-only)."""
    nodes: list[dict[str, Any]] = json.loads(
        df._jdf.queryExecution().analyzed().toJSON()
    )
    root, _ = _build_tree(nodes)
    bound = _resolve(root)

    out: dict[str, list[str]] = {}
    # the analyzed plan's root output attributes align with df.schema
    root_output = []
    for key in _DEFINING_KEYS:
        if node_exprs := root.get(key):
            for expr_tree in node_exprs:
                tree = expr_tree if isinstance(expr_tree, list) else [expr_tree]
                root_output.append(tree[0])
            break
    if not root_output:
        # root doesn't define columns (e.g. Filter/Join at top): every
        # schema column is a pass-through of an attr already bound
        for name in df.columns:
            out[name] = sorted(
                next((s for _, s in bound.items() if name in s), {name})
            )
        return out
    for root_expr, name in zip(root_output, df.columns):
        eid = _expr_id(root_expr)
        out[name] = sorted(bound.get(eid, set()))
    return out
