"""Physical-plan guards: detect unpartitioned Windows.

A Window with an empty partition spec forces ``Exchange
SinglePartition`` — one task sorts/aggregates the whole input. That is
fine when the input is bounded BY CONSTRUCTION (a <=n_buckets
bucket-offset table, a decile/month/day rollup, a TakeOrdered result)
and a scale-killer when the input grows with the data (the round-8/9
migration class: global ntile/row_number/cumsum over a fact- or
key-scaled rollup). These helpers parse ``executedPlan().toString()``
and report every unpartitioned Window with the signature of its input,
so tests/test_plans.py can fail any registered query that grows one
outside the explicit allowlist. Standalone runner: tools/window_audit.py.
"""

from __future__ import annotations

import re

#: tree-drawing / codegen prefix in executedPlan().toString() lines
_PREFIX = re.compile(r"^[\s:+|-]*(?:\*\(\d+\)\s*)?")

#: nodes that pass rows through without changing the partitioning
_PASSTHROUGH = (
    "Sort ",
    "Project ",
    "Filter ",
    "WindowGroupLimit ",
    "InputAdapter",
    "WholeStageCodegen",
    "ColumnarToRow",
    "SerializeFromObject",
    "DeserializeToObject",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "ReusedExchange",
    "ReusedSubquery",
)


def _node(line: str) -> str:
    return _PREFIX.sub("", line)


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+|-"))


def _split_groups(s: str) -> list[str]:
    """Split ``[a], [b], [c]`` at top-level ``], [`` boundaries."""
    groups: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _is_unpartitioned_window(node: str) -> bool:
    """True when a ``Window ...`` node line has an empty partition
    spec. Printed forms: 3 bracket groups = [exprs], [part], [order];
    2 groups = [exprs], [part] (unordered, partitioned — fine) or
    [exprs], [order] (ordered, UNpartitioned); 1 group = global frame,
    unpartitioned. Order groups are recognized by ASC/DESC markers."""
    groups = _split_groups(node[len("Window "):])
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        return " ASC " in groups[1] or " DESC " in groups[1] or groups[
            1
        ].endswith(("ASC", "DESC", "NULLS FIRST", "NULLS LAST"))
    return True  # single group: whole-input frame, no partitioning


def _input_signature(lines: list[str], i: int) -> str:
    """Walk the subtree below lines[i] (a Window node) through
    pass-through nodes and the SinglePartition exchange to the first
    'real' input node; normalize expr ids away."""
    base = _indent(lines[i])
    for j in range(i + 1, len(lines)):
        if _indent(lines[j]) <= base:
            break
        node = _node(lines[j])
        if node.startswith(_PASSTHROUGH) or node.startswith(
            ("Exchange SinglePartition", "Window ")
        ):
            continue
        return re.sub(r"#\d+[L]?", "", node.split(", [plan_id")[0])[:160]
    return "<none>"


def find_unpartitioned_windows(plan: str) -> list[tuple[str, str]]:
    """Return [(window_node, input_signature)] for every Window in the
    physical plan text whose partition spec is empty."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        node = _node(line)
        if node.startswith("Window ") and _is_unpartitioned_window(node):
            out.append((node[:120], _input_signature(lines, i)))
    return out


#: input signatures that are bounded BY CONSTRUCTION, everywhere: the
#: two-pass ranking operators' bucket/partition-id offset tables
#: (<= n_buckets / num_partitions rows regardless of data size).
_OPERATOR_INTERNAL = re.compile(
    r"HashAggregate\(keys=\[(?:\w+, )*__bucket\]|"
    r"HashAggregate\(keys=\[__pid\]"
)


def is_operator_internal(sig: str) -> bool:
    return bool(_OPERATOR_INTERNAL.search(sig))
