"""Programmatic physical-plan auditing (SURVEY.md §4.2: "rely on Catalyst;
verify with explain()").

`audit(df)` parses the formatted physical plan into facts a test (or a
human) can assert on: which filters reached the scans, what the scans
actually read, which join strategies were chosen, how many exchanges the
plan pays for. Used by tests/test_plans.py; also handy interactively:

    >>> from kinesis_customer_sample_spark.plans import audit
    >>> audit(df).join_strategies
    {'BroadcastHashJoin': 2}
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


@dataclass
class PlanFacts:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    join_strategies: dict[str, int] = field(default_factory=dict)
    n_exchanges: int = 0
    round_robin_exchanges: int = 0
    has_cartesian: bool = False
    has_partial_agg: bool = False

    def scans_read_column(self, col: str) -> bool:
        return any(col in s for s in self.read_schemas)


def plan_text(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _superseded_node_ids(text: str) -> set[str]:
    """Node ids that appear ONLY under an AQE "== Initial Plan ==" subtree.

    A materialized InMemoryRelation prints its cached AdaptiveSparkPlan
    with BOTH the final and the initial physical plan; the initial one is
    the superseded pre-AQE alternative, and counting its nodes would
    double-bill every exchange/join under a cache (found when persist()
    barriers landed in the text pipeline). A subtree is delimited by
    indentation: the marker's block ends at the first line indented at or
    above the marker itself."""
    skipped: set[str] = set()
    kept: set[str] = set()
    skip_indent: int | None = None
    for line in text.splitlines():
        stripped = line.strip()
        indent = len(line) - len(line.lstrip())
        if skip_indent is not None and stripped and indent <= skip_indent:
            skip_indent = None
        if "== Initial Plan ==" in stripped:  # tree prints it as "+- == Initial Plan =="
            skip_indent = indent
            continue
        bucket = skipped if skip_indent is not None else kept
        for m in re.finditer(r"[A-Za-z][A-Za-z0-9]*\s+\((\d+)\)", line):
            bucket.add(m.group(1))
    return skipped - kept


def audit(df: DataFrame) -> PlanFacts:
    text = plan_text(df)
    facts = PlanFacts(text=text)
    superseded = _superseded_node_ids(text)
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            inner = s.split(":", 1)[1].strip().strip("[]")
            if inner:
                facts.pushed_filters.extend(p.strip() for p in inner.split(","))
        elif s.startswith("ReadSchema:"):
            facts.read_schemas.append(s.split(":", 1)[1].strip())
        elif s.startswith("PartitionFilters:"):
            inner = s.split(":", 1)[1].strip().strip("[]")
            if inner:
                facts.partition_filters.extend(p.strip() for p in inner.split(","))
    # node census from the numbered plan header lines, e.g. "(5) Exchange";
    # nodes living only in superseded "== Initial Plan ==" subtrees are
    # pre-AQE alternatives, not paid-for operators
    for m in re.finditer(r"^\s*[:+\-\s]*\((\d+)\)\s+([A-Za-z]+)", text, re.MULTILINE):
        if m.group(1) in superseded:
            continue
        node = m.group(2)
        if node == "Exchange":
            facts.n_exchanges += 1
        if node in _JOIN_NODES:
            facts.join_strategies[node] = facts.join_strategies.get(node, 0) + 1
    # round-robin census: attribute Arguments lines to their node header so
    # superseded initial-plan exchanges don't double-count
    current_id = None
    for line in text.splitlines():
        header = re.match(r"^\((\d+)\)\s+[A-Za-z]", line.strip())
        if header:
            current_id = header.group(1)
        elif "RoundRobinPartitioning" in line and current_id not in superseded:
            facts.round_robin_exchanges += 1
    facts.has_cartesian = "CartesianProduct" in text
    facts.has_partial_agg = "partial_" in text
    return facts
