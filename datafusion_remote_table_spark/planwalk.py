"""Physical-plan tree walking utilities (py4j, no execution).

Built for the unpartitioned-window inventory (VERDICT r6 item 2): a
`WindowExec` with an empty partition spec moves ALL its input to a single
partition, which is fine over a bounded census (a month grid, a value
histogram, a pruned candidate set) and a 100 TB straggler over anything
corpus-scale. `unpartitioned_windows(df)` finds every such window in a
DataFrame's pre-AQE physical plan — including inside subqueries — and
structurally classifies each one: a window is `census_backed` when every
path from it down to a raw source scan (parquet / JDBC / datasource v2)
passes through an aggregate or a limit, i.e. the single-partition input
is provably post-reduction. Checkpointed stagings (`Scan ExistingRDD`),
in-memory staged views, local relations, and bounded `range()` spines
count as blessed leaves: their boundedness is pinned by the staging
discipline and its own plan-shape tests, not re-derived here.

tests/test_window_inventory.py turns this into the repo-wide invariant:
every registered query's unpartitioned-window count is whitelisted, and
every such window must be census-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Node classes that REDUCE cardinality: once a root-to-leaf path passes
# one of these, whatever sits above is census/limit-grain, not corpus-grain.
_REDUCERS = {
    "HashAggregateExec",
    "SortAggregateExec",
    "ObjectHashAggregateExec",
    "TakeOrderedAndProjectExec",
    "CollectLimitExec",
    "GlobalLimitExec",
    "LocalLimitExec",
}

# Leaves that are staged/bounded by construction (checkpointed candidate
# stagings, persisted views, literal frames, generated spines).
_BLESSED_LEAVES = {
    "RDDScanExec",  # Scan ExistingRDD — localCheckpoint'ed staging
    "InMemoryTableScanExec",  # persisted staged view
    "LocalTableScanExec",  # collected-and-inlined control-plane frame
    "RangeExec",  # generated spine (bounded grids)
    "OneRowRelationExec",
    "EmptyRelationExec",
}

# Raw, potentially corpus-scale sources.
_RAW_LEAVES = {
    "FileSourceScanExec",
    "RowDataSourceScanExec",  # remote JDBC/DB-API scans
    "BatchScanExec",  # datasource v2
}


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.length())]


def iter_plan_nodes(plan):
    """Yield (jvm_node, simple_class_name) over the whole physical plan,
    descending through AQE wrappers and into subquery plans."""
    name = plan.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from iter_plan_nodes(plan.inputPlan())
        return
    yield plan, name
    for child in _children(plan):
        yield from iter_plan_nodes(child)
    sq = plan.subqueries()
    for i in range(sq.length()):
        yield from iter_plan_nodes(sq.apply(i))


def _raw_paths(node, reduced: bool):
    """Return the raw-source leaves reachable from `node` WITHOUT passing
    through a reducer (aggregate/limit). Empty list == census-backed."""
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return _raw_paths(node.inputPlan(), reduced)
    if name in _REDUCERS:
        return []
    if name in _RAW_LEAVES:
        return [] if reduced else [node.nodeName()]
    leaves: list[str] = []
    kids = _children(node)
    if not kids and name not in _BLESSED_LEAVES and name != "ReusedExchangeExec":
        # unknown childless node (e.g. a new scan class): treat as raw so
        # the inventory fails loudly instead of silently blessing it.
        return [] if reduced else [f"UNKNOWN LEAF {name}"]
    for child in kids:
        leaves.extend(_raw_paths(child, reduced))
    return leaves


def unpartitioned_windows(df: DataFrame) -> list[dict]:
    """Every WindowExec/WindowGroupLimitExec with an empty partition spec
    in df's physical plan. Each entry:

    - ``node``: the window's one-line plan string (truncated)
    - ``census_backed``: True when every path from the window to a raw
      source scan passes through an aggregate or limit
    - ``raw_paths``: the offending raw leaves when not census-backed
    """
    plan = df._jdf.queryExecution().executedPlan()
    out = []
    for node, name in iter_plan_nodes(plan):
        if name not in ("WindowExec", "WindowGroupLimitExec"):
            continue
        if not node.partitionSpec().isEmpty():
            continue
        raw = []
        for child in _children(node):
            raw.extend(_raw_paths(child, reduced=False))
        out.append(
            {
                "node": node.simpleString(200),
                "census_backed": not raw,
                "raw_paths": raw,
            }
        )
    return out
