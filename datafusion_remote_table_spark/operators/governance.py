"""Data-governance operators as reusable DataFrame APIs: declarative
data-quality rule evaluation, population-stability (PSI) drift, FK
referential-integrity auditing, and k-anonymity risk.

These are the tunable twins of the registered queries
``orders_dq_rules_audit`` / ``documents_contract_audit`` /
``feature_drift_psi`` / ``referential_integrity_audit`` /
``kanonymity_audit`` (plans/relational.py, plans/llm_data.py),
generalized to arbitrary tables, rule predicates, and feature lists.

Scale posture (the part that matters at 100 TB):
- ``dq_audit`` evaluates EVERY rule in ONE aggregate pass (conditional
  sums + at most one COUNT(DISTINCT) for the uniqueness rule), then
  unpivots to the per-rule report via a constant-size spine — never one
  scan per rule.
- ``psi_drift`` bins all features in ONE pass by exploding a per-row
  (feature, bin) struct array into a tiny (features × bins × 2) cube;
  the PSI arithmetic runs on the cube, never on rows.
- ``referential_integrity`` is one anti join per declared relationship
  (broadcast when the parent is dimension-sized).
- ``kanonymity`` is one groupBy on the quasi-identifier tuple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..session import local_frame
from pyspark.sql import functions as F


def dq_audit(
    df: DataFrame,
    violation_rules: dict[str, str],
    unique_key: str | None = None,
) -> DataFrame:
    """Evaluate declarative data-quality rules in one aggregate pass.

    ``violation_rules`` maps rule name → boolean SQL expression that is
    TRUE when a row VIOLATES the rule (e.g. ``"price <= 0"``).
    ``unique_key`` adds a ``<col>_unique`` rule counting duplicate keys
    via COUNT(*) − COUNT(DISTINCT col). Returns one row per rule:
    (rule_name, n_rows, n_violations, violation_rate), sorted by rule.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
    names = sorted(violation_rules)
    for name in names:
        expr = violation_rules[name]
        aggs.append(
            F.sum(F.when(F.expr(expr), 1).otherwise(0)).cast("bigint").alias(f"__v_{name}")
        )
    if unique_key is not None:
        names = names + [f"{unique_key}_unique"]
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(F.col(unique_key)))
            .cast("bigint")
            .alias(f"__v_{unique_key}_unique")
        )
    agg = df.agg(*aggs)
    spine = F.explode(F.array(*[F.lit(n) for n in sorted(names)])).alias("rule_name")
    viol = F.coalesce(
        *[
            F.when(F.col("rule_name") == n, F.col(f"__v_{n}"))
            for n in sorted(names)
        ]
    ).cast("bigint")
    return (
        agg.select(spine, "*")
        .select(
            "rule_name",
            F.col("__n_rows").alias("n_rows"),
            viol.alias("n_violations"),
            F.round(viol.cast("double") / F.col("__n_rows"), 6).alias("violation_rate"),
        )
        .orderBy("rule_name")
    )


def psi_drift(
    df: DataFrame,
    split_expr: str,
    numeric_cols: tuple[str, ...] = (),
    categorical_cols: tuple[str, ...] = (),
    n_bins: int = 10,
) -> DataFrame:
    """Population-stability-index drift between the two populations named
    by ``split_expr`` (a boolean SQL expression: TRUE → reference
    population, FALSE → current). Numeric features are equal-width
    binned over their global min/max; categorical features bin by
    value. Smoothed PSI = Σ (p−q)·ln(p/q) with +0.5 pseudo-counts.

    One row per feature: (feature, n_bins, n_rows_ref, n_rows_cur, psi).

    Scale: two passes — a bounds aggregate (map-side) and ONE cube pass
    that explodes a per-row (feature, bin) array into the tiny
    (features × bins × 2) census; PSI arithmetic runs on the cube.
    """
    bounds_aggs = []
    for c in numeric_cols:
        bounds_aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*bounds_aggs).collect()[0].asDict() if numeric_cols else {}

    legs = []
    for c in numeric_cols:
        lo, hi = bounds[f"__lo_{c}"], bounds[f"__hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            bin_expr = F.lit("0")
        else:
            width = (hi - lo) / float(n_bins)
            bin_expr = F.least(
                F.floor((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(width)),
                F.lit(n_bins - 1).cast("long"),
            ).cast("string")
        legs.append(
            F.struct(
                F.lit(c).alias("feature"),
                F.coalesce(bin_expr, F.lit("__null")).alias("bin"),
            )
        )
    for c in categorical_cols:
        legs.append(
            F.struct(
                F.lit(c).alias("feature"),
                F.coalesce(F.col(c).cast("string"), F.lit("__null")).alias("bin"),
            )
        )
    cube = (
        df.select(
            F.when(F.expr(split_expr), F.lit("ref")).otherwise(F.lit("cur")).alias("half"),
            F.explode(F.array(*legs)).alias("fb"),
        )
        .groupBy(F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin"), "half")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    cells = cube.groupBy("feature", "bin").agg(
        F.sum(F.when(F.col("half") == "ref", F.col("n")).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("half") == "cur", F.col("n")).otherwise(0)).cast("bigint").alias("n_cur"),
    )
    tot = cells.groupBy("feature").agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    p = (F.col("n_ref").cast("double") + 0.5) / (F.col("t_ref") + 0.5 * F.col("nb"))
    q = (F.col("n_cur").cast("double") + 0.5) / (F.col("t_cur") + 0.5 * F.col("nb"))
    term = F.round((p - q) * F.log(p / q), 9).cast("decimal(28,9)")
    return (
        cells.join(tot, "feature")
        .groupBy("feature", "nb", "t_ref", "t_cur")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("psi"))
        .select(
            "feature",
            F.col("nb").alias("n_bins"),
            F.col("t_ref").alias("n_rows_ref"),
            F.col("t_cur").alias("n_rows_cur"),
            "psi",
        )
        .orderBy("feature")
    )


def referential_integrity(
    relationships: dict[str, tuple[DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Orphan audit for declared FK relationships: name → (child,
    child_key, parent, parent_key). One row per relationship:
    (relationship, n_child, n_orphans, orphan_rate). Each leg is one
    anti join on the key (broadcast when the parent is a dimension)."""
    reports = []
    for name in sorted(relationships):
        child, ck, parent, pk = relationships[name]
        n_child = child.count()
        n_orphans = (
            child.join(parent.select(F.col(pk).alias(ck)).distinct(), ck, "left_anti").count()
        )
        spark = child.sparkSession
        reports.append(
            local_frame(
                spark,
                [(name, n_child, n_orphans, round(n_orphans / n_child, 6) if n_child else 0.0)],
                "relationship string, n_child long, n_orphans long, orphan_rate double",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.orderBy("relationship")


def kanonymity(
    df: DataFrame,
    qi_cols: tuple[str, ...],
    thresholds: tuple[int, ...] = (2, 5, 10, 20),
) -> DataFrame:
    """k-anonymity risk over the quasi-identifier tuple: per candidate
    threshold, classes and rows whose equivalence class is smaller than
    k. One groupBy on the QI tuple; the rollup is constant-size."""
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    tot = classes.agg(
        F.sum("k").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("k").cast("bigint").alias("min_k"),
    )
    thr = local_frame(
        classes.sparkSession,
        [(int(t),) for t in sorted(thresholds)], "threshold long"
    )
    return (
        classes.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("k") < F.col("threshold"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_classes_below"),
            F.sum(F.when(F.col("k") < F.col("threshold"), F.col("k")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            "n_rows",
            "n_classes",
            "min_k",
            "n_classes_below",
            "n_rows_at_risk",
            F.round(F.col("n_rows_at_risk").cast("double") / F.col("n_rows"), 6).alias(
                "frac_rows_at_risk"
            ),
        )
        .orderBy("threshold")
    )
