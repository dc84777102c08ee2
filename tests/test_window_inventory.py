"""Exhaustive unpartitioned-window inventory (VERDICT r6 item 2).

A `WindowExec` with an empty partition spec moves ALL of its input to one
partition. The round-6 sweep surfaced 743 such warnings; spot checks said
they were all bounded-census windows, but "I believe they're all bounded"
is not an invariant. This test turns it into one:

1. every registered query's physical plan is walked
   (`planwalk.unpartitioned_windows`, descending through AQE wrappers and
   subqueries);
2. every unpartitioned window must be CENSUS-BACKED — every path from the
   window down to a raw source scan (parquet / remote) passes through an
   aggregate or a limit, so the single-partition input is post-reduction,
   never the corpus;
3. the per-query window counts are pinned to the whitelist below, each
   with its named bounded census. A NEW unlisted single-partition window
   — the 100 TB straggler class — fails the suite.

The r7 inventory run that seeded the whitelist found exactly two
non-census-backed windows and both were redesigned before this test
landed: `range_partition_plan` (NTILE(32) over a fixed-fraction md5
sample — a 1.6% sample of 100 TB still lands on one partition; now a
bounded $1000-bucket value census) and `events_late_arrival_audit` /
`stream_late_arrival_monitor` (running max over global arrival order;
now the distributed two-pass prefix scan: per-arrival-hour partitioned
windows + a bounded cross-bucket carry census, bit-equal results).
"""

from __future__ import annotations

from datafusion_remote_table_spark import plans
from datafusion_remote_table_spark.planwalk import unpartitioned_windows

plans.load_all()

# query -> (expected unpartitioned-window count, the named bounded census
# the window(s) run over). Counts measured at sf0.001; plans are
# deterministic, so a drift in either direction means the query changed
# and the whitelist must be re-adjudicated, not silently accepted.
WHITELIST: dict[str, tuple[int, str]] = {
    "basket_triples_apriori": (1, "COUNT(*) OVER () on the pruned candidate-triple support table"),
    "cardinality_qerror_audit": (1, "total over the per-estimator q-error census (fixed estimator list)"),
    "corpus_budget_waterfill": (3, "totals + waterfill rank over the per-source budget census (sources are an enum)"),
    "corpus_clean_funnel": (1, "cumulative survivors over the ~6-row funnel-stage ordinal"),
    "curriculum_phase_plan": (1, "cumulative count over the difficulty-bucket census (value grid)"),
    "doc_length_wasserstein": (1, "total over the length-bucket census (value grid)"),
    "events_bootstrap_ci": (2, "max + median rank over the 200-row bootstrap-replicate census"),
    "events_chisq_independence": (4, "grand total + row/col dense_ranks over the (event_type x daypart) contingency census"),
    "events_concurrency_hourly": (1, "running sum over the hour-grid census (above the user_id-keyed sessionize shuffle)"),
    "events_cusum_changepoint": (2, "cumulative sums over the day-grid census (two legs)"),
    "events_decayed_popularity": (1, "top-k rank over the event_type census (enum-sized)"),
    "events_forecast_ewma": (4, "row_number over the day-grid census (one per unrolled EWMA level)"),
    "events_funnel_latency": (2, "COUNT(*) OVER () + median rank over funnel-completer latencies (pruned to step-3 completers)"),
    "events_ks_test": (1, "cumulative sum over the value census (distinct event values)"),
    "events_late_arrival_audit": (1, "cross-bucket carry max over the arrival-hour census (two-pass prefix scan)"),
    "events_mannwhitney_u": (1, "cumulative rank over the value census (distinct event values)"),
    "events_runs_test": (3, "sign-run lag/count/rank over the day-grid census"),
    "events_spectral_peaks": (1, "top-peak rank over the candidate-period census (bounded period grid)"),
    "events_survival_curve": (1, "cumulative events over the 0..30 day spine"),
    "events_variance_decomposition": (1, "grand totals over the per-group moment census (groups are an enum)"),
    "hybrid_search_rrf": (2, "per-leg top-k rank over the single query's fused candidate list (posting-list pruned)"),
    "langid_feature_chi2": (1, "total over the (lang x feature) contingency census"),
    "lineitem_twoway_anova": (1, "grand totals over the (returnflag x shipmode) cell-moment census"),
    "orders_expected_shortfall": (3, "tail rank + COUNT(*) OVER () over the daily-revenue census (day grid, two legs)"),
    "orders_kruskal_wallis": (1, "cumulative rank over the order-value census (value grid)"),
    "orders_littles_law": (1, "LEAD over the month-grid census"),
    "orders_seasonal_naive_mase": (2, "totals + lag-12 over the month-grid census"),
    "orders_seasonality": (2, "global stats + trailing window over the month-grid census"),
    "orders_theilsen_trend": (4, "median ranks + COUNT(*) OVER () over the month-pair slope census (months^2 bounded)"),
    "quantile_sketch_orders": (2, "cumulative counts over the fixed-width bin census (two sketch legs)"),
    "range_partition_plan": (2, "cumulative counts over the $1000-wide price-value census (value-bounded)"),
    "remote_incremental_sync": (1, "running total over the 3-row batch ledger"),
    "sample_temperature_mix": (1, "total weight over the per-source rate census (sources are an enum)"),
    "stream_cusum_monitor": (2, "cumulative sums over the day-grid census (batch oracle shape)"),
    "stream_decayed_popularity": (1, "top-k rank over the event_type census (enum-sized)"),
    "stream_funnel_latency": (2, "COUNT(*) OVER () + median rank over funnel-completer latencies"),
    "stream_late_arrival_monitor": (1, "cross-bucket carry max over the arrival-hour census (two-pass prefix scan)"),
    "stream_quantile_monitor": (2, "cumulative counts over the fixed-width bin census"),
    "stream_spectral_monitor": (1, "top-peak rank over the candidate-period census"),
    "tokenize_unigram_train": (1, "vocab_rank row_number over the LIMIT-40 emitted-vocabulary frame (TakeOrdered upstream)"),
    "text_burrows_delta": (2, "top-150 vocabulary rank censuses (two author halves)"),
    "text_zipf_audit": (1, "frequency rank over the vocabulary census"),
}


def test_unpartitioned_window_inventory(qplan):
    failures: list[str] = []
    for name in plans.QUERIES:
        try:
            ws = unpartitioned_windows(qplan(name))
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: plan build failed: {ex!r}")
            continue
        expected = WHITELIST.get(name, (0, "not whitelisted"))[0]
        if len(ws) != expected:
            nodes = "; ".join(w["node"][:120] for w in ws)
            failures.append(
                f"{name}: {len(ws)} unpartitioned windows, whitelist says "
                f"{expected} — re-adjudicate before changing the pin [{nodes}]"
            )
        for w in ws:
            if not w["census_backed"]:
                failures.append(
                    f"{name}: unpartitioned window rides a RAW corpus scan "
                    f"({w['raw_paths']}) — 100TB straggler: {w['node'][:120]}"
                )
    assert not failures, "\n".join(failures)


def test_whitelist_names_are_registered():
    unknown = [n for n in WHITELIST if n not in plans.QUERIES]
    assert not unknown, f"whitelist entries for unregistered queries: {unknown}"
