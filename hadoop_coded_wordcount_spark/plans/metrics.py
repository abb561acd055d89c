"""Communication-load metrics — the reference's observable surface (O12).

The reference's only research-observable output is a pair of Hadoop
counters, PACKETS_SENT / ENCODED_PACKETS_SENT (reference
WordCountDriver.java:17-20, incremented at WordCount.java:207-208,220-221),
measuring shuffle communication load. Spark's analog is the SQLMetric set
every physical operator maintains — shuffle records/bytes written, rows
output — which this module extracts from the *executed* plan, so the
numbers are measured, not estimated.

``collect_plan_metrics`` walks the executed physical plan (descending into
the AQE final plan when present) and aggregates the metric counters by
name; ``run_with_metrics`` materializes a DataFrame through the noop sink
and returns its communication profile:

* ``shuffle_records_written`` / ``shuffle_bytes_written`` — the PACKETS_SENT
  analog: how many records/bytes crossed an Exchange;
* ``rows_output_total`` — ``numOutputRows`` summed over every operator in
  the plan: a total-rows-processed measure (per-operator work), NOT the
  result cardinality. For result cardinality, count the returned frame or
  use ``observe_rows``.

There is no ENCODED_PACKETS_SENT analog by design: Spark's sort-based
shuffle (map-side combine + lz4) occupies the slot the reference's XOR
coding optimizes — see SURVEY.md §4.3 and ``plans/coded_demo.py`` for the
didactic reproduction of the coded path itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["collect_plan_metrics", "run_with_metrics"]

#: SQLMetric internal keys → report keys ("shuffleRecordsWritten" is the
#: Exchange's write-side counter; numOutputRows summed over all operators
#: is a total-rows-processed measure).
_METRIC_KEYS = {
    "shuffleRecordsWritten": "shuffle_records_written",
    "shuffleBytesWritten": "shuffle_bytes_written",
    "numOutputRows": "rows_output_total",
}


def _walk(node):
    yield node
    # AQE wraps the real plan; descend into the (final) executed subplan.
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk(node.executedPlan())
        return
    # Query stages (Shuffle/Broadcast/Result...) wrap their executed
    # subplan behind .plan(), not .children().
    if "QueryStage" in cls:
        yield from _walk(node.plan())
        return
    # A cached scan hides the relation's build plan (where the exchanges
    # and their counters actually live) behind relation().cachedPlan(),
    # not children(). Note: two scans of one cached relation would count
    # its build metrics twice — fine for single-result profiling here.
    if cls == "InMemoryTableScanExec":
        yield from _walk(node.relation().cachedPlan())
        return
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def collect_plan_metrics(df: DataFrame) -> dict[str, int]:
    """Aggregate executed-plan SQLMetrics by metric name. Call *after* an
    action has run the plan, or all counters are zero."""
    totals: dict[str, int] = {v: 0 for v in _METRIC_KEYS.values()}
    plan = df._jdf.queryExecution().executedPlan()
    for node in _walk(plan):
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            key = _METRIC_KEYS.get(kv._1())
            if key is not None:
                totals[key] += kv._2().value()
    return totals


def observe_rows(df: DataFrame, name: str = "obs"):
    """First-class row-level metrics via ``DataFrame.observe`` — the
    declarative counter surface (vs. the physical SQLMetrics walk below):
    named aggregates are computed inline with the query at zero extra
    passes, the closest Spark analog to incrementing a Hadoop counter per
    record (reference WordCount.java:207-208).

    Returns (instrumented_df, observation); read ``observation.get`` after
    an action on the instrumented frame.
    """
    from pyspark.sql import Observation, functions as F

    obs = Observation(name)
    first = df.columns[0]
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_out"),
        # exact DISTINCT is disallowed in observed metrics (they must be
        # mergeable streaming-style aggregates); the HLL sketch is
        F.approx_count_distinct(F.col(first)).alias(f"approx_distinct_{first}"),
    )
    return instrumented, obs


def run_with_metrics(df: DataFrame) -> dict[str, int]:
    """Materialize ``df`` and return its communication profile — keys
    ``shuffle_records_written``, ``shuffle_bytes_written``, and
    ``rows_output_total`` (see module docstring; the last is summed
    operator output, not result cardinality).

    Executes the DataFrame's *own* QueryExecution (``toRdd().count()`` —
    rows stay on the executors, only counts return), because a
    ``df.write`` action plans a separate execution whose metrics would not
    be visible on ``df``'s plan instance. If the caller will also collect
    ``df`` afterwards, ``persist()`` it first so this materialization
    fills the cache instead of doubling the work."""
    df._jdf.queryExecution().toRdd().count()
    return collect_plan_metrics(df)
