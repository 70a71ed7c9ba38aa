"""Pipeline observability: data-quality counters that ride the SAME job.

A 100 TB pipeline cannot afford a second scan just to count nulls or
malformed rows — ``DataFrame.observe`` (Spark's Observation API) attaches
named aggregate metrics to a plan node, computed incidentally as the
action streams by: zero extra passes, zero extra shuffles.  This module
wraps the two shapes the corpus needs:

- batch: ``observe_quality`` + ``Observation.get`` after any action;
- streaming: the same ``observe`` call surfaces per-micro-batch metrics
  on ``StreamingQueryProgress.observedMetrics`` (test_streaming pins it).

The reference has no analog (its bridge is a row cursor — SURVEY.md
§2.2); this is an engine extension in the same family as the
rate-limiter and retry policy: production plumbing around the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(columns: list[str]) -> list[Column]:
    """Standard per-batch quality counters for ``columns``: total rows
    plus a null count per column.  All are plain aggregates, so they fold
    map-side inside whatever job the caller already runs."""
    cols = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        # count(when(...)) not sum(case...): SUM over zero rows is NULL,
        # and an empty micro-batch must report 0, not NULL (ADVICE r6).
        cols.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"n_null_{c}")
        )
    return cols


def observe_quality(
    df: DataFrame, columns: list[str], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach null/row counters for ``columns`` to ``df``'s plan.

    Returns the observed frame (identical rows — observe is a no-op on
    the data) and the ``Observation`` whose ``.get`` yields the metric
    dict after the FIRST action on the frame.  Batch only — for a
    streaming frame, call ``df.observe("name", *quality_metrics(cols))``
    directly and read ``progress.observedMetrics`` (an Observation object
    cannot be re-armed per micro-batch).
    """
    obs = Observation(name)
    return df.observe(obs, *quality_metrics(columns)), obs
