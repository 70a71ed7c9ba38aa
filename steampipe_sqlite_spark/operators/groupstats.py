"""Per-group statistics via the pandas UDF surfaces (SURVEY §2.3 UDF row).

Two training-pipeline staples, implemented on the two Spark UDF surfaces
the rest of the engine doesn't otherwise exercise:

- :func:`zscore_per_group` — per-group z-score normalization of a column
  (feature scaling) via ``groupBy().applyInPandas``: each group arrives as
  one pandas DataFrame, is normalized vectorized, and returns with the new
  column.  Shuffles once on the group key — the same shape a groupBy
  aggregate pays, with arbitrary per-group Python in the middle.
- :func:`gmean` — geometric mean as a grouped-aggregate ``pandas_udf``
  (Arrow-batched partial series per group).

Both have exact SQL twins ((x-avg)/stddev_samp; exp(avg(ln x))), which the
corpus oracles use — the point here is the UDF plumbing, proven equal to
the relational form.  At 100 TB: applyInPandas groups must fit in worker
memory (group = one pandas frame); for giant groups, prefer the SQL twin
(window functions stream per-partition and spill).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def zscore_per_group(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Append per-group z-score of ``value_col`` (sample stddev, ddof=1 —
    matching SQL ``stddev_samp``); NULL for single-row/zero-variance
    groups, as the SQL twin yields."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # fresh StructType: StructType.add MUTATES the receiver, and df.schema
    # returns the live schema object — add()ing to it corrupts the input df
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType())])

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=1)
        pdf[out_col] = (v - v.mean()) / sd if sd and sd > 0 else None
        return pdf

    return df.groupBy(*group_cols).applyInPandas(norm, schema=out_schema)


def gmean_agg(value_col: str | Column) -> Column:
    """Geometric mean as a grouped-aggregate ``pandas_udf`` expression for
    ``groupBy().agg(...)``: exp(mean(ln x)) over the group's positive
    values; NULL when none.  (Decorated lazily — ``@pandas_udf`` parses
    its return type against the ACTIVE session, so a module-level
    decoration would break session-less imports.)"""

    def _gmean(v: pd.Series) -> float:
        import numpy as np

        pos = v[v > 0]
        if pos.empty:
            return None
        return float(np.exp(np.log(pos.astype("float64")).mean()))

    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return pandas_udf(_gmean, "double")(c)
