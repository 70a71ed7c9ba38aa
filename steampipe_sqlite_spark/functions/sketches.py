"""Deterministic cross-engine sketches.

Spark's approx_count_distinct and DuckDB's are different HLL
implementations, so their estimates can't be hash-compared.  This module
builds a HyperLogLog (Flajolet et al. 2007) from primitives BOTH engines
share bit-for-bit — md5, string→int conversion, binary-string length —
so the exact same estimate comes out of either engine:

  h       = first 15 hex chars of md5(value)  → 60-bit integer
  bucket  = h mod m            (m = 2^p registers)
  w       = h div m            (60-p payload bits)
  rho     = (60-p) - msb(w) + 1, where msb = length(bin(w)) — integer-
            exact on both engines (no float log)
  M_j     = max rho per bucket
  S       = Σ 2^(-M_j) over all m registers, computed as exact
            DECIMAL(38,0) sums of 2^(61-M_j) (scaled by 2^61)
  E       = alpha_m · m² / S, with the standard small-range linear
            counting correction.

Everything is integer-exact until the final one-shot double arithmetic on
identical operands, so the 4-dp-rounded estimate is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 61  # 2^(61-M) stays within DECIMAL(38,0) for any register value


def _alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def hll_distinct(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """One-row DataFrame (n_distinct_est double): deterministic HLL
    estimate of COUNT(DISTINCT col).

    Scale shape: one narrow shuffle on the 2^p bucket ids (map-side
    partial max), then a single tiny aggregation — constant memory
    regardless of cardinality, the whole point of the sketch at 100 TB.
    """
    m = 1 << p
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast("long")
    # integer bit ops only — h is a 60-bit value, double round-trips would
    # corrupt the low bits (doubles are exact to 2^53)
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftrightunsigned(h, p)
    msb = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(60 - p + 1)).otherwise(F.lit(60 - p) - msb + 1)

    regs = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )
    agg = regs.agg(
        F.count(F.lit(1)).alias("nonempty"),
        F.sum(F.pow(F.lit(2.0), F.lit(SCALE) - F.col("M")).cast("decimal(38,0)")).alias("s_scaled"),
    )
    two61 = float(1 << SCALE)
    s = (
        F.col("s_scaled").cast("double")
        + (F.lit(m) - F.col("nonempty")).cast("double") * two61
    ) / two61
    raw = F.lit(_alpha(m) * m * m) / s
    zeros = F.lit(m) - F.col("nonempty")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), small).otherwise(raw)
    return agg.select(F.round(est, 4).alias("n_distinct_est"))


def hll_oracle_sql(source_sql: str, col: str, p: int = 10) -> str:
    """The DuckDB twin of hll_distinct — same md5/conv/bin primitives."""
    m = 1 << p
    alpha = _alpha(m)
    return f"""
WITH hashed AS (
  SELECT CAST('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM ({source_sql})
),
rho_t AS (
  SELECT h % {m} AS bucket,
         CASE WHEN h // {m} = 0 THEN {60 - p + 1}
              ELSE {60 - p} - length(bin(h // {m})) + 1 END AS rho
  FROM hashed
),
regs AS (
  SELECT bucket, MAX(rho) AS M FROM rho_t GROUP BY bucket
),
agg AS (
  SELECT COUNT(*) AS nonempty,
         SUM(CAST(POW(2.0, {SCALE} - M) AS DECIMAL(38,0))) AS s_scaled
  FROM regs
)
SELECT ROUND(
  CASE WHEN (CAST({alpha} AS DOUBLE) * {m} * {m}) /
            ((CAST(s_scaled AS DOUBLE) + ({m} - nonempty) * {float(1 << SCALE)}) / {float(1 << SCALE)})
            <= 2.5 * {m}
        AND ({m} - nonempty) > 0
       THEN {float(m)} * LN({float(m)} / CAST({m} - nonempty AS DOUBLE))
       ELSE (CAST({alpha} AS DOUBLE) * {m} * {m}) /
            ((CAST(s_scaled AS DOUBLE) + ({m} - nonempty) * {float(1 << SCALE)}) / {float(1 << SCALE)})
  END, 4) AS n_distinct_est
FROM agg
"""
