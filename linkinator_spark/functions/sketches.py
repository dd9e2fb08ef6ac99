"""Cardinality and frequency sketches over crawl streams.

`hll_cardinality` — per-group HyperLogLog distinct-count (Flajolet et
al. 2007): the sketch a 10^10-URL frontier uses to answer "how many
distinct URLs per host / per shard" without an exact count_distinct
expansion. `cms_estimate` — count-min sketch (Cormode & Muthukrishnan
2005) point-frequency estimates with the guaranteed one-sided error
(est >= exact), the heavy-hitter primitive for hot-host detection.

Both are built ENGINE-EXACTLY from the portable md5-prefix hash
(functions/text.portable_hash64), so a DuckDB oracle replays every
register and cell bit-for-bit — the sketches are value-checked, not
just sanity-checked. The reference has no sketches (it holds its URL
set in memory, /root/reference/src/queue.ts); these belong to the
beyond-the-reference scale tier next to the Bloom/Cuckoo seen-filters.

Scale shapes (100-TB lens):
- HLL register build is groupBy(group, bucket) max — map-side combined,
  at most m rows per group survive the shuffle regardless of input
  size; the per-group fold is m<=2^p rows. No windows, no driver rows.
- CMS cell build is groupBy(row, col) sum over d*w <= a few hundred
  cells — partial aggregation collapses each partition to <=d*w rows,
  so a hot key never serializes a reducer. Queries broadcast the tiny
  sketch.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import portable_hash64, portable_hash64_sql

# alpha_64 * m^2 * 2^CAP for p=6 (m=64, CAP=55), folded ONCE here and
# spliced verbatim into both engines so the double constant is
# bit-identical on each side
_HLL_P = 6
_HLL_M = 1 << _HLL_P          # 64 registers
_HLL_W = 60 - _HLL_P          # md5-prefix hash is 60 bits
_HLL_CAP = _HLL_W + 1         # max rho
_HLL_ALPHA = 0.709            # Flajolet's alpha_64
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_CAP)


def hll_cardinality(
    df: DataFrame, key_col: str, group_cols: list[str],
) -> DataFrame:
    """Per-group HLL distinct estimate with p=6 (64 registers, ~13%
    standard error — the oracle-replayable demo size; raise p for
    production shards).

    Output: (group..., v_zero, s_scaled, est) where `v_zero` is the
    count of untouched registers, `s_scaled` is the integer-exact
    register sum Σ 2^(CAP - M_j) (the whole register state pinned in
    one int64 — two engines agree on it or the sketch differs), and
    `est` is the HLL estimate with the small-range linear-counting
    correction, rounded 6dp.

    The rho computation stays integer-exact in both engines:
    rho = CAP - bitlen(w) via length(regexp_replace(bin(w),'^0+','')),
    which also folds the w=0 -> rho=CAP case (empty binary string).
    """
    h = portable_hash64(F.col(key_col), prefix="hll:")
    bucket = h.bitwiseAND(F.lit(_HLL_M - 1))
    w = F.shiftrightunsigned(h, _HLL_P)
    rho = F.lit(_HLL_CAP) - F.length(
        F.regexp_replace(F.bin(w), "^0+", ""))
    regs = (
        df.select(*group_cols, bucket.alias("_b"), rho.alias("_rho"))
        .groupBy(*group_cols, "_b")
        .agg(F.max("_rho").alias("_m"))
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").alias("_present"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_CAP} - _m)"))
        .alias("_s_present"),
    )
    v_zero = F.lit(_HLL_M) - F.col("_present")
    s_scaled = (F.col("_s_present")
                + v_zero * F.lit(1 << _HLL_CAP).cast("long"))
    raw = F.lit(_HLL_NUM) / s_scaled.cast("double")
    linear = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M))
                                          / v_zero.cast("double"))
    est = F.when((raw <= F.lit(2.5 * _HLL_M)) & (v_zero > 0), linear) \
           .otherwise(raw)
    return per_group.select(
        *group_cols,
        v_zero.cast("long").alias("v_zero"),
        s_scaled.cast("long").alias("s_scaled"),
        F.round(est, 6).alias("est"),
    )


def hll_cardinality_oracle_sql(rel: str, key_expr: str,
                               group_cols: list[str]) -> str:
    """DuckDB twin of `hll_cardinality`: `rel` yields the group columns
    plus whatever `key_expr` reads."""
    g = ", ".join(group_cols)
    h = portable_hash64_sql(key_expr, prefix="hll:")
    return f"""
        with hashed as (
          select {g}, {h} as h from ({rel})
        ),
        regs as (
          select {g}, h & {_HLL_M - 1} as b,
                 max({_HLL_CAP} - length(
                     regexp_replace(bin(h >> {_HLL_P}), '^0+', ''))) as m
          from hashed group by {g}, b
        ),
        per_group as (
          select {g}, count(*) as present,
                 sum((1::BIGINT << ({_HLL_CAP} - m))) as s_present
          from regs group by {g}
        )
        select {g},
               cast({_HLL_M} - present as bigint) as v_zero,
               cast(s_present
                    + ({_HLL_M} - present) * (1::BIGINT << {_HLL_CAP})
                    as bigint) as s_scaled,
               round(case when {_HLL_NUM!r} / (s_present
                              + ({_HLL_M} - present)
                                * (1::BIGINT << {_HLL_CAP}))::DOUBLE
                               <= {2.5 * _HLL_M}
                           and present < {_HLL_M}
                     then {float(_HLL_M)!r}
                          * ln({float(_HLL_M)!r}
                               / ({_HLL_M} - present)::DOUBLE)
                     else {_HLL_NUM!r} / (s_present
                              + ({_HLL_M} - present)
                                * (1::BIGINT << {_HLL_CAP}))::DOUBLE
                     end, 6) as est
        from per_group
    """


def cms_estimate(
    df: DataFrame, key_col: str, d: int = 4, w: int = 64,
) -> DataFrame:
    """Count-min point-frequency estimates for every distinct key:
    (key, est, exact, overcount). `est` is min over `d` hash rows of
    the (row, col) cell sums — always >= the exact count (one-sided
    error, the CMS guarantee pinned by `overcount >= 0`). Exact counts
    ride along for calibration; at scale the caller queries only
    candidate keys against the broadcast sketch and drops `exact`.
    """
    keys = df.select(F.col(key_col).cast("string").alias("key"))
    cells = keys.select(
        "key",
        F.explode(F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(portable_hash64(F.col("key"), prefix=f"cms{r}:"),
                       F.lit(w)).alias("col"))
            for r in range(d)
        ])).alias("_c"),
    ).select("key", "_c.row", "_c.col")
    sketch = cells.groupBy("row", "col").agg(F.count("*").alias("cnt"))
    cand = cells.distinct()
    est = (
        cand.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("key").agg(F.min("cnt").cast("long").alias("est"))
    )
    exact = keys.groupBy("key").agg(F.count("*").cast("long").alias("exact"))
    return (
        est.join(exact, "key")
        .select("key", "est", "exact",
                (F.col("est") - F.col("exact")).cast("long")
                .alias("overcount"))
    )


def cms_estimate_oracle_sql(rel: str, key_expr: str,
                            d: int = 4, w: int = 64) -> str:
    """DuckDB twin of `cms_estimate`: `rel` yields whatever `key_expr`
    reads; keys compare as strings."""
    hash_cols = ", ".join(
        f"{portable_hash64_sql('key', prefix=f'cms{r}:')} % {w} as c{r}"
        for r in range(d))
    cell_union = " union all ".join(
        f"select key, {r} as row, c{r} as col from hashed"
        for r in range(d))
    return f"""
        with keyed as (
          select cast({key_expr} as varchar) as key from ({rel})
        ),
        hashed as (
          select key, {hash_cols} from keyed
        ),
        cells as ({cell_union}),
        sketch as (
          select row, col, count(*) as cnt from cells group by row, col
        ),
        est as (
          select key, min(cnt) as est
          from (select distinct key, row, col from cells) cand
          join sketch using (row, col)
          group by key
        ),
        exact as (
          select key, count(*) as exact from keyed group by key
        )
        select key, cast(est as bigint) as est,
               cast(exact as bigint) as exact,
               cast(est - exact as bigint) as overcount
        from est join exact using (key)
    """
