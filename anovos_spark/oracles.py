"""DuckDB oracle SQL for every query in ``anovos_spark.queries``.

Each SQL string runs on DuckDB with the testdata parquet tables registered
as views (region nation customer supplier part orders lineitem events
documents embeddings).  Aliases match the Spark-side column names exactly;
floats are rounded to 6 decimals on BOTH sides to absorb summation-order
differences (6 instead of 4: with the testdata denominators no ratio can
land exactly on a .5 boundary at 1e-6, so HALF_UP-vs-C-round divergence
cannot occur).
"""

from __future__ import annotations

from anovos_spark.queries import LINEITEM_DISCRETE, LINEITEM_NUM

LINEITEM_ALL = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def _union(parts: list[str]) -> str:
    return "\nUNION ALL\n".join(parts)


def global_summary_sql() -> str:
    return (
        "SELECT 'rows_count' AS metric, CAST(count(*) AS VARCHAR) AS value FROM lineitem\n"
        "UNION ALL SELECT 'columns_count', '11'\n"
        "UNION ALL SELECT 'numcols_count', '8'\n"
        "UNION ALL SELECT 'catcols_count', '2'\n"
        "UNION ALL SELECT 'othercols_count', '1'"
    )


def counts_sql() -> str:
    parts = [
        f"SELECT '{c}' AS attribute, count({c}) AS fill_count, "
        f"round(CAST(count({c}) AS DOUBLE)/count(*), 6) AS fill_pct, "
        f"count(*) - count({c}) AS missing_count, "
        f"round(1.0 - CAST(count({c}) AS DOUBLE)/count(*), 6) AS missing_pct "
        f"FROM lineitem"
        for c in LINEITEM_ALL
    ]
    return _union(parts)


def nonzero_sql() -> str:
    parts = [
        f"SELECT '{c}' AS attribute, "
        f"count(CASE WHEN {c} != 0 THEN 1 END) AS nonzero_count, "
        f"round(CAST(count(CASE WHEN {c} != 0 THEN 1 END) AS DOUBLE)/count(*), 6) AS nonzero_pct "
        f"FROM lineitem"
        for c in LINEITEM_NUM
    ]
    return _union(parts)


def central_tendency_sql() -> str:
    nums = _union(
        [
            f"SELECT '{c}' AS attribute, "
            f"round(CAST(sum(CAST({c} AS DECIMAL(18,6))) AS DOUBLE)/count({c}), 6) AS mean, "
            f"round(CAST(quantile_cont({c}, 0.5) AS DOUBLE), 6) AS median FROM lineitem"
            for c in LINEITEM_NUM
        ]
    )
    longv = _union(
        [
            f"SELECT '{c}' AS attribute, CAST({c} AS VARCHAR) AS value "
            f"FROM lineitem WHERE {c} IS NOT NULL"
            for c in LINEITEM_DISCRETE
        ]
    )
    return f"""
WITH nums AS ({nums}),
longv AS ({longv}),
cnts AS (SELECT attribute, value, count(*) AS cnt FROM longv GROUP BY 1, 2),
nn AS (SELECT attribute, sum(cnt) AS nonnull FROM cnts GROUP BY 1),
modes AS (
  SELECT attribute, value AS mode, cnt FROM (
    SELECT attribute, value, cnt,
           row_number() OVER (PARTITION BY attribute ORDER BY cnt DESC, value ASC) AS rn
    FROM cnts) t
  WHERE rn = 1
),
mstats AS (
  SELECT m.attribute, m.mode,
         round(CAST(m.cnt AS DOUBLE)/nn.nonnull, 6) AS mode_pct
  FROM modes m JOIN nn ON m.attribute = nn.attribute
)
SELECT COALESCE(n.attribute, s.attribute) AS attribute,
       n.mean, n.median, s.mode, s.mode_pct
FROM nums n FULL JOIN mstats s ON n.attribute = s.attribute
"""


def cardinality_sql() -> str:
    parts = [
        f"SELECT '{c}' AS attribute, count(DISTINCT {c}) AS unique_values, "
        f"round(CAST(count(DISTINCT {c}) AS DOUBLE)/count({c}), 6) AS \"IDness\" "
        f"FROM lineitem"
        for c in LINEITEM_ALL
    ]
    return _union(parts)


def approx_stats_band_sql() -> str:
    # the Spark query asserts its own approx-vs-exact error bands and emits
    # indicator columns; the oracle is the all-ones literal per attribute
    parts = [
        f"SELECT '{c}' AS attribute, 1 AS pctl_within_band, 1 AS distinct_within_band"
        for c in sorted(LINEITEM_NUM)
    ]
    return _union(parts) + " ORDER BY attribute"


def dispersion_sql() -> str:
    # decimal-exact s1/s2 then the same double expression the engine uses:
    # var = (s2 − s1²/n)/(n−1) — bit-identical at any parallelism
    parts = [
        f"""SELECT attribute,
 round(sqrt(var), 6) AS stddev, round(var, 6) AS variance,
 round(sqrt(var)/(s1/n), 6) AS cov, round(iqr, 6) AS "IQR", round(rng, 6) AS "range"
FROM (SELECT '{c}' AS attribute, (s2 - s1*s1/n)/(n-1) AS var, s1, n, iqr, rng
      FROM (SELECT CAST(sum(CAST({c} AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                   CAST(sum(CAST({c} AS DECIMAL(19,6)) * CAST({c} AS DECIMAL(19,6))) AS DOUBLE) AS s2,
                   CAST(count({c}) AS DOUBLE) AS n,
                   CAST(quantile_cont({c}, 0.75) - quantile_cont({c}, 0.25) AS DOUBLE) AS iqr,
                   CAST(max({c}) - min({c}) AS DOUBLE) AS rng
            FROM lineitem) a) b"""
        for c in LINEITEM_NUM
    ]
    return _union(parts)


_PCTS = [
    ("pct_min", None),
    ("pct_1", 0.01),
    ("pct_5", 0.05),
    ("pct_10", 0.10),
    ("pct_25", 0.25),
    ("pct_50", 0.50),
    ("pct_75", 0.75),
    ("pct_90", 0.90),
    ("pct_95", 0.95),
    ("pct_99", 0.99),
    ("pct_max", None),
]


def percentiles_sql() -> str:
    parts = []
    for c in LINEITEM_NUM:
        exprs = []
        for name, p in _PCTS:
            if name == "pct_min":
                exprs.append(f"round(CAST(min({c}) AS DOUBLE), 6) AS {name}")
            elif name == "pct_max":
                exprs.append(f"round(CAST(max({c}) AS DOUBLE), 6) AS {name}")
            else:
                exprs.append(f"round(CAST(quantile_cont({c}, {p}) AS DOUBLE), 6) AS {name}")
        parts.append(f"SELECT '{c}' AS attribute, " + ", ".join(exprs) + " FROM lineitem")
    return _union(parts)


def shape_sql() -> str:
    # Spark semantics: population skewness m3/m2^1.5, excess kurtosis m4/m2^2 - 3
    parts = [
        f"""SELECT '{c}' AS attribute,
 round(m3/pow(m2, 1.5), 6) AS skewness,
 round(m4/pow(m2, 2) - 3, 6) AS kurtosis
FROM (SELECT avg(pow({c} - mu, 3)) AS m3, avg(pow({c} - mu, 2)) AS m2,
             avg(pow({c} - mu, 4)) AS m4
      FROM lineitem, (SELECT avg({c}) AS mu FROM lineitem) s)"""
        for c in LINEITEM_NUM
    ]
    return _union(parts)


# --------------------------------------------------------------------------- #
# quality checker oracles
# --------------------------------------------------------------------------- #
def duplicates_sql() -> str:
    sub = "SELECT DISTINCT l_suppkey, l_returnflag, l_linestatus FROM lineitem"
    return f"""
SELECT 'rows_count' AS metric, count(*)::BIGINT AS value FROM lineitem
UNION ALL
SELECT 'unique_rows_count', (SELECT count(*) FROM ({sub}) u)::BIGINT
UNION ALL
SELECT 'duplicate_rows', (count(*) - (SELECT count(*) FROM ({sub}) u))::BIGINT FROM lineitem
"""


def null_rows_sql() -> str:
    nc = " + ".join(f"({c} IS NULL)::INT" for c in LINEITEM_ALL)
    n = len(LINEITEM_ALL)
    return f"""
WITH t AS (SELECT ({nc}) AS nc FROM lineitem)
SELECT nc::BIGINT AS null_cols_count,
       count(*)::BIGINT AS row_count,
       round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM t), 6) AS row_pct,
       (nc >= 0.8 * {n})::INT AS flagged
FROM t GROUP BY nc
"""


def outliers_sql() -> str:
    # min_validation=2 of 3 methods == median of the 3 candidate bounds
    parts = []
    for c in LINEITEM_NUM:
        parts.append(f"""
SELECT '{c}' AS attribute,
  (CASE WHEN b.pl = b.pu THEN 0 ELSE count(CASE WHEN t.{c} < b.lb THEN 1 END) END)::BIGINT AS lower_outliers,
  (CASE WHEN b.pl = b.pu THEN 0 ELSE count(CASE WHEN t.{c} > b.ub THEN 1 END) END)::BIGINT AS upper_outliers
FROM lineitem t, (
  SELECT pl, pu,
         list_sort([pl, mu - 3*sd, q1 - 1.5*(q3-q1)])[2] AS lb,
         list_sort([pu, mu + 3*sd, q3 + 1.5*(q3-q1)])[2] AS ub
  FROM (SELECT quantile_cont({c}, 0.05) AS pl, quantile_cont({c}, 0.95) AS pu,
               quantile_cont({c}, 0.25) AS q1, quantile_cont({c}, 0.75) AS q3,
               avg({c}) AS mu, stddev_samp({c}) AS sd
        FROM lineitem) s
) b
GROUP BY b.pl, b.pu, b.lb, b.ub""")
    return _union(parts)


ORDERS_DISCRETE = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def idness_sql() -> str:
    parts = [
        f"SELECT '{c}' AS attribute, count(DISTINCT {c})::BIGINT AS unique_values, "
        f"round(CAST(count(DISTINCT {c}) AS DOUBLE)/count({c}), 6) AS \"IDness\", "
        f"(round(CAST(count(DISTINCT {c}) AS DOUBLE)/count({c}), 6) >= 0.8)::INT AS flagged "
        f"FROM orders"
        for c in ORDERS_DISCRETE
    ]
    return _union(parts)


def biasedness_sql() -> str:
    longv = _union(
        [
            f"SELECT '{c}' AS attribute, CAST({c} AS VARCHAR) AS value "
            f"FROM lineitem WHERE {c} IS NOT NULL"
            for c in LINEITEM_DISCRETE
        ]
    )
    return f"""
WITH longv AS ({longv}),
cnts AS (SELECT attribute, value, count(*) AS cnt FROM longv GROUP BY 1, 2),
nn AS (SELECT attribute, sum(cnt) AS nonnull FROM cnts GROUP BY 1),
modes AS (
  SELECT attribute, value AS mode, cnt FROM (
    SELECT attribute, value, cnt,
           row_number() OVER (PARTITION BY attribute ORDER BY cnt DESC, value ASC) AS rn
    FROM cnts) t
  WHERE rn = 1
)
SELECT m.attribute, m.mode,
       round(CAST(m.cnt AS DOUBLE)/nn.nonnull, 6) AS mode_pct,
       (round(CAST(m.cnt AS DOUBLE)/nn.nonnull, 6) >= 0.8)::INT AS flagged
FROM modes m JOIN nn ON m.attribute = nn.attribute
"""


CUSTOMER_DISCRETE = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]


def invalid_entries_sql() -> str:
    from anovos_spark.operators.quality import (
        NULL_SYNONYMS,
        _CONSEC_RE,
        _REPEAT_RE,
        _SPECIAL_RE,
    )

    syns = ", ".join(f"'{s}'" for s in NULL_SYNONYMS)
    parts = []
    for c in CUSTOMER_DISCRETE:
        v = f"lower(trim(CAST({c} AS VARCHAR)))"
        cond = (
            f"({v} IN ({syns}) OR regexp_matches({v}, '{_SPECIAL_RE}') "
            f"OR regexp_matches({v}, '{_REPEAT_RE}') "
            f"OR regexp_matches({v}, '{_CONSEC_RE}'))"
        )
        parts.append(
            f"SELECT '{c}' AS attribute, "
            f"count(CASE WHEN {c} IS NOT NULL AND {cond} THEN 1 END)::BIGINT AS invalid_count, "
            f"round(CAST(count(CASE WHEN {c} IS NOT NULL AND {cond} THEN 1 END) AS DOUBLE)/count(*), 6) AS invalid_pct "
            f"FROM customer"
        )
    return _union(parts)


# --------------------------------------------------------------------------- #
# transformer oracles
# --------------------------------------------------------------------------- #
BIN_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def binning_eqrange_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS attribute,
 CAST(greatest(1, least(10, floor(({c} - b.mn)/((b.mx - b.mn)/10)) + 1)) AS INT) AS bin,
 count(*)::BIGINT AS bin_count
FROM lineitem, (SELECT CAST(min({c}) AS DOUBLE) AS mn, CAST(max({c}) AS DOUBLE) AS mx FROM lineitem) b
GROUP BY 1, 2"""
        for c in BIN_COLS
    ]
    return _union(parts)


def binning_eqfreq_sql() -> str:
    cuts = ", ".join(
        f"quantile_cont(l_quantity, {i/10}) AS c{i}" for i in range(1, 10)
    )
    add = " + ".join(f"(l_quantity > b.c{i})::INT" for i in range(1, 10))
    return f"""
SELECT CAST(1 + {add} AS INT) AS bin, count(*)::BIGINT AS bin_count
FROM lineitem, (SELECT {cuts} FROM lineitem) b
GROUP BY 1"""


def label_encoding_sql() -> str:
    longv = _union(
        [
            f"SELECT '{c}' AS attribute, {c} AS value FROM lineitem WHERE {c} IS NOT NULL"
            for c in ["l_returnflag", "l_linestatus"]
        ]
    )
    return f"""
WITH longv AS ({longv}),
cnts AS (SELECT attribute, value, count(*) AS cnt FROM longv GROUP BY 1, 2)
SELECT attribute, value,
       CAST(row_number() OVER (PARTITION BY attribute ORDER BY cnt DESC, value ASC) - 1 AS INT) AS index
FROM cnts"""


def target_encoding_sql() -> str:
    return """
SELECT 'o_orderpriority' AS attribute, o_orderpriority AS value,
       round(avg((o_orderstatus = 'F')::INT), 6) AS rate
FROM orders WHERE o_orderpriority IS NOT NULL
GROUP BY 2"""


def z_standardization_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS attribute,
 round((mn - mu)/sd, 6) AS z_min, round((mx - mu)/sd, 6) AS z_max
FROM (SELECT CAST(min({c}) AS DOUBLE) mn, CAST(max({c}) AS DOUBLE) mx,
             avg({c}) mu, stddev_samp({c}) sd FROM lineitem) s"""
        for c in LINEITEM_NUM
    ]
    return _union(parts)


def normalization_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS attribute,
 round((mn - mn)/(mx - mn), 6) AS n_min, round((mx - mn)/(mx - mn), 6) AS n_max
FROM (SELECT CAST(min({c}) AS DOUBLE) mn, CAST(max({c}) AS DOUBLE) mx FROM lineitem) s"""
        for c in LINEITEM_NUM
    ]
    return _union(parts)


def imputation_mmm_sql() -> str:
    return """
WITH t AS (SELECT CASE WHEN l_orderkey % 10 = 0 THEN NULL ELSE l_quantity END AS q,
                  l_orderkey FROM lineitem),
med AS (SELECT quantile_cont(q, 0.5) AS m FROM t)
SELECT 'l_quantity' AS attribute,
       sum((l_orderkey % 10 = 0)::INT)::BIGINT AS imputed_rows,
       round(CAST(sum(CAST(COALESCE(q, m) AS DECIMAL(18,6))) AS DOUBLE)/count(COALESCE(q, m)), 6) AS mean_after
FROM t, med"""


def outlier_categories_sql() -> str:
    return """
WITH cnts AS (SELECT o_orderpriority AS value, count(*) AS cnt FROM orders
              WHERE o_orderpriority IS NOT NULL GROUP BY 1),
ranked AS (SELECT value, cnt,
                  row_number() OVER (ORDER BY cnt DESC, value ASC) AS rn,
                  CAST(sum(cnt) OVER (ORDER BY cnt DESC, value ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / (SELECT sum(cnt) FROM cnts) AS cum
           FROM cnts),
kept AS (SELECT value FROM (
           SELECT value, rn, lag(cum, 1, 0.0) OVER (ORDER BY rn) AS prev FROM ranked) t
         WHERE prev < 0.6 AND rn <= 50)
SELECT CASE WHEN o.o_orderpriority IN (SELECT value FROM kept)
            THEN o.o_orderpriority ELSE 'outlier_categories' END AS value,
       count(*)::BIGINT AS cnt
FROM orders o GROUP BY 1"""


def feature_math_sql() -> str:
    return """
SELECT 'avg_ln_quantity' AS metric, round(avg(ln(l_quantity)), 6) AS value FROM lineitem
UNION ALL SELECT 'avg_sqrt_price', round(avg(sqrt(l_extendedprice)), 6) FROM lineitem
UNION ALL SELECT 'avg_sq_discount', round(avg(pow(l_discount, 2)), 6) FROM lineitem
UNION ALL SELECT 'avg_exp_tax', round(avg(exp(l_tax)), 6) FROM lineitem"""


def q1_pricing_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2))) * (1::DECIMAL(4,2) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)/count(*) AS avg_disc,
  count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY 1, 2"""


# --------------------------------------------------------------------------- #
# association & drift/stability oracles
# --------------------------------------------------------------------------- #
def correlation_sql() -> str:
    import itertools

    parts = [
        f"SELECT '{c}' AS attribute1, '{c}' AS attribute2, 1.0 AS corr FROM (SELECT 1) one"
        for c in LINEITEM_NUM
    ]
    for a, b in itertools.combinations(LINEITEM_NUM, 2):
        parts.append(
            f"SELECT '{a}', '{b}', round(corr({a}, {b}), 6) FROM lineitem"
        )
        parts.append(
            f"SELECT '{b}', '{a}', round(corr({a}, {b}), 6) FROM lineitem"
        )
    return _union(parts)


def _orders_iv_long() -> str:
    """Shared IV/IG long CTE: equal-frequency-10 bin the numeric attrs on
    orders, keep o_orderpriority raw; value as VARCHAR; y = (status='F')."""
    num = ["o_custkey", "o_totalprice"]
    parts = []
    for c in num:
        cuts = ", ".join(f"quantile_cont({c}, {i/10}) AS c{i}" for i in range(1, 10))
        add = " + ".join(f"({c} > b.c{i})::INT" for i in range(1, 10))
        parts.append(
            f"SELECT '{c}' AS attribute, CAST(1 + {add} AS VARCHAR) AS value, "
            f"(o_orderstatus = 'F')::INT AS y "
            f"FROM orders, (SELECT {cuts} FROM orders) b"
        )
    parts.append(
        "SELECT 'o_orderpriority', o_orderpriority, (o_orderstatus = 'F')::INT FROM orders"
    )
    return _union(parts)


def iv_sql() -> str:
    return f"""
WITH longv AS ({_orders_iv_long()}),
agg AS (SELECT attribute, value, sum(1 - y) AS l0, sum(y) AS l1 FROM longv GROUP BY 1, 2),
tot AS (SELECT attribute, sum(l0) AS l0t, sum(l1) AS l1t FROM agg GROUP BY 1),
woe AS (
  SELECT a.attribute,
         CASE WHEN a.l0 > 0 AND a.l1 > 0
              THEN ln((CAST(a.l0 AS DOUBLE)/t.l0t)/(CAST(a.l1 AS DOUBLE)/t.l1t))
              ELSE ln(((a.l0 + 0.5)/t.l0t)/((a.l1 + 0.5)/t.l1t)) END AS woe,
         (CAST(a.l0 AS DOUBLE)/t.l0t - CAST(a.l1 AS DOUBLE)/t.l1t) AS diff
  FROM agg a JOIN tot t ON a.attribute = t.attribute)
SELECT attribute, round(sum(woe * diff), 6) AS iv FROM woe GROUP BY 1"""


def ig_sql() -> str:
    return f"""
WITH longv AS ({_orders_iv_long()}),
tot AS (SELECT avg(y) AS p FROM (SELECT (o_orderstatus = 'F')::INT AS y FROM orders) t),
te AS (SELECT CASE WHEN p > 0 AND p < 1
                   THEN -(p * log2(p) + (1 - p) * log2(1 - p)) ELSE 0.0 END AS h FROM tot),
agg AS (SELECT attribute, value, sum(y) AS ev, count(*) AS n FROM longv GROUP BY 1, 2),
attr_tot AS (SELECT attribute, sum(n) AS nt FROM agg GROUP BY 1),
ent AS (
  SELECT a.attribute,
         CASE WHEN CAST(a.ev AS DOUBLE)/a.n > 0 AND CAST(a.ev AS DOUBLE)/a.n < 1
              THEN -(CAST(a.n AS DOUBLE)/t.nt) *
                   ((CAST(a.ev AS DOUBLE)/a.n) * log2(CAST(a.ev AS DOUBLE)/a.n)
                    + (1 - CAST(a.ev AS DOUBLE)/a.n) * log2(1 - CAST(a.ev AS DOUBLE)/a.n))
              ELSE 0.0 END AS e
  FROM agg a JOIN attr_tot t ON a.attribute = t.attribute)
SELECT attribute, round((SELECT h FROM te) - sum(e), 6) AS ig FROM ent GROUP BY 1"""


DRIFT_CAT = ["l_returnflag", "l_linestatus"]


def drift_sql() -> str:
    num_parts_s, num_parts_t = [], []
    for c in LINEITEM_NUM:
        bexpr = f"CAST(CAST(greatest(1, least(10, floor(({c} - b.mn)/((b.mx - b.mn)/10)) + 1)) AS INT) AS VARCHAR)"
        bounds = (
            f"(SELECT CAST(min({c}) AS DOUBLE) AS mn, CAST(max({c}) AS DOUBLE) AS mx "
            f"FROM lineitem WHERE l_orderkey % 2 = 0) b"
        )
        num_parts_s.append(
            f"SELECT '{c}' AS attribute, COALESCE({bexpr}, '-1') AS bin "
            f"FROM lineitem, {bounds} WHERE l_orderkey % 2 = 0"
        )
        num_parts_t.append(
            f"SELECT '{c}' AS attribute, COALESCE({bexpr}, '-1') AS bin "
            f"FROM lineitem, {bounds} WHERE l_orderkey % 2 = 1"
        )
    for c in DRIFT_CAT:
        num_parts_s.append(
            f"SELECT '{c}', COALESCE({c}, '-1') FROM lineitem WHERE l_orderkey % 2 = 0"
        )
        num_parts_t.append(
            f"SELECT '{c}', COALESCE({c}, '-1') FROM lineitem WHERE l_orderkey % 2 = 1"
        )
    long_s = _union(num_parts_s)
    long_t = _union(num_parts_t)
    return f"""
WITH ns AS (SELECT count(*) AS n FROM lineitem WHERE l_orderkey % 2 = 0),
nt AS (SELECT count(*) AS n FROM lineitem WHERE l_orderkey % 2 = 1),
long_s AS ({long_s}),
long_t AS ({long_t}),
p AS (SELECT attribute, bin, CAST(count(*) AS DOUBLE)/(SELECT n FROM ns) AS p FROM long_s GROUP BY 1, 2),
q AS (SELECT attribute, bin, CAST(count(*) AS DOUBLE)/(SELECT n FROM nt) AS q FROM long_t GROUP BY 1, 2),
xy AS (
  SELECT COALESCE(p.attribute, q.attribute) AS attribute,
         COALESCE(p.bin, q.bin) AS bin,
         CASE WHEN p.p IS NULL OR p.p = 0 THEN 0.0001 ELSE p.p END AS p,
         CASE WHEN q.q IS NULL OR q.q = 0 THEN 0.0001 ELSE q.q END AS q
  FROM p FULL JOIN q ON p.attribute = q.attribute AND p.bin = q.bin),
cum AS (
  SELECT attribute, p, q,
         sum(p) OVER (PARTITION BY attribute
                      ORDER BY COALESCE(TRY_CAST(bin AS INT), 2147483647), bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         sum(q) OVER (PARTITION BY attribute
                      ORDER BY COALESCE(TRY_CAST(bin AS INT), 2147483647), bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq
  FROM xy)
SELECT attribute,
       round(sum((p - q) * ln(p/q)), 6) AS "PSI",
       round((sum(p * ln(p/((p+q)/2))) + sum(q * ln(q/((p+q)/2))))/2, 6) AS "JSD",
       round(sqrt(sum(pow(sqrt(p) - sqrt(q), 2))/2), 6) AS "HD",
       round(max(abs(cp - cq)), 6) AS "KS",
       (round(sum((p - q) * ln(p/q)), 6) > 0.1 OR
        round((sum(p * ln(p/((p+q)/2))) + sum(q * ln(q/((p+q)/2))))/2, 6) > 0.1 OR
        round(sqrt(sum(pow(sqrt(p) - sqrt(q), 2))/2), 6) > 0.1 OR
        round(max(abs(cp - cq)), 6) > 0.1)::INT AS flagged
FROM cum GROUP BY attribute"""


STAB_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STAB_YEARS = [1995, 1996, 1997, 1998, 1999, 2000]


def stability_sql() -> str:
    yr_filter = ", ".join(str(y) for y in STAB_YEARS)
    per_parts = []
    for c in STAB_COLS:
        per_parts.append(f"""
SELECT '{c}' AS attribute, s.y, s.mean, s.sd, s.kurt FROM (
  SELECT yr.y, avg(v) AS mean, stddev_samp(v) AS sd,
         avg(pow(v - m.mu, 4))/pow(avg(pow(v - m.mu, 2)), 2) AS kurt
  FROM (SELECT year(l_shipdate) AS y, {c} AS v FROM lineitem
        WHERE year(l_shipdate) IN ({yr_filter})) yr
  JOIN (SELECT year(l_shipdate) AS y, avg({c}) AS mu FROM lineitem
        WHERE year(l_shipdate) IN ({yr_filter}) GROUP BY 1) m ON yr.y = m.y
  GROUP BY yr.y) s""")
    periods = _union(per_parts)
    return f"""
WITH periods AS ({periods}),
cvs AS (
  SELECT attribute,
         round(stddev_samp(mean)/avg(mean), 6) AS mean_cv,
         round(stddev_samp(sd)/avg(sd), 6) AS stddev_cv,
         round(stddev_samp(kurt)/avg(kurt), 6) AS kurtosis_cv
  FROM periods GROUP BY 1),
scored AS (
  SELECT attribute, mean_cv, stddev_cv, kurtosis_cv,
         CASE WHEN abs(mean_cv) < 0.03 THEN 4.0 WHEN abs(mean_cv) < 0.1 THEN 3.0
              WHEN abs(mean_cv) < 0.2 THEN 2.0 WHEN abs(mean_cv) < 0.5 THEN 1.0 ELSE 0.0 END AS mean_si,
         CASE WHEN abs(stddev_cv) < 0.03 THEN 4.0 WHEN abs(stddev_cv) < 0.1 THEN 3.0
              WHEN abs(stddev_cv) < 0.2 THEN 2.0 WHEN abs(stddev_cv) < 0.5 THEN 1.0 ELSE 0.0 END AS stddev_si,
         CASE WHEN abs(kurtosis_cv) < 0.03 THEN 4.0 WHEN abs(kurtosis_cv) < 0.1 THEN 3.0
              WHEN abs(kurtosis_cv) < 0.2 THEN 2.0 WHEN abs(kurtosis_cv) < 0.5 THEN 1.0 ELSE 0.0 END AS kurtosis_si
  FROM cvs)
SELECT attribute, mean_cv, stddev_cv, kurtosis_cv, mean_si, stddev_si, kurtosis_si,
       round(mean_si * 0.5 + stddev_si * 0.3 + kurtosis_si * 0.2, 4) AS stability_index,
       (round(mean_si * 0.5 + stddev_si * 0.3 + kurtosis_si * 0.2, 4) < 1.0)::INT AS flagged
FROM scored"""


# --------------------------------------------------------------------------- #
# training-data extension oracles (text / dedup / similarity / multimodal)
# --------------------------------------------------------------------------- #
_TOKS = "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '')"
_TOKS_RAW = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')"
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
# md5-hex(8) → bigint, identical to the engine's F.conv(substr(md5,1,8),16,10)
_HEX2INT = (
    "list_sum(list_transform(generate_series(1, 8), "
    "i -> (strpos('0123456789abcdef', substr({h}, i, 1)) - 1) "
    "* CAST(power(16, 8 - i) AS BIGINT)))"
)


def _hex2int(h: str, n_chars: int) -> str:
    """md5-hex(n) → bigint, identical to F.conv(substr(md5,1,n),16,10).
    n_chars <= 15 keeps the value inside a signed 64-bit long on both
    engines (powers of 16 up to 16^14 are exact in the double that
    DuckDB's power() returns)."""
    return (
        f"list_sum(list_transform(generate_series(1, {n_chars}), "
        f"i -> (strpos('0123456789abcdef', substr({h}, i, 1)) - 1) "
        f"* CAST(power(16, {n_chars} - i) AS BIGINT)))"
    )


def text_statistics_sql() -> str:
    return f"""
SELECT doc_id,
  length(text)::BIGINT AS n_chars,
  len({_TOKS_RAW})::BIGINT AS n_tokens,
  round(CAST(list_sum(list_transform({_TOKS_RAW}, x -> length(x))) AS DOUBLE)
        / len({_TOKS_RAW}), 6) AS avg_token_len,
  round(CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
        / length(text), 6) AS punct_ratio,
  round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        / length(text), 6) AS digit_ratio,
  round(CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        / length(text), 6) AS space_ratio
FROM documents"""


def quality_score_sql() -> str:
    from anovos_spark.operators.text import STOPWORDS_EN

    stops = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
WITH t AS (
  SELECT doc_id,
    len({_TOKS})::BIGINT AS n_tokens,
    round(CAST(len(list_filter({_TOKS}, x -> x IN ({stops}))) AS DOUBLE)
          / len({_TOKS}), 6) AS stop_ratio,
    CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
          / len({_TOKS}) AS avg_len,
    CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
          / length(text) AS punct_ratio
  FROM documents),
g AS (
  SELECT doc_id, n_tokens, stop_ratio,
         ((n_tokens >= 5)::INT + (avg_len <= 15.0)::INT
          + (punct_ratio <= 0.3)::INT + (stop_ratio >= 0.01)::INT) / 4.0 AS score
  FROM t)
SELECT doc_id, n_tokens, stop_ratio AS stopword_ratio,
       round(score, 6) AS quality_score, (score = 1.0)::INT AS keep
FROM g"""


def token_counting_sql() -> str:
    from anovos_spark.operators.text import BPE_ISH_RE

    pat = BPE_ISH_RE.replace("\\", "\\\\").replace("'", "''")
    return f"""
WITH t AS (
  SELECT lang,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS ws_tokens,
         len(regexp_extract_all(lower(text), '{pat}')) AS bpe_tokens
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(ws_tokens)::BIGINT AS total_ws_tokens,
       sum(bpe_tokens)::BIGINT AS total_bpe_tokens,
       round(avg(bpe_tokens), 6) AS avg_bpe_tokens
FROM t GROUP BY 1"""


def language_id_sql() -> str:
    from anovos_spark.operators.text import LANG_PROFILES

    score_exprs = []
    for lang in sorted(LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        score_exprs.append(
            f"round(CAST(len(list_filter({_TOKS}, x -> x IN ({words}))) AS DOUBLE)"
            f" / len({_TOKS}), 6) AS s_{lang}"
        )
    return f"""
WITH s AS (SELECT doc_id, {', '.join(score_exprs)} FROM documents),
p AS (
  SELECT doc_id,
    CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
         WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
         WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
         WHEN s_en >= s_de THEN 'en'
         ELSE 'de' END AS pred_lang
  FROM s)
SELECT pred_lang, count(*)::BIGINT AS n_docs FROM p GROUP BY 1"""


def exact_dedup_sql() -> str:
    # the query doubles the corpus (union with itself): every fingerprint
    # group has 2× its in-corpus multiplicity.  GROUP BY, don't assume
    # multiplicity 1 — sf0.1's synthetic corpus DOES contain docs that
    # collide after normalization (caught by the sf0.1 cross-scale sweep)
    return f"""
SELECT md5({_NORM}) AS fingerprint,
       2 * count(*) AS n_docs,
       min(doc_id) AS keep_id
FROM documents
GROUP BY 1"""


# word 3-gram shingles over the normalized text (n = normalized column)
_GRAMS = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(str_split(n, ' ')) - 2, 1)), "
    "i -> array_to_string(list_slice(str_split(n, ' '), i, i + 2), ' ')))"
)


def _jaccard_pairs_sql(threshold: float) -> str:
    return f"""
WITH nd AS (SELECT doc_id, {_NORM} AS n FROM documents),
docs AS (SELECT doc_id AS id, {_GRAMS} AS grams FROM nd),
sized AS (SELECT id, grams, len(grams) AS n_grams FROM docs),
ex AS (SELECT id, n_grams, unnest(grams) AS g FROM sized),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common,
         min(a.n_grams) AS na, min(b.n_grams) AS nb
  FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id
  GROUP BY 1, 2)
SELECT id_a, id_b, round(CAST(common AS DOUBLE)/(na + nb - common), 6) AS jaccard
FROM pairs
WHERE round(CAST(common AS DOUBLE)/(na + nb - common), 6) >= {threshold}"""


def ngram_jaccard_sql() -> str:
    return _jaccard_pairs_sql(0.7)


def dedup_components_sql() -> str:
    """Transitive closure of the exact Jaccard pairs via a recursive CTE;
    component = min reachable id (same canonical-survivor convention as
    the distributed min-label propagation)."""
    inner = _jaccard_pairs_sql(0.7).strip()
    return f"""
WITH RECURSIVE p AS ({inner}),
edges AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS id, least(src, min(dst)) AS component
FROM reach GROUP BY src"""


def dedup_apply_sql() -> str:
    """Survivor per component: closure CTE + LEFT JOIN (singletons keep
    their own id) + QUALIFY row_number on (n_chars DESC, doc_id ASC) —
    the same representative rule as apply_dedup(quality_col='n_chars')."""
    inner = _jaccard_pairs_sql(0.7).strip()
    return f"""
WITH RECURSIVE p AS ({inner}),
edges AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS id, least(src, min(dst)) AS component
         FROM reach GROUP BY src),
allrows AS (
  SELECT d.doc_id, d.n_chars, coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
SELECT component, doc_id AS survivor_id,
       (count(*) OVER (PARTITION BY component))::BIGINT AS group_size
FROM allrows
QUALIFY row_number() OVER (PARTITION BY component
                           ORDER BY n_chars DESC, doc_id ASC) = 1"""


def leakage_safe_split_sql() -> str:
    """Closure + identical md5 fold CASE on the group key: proves fold
    assignment is component-coherent and engine-independent."""
    inner = _jaccard_pairs_sql(0.7).strip()
    return f"""
WITH RECURSIVE p AS ({inner}),
edges AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS id, least(src, min(dst)) AS component
         FROM reach GROUP BY src),
keyed AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key,
         (CASE WHEN c.component IS NOT NULL THEN 1 ELSE 0 END) AS is_grouped
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
folds AS (
  SELECT *, CASE WHEN substring(md5(split_key::VARCHAR || '|#42'), 1, 4) < 'cccc'
                 THEN 'train' ELSE 'test' END AS split
  FROM keyed)
SELECT split, is_grouped::INT AS is_grouped, count(*)::BIGINT AS n_docs,
       count(DISTINCT split_key)::BIGINT AS n_groups
FROM folds GROUP BY 1, 2"""


def minhash_lsh_sql() -> str:
    # LSH candidates ∩ exact-verify == exact pairs when recall is 100%,
    # which holds on this corpus (asserted continuously by the harness —
    # a recall miss shows up as a row-count mismatch)
    return _jaccard_pairs_sql(0.7)


def _simhash_sig_ctes(bits: int = 60) -> str:
    """Shared tok→hashed→votes→sig CTE chain mirroring
    simhash_signatures: 60-bit md5-derived token hash (15 hex chars —
    widest md5 prefix that fits a signed long on both engines), per-bit
    ±1 majority vote, sign → bit."""
    h = _hex2int("substr(md5(t), 1, 15)" if bits > 32 else "substr(md5(t), 1, 8)",
                 15 if bits > 32 else 8)
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    sim = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST(power(2, {i}) AS BIGINT) ELSE 0 END"
        for i in range(bits)
    )
    return f"""
WITH tok AS (SELECT doc_id AS id, unnest({_TOKS}) AS t FROM documents),
hashed AS (SELECT id, {h} AS h FROM tok),
votes AS (SELECT id, {votes} FROM hashed GROUP BY id),
sig AS (SELECT id, ({sim})::BIGINT AS simhash FROM votes)"""


def simhash_sql() -> str:
    return f"""{_simhash_sig_ctes()}
SELECT id, simhash FROM sig"""


def simhash_pairs_sql() -> str:
    """Brute-force all-pairs hamming over the same md5-vote signatures —
    the exact truth the banded equi-join path must reproduce."""
    return f"""{_simhash_sig_ctes()}
SELECT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sig a JOIN sig b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""


def ann_cosine_sql() -> str:
    dot = (
        "list_sum(list_transform(generate_series(1, len(qv)), "
        "i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))"
    )
    nq = (
        "sqrt(list_sum(list_transform(generate_series(1, len(qv)), "
        "i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))"
    )
    nc = (
        "sqrt(list_sum(list_transform(generate_series(1, len(cv)), "
        "i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))"
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, round({dot}/({nq}*{nc}), 6) AS cos_sim
  FROM q, c WHERE query_id != neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored) t
WHERE rank <= 5"""


def ann_lsh_sql(n_bits: int = 8, n_tables: int = 4, k: int = 5, dim: int = 64) -> str:
    """Faithful SQL mirror of lsh_bucket_topk: the SAME deterministic
    hyperplanes (similarity._hyperplane, counter-based LCG) are inlined as
    literal lists, the same sign-bit bucket construction, bucket equi-join,
    exact cosine re-rank, and tie-break.  Because the algorithm is
    deterministic, the oracle verifies implementation fidelity of the LSH
    path itself — independent of its recall vs brute force."""
    from anovos_spark.operators.similarity import _hyperplane

    def dot(vcol: str, coeffs: list[float]) -> str:
        lit = "[" + ", ".join(repr(c) for c in coeffs) + "]"
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({vcol}[i] AS DOUBLE) * ({lit})[i]))"
        )

    def bucket(vcol: str, t: int) -> str:
        terms = [
            f"CASE WHEN {dot(vcol, _hyperplane(dim, 42, t, b))} > 0 "
            f"THEN {2 ** (n_bits - 1 - b)} ELSE 0 END"
            for b in range(n_bits)
        ]
        return "(" + " + ".join(terms) + ")"

    def sketch_cte(src: str, idc: str, vc: str) -> str:
        sels = [
            f"SELECT {idc}, {vc}, {t} AS t, {bucket(vc, t)} AS bucket FROM {src}"
            for t in range(n_tables)
        ]
        return " UNION ALL ".join(sels)

    dotqc = (
        "list_sum(list_transform(generate_series(1, len(qv)), "
        "i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))"
    )
    nq = (
        "sqrt(list_sum(list_transform(generate_series(1, len(qv)), "
        "i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))"
    )
    nc = (
        "sqrt(list_sum(list_transform(generate_series(1, len(cv)), "
        "i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))"
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
qs AS ({sketch_cte("q", "query_id", "qv")}),
cs AS ({sketch_cte("c", "neighbor_id", "cv")}),
cand AS (
  SELECT DISTINCT query_id, neighbor_id, round({dotqc}/({nq}*{nc}), 6) AS cos_sim
  FROM qs JOIN cs USING (t, bucket)
  WHERE query_id != neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM cand) t
WHERE rank <= {k}"""


def media_metadata_sql() -> str:
    return """
SELECT doc_id AS id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_md5,
       'unknown' AS format,
       0 AS decoded
FROM documents"""


# --------------------------------------------------------------------------- #
# datetime / window / join oracles
# --------------------------------------------------------------------------- #
def time_units_sql() -> str:
    # Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6
    return """
SELECT year(ts)::INT AS ts_year, month(ts)::INT AS ts_month,
       count(*)::BIGINT AS n_events,
       sum(hour(ts))::BIGINT AS sum_hour,
       sum(dayofweek(ts) + 1)::BIGINT AS sum_dow,
       sum(dayofyear(ts))::BIGINT AS sum_doy
FROM events GROUP BY 1, 2"""


def aggregator_sql() -> str:
    return """
SELECT strftime(ts, '%Y-%m-%d') AS ts,
       count(value)::BIGINT AS value_count,
       round(sum(value), 6) AS value_sum,
       round(avg(value), 6) AS value_mean,
       min(value) AS value_min,
       max(value) AS value_max
FROM events GROUP BY 1"""


def window_aggregator_sql() -> str:
    return """
SELECT event_id, user_id,
       round(sum(value) OVER w, 6) AS roll_sum,
       round(avg(value) OVER w, 6) AS roll_mean,
       (count(value) OVER w)::BIGINT AS roll_count
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""


def lagged_ts_sql() -> str:
    return """
SELECT event_id, user_id,
       lag(value, 1) OVER w AS value_lag1,
       round(value - lag(value, 1) OVER w, 6) AS lag_diff
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


def join_enrich_sql() -> str:
    return """
SELECT n_name, count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_totalprice
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1"""


def q3_sql() -> str:
    return """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10"""


# --------------------------------------------------------------------------- #
# geospatial & timeseries-detection oracles
# --------------------------------------------------------------------------- #
_COORDS = """(SELECT c_custkey, c_nationkey,
   CAST(c_custkey % 170 AS DOUBLE) - 85.0 + 0.25 AS lat,
   CAST(c_custkey % 360 AS DOUBLE) - 180.0 + 0.5 AS lon,
   CAST(c_nationkey * 7 % 170 AS DOUBLE) - 85.0 AS lat2,
   CAST(c_nationkey * 13 % 360 AS DOUBLE) - 180.0 AS lon2
 FROM customer)"""


def _hav(lat1, lon1, lat2, lon2):
    return (
        f"2*6371.0088*asin(least(1.0, sqrt("
        f"pow(sin(radians({lat2} - {lat1})/2), 2) + "
        f"cos(radians({lat1}))*cos(radians({lat2}))*"
        f"pow(sin(radians({lon2} - {lon1})/2), 2))))"
    )


def geo_distance_sql() -> str:
    from anovos_spark.operators.geospatial import vincenty_steps

    d = _hav("lat", "lon", "lat2", "lon2")
    # replay the engine's exact unrolled Vincenty program as a CTE chain —
    # identical expression text on both engines (geospatial.vincenty_steps)
    steps = vincenty_steps("lat", "lon", "lat2", "lon2")
    ctes = [f"s0 AS (SELECT * FROM {_COORDS} pts)"]
    for i, (name, expr) in enumerate(steps):
        ctes.append(f"s{i + 1} AS (SELECT *, {expr} AS {name} FROM s{i})")
    return f"""
WITH {', '.join(ctes)}
SELECT c_nationkey, count(*)::BIGINT AS n,
       round(avg({d}), 6) AS avg_dist_km,
       round(min({d}), 6) AS min_dist_km,
       round(max({d}), 6) AS max_dist_km,
       round(avg(v_dist_m/1000.0), 6) AS avg_vinc_km,
       round(max(v_dist_m/1000.0), 6) AS max_vinc_km
FROM s{len(steps)} GROUP BY 1"""


def reverse_geocoding_sql() -> str:
    from anovos_spark.operators.geospatial import COUNTRY_CENTROIDS

    vals = ", ".join(
        f"('{name}', {lat!r}, {lon!r})" for name, lat, lon in COUNTRY_CENTROIDS
    )
    d = _hav("pts.lat", "pts.lon", "ref.rlat", "ref.rlon")
    return f"""
WITH ref(name, rlat, rlon) AS (VALUES {vals}),
cand AS (
  SELECT pts.c_custkey, ref.name, round({d}, 6) AS d,
         row_number() OVER (PARTITION BY pts.c_custkey
                            ORDER BY {d} ASC, ref.name ASC) AS rn
  FROM {_COORDS} pts CROSS JOIN ref
)
SELECT name AS country, count(*)::BIGINT AS n,
       round(avg(d), 6) AS avg_dist_km,
       round(min(d), 6) AS min_dist_km
FROM cand WHERE rn = 1 GROUP BY 1"""


def geohash_sql() -> str:
    # precision 6 → 30 bits: lon gets 15 (even global bits), lat gets 15
    lon_bits, lat_bits = 15, 15
    lon_q = f"CAST(least({2**lon_bits - 1}, floor((lon + 180.0)/360.0*{float(2**lon_bits)})) AS BIGINT)"
    lat_q = f"CAST(least({2**lat_bits - 1}, floor((lat + 90.0)/180.0*{float(2**lat_bits)})) AS BIGINT)"

    def bit(i: int) -> str:
        if i % 2 == 0:
            return f"((lq >> {lon_bits - 1 - i // 2}) & 1)"
        return f"((tq >> {lat_bits - 1 - i // 2}) & 1)"

    chars = []
    for k in range(6):
        val = " + ".join(f"{bit(5 * k + j)} * {2 ** (4 - j)}" for j in range(5))
        chars.append(
            f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(({val}) AS INT) + 1, 1)"
        )
    gh = " || ".join(chars)
    return f"""
WITH q AS (SELECT {lon_q} AS lq, {lat_q} AS tq FROM {_COORDS} pts)
SELECT substr({gh}, 1, 3) AS gh3, count(*)::BIGINT AS cnt FROM q GROUP BY 1"""


def geohash_roundtrip_sql() -> str:
    """Expected decode(encode(p=6)) centers via the quantization closed
    form — no base32 simulation needed because encode quantizes with
    exactly  least(2^b-1, floor((x+off)/range·2^b))  and decode returns
    (q+0.5)/2^b·range−off."""
    lon_q = f"least({2**15 - 1}, floor((lon + 180.0)/360.0*{float(2**15)}))"
    lat_q = f"least({2**15 - 1}, floor((lat + 90.0)/180.0*{float(2**15)}))"
    glat = f"round(({lat_q} + 0.5)/{float(2**15)}*180.0 - 90.0, 9)"
    glon = f"round(({lon_q} + 0.5)/{float(2**15)}*360.0 - 180.0, 9)"
    return f"""
WITH d AS (SELECT lat, lon, {glat} AS gh_lat, {glon} AS gh_lon FROM {_COORDS} pts)
SELECT count(*)::BIGINT AS n_rows,
       round(avg(gh_lat), 6) AS avg_lat,
       round(avg(gh_lon), 6) AS avg_lon,
       sum(CASE WHEN abs(gh_lat - lat) <= {180.0 / 2**15}
                 AND abs(gh_lon - lon) <= {360.0 / 2**15}
                THEN 1 ELSE 0 END)::BIGINT AS n_within_cell
FROM d"""


def location_in_country_sql() -> str:
    from anovos_spark.operators.geospatial import COUNTRY_BBOXES

    parts = []
    for name in ["United States", "India", "Australia"]:
        a, b, c, d = COUNTRY_BBOXES[name]
        parts.append(f"""
SELECT '{name}' AS country,
       sum(CASE WHEN lat BETWEEN {a} AND {b} AND lon BETWEEN {c} AND {d}
                THEN 1 ELSE 0 END)::BIGINT AS n_inside,
       count(*)::BIGINT AS n_rows
FROM {_COORDS} pts""")
    return " UNION ALL ".join(parts)


def geo_stats_sql() -> str:
    """Same base32 encode as geohash_sql (precision 6), then prefix
    grouping per precision with a deterministic (count desc, cell asc)
    rank — geohash prefixes are precision-stable, so substr(hash6, 1, p)
    equals the p-precision encode."""
    lon_bits, lat_bits = 15, 15
    lon_q = f"CAST(least({2**lon_bits - 1}, floor((lon + 180.0)/360.0*{float(2**lon_bits)})) AS BIGINT)"
    lat_q = f"CAST(least({2**lat_bits - 1}, floor((lat + 90.0)/180.0*{float(2**lat_bits)})) AS BIGINT)"

    def bit(i: int) -> str:
        if i % 2 == 0:
            return f"((lq >> {lon_bits - 1 - i // 2}) & 1)"
        return f"((tq >> {lat_bits - 1 - i // 2}) & 1)"

    chars = []
    for k in range(6):
        val = " + ".join(f"{bit(5 * k + j)} * {2 ** (4 - j)}" for j in range(5))
        chars.append(
            f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(({val}) AS INT) + 1, 1)"
        )
    gh = " || ".join(chars)
    pieces = []
    for p in (2, 3):
        pieces.append(f"""
SELECT {p} AS precision, cell, n_points,
       round(n_points / (SELECT count(*) FROM q)::DOUBLE, 6) AS pct_points, rank
FROM (
  SELECT cell, n_points,
         CAST(row_number() OVER (ORDER BY n_points DESC, cell ASC) AS INT) AS rank
  FROM (SELECT substr(gh, 1, {p}) AS cell, count(*)::BIGINT AS n_points
        FROM q GROUP BY 1) t) r
WHERE rank <= 5""")
    body = " UNION ALL ".join(pieces)
    return f"""
WITH base AS (SELECT {lon_q} AS lq, {lat_q} AS tq FROM {_COORDS} pts),
q AS (SELECT {gh} AS gh FROM base)
{body}"""


def monotonic_binning_sql(max_bins: int = 10, min_bins: int = 2) -> str:
    """Replays the monotonic-binning search in SQL: for each candidate bin
    count n (descending), bucket by the exact i/n quantile cutoffs
    (1 + Σ(x > cut), the engine's binning semantics), compute per-bin
    event rates, and test STRICT monotonicity (all consecutive diffs > 0
    or all < 0 — equivalent to |spearman| == 1 on ranks); chosen n = the
    largest monotonic candidate, else max_bins."""
    label = "(o_orderstatus = 'F')::INT"
    pieces = []
    for col in ["o_totalprice", "o_custkey"]:
        for n in range(max_bins, min_bins - 1, -1):
            cuts = ", ".join(
                f"quantile_cont({col}, {i}.0/{n}) AS c{i}" for i in range(1, n)
            )
            add = " + ".join(f"({col} > b.c{i})::INT" for i in range(1, n))
            pieces.append(f"""
SELECT '{col}' AS attribute, {n} AS n,
       (SELECT count(*) >= 2 FROM (
          SELECT bin, avg(y) AS r FROM (
            SELECT CAST(1 + {add} AS INT) AS bin, {label} AS y
            FROM orders, (SELECT {cuts} FROM orders) b
            WHERE {col} IS NOT NULL) v GROUP BY 1) rr)
       AND (SELECT coalesce(bool_and(diff > 0), FALSE) OR coalesce(bool_and(diff < 0), FALSE)
            FROM (SELECT r - lag(r) OVER (ORDER BY bin) AS diff FROM (
                   SELECT bin, avg(y) AS r FROM (
                     SELECT CAST(1 + {add} AS INT) AS bin, {label} AS y
                     FROM orders, (SELECT {cuts} FROM orders) b
                     WHERE {col} IS NOT NULL) v GROUP BY 1) rr) d
            WHERE diff IS NOT NULL) AS mono""")
    grid = " UNION ALL ".join(pieces)
    return f"""
WITH grid AS ({grid})
SELECT attribute,
       CAST(coalesce(max(n) FILTER (WHERE mono), {max_bins}) AS INT) AS n_bins
FROM grid GROUP BY attribute"""


def seasonal_decompose_sql(period: int = 7) -> str:
    """Classical additive decomposition replayed in SQL: centered 7-point
    MA trend (null at the half-window edges), by-phase means of the
    detrended series centered to Σ=0, resid = obs − trend − seasonal."""
    half = period // 2
    return f"""
WITH s AS (SELECT date_trunc('day', ts) AS k, avg(value) AS v FROM events GROUP BY 1),
o AS (SELECT k, v, CAST(row_number() OVER (ORDER BY k) - 1 AS INT) AS idx,
             count(*) OVER () AS n FROM s),
t AS (SELECT *, CASE WHEN idx >= {half} AND idx <= n - {half + 1}
                     THEN avg(v) OVER (ORDER BY idx ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)
                END AS trend FROM o),
d AS (SELECT *, v - trend AS det FROM t),
sm AS (SELECT idx % {period} AS ph, avg(det) AS m FROM d WHERE det IS NOT NULL GROUP BY 1),
smc AS (SELECT ph, m - (SELECT avg(m) FROM sm) AS seasonal FROM sm)
SELECT d.idx, CAST(CAST(d.k AS TIMESTAMP) AS VARCHAR) AS grain_key,
       round(d.v, 6) AS observed,
       round(d.trend, 6) AS trend,
       round(smc.seasonal, 6) AS seasonal,
       round(d.v - d.trend - smc.seasonal, 6) AS resid
FROM d JOIN smc ON d.idx % {period} = smc.ph"""


def boxcox_sql() -> str:
    """Per-λ KS-to-normality grid replayed in SQL over the deterministic
    modular fit subset (l_orderkey % 101 = 0 — the Spark query pins
    sample_size above the subset size, so both engines fit on identical
    data).  Normal CDF via the Zelen–Severo 26.2.17
    rational approximation (|ε| < 7.5e-8) since DuckDB lacks erf; the
    approximation error is orders of magnitude below any λ-to-λ KS gap,
    so the argmin (grid-order tie-break) is identical."""
    from anovos_spark.operators.transformers_ml import BOXCOX_LAMBDAS

    def cdf(z: str) -> str:
        # Φ(z) for z≥0 via 1 − φ(z)·Σ b_i k^i, k = 1/(1+0.2316419 z);
        # mirrored for z<0
        az = f"abs({z})"
        k = f"(1.0/(1.0 + 0.2316419*{az}))"
        poly = (
            f"({k}*(0.319381530 + {k}*(-0.356563782 + {k}*(1.781477937 + "
            f"{k}*(-1.821255978 + {k}*1.330274429)))))"
        )
        phi = f"(exp(-{az}*{az}/2.0)/sqrt(2*pi()))"
        upper = f"(1.0 - {phi}*{poly})"
        return f"(CASE WHEN {z} >= 0 THEN {upper} ELSE 1.0 - {upper} END)"

    pieces = []
    for col in ["l_extendedprice", "l_quantity"]:
        for gi, lmb in enumerate(BOXCOX_LAMBDAS):
            t = f"ln({col})" if lmb == 0 else f"pow({col}, {lmb})"
            pieces.append(f"""
SELECT '{col}' AS attribute, CAST({float(lmb)} AS DOUBLE) AS lambda, {gi} AS gi,
       coalesce(max(greatest(r*1.0/n - cdf, cdf - (r - 1.0)/n)), 1.0) AS ks
FROM (
  SELECT row_number() OVER (ORDER BY t) AS r, n, {cdf("((t - mu)/sd)")} AS cdf
  FROM (SELECT {t} AS t FROM lineitem
        WHERE {col} IS NOT NULL AND l_orderkey % 101 = 0) v,
       (SELECT avg(t) AS mu, stddev_samp(t) AS sd, count(*) AS n
        FROM (SELECT {t} AS t FROM lineitem
              WHERE {col} IS NOT NULL AND l_orderkey % 101 = 0) w) s
) q""")
    grid = " UNION ALL ".join(pieces)
    return f"""
WITH grid AS ({grid})
SELECT attribute, lambda
FROM (SELECT attribute, lambda,
             row_number() OVER (PARTITION BY attribute ORDER BY ks ASC, gi ASC) AS rk
      FROM grid) t
WHERE rk = 1"""


def outlier_frame_sql() -> str:
    parts = []
    for c in ["l_quantity", "l_extendedprice", "l_discount"]:
        parts.append(f"""
SELECT '{c}' AS attribute,
       round(CAST(q1 AS DOUBLE), 6) AS q1,
       round(CAST(med AS DOUBLE), 6) AS median,
       round(CAST(q3 AS DOUBLE), 6) AS q3,
       round(CAST(q1 - 1.5*(q3 - q1) AS DOUBLE), 6) AS lower_whisker,
       round(CAST(q3 + 1.5*(q3 - q1) AS DOUBLE), 6) AS upper_whisker,
       (SELECT count(*) FROM lineitem
         WHERE {c} < q1 - 1.5*(q3 - q1) OR {c} > q3 + 1.5*(q3 - q1))::BIGINT AS n_outliers
FROM (SELECT quantile_cont({c}, 0.25) AS q1, quantile_cont({c}, 0.5) AS med,
             quantile_cont({c}, 0.75) AS q3 FROM lineitem) s""")
    return " UNION ALL ".join(parts)


def centroid_rog_sql() -> str:
    d = _hav("p.lat", "p.lon", "c.lat_c", "c.lon_c")
    return f"""
WITH pts AS (SELECT * FROM {_COORDS} t),
agg AS (SELECT c_nationkey,
          sum(cos(radians(lat))*cos(radians(lon))*1.0) AS sx,
          sum(cos(radians(lat))*sin(radians(lon))*1.0) AS sy,
          sum(sin(radians(lat))*1.0) AS sz,
          sum(1.0) AS sw
        FROM pts GROUP BY 1),
cent AS (SELECT c_nationkey,
           degrees(atan2(sz/sw, sqrt((sx/sw)*(sx/sw) + (sy/sw)*(sy/sw)))) AS lat_c,
           degrees(atan2(sy/sw, sx/sw)) AS lon_c
         FROM agg),
rog AS (SELECT p.c_nationkey, round(avg({d}), 6) AS rog_km
        FROM pts p JOIN cent c ON p.c_nationkey = c.c_nationkey GROUP BY 1)
SELECT c.c_nationkey, round(c.lat_c, 6) AS lat_centroid,
       round(c.lon_c, 6) AS lon_centroid, r.rog_km
FROM cent c JOIN rog r ON c.c_nationkey = r.c_nationkey"""


# Java datetime pattern → strptime equivalent, SAME order as
# timeseries.CANDIDATE_FORMATS (the vote picks the first winner)
_FMT_MAP = [
    ("yyyy-MM-dd HH:mm:ss.SSSSSS", "%Y-%m-%d %H:%M:%S.%f"),
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy-MM-dd'T'HH:mm:ss", "%Y-%m-%dT%H:%M:%S"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("yyyy/MM/dd HH:mm:ss", "%Y/%m/%d %H:%M:%S"),
    ("yyyy/MM/dd", "%Y/%m/%d"),
    ("dd-MM-yyyy HH:mm:ss", "%d-%m-%Y %H:%M:%S"),
    ("dd-MM-yyyy", "%d-%m-%Y"),
    ("dd/MM/yyyy HH:mm:ss", "%d/%m/%Y %H:%M:%S"),
    ("dd/MM/yyyy", "%d/%m/%Y"),
    ("MM-dd-yyyy", "%m-%d-%Y"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
    ("yyyyMMdd", "%Y%m%d"),
    ("yyyyMMddHHmmss", "%Y%m%d%H%M%S"),
    ("yyyy-MM", "%Y-%m"),
    ("yyyyMM", "%Y%m"),
]


def ts_format_vote_sql() -> str:
    cols = ["compact_str", "euro_str", "iso_str", "not_a_date"]
    src = """(SELECT strftime(o_orderdate, '%Y-%m-%d') AS iso_str,
        strftime(o_orderdate, '%Y%m%d') AS compact_str,
        strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS euro_str,
        o_orderpriority AS not_a_date FROM orders)"""
    parts = []
    for c in cols:
        branches = " ".join(
            "WHEN count(try_strptime({c}, '{sp}')) >= 0.8*count({c}) THEN '{j}'".format(
                c=c, sp=sp, j=java.replace("'", "''")
            )
            for java, sp in _FMT_MAP
        )
        parts.append(
            f"SELECT '{c}' AS attribute, (SELECT CASE {branches} END FROM {src} s) AS fmt"
        )
    return (
        "SELECT attribute, fmt FROM (\n"
        + _union(parts)
        + "\n) v WHERE fmt IS NOT NULL"
    )


def ts_eligibility_sql() -> str:
    return """
WITH dd AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
g AS (SELECT date_diff('day', lag(d) OVER (ORDER BY d), d) AS gap FROM dd),
gs AS (SELECT round(avg(gap), 6) AS m, round(stddev_samp(gap), 6) AS s
       FROM g WHERE gap IS NOT NULL)
SELECT 'n_dates' AS metric, (SELECT count(*) FROM dd)::DOUBLE AS value
UNION ALL SELECT 'span_days', (SELECT date_diff('day', min(d), max(d)) FROM dd)::DOUBLE
UNION ALL SELECT 'gap_mean', (SELECT m FROM gs)
UNION ALL SELECT 'gap_stddev', (SELECT s FROM gs)
UNION ALL SELECT 'gap_cov', (SELECT CASE WHEN m IS NOT NULL AND m != 0 AND s IS NOT NULL
                                    THEN round(s/m, 6) END FROM gs)"""


def daypart_sql() -> str:
    return """
SELECT CASE WHEN hour(ts) >= 4 AND hour(ts) < 7 THEN 'early_hours'
            WHEN hour(ts) >= 7 AND hour(ts) < 10 THEN 'morning'
            WHEN hour(ts) >= 10 AND hour(ts) < 14 THEN 'late_morning'
            WHEN hour(ts) >= 14 AND hour(ts) < 17 THEN 'afternoon'
            WHEN hour(ts) >= 17 AND hour(ts) < 20 THEN 'evening'
            ELSE 'night' END AS daypart,
       count(*)::BIGINT AS n
FROM events GROUP BY 1"""


def iqr_standardization_sql() -> str:
    # min/max of (x - q50)/(q75 - q25): monotone transform → exact equality
    parts = [
        f"""SELECT '{c}' AS attribute,
 round((mn - med)/(q3 - q1), 6) AS s_min, round((mx - med)/(q3 - q1), 6) AS s_max
FROM (SELECT CAST(min({c}) AS DOUBLE) mn, CAST(max({c}) AS DOUBLE) mx,
             quantile_cont({c}, 0.25) q1, quantile_cont({c}, 0.5) med,
             quantile_cont({c}, 0.75) q3 FROM lineitem) s
WHERE q3 - q1 > 0"""
        for c in LINEITEM_NUM
    ]
    return _union(parts)


def one_hot_sql() -> str:
    parts = []
    for col in ["l_returnflag", "l_linestatus"]:
        parts.append(
            f"SELECT '{col}' || '_' || {col} AS dummy, count(*)::BIGINT AS n_ones "
            f"FROM lineitem WHERE {col} IS NOT NULL GROUP BY 1"
        )
    return _union(parts)


def embedding_near_dup_sql() -> str:
    dot = ("list_sum(list_transform(generate_series(1, len(a.embedding)), "
           "i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))")
    na = ("sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)), "
          "i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE))))")
    nb = ("sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)), "
          "i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))))")
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({dot}/({na}*{nb}), 6) AS cos_sim
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND round({dot}/({na}*{nb}), 6) >= 0.45"""


def json_props_sql() -> str:
    # props is single-key JSON; a regexp extract keeps parity trivial and
    # engine-agnostic (Spark get_json_object vs DuckDB json extension)
    return """
SELECT event_type,
       count(k)::BIGINT AS n, sum(k)::BIGINT AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type,
             CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INT) AS k
      FROM events) t
GROUP BY 1"""


def q6_sql() -> str:
    return """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*)::BIGINT AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24"""


def q5_sql() -> str:
    return """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       count(*)::BIGINT AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY 1"""


def type_recommendation_sql() -> str:
    parts = []
    for c in LINEITEM_NUM:
        parts.append(
            f"SELECT '{c}' AS attribute, 'numerical' AS current_type, "
            f"CASE WHEN count(DISTINCT {c}) <= 20 THEN 'categorical' ELSE 'numerical' END AS recommended_type, "
            f"count(DISTINCT {c})::BIGINT AS distinct_count, "
            f"CAST(NULL AS DOUBLE) AS numeric_rate FROM lineitem"
        )
    for c in ("l_returnflag", "l_linestatus"):
        parts.append(
            f"SELECT '{c}' AS attribute, 'categorical' AS current_type, "
            f"CASE WHEN CAST(count(TRY_CAST({c} AS DOUBLE)) AS DOUBLE)/count({c}) >= 0.95 "
            f"THEN 'numerical' ELSE 'categorical' END AS recommended_type, "
            f"CAST(NULL AS BIGINT) AS distinct_count, "
            f"round(CAST(count(TRY_CAST({c} AS DOUBLE)) AS DOUBLE)/count({c}), 6) AS numeric_rate "
            f"FROM lineitem"
        )
    return _union(parts)


def streaming_window_sql() -> str:
    # finite stream + complete mode ⇒ identical to the batch hourly rollup
    return """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS value_sum
FROM events GROUP BY 1, 2"""


def streaming_drift_sql(smoothing: float = 0.0001) -> str:
    """Batch replay of the streaming PSI monitor: same quintile cutoffs
    (quantile_cont == Spark exact percentile), same 1+Σ(x>cut) binning,
    same smoothing, per-hour windows (finite stream ⇒ identical)."""
    cuts = ", ".join(
        f"quantile_cont(value, {p}) AS c{i}" for i, p in enumerate([0.2, 0.4, 0.6, 0.8], 1)
    )
    bin_add = " + ".join(f"(value > k.c{i})::INT" for i in range(1, 5))
    psi_terms = []
    for b in range(1, 6):
        q = f"(CASE WHEN coalesce(h.n{b}, 0) = 0 THEN {smoothing} ELSE coalesce(h.n{b}, 0)::DOUBLE / h.n_events END)"
        p = f"greatest(p.p{b}, {smoothing})"
        psi_terms.append(f"(({q}) - ({p})) * ln(({q}) / ({p}))")
    psi = " + ".join(psi_terms)
    n_cols = ", ".join(
        f"sum((bin = {b})::INT)::BIGINT AS n{b}" for b in range(1, 6)
    )
    p_cols = ", ".join(
        f"sum((bin = {b})::INT)::DOUBLE / count(*) AS p{b}" for b in range(1, 6)
    )
    return f"""
WITH k AS (SELECT {cuts} FROM events),
b AS (SELECT ts, 1 + {bin_add} AS bin FROM events, k WHERE value IS NOT NULL),
p AS (SELECT {p_cols} FROM b),
h AS (SELECT date_trunc('hour', ts) AS w, count(*)::BIGINT AS n_events, {n_cols}
      FROM b GROUP BY 1)
SELECT strftime(h.w, '%Y-%m-%d %H:%M:%S') AS window_start,
       h.n_events,
       round({psi}, 6) AS psi,
       (round({psi}, 6) > 0.1)::INT AS flagged
FROM h, p"""


def streaming_sessions_sql() -> str:
    # batch equivalent of session_window(gap=30min): a new session starts
    # when the gap to the previous event is >= 30 min (Spark's session end
    # is exclusive: last_event + gap)
    return """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM o),
per_session AS (
  SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY 1, 2)
SELECT user_id, count(*)::BIGINT AS n_sessions,
       sum(n_events)::BIGINT AS n_events,
       max(n_events)::BIGINT AS max_session_events
FROM per_session GROUP BY 1"""


def sql_window_topk_sql() -> str:
    return """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 2"""


def rollup_revenue_sql() -> str:
    return """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       count(*)::BIGINT AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


def q10_sql() -> str:
    return """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       round(first(c_acctbal), 2) AS c_acctbal
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20"""


def q14_sql() -> str:
    rev = (
        "CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))"
    )
    return f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {rev}
                                   ELSE 0::DECIMAL(12,2) END) AS DOUBLE)
             / CAST(sum({rev}) AS DOUBLE), 6) AS promo_revenue_pct,
       count(*)::BIGINT AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'"""


def q18_sql() -> str:
    return """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(total_qty, 2) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey"""




def feature_recommender_sql() -> str:
    """Token-level TF-IDF replay: word + character-trigram tokenization,
    ln(1 + N/df) idf, sparse-dot cosine, top-1 rank — built from the SAME
    DEFAULT_CORPUS the operator uses (imported, not duplicated, so the
    oracle cannot drift from the engine).  Attribute list = the sorted
    distinct column names of lineitem/orders/customer, fixed by schema."""
    from anovos_spark.operators.featrec import DEFAULT_CORPUS

    attrs = [
        "c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey",
        "l_discount", "l_extendedprice", "l_linenumber", "l_linestatus",
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate",
        "l_suppkey", "l_tax", "o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority", "o_orderstatus", "o_totalprice",
    ]
    attr_vals = ", ".join(f"('{a}')" for a in attrs)
    corp_vals = ", ".join(
        "(" + ", ".join("'" + s.replace("'", "''") + "'" for s in row) + ")"
        for row in DEFAULT_CORPUS
    )
    n = len(DEFAULT_CORPUS)
    return f"""
WITH attrs(attribute) AS (VALUES {attr_vals}),
corpus(feature_name, industry, usecase, description) AS (VALUES {corp_vals}),
cn0 AS (
  SELECT feature_name, industry, usecase,
         list_filter(string_split(trim(regexp_replace(lower(feature_name || ' ' || description),
           '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS w
  FROM corpus),
cs AS (SELECT *, array_to_string(w, '') AS sq FROM cn0),
ctok AS (
  SELECT DISTINCT feature_name, industry, usecase, token FROM (
    SELECT feature_name, industry, usecase, unnest(w) AS token FROM cs
    UNION ALL
    SELECT feature_name, industry, usecase, substring(sq, i, 3) AS token
    FROM cs, unnest(range(1, greatest(len(sq) - 2, 1) + 1)) AS t(i)
    WHERE length(substring(sq, i, 3)) = 3)),
idf AS (
  SELECT token, ln(1.0 + {n}.0 / count(DISTINCT feature_name)) AS idf
  FROM ctok GROUP BY 1),
cw AS (SELECT c.*, idf.idf AS w FROM ctok c JOIN idf USING (token)),
cnorm AS (SELECT feature_name, sqrt(sum(w * w)) AS cn FROM cw GROUP BY 1),
an0 AS (
  SELECT attribute,
         list_filter(string_split(trim(regexp_replace(lower(attribute),
           '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS w
  FROM attrs),
asq AS (SELECT *, array_to_string(w, '') AS sq FROM an0),
atok AS (
  SELECT DISTINCT attribute, token FROM (
    SELECT attribute, unnest(w) AS token FROM asq
    UNION ALL
    SELECT attribute, substring(sq, i, 3) AS token
    FROM asq, unnest(range(1, greatest(len(sq) - 2, 1) + 1)) AS t(i)
    WHERE length(substring(sq, i, 3)) = 3)),
aw AS (SELECT a.*, idf.idf AS w2 FROM atok a JOIN idf USING (token)),
anorm AS (SELECT attribute, sqrt(sum(w2 * w2)) AS an FROM aw GROUP BY 1),
scored AS (
  SELECT aw.attribute, cw.feature_name, cw.industry, cw.usecase,
         round(sum(cw.w * aw.w2) / (any_value(anorm.an) * any_value(cnorm.cn)), 6) AS score
  FROM aw JOIN cw USING (token)
  JOIN anorm ON anorm.attribute = aw.attribute
  JOIN cnorm ON cnorm.feature_name = cw.feature_name
  GROUP BY 1, 2, 3, 4
  HAVING round(sum(cw.w * aw.w2) / (any_value(anorm.an) * any_value(cnorm.cn)), 6) >= 0.05)
SELECT attribute, feature_name, industry, usecase, score, rank, 'tfidf' AS method
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY attribute ORDER BY score DESC, feature_name ASC) AS rank
  FROM scored)
WHERE rank <= 1"""





def feature_recommender_distributional_sql() -> str:
    """Full replay of the distributional recommender: the TF-IDF cosine
    (words + trigrams, as feature_recommender_sql) blended 50/50 with
    the PPMI-space semantic cosine — word-level idf, same-document
    co-occurrence counts, PPMI = max(0, ln(n_tc·T/(n_t·n_c))), per-token
    row L2 normalization, identity spike, SYNONYM_LEXICON query
    expansion at weight 0.7 with MAX-merge against self tokens — built
    from the SAME DEFAULT_CORPUS and SYNONYM_LEXICON the operator
    imports, so neither constant can drift."""
    from anovos_spark.operators.featrec import DEFAULT_CORPUS, SYNONYM_LEXICON

    attrs = [
        "c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey",
        "l_discount", "l_extendedprice", "l_linenumber", "l_linestatus",
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate",
        "l_suppkey", "l_tax", "o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority", "o_orderstatus", "o_totalprice",
    ]
    attr_vals = ", ".join(f"('{a}')" for a in attrs)
    corp_vals = ", ".join(
        "(" + ", ".join("'" + s.replace("'", "''") + "'" for s in row) + ")"
        for row in DEFAULT_CORPUS
    )
    lex_vals = ", ".join(
        f"('{t}', '{e}')" for t, exps in SYNONYM_LEXICON.items() for e in exps
    )
    n = len(DEFAULT_CORPUS)
    return f"""
WITH attrs(attribute) AS (VALUES {attr_vals}),
corpus(feature_name, industry, usecase, description) AS (VALUES {corp_vals}),
lex(token, expansion) AS (VALUES {lex_vals}),
-- ======== TF-IDF component (words + trigrams), all pairs kept ========
cn0 AS (
  SELECT feature_name,
         list_filter(string_split(trim(regexp_replace(lower(feature_name || ' ' || description),
           '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS w
  FROM corpus),
cs AS (SELECT *, array_to_string(w, '') AS sq FROM cn0),
ctok AS (
  SELECT DISTINCT feature_name, token FROM (
    SELECT feature_name, unnest(w) AS token FROM cs
    UNION ALL
    SELECT feature_name, substring(sq, i, 3) AS token
    FROM cs, unnest(range(1, greatest(len(sq) - 2, 1) + 1)) AS t(i)
    WHERE length(substring(sq, i, 3)) = 3)),
idf AS (
  SELECT token, ln(1.0 + {n}.0 / count(DISTINCT feature_name)) AS idf
  FROM ctok GROUP BY 1),
cw AS (SELECT c.*, idf.idf AS w FROM ctok c JOIN idf USING (token)),
cnorm AS (SELECT feature_name, sqrt(sum(w * w)) AS cn FROM cw GROUP BY 1),
an0 AS (
  SELECT attribute,
         list_filter(string_split(trim(regexp_replace(lower(attribute),
           '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS w
  FROM attrs),
asq AS (SELECT *, array_to_string(w, '') AS sq FROM an0),
atok AS (
  SELECT DISTINCT attribute, token FROM (
    SELECT attribute, unnest(w) AS token FROM asq
    UNION ALL
    SELECT attribute, substring(sq, i, 3) AS token
    FROM asq, unnest(range(1, greatest(len(sq) - 2, 1) + 1)) AS t(i)
    WHERE length(substring(sq, i, 3)) = 3)),
aw AS (SELECT a.*, idf.idf AS w2 FROM atok a JOIN idf USING (token)),
anorm AS (SELECT attribute, sqrt(sum(w2 * w2)) AS an FROM aw GROUP BY 1),
tf AS (
  SELECT aw.attribute, cw.feature_name,
         round(sum(cw.w * aw.w2) / (any_value(anorm.an) * any_value(cnorm.cn)), 6) AS s_tfidf
  FROM aw JOIN cw USING (token)
  JOIN anorm ON anorm.attribute = aw.attribute
  JOIN cnorm ON cnorm.feature_name = cw.feature_name
  GROUP BY 1, 2),
-- ======== PPMI semantic component (words only) ========
wtok AS (
  SELECT DISTINCT feature_name, unnest(w) AS token FROM cn0),
widf AS (
  SELECT token, ln(1.0 + {n}.0 / count(DISTINCT feature_name)) AS idf
  FROM wtok GROUP BY 1),
co AS (
  SELECT x.token AS t, y.token AS c, CAST(count(*) AS DOUBLE) AS n_tc
  FROM wtok x JOIN wtok y USING (feature_name)
  WHERE x.token <> y.token GROUP BY 1, 2),
ntok AS (SELECT token, CAST(count(*) AS DOUBLE) AS n_t FROM wtok GROUP BY 1),
tot AS (SELECT sum(n_tc) AS total FROM co),
ppmi AS (
  SELECT t, c, greatest(ln(n_tc * (SELECT total FROM tot) / (a.n_t * b.n_t)), 0.0) AS pp
  FROM co JOIN ntok a ON a.token = co.t JOIN ntok b ON b.token = co.c),
ppos AS (SELECT * FROM ppmi WHERE pp > 0),
pnorm AS (SELECT t, sqrt(sum(pp * pp)) AS pn FROM ppos GROUP BY 1),
tokvec AS (
  SELECT t, c, sum(v) AS v FROM (
    SELECT token AS t, token AS c, idf AS v FROM widf
    UNION ALL
    SELECT p.t, p.c, widf.idf * p.pp / pnorm.pn AS v
    FROM ppos p JOIN pnorm USING (t) JOIN widf ON widf.token = p.t
  ) GROUP BY 1, 2),
cvec AS (
  SELECT w.feature_name, tv.c, sum(1.0 * tv.v) AS dv
  FROM wtok w JOIN tokvec tv ON tv.t = w.token GROUP BY 1, 2),
cvn AS (SELECT feature_name, sqrt(sum(dv * dv)) AS nrm FROM cvec GROUP BY 1),
aself AS (SELECT DISTINCT attribute, unnest(w) AS token, 1.0 AS wt FROM an0),
aexp AS (
  SELECT s.attribute, lex.expansion AS token, 0.7 AS wt
  FROM (SELECT DISTINCT attribute, token FROM aself) s JOIN lex USING (token)),
atokw AS (
  SELECT attribute, token, max(wt) AS wt FROM (
    SELECT attribute, token, wt FROM aself
    UNION ALL SELECT attribute, token, wt FROM aexp
  ) GROUP BY 1, 2),
avec AS (
  SELECT a.attribute, tv.c, sum(a.wt * tv.v) AS dv
  FROM atokw a JOIN tokvec tv ON tv.t = a.token GROUP BY 1, 2),
avn AS (SELECT attribute, sqrt(sum(dv * dv)) AS nrm FROM avec GROUP BY 1),
sem AS (
  SELECT av.attribute, cv.feature_name,
         sum(av.dv * cv.dv) / (any_value(avn.nrm) * any_value(cvn.nrm)) AS s_sem
  FROM avec av JOIN cvec cv USING (c)
  JOIN avn ON avn.attribute = av.attribute
  JOIN cvn ON cvn.feature_name = cv.feature_name
  GROUP BY 1, 2),
-- ======== blend + rank ========
blended AS (
  SELECT coalesce(tf.attribute, sem.attribute) AS attribute,
         coalesce(tf.feature_name, sem.feature_name) AS feature_name,
         round(0.5 * coalesce(tf.s_tfidf, 0.0) + 0.5 * coalesce(sem.s_sem, 0.0), 6) AS score
  FROM tf FULL JOIN sem
    ON tf.attribute = sem.attribute AND tf.feature_name = sem.feature_name),
scored AS (
  SELECT b.attribute, b.feature_name, corpus.industry, corpus.usecase, b.score
  FROM blended b JOIN corpus USING (feature_name)
  WHERE b.score >= 0.05)
SELECT attribute, feature_name, industry, usecase, score, rank,
       'distributional' AS method
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY attribute ORDER BY score DESC, feature_name ASC) AS rank
  FROM scored)
WHERE rank <= 1"""


def minhash_incremental_sql() -> str:
    """Full SQL replay of the incremental path: recompute MinHash
    signatures for corpus + edited-new-batch, band them, equi-join
    new-vs-index candidates, score the positional-match estimator —
    identical constants to dedup.minhash_signatures (P = 2^31-1,
    a_i = 2i+1, b_i = 12582917·i, 32 hashes, 8 bands of 4)."""
    P = 2147483647
    h = _HEX2INT.format(h="substr(md5(g), 1, 8)")
    mins = ",\n       ".join(
        f"min((x * {2 * i + 1} + {i * 12582917}) % {P}) AS h{i}" for i in range(32)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT side, id, {b} AS band, "
        f"concat_ws('_', h{4 * b}, h{4 * b + 1}, h{4 * b + 2}, h{4 * b + 3}) AS bucket FROM sig"
        for b in range(8)
    )
    match_sum = " + ".join(
        f"CASE WHEN ns.h{i} = ix.h{i} THEN 1 ELSE 0 END" for i in range(32)
    )
    return f"""
WITH alldocs AS (
  SELECT doc_id, text, 'idx' AS side FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' appended v2 marker', 'new'
  FROM documents WHERE doc_id % 10 = 0),
nd AS (SELECT side, doc_id, {_NORM} AS n FROM alldocs),
docs AS (SELECT side, doc_id AS id, {_GRAMS} AS grams FROM nd),
ex AS (SELECT side, id, unnest(grams) AS g FROM docs),
hx AS (SELECT side, id, {h} AS x FROM ex),
sig AS (SELECT side, id,
       {mins}
  FROM hx GROUP BY 1, 2),
bandrows AS (
{band_rows}),
cand AS (
  SELECT DISTINCT a.id AS new_id, b.id AS index_id
  FROM bandrows a JOIN bandrows b
    ON a.band = b.band AND a.bucket = b.bucket
   AND a.side = 'new' AND b.side = 'idx' AND a.id <> b.id),
est AS (
  SELECT c.new_id, c.index_id,
         round(({match_sum}) / 32.0, 6) AS est_jaccard
  FROM cand c
  JOIN sig ns ON ns.side = 'new' AND ns.id = c.new_id
  JOIN sig ix ON ix.side = 'idx' AND ix.id = c.index_id)
SELECT new_id, index_id, est_jaccard FROM est WHERE est_jaccard >= 0.5"""





def grouped_summary_sql() -> str:
    """Per-segment profile with the dispersion oracle's decimal-exact
    s1/s2 algebra, one UNION ALL branch per column."""
    parts = []
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        parts.append(f"""SELECT l_returnflag, '{c}' AS attribute,
 n::BIGINT AS n, miss AS n_missing,
 round(s1/nd, 6) AS mean,
 round(CASE WHEN nd > 1 THEN sqrt((s2 - s1*s1/nd)/(nd-1)) END, 6) AS stddev,
 vmin, vmax
FROM (SELECT l_returnflag,
        count({c}) AS n,
        (count(*) - count({c}))::BIGINT AS miss,
        CAST(count({c}) AS DOUBLE) AS nd,
        CAST(sum(CAST({c} AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        CAST(sum(CAST({c} AS DECIMAL(19,6)) * CAST({c} AS DECIMAL(19,6))) AS DOUBLE) AS s2,
        CAST(min({c}) AS DOUBLE) AS vmin,
        CAST(max({c}) AS DOUBLE) AS vmax
      FROM lineitem GROUP BY 1) t""")
    return _union(parts)





def language_id_confusion_sql() -> str:
    """Confusion matrix over the same scoring CASE as language_id_sql,
    plus per-truth-class fractions via a window."""
    from anovos_spark.operators.text import LANG_PROFILES

    score_exprs = []
    for lang in sorted(LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        score_exprs.append(
            f"round(CAST(len(list_filter({_TOKS}, x -> x IN ({words}))) AS DOUBLE)"
            f" / len({_TOKS}), 6) AS s_{lang}"
        )
    return f"""
WITH s AS (SELECT doc_id, lang, {', '.join(score_exprs)} FROM documents),
p AS (
  SELECT lang,
    CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
         WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
         WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
         WHEN s_en >= s_de THEN 'en'
         ELSE 'de' END AS pred_lang
  FROM s),
cell AS (SELECT lang, pred_lang, count(*)::BIGINT AS n_docs FROM p GROUP BY 1, 2)
SELECT lang, pred_lang, n_docs,
       round(n_docs / sum(n_docs) OVER (PARTITION BY lang), 6) AS class_frac
FROM cell"""





def robust_stats_sql() -> str:
    parts = []
    for c in ["l_quantity", "l_extendedprice", "l_discount"]:
        parts.append(f"""SELECT '{c}' AS attribute,
 round(q1.m, 6) AS median, round(q2.d, 6) AS mad,
 round(1.4826 * q2.d, 6) AS mad_scaled, q3.outl::BIGINT AS robust_outliers
FROM (SELECT quantile_cont({c}, 0.5) AS m FROM lineitem) q1,
     LATERAL (SELECT quantile_cont(abs({c} - q1.m), 0.5) AS d FROM lineitem) q2,
     LATERAL (SELECT count(*) AS outl FROM lineitem
              WHERE abs({c} - q1.m) > 3 * 1.4826 * q2.d) q3""")
    return _union(parts)



def registry() -> dict[str, str]:
    return {
        "global_summary": global_summary_sql(),
        "measures_of_counts": counts_sql(),
        "nonzero_count": nonzero_sql(),
        "central_tendency": central_tendency_sql(),
        "cardinality": cardinality_sql(),
        "approx_stats_band": approx_stats_band_sql(),
        "dispersion": dispersion_sql(),
        "percentiles": percentiles_sql(),
        "shape": shape_sql(),
        "duplicate_detection": duplicates_sql(),
        "null_rows_detection": null_rows_sql(),
        "outlier_detection": outliers_sql(),
        "idness_detection": idness_sql(),
        "biasedness_detection": biasedness_sql(),
        "invalid_entries_detection": invalid_entries_sql(),
        "attribute_binning_eqrange": binning_eqrange_sql(),
        "attribute_binning_eqfreq": binning_eqfreq_sql(),
        "label_encoding": label_encoding_sql(),
        "target_encoding": target_encoding_sql(),
        "z_standardization": z_standardization_sql(),
        "normalization": normalization_sql(),
        "imputation_mmm": imputation_mmm_sql(),
        "outlier_categories": outlier_categories_sql(),
        "feature_transformation": feature_math_sql(),
        "q1_pricing_summary": q1_pricing_sql(),
        "correlation_matrix": correlation_sql(),
        "iv_calculation": iv_sql(),
        "ig_calculation": ig_sql(),
        "drift_statistics": drift_sql(),
        "stability_index": stability_sql(),
        "text_statistics": text_statistics_sql(),
        "text_quality_score": quality_score_sql(),
        "language_id": language_id_sql(),
        "token_counting": token_counting_sql(),
        "dedup_exact": exact_dedup_sql(),
        "dedup_ngram_jaccard": ngram_jaccard_sql(),
        "dedup_minhash_lsh": minhash_lsh_sql(),
        "dedup_simhash_signatures": simhash_sql(),
        "dedup_simhash_pairs": simhash_pairs_sql(),
        "dedup_components": dedup_components_sql(),
        "dedup_apply": dedup_apply_sql(),
        "leakage_safe_split": leakage_safe_split_sql(),
        # ML-fit queries: the fits are driver-side numerics, so these
        # oracles pin the SQL-expressible halves — truth-set sizes, fill
        # completeness, range/mean envelopes, and selection contracts —
        # emitted by the Spark queries as indicator columns
        "ivf_topk_recall": """
SELECT 5*count(*) AS total, 1 AS recall_ok FROM embeddings WHERE vec_id < 10""",
        "variable_clustering": """
SELECT attribute, 1 AS assigned_once, 1 AS rs_ratio_ok FROM (
  SELECT unnest(['l_quantity','l_extendedprice','l_discount','l_tax','l_orderkey'])
    AS attribute)""",
        "knn_imputation": """
SELECT 0 AS nulls_after, count(*) AS n_rows, 1 AS in_range_ok, 1 AS mean_band_ok
FROM lineitem""",
        # FULL KNN replay: the query's subset is <=10k rows so the seeded
        # fit sample is the identity; every fill = mean of the k=5 nearest
        # complete rows (z-scaled euclidean over the observed dims e, d —
        # (a-mu)/sd - (b-mu)/sd = (a-b)/sd, so mu cancels)
        "knn_imputation_exact": """
WITH sub AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN (l_orderkey + l_linenumber) % 7 = 0 THEN NULL
              ELSE l_quantity END AS q,
         l_extendedprice AS e, l_discount AS d
  FROM lineitem WHERE l_orderkey % 211 = 0 AND l_orderkey < 10000000),
ref AS (SELECT q, e, d FROM sub WHERE q IS NOT NULL),
mom AS (
  SELECT CASE WHEN stddev_pop(e) = 0 THEN 1.0 ELSE stddev_pop(e) END AS sd_e,
         CASE WHEN stddev_pop(d) = 0 THEN 1.0 ELSE stddev_pop(d) END AS sd_d
  FROM ref),
nulls AS (
  SELECT l_orderkey, l_linenumber, e, d, count(*) AS n_rows
  FROM sub WHERE q IS NULL GROUP BY 1, 2, 3, 4),
cand AS (
  SELECT n.l_orderkey, n.l_linenumber, n.e, n.d, n.n_rows, r.q AS rq,
         power((n.e - r.e) / m.sd_e, 2) + power((n.d - r.d) / m.sd_d, 2) AS d2
  FROM nulls n, ref r, mom m),
ranked AS (
  -- rank() (not row_number) so ALL refs tied at the k=5 distance
  -- boundary enter the average: rank<=5 ≡ d2 <= 5th-smallest d2, the
  -- same deterministic tie policy the numpy operator applies — a
  -- row_number pick at a tied boundary was engine-order-dependent
  SELECT l_orderkey, l_linenumber, e, d, n_rows, rq,
         rank() OVER (PARTITION BY l_orderkey, l_linenumber, e, d
                      ORDER BY d2 ASC) AS rn
  FROM cand)
SELECT l_orderkey, l_linenumber, e, d, max(n_rows) AS n_rows,
       round(avg(rq), 6) AS q_filled
FROM ranked WHERE rn <= 5 GROUP BY 1, 2, 3, 4""",
        # linear-decoder autoencoder cannot beat the rank-1 PCA floor
        # (1-|r|)/2 on 2 standardized cols, and a trained one must land
        # near it — the floor side is closed-form from corr() alone
        "autoencoder_optimality": """
SELECT round(abs(corr(l_quantity, l_extendedprice)), 6) AS abs_corr,
       1 AS above_floor, 1 AS near_optimum
FROM lineitem WHERE l_orderkey < 10000000""",
        "autoencoder_latent": """
SELECT 2 AS k, count(*) AS n_rows, 1 AS converged FROM lineitem""",
        "pca_latent_features": """
SELECT 1 AS k_in_range, 1 AS var_monotonic, 1 AS orthogonal_ok,
       1 AS explained_ok, count(*) AS n_rows
FROM lineitem""",
        "feature_recommender_distributional": feature_recommender_distributional_sql(),
        # hashed-embedding path: xxhash64 has no DuckDB twin, so the
        # oracle pins the match contract over the deterministic attribute
        # universe (information_schema recovers the three tables' columns);
        # exact ranking is oracled by feature_recommender_gemm below
        "feature_recommender_embedded": """
WITH attrs AS (
  SELECT DISTINCT column_name AS attribute
  FROM information_schema.columns
  WHERE table_name IN ('lineitem', 'orders', 'customer'))
SELECT attribute, 1 AS n_matches, 1 AS rank_ok, 1 AS score_in_unit
FROM attrs""",
        # engine-neutral embeddings -> the cosine GEMM + min_score cut +
        # (score DESC, feature_name ASC) rank window replay exactly; both
        # engines round scores to 6 decimals BEFORE threshold and rank
        "feature_recommender_gemm": """
WITH a AS (
  SELECT 'attr_' || vec_id AS attribute, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 5 = 0 ORDER BY vec_id LIMIT 5000),
c AS (
  SELECT 'feat_' || vec_id AS feature_name, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 5 = 1 ORDER BY vec_id LIMIT 2000),
s AS (
  SELECT a.attribute, c.feature_name,
         round(list_cosine_similarity(a.v, c.v), 6) AS score
  FROM a, c),
r AS (
  SELECT attribute, feature_name, 'synthetic' AS industry, 'ann' AS usecase,
         score,
         row_number() OVER (PARTITION BY attribute
                            ORDER BY score DESC, feature_name ASC) AS "rank"
  FROM s WHERE score >= 0.05)
SELECT attribute, feature_name, industry, usecase, score, "rank"
FROM r WHERE "rank" <= 2""",
        "als_imputation": """
SELECT 0 AS nulls_after, count(*) AS n_rows, 1 AS in_range_ok, 1 AS mean_band_ok
FROM orders""",
        "auto_imputation": """
SELECT 5 AS n_candidates, 1 AS scores_nonneg, 1 AS winner_is_min""",
        "regression_imputation": """
WITH base AS (
  SELECT CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_quantity END AS q,
         l_extendedprice AS e
  FROM lineitem WHERE l_orderkey < 10000000),
fit AS (
  SELECT avg(q) AS mu_q, avg(e) AS mu_e,
         covar_samp(q, e) AS c_qe, var_samp(e) AS v_e
  FROM base WHERE q IS NOT NULL),
imp AS (
  SELECT CASE WHEN q IS NULL
              THEN mu_q + c_qe / (v_e + 1e-6) * (e - mu_e)
              ELSE q END AS qi
  FROM base, fit)
SELECT round(avg(qi), 6) AS mean_q,
       0::BIGINT AS nulls_after,
       count(*)::BIGINT AS n_rows
FROM imp""",
        "ann_cosine_topk": ann_cosine_sql(),
        "ann_lsh_topk": ann_lsh_sql(),
        "media_metadata": media_metadata_sql(),
        "time_units_extraction": time_units_sql(),
        "dateformat_conversion": """
SELECT strftime(o_orderdate, '%d/%m/%Y') AS d, count(*)::BIGINT AS n_rows
FROM orders GROUP BY 1""",
        "aggregator": aggregator_sql(),
        "window_aggregator": window_aggregator_sql(),
        "lagged_ts": lagged_ts_sql(),
        "join_enrich": join_enrich_sql(),
        "q3_shipping_priority": q3_sql(),
        "geo_distance": geo_distance_sql(),
        "reverse_geocoding": reverse_geocoding_sql(),
        "geohash_encode": geohash_sql(),
        "geo_centroid_rog": centroid_rog_sql(),
        "geohash_roundtrip": geohash_roundtrip_sql(),
        "location_in_country": location_in_country_sql(),
        "geo_stats": geo_stats_sql(),
        "frequency_frame": """
SELECT coalesce(l_returnflag, 'Missing') AS l_returnflag,
       count(*)::BIGINT AS "count",
       round(100.0*count(*) / (SELECT count(*) FROM lineitem), 6) AS count_pct
FROM lineitem GROUP BY 1""",
        "event_rate_frame": """
SELECT coalesce(l_returnflag, 'Missing') AS l_returnflag,
       sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_event,
       sum(CASE WHEN l_linestatus = 'F' THEN 0 ELSE 1 END)::BIGINT AS n_nonevent,
       round(100.0*sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
             / count(*), 6) AS event_rate
FROM lineitem GROUP BY 1""",
        "outlier_frame": outlier_frame_sql(),
        "violin_frame": """
-- identical bucket arithmetic to violin_frame: fixed-width bins over
-- [min,max], clamped top bin, density = share of the modal bin; the
-- float expression order matches the Spark side exactly so floor()
-- sees bit-identical doubles
WITH mm AS (
  SELECT min(l_quantity::DOUBLE) AS mn_q, max(l_quantity::DOUBLE) AS mx_q,
         min(l_discount::DOUBLE) AS mn_d, max(l_discount::DOUBLE) AS mx_d
  FROM lineitem),
melted AS (
  SELECT 'l_quantity' AS attribute, l_quantity::DOUBLE AS v, mn_q AS mn,
         CASE WHEN mx_q - mn_q = 0 THEN 1.0 ELSE mx_q - mn_q END AS width
  FROM lineitem, mm WHERE l_quantity IS NOT NULL
  UNION ALL
  SELECT 'l_discount', l_discount::DOUBLE, mn_d,
         CASE WHEN mx_d - mn_d = 0 THEN 1.0 ELSE mx_d - mn_d END
  FROM lineitem, mm WHERE l_discount IS NOT NULL),
counts AS (
  SELECT attribute,
         least(11, CAST(floor((v - mn) / width * 12) AS INT)) AS bin,
         any_value(mn) AS mn, any_value(width) AS width, count(*) AS n
  FROM melted GROUP BY 1, 2)
SELECT attribute, CAST(bin AS INT) AS bin,
       round(mn + bin * width / 12, 6) AS bin_lo,
       round(mn + (bin + 1) * width / 12, 6) AS bin_hi,
       round(n::DOUBLE / max(n) OVER (PARTITION BY attribute), 6) AS density
FROM counts""",
        "boxcox_transformation": boxcox_sql(),
        "monotonic_binning": monotonic_binning_sql(),
        "seasonal_decompose": seasonal_decompose_sql(),
        "feature_explorer_industries": """
SELECT DISTINCT p_brand AS industry FROM part""",
        "feature_explorer_usecases": """
SELECT DISTINCT p_type AS usecase FROM part WHERE p_brand = 'Brand#13'""",
        "feature_explorer_ranked": """
-- verbatim replay of list_feature_by_industry: distinct corpus rows of
-- one industry, usecase-popularity count window, deterministic rank
WITH c AS (
  SELECT DISTINCT p_name AS feature_name, p_brand AS industry,
         p_type AS usecase, p_name AS description
  FROM part WHERE p_brand = 'Brand#13'),
r AS (SELECT *, count(*) OVER (PARTITION BY usecase) AS cnt FROM c),
k AS (
  SELECT feature_name, industry, usecase, description,
         row_number() OVER (ORDER BY cnt DESC, usecase ASC,
                            feature_name ASC, description ASC) AS feat_rank
  FROM r)
SELECT * FROM k WHERE feat_rank <= 25""",
        "media_decode": """
-- closed-form replay of the deterministic PNG battery: the Spark side
-- ENCODES pixel(x,y) = (doc_id + 3x + 5y) mod 256 into real PNGs
-- (cycling scanline filters) and DECODES them with the pure-python
-- codec; this oracle recomputes the pixel sums arithmetically, so a
-- match proves the codec chain bit-exact
WITH d AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 4 + (doc_id*7) % 11 AS h
  FROM documents WHERE doc_id % 13 = 0),
px AS (
  SELECT d.doc_id, d.w, d.h, ((d.doc_id + 3*x.g + 5*y.g) % 256) AS v
  FROM d, generate_series(0, 16) x(g), generate_series(0, 14) y(g)
  WHERE x.g < d.w AND y.g < d.h)
SELECT doc_id AS id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
       'L' AS mode, 1 AS decoded, CAST(sum(v) AS BIGINT) AS pixel_sum,
       CAST(max(w)*max(h) AS BIGINT) AS n_pixels
FROM px GROUP BY doc_id""",
        "audio_decode": """
-- closed-form replay of the deterministic WAV battery: the Spark side
-- ENCODES sample(i) = ((doc_id*31 + i*7) mod 65536) - 32768 into real
-- RIFF/WAVE blobs (stdlib wave) and DECODES them back; this oracle
-- recomputes the sample sums arithmetically, so a match proves the
-- RIFF encode → chunk parse → PCM unpack chain bit-exact
WITH d AS (
  SELECT doc_id, 50 + doc_id % 40 AS n FROM documents WHERE doc_id % 17 = 0),
s AS (
  SELECT d.doc_id, d.n, (((d.doc_id*31 + i.g*7) % 65536) - 32768) AS v
  FROM d, generate_series(0, 89) i(g) WHERE i.g < d.n)
SELECT doc_id AS id, 8000 AS sample_rate, 1 AS channels,
       CAST(max(n) AS BIGINT) AS n_frames,
       round(max(n) / 8000.0, 6) AS duration_s, 1 AS decoded,
       CAST(sum(v) AS BIGINT) AS sample_sum,
       CAST(max(n) AS BIGINT) AS n_samples
FROM s GROUP BY doc_id""",
        "media_byte_histogram": """
-- byte-value histogram replayed per character: valid because this corpus
-- is pure ASCII (verified octet_length(encode(text)) == length(text) for
-- every row), so utf-8 bytes == code points
WITH docs AS (SELECT doc_id, source, text, length(text) AS n FROM documents),
chars AS (
  SELECT doc_id, n, unicode(substr(text, CAST(i AS INT), 1)) // 16 AS bin
  FROM (SELECT doc_id, text, n, unnest(generate_series(1, n)) AS i FROM docs) t),
dens AS (
  -- numpy .round is HALF_EVEN; DuckDB round() is HALF_UP → round_even
  SELECT doc_id, bin, round_even(count(*)::DOUBLE / any_value(n), 6) AS d
  FROM chars GROUP BY doc_id, bin),
grid AS (SELECT doc_id, source, unnest(generate_series(0, 15)) AS bin FROM docs),
fullg AS (
  SELECT g.source, g.bin, coalesce(d.d, 0.0) AS d
  FROM grid g LEFT JOIN dens d ON g.doc_id = d.doc_id AND g.bin = d.bin)
SELECT source, CAST(bin AS INT) AS bin, round(avg(d), 6) AS avg_density
FROM fullg GROUP BY 1, 2""",
        "data_sample": """
SELECT 'overall:random' AS stratum, 1.0 AS ratio
UNION ALL SELECT 'overall:stratified', 1.0
UNION ALL
SELECT 'stratum:' || l_returnflag, 1.0 FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'balanced:' || l_returnflag, 1.0 FROM lineitem GROUP BY l_returnflag""",
        "comparative_drift_frame": """
WITH t AS (
  SELECT coalesce(o_orderpriority, 'Missing') AS k,
         round(count(*) / (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0)::DOUBLE, 6)
           AS countpct_target
  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
s AS (
  SELECT coalesce(o_orderpriority, 'Missing') AS k,
         round(count(*) / (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 1)::DOUBLE, 6)
           AS countpct_source
  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1)
SELECT coalesce(t.k, s.k) AS o_orderpriority,
       coalesce(countpct_target, 0) AS countpct_target,
       coalesce(countpct_source, 0) AS countpct_source,
       round((coalesce(countpct_target, 0) / nullif(coalesce(countpct_source, 0), 0) - 1)*100, 6)
         AS pct_diff
FROM t FULL OUTER JOIN s ON t.k = s.k""",
        "ts_format_vote": ts_format_vote_sql(),
        "ts_eligibility": ts_eligibility_sql(),
        "ts_daypart": daypart_sql(),
        "iqr_standardization": iqr_standardization_sql(),
        "one_hot_encoding": one_hot_sql(),
        "embedding_near_dup": embedding_near_dup_sql(),
        "json_extraction": json_props_sql(),
        "q6_forecast_revenue": q6_sql(),
        "q5_local_supplier_volume": q5_sql(),
        "q10_returned_items": q10_sql(),
        "rollup_revenue": rollup_revenue_sql(),
        "sql_window_topk": sql_window_topk_sql(),
        "type_recommendation": type_recommendation_sql(),
        "streaming_window_agg": streaming_window_sql(),
        "streaming_drift": streaming_drift_sql(),
        "streaming_sessions": streaming_sessions_sql(),
        "batch_sessionize": streaming_sessions_sql(),
        "cap_per_group": """
SELECT source, doc_id
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY md5(doc_id::VARCHAR || '|' || '42') ASC, doc_id ASC) <= 15""",
        "ngram_counts": """
WITH tok AS (
  SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents),
grams AS (
  SELECT array_to_string(w[i:i+1], ' ') AS gram
  FROM tok, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i))
SELECT gram, count(*)::BIGINT AS "count"
FROM grams GROUP BY 1 HAVING count(*) >= 2
ORDER BY 2 DESC, 1 ASC LIMIT 100""",
        "temperature_sample": """
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
w AS (SELECT source, n, pow(n, 0.5) AS wt FROM counts),
tot AS (SELECT sum(wt) AS wsum, sum(n) AS total FROM w),
rates AS (SELECT source, least(1.0, (wt / wsum) * total / n) AS rate FROM w, tot),
f AS (
  SELECT d.source,
         (('0x' || substring(md5(d.doc_id::VARCHAR || '|' || '42'), 1, 8))::UBIGINT
           / 4294967296.0) AS frac,
         r.rate
  FROM documents d JOIN rates r USING (source))
SELECT source, count(*)::BIGINT AS n_kept
FROM f WHERE frac < rate GROUP BY 1""",
        "feature_hashing": """
WITH h AS (
  SELECT l_returnflag,
         ((('0x' || substring(md5('l_returnflag' || '|' || l_returnflag), 1, 8))::UBIGINT
           % 64))::INT AS bucket,
         ((('0x' || substring(md5('l_linestatus' || '|' || l_linestatus), 1, 8))::UBIGINT
           % 64))::INT AS ls_bucket
  FROM lineitem)
SELECT bucket, count(*)::BIGINT AS n_rows,
       count(DISTINCT l_returnflag)::BIGINT AS n_values,
       count(DISTINCT ls_bucket)::BIGINT AS n_ls_buckets
FROM h GROUP BY 1""",
        "key_skew_report": """
WITH pk AS (
  SELECT attribute, value, count(*) AS cnt
  FROM (
    SELECT 'l_orderkey' AS attribute, l_orderkey::VARCHAR AS value FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', l_suppkey::VARCHAR FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', l_returnflag FROM lineitem)
  GROUP BY 1, 2),
hot AS (
  SELECT attribute, string_agg(value, ',' ORDER BY cnt DESC, value ASC)
           FILTER (WHERE rn <= 3) AS top_keys
  FROM (SELECT attribute, value, cnt,
               row_number() OVER (PARTITION BY attribute
                                  ORDER BY cnt DESC, value ASC) AS rn
        FROM pk)
  GROUP BY 1)
SELECT p.attribute,
       count(*)::BIGINT AS n_keys,
       sum(cnt)::BIGINT AS n_rows,
       max(cnt)::BIGINT AS max_rows,
       round(avg(cnt), 6) AS avg_rows,
       round(max(cnt) / avg(cnt), 6) AS skew_ratio,
       round(max(cnt) * 1.0 / sum(cnt), 6) AS top1_share,
       max(h.top_keys) AS top_keys
FROM pk p JOIN hot h ON p.attribute = h.attribute
GROUP BY 1""",
        "q14_promo_revenue": q14_sql(),
        "null_columns_detection": """
WITH inj AS (
  SELECT CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_quantity END AS l_quantity,
         l_extendedprice, l_discount
  FROM lineitem),
n AS (SELECT count(*) AS total FROM inj)
SELECT 'l_quantity' AS attribute,
       (SELECT count(*) FROM inj WHERE l_quantity IS NULL)::BIGINT AS missing_count,
       round((SELECT count(*) FROM inj WHERE l_quantity IS NULL)::DOUBLE / total, 6) AS missing_pct
FROM n
UNION ALL
SELECT 'l_extendedprice', 0::BIGINT, 0.0 FROM n
UNION ALL
SELECT 'l_discount', 0::BIGINT, 0.0 FROM n
UNION ALL
SELECT '__rows_after__',
       (SELECT count(*) FROM inj WHERE l_quantity IS NOT NULL)::BIGINT,
       NULL
FROM n""",
        "q4_priority_semi_join": """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY 1""",
        "q12_shipmode_case_agg": """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
GROUP BY 1""",
        "q19_disjunctive_predicates": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       count(*)::BIGINT AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 35)""",
        "q22_inactive_customers": """
SELECT c_mktsegment, count(*)::BIGINT AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
GROUP BY 1""",
        "q18_large_volume_customer": q18_sql(),
        "concatenate_dataset": """
SELECT count(*)::BIGINT AS n_rows, count(DISTINCT l_orderkey)::BIGINT AS n_orders
FROM lineitem""",
        "q2_min_cost_supplier": """
WITH ps AS (
  SELECT l_partkey, l_suppkey, round(avg(l_extendedprice / l_quantity), 6) AS unit_cost
  FROM lineitem GROUP BY 1, 2),
j AS (
  SELECT p_partkey, p_name, s_name, n_name, unit_cost,
         min(unit_cost) OVER (PARTITION BY p_partkey) AS mc
  FROM ps
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 3
  JOIN part ON l_partkey = p_partkey
  WHERE p_size >= 25 AND p_type = 'STANDARD')
SELECT p_partkey, p_name, s_name, n_name, unit_cost FROM j WHERE unit_cost = mc""",
        "q7_volume_shipping": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3""",
        "q8_market_share": """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_2'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))
                  ELSE 0::DECIMAL(12,2) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6)
         AS mkt_share,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE EXISTS (SELECT 1 FROM customer c JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
              WHERE c.c_custkey = o_custkey AND n2.n_regionkey = 2)
GROUP BY 1""",
        "q9_product_profit": """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))
                  - 0.6::DECIMAL(8,4) * CAST(p_retailprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2""",
        "q11_important_parts": """
WITH f AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2))) AS v
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_regionkey = 3)),
pp AS (SELECT l_partkey, sum(v) AS pv FROM f GROUP BY 1)
SELECT l_partkey, CAST(pv AS DOUBLE) AS part_value
FROM pp WHERE CAST(pv AS DOUBLE) > 2.0 * CAST((SELECT avg(pv) FROM pp) AS DOUBLE)""",
        "q13_customer_distribution": """
WITH cnt AS (
  SELECT o_custkey, count(*) AS n_orders
  FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
SELECT c_count, count(*)::BIGINT AS custdist
FROM (SELECT coalesce(n_orders, 0)::BIGINT AS c_count
      FROM customer LEFT JOIN cnt ON c_custkey = o_custkey)
GROUP BY 1""",
        "q15_top_supplier": """
WITH rev AS (
  SELECT l_suppkey,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1::DECIMAL(4,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""",
        "q16_supplier_part_counts": """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        JOIN nation ON s_nationkey = n_nationkey
                        WHERE n_regionkey = 4)
GROUP BY 1, 2, 3""",
        "q17_small_quantity_revenue": """
WITH li_b AS (
  SELECT l.* FROM lineitem l
  JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'),
a AS (SELECT l_partkey, avg(l_quantity) AS avg_qty FROM li_b GROUP BY 1)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2)
         AS avg_yearly,
       count(*)::BIGINT AS n_rows
FROM li_b JOIN a USING (l_partkey)
WHERE l_quantity < 0.2 * avg_qty""",
        "q20_promo_part_suppliers": """
WITH pair AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS pair_qty
  FROM lineitem
  WHERE year(l_shipdate) = 1997
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY 1, 2)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM pair
                    WHERE pair_qty > (SELECT avg(pair_qty) FROM pair))""",
        "q21_waiting_suppliers": """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END)
           AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
per AS (
  SELECT l_suppkey, is_late,
         count(*) OVER (PARTITION BY l_orderkey) AS n_sup,
         sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per_os)
SELECT s_name, count(*)::BIGINT AS numwait
FROM per JOIN supplier ON l_suppkey = s_suppkey
WHERE is_late = 1 AND n_sup > 1 AND n_late = 1
GROUP BY 1""",
        "asof_join_events": """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
-- pre-aggregate simultaneous purchases (max value wins): which tied row
-- an ASOF pick returns is engine-arbitrary, and sf10 has real ties
p AS (SELECT user_id, ts, max(value) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT c.event_id, c.user_id,
       round(p.value, 6) AS purchase_value,
       date_diff('second', p.ts, c.ts)::BIGINT AS secs_since_purchase
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""",
        "asof_join_ties": """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
-- the tie convention stated declaratively: among purchases tied on
-- (user, day) the largest value wins — must equal the Spark operator's
-- on_tie=('max','value') pick row-for-row
p AS (SELECT user_id, date_trunc('day', ts) AS ts, max(value) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT c.event_id, c.user_id,
       round(p.value, 6) AS purchase_value,
       date_diff('second', p.ts, c.ts)::BIGINT AS secs_since_purchase
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""",
        "streaming_join": """
SELECT s.event_id AS signup_id, e.event_id AS error_id, s.user_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
  ON s.user_id = e.user_id
 AND e.ts >= s.ts AND e.ts <= s.ts + INTERVAL 2 HOUR""",
        "hash_split": """
WITH h AS (
  SELECT n_chars,
         substring(md5(doc_id::VARCHAR || '|#42'), 1, 4) AS b
  FROM documents)
SELECT CASE WHEN b < 'cccc' THEN 'train'
            WHEN b < 'e666' THEN 'val'
            ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM h GROUP BY 1""",
        "vocabulary": """
WITH tok AS (
  SELECT doc_id, lower(t.token) AS token
  FROM documents,
       unnest(string_split_regex(trim(text), '\\s+')) AS t(token)
  WHERE t.token <> ''),
agg AS (
  SELECT token, count(*)::BIGINT AS "count",
         count(DISTINCT doc_id)::BIGINT AS doc_freq
  FROM tok GROUP BY 1)
SELECT token, "count", doc_freq
FROM agg WHERE "count" >= 2
ORDER BY "count" DESC, token ASC LIMIT 200""",
        "pack_sequences": """
WITH t AS (
  SELECT lang, doc_id, n_chars::BIGINT AS n_chars,
         sum(n_chars::BIGINT) OVER (PARTITION BY lang ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents)
SELECT lang, doc_id, n_chars,
       ((cum - n_chars) // 2048)::BIGINT AS seq_id,
       ((cum - n_chars) % 2048)::BIGINT AS seq_offset,
       (CASE WHEN (cum - n_chars) // 2048 < (cum - 1) // 2048
             THEN 1 ELSE 0 END)::INT AS straddles
FROM t""",
        "pii_redaction": """
WITH t0 AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@mail.example.com at 10.0.'
              || (doc_id % 256)::VARCHAR || '.7 or +1 (555) 010-'
              || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS tx
  FROM documents),
t1 AS (
  SELECT doc_id,
         len(regexp_extract_all(tx, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS e,
         regexp_replace(tx, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[REDACTED]', 'g') AS tx1
  FROM t0),
t2 AS (
  SELECT doc_id, e,
         len(regexp_extract_all(tx1, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS i,
         regexp_replace(tx1, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[REDACTED]', 'g') AS tx2
  FROM t1),
t3 AS (
  SELECT doc_id, e, i,
         len(regexp_extract_all(tx2, '\\+[0-9][0-9()\\- ]{6,}[0-9]')) AS p,
         regexp_replace(tx2, '\\+[0-9][0-9()\\- ]{6,}[0-9]', '[REDACTED]', 'g') AS tx3
  FROM t2)
SELECT doc_id, (e + i + p)::BIGINT AS n_redactions, length(tx3)::BIGINT AS redacted_len
FROM t3""",
        "repetition_stats": """
WITH tok AS (
  SELECT doc_id AS id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents),
grams AS (
  SELECT id, len(w)::BIGINT AS n_tokens, array_to_string(w[i:i+1], ' ') AS g
  FROM tok, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i)),
per_gram AS (
  SELECT id, n_tokens, g, count(*) AS c FROM grams GROUP BY 1, 2, 3)
SELECT id, n_tokens,
       sum(c)::BIGINT AS n_grams,
       count(*)::BIGINT AS distinct_grams,
       round(1.0 - count(*) / sum(c), 6) AS dup_gram_frac,
       round(max(c) * 2.0 / n_tokens, 6) AS top_gram_frac
FROM per_gram GROUP BY 1, 2""",
        "contamination_check": """
WITH tok AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents),
doc_grams AS (
  SELECT DISTINCT doc_id AS id, array_to_string(w[i:i+4], ' ') AS g
  FROM tok, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
  WHERE doc_id % 20 <> 0),
bench AS (
  SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS g
  FROM tok, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
  WHERE doc_id % 20 = 0)
SELECT id,
       count(*)::BIGINT AS n_grams,
       sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
       round(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS contamination_frac
FROM doc_grams d LEFT JOIN bench b USING (g)
GROUP BY 1""",
        "range_join_events": """
SELECT s.event_id AS signup_id, e.event_id AS error_id, s.user_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
  ON s.user_id = e.user_id
 AND e.ts >= s.ts AND e.ts <= s.ts + INTERVAL 2 HOUR""",
        "feature_recommender": feature_recommender_sql(),
        "dedup_minhash_incremental": minhash_incremental_sql(),
        "streaming_dedup_incremental": minhash_incremental_sql(),
        "grouped_summary": grouped_summary_sql(),
        "language_id_confusion": language_id_confusion_sql(),
        "robust_stats": robust_stats_sql(),
        "interval_coverage": """
WITH iv AS (
  SELECT user_id, ts AS s, ts + INTERVAL 2 HOUR AS e
  FROM events WHERE event_type = 'signup'),
o AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER wprev IS NULL
                OR epoch(s) > epoch(max(e) OVER wprev) THEN 1 ELSE 0 END AS op
  FROM iv
  WINDOW wprev AS (PARTITION BY user_id ORDER BY s ASC, e ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
t AS (
  SELECT user_id, s, e,
         sum(op) OVER (PARTITION BY user_id ORDER BY s ASC, e ASC
                       ROWS UNBOUNDED PRECEDING) AS isl
  FROM o),
m AS (
  SELECT user_id, isl, min(s) AS s, max(e) AS e, count(*) AS nm
  FROM t GROUP BY 1, 2)
SELECT user_id, sum(nm)::BIGINT AS n_intervals, count(*)::BIGINT AS n_islands,
       round(sum(epoch(e) - epoch(s)), 3) AS covered_seconds
FROM m GROUP BY 1""",
        "zipf_fit": """
WITH tok AS (
  SELECT doc_id, lower(t.token) AS token
  FROM documents,
       unnest(string_split_regex(trim(text), '\\s+')) AS t(token)
  WHERE t.token <> ''),
agg AS (
  SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY 1 HAVING count(*) >= 2),
ranked AS (
  SELECT ln(row_number() OVER (ORDER BY c DESC, token ASC)::DOUBLE) AS x,
         ln(c::DOUBLE) AS y
  FROM agg ORDER BY c DESC, token ASC LIMIT 200),
m AS (
  SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM ranked)
SELECT n::BIGINT AS n_tokens,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m""",
        "spatial_join": """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 170) - 85 + 0.25 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer),
pol AS (
  SELECT n_nationkey,
         ((n_nationkey * 7) % 170) - 85.0 AS clat,
         ((n_nationkey * 13) % 360) - 180.0 AS clon
  FROM nation)
SELECT c_custkey, n_nationkey
FROM pts, pol
WHERE abs(lat - clat) + abs(lon - clon) < 15.0""",
        "time_weighted_avg": """
-- exact integer (micro-unit) arithmetic mirrors the operator's decimal
-- path bit-for-bit: float partial-sum order flipped round-half
-- boundaries at sf1, and DuckDB's decimal DIVISION goes through double
-- (another half-boundary hazard, hit by plain_avg at sf1) — so sums
-- run in HUGEINT micro/pico units and the half-up rounding Spark's
-- decimal division applies is replayed as floor((2N + D) / 2D)
WITH s AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(19,6)) * 1000000 AS HUGEINT) AS iv,
         CAST(CAST(epoch(lead(ts) OVER (PARTITION BY user_id
                     ORDER BY ts ASC, value ASC NULLS FIRST))
                   - epoch(ts) AS DECIMAL(19,6)) * 1000000 AS HUGEINT) AS idt
  FROM events),
a AS (
  SELECT user_id, count(*) AS c,
         sum(iv) AS m_v,            -- micro value units
         sum(iv * idt) AS m_vdt,    -- pico value*second units
         sum(idt) AS m_dt           -- micro seconds
  FROM s GROUP BY 1)
SELECT user_id,
       c::BIGINT AS n_obs,
       CAST((2 * m_dt + 1000000) // 2000000 AS BIGINT) AS span_seconds,
       CASE WHEN m_dt > 0 THEN
         CAST((2 * m_vdt * 1000000 + m_dt * 1000000)
              // (2 * m_dt * 1000000) AS DOUBLE) / 1000000.0
       END AS twa,
       CAST((2 * m_v + c) // (2 * c) AS DOUBLE) / 1000000.0 AS plain_avg
FROM a""",
        "cusum_changepoints": """
WITH c AS (
  SELECT user_id, ts, event_id,
         sum(value - 50.0) OVER w AS cp,
         sum(value - 50.0) OVER w AS cn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING)),
s AS (
  SELECT user_id,
         round(cp - least(0.0, min(cp) OVER w2), 6) AS s_pos,
         round(-(cn - greatest(0.0, max(cn) OVER w2)), 6) AS s_neg
  FROM c
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS UNBOUNDED PRECEDING))
SELECT user_id, count(*)::BIGINT AS n_obs,
       round(max(s_pos), 6) AS max_cusum_pos,
       round(max(s_neg), 6) AS max_cusum_neg,
       sum(CASE WHEN s_pos > 200.0 OR s_neg > 200.0 THEN 1 ELSE 0 END)::BIGINT
         AS n_flagged
FROM s GROUP BY 1""",
        "benford_check": """
WITH melted AS (
  SELECT 'l_extendedprice' AS attribute, abs(l_extendedprice) AS v
  FROM lineitem WHERE abs(l_extendedprice) > 0
  UNION ALL
  SELECT 'l_quantity', abs(l_quantity) FROM lineitem WHERE abs(l_quantity) > 0),
digits AS (
  SELECT attribute,
         CASE d WHEN 10 THEN 1 WHEN 0 THEN 9 ELSE d END AS digit
  FROM (SELECT attribute,
               CAST(floor(v / pow(10, floor(log10(v)))) AS INT) AS d
        FROM melted)),
raw_counts AS (
  SELECT attribute, digit, count(*)::BIGINT AS n
  FROM digits WHERE digit BETWEEN 1 AND 9 GROUP BY 1, 2),
counts AS (
  SELECT f.attribute, f.digit, coalesce(c.n, 0)::BIGINT AS n
  FROM (SELECT a.attribute, d.digit
        FROM (SELECT unnest(['l_extendedprice', 'l_quantity']) AS attribute) a,
             (SELECT unnest(range(1, 10)) AS digit) d) f
  LEFT JOIN raw_counts c USING (attribute, digit))
SELECT attribute, digit, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY attribute), 6) AS observed_frac,
       round(log10(1.0 + 1.0 / digit), 6) AS expected_frac,
       round(sum(n) OVER (PARTITION BY attribute)
             * pow(n * 1.0 / sum(n) OVER (PARTITION BY attribute)
                   - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit), 6) AS chi2_term
FROM counts""",
        "weighted_sample_k": """
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         pow((('0x' || substring(md5(doc_id::VARCHAR || '|' || '7'), 1, 8))::UBIGINT
              / 4294967296.0),
             1.0 / n_chars) AS aes
  FROM documents WHERE n_chars > 0)
SELECT lang, doc_id, n_chars
FROM keyed
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY aes DESC, doc_id ASC) <= 10""",
        "interval_overlap_join": """
SELECT s.event_id AS a_id, e.event_id AS b_id, s.user_id
FROM (SELECT event_id, user_id, ts AS s_start, ts + INTERVAL 2 HOUR AS s_end
      FROM events WHERE event_type = 'signup') s
JOIN (SELECT event_id, user_id, ts AS e_start, ts + INTERVAL 30 MINUTE AS e_end
      FROM events WHERE event_type = 'error') e
  ON s.user_id = e.user_id
 AND s.s_start <= e.e_end AND e.e_start <= s.s_end""",
        "fuzzy_match": """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       levenshtein(a.c_name, b.c_name)::INT AS distance
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1""",
        "validate_constraints": """
WITH m AS (
  SELECT count(*) AS n,
         count(o_orderkey) AS nn_k,
         count(DISTINCT o_orderkey) AS d_k,
         count(o_totalprice) AS nn_p,
         count(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 END) AS v_range,
         count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS v_set,
         count(o_orderstatus) AS nn_s,
         count(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000 THEN 1 END) AS v_tight
  FROM orders),
rf AS (
  SELECT count(*) AS tot,
         sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS miss
  FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
  LEFT JOIN customer c ON c.c_custkey = o.o_custkey)
SELECT * FROM (
  SELECT 0 AS rule_idx, 'not_null' AS rule_type, 'o_orderkey' AS attribute,
         round((n - nn_k) * 1.0 / n, 6) AS observed, 0.0 AS threshold,
         CASE WHEN (n - nn_k) * 1.0 / n <= 0.0 THEN 1 ELSE 0 END AS passed FROM m
  UNION ALL
  SELECT 1, 'unique', 'o_orderkey', round((nn_k - d_k) * 1.0 / nn_k, 6), 0.0,
         CASE WHEN (nn_k - d_k) * 1.0 / nn_k <= 0.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 2, 'in_range', 'o_totalprice', round(v_range * 1.0 / nn_p, 6), 0.0,
         CASE WHEN v_range * 1.0 / nn_p <= 0.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 3, 'in_set', 'o_orderstatus', round(v_set * 1.0 / nn_s, 6), 0.0,
         CASE WHEN v_set * 1.0 / nn_s <= 0.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 4, 'referential', 'o_custkey', round(miss * 1.0 / tot, 6), 0.0,
         CASE WHEN miss * 1.0 / tot <= 0.0 THEN 1 ELSE 0 END FROM rf
  UNION ALL
  SELECT 5, 'in_range', 'o_totalprice', round(v_tight * 1.0 / nn_p, 6), 0.0,
         CASE WHEN v_tight * 1.0 / nn_p <= 0.0 THEN 1 ELSE 0 END FROM m)""",
        "funnel_analysis": """
WITH e AS (SELECT user_id AS u, event_type AS t, ts FROM events),
s0 AS (SELECT u, min(ts) AS t0 FROM e WHERE t = 'signup' GROUP BY 1),
s1 AS (SELECT e.u, min(e.ts) AS t1, min(s0.t0) AS t0
       FROM e JOIN s0 ON e.u = s0.u
       WHERE e.t = 'click' AND e.ts > s0.t0
         AND e.ts <= s0.t0 + INTERVAL 86400 SECOND GROUP BY 1),
s2 AS (SELECT e.u, min(e.ts) AS t2
       FROM e JOIN s1 ON e.u = s1.u
       WHERE e.t = 'purchase' AND e.ts > s1.t1
         AND e.ts <= s1.t0 + INTERVAL 86400 SECOND GROUP BY 1),
counts AS (
  SELECT 0 AS step_idx, 'signup' AS step, count(*) AS n FROM s0
  UNION ALL SELECT 1, 'click', count(*) FROM s1
  UNION ALL SELECT 2, 'purchase', count(*) FROM s2)
SELECT step_idx, step, n::BIGINT AS n_users,
       round(n / first(n) OVER (ORDER BY step_idx), 6) AS conversion
FROM counts""",
        "cohort_retention": """
WITH ev AS (SELECT user_id AS u, date_trunc('week', ts) AS p FROM events),
f AS (SELECT u, min(p) AS cohort FROM ev GROUP BY 1),
cells AS (SELECT DISTINCT ev.u, f.cohort::DATE AS cohort,
            ((epoch(ev.p) - epoch(f.cohort)) / 604800)::INT AS period_idx
          FROM ev JOIN f ON ev.u = f.u),
g AS (SELECT cohort, period_idx, count(*) AS n_users FROM cells GROUP BY 1, 2)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort, period_idx,
       n_users::BIGINT AS n_users,
       round(n_users / first(n_users) OVER (
         PARTITION BY cohort ORDER BY period_idx), 6) AS retention
FROM g""",
        "scd2_versions": """
WITH u AS (SELECT user_id, event_type, ts, event_id FROM events),
d AS (SELECT user_id, event_type, ts, event_id,
        md5(coalesce(event_type, '<NULL>')) AS fp,
        lag(md5(coalesce(event_type, '<NULL>'))) OVER (
          PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
      FROM u),
c AS (SELECT user_id, event_type, ts, event_id
      FROM d WHERE prev IS NULL OR prev <> fp)
SELECT user_id, event_type, ts AS valid_from,
       coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
                TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         IS NULL)::INT AS is_current
FROM c""",
        "heavy_hitters": f"""
WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
tot AS (SELECT count(*) AS n FROM tok)
SELECT token AS value, count(*)::BIGINT AS "count",
       round(count(*) / any_value(n), 6) AS share
FROM tok, tot
GROUP BY token
HAVING count(*) >= 0.005 * any_value(n)""",
        "chunk_documents": """
WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
n AS (SELECT doc_id, text,
        greatest(ceil((L - 50) / 150.0), 1)::INT AS n_chunks FROM d),
c AS (SELECT doc_id, n_chunks, i AS chunk_id,
        substring(text, i * 150 + 1, 200) AS chunk_text
      FROM n, unnest(range(0, n_chunks)) AS t(i))
SELECT doc_id, chunk_id, (chunk_id * 150 + 1)::BIGINT AS chunk_start,
       length(chunk_text)::BIGINT AS chunk_len,
       md5(chunk_text) AS chunk_md5, n_chunks
FROM c""",
        "quantize_embeddings": """
WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (SELECT vec_id, v,
        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
q AS (SELECT vec_id, v, scale,
        CASE WHEN scale > 0
             THEN list_transform(v, x -> CAST(round(x / scale) AS INT))
             ELSE list_transform(v, x -> 0) END AS qvec
      FROM s),
r AS (SELECT vec_id, scale,
        list_sum(qvec) AS qsum,
        list_max(list_transform(generate_series(1, len(qvec)),
                 i -> abs(qvec[i] * scale - v[i]))) AS err
      FROM q)
SELECT vec_id, round(scale, 6) AS scale, qsum::BIGINT AS qsum,
       round(err, 6) AS max_err
FROM r""",
        "pca_closed_form": """
WITH s AS (SELECT corr(l_quantity, l_extendedprice) AS r FROM lineitem)
SELECT round(1 + abs(r), 6) AS eig1,
       round(1 - abs(r), 6) AS eig2,
       round((1 + abs(r)) / 2, 6) AS explained1,
       0.0 AS cross_corr
FROM s""",
        "boilerplate_removal": """
WITH planted AS (
  SELECT doc_id,
         text || chr(10) || 'Subscribe to our newsletter' || chr(10) ||
         CASE WHEN doc_id % 5 = 0 THEN 'weekly digest promo'
              ELSE 'footer id ' || doc_id::VARCHAR END AS text
  FROM documents),
split AS (SELECT doc_id, string_split(text, chr(10)) AS s FROM planted),
lines AS (
  SELECT doc_id, i AS pos, s[i] AS line, lower(trim(s[i])) AS k
  FROM split, unnest(range(1, len(s) + 1)) AS t(i)),
freq AS (
  SELECT k, count(DISTINCT doc_id) AS df FROM lines WHERE k <> '' GROUP BY 1),
tot AS (SELECT count(*) AS n FROM documents),
flagged AS (
  SELECT l.doc_id, l.pos, l.line,
         (f.df IS NOT NULL AND f.df >= 0.5 * tot.n) AS bad
  FROM lines l LEFT JOIN freq f USING (k) CROSS JOIN tot)
SELECT doc_id,
       count(*)::BIGINT AS n_lines,
       sum(CASE WHEN bad THEN 1 ELSE 0 END)::BIGINT AS removed_lines,
       length(string_agg(CASE WHEN NOT bad THEN line END, chr(10) ORDER BY pos))::BIGINT
         AS kept_chars,
       md5(string_agg(CASE WHEN NOT bad THEN line END, chr(10) ORDER BY pos))
         AS clean_md5
FROM flagged GROUP BY 1""",
        "token_budget_sample": """
WITH ranked AS (
  SELECT source, n_chars,
         sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY md5(doc_id::VARCHAR || '|' || '7') ASC, doc_id ASC
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents)
SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS tokens_kept
FROM ranked WHERE cum <= 1500 GROUP BY 1""",
        "mixture_plan": """
WITH g AS (
  SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS tokens
  FROM documents GROUP BY 1),
t(lang, tf) AS (VALUES ('en', 0.5::DOUBLE), ('de', 0.15::DOUBLE),
                       ('es', 0.15::DOUBLE), ('fr', 0.1::DOUBLE),
                       ('zh', 0.1::DOUBLE)),
j AS (
  SELECT g.lang, n_docs, tokens, coalesce(t.tf, 0.0::DOUBLE) AS tf
  FROM g LEFT JOIN t USING (lang)),
s AS (
  SELECT min(CASE WHEN tf > 0 THEN tokens::DOUBLE / tf END) AS tstar,
         sum(tokens)::DOUBLE AS total
  FROM j)
SELECT lang, n_docs, tokens,
       round(tokens / total, 6) AS natural_frac,
       round(tf, 6) AS target_frac,
       round(CASE WHEN tf > 0 THEN least(1.0, tf * tstar / tokens)
                  ELSE 0.0 END, 6) AS rate,
       floor(tf * tstar)::BIGINT AS planned_tokens
FROM j, s""",
        # the polygon is an L1 ball, so containment has a CLOSED FORM —
        # this verifies the ray-cast UDF's geometry against independent
        # arithmetic, not a replay of its algebra (same oracle stance as
        # spatial_join).  Offsets make edge/vertex ties unrepresentable.
        "location_in_polygon": """
SELECT c_custkey,
       CASE WHEN abs(((c_custkey % 170) - 85 + 0.25) - 10.12)
               + abs(((c_custkey % 360) - 180 + 0.5) - 20.37) < 29.77
            THEN 1 ELSE 0 END AS in_polygon
FROM customer""",
        "flatten_melt": """
WITH src AS (SELECT * FROM lineitem WHERE l_orderkey % 5003 = 0)
SELECT l_orderkey, l_linenumber, 'l_quantity' AS attribute,
       round(l_quantity, 6) AS value FROM src
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       round(l_extendedprice, 6) FROM src
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       round(l_discount, 6) FROM src""",
        # conditional-agg pivot over a UNION ALL unpivot mirrors
        # melt-then-pivot transpose; mixed types stringify on both sides
        "transpose": """
WITH long_form AS (
  -- both melted columns are INT, so the stack target type stays INT
  -- (melt only stringifies MIXED types) — the unpivot mirrors that
  SELECT r_name, 'r_regionkey' AS key, r_regionkey AS value FROM region
  UNION ALL
  SELECT r_name, 'name_len', length(r_name)::INTEGER FROM region)
SELECT key,
  max(CASE WHEN r_name = 'AFRICA' THEN value END) AS "AFRICA",
  max(CASE WHEN r_name = 'AMERICA' THEN value END) AS "AMERICA",
  max(CASE WHEN r_name = 'ASIA' THEN value END) AS "ASIA",
  max(CASE WHEN r_name = 'EUROPE' THEN value END) AS "EUROPE",
  max(CASE WHEN r_name = 'MIDDLE EAST' THEN value END) AS "MIDDLE EAST"
FROM long_form GROUP BY key""",
        # customer coords are exact quarter degrees, so DMS decomposition
        # is exact integer arithmetic; radians/cos/sin round to 6
        "geo_format_conversions": """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 170) - 85 + 0.25 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer),
dms AS (
  SELECT c_custkey, lat, lon,
         abs(lat) AS a, floor(abs(lat)) AS d,
         floor((abs(lat) - floor(abs(lat))) * 60) AS m
  FROM pts)
SELECT c_custkey,
       (CASE WHEN lat < 0 THEN -1 ELSE 1 END)::INT AS lat_sign,
       d::INT AS lat_deg,
       m::INT AS lat_min,
       round((a - d - m / 60) * 3600, 6) AS lat_sec,
       round((CASE WHEN lat < 0 THEN -1 ELSE 1 END)
             * (d + m / 60.0
                + round((a - d - m / 60) * 3600, 6) / 3600.0), 6) AS lat_dd,
       round(radians(lat), 6) AS lat_rad,
       round(radians(lon), 6) AS lon_rad,
       round(cos(radians(lat)) * cos(radians(lon)), 6) AS x,
       round(cos(radians(lat)) * sin(radians(lon)), 6) AS y,
       round(sin(radians(lat)), 6) AS z
FROM dms""",
        # analytic second-order Taylor for g = x*x + y: mean_g = µ²+σ²+µ_y,
        # var_g = 4µ²σ² + σ_y² — the independent truth the operator's
        # numeric central differences must land on (4-decimal CV contract;
        # see q_feature_stability_estimation).  DuckDB allows lateral
        # alias references, so the SI bands read the cv aliases directly.
        "feature_stability_estimation": """
WITH per AS (
  SELECT l_orderkey % 3 AS idx,
         avg(l_quantity) AS qm, stddev_samp(l_quantity) AS qs,
         avg(l_discount) AS dm, stddev_samp(l_discount) AS ds
  FROM lineitem GROUP BY 1),
gvals AS (
  SELECT idx,
         qm * qm + qs * qs + dm AS mg,
         sqrt(4 * qm * qm * qs * qs + ds * ds) AS sg
  FROM per),
cvs AS (
  -- band on the 6-decimal cv (the operator's scoring input); the
  -- 4-decimal value is only the reported contract
  SELECT round(stddev_samp(mg) / avg(mg), 6) AS cv6_m,
         round(stddev_samp(sg) / avg(sg), 6) AS cv6_s
  FROM gvals),
scored AS (
  SELECT round(cv6_m, 4) AS mean_cv, round(cv6_s, 4) AS stddev_cv,
    (CASE WHEN abs(cv6_m) < 0.03 THEN 4.0 WHEN abs(cv6_m) < 0.1 THEN 3.0
          WHEN abs(cv6_m) < 0.2 THEN 2.0 WHEN abs(cv6_m) < 0.5 THEN 1.0
          ELSE 0.0 END) AS mean_si,
    (CASE WHEN abs(cv6_s) < 0.03 THEN 4.0 WHEN abs(cv6_s) < 0.1 THEN 3.0
          WHEN abs(cv6_s) < 0.2 THEN 2.0 WHEN abs(cv6_s) < 0.5 THEN 1.0
          ELSE 0.0 END) AS stddev_si
  FROM cvs)
SELECT 'g' AS attribute, mean_cv, stddev_cv, mean_si, stddev_si,
       round(mean_si * 0.7 + stddev_si * 0.3, 4) AS stability_index,
       (CASE WHEN mean_si * 0.7 + stddev_si * 0.3 < 1.0 THEN 1 ELSE 0
        END)::INT AS flagged
FROM scored""",
        # the parse replay goes THROUGH the string forms so it verifies
        # the detected-format parse, not just date identity
        "ts_preprocess": """
SELECT o_orderkey,
       strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS iso_str,
       strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS compact_str
FROM orders WHERE o_orderkey % 97 = 0""",
        # full algorithm replay: grid snap -> dense cells -> 8-neighbor
        # connected components (recursive CTE over packed cell keys whose
        # numeric order IS the (cx, cy) lexicographic order) -> rank
        # cluster ids -> 3x3 halo border labeling -> noise = -1.  The
        # self-pair from the |dx|<=1 join seeds min-reachable with the
        # cell itself, so singleton dense cells label correctly.
        "geo_density_clusters": """
WITH RECURSIVE
pts AS (
  SELECT c_custkey,
         (c_custkey % 170) - 85 + 0.25 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer),
g AS (
  SELECT c_custkey,
         CAST(floor(lon / (1000.0 / 111.32)) AS BIGINT) AS cx,
         CAST(floor(lat / (1000.0 / 111.32)) AS BIGINT) AS cy
  FROM pts),
cells AS (SELECT cx, cy, count(*) AS n FROM g GROUP BY 1, 2),
dense AS (
  SELECT cx, cy,
         (cx + 1073741824) * 2147483648 + (cy + 1073741824) AS pk
  FROM cells WHERE n >= 3),
edges AS (
  SELECT a.pk AS src, b.pk AS dst
  FROM dense a JOIN dense b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
comp AS (SELECT src AS pk, min(dst) AS root FROM reach GROUP BY src),
ranked AS (
  SELECT pk, (dense_rank() OVER (ORDER BY root) - 1)::INT AS lbl FROM comp),
halo AS (
  SELECT d.cx + ox.dx AS cx, d.cy + oy.dy AS cy, min(r.lbl) AS lbl
  FROM dense d
  JOIN ranked r USING (pk)
  CROSS JOIN (VALUES (-1), (0), (1)) AS ox(dx)
  CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
  GROUP BY 1, 2)
SELECT g.c_custkey, coalesce(h.lbl, -1) AS cluster
FROM g LEFT JOIN halo h ON g.cx = h.cx AND g.cy = h.cy""",
        # four granularities replayed; Spark dayofweek is Sunday=1,
        # DuckDB's is Sunday=0, so weekend maps (1,7) -> (0,6)
        "ts_analyzer": """
WITH f AS (
  SELECT CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS h, value,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wknd
  FROM events),
fp AS (
  SELECT d, h, value, wknd,
         CASE WHEN h >= 4 AND h < 7 THEN 'early_hours'
              WHEN h >= 7 AND h < 10 THEN 'morning'
              WHEN h >= 10 AND h < 14 THEN 'late_morning'
              WHEN h >= 14 AND h < 17 THEN 'afternoon'
              WHEN h >= 17 AND h < 20 THEN 'evening'
              ELSE 'night' END AS daypart
  FROM f)
SELECT 'date' AS granularity, strftime(d, '%Y-%m-%d') AS key,
       count(*)::BIGINT AS n_rows, round(avg(value), 6) AS value_mean
FROM fp GROUP BY 2
UNION ALL
SELECT 'hour', CAST(h AS VARCHAR), count(*)::BIGINT, round(avg(value), 6)
FROM fp GROUP BY 2
UNION ALL
SELECT 'daypart', daypart, count(*)::BIGINT, round(avg(value), 6)
FROM fp GROUP BY 2
UNION ALL
SELECT 'weekend', CAST(wknd AS VARCHAR), count(*)::BIGINT, round(avg(value), 6)
FROM fp GROUP BY 2""",
        # closed-form separable-blob truth: 4 blobs ≥90° apart with ±1°
        # jitter — any correct silhouette argmax over k=2..6 selects
        # exactly the 4 blobs, each pure (this is a SEMANTIC oracle of
        # the ML sweep's model selection, not a replay of KMeans)
        "geo_cluster_analysis": """
SELECT (c_custkey % 4)::INT AS blob, count(*)::BIGINT AS n_points,
       1::BIGINT AS clusters_in_blob, 4::BIGINT AS selected_k
FROM customer GROUP BY 1""",
        # word→line synthesis, then the Gopher dup-line aggregate replayed:
        # per (doc, line) counts → dup fractions by line and by chars
        "line_repetition": """
WITH src AS (
  SELECT doc_id, replace(text, ' ', chr(10)) AS t
  FROM documents WHERE doc_id % 7 = 0 AND trim(text) <> ''),
lines AS (
  SELECT doc_id, trim(u.l) AS line
  FROM src, unnest(string_split(t, chr(10))) AS u(l)
  WHERE trim(u.l) <> ''),
per AS (
  SELECT doc_id, line, count(*) AS cnt, length(line) AS chars
  FROM lines GROUP BY 1, 2)
SELECT doc_id,
       sum(cnt)::BIGINT AS n_lines,
       count(*)::BIGINT AS distinct_lines,
       round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
             / sum(cnt), 6) AS dup_line_frac,
       round(sum(CASE WHEN cnt > 1 THEN cnt * chars ELSE 0 END)
             / sum(cnt * chars), 6) AS dup_line_char_frac
FROM per GROUP BY 1""",
        # every unit extraction + date + daypart + weekend, row-level
        # (Spark dayofweek is Sunday=1..7; DuckDB Sunday=0..6)
        "ts_processed_feats": """
SELECT event_id,
       EXTRACT(hour FROM ts)::INT AS ts_hour,
       EXTRACT(minute FROM ts)::INT AS ts_minute,
       EXTRACT(second FROM ts)::INT AS ts_second,
       EXTRACT(day FROM ts)::INT AS ts_dayofmonth,
       (dayofweek(ts) + 1)::INT AS ts_dayofweek,
       dayofyear(ts)::INT AS ts_dayofyear,
       weekofyear(ts)::INT AS ts_weekofyear,
       EXTRACT(month FROM ts)::INT AS ts_month,
       EXTRACT(quarter FROM ts)::INT AS ts_quarter,
       EXTRACT(year FROM ts)::INT AS ts_year,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ts_date,
       CASE WHEN EXTRACT(hour FROM ts) >= 4 AND EXTRACT(hour FROM ts) < 7
                 THEN 'early_hours'
            WHEN EXTRACT(hour FROM ts) >= 7 AND EXTRACT(hour FROM ts) < 10
                 THEN 'morning'
            WHEN EXTRACT(hour FROM ts) >= 10 AND EXTRACT(hour FROM ts) < 14
                 THEN 'late_morning'
            WHEN EXTRACT(hour FROM ts) >= 14 AND EXTRACT(hour FROM ts) < 17
                 THEN 'afternoon'
            WHEN EXTRACT(hour FROM ts) >= 17 AND EXTRACT(hour FROM ts) < 20
                 THEN 'evening'
            ELSE 'night' END AS ts_daypart,
       CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS ts_weekend
FROM events WHERE event_id % 37 = 0""",
        # salted join ≡ plain join: the oracle runs the PLAIN SQL join on
        # the same hot-key mapping, so any row loss/duplication in the
        # salt-explode path hash-mismatches; 'salted[8]' is asserted
        # engine-side by the query (the probe must route to salting)
        "salted_join_skew": """
WITH big AS (
  SELECT CASE WHEN l_partkey % 10 < 7 THEN 0 ELSE l_partkey END::BIGINT AS k,
         l_quantity
  FROM lineitem),
small AS (
  SELECT CASE WHEN p_partkey % 10 < 7 THEN 0 ELSE p_partkey END::BIGINT AS k,
         count(*)::BIGINT AS dim_n
  FROM part GROUP BY 1)
SELECT big.k AS k, count(*)::BIGINT AS n_rows,
       round(sum(l_quantity), 6) AS sum_qty,
       max(dim_n)::BIGINT AS dim_n,
       'salted[8]' AS strategy
FROM big JOIN small ON big.k = small.k
GROUP BY 1""",
        # closed-form expected detection for the synthesized frame:
        # latitude/longitude in range with name hints, c_acctbal out of
        # range, gh matches the geohash alphabet, c_mktsegment doesn't
        "geo_auto_detect": """
SELECT 'lat' AS kind, 'latitude' AS col_name
UNION ALL SELECT 'lon', 'longitude'
UNION ALL SELECT 'geohash', 'gh'""",
    }
