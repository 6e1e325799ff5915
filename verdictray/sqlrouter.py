"""Minimal SQL frontend routed to Ray Data aggregates and sketch UDAFs —
the Verdict-lineage "interactive query" surface (public VerdictDB accepts
aggregate SQL and answers from pre-built state; SIGMOD'18. No reference
file:line — /root/reference is empty).

Supported grammar (case-insensitive keywords; unqualified column names,
unique across the joined tables — TPC-H-style prefixes; no subqueries
except membership ``IN (SELECT col FROM t)``):

    [WITH name AS "(" query ")" ("," name2 AS "(" query2 ")")*]
                                               -- CTEs: each body runs
                                               --   ONCE as its own
                                               --   streaming plan and
                                               --   write_parquets
                                               --   (distributed parts)
                                               --   into a temp overlay
                                               --   dir symlinking the
                                               --   base tables; the
                                               --   main query sees the
                                               --   CTE as a plain table
                                               --   in EVERY position
                                               --   (FROM/JOIN/sub-
                                               --   queries/EXISTS).
                                               --   Later CTEs may
                                               --   reference earlier
                                               --   ones; a CTE may
                                               --   shadow a base table
    select_core (set_op select_core)*
    set_op := "UNION ALL" | "UNION" ["DISTINCT"]
            | "INTERSECT" ["DISTINCT"] | "EXCEPT" ["DISTINCT"]
                                               -- UNION ALL: Dataset.union
                                               --   block concatenation,
                                               --   zero shuffles. The
                                               --   distinct set ops:
                                               --   per-block Arrow
                                               --   pre-dedup (+ side
                                               --   indicators for
                                               --   INTERSECT/EXCEPT) ->
                                               --   ONE null-safe
                                               --   distinct-rows groupby
                                               --   -> vectorized
                                               --   presence filter
                                               --   (intersect: in every
                                               --   side; except: in side
                                               --   1 and no other —
                                               --   left-assoc A-B-C).
                                               --   Single-operator
                                               --   chains only; trailing
                                               --   ORDER BY/LIMIT bind
                                               --   to the whole result
    [ORDER BY ...] [LIMIT n]

    select_core :=
    SELECT [DISTINCT] item ("," item)*         -- items may also be ALL
                                               --   plain columns/scalar
                                               --   exprs with no GROUP
                                               --   BY: a streaming
                                               --   projection/filter
                                               --   scan (global sort
                                               --   only if ORDER BY;
                                               --   ORDER BY may use
                                               --   unselected columns)
    FROM ( table | "(" select_core [ORDER BY …] [LIMIT n] ")" [AS] t )
                                      -- derived table: the inner plan
                                      --   executes as its own streaming
                                      --   Dataset consumed block-wise
         (["LEFT" ["OUTER"]] "JOIN" table "ON" col "=" col)*
    [WHERE pred ("AND" pred)*]
    [GROUP BY col ("," col)*
     | GROUP BY ROLLUP|CUBE "(" col ("," col)* ")"
     | GROUP BY GROUPING SETS "(" "(" [col ("," col)*] ")" ("," …)* ")"]
                                      -- GROUPING SETS: the explicit-
                                      --   level generalization — ONE
                                      --   finest pass over the union of
                                      --   set keys; only the REQUESTED
                                      --   levels re-aggregate (() = the
                                      --   grand total)
                                      -- ROLLUP: ONE distributed pass at
                                      --   the finest level; coarser
                                      --   levels re-aggregate the
                                      --   group-count-sized partials
                                      --   (decomposable exact aggs +
                                      --   the mergeable sketches
                                      --   APPROX_COUNT_DISTINCT /
                                      --   APPROX_QUANTILE[_TDIGEST] —
                                      --   blobs merge associatively
                                      --   across levels where exact
                                      --   DISTINCT/quantiles cannot;
                                      --   rolled-up keys are NULL).
                                      --   CUBE: same machinery, ALL 2^k
                                      --   key subsets (k <= 8).
                                      --   HAVING composes (filters the
                                      --   union of levels, grouping-sets
                                      --   semantics); GROUPING(col)
                                      --   items emit the 0/1 rolled-up
                                      --   marker per level
    [HAVING pred ("AND" pred)*]       -- aliases, keys, or agg calls
    [QUALIFY pred ("AND" pred)*]      -- window queries only: vectorized
                                      --   filter AFTER window columns
                                      --   attach (top-N-per-group), may
                                      --   reference SELECTed items
    [ORDER BY col_or_position [ASC|DESC] [NULLS FIRST|LAST] ("," ...)*]
                                      -- default null order: NULLS LAST
                                      --   either direction (DuckDB's
                                      --   default); explicit placement
                                      --   adds an is-null sentinel sort
                                      --   key (vectorized, dropped after
                                      --   the sort)
    [LIMIT n]

    item := expr ["AS" alias]
    expr := col
          | scalar ["AS" alias]                  -- derived group key; must
                                                 --   be GROUPed BY via its
                                                 --   alias (DuckDB accepts
                                                 --   the same spelling)
          | COUNT(*) | COUNT([DISTINCT] col)
          | SUM(scalar) | AVG(scalar) | MIN(scalar) | MAX(scalar)
          | SUM(DISTINCT col) | AVG(DISTINCT col) -- exact: sorted-unique
                                                 --   8 B value sets merge
                                                 --   via union, finalize
                                                 --   reduces the set
          | ARG_MAX|ARG_MIN(arg, val)            -- MAX_BY/MIN_BY aliases;
                                                 --   O(1) (val, arg) pair
                                                 --   accumulator; rows with
                                                 --   NULL in EITHER column
                                                 --   ignored (DuckDB 1.0);
                                                 --   val ties -> smallest arg
          | STRING_AGG(col, 'sep' ORDER BY k [ASC|DESC])
                                                 -- LISTAGG alias; ORDER BY
                                                 --   REQUIRED (determinism);
                                                 --   NULL values skip, NULL
                                                 --   keys sort last
          | MONEY_SUM(scalar)                    -- exact integer-cents sum:
                                                 --   order-independent, so
                                                 --   bit-stable vs any oracle
                                                 --   (float SUM's last cent
                                                 --   can flip w/ merge order)
          | MONEY_AVG(scalar)                    -- cents Sum / Count — the
                                                 --   bit-stable AVG twin
          | APPROX_COUNT_DISTINCT(col)          -- HyperLogLog
          | APPROX_QUANTILE(col, phi)           -- KLL
          | QUANTILE_CONT(col, phi)             -- EXACT interpolated
                                                 --   quantile; one group's
                                                 --   values fit a task
          | APPROX_QUANTILE_TDIGEST(col, phi)   -- t-digest (tail-accurate)
          | MEDIAN(col)                          -- == QUANTILE_CONT(·, 0.5)
          | VAR_POP|VAR_SAMP|VARIANCE(col)       -- parse-time sugar over
          | STDDEV_POP|STDDEV_SAMP|STDDEV(col)   --   exact decomposable
                                                 --   hidden aggs (COUNT,
                                                 --   SUM, SUM(x*x), deduped
                                                 --   across items); float
                                                 --   finalize only — rides
                                                 --   pre-combine, bucketed
                                                 --   merge, HAVING
          | CORR|COVAR_POP|COVAR_SAMP(y, x)      -- two-column family: same
          | REGR_SLOPE|REGR_INTERCEPT(y, x)      --   rewrite over SIX
          | REGR_COUNT|REGR_AVGX|REGR_AVGY(y, x) --   pairwise-masked exact
          | REGR_SXX|REGR_SYY|REGR_SXY(y, x)     --   sums (n Σx Σy Σx² Σy²
                                                 --   Σxy); zero denominators
                                                 --   → NULL via NULLIF
          | APPROX_TOP_K(col, k)                -- CMS heavy hitters
          | <exact agg> FILTER ( WHERE pred [AND pred]* )
                                                -- per-aggregate condition
          | ROUND(<aggregate expr>, n)          -- half-away-from-zero
          | scalar arithmetic OVER AGGREGATES   -- post-aggregate
                                                --   expressions (TPC-H
                                                --   Q14 shape):
                                                --   100*SUM(a)/SUM(b),
                                                --   MAX(x)-MIN(x), … —
                                                --   each aggregate leaf
                                                --   becomes a hidden
                                                --   map-side-combined
                                                --   aggregate; the
                                                --   arithmetic runs
                                                --   vectorized in the
                                                --   finish stage over the
                                                --   group-count-sized
                                                --   result (needs AS)
          | ROW_NUMBER() OVER w | RANK() OVER w | DENSE_RANK() OVER w
          | PERCENT_RANK() OVER w | CUME_DIST() OVER w
          | SUM|COUNT|AVG|MIN|MAX(col) OVER w   -- cumulative (ANSI default
                                                --   RANGE framing: peer rows
                                                --   share frame results)
          | LAG|LEAD(col [, n [, default]]) OVER w
                                                -- navigation (frameless);
                                                --   default fills ONLY
                                                --   where the offset row
                                                --   does not exist (an
                                                --   existing NULL stays
                                                --   NULL, per SQL)
          | FIRST_VALUE|LAST_VALUE(col) OVER w  -- default-frame semantics
          | NTILE(n) OVER w                     -- SQL tile numbering
    w    := ( PARTITION BY col [ORDER BY col [ASC|DESC] ("," ...)*]
              [ROWS BETWEEN {n|UNBOUNDED} PRECEDING
                    AND {CURRENT ROW|m FOLLOWING|UNBOUNDED FOLLOWING}
               | RANGE BETWEEN INTERVAL n unit PRECEDING
                    AND CURRENT ROW] )
                                                -- two-sided ROWS frames:
                                                --   SUM/AVG/COUNT from ONE
                                                --   per-partition prefix
                                                --   pass (clamped endpoint
                                                --   indexing); MIN/MAX =
                                                --   backward + reversed-
                                                --   forward rolling pieces
                                                --   combined NaN-ignoring
                                                -- ORDER BY may be omitted
                                                --   only for SUM/COUNT/AVG/
                                                --   MIN/MAX (full-partition
                                                --   frame)
                                                -- MULTIPLE distinct specs
                                                --   per query chain: each
                                                --   spec is one
                                                --   hash-bucket shuffle
                                                --   pass appending its
                                                --   columns (RANGE
                                                --   INTERVAL frames may
                                                --   not mix with other
                                                --   specs);
                                                --   routed to
                                                --   window.partitioned_window
    scalar := scalar (+|-|*|/) scalar | - scalar | ( scalar )
          | literal | col
          | CASE WHEN pred THEN scalar [WHEN …]* [ELSE scalar] END
          | CASE scalar WHEN scalar THEN scalar [WHEN …]* [ELSE …] END
                                                 -- simple CASE: rewritten
                                                 --   to searched equality
                                                 --   at parse (NULL base
                                                 --   matches nothing)
          | EXTRACT ( YEAR|MONTH|DAY|HOUR|MINUTE|SECOND FROM scalar )
          | CAST ( scalar AS BIGINT|INTEGER|DOUBLE|VARCHAR|DATE|TIMESTAMP|… )
                                                 -- float→int rounds half
                                                 --   to even (DuckDB's
                                                 --   DOUBLE→BIGINT cast);
                                                 --   DATE = day-floored
                                                 --   TIMESTAMP[us] (the
                                                 --   parquet/pandas
                                                 --   canonical form)
          | LOWER|UPPER|TRIM|LENGTH|ABS ( scalar )
          | COALESCE ( scalar , scalar [, …] )   -- first non-null (SQL
                                                 --   int/float promotion)
          | NULLIF ( scalar , scalar )           -- null where equal
          | SUBSTR[ING] ( scalar , start [, len] )   -- 1-based, literal
                                                 --   start/len
          | DATE_TRUNC ( 'part' , scalar )       -- one pc.floor_temporal
                                                 --   per batch; part in
                                                 --   year..second (week
                                                 --   starts Monday =
                                                 --   DuckDB/ISO)
          | STRFTIME ( scalar , 'format' )       -- vectorized pc.strftime
          | scalar (%|"||") scalar               -- C-sign modulo (int-exact)
                                                 --   / string concat (NULL
                                                 --   if either side NULL)
          | ROUND(x[, n]) | FLOOR | CEIL[ING] | SQRT | EXP | LN
          | LOG[2|10] | POWER|POW(x, y) | MOD(x, y) | SIGN
                                                 -- DuckDB-typed: DOUBLE
                                                 --   out, SIGN integral
          | GREATEST|LEAST ( scalar , … )        -- null-skipping (DuckDB)
          | CONCAT ( scalar , … )                -- null-SKIPPING concat
                                                 --   (contrast ||)
          | REPLACE|REGEXP_REPLACE ( s, 'pat', 'rep' [, 'g'] )
                                                 -- regexp: FIRST match
                                                 --   unless 'g' (RE2)
          | LTRIM|RTRIM|REVERSE ( s )
          | LEFT|RIGHT|REPEAT ( s, n )           -- literal n >= 0
          | STRPOS ( s, 'sub' )                  -- 1-based; 0 if absent
          | CONTAINS|STARTS_WITH|ENDS_WITH ( s, 'sub' )
          | SPLIT_PART ( s, 'sep', n )           -- 1-based; '' past last
          | scalar ± INTERVAL [']n['] unit       -- fixed-width units
                                                 --   (SECOND..WEEK) as one
                                                 --   Arrow duration;
                                                 --   MONTH/YEAR raise
          | DATEDIFF ( 'part', a, b )            -- boundary-crossing count
                                                 --   (DuckDB): fixed parts
                                                 --   via floor_temporal +
                                                 --   exact int division,
                                                 --   month/quarter/year via
                                                 --   EXTRACT arithmetic
          -- aggregate arguments and derived group keys; evaluated as ONE
          -- vectorized pyarrow.compute column per expression ("/" is SQL
          -- float division). Expression aggregates / items require an
          -- AS alias. Sketch aggregates keep bare columns by design.
          -- Pattern-ish args (search/regex/sep strings, counts) must be
          -- literals — they compile to Arrow kernel OPTIONS.

    pred := pred OR pred | pred AND pred | ( pred )    -- SQL precedence;
                                                 --   IN (SELECT …) may not
                                                 --   sit under OR
          | scalar (=|!=|<>|<|<=|>|>=) scalar    -- either side may be an
                                                 --   expression, column,
                                                 --   or an uncorrelated
                                                 --   scalar subquery
                                                 --   ( SELECT agg FROM … )
                                                 --   executed first and
                                                 --   substituted literal
          | scalar BETWEEN literal AND literal
          | col [NOT] LIKE 'pattern'             -- pc.match_like, SQL %/_
          | col IS [NOT] NULL
          | col [NOT] IN (literal, ...)
          | col [NOT] IN (SELECT col FROM table [WHERE pred …]
                          [GROUP BY col HAVING agg_pred …])
                                                 -- semi/anti join; the
                                                 --   build-side WHERE
                                                 --   filters the pruned
                                                 --   build read (TPC-H
                                                 --   Q4 shape); GROUP BY
                                                 --   … HAVING runs the
                                                 --   build as a nested
                                                 --   aggregate plan
                                                 --   (TPC-H Q18 shape)
          | [NOT] EXISTS (SELECT … FROM t WHERE t_col = outer_col
                          [AND pred …])          -- rewritten to the
                                                 --   membership semi/anti
                                                 --   join above (exact;
                                                 --   TPC-H Q22 shape)
          | scalar op (SELECT agg(x) FROM t
                       WHERE t_col = outer_col [AND pred …])
                                                 -- CORRELATED scalar
                                                 --   subquery (TPC-H
                                                 --   Q17/Q2 shapes):
                                                 --   decorrelated to a
                                                 --   grouped-aggregate
                                                 --   build joined back on
                                                 --   the correlation key
                                                 --   (broadcast enrich or
                                                 --   bucketed hash join),
                                                 --   then one vectorized
                                                 --   filter; a column of
                                                 --   t is inner, any
                                                 --   other column is the
                                                 --   outer reference
    literal := number | 'string' | DATE 'yyyy-mm-dd'
          | TIMESTAMP 'yyyy-mm-dd[ hh:mm:ss]'    -- typed; compares with
                                                 --   timestamp[us] columns

Routing:
- exact aggregates → Ray Data built-ins (Count/Sum/Min/Max/Mean) with
  map-side combine; COUNT(DISTINCT) → udaf.ExactDistinct (8 B hash sets).
- APPROX_COUNT_DISTINCT → HllAgg; APPROX_QUANTILE → KllAgg. With
  ``with_bounds=True`` each approximate output column gains an
  ``<alias>_bound`` column (HLL: 3σ relative; KLL: value at φ±ε rank).
- APPROX_QUANTILE_TDIGEST → TDigestAgg (merging t-digest, tail-accurate;
  no closed-form worst-case bound exists, so ``with_bounds`` adds no
  column for it — SURVEY.md §2.5).
- APPROX_TOP_K(col, k) → CmsAgg heavy-hitter candidates; output is k rows
  (col, <alias>) ordered by estimated count desc; CMS one-sided bound
  (est ≤ true + εN) as ``<alias>_bound`` with ``with_bounds=True``.
  Grouped form ``SELECT key, APPROX_TOP_K(col, k) … GROUP BY key``
  explodes ≤k heavy hitters per key, decoded from each group's CMS blob
  inside a distributed map_batches finish stage.
- ``[LEFT] JOIN dim ON fact_key = dim_key`` → broadcast enrich (vectorized
  pc.index_in lookup inside map_batches, no shuffle) when the dimension
  side has ≤ ``max_broadcast_rows`` rows by parquet metadata AND a unique
  join key; otherwise → join.hash_join (bucketed, one shuffle). LEFT
  keeps unmatched fact rows with null dim columns (broadcast: ``take`` on
  the null index; hash path: join.hash_join how="left"). Joins chain
  left-to-right, so a later join may key on a column attached by an
  earlier one (orders→customer→nation).
- membership ``IN (SELECT …)`` → join.semi_anti_join (exact, bucketed,
  key-only shuffle); ``approx_membership=True`` routes it through a Bloom
  filter built once and broadcast to an actor pool (query.BloomProbe) —
  no shuffle at all, ~fpp false matches, zero false negatives.
  NULL caveat: ``NOT IN (SELECT …)`` executes with NOT EXISTS (anti-join)
  semantics — null probe keys are KEPT and build-side nulls are ignored,
  the behavior users almost always intend; ANSI NOT IN would instead
  return zero rows whenever the subquery yields any NULL. Scalar-list
  ``[NOT] IN (literals)`` follows exact ANSI null semantics.
- scalar WHERE predicates compile to ONE vectorized pyarrow.compute
  filter per side: predicates on fact-owned columns run BEFORE any join
  (pushdown), dim-attached columns after; referenced columns are pruned
  at every parquet read. HAVING compiles to the same vectorized filter
  over the aggregated output; its predicates may reference SELECTed
  aliases / group keys OR call aggregates directly (HAVING COUNT(*) >
  5 without selecting the count — lifted into hidden aggregate items
  computed by the grouped stage and dropped after the filter).
- window items (OVER …) route to window.partitioned_window and COMPOSE
  with the full scan phase — JOIN chains, pushed-down WHERE, membership
  subqueries — applied before the window per SQL's logical order; GROUP
  BY/HAVING do not mix with window items (separate stage, as in any
  engine).
- exact-only grouped aggregates PRE-COMBINE inside map_batches via
  Arrow's hash aggregate, so the wide groupby shuffles blocks×keys
  partial rows instead of raw rows (VR_SQL_PRECOMBINE=0 disables), and
  their merge runs as a BUCKETED Arrow hash aggregate — one shuffle
  keyed on ``hash64(keys) % B`` (a small-int sort) + one vectorized
  per-bucket combine — instead of Ray's sort-based groupby, which
  merge-reduces the partial rows BY KEY (3.5–7× slower at 150k groups,
  no faster at 4; VR_SQL_BUCKETAGG=0 reverts). Sketch/distinct
  aggregates keep the Ray aggregate route (their merge is a UDAF).
- membership semi/anti joins apply at the EARLIEST join-chain position
  where the probe column exists (the AND-conjunct filter commutes with
  the remaining inner/left joins), and a grouped membership build that
  survives small broadcasts its key set — one vectorized ``pc.is_in``
  per probe batch, NO probe-side shuffle.

Scale: everything is a streaming Dataset pipeline — no driver-side row
loops; ORDER BY runs on the (post-aggregate) result only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

# pyarrow's name for SQL round-half-away-from-zero (matches DuckDB round)
_ROUND = {"round_mode": "half_towards_infinity"}

_AGGS = {"count", "sum", "avg", "min", "max", "money_sum", "money_avg",
         "approx_count_distinct", "approx_quantile",
         "approx_quantile_tdigest", "approx_top_k", "quantile_cont",
         "median", "arg_max", "arg_min", "max_by", "min_by",
         "string_agg", "listagg"}

# variance-family aggregates: parsed as sugar and REWRITTEN at parse time
# into a post-aggregate expression over the exact decomposable hidden
# aggregates COUNT / SUM(x) / SUM(x*x) — they therefore ride the map-side
# pre-combine, the bucketed Arrow-hash merge, ROLLUP/CUBE and HAVING for
# free.  Finalize is float64 over exact integer sums when the column is
# integral (sum-of-squares fits int64 up to |x| ≈ 3e6 at 1e6 rows/block —
# larger magnitudes should CAST to DOUBLE first), so the result is
# deterministic under any partitioning and matches DuckDB's streaming
# Welford within ~1e-12 relative (the driver compares at atol=1e-9).
_VAR_AGGS = {"var_pop", "var_samp", "variance",   # variance = var_samp
             "stddev_pop", "stddev_samp", "stddev"}  # stddev = stddev_samp

# two-column regression/correlation family — same hidden-aggregate rewrite
# as _VAR_AGGS, over SIX pairwise-masked exact sums (n, Σx, Σy, Σx², Σy²,
# Σxy); SQL argument order is fn(y, x)
_COVAR_AGGS = {"corr", "covar_pop", "covar_samp", "regr_slope",
               "regr_intercept", "regr_count", "regr_avgx", "regr_avgy",
               "regr_sxx", "regr_syy", "regr_sxy"}

# exact aggregates whose argument may be a scalar EXPRESSION (arithmetic /
# CASE / EXTRACT over columns); sketches keep bare columns — hashing an
# ephemeral derived value into a reusable sketch would be a footgun
_EXPR_AGGS = {"sum", "avg", "min", "max", "money_sum", "money_avg"}

_EXTRACT_PARTS = {"year", "month", "day", "hour", "minute", "second",
                  "quarter", "dow", "doy", "week", "decade",
                  "millisecond", "epoch"}

# scalar string/numeric functions usable inside expressions — each maps to
# one pyarrow.compute kernel (or a short fixed composition of kernels; see
# _eval_expr).  Pattern-ish arguments (search strings, regexes, pad/sep
# strings, counts) must be literals — they become Arrow kernel OPTIONS,
# not arrays, which is also what keeps every call a single vectorized
# kernel invocation.
_SCALAR_FNS = {"lower", "upper", "length", "trim", "abs", "substr",
               "substring", "coalesce", "nullif", "date_trunc",
               "strftime",
               # math — DuckDB-typed: floor/ceil/round/sqrt/exp/ln/log*
               # return DOUBLE, sign returns the comparable int
               "round", "floor", "ceil", "ceiling", "sqrt", "exp",
               "ln", "log", "log2", "log10", "power", "pow", "mod",
               "sign", "greatest", "least",
               # strings
               "concat", "replace", "ltrim", "rtrim", "reverse",
               "left", "right", "strpos", "contains", "starts_with",
               "ends_with", "repeat", "split_part",
               "lpad", "rpad", "concat_ws", "last_day", "sha256",
               "regexp_replace", "regexp_matches",
               # temporal — datediff(part, a, b) counts part-boundary
               # crossings (DuckDB semantics), vectorized from
               # floor_temporal / EXTRACT arithmetic
               "datediff"}

#: DATEDIFF parts — fixed-width ones go through floor_temporal + exact
#: integer microsecond division; month/quarter/year count calendar
#: boundaries via EXTRACT arithmetic (matching DuckDB's datediff)
_DATEDIFF_US = {"day": 86_400_000_000, "hour": 3_600_000_000,
                "minute": 60_000_000, "second": 1_000_000}
_DATEDIFF_CAL = {"year", "quarter", "month"}

#: INTERVAL units usable in scalar expressions (fixed-width → one Arrow
#: duration literal; MONTH/YEAR are not fixed-width and raise loudly)
_INTERVAL_US = {"second": 1_000_000, "seconds": 1_000_000,
                "minute": 60_000_000, "minutes": 60_000_000,
                "hour": 3_600_000_000, "hours": 3_600_000_000,
                "day": 86_400_000_000, "days": 86_400_000_000,
                "week": 604_800_000_000, "weeks": 604_800_000_000}

#: DATE_TRUNC parts — each maps to one pc.floor_temporal unit (Arrow week
#: flooring starts Monday, matching DuckDB/ISO)
_TRUNC_PARTS = {"year", "quarter", "month", "week", "day", "hour",
                "minute", "second"}

_CAST_TYPES = {"bigint": "int64", "int": "int64", "integer": "int64",
               "smallint": "int64", "double": "float64",
               "float": "float64", "real": "float64",
               "varchar": "string", "text": "string",
               # DATE surfaces as the day-floored TIMESTAMP[us] — the
               # parquet/pandas canonical form DuckDB's .df() also
               # produces (datetime64[us] at midnight), so oracle dtype
               # AND value compares hold bit-exactly
               "date": "date", "timestamp": "timestamp"}

# argless ranking functions valid only with OVER (...)
_WINDOW_FNS = {"row_number", "rank", "dense_rank", "percent_rank",
               "cume_dist"}
# aggregates that may also run as cumulative window functions
_WINDOW_CUM = {"sum", "count", "avg", "min", "max"}
# navigation functions: LAG/LEAD(col[, n[, default]]), FIRST/LAST_VALUE(col),
# NTH_VALUE(col, n) — OVER only
_WINDOW_NAV = {"lag", "lead", "first_value", "last_value", "nth_value"}

_TOKEN = re.compile(r"""
    \s*(
        '(?:[^']|'')*'            # string literal
      | [A-Za-z_][A-Za-z_0-9.]*   # ident / keyword
      | \d+\.\d+ | \.\d+ | \d+    # number
      | <> | != | <= | >= | \|\| | [(),*=<>+\-/%]
    )""", re.VERBOSE)


# keywords that may legally follow a derived table's closing paren — a
# bare token NOT in this set is taken as the table alias
_RESERVED_AFTER_FROM = frozenset(
    ("join", "left", "right", "full", "cross", "inner", "where", "group",
     "having", "order", "limit", "offset", "union", "intersect",
     "except", "qualify", "on"))


def _tokenize(sql: str) -> list[str]:
    out, i = [], 0
    s = sql.strip().rstrip(";")
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            raise ValueError(f"cannot tokenize SQL at: {s[i:i+30]!r}")
        out.append(m.group(1))
        i = m.end()
    return out


@dataclass
class _Agg:
    fn: str                  # count/sum/avg/min/max/approx_*/col
    col: str | None          # None for count(*)
    distinct: bool = False
    phi: float | None = None
    round_to: int | None = None
    alias: str | None = None
    # (partition_col, ((order_col, desc), ...)) when the item carries an
    # OVER clause — routed to window.partitioned_window
    window: tuple | None = None
    offset: int | None = None  # LAG/LEAD row offset (default 1)
    # LAG/LEAD third argument: the value when the offset row does NOT
    # exist (an existing-but-NULL offset row stays NULL, per SQL)
    default: object = None
    # second column of a two-column aggregate: the ordering column of
    # ARG_MAX/ARG_MIN(arg, val)
    col2: str | None = None
    # conjunction of scalar predicates from ``FILTER (WHERE …)``
    filter_pred: list | None = None
    # scalar expression tree (tuples; see _Parser.expr_tree) when the
    # aggregate argument — or the whole SELECT item (fn == "expr") — is
    # not a bare column
    expr: tuple | None = None
    # lifted from a HAVING predicate (HAVING COUNT(*) > 5 without
    # selecting the count): computed like any aggregate item, then
    # dropped from the output after the HAVING filter
    hidden: bool = False

    @property
    def name(self) -> str:
        if self.alias:
            return self.alias
        if self.fn == "col":
            return self.col
        if self.fn in _WINDOW_FNS and self.col is None:
            return self.fn
        if self.fn == "ntile":
            return "ntile"
        if self.fn in _WINDOW_NAV:
            return f"{self.fn}_{self.col}"
        if self.fn == "count" and self.col is None:
            return "count_star"
        d = "distinct_" if self.distinct else ""
        return f"{self.fn}_{d}{self.col}"


@dataclass
class _Pred:
    col: str                 # "" for composite and/or nodes
    op: str                  # =, !=, <, <=, >, >=, in, not_in, between,
                             # like, not_like, is_null, not_null, and, or
    value: object = None     # literal / list of literals / child _Preds
    sub: tuple | None = None  # (table, col) for IN (SELECT ...)
    # expression operands (tuples; see _Parser.expr_tree) when a side of a
    # comparison / BETWEEN is not a bare column or literal
    lexpr: tuple | None = None
    rexpr: tuple | None = None


def _pred_atoms(p: _Pred):
    """Yield the leaf (non-and/or/not) predicates of a tree."""
    if p.op in ("and", "or", "not"):
        for c in p.value:
            yield from _pred_atoms(c)
    else:
        yield p


def _pred_cols(preds) -> set:
    """All column names referenced anywhere in a list of predicate trees
    (including inside expression operands)."""
    out = set()
    for p in preds:
        for a in _pred_atoms(p):
            if a.col:
                out.add(a.col)
            if a.lexpr is not None:
                out |= _expr_cols(a.lexpr)
            if a.rexpr is not None:
                out |= _expr_cols(a.rexpr)
    return out


def _qualify_waggs(preds) -> list:
    """Window-function leaves appearing inside QUALIFY predicate
    expressions (QUALIFY ROW_NUMBER() OVER (…) = 1)."""
    out: list = []
    for p in preds:
        for a in _pred_atoms(p):
            for side in (a.lexpr, a.rexpr):
                if side is not None:
                    out.extend(_wagg_leaves(side))
    return out


def _wagg_leaves(e) -> list:
    """Collect the ``("wagg", _Agg)`` window-function leaves of an
    expression tree (arithmetic over window results) — including leaves
    inside CASE WHEN predicates (_Pred operands)."""
    out: list = []
    if isinstance(e, _Pred):
        if e.op in ("and", "or", "not"):
            for c in e.value:
                out.extend(_wagg_leaves(c))
        for side in (e.lexpr, e.rexpr):
            if side is not None:
                out.extend(_wagg_leaves(side))
        return out
    if not isinstance(e, tuple):
        return out
    if len(e) and e[0] == "wagg":
        out.append(e[1])
        return out
    for c in e:
        out.extend(_wagg_leaves(c))
    return out


def _expr_aggs(e) -> list:
    """Collect the ``("agg", _Agg)`` leaves of an expression tree (the
    hidden aggregates of a post-aggregate expression item)."""
    out = []

    def walk(n):
        if not isinstance(n, tuple):
            return
        if len(n) and n[0] == "agg":
            out.append(n[1])
            return
        for c in n:
            walk(c)

    walk(e)
    return out


def _flatten_and(p: _Pred) -> list:
    """Split a predicate tree into its top-level conjuncts (an OR node is
    one conjunct)."""
    if p.op == "and":
        out = []
        for c in p.value:
            out.extend(_flatten_and(c))
        return out
    return [p]


def _agg_sig(ag: _Agg) -> str:
    """Semantic identity of an aggregate call (alias/hidden excluded), for
    reusing an already-SELECTed aggregate from a HAVING predicate."""
    return repr((ag.fn, ag.col, ag.distinct, ag.phi, ag.round_to,
                 ag.window, ag.offset, ag.filter_pred, ag.expr, ag.col2,
                 ag.default))


def _lift_having_aggs(plan) -> None:
    """Rewrite aggregate calls inside HAVING predicates (``HAVING
    COUNT(*) > 5`` without selecting the count) into column references:
    each distinct call becomes a hidden aggregate item the grouped stage
    computes alongside the SELECTed ones — or reuses a SELECTed item with
    the same semantics — and the HAVING filter then sees plain columns.
    Hidden columns are projected away after the filter."""
    if not plan.having:
        return
    by_sig = {_agg_sig(it): it.name for it in plan.items
              if it.fn not in ("col", "expr")}

    def lift(ag: _Agg) -> str:
        name = by_sig.get(_agg_sig(ag))
        if name is None:
            if ag.window is not None:
                raise ValueError("window functions cannot appear in "
                                 "HAVING")
            ag.alias = name = f"_having_{len(plan.items)}"
            ag.hidden = True
            plan.items.append(ag)
            by_sig[_agg_sig(ag)] = name
        return name

    def walk(n):
        if isinstance(n, tuple):
            if n and n[0] == "agg":
                return ("col", lift(n[1]))
            return tuple(walk(c) for c in n)
        return n

    for p in plan.having:
        for a in _pred_atoms(p):
            if a.lexpr is not None:
                a.lexpr = walk(a.lexpr)
            if a.rexpr is not None:
                a.rexpr = walk(a.rexpr)


@dataclass
class _Plan:
    table: str
    select_distinct: bool = False
    items: list = field(default_factory=list)
    joins: list = field(default_factory=list)      # (table, key_a, key_b)
    where: list = field(default_factory=list)
    group_by: list = field(default_factory=list)
    having: list = field(default_factory=list)
    order_by: list = field(default_factory=list)   # (col, desc)
    # explicit NULLS FIRST/LAST per ORDER BY column ("first" | "last");
    # absent = engine default (nulls last, either direction — DuckDB's
    # default_null_order)
    order_nulls: dict = field(default_factory=dict)
    limit: int | None = None
    # LIMIT n OFFSET m — m rows skipped AFTER the global sort; requires
    # ORDER BY + LIMIT (deterministic and bounded: the routes fetch
    # limit+offset rows, then one driver-side slice of the small result)
    offset: int = 0
    # SELECT <literal exprs> with no FROM clause — evaluated over one
    # synthetic row, returned as a 1-row Dataset (no reads, no shuffle)
    no_from: bool = False
    # SELECT * — expanded to the FROM table's parquet schema (or the
    # derived table's item names) at run_sql entry, before any routing
    star: bool = False
    # self-join virtual tables: {table__alias: (base_table, alias)} —
    # each materializes ONCE into the session overlay as a streaming
    # column-rename (alias__col) write_parquet before planning
    self_joins: dict = field(default_factory=dict)
    # SELECT DISTINCT ON (k, …): first row per key group by the residual
    # ORDER BY — rewritten at run_sql entry to a hidden ROW_NUMBER
    # window item + QUALIFY = 1
    distinct_on: tuple | None = None
    # extra ON-clause conjuncts per joined table (``ON a = b AND pred``):
    # each pred must be owned by the JOINED table — it filters that
    # table's pruned read BELOW the join, which is ON semantics for both
    # INNER and LEFT (the preserved fact side is untouched)
    join_preds: dict = field(default_factory=dict)
    # further SELECT cores chained with UNION ALL; ORDER BY/LIMIT above
    # bind to the whole union (standard SQL)
    unions: list = field(default_factory=list)
    # bare UNION / UNION DISTINCT: dedup the concatenated result (one
    # distinct-rows shuffle, per-block pre-dedup first)
    union_distinct: bool = False
    # which set operator chains `unions`: "union_all" | "union" |
    # "intersect" | "except" (single-operator chains only)
    set_op: str | None = None
    # GROUP BY ROLLUP(group_by…): ONE data pass at the finest level, then
    # each coarser level re-aggregates the (group-count-sized) partial
    # result — decomposable exact aggregates only
    rollup: bool = False
    # GROUP BY CUBE(group_by…): same single-pass machinery as ROLLUP but
    # the re-aggregated levels are ALL key subsets (2^k), not prefixes
    cube: bool = False
    # GROUP BY GROUPING SETS ((…), …): the EXPLICIT level list (tuples of
    # key names; () is the grand total); group_by holds the union of all
    # keys (the single finest data pass every set re-aggregates from)
    gsets: list | None = None
    # inner _Plan when FROM is a derived table ``FROM (SELECT …) [AS] t``;
    # ``table`` then holds the alias and the inner plan executes as its
    # own streaming Dataset that the outer plan consumes block-wise
    sub_from: object = None
    # decorrelated scalar-subquery comparisons (_CorrPred), extracted from
    # WHERE by _rewrite_correlated: each compiles to a grouped-aggregate
    # build + join + vectorized filter at the end of the scan phase
    corr_where: list = field(default_factory=list)
    # QUALIFY predicates — vectorized filter over the windowed stream
    # AFTER window columns attach (window queries only, as in DuckDB)
    qualify: list = field(default_factory=list)


@dataclass
class _CorrPred:
    """One ``outer_expr op (SELECT agg(..) FROM t WHERE t.k = outer.k
    [AND build preds])`` conjunct, decorrelated: the subquery becomes a
    grouped-aggregate build ``SELECT k, agg(..) GROUP BY k`` joined back
    to the outer stream on ``outer_key = k`` (SQL semantics: a group with
    no build row yields NULL, and NULL comparisons drop the row — the
    inner join encodes exactly that)."""
    outer_expr: tuple        # left side of the comparison (expr tree)
    op: str                  # =, !=, <, <=, >, >=
    sub_table: str
    inner_key: str           # correlation column owned by sub_table
    outer_key: str           # correlation column from the outer scope
    agg_item: object         # the subquery's single _Agg item
    build_preds: list        # sub-table-only WHERE conjuncts


def _resolve_aliases(toks: list[str]):
    """Token-stream pre-pass: collect ``FROM/JOIN table [AS] alias``
    bindings, REMOVE the alias tokens (the grammar never sees them), and
    strip ``alias.col`` / ``table.col`` qualifiers down to ``col`` — the
    router's unique-column-name contract makes the qualifier redundant.

    SELF-JOINS (one table bound to 2+ aliases): the SECOND and later
    instances become VIRTUAL tables ``table__alias`` whose columns are
    renamed ``alias__col`` — run_sql materializes each virtual table
    ONCE into the session overlay (a streaming column-rename
    write_parquet, distributed), restoring the unique-column contract.
    Every reference to a renamed instance must be alias-qualified (an
    unqualified column of it would resolve to the FIRST instance).

    Returns ``(tokens, self_joins)`` with ``self_joins[virtual_table] =
    (base_table, alias)``."""
    aliases: dict[str, str | None] = {}
    tables: set[str] = set()
    drops: set[int] = set()
    self_joins: dict[str, tuple] = {}
    renamed: dict[str, str] = {}      # alias -> virtual table
    retok: dict[int, str] = {}        # token index -> replacement
    n = len(toks)
    i = 0
    while i < n:
        if toks[i].lower() not in ("from", "join"):
            i += 1
            continue
        j = i + 1
        if j < n and toks[j] == "(":
            depth = 0
            while j < n:
                if toks[j] == "(":
                    depth += 1
                elif toks[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            j += 1
            if j < n and toks[j].lower() == "as" and j + 1 < n:
                aliases.setdefault(toks[j + 1], None)
            elif (j < n and toks[j][0].isalpha() and "." not in toks[j]
                  and toks[j].lower() not in _RESERVED_AFTER_FROM):
                aliases.setdefault(toks[j], None)   # derived-table alias
            i = j
            continue
        if j < n and toks[j][0].isalpha() and "." not in toks[j]:
            # (an EXTRACT(part FROM col) 'table' is harmless: it never
            # gets an alias and only joins the known-qualifier set)
            table = toks[j]
            k = j + 1
            alias = None
            if (k + 1 < n and toks[k].lower() == "as"
                    and toks[k + 1][0].isalpha()):
                alias = toks[k + 1]
                drops.update((k, k + 1))
                i = k + 2
            elif (k < n and toks[k][0].isalpha() and "." not in toks[k]
                    and toks[k].lower() not in _RESERVED_AFTER_FROM):
                alias = toks[k]
                drops.add(k)
                i = k + 1
            else:
                i = j
            if alias is None:
                tables.add(table)
                continue
            if table in tables or table in aliases.values():
                # self-join: this instance becomes a virtual renamed
                # table; its qualified refs rewrite to alias__col
                vt = f"{table}__{alias}"
                retok[j] = vt
                self_joins[vt] = (table, alias)
                renamed[alias] = vt
                tables.add(vt)
            else:
                aliases[alias] = table
                tables.add(table)
            continue
        i = j
    if (not aliases and not renamed and not any(
            "." in t and t[0].isalpha() for t in toks)):
        return toks, self_joins
    known = set(aliases) | tables | set(renamed)
    out = []
    for idx, tok in enumerate(toks):
        if idx in drops:
            continue
        if idx in retok:
            out.append(retok[idx])
            continue
        if "." in tok and tok[0].isalpha():
            q, _, col = tok.partition(".")
            if not col or "." in col:
                raise ValueError(f"cannot parse qualified name {tok!r}")
            if q in renamed:
                out.append(f"{q}__{col}")
                continue
            if q not in known:
                raise ValueError(f"unknown table qualifier {q!r} in "
                                 f"{tok!r} (known: {sorted(known)})")
            out.append(col)
        else:
            out.append(tok)
    return out, self_joins


class _Parser:
    def __init__(self, sql: str):
        self.t, self._self_joins = _resolve_aliases(_tokenize(sql))
        self.i = 0

    def peek(self) -> str | None:
        return self.t[self.i] if self.i < len(self.t) else None

    def kw(self, *words) -> bool:
        p = self.peek()
        return p is not None and p.lower() in words

    def take(self) -> str:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of SQL")
        self.i += 1
        return tok

    def expect(self, word: str) -> None:
        tok = self.take()
        if tok.lower() != word:
            raise ValueError(f"expected {word!r}, got {tok!r}")

    # ---------------------------------------------------------- literals
    def literal(self):
        tok = self.take()
        if tok.lower() in ("date", "timestamp") and (
                self.peek() or "").startswith("'"):
            # typed literal: DATE 'yyyy-mm-dd' / TIMESTAMP 'yyyy-mm-dd[ hh:mm:ss]'
            # → datetime (pa.scalar maps it to timestamp[us], comparable
            # with the parquet timestamp columns — DuckDB coerces the same)
            import datetime as _dt
            raw = self.take()[1:-1]
            for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
                try:
                    return _dt.datetime.strptime(raw, fmt)
                except ValueError:
                    continue
            raise ValueError(f"cannot parse {tok.upper()} literal {raw!r}")
        if tok.startswith("'"):
            return tok[1:-1].replace("''", "'")
        if tok == "-":
            val = self.literal()
            if not isinstance(val, (int, float)):
                raise ValueError(f"cannot negate literal {val!r}")
            return -val
        try:
            return int(tok)
        except ValueError:
            return float(tok)

    # ------------------------------------------------- scalar expressions
    # expr  := term (("+"|"-") term)*
    # term  := factor (("*"|"/") factor)*
    # factor:= "-" factor | primary
    # primary := "(" expr ")" | literal | CASE WHEN pred THEN expr
    #            [WHEN …]* [ELSE expr] END | EXTRACT "(" part FROM expr ")"
    #            | column
    # Trees are plain tuples: ("col", name) ("lit", v)
    # ("bin", op, l, r) ("neg", e) ("extract", part, e)
    # ("case", ((pred, then_expr), …), else_expr_or_None)
    def expr_tree(self) -> tuple:
        node = self._term()
        while self.peek() in ("+", "-", "||"):
            op = self.take()
            node = ("bin", op, node, self._term())
        return node

    def _term(self) -> tuple:
        node = self._factor()
        while self.peek() in ("*", "/", "%"):
            op = self.take()
            node = ("bin", op, node, self._factor())
        return node

    def _factor(self) -> tuple:
        if self.peek() == "-":
            self.take()
            return ("neg", self._factor())
        return self._primary()

    def _primary(self) -> tuple:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of SQL in expression")
        low = tok.lower()
        if tok == "(":
            self.take()
            if self.kw("select"):
                # uncorrelated scalar subquery: parsed as its own plan,
                # executed FIRST (it is an aggregate — a tiny result) and
                # substituted as a literal before the outer plan compiles
                sub = self._select_core()
                self._order_limit(sub)
                self.expect(")")
                return ("subq", sub)
            node = self.expr_tree()
            self.expect(")")
            return node
        if low == "case":
            self.take()
            # simple CASE (CASE x WHEN v THEN r …) rewrites each WHEN to
            # the searched equality x = v at parse time (a NULL base
            # matches nothing, exactly SQL's simple-CASE semantics)
            base = None
            if not self.kw("when"):
                base = self.expr_tree()
            whens = []
            while self.kw("when"):
                self.take()
                if base is not None:
                    p = _Pred("", "=", lexpr=base,
                              rexpr=self.expr_tree())
                else:
                    p = self.pred_or()
                self.expect("then")
                whens.append((p, self.expr_tree()))
            if not whens:
                raise ValueError("CASE requires at least one WHEN")
            els = None
            if self.kw("else"):
                self.take()
                els = self.expr_tree()
            self.expect("end")
            return ("case", tuple(whens), els)
        if low == "if":
            # IF(cond, a, b) — sugar for CASE WHEN cond THEN a ELSE b END
            self.take()
            self.expect("(")
            cond = self.pred_or()
            self.expect(",")
            a = self.expr_tree()
            self.expect(",")
            b = self.expr_tree()
            self.expect(")")
            return ("case", ((cond, a),), b)
        if low == "extract":
            self.take()
            self.expect("(")
            part = self.take().lower()
            if part not in _EXTRACT_PARTS:
                raise ValueError(f"EXTRACT part {part!r} not supported "
                                 f"(have {sorted(_EXTRACT_PARTS)})")
            self.expect("from")
            inner = self.expr_tree()
            self.expect(")")
            return ("extract", part, inner)
        if low == "date_part":
            # DATE_PART('part', expr) — DuckDB's function spelling of
            # EXTRACT(part FROM expr); same kernel table
            self.take()
            self.expect("(")
            part_lit = self.literal()
            part = str(part_lit).lower()
            if part not in _EXTRACT_PARTS:
                raise ValueError(f"DATE_PART part {part!r} not supported "
                                 f"(have {sorted(_EXTRACT_PARTS)})")
            self.expect(",")
            inner = self.expr_tree()
            self.expect(")")
            return ("extract", part, inner)
        if low == "position":
            # POSITION(needle IN haystack) — SQL's special-syntax spelling
            # of STRPOS(haystack, needle) (1-based, 0 when absent)
            self.take()
            self.expect("(")
            needle = self.expr_tree()
            self.expect("in")
            hay = self.expr_tree()
            self.expect(")")
            return ("fn", "strpos", (hay, needle))
        if low == "cast":
            self.take()
            self.expect("(")
            inner = self.expr_tree()
            self.expect("as")
            ty = self.take().lower()
            if ty not in _CAST_TYPES:
                raise ValueError(f"CAST target {ty!r} not supported "
                                 f"(have {sorted(_CAST_TYPES)})")
            self.expect(")")
            return ("cast", _CAST_TYPES[ty], inner)
        if (low in ("date", "timestamp") and self.i + 1 < len(self.t)
                and self.t[self.i + 1].startswith("'")):
            return ("lit", self.literal())
        if low == "interval":
            # INTERVAL [']n['] unit — fixed-width units only (a duration
            # literal Arrow can add to a timestamp); MONTH/YEAR are
            # calendar-dependent and raise loudly
            self.take()
            raw = self.take()
            if raw.startswith("'"):
                raw = raw[1:-1].replace("''", "'")
            try:
                qty = int(raw)
            except ValueError:
                raise ValueError(f"INTERVAL quantity must be an integer "
                                 f"literal, got {raw!r}") from None
            unit = self.take().lower()
            if unit not in _INTERVAL_US:
                raise ValueError(
                    f"INTERVAL unit {unit!r} not supported in scalar "
                    f"expressions (have {sorted(set(_INTERVAL_US))}; "
                    "MONTH/YEAR are calendar-dependent)")
            import datetime as _dt
            return ("lit", _dt.timedelta(
                microseconds=qty * _INTERVAL_US[unit]))
        if tok.startswith("'") or tok[0].isdigit() or tok[0] == ".":
            return ("lit", self.literal())
        ident = self.take()
        if self.peek() == "(":
            low = ident.lower()
            if getattr(self, "_aggexpr", False) and low in _AGGS:
                # aggregate call as an expression leaf — only while
                # parsing SELECT items (post-aggregate arithmetic). With
                # an OVER clause it becomes a WINDOW leaf (("wagg", _Agg)
                # — ratio-to-report arithmetic over window results)
                ag = self._agg_call(low)
                if self.kw("over"):
                    if low not in _WINDOW_CUM:
                        raise ValueError(f"{low.upper()} cannot take an "
                                         "OVER clause")
                    if ag.distinct or ag.filter_pred:
                        raise ValueError("DISTINCT/FILTER do not combine "
                                         "with OVER")
                    ag.window = self._over()
                    return ("wagg", ag)
                return ("agg", ag)
            if getattr(self, "_aggexpr", False) and (
                    low in _WINDOW_FNS or low == "ntile"):
                # ranking window function as an expression leaf
                self.take()
                nt = None
                if low == "ntile":
                    nt = int(self.take())
                self.expect(")")
                ag = _Agg(low, None)
                if nt is not None:
                    ag.offset = nt
                ag.window = self._over()
                return ("wagg", ag)
            if low in _VAR_AGGS:
                if not getattr(self, "_aggexpr", False):
                    raise ValueError(f"{low.upper()} is an aggregate — "
                                     "it is valid only in SELECT items "
                                     "or HAVING")
                self.take()
                arg = self.expr_tree()
                self.expect(")")
                return _variance_tree(low, arg)
            if low in _COVAR_AGGS:
                if not getattr(self, "_aggexpr", False):
                    raise ValueError(f"{low.upper()} is an aggregate — "
                                     "it is valid only in SELECT items "
                                     "or HAVING")
                self.take()
                argy = self.expr_tree()
                self.expect(",")
                argx = self.expr_tree()
                self.expect(")")
                return _covar_tree(low, argy, argx)
            if low not in _SCALAR_FNS:
                raise ValueError(f"function {ident!r} not supported "
                                 "inside scalar expressions "
                                 f"(have {sorted(_SCALAR_FNS)})")
            self.take()
            args = [self.expr_tree()]
            while self.peek() == ",":
                self.take()
                args.append(self.expr_tree())
            self.expect(")")
            low = {"substring": "substr", "ceiling": "ceil",
                   "pow": "power", "log": "log10"}.get(low, low)
            n_want = {"substr": (2, 3), "coalesce": (2, 16),
                      "nullif": (2, 2), "date_trunc": (2, 2),
                      "strftime": (2, 2), "round": (1, 2),
                      "power": (2, 2), "mod": (2, 2),
                      "greatest": (2, 16), "least": (2, 16),
                      "concat": (2, 16), "replace": (3, 3),
                      "left": (2, 2), "right": (2, 2),
                      "strpos": (2, 2), "contains": (2, 2),
                      "starts_with": (2, 2), "ends_with": (2, 2),
                      "repeat": (2, 2), "split_part": (3, 3),
                      "lpad": (3, 3), "rpad": (3, 3),
                      "concat_ws": (2, 16), "last_day": (1, 1),
                      "regexp_replace": (3, 4),
                      "regexp_matches": (2, 2),
                      "datediff": (3, 3)}.get(low, (1, 1))
            if not n_want[0] <= len(args) <= n_want[1]:
                raise ValueError(f"{low} takes {n_want[0]}"
                                 f"{'-' + str(n_want[1]) if n_want[1] != n_want[0] else ''}"
                                 f" args, got {len(args)}")
            if low == "substr" and any(a[0] != "lit" for a in args[1:]):
                raise ValueError("substr start/length must be literals")
            # pattern-ish / count-ish arguments become Arrow kernel
            # OPTIONS, so they must be literals (loud parse error beats a
            # runtime kernel-dispatch failure)
            _lit_args = {"replace": (1, 2), "left": (1,), "right": (1,),
                         "strpos": (1,), "contains": (1,),
                         "starts_with": (1,), "ends_with": (1,),
                         "repeat": (1,), "split_part": (1, 2),
                         "lpad": (1, 2), "rpad": (1, 2),
                         "concat_ws": (0,),
                         "regexp_replace": (1, 2, 3),
                         "regexp_matches": (1,), "round": (1,),
                         "datediff": (0,)}
            for pos in _lit_args.get(low, ()):
                if pos < len(args) and args[pos][0] != "lit":
                    raise ValueError(f"{low} argument {pos + 1} must be "
                                     "a literal")
            if low == "round" and len(args) == 2 \
                    and not isinstance(args[1][1], int):
                raise ValueError("round digits must be an integer literal")
            if low in ("left", "right", "repeat") \
                    and (not isinstance(args[1][1], int)
                         or args[1][1] < 0):
                raise ValueError(f"{low} count must be a non-negative "
                                 "integer literal")
            if low == "split_part" and (not isinstance(args[2][1], int)
                                        or args[2][1] < 1):
                raise ValueError("split_part index must be a positive "
                                 "integer literal (1-based)")
            if low == "regexp_replace" and len(args) == 4 \
                    and args[3][1] != "g":
                raise ValueError("regexp_replace flag must be 'g' "
                                 "(global) when given")
            if low == "datediff":
                part = str(args[0][1]).lower()
                if part not in _DATEDIFF_US and part not in _DATEDIFF_CAL:
                    raise ValueError(
                        f"DATEDIFF part {part!r} not supported (have "
                        f"{sorted(set(_DATEDIFF_US) | _DATEDIFF_CAL)})")
            if low == "date_trunc":
                if (args[0][0] != "lit"
                        or str(args[0][1]).lower() not in _TRUNC_PARTS):
                    raise ValueError(
                        "DATE_TRUNC part must be a string literal in "
                        f"{sorted(_TRUNC_PARTS)}")
            if low == "strftime" and args[1][0] != "lit":
                raise ValueError("strftime format must be a literal")
            return ("fn", low, tuple(args))
        return ("col", ident)

    # ------------------------------------------------------- select item
    def item(self) -> _Agg:
        tok = self.take()
        low = tok.lower()
        if low == "round":
            # Two ROUND spellings share this name: the ITEM wrapper
            # (ROUND(QUANTILE_CONT(…), 2), ROUND(SUM(x) FILTER …, 2),
            # ROUND(SUM(v) OVER …, 2) — a finish-stage round_to on the
            # aggregate/window item) and the plain SCALAR function
            # (ROUND(col[, n]) — one pc.round kernel in the expression
            # route). Try the wrapper; a plain-column/expression inner
            # backtracks to the scalar parse.
            save = self.i - 1
            inner = nd = None
            try:
                self.expect("(")
                inner = self.item()
                nd = 0
                if self.peek() == ",":
                    self.take()
                    nd = int(self.take())
                self.expect(")")
            except (ValueError, IndexError):
                inner = None
            if inner is not None and inner.fn not in ("col", "expr"):
                inner.round_to = nd
                return inner
            self.i = save
            return self._classify_item(self._in_aggexpr(self.expr_tree))
        if low in _WINDOW_FNS:
            self.expect("(")
            self.expect(")")
            ag = _Agg(low, None)
            ag.window = self._over()          # OVER is mandatory here
            return self._finish_window_item(ag)
        if low == "grouping":
            # GROUPING(col) -> 1 on rows where col is rolled up by the
            # current ROLLUP/CUBE level, else 0 (disambiguates super-
            # aggregate rows from real NULL keys, as in any SQL engine)
            self.expect("(")
            gcol = self.take()
            self.expect(")")
            ag = _Agg("grouping", gcol)
            if self.kw("as"):
                self.take()
                ag.alias = self.take()
            return ag
        if low == "ntile":
            self.expect("(")
            n_tiles = int(self.take())
            self.expect(")")
            ag = _Agg("ntile", None)
            ag.offset = n_tiles
            ag.window = self._over()          # OVER is mandatory here
            return self._finish_window_item(ag)
        if low in _WINDOW_NAV:
            self.expect("(")
            col = self.take()
            off = dflt = None
            if self.peek() == ",":
                self.take()
                off = int(self.take())
                if self.peek() == ",":
                    # LAG/LEAD(col, n, default) — fills only where the
                    # offset row does not EXIST (SQL: an existing NULL
                    # offset row stays NULL)
                    if low in ("first_value", "last_value", "nth_value"):
                        raise ValueError(f"{low.upper()} takes "
                                         f"{'two arguments' if low == 'nth_value' else 'one argument'}")
                    self.take()
                    dflt = self.literal()
            self.expect(")")
            if low == "nth_value" and (off is None or off < 1):
                raise ValueError("NTH_VALUE(col, n) requires n >= 1")
            ag = _Agg(low, col, )
            ag.offset = off
            ag.default = dflt
            ag.window = self._over()          # OVER is mandatory here
            return self._finish_window_item(ag)
        if low in _AGGS:
            ag = self._agg_call(low)
            self._maybe_filter(ag)
            if self.kw("over"):
                if low not in _WINDOW_CUM:
                    raise ValueError(f"{low.upper()} cannot take an "
                                     "OVER clause")
                if ag.distinct:
                    raise ValueError("DISTINCT cannot take an OVER "
                                     "clause")
                # aggregates over an EXPRESSION argument are allowed:
                # the window route derives the expression to a hidden
                # column before the window shuffle
                if ag.filter_pred:
                    raise ValueError("FILTER does not combine with OVER "
                                     "in this router")
                ag.window = self._over()
            if self.peek() in ("+", "-", "*", "/", "%", "||"):
                # post-aggregate arithmetic: SUM(a)/SUM(b) — or, with an
                # OVER clause, arithmetic over the WINDOW result
                # (ratio-to-report: v / SUM(v) OVER (…))
                leaf = (("wagg", ag) if ag.window is not None
                        else ("agg", ag))
                return self._classify_item(
                    self._in_aggexpr(
                        lambda: self._expr_continue(leaf)))
            return ag
        # plain column — or a scalar expression (arithmetic / CASE /
        # EXTRACT — possibly over aggregate calls: 100 * SUM(a)/SUM(b))
        self.i -= 1
        return self._classify_item(self._in_aggexpr(self.expr_tree))

    def _finish_window_item(self, ag: _Agg) -> _Agg:
        """A fully-parsed window function item may CONTINUE as an
        expression (ROW_NUMBER() OVER (…) + 100): wrap it as a
        ("wagg", _Agg) leaf and keep parsing."""
        if self.peek() in ("+", "-", "*", "/", "%", "||"):
            return self._classify_item(
                self._in_aggexpr(
                    lambda: self._expr_continue(("wagg", ag))))
        return ag

    def _agg_call(self, low: str) -> _Agg:
        """Parse an aggregate call from after its name: ``( [DISTINCT]
        arg [, phi] )``. FILTER / OVER are the caller's business."""
        self.expect("(")
        if low == "count" and self.peek() == "*":
            self.take()
            self.expect(")")
            return _Agg("count", None)
        if low in ("arg_max", "arg_min", "max_by", "min_by"):
            # ARG_MAX(arg, val) — two plain columns
            col = self.take()
            comma = self.take()
            col2 = self.take()
            closep = self.take()
            if (comma, closep) != (",", ")") or not (
                    col.replace("_", "a").isalnum()
                    and col2.replace("_", "a").isalnum()):
                raise ValueError(f"{low.upper()} takes two plain columns "
                                 "(compute expressions in a derived "
                                 "table first)")
            low = {"max_by": "arg_max", "min_by": "arg_min"}.get(low, low)
            return _Agg(low, col, col2=col2)
        if low in ("string_agg", "listagg"):
            # STRING_AGG(col, 'sep' ORDER BY k [ASC|DESC]) — the ORDER BY
            # is REQUIRED: without it the concatenation order is
            # scan-order-dependent, which a distributed engine cannot
            # reproduce (and DuckDB's would differ anyway)
            col = self.take()
            self.expect(",")
            sep = self.literal()
            if not isinstance(sep, str):
                raise ValueError("STRING_AGG separator must be a string "
                                 f"literal, got {sep!r}")
            if not self.kw("order"):
                raise ValueError("STRING_AGG requires ORDER BY inside "
                                 "the call (deterministic order under "
                                 "any partitioning)")
            self.take()
            self.expect("by")
            okey = self.take()
            desc = False
            if self.kw("asc", "desc"):
                desc = self.take().lower() == "desc"
            self.expect(")")
            return _Agg("string_agg", col, col2=okey,
                        default=(sep, desc))
        distinct = False
        if self.kw("distinct"):
            self.take()
            distinct = True
            if low not in ("count", "sum", "avg"):
                raise ValueError("DISTINCT supported in COUNT/SUM/AVG "
                                 f"only, got {low.upper()}")
        expr = None
        if low in _EXPR_AGGS or low == "count":
            # COUNT(expr) counts non-null expr values; with DISTINCT the
            # expression derives to a hidden column first (the same
            # _expr_<alias> treatment as any expression aggregate arg)
            tree = self.expr_tree()
            if tree[0] == "col":
                col = tree[1]
            else:
                col, expr = None, tree
        else:
            col = self.take()
        phi = None
        if low in ("approx_quantile", "approx_quantile_tdigest",
                   "approx_top_k", "quantile_cont"):
            self.expect(",")
            phi = float(self.take())
        self.expect(")")
        if low == "median":
            # MEDIAN(col) == QUANTILE_CONT(col, 0.5) — exact interpolated
            # (DuckDB's MEDIAN; integer inputs surface as DOUBLE)
            low, phi = "quantile_cont", 0.5
        return _Agg(low, col, distinct=distinct, phi=phi, expr=expr)

    def _in_aggexpr(self, fn):
        """Run a parse callback with aggregate calls allowed as
        expression leaves (``("agg", _Agg)`` nodes in _primary)."""
        prev = getattr(self, "_aggexpr", False)
        self._aggexpr = True
        try:
            return fn()
        finally:
            self._aggexpr = prev

    def _expr_continue(self, left: tuple) -> tuple:
        """Continue an expression whose first primary is already parsed
        (same precedence as expr_tree: * and / bind tighter)."""
        while self.peek() in ("*", "/", "%"):
            op = self.take()
            left = ("bin", op, left, self._factor())
        while self.peek() in ("+", "-", "||"):
            op = self.take()
            left = ("bin", op, left, self._term())
        return left

    def _classify_item(self, tree: tuple) -> _Agg:
        if tree[0] == "agg":
            return tree[1]
        if tree[0] == "wagg":
            return tree[1]
        if tree[0] == "col":
            return _Agg("col", tree[1])
        if _wagg_leaves(tree):
            if _expr_aggs(tree):
                raise ValueError(
                    "an expression cannot mix plain aggregates with "
                    "window functions (a plain aggregate needs GROUP "
                    "BY; a window result is per-row)")
            return _Agg("wexpr", None, expr=tree)
        if _expr_aggs(tree):
            return _Agg("aggexpr", None, expr=tree)
        return _Agg("expr", None, expr=tree)

    def _maybe_filter(self, ag: _Agg) -> None:
        """``FILTER ( WHERE pred [AND pred]* )`` — SQL's per-aggregate
        conditional; only exact COUNT/SUM/AVG/MIN/MAX accept it (checked
        at execution, where the sketch routes are known)."""
        if not self.kw("filter"):
            return
        self.take()
        self.expect("(")
        self.expect("where")
        preds = _flatten_and(self.pred_or())
        self.expect(")")
        if any(a.sub is not None for p in preds for a in _pred_atoms(p)):
            raise ValueError("FILTER predicates must be scalar "
                             "(no IN (SELECT …))")
        ag.filter_pred = preds

    def _over(self) -> tuple:
        """``OVER ( PARTITION BY col [ORDER BY col [ASC|DESC] , ...] )`` —
        ORDER BY may be omitted only for cumulative aggregates (the frame
        becomes the full partition; enforced at execution)."""
        self.expect("over")
        self.expect("(")
        part: list[str] = []
        if self.kw("partition"):
            self.take()
            self.expect("by")
            part = [self.take()]
            while self.peek() == ",":
                # composite partition keys; trailing ORDER BY ends the list
                save = self.i
                self.take()
                if self.kw("order"):
                    self.i = save
                    break
                part.append(self.take())
        order = []
        if self.kw("order"):
            self.take()
            self.expect("by")
            while True:
                col = self.take()
                desc = False
                if self.kw("asc", "desc"):
                    desc = self.take().lower() == "desc"
                if self.kw("nulls"):
                    # the engine's window sort places nulls LAST in both
                    # directions (DuckDB's default_null_order); explicit
                    # NULLS LAST is accepted as the no-op it is, FIRST
                    # raises rather than silently mis-sorting
                    self.take()
                    place = self.take().lower()
                    if place != "last":
                        raise ValueError(
                            "window ORDER BY supports NULLS LAST only "
                            "(the engine default in both directions)")
                order.append((col, desc))
                if self.peek() == ",":
                    self.take()
                    continue
                break
        frame = None
        if self.kw("rows"):
            # ROWS BETWEEN {UNBOUNDED|n} PRECEDING AND CURRENT ROW —
            # row-counted framing (each row gets its OWN frame; ties do
            # NOT share results, unlike the default RANGE frame)
            self.take()
            self.expect("between")
            if self.kw("unbounded"):
                self.take()
                lo = None
            else:
                lo = int(self.take())
                if lo < 0:
                    raise ValueError("ROWS frame needs n >= 0 PRECEDING")
            self.expect("preceding")
            self.expect("and")
            if self.kw("current"):
                self.take()
                self.expect("row")
                hi = 0
            elif self.kw("unbounded"):
                self.take()
                self.expect("following")
                hi = None
            else:
                # ROWS BETWEEN … AND m FOLLOWING — two-sided frame
                tok2 = self.take()
                if tok2 == "-":          # tokenizer splits the sign off
                    tok2 = "-" + self.take()
                hi = int(tok2)
                if hi < 0:
                    raise ValueError("ROWS frame needs m >= 0 FOLLOWING")
                self.expect("following")
            if not order:
                raise ValueError("a ROWS frame requires ORDER BY")
            frame = ("rows", lo, hi)
        elif self.kw("range"):
            # RANGE BETWEEN INTERVAL n unit PRECEDING AND CURRENT ROW —
            # time-width framing over the ORDER BY timestamp (endpoints
            # inclusive, current-row peers share frames; routed to
            # window.rolling_range_agg's searchsorted kernel).
            # RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW is the
            # ANSI DEFAULT frame spelled out — frame stays None.
            self.take()
            self.expect("between")
            if self.kw("unbounded"):
                self.take()
                self.expect("preceding")
                self.expect("and")
                self.expect("current")
                self.expect("row")
                self.expect(")")
                return (tuple(part), tuple(order), None)
            self.expect("interval")
            tok = self.take()
            n = int(tok[1:-1]) if tok.startswith("'") else int(tok)
            unit = self.take().lower()
            unit = unit[:-1] if unit.endswith("s") else unit
            mult = {"second": 1, "minute": 60, "hour": 3600,
                    "day": 86400}.get(unit)
            if mult is None or n < 0:
                raise ValueError(
                    f"RANGE frame INTERVAL takes a non-negative count of "
                    f"SECOND/MINUTE/HOUR/DAY, got {n} {unit!r}")
            self.expect("preceding")
            self.expect("and")
            self.expect("current")
            self.expect("row")
            if len(order) != 1 or order[0][1]:
                raise ValueError("a RANGE INTERVAL frame requires ORDER "
                                 "BY one ascending timestamp column")
            frame = ("range", n * mult, 0)
        self.expect(")")
        return (tuple(part), tuple(order), frame)

    # --------------------------------------------------------- predicate
    def pred_or(self) -> _Pred:
        """``conj (OR conj)*`` — SQL precedence (AND binds tighter).
        Returns a single node: an atom, an "and" node, or an "or" node;
        membership subqueries may not sit under OR (enforced here so every
        execution path can treat ``sub`` preds as top-level conjuncts)."""
        node = self._pred_and()
        if not self.kw("or"):
            return node
        children = [node]
        while self.kw("or"):
            self.take()
            children.append(self._pred_and())
        out = _Pred("", "or", value=children)
        if any(p.sub is not None for p in _pred_atoms(out)):
            raise ValueError("IN (SELECT …) must be a top-level AND "
                             "condition (cannot sit under OR)")
        return out

    def _pred_and(self) -> _Pred:
        node = self._pred_atom()
        if not self.kw("and"):
            return node
        children = [node]
        while self.kw("and"):
            self.take()
            children.append(self._pred_atom())
        return _Pred("", "and", value=children)

    def _pred_atom(self) -> _Pred:
        if self.peek() == "(":
            tup = self._try_tuple_in()
            if tup is not None:
                return tup
            self.take()
            node = self.pred_or()
            self.expect(")")
            return node
        if (self.kw("not") and self.i + 1 < len(self.t)
                and self.t[self.i + 1] == "("):
            # NOT (pred …) — Kleene negation (NOT NULL stays NULL, so
            # SQL WHERE still drops the row)
            self.take()
            self.take()
            node = self.pred_or()
            self.expect(")")
            if any(a.sub is not None for a in _pred_atoms(node)):
                raise ValueError("membership subqueries cannot sit under "
                                 "NOT ( … ) — use NOT IN directly")
            return _Pred("", "not", value=[node])
        if (self.kw("not") and self.i + 1 < len(self.t)
                and self.t[self.i + 1].lower() == "exists"):
            self.take()
            self.take()
            return self._exists_pred(negated=True)
        if self.kw("exists"):
            self.take()
            return self._exists_pred(negated=False)
        return self.pred()

    def _try_tuple_in(self) -> "_Pred | None":
        """Row-value membership ``(c1, c2) [NOT] IN ((v, v), …)`` —
        parse-time rewrite to an OR of per-row AND equality conjuncts
        (NOT wraps in the Kleene negation node, matching SQL's
        three-valued row-value semantics). Backtracks and returns None
        when the parenthesis opens an ordinary predicate group."""
        save = self.i
        try:
            self.expect("(")
            cols = [self.take()]
            if self.peek() != ",":
                raise ValueError("not a tuple")
            while self.peek() == ",":
                self.take()
                cols.append(self.take())
            self.expect(")")
            negated = False
            if self.kw("not"):
                self.take()
                negated = True
            self.expect("in")
            self.expect("(")
            rows = []
            while True:
                self.expect("(")
                vals = [self.literal()]
                while self.peek() == ",":
                    self.take()
                    vals.append(self.literal())
                self.expect(")")
                if len(vals) != len(cols):
                    raise ValueError(
                        f"row-value IN arity mismatch: {len(cols)} "
                        f"columns vs {len(vals)} values")
                rows.append(vals)
                if self.peek() == ",":
                    self.take()
                    continue
                break
            self.expect(")")
        except (ValueError, IndexError):
            self.i = save
            return None
        ors = []
        for vals in rows:
            ands = [_Pred(c, "=", v) for c, v in zip(cols, vals)]
            ors.append(_Pred("", "and", value=ands)
                       if len(ands) > 1 else ands[0])
        node = _Pred("", "or", value=ors) if len(ors) > 1 else ors[0]
        return _Pred("", "not", value=[node]) if negated else node

    def _exists_pred(self, negated: bool) -> _Pred:
        """``[NOT] EXISTS (SELECT <anything> FROM t WHERE …)``. The SELECT
        item is irrelevant (EXISTS tests row existence) and is discarded.
        The WHERE must contain exactly one correlation equality against an
        outer column — resolved later against the parquet schemas by
        _rewrite_correlated, which turns this into a semi/anti join."""
        self.expect("(")
        self.expect("select")
        if self.peek() == "*":
            self.take()
        else:
            self.expr_tree()          # parsed and discarded
        self.expect("from")
        sub_table = self.take()
        sub_preds: list = []
        if self.kw("where"):
            self.take()
            sub_preds = _flatten_and(self.pred_or())
            for sp in sub_preds:
                for a in _pred_atoms(sp):
                    if a.sub is not None:
                        raise ValueError("EXISTS subqueries do not nest")
        self.expect(")")
        if not sub_preds:
            raise ValueError("EXISTS subquery needs a correlated WHERE "
                             "(uncorrelated EXISTS is a constant — "
                             "filter on COUNT instead)")
        # probe column unknown until schemas resolve; op is rewritten to
        # in/not_in by _rewrite_correlated before any execution path
        return _Pred("", "not_exists" if negated else "exists",
                     sub=(sub_table, None, sub_preds, []))

    def pred(self) -> _Pred:
        left = self.expr_tree()
        if left[0] != "col":
            # expression comparison: expr (op|BETWEEN) expr — evaluated as
            # vectorized pyarrow.compute kernels, same as any predicate
            if self.kw("between"):
                self.take()
                sym = False
                if self.kw("symmetric"):
                    self.take()
                    sym = True
                lo = self.literal()
                self.expect("and")
                hi = self.literal()
                if sym and hi < lo:
                    lo, hi = hi, lo
                return _Pred("", "between", value=(lo, hi), lexpr=left)
            op = self.take()
            if op == "<>":
                op = "!="
            if op not in ("=", "!=", "<", "<=", ">", ">="):
                raise ValueError(f"unsupported operator {op!r} after an "
                                 "expression")
            right = self.expr_tree()
            if right[0] == "lit":
                return _Pred("", op, value=right[1], lexpr=left)
            return _Pred("", op, lexpr=left, rexpr=right)
        col = left[1]
        if self.kw("is"):
            self.take()
            neg = False
            if self.kw("not"):
                self.take()
                neg = True
            if self.kw("distinct"):
                # col IS [NOT] DISTINCT FROM <literal|NULL> — null-safe
                # (in)equality: NULL compares EQUAL to NULL, never yields
                # NULL itself (SQL's three-valued escape hatch)
                self.take()
                self.expect("from")
                if self.kw("null"):
                    self.take()
                    val = None
                else:
                    val = self.literal()
                return _Pred(col, "not_dist_from" if neg else "dist_from",
                             val)
            self.expect("null")
            return _Pred(col, "not_null" if neg else "is_null")
        if self.kw("like", "ilike"):
            ci = self.take().lower() == "ilike"
            pat = self.literal()
            if not isinstance(pat, str):
                raise ValueError("LIKE takes a string pattern")
            pat = self._maybe_escape(pat)
            return _Pred(col, "ilike" if ci else "like", pat)
        if self.kw("not"):
            self.take()
            if self.kw("like", "ilike"):
                ci = self.take().lower() == "ilike"
                pat = self.literal()
                if not isinstance(pat, str):
                    raise ValueError("LIKE takes a string pattern")
                pat = self._maybe_escape(pat)
                return _Pred(col, "not_ilike" if ci else "not_like", pat)
            self.expect("in")
            return self._in_pred(col, negated=True)
        if self.kw("in"):
            self.take()
            return self._in_pred(col, negated=False)
        if self.kw("between"):
            self.take()
            sym = False
            if self.kw("symmetric"):
                self.take()
                sym = True
            lo = self.literal()
            self.expect("and")
            hi = self.literal()
            if sym and hi < lo:
                lo, hi = hi, lo
            return _Pred(col, "between", value=(lo, hi))
        op = self.take()
        if op == "<>":
            op = "!="
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"unsupported operator {op!r}")
        if self.kw("any", "all", "some"):
            # quantified subquery comparison — the two set-semantics
            # rewrites that stay exact under empty sets and NULLs:
            #   = ANY/SOME (SELECT …)  ==  IN (SELECT …)
            #   <> ALL (SELECT …)      ==  NOT IN (SELECT …)
            q = self.take().lower()
            if (op, q) in (("=", "any"), ("=", "some")):
                return self._in_pred(col, negated=False)
            if (op, q) == ("!=", "all"):
                return self._in_pred(col, negated=True)
            raise ValueError(
                f"{op} {q.upper()} subqueries are not supported (only "
                "= ANY and <> ALL, which rewrite to [NOT] IN; order "
                "comparisons against MIN/MAX change on empty sets)")
        right = self.expr_tree()
        if right[0] == "lit":
            return _Pred(col, op, right[1])
        return _Pred("", op, lexpr=left, rexpr=right)

    def _maybe_escape(self, pat: str) -> str:
        """Optional ``ESCAPE 'c'`` after a LIKE pattern: rewrite the
        custom escape character to Arrow match_like's backslash form
        (pre-existing backslashes escape to literal backslashes)."""
        if not self.kw("escape"):
            return pat
        self.take()
        esc = self.literal()
        if not isinstance(esc, str) or len(esc) != 1:
            raise ValueError("ESCAPE takes a single-character string")
        out, i = [], 0
        while i < len(pat):
            ch = pat[i]
            if ch == esc and i + 1 < len(pat):
                nxt = pat[i + 1]
                # backslash-escape only the characters Arrow's
                # match_like treats as special; a backslash before any
                # other character fails to match instead of being inert
                out.append(("\\" + nxt) if nxt in "%_\\" else nxt)
                i += 2
                continue
            if ch == "\\":
                out.append("\\\\")
            else:
                out.append(ch)
            i += 1
        return "".join(out)

    def _in_pred(self, col: str, negated: bool) -> _Pred:
        self.expect("(")
        if self.kw("select"):
            self.take()
            if self.kw("distinct"):
                # DISTINCT in a membership build is a no-op: the semi/
                # anti join collapses the build side to distinct keys
                self.take()
            sub_col = self.take()
            self.expect("from")
            sub_table = self.take()
            if self.kw("join", "left", "inner"):
                raise ValueError(
                    "IN (SELECT …) build sides with JOINs: wrap the "
                    "build in a CTE — WITH k AS (SELECT key FROM … JOIN "
                    "…) … WHERE col IN (SELECT key FROM k) — the CTE "
                    "spools once and the membership probe is unchanged")
            sub_preds: list = []
            if self.kw("where"):
                # build-side WHERE (TPC-H Q4 shape): scalar predicates
                # over the subquery's own table, applied as a vectorized
                # filter on the pruned build read before the semi/anti
                # join (or before the Bloom build)
                self.take()
                sub_preds = _flatten_and(self.pred_or())
                for sp in sub_preds:
                    for a in _pred_atoms(sp):
                        if a.sub is not None:
                            raise ValueError("IN (SELECT …) subqueries "
                                             "do not nest")
            sub_having: list = []
            if self.kw("group"):
                # grouped membership build (TPC-H Q18 shape):
                #   IN (SELECT k FROM t [WHERE …] GROUP BY k
                #       HAVING agg(x) > c)
                # executes as a nested grouped-aggregate plan (pruned
                # read, map-side combine, HAVING filter) whose surviving
                # keys feed the semi/anti join
                self.take()
                self.expect("by")
                gb_col = self.take()
                if gb_col != sub_col:
                    raise ValueError(
                        f"IN (SELECT …) GROUP BY column {gb_col!r} must "
                        f"equal the selected key {sub_col!r}")
                if self.kw("having"):
                    self.take()
                    sub_having = _flatten_and(
                        self._in_aggexpr(self.pred_or))
                    for sp in sub_having:
                        for a in _pred_atoms(sp):
                            if a.sub is not None:
                                raise ValueError("IN (SELECT …) "
                                                 "subqueries do not nest")
            self.expect(")")
            return _Pred(col, "not_in" if negated else "in",
                         sub=(sub_table, sub_col, sub_preds, sub_having))
        vals = [self.literal()]
        while self.peek() == ",":
            self.take()
            vals.append(self.literal())
        self.expect(")")
        return _Pred(col, "not_in" if negated else "in", value=vals)

    # -------------------------------------------------------------- plan
    def parse(self) -> _Plan:
        plan = self._select_core()
        plan.self_joins = dict(self._self_joins)
        self._setops(plan)
        # ORDER BY / LIMIT bind to the WHOLE union (standard SQL)
        self._order_limit(plan)
        if self.peek() is not None:
            raise ValueError(f"unexpected trailing token {self.peek()!r}")
        return plan

    def _setops(self, plan: _Plan) -> None:
        """Optional set-operation chain after a SELECT core — shared by
        the top level and derived tables (``FROM (… UNION …) t``)."""
        ops: list[str] = []
        while self.kw("union", "intersect", "except"):
            tok = self.take().lower()
            if tok == "union":
                if self.kw("all"):
                    self.take()
                    ops.append("union_all")
                else:
                    if self.kw("distinct"):
                        self.take()
                    ops.append("union")    # bare UNION = UNION DISTINCT
            else:
                if self.kw("all"):
                    raise ValueError(f"{tok.upper()} ALL is not supported "
                                     "(distinct set semantics only)")
                if self.kw("distinct"):
                    self.take()
                ops.append(tok)
            plan.unions.append(self._select_core())
        if len(set(ops)) > 1:
            raise ValueError(
                "mixing UNION ALL and UNION [DISTINCT] in one query is "
                "not supported" if set(ops) <= {"union", "union_all"}
                else "mixing set operators (UNION/INTERSECT/EXCEPT) in "
                     "one query is not supported — single-operator "
                     "chains only")
        plan.set_op = ops[0] if ops else None
        plan.union_distinct = plan.set_op == "union"

    def _order_limit(self, plan: _Plan) -> None:
        """Optional trailing ``ORDER BY … / LIMIT n`` — shared by the top
        level, derived tables, and scalar subqueries."""
        if self.kw("order"):
            self.take()
            self.expect("by")
            if self.kw("all"):
                # ORDER BY ALL [DESC] (DuckDB): every SELECT item, in
                # list order, one shared direction
                self.take()
                d_all = False
                if self.kw("asc", "desc"):
                    d_all = self.take().lower() == "desc"
                for it in plan.items:
                    if not it.hidden:
                        plan.order_by.append((it.name, d_all))
                if not plan.order_by:
                    raise ValueError("ORDER BY ALL found no SELECT items")
                if self.kw("limit"):
                    self.take()
                    plan.limit = int(self.take())
                return
            while True:
                col = None
                tok = self.peek()
                if tok is not None and tok.isdigit():
                    # bare integer = ORDER BY ordinal (standard SQL) —
                    # unless it starts an arithmetic expression (2*x)
                    nxt = (self.t[self.i + 1].lower()
                           if self.i + 1 < len(self.t) else None)
                    if nxt not in ("+", "-", "*", "/", "%", "||"):
                        idx = int(self.take())
                        if not 1 <= idx <= len(plan.items):
                            raise ValueError(
                                f"ORDER BY position {idx} out of "
                                f"range (1..{len(plan.items)})")
                        col = plan.items[idx - 1].name
                if col is None:
                    tree = self._in_aggexpr(self.expr_tree)
                    col = self._order_key_from_tree(plan, tree)
                desc = False
                if self.kw("asc", "desc"):
                    desc = self.take().lower() == "desc"
                if self.kw("nulls"):
                    self.take()
                    place = self.take().lower()
                    if place not in ("first", "last"):
                        raise ValueError("expected FIRST or LAST after "
                                         f"NULLS, got {place!r}")
                    plan.order_nulls[col] = place
                # duplicate ORDER BY keys are legal SQL and redundant
                # (later occurrences can never break a tie the first
                # didn't) — dedup so sentinel columns register once
                if col not in (c for c, _ in plan.order_by):
                    plan.order_by.append((col, desc))
                if self.peek() == ",":
                    self.take()
                    continue
                break
        if self.kw("limit"):
            self.take()
            plan.limit = int(self.take())
        if self.kw("offset"):
            self.take()
            plan.offset = int(self.take())
            if plan.offset < 0:
                raise ValueError("OFFSET must be >= 0")
            if plan.offset and (plan.limit is None or not plan.order_by):
                raise ValueError(
                    "OFFSET requires both ORDER BY and LIMIT (without "
                    "them the skipped rows are engine-order-dependent "
                    "and the scan is unbounded)")

    def _order_key_from_tree(self, plan: _Plan, tree: tuple) -> str:
        """Resolve one ORDER BY key parsed as an expression tree to an
        output-column name. A plain column/alias passes through; an
        expression (or aggregate call) that TEXT-matches a SELECT item
        reuses that item's name; anything else becomes a HIDDEN item —
        computed like any item, sorted on, and dropped from the output
        after ORDER BY/LIMIT (SQL's ORDER-BY-unselected-expression)."""
        if tree[0] == "col":
            return tree[1]
        if tree[0] == "agg":
            ag = tree[1]
            sig = _agg_sig(ag)
            for it in plan.items:
                if (it.fn not in ("col", "expr", "aggexpr")
                        and _agg_sig(it) == sig):
                    return it.name
        else:
            fmt = _fmt_expr(tree)
            for it in plan.items:
                if it.expr is not None and _fmt_expr(it.expr) == fmt:
                    return it.name
        if plan.unions:
            raise ValueError(
                "ORDER BY over a set operation must name an output "
                "column of the SELECT list (hidden expression keys "
                "would misalign the union parts)")
        if plan.select_distinct:
            raise ValueError(
                "ORDER BY expressions with SELECT DISTINCT must appear "
                "in the SELECT list (standard SQL)")
        if any(it.window or it.fn == "wexpr" for it in plan.items):
            raise ValueError(
                "ORDER BY expressions in window queries must be "
                "SELECTed (alias the expression and ORDER BY the alias)")
        if tree[0] == "agg":
            hid = tree[1]
        elif _expr_aggs(tree):
            hid = _Agg("aggexpr", None, expr=tree)
        else:
            hid = _Agg("expr", None, expr=tree)
        hid.hidden = True
        hid.alias = f"_ob{len(plan.items)}"
        plan.items.append(hid)
        return hid.alias

    def _select_core(self) -> _Plan:
        self.expect("select")
        distinct = False
        if self.kw("distinct"):
            self.take()
            distinct = True
        star = False
        distinct_on = None
        if distinct and self.kw("on"):
            # SELECT DISTINCT ON (k, …) — Postgres/DuckDB first-row-per-
            # key; rewritten to ROW_NUMBER + QUALIFY at run_sql entry
            self.take()
            self.expect("(")
            dcols = [self.take()]
            while self.peek() == ",":
                self.take()
                dcols.append(self.take())
            self.expect(")")
            distinct_on = tuple(dcols)
            distinct = False
        if self.peek() == "*":
            # SELECT * — items expand from the FROM table's schema at
            # run_sql entry (the parser has no sf_dir); star must stand
            # alone, standard engines' common form
            self.take()
            star = True
            items: list = []
        else:
            items = [self.item()]
            if self.kw("as"):
                self.take()
                items[0].alias = self.take()
            while self.peek() == ",":
                self.take()
                items.append(self.item())
                if self.kw("as"):
                    self.take()
                    items[-1].alias = self.take()
        if not self.kw("from"):
            # SELECT <exprs> with no FROM — constant row (SELECT 1+2 AS x)
            if star:
                raise ValueError("SELECT * requires a FROM clause")
            return _Plan(table="", items=items, select_distinct=distinct,
                         no_from=True)
        self.expect("from")
        if self.peek() == "(":
            # derived table: FROM (SELECT …) [AS] t — the inner plan runs
            # as its own streaming Dataset; ``table`` holds the alias
            self.take()
            inner = self._select_core()
            self._setops(inner)
            self._order_limit(inner)
            self.expect(")")
            alias = "_sub"
            if self.kw("as"):
                self.take()
                alias = self.take()
            elif (self.peek() is not None and self.peek()[0].isalpha()
                  and self.peek().lower() not in _RESERVED_AFTER_FROM):
                alias = self.take()
            plan = _Plan(table=alias, items=items,
                         select_distinct=distinct, sub_from=inner,
                         star=star, distinct_on=distinct_on)
        else:
            plan = _Plan(table=self.take(), items=items,
                         select_distinct=distinct, star=star,
                         distinct_on=distinct_on)
        while self.kw("join", "left", "right", "full", "inner", "cross"):
            how = "inner"
            if self.kw("left", "right", "full"):
                how = {"left": "left", "right": "right",
                       "full": "outer"}[self.take().lower()]
                if self.kw("outer"):
                    self.take()
            elif self.kw("inner"):
                self.take()
            elif self.kw("cross"):
                self.take()
                self.expect("join")
                # CROSS JOIN: no ON clause — every pair; executed as a
                # size-gated broadcast cartesian (an unbounded cross join
                # is quadratic regardless of engine)
                plan.joins.append((self.take(), None, None, "cross"))
                continue
            self.expect("join")
            if self.peek() == "(":
                raise ValueError(
                    "JOIN (SELECT …): inline derived join targets are "
                    "not supported — name the subquery in a CTE (WITH x "
                    "AS (SELECT …) … JOIN x ON …); the CTE spools once "
                    "and joins as a plain table")
            tbl = self.take()
            self.expect("on")
            key_a = self.take()
            self.expect("=")
            key_b = self.take()
            while self.kw("and"):
                # ON a = b AND <pred> — extra conjuncts must be scalar
                # (ownership by the joined table is checked at execution,
                # where the parquet schemas are known); _pred_atom also
                # admits NOT ( … ) and parenthesized groups
                self.take()
                p = self._pred_atom()
                for a_ in _pred_atoms(p):
                    if a_.sub is not None:
                        raise ValueError("ON-clause predicates must be "
                                         "scalar (no IN (SELECT …))")
                plan.join_preds.setdefault(tbl, []).append(p)
            plan.joins.append((tbl, key_a, key_b, how))
        if self.kw("where"):
            self.take()
            plan.where.extend(_flatten_and(self.pred_or()))
        if self.kw("group"):
            self.take()
            self.expect("by")
            if self.kw("grouping"):
                # GROUP BY GROUPING SETS ((a,b),(a),()) — explicit level
                # list over the same one-input-pass machinery as ROLLUP:
                # the finest pass groups by the UNION of all set keys and
                # every requested set re-aggregates its group-count-sized
                # partials (decomposable exact aggregates only)
                self.take()
                self.expect("sets")
                self.expect("(")
                sets: list[tuple] = []
                while True:
                    self.expect("(")
                    s: list[str] = []
                    if self.peek() != ")":
                        s.append(self.take())
                        while self.peek() == ",":
                            self.take()
                            s.append(self.take())
                    self.expect(")")
                    sets.append(tuple(s))
                    if self.peek() == ",":
                        self.take()
                        continue
                    break
                self.expect(")")
                for s in sets:
                    for k in s:
                        if k not in plan.group_by:
                            plan.group_by.append(k)
                if len(plan.group_by) > 8:
                    raise ValueError("GROUPING SETS supports at most 8 "
                                     "distinct keys")
                if not plan.group_by:
                    raise ValueError("GROUPING SETS needs at least one "
                                     "non-empty set")
                plan.rollup = True
                plan.gsets = sets
            elif self.kw("rollup") or self.kw("cube"):
                # GROUP BY ROLLUP (a, b, …): hierarchical super-aggregate
                # levels (a,b,…), (a,b), … (a), () — rolled-up keys NULL.
                # GROUP BY CUBE (a, b, …): ALL 2^k key subsets, same
                # one-input-pass machinery (each level re-aggregates the
                # finest level's group-count-sized partials)
                plan.cube = self.kw("cube")
                self.take()
                self.expect("(")
                plan.rollup = True
                plan.group_by.append(self.take())
                while self.peek() == ",":
                    self.take()
                    plan.group_by.append(self.take())
                self.expect(")")
                if plan.cube and len(plan.group_by) > 8:
                    raise ValueError("GROUP BY CUBE supports at most 8 "
                                     "keys (2^k super-aggregate levels)")
                # falls through: HAVING parses like any grouped query
                # and filters the post-finish union of levels (SQL
                # grouping-sets semantics: HAVING applies per
                # grouping-set row)
            elif self.kw("all"):
                # GROUP BY ALL (DuckDB): every non-aggregate SELECT item
                # becomes a group key (plain columns by name, expression
                # items by their alias — the derived-column group-key
                # machinery the alias form already uses)
                self.take()
                for it in plan.items:
                    if it.fn == "col":
                        plan.group_by.append(it.name)
                    elif it.fn == "expr":
                        if not it.alias:
                            raise ValueError("GROUP BY ALL needs AS "
                                             "aliases on expression "
                                             "items")
                        plan.group_by.append(it.alias)
                if not plan.group_by:
                    raise ValueError("GROUP BY ALL found no non-"
                                     "aggregate SELECT items")
            else:
                def gb_key() -> str:
                    tok = self.peek()
                    if tok is not None and tok.isdigit():
                        idx = int(self.take())
                        if not 1 <= idx <= len(plan.items):
                            raise ValueError(
                                f"GROUP BY position {idx} out "
                                f"of range (1..{len(plan.items)})")
                        return plan.items[idx - 1].name
                    # GROUP BY <expression>: a plain column/alias passes
                    # through; an expression that TEXT-matches a SELECT
                    # item groups by that item's derived column; an
                    # unselected expression becomes a HIDDEN derived item
                    # (grouped on, dropped from the output)
                    tree = self.expr_tree()
                    if tree[0] == "col":
                        return tree[1]
                    fmt = _fmt_expr(tree)
                    for it in plan.items:
                        if (it.expr is not None
                                and _fmt_expr(it.expr) == fmt):
                            return it.name
                    hid = _Agg("expr", None, expr=tree, hidden=True,
                               alias=f"_gb{len(plan.items)}")
                    plan.items.append(hid)
                    return hid.alias

                plan.group_by.append(gb_key())
                while self.peek() == ",":
                    self.take()
                    plan.group_by.append(gb_key())
        if self.kw("having"):
            self.take()
            # aggregate calls may appear directly in HAVING predicates
            # (HAVING COUNT(*) > 5 without selecting the count) — parsed
            # as ("agg", _Agg) leaves and turned into hidden aggregates
            plan.having.extend(
                _flatten_and(self._in_aggexpr(self.pred_or)))
            _lift_having_aggs(plan)
        if self.kw("qualify"):
            self.take()
            # window functions may appear DIRECTLY in QUALIFY
            # (QUALIFY ROW_NUMBER() OVER (…) = 1 — the top-1-per-group
            # idiom); their ("wagg") leaves become hidden window items
            plan.qualify.extend(
                _flatten_and(self._in_aggexpr(self.pred_or)))
            if not (any(it.window or it.fn == "wexpr"
                        for it in plan.items)
                    or _qualify_waggs(plan.qualify)):
                raise ValueError("QUALIFY requires at least one window "
                                 "function (as in DuckDB)")
        return plan


def parse_sql(sql: str) -> _Plan:
    return _Parser(sql).parse()


# ======================================================================
# execution
# ======================================================================
def _fmt_preds(preds: list[_Pred]) -> str:
    parts = []
    for p in preds:
        if p.op == "and":
            parts.append(f"({_fmt_preds(p.value)})")
        elif p.op == "not":
            parts.append(f"NOT ({_fmt_preds(p.value)})")
        elif p.op == "or":
            parts.append("(" + " OR ".join(_fmt_preds([c])
                                           for c in p.value) + ")")
        elif p.op == "between":
            lhs = _fmt_expr(p.lexpr) if p.lexpr is not None else p.col
            parts.append(f"{lhs} BETWEEN {p.value[0]} AND {p.value[1]}")
        elif p.op in ("is_null", "not_null"):
            parts.append(f"{p.col} IS {'NOT ' if p.op == 'not_null' else ''}"
                         "NULL")
        elif p.op in ("like", "not_like", "ilike", "not_ilike"):
            parts.append(f"{p.col} {'NOT ' if p.op.startswith('not') else ''}"
                         f"{'ILIKE' if p.op.endswith('ilike') else 'LIKE'} "
                         f"{p.value!r}")
        elif p.op in ("dist_from", "not_dist_from"):
            parts.append(
                f"{p.col} IS {'NOT ' if p.op.startswith('not') else ''}"
                f"DISTINCT FROM {'NULL' if p.value is None else p.value!r}")
        elif p.lexpr is not None:
            rhs = (_fmt_expr(p.rexpr) if p.rexpr is not None
                   else repr(p.value))
            parts.append(f"{_fmt_expr(p.lexpr)} {p.op} {rhs}")
        else:
            parts.append(f"{p.col} {p.op} {p.value!r}")
    return " AND ".join(parts)


def _one_pred_mask(batch: pa.Table, p: _Pred):
    """Kleene-logic boolean mask for one predicate tree (nulls propagate;
    the caller decides where to coerce null → False, matching SQL WHERE)."""
    if p.op == "and":
        m = None
        for c in p.value:
            cm = _one_pred_mask(batch, c)
            m = cm if m is None else pc.and_kleene(m, cm)
        return m
    if p.op == "or":
        m = None
        for c in p.value:
            cm = _one_pred_mask(batch, c)
            m = cm if m is None else pc.or_kleene(m, cm)
        return m
    if p.op == "not":
        # Kleene invert: null propagates (SQL: NOT NULL is NULL)
        return pc.invert(_one_pred_mask(batch, p.value[0]))
    if p.lexpr is not None:
        left = _eval_expr(batch, p.lexpr)
        if p.op == "between":
            lo, hi = p.value
            return pc.and_kleene(pc.greater_equal(left, pa.scalar(lo)),
                                 pc.less_equal(left, pa.scalar(hi)))
        right = (_eval_expr(batch, p.rexpr) if p.rexpr is not None
                 else pa.scalar(p.value))
        kernel = {"=": pc.equal, "!=": pc.not_equal,
                  "<": pc.less, "<=": pc.less_equal,
                  ">": pc.greater, ">=": pc.greater_equal}[p.op]
        return kernel(left, right)
    col = batch[p.col]
    if p.op in ("in", "not_in"):
        # SQL: NULL [NOT] IN (...) is NULL, but Arrow's is_in maps null
        # input to false (which invert would flip to TRUE — a NOT IN
        # would silently KEEP null rows); re-mask nulls to null
        m = pc.is_in(col, value_set=pa.array(p.value))
        if p.op == "not_in":
            m = pc.invert(m)
        return pc.if_else(pc.is_valid(col), m,
                          pa.scalar(None, pa.bool_()))
    if p.op == "between":
        lo, hi = p.value
        return pc.and_kleene(pc.greater_equal(col, pa.scalar(lo)),
                             pc.less_equal(col, pa.scalar(hi)))
    if p.op == "like":
        return pc.match_like(col, p.value)
    if p.op == "not_like":
        return pc.invert(pc.match_like(col, p.value))
    if p.op == "ilike":
        return pc.match_like(col, p.value, ignore_case=True)
    if p.op == "not_ilike":
        return pc.invert(pc.match_like(col, p.value, ignore_case=True))
    if p.op in ("dist_from", "not_dist_from"):
        # null-safe (in)equality: never NULL. IS DISTINCT FROM NULL ==
        # IS NOT NULL; vs a literal, a NULL row IS distinct from it
        if p.value is None:
            return (pc.is_valid(col) if p.op == "dist_from"
                    else pc.is_null(col))
        eq = pc.fill_null(pc.equal(col, pa.scalar(p.value)), False)
        return pc.invert(eq) if p.op == "dist_from" else eq
    if p.op == "is_null":
        return pc.is_null(col)
    if p.op == "not_null":
        return pc.is_valid(col)
    kernel = {"=": pc.equal, "!=": pc.not_equal,
              "<": pc.less, "<=": pc.less_equal,
              ">": pc.greater, ">=": pc.greater_equal}[p.op]
    return kernel(col, pa.scalar(p.value))


def _pred_mask(batch: pa.Table, preds: list[_Pred]):
    """Vectorized boolean mask for a conjunction of predicate trees."""
    mask = None
    for p in preds:
        m = _one_pred_mask(batch, p)
        mask = m if mask is None else pc.and_kleene(mask, m)
    return pc.fill_null(mask, False)


def _expr_cols(e: tuple) -> set:
    """All column names referenced anywhere in an expression tree
    (including inside CASE WHEN predicates)."""
    k = e[0]
    if k == "col":
        return {e[1]}
    if k == "lit":
        return set()
    if k == "bin":
        return _expr_cols(e[2]) | _expr_cols(e[3])
    if k == "neg":
        return _expr_cols(e[1])
    if k == "extract":
        return _expr_cols(e[2])
    if k == "cast":
        return _expr_cols(e[2])
    if k == "fn":
        out = set()
        for a in e[2]:
            out |= _expr_cols(a)
        return out
    if k == "case":
        out = _expr_cols(e[2]) if e[2] is not None else set()
        for p, then in e[1]:
            out |= _pred_cols([p]) | _expr_cols(then)
        return out
    if k == "subq":
        # uncorrelated by contract — references no outer column; it is
        # replaced by a literal before the outer plan compiles
        return set()
    if k == "agg":
        # hidden aggregate leaf of a post-aggregate expression; its
        # input columns are gathered when the hidden agg registers
        return set()
    raise ValueError(f"unknown expression node {k!r}")


def _fmt_expr(e: tuple) -> str:
    k = e[0]
    if k == "col":
        return e[1]
    if k == "lit":
        return repr(e[1])
    if k == "bin":
        return f"({_fmt_expr(e[2])} {e[1]} {_fmt_expr(e[3])})"
    if k == "neg":
        return f"(-{_fmt_expr(e[1])})"
    if k == "extract":
        return f"EXTRACT({e[1].upper()} FROM {_fmt_expr(e[2])})"
    if k == "cast":
        return f"CAST({_fmt_expr(e[2])} AS {e[1]})"
    if k == "fn":
        return f"{e[1]}({', '.join(_fmt_expr(a) for a in e[2])})"
    if k == "subq":
        return f"(SELECT {e[1].items[0].name} FROM {e[1].table} …)"
    if k == "agg":
        ag = e[1]
        arg = (_fmt_expr(ag.expr) if ag.expr is not None
               else (ag.col or "*"))
        return f"{ag.fn.upper()}({arg})"
    whens = " ".join(f"WHEN {_fmt_preds([p])} THEN {_fmt_expr(t)}"
                     for p, t in e[1])
    els = f" ELSE {_fmt_expr(e[2])}" if e[2] is not None else ""
    return f"CASE {whens}{els} END"


_EXTRACT_KERNELS = {"year": pc.year, "month": pc.month, "day": pc.day,
                    "hour": pc.hour, "minute": pc.minute,
                    "second": pc.second,
                    # DuckDB-typed extensions (all BIGINT except EPOCH,
                    # which is DOUBLE seconds):
                    #   dow Sunday=0, doy 1-based, week = ISO week,
                    #   millisecond = whole sub-minute milliseconds
                    #   (sec*1000 + ms), decade = year // 10
                    "quarter": pc.quarter,
                    "doy": pc.day_of_year,
                    "week": pc.iso_week,
                    "dow": lambda a: pc.day_of_week(
                        a, options=pc.DayOfWeekOptions(
                            count_from_zero=True, week_start=7)),
                    "decade": lambda a: pc.divide(pc.cast(
                        pc.year(a), pa.int64()), 10),
                    "millisecond": lambda a: pc.add(
                        pc.multiply(pc.cast(pc.second(a), pa.int64()),
                                    1000),
                        pc.cast(pc.millisecond(a), pa.int64())),
                    "epoch": lambda a: pc.divide(
                        pc.cast(pc.cast(a, pa.timestamp("us")),
                                pa.int64()),
                        pa.scalar(1_000_000.0))}


def _as_str(arr):
    """Cast to string for || / CONCAT (SQL casts numerics implicitly)."""
    t = getattr(arr, "type", None)
    if t is not None and (pa.types.is_string(t) or pa.types.is_large_string(t)):
        return arr
    return pc.cast(arr, pa.string())


def _sql_mod(left, right):
    """C-sign modulo (DuckDB %/MOD: result carries the dividend's sign).
    Integer inputs stay exact via Arrow's truncating integer division;
    any float promotes both sides to float64."""
    lt = getattr(left, "type", pa.int64())
    rt = getattr(right, "type", pa.int64())
    if pa.types.is_floating(lt) or pa.types.is_floating(rt):
        lf, rf = pc.cast(left, pa.float64()), pc.cast(right, pa.float64())
        return pc.subtract(lf, pc.multiply(rf, pc.trunc(pc.divide(lf, rf))))
    return pc.subtract(left, pc.multiply(right, pc.divide(left, right)))


def _variance_tree(low: str, arg: tuple) -> tuple:
    """Rewrite a variance-family aggregate into a post-aggregate
    expression over exact decomposable hidden aggregates::

        var_pop(x)  = (Σx² − (Σx)²/n) / n
        var_samp(x) = (Σx² − (Σx)²/n) / NULLIF(n−1, 0)   -- NULL at n=1
        stddev_*    = sqrt(var_*)

    The three hidden aggregates (COUNT(x), SUM(x), SUM(x*x)) ride the
    map-side Arrow pre-combine and the bucketed hash merge like any exact
    aggregate; only the finalize is float.  ``_clamp0`` (internal, not
    parseable from SQL) floors the tiny negative float residue that exact
    math forbids — with skip_nulls=False so all-NULL groups stay NULL."""
    if arg[0] != "col":
        raise ValueError(f"{low.upper()} takes a plain column (compute "
                         "the expression in a derived table first)")
    c = arg[1]
    n = ("cast", "float64", ("agg", _Agg("count", c)))
    sx = ("cast", "float64", ("agg", _Agg("sum", c)))
    sxx = ("cast", "float64",
           ("agg", _Agg("sum", None,
                        expr=("bin", "*", ("col", c), ("col", c)))))
    num = ("bin", "-", sxx, ("bin", "/", ("bin", "*", sx, sx), n))
    if low in ("var_pop", "stddev_pop"):
        var = ("bin", "/", num, n)
    else:
        var = ("bin", "/", num,
               ("fn", "nullif", (("bin", "-", n, ("lit", 1.0)),
                                 ("lit", 0.0))))
    var = ("fn", "_clamp0", (var,))
    if low.startswith("stddev"):
        return ("fn", "sqrt", (var,))
    return var


def _covar_tree(low: str, argy: tuple, argx: tuple) -> tuple:
    """Rewrite a two-column regression/correlation aggregate (SQL argument
    order ``fn(y, x)``) into a post-aggregate expression over six exact
    decomposable hidden sums, each PAIRWISE-masked (SQL ignores a row when
    EITHER argument is NULL, so every sum runs over
    ``CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN … END``)::

        n, Σx, Σy, Σx², Σy², Σxy        -- int-exact partials
        mxy = Σxy − ΣxΣy/n              -- n·covar_pop
        mxx = clamp0(Σx² − (Σx)²/n)     -- n·var_pop(x)

        covar_pop  = mxy/n     covar_samp = mxy/nullif(n−1, 0)
        corr       = mxy / nullif(sqrt(mxx)·sqrt(myy), 0)
        regr_slope = mxy/nullif(mxx, 0)
        regr_intercept = Σy/n − slope·Σx/n
        regr_sxx/syy/sxy = mxx/myy/mxy;  regr_avgx/avgy = Σx/n, Σy/n
        regr_count = n (BIGINT, 0 when no pairwise-complete row)

    Shared sums dedupe across calls by value signature, so
    ``SELECT corr(y,x), regr_slope(y,x)`` costs six hidden aggregates,
    not twelve. Zero denominators surface as NULL via NULLIF — constant x
    ⇒ corr/slope NULL, n=1 ⇒ covar_samp NULL — matching SQL."""
    if argy[0] != "col" or argx[0] != "col":
        raise ValueError(f"{low.upper()} takes plain columns (compute "
                         "the expressions in a derived table first)")
    y, x = argy[1], argx[1]
    both = _Pred("", "and", value=[_Pred(x, "not_null"),
                                   _Pred(y, "not_null")])

    def s(e: tuple) -> tuple:
        masked = ("case", ((both, e),), None)
        return ("cast", "float64", ("agg", _Agg("sum", None, expr=masked)))

    n = s(("lit", 1))
    sx, sy = s(argx), s(argy)
    sxx = s(("bin", "*", argx, argx))
    syy = s(("bin", "*", argy, argy))
    sxy = s(("bin", "*", argx, argy))
    mxy = ("bin", "-", sxy, ("bin", "/", ("bin", "*", sx, sy), n))
    mxx = ("fn", "_clamp0",
           (("bin", "-", sxx, ("bin", "/", ("bin", "*", sx, sx), n)),))
    myy = ("fn", "_clamp0",
           (("bin", "-", syy, ("bin", "/", ("bin", "*", sy, sy), n)),))
    if low == "regr_count":
        return ("cast", "int64", ("fn", "coalesce", (n, ("lit", 0.0))))
    if low == "covar_pop":
        return ("bin", "/", mxy, n)
    if low == "covar_samp":
        return ("bin", "/", mxy,
                ("fn", "nullif", (("bin", "-", n, ("lit", 1.0)),
                                  ("lit", 0.0))))
    if low == "corr":
        denom = ("bin", "*", ("fn", "sqrt", (mxx,)),
                 ("fn", "sqrt", (myy,)))
        return ("bin", "/", mxy, ("fn", "nullif", (denom, ("lit", 0.0))))
    if low == "regr_slope":
        return ("bin", "/", mxy, ("fn", "nullif", (mxx, ("lit", 0.0))))
    if low == "regr_intercept":
        slope = ("bin", "/", mxy, ("fn", "nullif", (mxx, ("lit", 0.0))))
        return ("bin", "-", ("bin", "/", sy, n),
                ("bin", "*", slope, ("bin", "/", sx, n)))
    if low == "regr_avgx":
        return ("bin", "/", sx, n)
    if low == "regr_avgy":
        return ("bin", "/", sy, n)
    return {"regr_sxx": mxx, "regr_syy": myy, "regr_sxy": mxy}[low]


def _unify_branch(arrs):
    """Promote CASE branch values to one common type the way SQL does:
    any float anywhere → float64; else ints stay int64; other types must
    already agree. A null-typed branch (an all-null column out of an
    outer-join bucket, or a bare NULL literal) casts to the first typed
    branch — Arrow kernels have no (T, null) signatures."""
    types = [a.type for a in arrs]
    if any(pa.types.is_null(t) for t in types):
        typed = next((t for t in types if not pa.types.is_null(t)), None)
        if typed is not None:
            arrs = [pc.cast(a, typed) if pa.types.is_null(a.type) else a
                    for a in arrs]
            types = [a.type for a in arrs]
    if any(pa.types.is_floating(t) for t in types) and not all(
            pa.types.is_floating(t) for t in types):
        return [pc.cast(a, pa.float64()) if not pa.types.is_floating(a.type)
                else a for a in arrs]
    return arrs


def _eval_expr(batch: pa.Table, e: tuple):
    """Evaluate an expression tree over one Arrow batch — every node is a
    single pyarrow.compute kernel call (no Python row loops). Returns an
    Array/ChunkedArray (scalars are broadcast to the batch length)."""
    k = e[0]
    if k == "col":
        return batch[e[1]]
    if k == "lit":
        # broadcast: a pure-literal (sub)expression becomes a constant
        # column of the batch length; the type is pinned so an EMPTY batch
        # cannot degrade to Arrow's null type and break block unification
        import datetime as _dt
        v = e[1]
        t = (pa.int64() if isinstance(v, int)
             else pa.float64() if isinstance(v, float)
             else pa.timestamp("us") if isinstance(v, _dt.datetime)
             else pa.duration("us") if isinstance(v, _dt.timedelta)
             else pa.string())
        return pa.chunked_array([pa.array([v] * batch.num_rows, type=t)])
    if k == "neg":
        return pc.negate(_eval_expr(batch, e[1]))
    if k == "bin":
        op, left, right = e[1], _eval_expr(batch, e[2]), _eval_expr(batch, e[3])
        if op == "/":
            # SQL (DuckDB) "/" is float division regardless of operand types
            return pc.divide(pc.cast(left, pa.float64()),
                             pc.cast(right, pa.float64()))
        if op == "%":
            return _sql_mod(left, right)
        if op == "||":
            # SQL concat operator: NULL if either side is NULL (unlike
            # CONCAT(), which skips NULLs); non-strings cast to text
            return pc.binary_join_element_wise(
                _as_str(left), _as_str(right), "",
                null_handling="emit_null")
        kern = {"+": pc.add, "-": pc.subtract, "*": pc.multiply}[op]
        return kern(left, right)
    if k == "extract":
        return pc.cast(_EXTRACT_KERNELS[e[1]](_eval_expr(batch, e[2])),
                       pa.float64() if e[1] == "epoch" else pa.int64())
    if k == "cast":
        val = _eval_expr(batch, e[2])
        if e[1] in ("date", "timestamp"):
            # string inputs parse ISO forms vectorized; temporal inputs
            # re-pin to the canonical microsecond unit
            val = pc.cast(val, pa.timestamp("us"))
            return (pc.floor_temporal(val, unit="day")
                    if e[1] == "date" else val)
        target = {"int64": pa.int64(), "float64": pa.float64(),
                  "string": pa.string()}[e[1]]
        if e[1] == "int64" and pa.types.is_floating(val.type):
            # CAST(DOUBLE AS BIGINT) rounds half to EVEN (DuckDB/IEEE
            # nearbyint — NOT the half-away rule its DECIMAL casts use);
            # Arrow's bare cast would truncate or refuse
            val = pc.round(val, round_mode="half_to_even")
        return pc.cast(val, target)
    if k == "fn":
        name, args = e[1], [_eval_expr(batch, a) for a in e[2]]
        if name == "lower":
            return pc.utf8_lower(args[0])
        if name == "upper":
            return pc.utf8_upper(args[0])
        if name == "trim":
            return pc.utf8_trim_whitespace(args[0])
        if name == "abs":
            return pc.abs(args[0])
        if name == "length":
            # DuckDB length() is BIGINT; Arrow's is int32
            return pc.cast(pc.utf8_length(args[0]), pa.int64())
        if name == "substr":
            # SQL substr is 1-based; literal args enforced at parse
            start = e[2][1][1] - 1
            stop = (start + e[2][2][1]) if len(e[2]) > 2 else None
            return pc.utf8_slice_codeunits(args[0], start, stop)
        if name == "coalesce":
            # SQL type unification across branches (int+float → float64)
            return pc.coalesce(*_unify_branch(args))
        if name == "nullif":
            a, b = _unify_branch(args)
            # NULLIF(a, b): null where a = b (null compare → keep a)
            eq = pc.fill_null(pc.equal(a, b), False)
            return pc.if_else(eq, pa.scalar(None, type=a.type), a)
        if name == "date_trunc":
            # part validated at parse; Arrow week flooring starts Monday
            # (DuckDB/ISO); output keeps the input temporal type
            return pc.floor_temporal(args[1],
                                     unit=str(e[2][0][1]).lower())
        if name == "strftime":
            return pc.strftime(args[0], format=str(e[2][1][1]))
        # ------------------------------------------------ math (round 5)
        if name == "round":
            nd = int(e[2][1][1]) if len(args) == 2 else 0
            # DuckDB ROUND over DOUBLE rounds half away from zero (_ROUND)
            return pc.round(pc.cast(args[0], pa.float64()),
                            ndigits=nd, **_ROUND)
        if name in ("floor", "ceil", "sqrt", "exp", "ln", "log2",
                    "log10"):
            kern = {"floor": pc.floor, "ceil": pc.ceil, "sqrt": pc.sqrt,
                    "exp": pc.exp, "ln": pc.ln, "log2": pc.log2,
                    "log10": pc.log10}[name]
            # DuckDB types these DOUBLE even over integer inputs
            return kern(pc.cast(args[0], pa.float64()))
        if name == "power":
            return pc.power(pc.cast(args[0], pa.float64()),
                            pc.cast(args[1], pa.float64()))
        if name == "mod":
            return _sql_mod(args[0], args[1])
        if name == "sign":
            # DuckDB SIGN is integral (-1/0/1); Arrow keeps the input type
            return pc.cast(pc.sign(args[0]), pa.int64())
        if name in ("greatest", "least"):
            kern = (pc.max_element_wise if name == "greatest"
                    else pc.min_element_wise)
            # skip_nulls default True == DuckDB (GREATEST(1,NULL,3) = 3)
            return kern(*_unify_branch(args))
        if name == "_clamp0":
            # internal (variance rewrite): max(x, 0) PRESERVING null —
            # skip_nulls=False so an all-NULL group's NULL survives
            return pc.max_element_wise(args[0], pa.scalar(0.0),
                                       skip_nulls=False)
        # --------------------------------------------- strings (round 5)
        if name == "concat":
            # DuckDB CONCAT skips NULLs (contrast ||, which emits NULL)
            return pc.binary_join_element_wise(
                *[_as_str(a) for a in args], "", null_handling="skip")
        if name == "replace":
            return pc.replace_substring(args[0],
                                        pattern=str(e[2][1][1]),
                                        replacement=str(e[2][2][1]))
        if name == "ltrim":
            return pc.utf8_ltrim_whitespace(args[0])
        if name == "rtrim":
            return pc.utf8_rtrim_whitespace(args[0])
        if name == "reverse":
            return pc.utf8_reverse(args[0])
        if name == "left":
            n = int(e[2][1][1])
            return pc.utf8_slice_codeunits(args[0], 0, n)
        if name == "right":
            n = int(e[2][1][1])
            if n == 0:
                return pc.utf8_slice_codeunits(args[0], 0, 0)
            return pc.utf8_slice_codeunits(args[0], -n, None)
        if name == "strpos":
            # 1-based; 0 when absent (Arrow find_substring returns -1)
            return pc.cast(pc.add(pc.find_substring(
                args[0], pattern=str(e[2][1][1])), 1), pa.int64())
        if name == "contains":
            return pc.match_substring(args[0], pattern=str(e[2][1][1]))
        if name == "starts_with":
            return pc.starts_with(args[0], pattern=str(e[2][1][1]))
        if name == "ends_with":
            return pc.ends_with(args[0], pattern=str(e[2][1][1]))
        if name == "repeat":
            return pc.binary_repeat(args[0], int(e[2][1][1]))
        if name == "split_part":
            sep, idx = str(e[2][1][1]), int(e[2][2][1])
            # DuckDB returns '' past the last part; padding the input
            # with idx separators makes the plain list_element exact for
            # both cases in one vectorized pass (NULL input stays NULL)
            padded = pc.binary_join_element_wise(
                args[0], sep * idx, "", null_handling="emit_null")
            return pc.list_element(pc.split_pattern(padded, pattern=sep),
                                   idx - 1)
        if name == "sha256":
            # per-row sha256 hex via the repo's BUFFER-LEVEL vectorized
            # kernel (ops.sha256_hex_column — one pass over the Arrow
            # string buffer, no per-row Python string building)
            from .ops import sha256_hex_column
            return sha256_hex_column(args[0])
        if name in ("lpad", "rpad"):
            # Postgres/DuckDB semantics: pad to n chars; if the input is
            # LONGER it truncates to the LEFTMOST n (both variants)
            n = int(e[2][1][1])
            padc = str(e[2][2][1])
            if not padc:
                raise ValueError(f"{name} padding must be non-empty")
            padded = (pc.utf8_lpad if name == "lpad" else pc.utf8_rpad)(
                args[0], width=n, padding=padc)
            return pc.utf8_slice_codeunits(padded, 0, n)
        if name == "concat_ws":
            # separator-joined concat, SKIPPING nulls (DuckDB CONCAT_WS)
            sep = str(e[2][0][1])
            return pc.binary_join_element_wise(
                *args[1:], sep, null_handling="skip")
        if name == "last_day":
            # last day of the month: strictly-greater month ceil minus
            # one day (exact at month boundaries too)
            nxt = pc.ceil_temporal(args[0], unit="month",
                                   ceil_is_strictly_greater=True)
            return pc.subtract(
                nxt, pa.scalar(86_400_000_000, pa.duration("us")))
        if name == "regexp_replace":
            # DuckDB replaces the FIRST match unless the 'g' flag is given
            maxr = None if len(args) == 4 else 1
            return pc.replace_substring_regex(
                args[0], pattern=str(e[2][1][1]),
                replacement=str(e[2][2][1]), max_replacements=maxr)
        if name == "regexp_matches":
            return pc.match_substring_regex(args[0],
                                            pattern=str(e[2][1][1]))
        # -------------------------------------------- temporal (round 5)
        if name == "datediff":
            part = str(e[2][0][1]).lower()
            a, b = args[1], args[2]
            if part in _DATEDIFF_US:
                us = _DATEDIFF_US[part]
                fa = pc.floor_temporal(a, unit=part)
                fb = pc.floor_temporal(b, unit=part)
                # exact: floored stamps differ by whole part-widths
                return pc.divide(
                    pc.cast(pc.subtract(fb, fa), pa.int64()), us)
            dy = pc.subtract(pc.cast(pc.year(b), pa.int64()),
                             pc.cast(pc.year(a), pa.int64()))
            if part == "year":
                return dy
            if part == "quarter":
                dq = pc.subtract(pc.cast(pc.quarter(b), pa.int64()),
                                 pc.cast(pc.quarter(a), pa.int64()))
                return pc.add(pc.multiply(dy, 4), dq)
            dm = pc.subtract(pc.cast(pc.month(b), pa.int64()),
                             pc.cast(pc.month(a), pa.int64()))
            return pc.add(pc.multiply(dy, 12), dm)
        raise ValueError(f"unknown scalar function {name!r}")
    if k == "case":
        whens, els = e[1], e[2]
        thens = [_eval_expr(batch, t) for _, t in whens]
        if els is not None:
            branches = _unify_branch(thens + [_eval_expr(batch, els)])
            thens, result = branches[:-1], branches[-1]
        else:
            thens = _unify_branch(thens)
            result = pa.chunked_array([pa.nulls(batch.num_rows,
                                                type=thens[0].type)])
        # SQL CASE: first matching WHEN wins; a null condition falls
        # through (same as false) — fold right-to-left so earlier WHENs
        # override later ones
        for (p, _), then in zip(reversed(whens), reversed(thens)):
            mask = pc.fill_null(_one_pred_mask(batch, p), False)
            result = pc.if_else(mask, then, result)
        return result
    raise ValueError(f"unknown expression node {k!r}")


def _expr_derive_fn(exprs: dict):
    """One vectorized map_batches stage attaching every derived expression
    column (Ray fuses it with adjacent map stages)."""
    items = tuple(exprs.items())

    def fn(b: pa.Table) -> pa.Table:
        for name, e in items:
            arr = _eval_expr(b, e)
            # an alias that shadows a source column (CAST(x AS T) AS x)
            # must REPLACE it — appending would leave two fields named
            # `name` and break every downstream by-name column lookup
            if name in b.schema.names:
                b = b.set_column(b.schema.names.index(name), name, arr)
            else:
                b = b.append_column(name, arr)
        return b

    return fn


def _register_exprs(plan: _Plan, *, group_aliases: bool) -> dict:
    """Rewrite expression items to derived-column references and return
    {derived_name: expr_tree}. Aggregate arguments become ``_expr_<alias>``
    columns; with ``group_aliases``, plain expression SELECT items become
    group keys named by their alias (must be GROUPed BY via the alias)."""
    exprs: dict[str, tuple] = {}
    for it in plan.items:
        if it.fn == "aggexpr":
            # post-aggregate expression — evaluated in the finish stage
            # over the aggregated table, never a derived input column
            continue
        if it.fn == "expr":
            if not group_aliases:
                raise ValueError("expression SELECT items are not "
                                 "supported on this route")
            if not it.alias:
                raise ValueError("an expression SELECT item needs AS "
                                 f"alias (got {_fmt_expr(it.expr)})")
            if it.alias not in plan.group_by:
                raise ValueError(f"expression item {it.alias!r} must be "
                                 "GROUPed BY via its alias")
            exprs[it.alias] = it.expr
            it.col = it.alias
        elif it.expr is not None:
            if not it.alias:
                raise ValueError(f"{it.fn.upper()} over an expression "
                                 "requires AS alias")
            dname = f"_expr_{it.alias}"
            exprs[dname] = it.expr
            it.col = dname
    return exprs


def _materialize_self_joins(plan: "_Plan", sf_dir: str,
                            explain: list | None) -> str:
    """Self-join support: each additional instance of a table becomes a
    VIRTUAL table ``table__alias`` with every column renamed
    ``alias__col`` (restoring the unique-column contract), materialized
    ONCE into a session overlay by a STREAMING distributed rename
    (read_parquet → zero-copy rename_columns → write_parquet — many part
    files, never a driver funnel). Dims cost one small spool; a self-
    joined FACT table pays one full rewrite — documented trade for a
    shape relational engines otherwise shuffle twice anyway."""
    import os
    import tempfile

    import ray.data as rd

    overlay = tempfile.mkdtemp(prefix="vr_selfjoin_")
    for fn in os.listdir(sf_dir):
        if fn.endswith(".parquet"):
            os.symlink(os.path.join(sf_dir, fn),
                       os.path.join(overlay, fn))
    for vt, (base, alias) in plan.self_joins.items():
        if explain is not None:
            explain.append(
                f"SELF-JOIN instance {base} AS {alias} -> virtual table "
                f"{vt} (columns renamed {alias}__*, streaming rename "
                "spooled once into the session overlay)")
        src = os.path.join(overlay, f"{base}.parquet")
        ds = rd.read_parquet(src)
        names = _table_schema(src).names
        ds = ds.map_batches(
            lambda b, _m={c: f"{alias}__{c}" for c in names}:
                b.rename_columns([_m[c] for c in b.schema.names]),
            batch_format="pyarrow", zero_copy_batch=True)
        ds.write_parquet(os.path.join(overlay, f"{vt}.parquet"))
    plan.self_joins = {}
    return overlay


def _expand_stars(plan: "_Plan", sf_dir: str) -> None:
    """Expand ``SELECT *`` to explicit column items — the FROM table's
    parquet schema, or a derived table's item names (inner stars expand
    first). JOINed ``*`` raises: the broadcast-enrich fast path collapses
    the dim join key into the fact key, so the physical column set is
    plan-dependent — list columns explicitly."""
    for part in [plan] + list(plan.unions):
        if part.sub_from is not None:
            _expand_stars(part.sub_from, sf_dir)
        if not part.star:
            continue
        if part.joins:
            raise ValueError("SELECT * with JOIN is not supported (the "
                             "join key equivalence makes the physical "
                             "column set plan-dependent) — list the "
                             "columns explicitly")
        if part.sub_from is not None:
            names = [it.name for it in part.sub_from.items]
        else:
            names = list(
                _table_schema(f"{sf_dir}/{part.table}.parquet").names)
        part.items = [_Agg("col", c) for c in names]
        part.star = False


def _distinct_rows(ds, names: list[str]):
    """Exact distinct rows over ``names``: per-block Arrow pre-dedup
    (so only distinct rows per block pay the exchange) + ONE null-safe
    distinct-rows groupby (the _gkn/_gk key wrap — Ray's sort-based
    shuffle cannot compare None), then key reconstruction. The same
    discipline as the UNION DISTINCT set-operation route."""
    from ray.data.aggregate import Count

    gkp = [(c, f"_gkn_{c}", f"_gk_{c}") for c in names]

    def _pre(b: pa.Table, _names=tuple(names),
             _gk=tuple(gkp)) -> pa.Table:
        b = b.group_by(list(_names)).aggregate([]).select(list(_names))
        for c, gkn, gkc in _gk:
            col = b[c]
            z = _zero_like(col.type)
            b = b.append_column(gkn, pc.cast(pc.is_null(col), pa.int8()))
            b = b.append_column(gkc, col if z is None
                                else pc.fill_null(col, z))
        return b.drop_columns(list(_names))

    group_cols = [c for _, gkn, gkc in gkp for c in (gkn, gkc)]
    grouped = (ds.map_batches(_pre, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby(group_cols).aggregate(Count(alias_name="_dn")))

    def _back(b: pa.Table, _gk=tuple(gkp), _names=tuple(names)):
        for c, gkn, gkc in _gk:
            arr = b[gkc]
            b = b.append_column(
                c, pc.if_else(pc.cast(b[gkn], pa.bool_()),
                              pa.scalar(None, type=arr.type), arr))
        return b.select(list(_names))

    return grouped.map_batches(_back, batch_format="pyarrow")


def _scalar_filter_fn(preds: list[_Pred]):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(_pred_mask(batch, preds))

    return fn


def _broadcast_enrich(ds, dim_tbl: pa.Table, left_key: str, right_key: str,
                      out_cols: list, how: str = "inner"):
    """Join-enrich against a small unique-keyed dimension table: one
    vectorized ``pc.index_in`` per batch resolves each fact key to its dim
    row, columns attach via ``take``. INNER drops non-matching fact rows;
    LEFT keeps them — ``take`` on the null index yields SQL's null-padded
    dim columns. The dim table rides into every task once via the
    serialized transform (broadcast) — no shuffle either way."""
    key_arr = dim_tbl[right_key].combine_chunks()
    cols = {c: dim_tbl[c].combine_chunks() for c in out_cols}

    def enrich(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b[left_key], value_set=key_arr)
        if how == "inner":
            valid = pc.is_valid(idx)
            b = b.filter(valid)
            idx = pc.filter(idx, valid)
        for name, arr in cols.items():
            b = b.append_column(name, arr.take(idx))
        return b

    return ds.map_batches(enrich, batch_format="pyarrow",
                          zero_copy_batch=True)


def _map_expr_subq(e, repl):
    """Rebuild an expression tree with every ``("subq", plan)`` node
    replaced by ``repl(plan)`` (a ``("lit", value)`` node). Pure — the
    parsed tree is never mutated, so plans stay reusable."""
    if e is None:
        return None
    k = e[0]
    if k == "subq":
        return repl(e[1])
    if k in ("agg", "wagg"):
        # hidden aggregate / window leaf: map any scalar subquery in its
        # argument, keep the leaf itself
        if e[1].expr is not None:
            e[1].expr = _map_expr_subq(e[1].expr, repl)
        return e
    if k in ("col", "lit"):
        return e
    if k == "bin":
        return ("bin", e[1], _map_expr_subq(e[2], repl),
                _map_expr_subq(e[3], repl))
    if k == "neg":
        return ("neg", _map_expr_subq(e[1], repl))
    if k == "extract":
        return ("extract", e[1], _map_expr_subq(e[2], repl))
    if k == "cast":
        return ("cast", e[1], _map_expr_subq(e[2], repl))
    if k == "fn":
        return ("fn", e[1], tuple(_map_expr_subq(a, repl) for a in e[2]))
    if k == "case":
        whens = tuple((_map_pred_subq(p, repl), _map_expr_subq(t, repl))
                      for p, t in e[1])
        els = _map_expr_subq(e[2], repl) if e[2] is not None else None
        return ("case", whens, els)
    raise ValueError(f"unknown expression node {k!r}")


def _map_pred_subq(p: _Pred, repl) -> _Pred:
    import dataclasses

    if p.op in ("and", "or"):
        return dataclasses.replace(
            p, value=[_map_pred_subq(c, repl) for c in p.value])
    return dataclasses.replace(p, lexpr=_map_expr_subq(p.lexpr, repl),
                               rexpr=_map_expr_subq(p.rexpr, repl))


def _split_correlation(sub_table: str, sub_preds: list, sf_dir: str,
                       sub_joins: list = ()):
    """Classify a subquery's WHERE conjuncts against the sub table's
    parquet schema (plus the schemas of the subquery's OWN joined
    tables — a column the subquery attaches via JOIN is inner, not an
    outer reference): returns (inner_key, outer_key, build_preds) when
    exactly one conjunct is a correlation equality ``sub_col = outer_col``
    and every other conjunct touches only sub-side columns; returns None
    when nothing references the outer scope (uncorrelated); raises on
    correlated shapes the planner cannot decorrelate."""
    import pyarrow.parquet as pq

    sub_cols = set(_table_schema(f"{sf_dir}/{sub_table}.parquet").names)
    for j in sub_joins:
        sub_cols |= set(_table_schema(f"{sf_dir}/{j[0]}.parquet").names)
    corr, build = [], []
    for p in sub_preds:
        cols = _pred_cols([p])
        if cols <= sub_cols:
            build.append(p)
            continue
        ok = (p.op == "=" and p.sub is None
              and p.lexpr is not None and p.lexpr[0] == "col"
              and p.rexpr is not None and p.rexpr[0] == "col")
        a, b = ((p.lexpr[1], p.rexpr[1]) if ok else (None, None))
        if ok and (a in sub_cols) != (b in sub_cols):
            corr.append((a, b) if a in sub_cols else (b, a))
            continue
        raise ValueError(
            f"correlated subquery on {sub_table}: cannot decorrelate "
            f"predicate {_fmt_preds([p])!r} — only one equality "
            "``sub_col = outer_col`` plus sub-table-only conjuncts is "
            "supported")
    if not corr:
        return None
    if len(corr) > 1:
        raise ValueError("correlated subqueries support exactly one "
                         f"correlation equality (got {len(corr)})")
    inner_key, outer_key = corr[0]
    return inner_key, outer_key, build


def _rewrite_correlated(plan: "_Plan", sf_dir: str,
                        explain: list | None) -> None:
    """Decorrelate WHERE before anything executes (SQL's logical order is
    preserved — the rewrite is algebraic):

    - ``[NOT] EXISTS (SELECT … FROM t WHERE t.k = outer.k AND …)``
      rewrites IN PLACE to the membership form ``outer.k [NOT] IN
      (SELECT t.k FROM t WHERE …)`` — the existing exact semi/anti join
      (or Bloom probe) executes it; NOT EXISTS anti-join semantics are
      exactly SQL's (no ANSI NOT-IN null trap).
    - ``outer_expr op (SELECT agg(x) FROM t WHERE t.k = outer.k AND …)``
      moves to plan.corr_where as a _CorrPred: a grouped-aggregate build
      ``SELECT k, agg(x) GROUP BY k`` joined back on the correlation key
      at the end of the scan phase, then one vectorized filter.

    Correlated subqueries anywhere else (under OR, in HAVING/FILTER/item
    expressions) raise loudly rather than mis-executing as uncorrelated."""

    def subq_nodes(e):
        if not isinstance(e, tuple):
            return
        if len(e) and e[0] == "subq":
            yield e[1]
            return
        for c in e:
            yield from subq_nodes(c)

    def assert_uncorrelated(preds, where: str):
        for p in preds:
            for a in _pred_atoms(p):
                for side in (a.lexpr, a.rexpr):
                    if side is None:
                        continue
                    for s in subq_nodes(side):
                        if _split_correlation(s.table, s.where,
                                              sf_dir,
                                              s.joins) is not None:
                            raise ValueError(
                                "correlated scalar subqueries are only "
                                "supported as top-level AND conjuncts in "
                                f"WHERE (found one in {where})")

    new_where = []
    for p in plan.where:
        if p.op in ("exists", "not_exists"):
            sub_table, _none, sub_preds, _hav = p.sub
            split = _split_correlation(sub_table, sub_preds, sf_dir)
            if split is None:
                raise ValueError(
                    f"EXISTS ({sub_table}) has no correlation equality "
                    "against the outer query")
            inner_key, outer_key, build = split
            p.col = outer_key
            p.op = "in" if p.op == "exists" else "not_in"
            p.sub = (sub_table, inner_key, build, [])
            if explain is not None:
                explain.append(
                    f"[NOT] EXISTS {sub_table} -> rewritten to "
                    f"{outer_key} [NOT] IN (SELECT {inner_key} FROM "
                    f"{sub_table}) — exact semi/anti join")
            new_where.append(p)
            continue
        # top-level comparison conjunct with a correlated scalar subquery
        # on exactly one side
        handled = False
        if (p.op in ("=", "!=", "<", "<=", ">", ">=")
                and p.sub is None):
            sides = []
            for side in (p.lexpr, p.rexpr):
                subs = list(subq_nodes(side)) if side is not None else []
                sides.append(subs)
            lsubs, rsubs = sides
            # bare-column comparisons store the column in p.col
            lexpr = p.lexpr if p.lexpr is not None else (
                ("col", p.col) if p.col else None)
            for outer_side, sub_side, flip in ((lexpr, rsubs, False),
                                               (p.rexpr, lsubs, True)):
                if len(sub_side) != 1 or outer_side is None:
                    continue
                s = sub_side[0]
                # the subquery must BE the whole side, not a term inside
                # an expression (0.2*AVG(..) belongs INSIDE the subquery)
                whole = (p.rexpr if not flip else p.lexpr)
                if whole is None or whole[0] != "subq":
                    continue
                split = _split_correlation(s.table, s.where, sf_dir,
                                           s.joins)
                if split is None:
                    continue          # uncorrelated: resolved later
                if s.group_by or s.unions or s.joins or len(s.items) != 1:
                    raise ValueError(
                        "a correlated scalar subquery must SELECT one "
                        "aggregate from one table (no GROUP BY / JOIN / "
                        "UNION)")
                inner_key, outer_key, build = split
                op = p.op
                if flip:
                    op = {"<": ">", "<=": ">=", ">": "<",
                          ">=": "<=", "=": "=", "!=": "!="}[op]
                plan.corr_where.append(_CorrPred(
                    outer_expr=outer_side, op=op, sub_table=s.table,
                    inner_key=inner_key, outer_key=outer_key,
                    agg_item=s.items[0], build_preds=build))
                handled = True
                break
        if handled:
            continue
        # anything else: make sure no correlated subquery hides inside
        assert_uncorrelated([p], "a non-decorrelatable WHERE position")
        new_where.append(p)
    plan.where = new_where
    assert_uncorrelated(plan.having, "HAVING")
    for it in plan.items:
        if it.filter_pred:
            assert_uncorrelated(it.filter_pred, "FILTER (WHERE …)")
        if it.expr is not None:
            for s in subq_nodes(it.expr):
                if _split_correlation(s.table, s.where, sf_dir,
                                      s.joins) is not None:
                    raise ValueError("correlated scalar subqueries are "
                                     "not supported in SELECT items")


def _rewrite_corr_items(plan: "_Plan", sf_dir: str, opts: dict,
                        explain: list | None) -> str:
    """Correlated scalar subqueries as SELECT items —
    ``(SELECT agg(x) FROM t WHERE t.k = outer.k [AND …]) AS a`` —
    decorrelate to a grouped-aggregate build LEFT-joined back on the
    correlation key: the build ``SELECT k, agg(x) GROUP BY k``
    materializes ONCE (distributed write_parquet into a session overlay,
    the CTE spool pattern) under disjoint ``_ck_/_cv_`` names, a LEFT
    join attaches the value (broadcast enrich when the build is small —
    build keys are unique by construction), and a COUNT item wraps in
    COALESCE(v, 0) (SQL: COUNT over zero correlated rows is 0; every
    other aggregate stays NULL). Returns the (possibly new) sf_dir."""
    import dataclasses
    import os
    import tempfile

    corr = []
    for it in plan.items:
        if (it.fn == "expr" and it.expr is not None
                and it.expr[0] == "subq"):
            s = it.expr[1]
            split = _split_correlation(s.table, s.where, sf_dir, s.joins)
            if split is not None:
                corr.append((it, s, split))
    if not corr:
        return sf_dir
    overlay = tempfile.mkdtemp(prefix="vr_corr_")
    for fn in os.listdir(sf_dir):
        if fn.endswith(".parquet"):
            os.symlink(os.path.join(sf_dir, fn),
                       os.path.join(overlay, fn))
    for j, (it, s, split) in enumerate(corr):
        if s.group_by or s.unions or s.joins or len(s.items) != 1:
            raise ValueError(
                "a correlated scalar subquery item must SELECT one "
                "aggregate from one table (no GROUP BY / JOIN / UNION)")
        if not it.alias:
            raise ValueError("a correlated scalar subquery item needs "
                             "AS alias")
        inner_key, outer_key, build_preds = split
        agg_item = s.items[0]
        kcol, vcol = f"_ck_{it.alias}", f"_cv_{it.alias}"
        build_plan = _Plan(
            table=s.table,
            items=[_Agg("col", inner_key, alias=kcol),
                   dataclasses.replace(agg_item, alias=vcol)],
            where=list(build_preds), group_by=[inner_key])
        if explain is not None:
            explain.append(
                f"CORRELATED ITEM {it.alias} -> grouped build SELECT "
                f"{inner_key}, {agg_item.fn or 'expr'} FROM {s.table} "
                f"GROUP BY {inner_key} materialized ONCE (overlay "
                "spool), LEFT-joined on the correlation key"
                + ("; COUNT wraps in COALESCE(v, 0)"
                   if agg_item.fn == "count" else ""))
        out = run_sql("", overlay, _plan=build_plan,
                      **{**opts, "explain": None})
        # group keys are unique, so the alias-keyed group output needs a
        # rename only if the route kept the alias — it does (item alias)
        spool = os.path.join(overlay, f"_corrq{j}.parquet")
        out.write_parquet(spool)
        import glob as _glob
        if not _glob.glob(os.path.join(spool, "*.parquet")):
            # EMPTY build (the correlated filter matched nothing): pin a
            # typed zero-row part — key type from parquet, value type
            # from the aggregate family (COUNT int64, else float64 is a
            # safe null carrier: the LEFT join null-pads every row)
            import dataclasses as _dc
            import pyarrow.parquet as _pq
            ktype = dict(zip(
                (s2 := _table_schema(
                    f"{sf_dir}/{s.table}.parquet")).names,
                s2.types))[inner_key]
            vtype = (pa.int64() if agg_item.fn == "count"
                     else pa.float64())
            os.makedirs(spool, exist_ok=True)
            _pq.write_table(
                pa.table({kcol: pa.array([], type=ktype),
                          vcol: pa.array([], type=vtype)}),
                os.path.join(spool, "empty.parquet"))
        plan.joins.append((f"_corrq{j}", outer_key, kcol, "left"))
        if agg_item.fn == "count":
            it.fn, it.col = "expr", None
            it.expr = ("fn", "coalesce", (("col", vcol), ("lit", 0)))
        else:
            it.fn, it.col, it.expr = "col", vcol, None
    return overlay


def _resolve_scalar_subqueries(plan: "_Plan", sf_dir: str, opts: dict,
                               explain: list | None) -> None:
    """Execute every uncorrelated scalar subquery appearing in WHERE /
    HAVING / FILTER predicates or in an expression item, and substitute
    its value as a literal (SQL's logical order: the subquery is a
    constant for the outer query). Each subquery is an ungrouped
    aggregate plan — its full pipeline streams on the cluster and exactly
    ONE scalar crosses to the driver."""
    def repl(sub: "_Plan"):
        if len(sub.items) != 1:
            raise ValueError("scalar subquery must SELECT exactly one "
                             "item")
        if sub.group_by or sub.unions:
            raise ValueError("scalar subquery must return one row "
                             "(no GROUP BY / UNION)")
        if explain is not None:
            explain.append(
                f"SCALAR SUBQUERY ({sub.items[0].name} FROM {sub.table})"
                " -> executes FIRST as its own streaming plan; one "
                "scalar crosses the driver and substitutes as a literal:")
            run_sql("", sf_dir, _plan=sub, explain=explain, **opts)
            # placeholder literal — explain mode never evaluates kernels,
            # so the self-describing string only shows up in the trace
            return ("lit", "(scalar subquery value)")
        rows = run_sql("", sf_dir, _plan=sub, **opts).take_all()
        if len(rows) != 1:
            raise ValueError(f"scalar subquery returned {len(rows)} rows "
                             "(want exactly 1)")
        return ("lit", rows[0][sub.items[0].name])

    plan.where = [_map_pred_subq(p, repl) for p in plan.where]
    plan.having = [_map_pred_subq(p, repl) for p in plan.having]
    for it in plan.items:
        if it.filter_pred:
            it.filter_pred = [_map_pred_subq(p, repl)
                              for p in it.filter_pred]
        if it.expr is not None:
            it.expr = _map_expr_subq(it.expr, repl)


#: broadcast-enrich byte budget: the dim table rides serialized into every
#: task, so gate on its compressed parquet footprint (metadata-only), not
#: row count alone — 1M wide rows and 1M narrow keys are different beasts
_MAX_BROADCAST_BYTES = 128 << 20


def _parquet_col_bytes(md, cols) -> int:
    """Compressed on-disk bytes of ``cols``, from parquet METADATA only
    (no data pages touched) — the broadcast gate's byte estimate."""
    want = set(cols)
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            if c.path_in_schema.split(".")[0] in want:
                total += c.total_compressed_size
    return total


def _table_parts(path: str) -> list:
    """``{sf_dir}/{table}.parquet`` may be a single file (the driver
    tables) or a DIRECTORY of parquet parts (a CTE materialized by
    ``write_parquet``). Return the part file paths — metadata/schema
    reads iterate these, ray.data.read_parquet takes ``path`` as-is."""
    import glob
    import os

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise ValueError(f"no parquet parts under {path}")
        return parts
    return [path]


def _table_schema(path: str):
    """Arrow schema of a parquet file or part-directory (metadata-only)."""
    import pyarrow.parquet as pq

    return pq.read_schema(_table_parts(path)[0])


def _table_meta(path: str) -> list:
    """FileMetaData per part — callers sum num_rows / column bytes."""
    import pyarrow.parquet as pq

    return [pq.read_metadata(p) for p in _table_parts(path)]


def _first_row_group_unique(path: str, key: str) -> bool:
    """Cheap duplicate-join-key rejector: read ONE row group's key column
    (never the whole table). False PROVES duplicates — skip the broadcast
    attempt without any driver-side table read (the Q3/Q10 orders/lineitem
    case). True only admits the attempt; the authoritative uniqueness
    check runs on the table that is actually read for broadcasting."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(_table_parts(path)[0])
    if pf.metadata.num_row_groups == 0:
        return True
    arr = pf.read_row_group(0, columns=[key])[key]
    return pc.count_distinct(arr).as_py() == len(arr)


def _scan_with_joins(plan: "_Plan", sf_dir: str, needed: set, *,
                     join_buckets: int, max_broadcast_rows: int,
                     approx_membership: bool, bloom_capacity: int,
                     bloom_fpp: float, explain: list | None,
                     sub: tuple | None = None,
                     needed_post: set | None = None):
    """Shared scan phase: pruned fact read -> owner-routed pushed-down
    vectorized filters (each single-table WHERE conjunct filters at its
    owning table's read, BELOW the join shuffle) -> JOIN chain
    (metadata-gated broadcast enrich or bucketed hash_join) ->
    multi-table post filters -> membership semi/anti joins. Used by both
    the aggregate route (run_sql) and the window route. ``sub`` = (inner
    Dataset, its column names) when the fact "table" is a derived table —
    the inner plan's streaming output replaces the parquet read,
    everything downstream is identical. ``needed_post`` = the columns the
    caller still needs AFTER the scan; when given, filter-only columns
    are projected away before any join shuffle.
    Returns (lazy Dataset, schemas, per_table)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    tables = [plan.table] + [j[0] for j in plan.joins]
    pa_schemas = {t: _table_schema(f"{sf_dir}/{t}.parquet")
                  for t in tables if sub is None or t != plan.table}
    schema_lists = {t: s.names for t, s in pa_schemas.items()}
    if sub is not None:
        schema_lists[plan.table] = list(sub[1])
    schemas = {t: set(v) for t, v in schema_lists.items()}
    # column -> pyarrow type, from parquet METADATA (column names are
    # unique across tables by router contract). Threaded into every
    # hash_join/semi_anti_join as the known schema: Dataset.schema() on a
    # lazy shuffle output EXECUTES the upstream plan at build time and
    # re-runs it on consumption — a chained join would pay every upstream
    # shuffle twice. With a derived-table fact (sub) the fact types are
    # unknown -> that side falls back to .schema() as before.
    col_type: dict = {}
    for s in pa_schemas.values():
        col_type.update(zip(s.names, s.types))

    def _known_schema(cols):
        import pyarrow as pa
        if any(c not in col_type for c in cols):
            return None
        return pa.schema([(c, col_type[c]) for c in cols])

    def owner(col: str) -> str:
        hits = [t for t in tables if col in schemas[t]]
        if not hits:
            raise ValueError(f"unknown column {col!r} (tables: {tables})")
        if len(hits) > 1:
            raise ValueError(f"ambiguous column {col!r} (in {hits}); "
                             "router requires unique column names")
        return hits[0]

    needed = set(needed)
    # ON-clause conjunct columns must be read (dim-owned ones filter at
    # the read; cross-table ones post-filter after the join)
    for _ps in plan.join_preds.values():
        needed |= _pred_cols(_ps)
    # decorrelated comparisons consume their outer columns INSIDE the
    # scan (join on outer_key + vectorized filter over outer_expr), so
    # the reads and the pre-shuffle projection must carry them
    corr_cols = set()
    for cp in plan.corr_where:
        corr_cols |= _expr_cols(cp.outer_expr)
        corr_cols.add(cp.outer_key)
    needed |= corr_cols
    if not needed:
        # a COUNT(*)-only scan still needs one physical column to stream;
        # the file's first field is typically a narrow key
        needed.add(schema_lists[plan.table][0])
    per_table = {t: sorted(c for c in needed if owner(c) == t)
                 for t in tables}
    if sub is not None:
        if explain is not None:
            explain.append(f"FROM (subquery) AS {plan.table}: derived "
                           f"table streams block-wise into the outer "
                           f"plan, pruned to {per_table[plan.table]}")
            for t in tables[1:]:
                explain.append(f"READ {t}: pruned columns={per_table[t]}")
            ds = sub[0]
        elif set(per_table[plan.table]) < set(schema_lists[plan.table]):
            ds = sub[0].select_columns(per_table[plan.table])
        else:
            ds = sub[0]
    else:
        if explain is not None:
            for t in tables:
                explain.append(f"READ {t}: pruned columns={per_table[t]}")
        ds = rd.read_parquet(f"{sf_dir}/{plan.table}.parquet",
                             columns=per_table[plan.table])
    cur_cols = list(per_table[plan.table])   # ds's columns, tracked lazily

    # ------------------------- WHERE: owner-routed predicate pushdown
    # every single-table conjunct filters at its OWNING table's read,
    # below the join shuffle: always valid for the fact table, and for a
    # dim side when its join is INNER (a WHERE pred on the null-supplying
    # side of a LEFT join must stay post-join — it would change the
    # preserved row set, standard SQL). Conjuncts spanning tables run
    # after the joins attach their columns.
    scalar = [p for p in plan.where if p.sub is None]
    member = [p for p in plan.where if p.sub is not None]
    inner_dims = {j[0] for j in plan.joins if j[3] == "inner"}
    # RIGHT/FULL joins make the FACT side null-suppliable: a fact-owned
    # WHERE conjunct pushed below the join would turn removed fact rows
    # into null-padded preserved rows the post-WHERE never sees — so with
    # any such join every filter stays post-join (correctness over the
    # pushdown win; these are corner-case shapes)
    fact_preserved = all(j[3] in ("inner", "left", "cross")
                         for j in plan.joins)
    if not fact_preserved and (member or plan.corr_where):
        raise ValueError("IN (SELECT …) / correlated subqueries do not "
                         "combine with RIGHT/FULL joins (the early probe "
                         "would change the preserved row set)")
    push, post, dim_push = [], [], {}
    for p in scalar:
        cols = _pred_cols([p])
        if not fact_preserved:
            post.append(p)
            continue
        if cols <= schemas[plan.table]:
            push.append(p)
            continue
        owners = {owner(c) for c in cols}
        if len(owners) == 1 and (t := next(iter(owners))) in inner_dims:
            dim_push.setdefault(t, []).append(p)
        else:
            post.append(p)
    # columns that must survive the scan: everything the caller needs
    # downstream, the join keys, post-join predicate columns, and
    # membership probe columns — filter-only columns drop before any
    # shuffle so they never pay join/exchange bytes
    keep = None
    if needed_post is not None:
        keep = set(needed_post) | _pred_cols(post) | corr_cols
        keep.update(p.col for p in member)
        for _tbl, _a, _b, _how in plan.joins:
            keep.update(c for c in (_a, _b) if c)
        for _ps in plan.join_preds.values():
            # ON-clause conjunct columns: dim-owned ones filter at the
            # read, but cross-table ones post-filter AFTER the join —
            # either way they must survive the pre-shuffle projection
            keep.update(_pred_cols(_ps))
    if push:
        if explain is not None:
            explain.append(
                f"FILTER (pushed below joins): {_fmt_preds(push)} -> one "
                "vectorized pyarrow.compute filter on the fact read")
        else:
            ds = ds.map_batches(_scalar_filter_fn(push),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
    if keep is not None:
        slim = [c for c in per_table[plan.table] if c in keep]
        if slim and slim != per_table[plan.table]:
            if explain is not None:
                explain.append(
                    f"PROJECT fact -> {slim} (filter-only columns "
                    "dropped before the join shuffle)")
            else:
                ds = ds.select_columns(slim)
            per_table[plan.table] = slim
            cur_cols = list(slim)

    # -------------------------------------------------- JOINs (in order)
    attached = set(per_table[plan.table])
    # join-key equivalences: a broadcast enrich attaches the dim's payload
    # but not its key column (it equals the fact key on every surviving
    # row) — later stages referencing the dim key use the fact equivalent
    key_eq: dict = {}
    # membership key sets that reached the driver (broadcast probes):
    # {probe_col: (keys_arrow_array_or_None, anti)} — a LATER join whose
    # fact-side key equals a probed column pre-filters its DIM read with
    # the same key set (a dim row whose key the probe removed from the
    # fact can never match), shrinking the broadcast/hash-join build side
    member_keys: dict[str, tuple] = {}

    def _apply_membership(ds, p):
        """One membership semi/anti join (or Bloom probe), applied at the
        earliest chain position where the probe column exists — an
        AND-conjunct row filter commutes with the remaining inner/left
        joins, so probing early shrinks every later join's input."""
        sub_table, sub_col, sub_preds, sub_having = p.sub
        kind = "ANTI" if p.op == "not_in" else "SEMI"
        filt_note = (f" [build WHERE {_fmt_preds(sub_preds)} -> "
                     "vectorized filter on the pruned build read]"
                     if sub_preds else "")
        build_cols = sorted({sub_col} | _pred_cols(sub_preds))

        if sub_having:
            # grouped membership build (TPC-H Q18 shape): the build side
            # is a full nested aggregate plan — pruned read, map-side
            # combine, HAVING filter — whose surviving group keys feed
            # the probe; the outer stream never joins the raw sub table
            build_plan = _Plan(table=sub_table,
                               items=[_Agg(fn="col", col=sub_col,
                                           alias=sub_col)],
                               where=list(sub_preds),
                               group_by=[sub_col],
                               having=list(sub_having))
            _lift_having_aggs(build_plan)
            filt_note = (f" [grouped build: GROUP BY {sub_col} HAVING "
                         f"{_fmt_preds(sub_having)} runs as a nested "
                         "aggregate plan; only surviving keys probe]")
            _nested_opts = dict(join_buckets=join_buckets,
                                max_broadcast_rows=max_broadcast_rows,
                                approx_membership=approx_membership,
                                bloom_capacity=bloom_capacity,
                                bloom_fpp=bloom_fpp)

            def _build(_bp=build_plan, _no=_nested_opts):
                return run_sql("", sf_dir, _plan=_bp, **_no)
        else:
            def _build():
                b = rd.read_parquet(f"{sf_dir}/{sub_table}.parquet",
                                    columns=build_cols)
                if sub_preds:
                    b = b.map_batches(_scalar_filter_fn(sub_preds),
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
                return b.select_columns([sub_col]) if sub_preds else b

        if approx_membership:
            if explain is not None:
                explain.append(
                    f"MEMBERSHIP {p.col} {kind} {sub_table}.{sub_col}"
                    f"{filt_note} -> Bloom probe (filter built once + "
                    f"broadcast to an actor pool, NO shuffle; "
                    f"fpp<={bloom_fpp}, zero false negatives)")
                if sub_having:
                    run_sql("", sf_dir, _plan=build_plan,
                            explain=explain, **_nested_opts)
                return ds
            if p.op == "not_in":
                from .query import anti_join_bloom as _bloom_join
            else:
                from .query import semi_join_bloom as _bloom_join
            pcol = (p.col if p.col in cur_cols
                    else key_eq.get(p.col, p.col))
            ds = _bloom_join(ds, _build(), pcol, sub_col,
                             capacity=bloom_capacity, fpp=bloom_fpp)
        else:
            if explain is not None:
                explain.append(
                    f"MEMBERSHIP {p.col} {kind} {sub_table}.{sub_col}"
                    f"{filt_note} -> exact bucketed semi/anti join "
                    "(build side collapses to per-bucket distinct keys; "
                    "key-only shuffle)")
                if sub_having:
                    # the grouped build's key set may broadcast at run
                    # time — record the probe column so later joins can
                    # note the dim pre-filter in the trace
                    member_keys[p.col] = (None, p.op == "not_in")
                    run_sql("", sf_dir, _plan=build_plan,
                            explain=explain, **_nested_opts)
                return ds
            from .join import semi_anti_join

            import pyarrow as pa
            if sub_having:
                # the grouped build is group-count-sized; materialize it
                # so the schema probe and the join consume one execution,
                # and take the key type from the build's actual output
                bds = _build().materialize()
                if bds.count() <= max_broadcast_rows:
                    # small surviving-key set (the TPC-H Q18 case): pull
                    # the ONE narrow key column to the driver and filter
                    # the probe stream with a vectorized pc.is_in — NO
                    # probe-side shuffle at all. Exactly the broadcast
                    # gate the enrich join uses; at 100 TB the probe
                    # stream is the big side, so skipping its bucket
                    # exchange is the win. Null build keys never match
                    # (SQL IN); null probe keys are kept for NOT IN
                    # (documented NOT EXISTS semantics).
                    import ray as _ray
                    ktabs = [t for t in _ray.get(
                        bds.select_columns([sub_col]).to_arrow_refs())
                        if t.num_rows]       # drop schemaless empties
                    ktype = dict(zip((bs := bds.schema()).names,
                                     bs.types))[sub_col]
                    keys = (pa.concat_tables(ktabs)[sub_col]
                            if ktabs else pa.chunked_array([], ktype))
                    keys = pc.drop_null(keys.combine_chunks())
                    pcol = (p.col if p.col in cur_cols
                            else key_eq.get(p.col, p.col))
                    anti = p.op == "not_in"

                    def _bcast_probe(b: pa.Table, _k=keys, _c=pcol,
                                     _anti=anti) -> pa.Table:
                        m = pc.fill_null(
                            pc.is_in(b[_c], value_set=_k), False)
                        if _anti:
                            m = pc.or_(pc.invert(m), pc.is_null(b[_c]))
                        else:
                            m = pc.and_(m, pc.is_valid(b[_c]))
                        return b.filter(m)

                    member_keys[p.col] = member_keys[pcol] = (keys, anti)
                    return ds.map_batches(_bcast_probe,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)
                rschema = pa.schema(
                    [(sub_col, dict(zip((bs := bds.schema()).names,
                                        bs.types))[sub_col])])
            else:
                bds = _build()
                sub_type = dict(zip(
                    (s := _table_schema(
                        f"{sf_dir}/{sub_table}.parquet")).names,
                    s.types))[sub_col]
                rschema = pa.schema([(sub_col, sub_type)])
            pcol = (p.col if p.col in cur_cols
                    else key_eq.get(p.col, p.col))
            ds = semi_anti_join(ds, bds, pcol, sub_col,
                                how="anti" if p.op == "not_in" else "semi",
                                buckets=join_buckets,
                                left_schema=_known_schema(cur_cols),
                                right_schema=rschema)
        return ds

    member_left = list(member)

    def _apply_ready_members(ds):
        """Apply every not-yet-applied membership whose probe column is
        attached (directly, or via an inner-join key equivalence)."""
        avail = set(cur_cols)
        for p in list(member_left):
            if p.col in avail or key_eq.get(p.col) in avail:
                member_left.remove(p)
                ds = _apply_membership(ds, p)
        return ds


    ds = _apply_ready_members(ds)   # fact-owned probe columns

    for tbl, a, b, how in plan.joins:
        ds = _apply_ready_members(ds)  # probes readied by the previous join
        if how == "cross":
            # CROSS JOIN: size-gated broadcast cartesian — the dim reads
            # once on the driver (pruned + pre-filtered) and every batch
            # expands n×m via two vectorized takes. A cross join against
            # a LARGE side is quadratic by definition; refuse loudly past
            # the broadcast budget instead of shuffling a cartesian.
            want_x = set(per_table[tbl])
            if keep is not None:
                want_x &= keep
            x_preds = dim_push.get(tbl, [])
            x_keep = sorted(want_x)
            x_read = sorted(set(x_keep) | _pred_cols(x_preds))
            if not x_read:
                x_read = [schema_lists[tbl][0]]
                x_keep = []
            x_path = f"{sf_dir}/{tbl}.parquet"
            n_x = sum(m.num_rows for m in _table_meta(x_path))
            if n_x > max_broadcast_rows:
                raise ValueError(
                    f"CROSS JOIN {tbl}: {n_x} rows exceed the broadcast "
                    f"budget ({max_broadcast_rows}); an unbounded "
                    "cartesian cannot stream — filter the side first")
            if explain is not None:
                explain.append(
                    f"CROSS JOIN {tbl} ({n_x} rows) -> broadcast "
                    "cartesian: per-batch n×m expansion via two "
                    "vectorized takes, ZERO shuffle"
                    + (f" [WHERE {_fmt_preds(x_preds)} -> filter on the "
                       "pruned read]" if x_preds else ""))
            else:
                import numpy as np
                import pyarrow as pa    # pa is a branch-local name in
                #                         this function's other paths
                x_tbl = pq.read_table(x_path, columns=x_read)
                if x_preds:
                    x_tbl = x_tbl.filter(_pred_mask(x_tbl, x_preds))
                if x_keep:
                    x_tbl = x_tbl.select(x_keep)

                    def _cross(bt: pa.Table, _x=x_tbl) -> pa.Table:
                        n, m = bt.num_rows, _x.num_rows
                        lt = bt.take(pa.array(
                            np.repeat(np.arange(n, dtype=np.int64), m)))
                        rt = _x.take(pa.array(
                            np.tile(np.arange(m, dtype=np.int64), n)))
                        for name in rt.schema.names:
                            lt = lt.append_column(name, rt[name])
                        return lt
                else:
                    # no dim column survives the projection (COUNT(*)
                    # over a cross join): just replicate each row m times
                    m_const = x_tbl.num_rows

                    def _cross(bt: pa.Table, _m=m_const) -> pa.Table:
                        return bt.take(pa.array(np.repeat(
                            np.arange(bt.num_rows, dtype=np.int64), _m)))

                ds = ds.map_batches(_cross, batch_format="pyarrow",
                                    zero_copy_batch=True)
            attached.update(x_keep)
            cur_cols += x_keep
            continue
        if b in schemas[tbl] and a in attached:
            left_key, right_key = a, b
        elif a in schemas[tbl] and b in attached:
            left_key, right_key = b, a
        else:
            raise ValueError(
                f"JOIN {tbl} ON {a} = {b}: one side must be a column of "
                f"{tbl!r}, the other a column already attached")
        tbl_preds = list(dim_push.get(tbl, []))
        on_preds = plan.join_preds.get(tbl, [])
        if on_preds:
            if how in ("right", "outer"):
                raise ValueError(
                    f"ON-clause predicates on a {how.upper()}-preserved "
                    "side are not supported (failing rows must stay as "
                    "unmatched output, not be filtered)")
            bad_on = [p for p in on_preds
                      if not _pred_cols([p]) <= schemas[tbl]]
            if bad_on and how == "inner":
                # a cross-table ON conjunct on an INNER join is exactly a
                # post-join WHERE (no preserved side to protect) — e.g. a
                # secondary equality of a multi-key equi-join refines the
                # primary-key buckets after the merge
                post.extend(bad_on)
                on_preds = [p for p in on_preds if p not in bad_on]
            elif bad_on:
                raise ValueError(
                    f"ON-clause predicates on a LEFT join must reference "
                    f"only columns of the joined table {tbl!r} (a cross-"
                    f"table conjunct would change which rows match, not "
                    f"filter them), got {_fmt_preds(bad_on)}")
            # ON semantics for INNER/LEFT: the conjunct restricts which
            # dim rows can MATCH — a vectorized filter on the dim read,
            # below the join; the preserved fact side is untouched
            tbl_preds += on_preds
        want = set(per_table[tbl])
        if keep is not None:
            want &= keep
        dim_keep = sorted(want | {right_key})
        read_cols = sorted(set(dim_keep) | _pred_cols(tbl_preds))
        dim_path = f"{sf_dir}/{tbl}.parquet"
        out_cols = [c for c in dim_keep if c != right_key]
        mds = _table_meta(dim_path)
        n_dim = sum(m.num_rows for m in mds)
        est_bytes = sum(_parquet_col_bytes(m, read_cols) for m in mds)
        pred_note = (f" [WHERE {_fmt_preds(tbl_preds)} -> vectorized "
                     "filter on the pruned dim read, BELOW the join]"
                     if tbl_preds else "")
        # a membership probe already removed fact rows whose key is
        # outside (SEMI) / inside (ANTI) its key set — a dim row with
        # such a key can never match this join, so when the key set
        # reached the driver the dim read pre-filters with the SAME
        # vectorized is_in (Q18: lineitem shrinks to the surviving
        # orders' rows before it is broadcast)
        mk = member_keys.get(left_key) or member_keys.get(
            key_eq.get(left_key, ""))
        if mk is not None and mk[0] is not None and explain is None:
            _mkeys, _manti = mk

            def _dim_member_mask(t: pa.Table):
                m = pc.fill_null(
                    pc.is_in(t[right_key], value_set=_mkeys), False)
                return pc.invert(m) if _manti else m
        else:
            _dim_member_mask = None
        if _dim_member_mask is not None:
            pred_note += (" [dim read pre-filtered by the membership "
                          "key set]")
        elif mk is not None and explain is not None:
            pred_note += (" [dim read pre-filters by the membership "
                          "key set when it broadcasts]")
        if how in ("right", "outer"):
            # the broadcast fast paths preserve only the STREAM side;
            # a RIGHT/FULL join must also emit unmatched dim rows, which
            # only the bucketed merge (pandas how=right/outer) produces
            reason = (f"{how.upper()} JOIN preserves the {tbl} side — "
                      "bucketed merge required")
        elif n_dim > max_broadcast_rows:
            reason = (f"{n_dim} rows > max_broadcast_rows="
                      f"{max_broadcast_rows}")
        elif est_bytes > _MAX_BROADCAST_BYTES:
            reason = (f"~{est_bytes >> 20} MiB compressed > broadcast "
                      f"byte budget {_MAX_BROADCAST_BYTES >> 20} MiB")
        else:
            # within the broadcast budget → the dim crosses the driver
            # EXACTLY once and is always broadcast (the read is never
            # thrown away): unique keys -> index_in enrich; duplicate
            # keys -> pandas-merge expand join. Either way ZERO shuffle.
            if explain is None:
                dim_tbl = pq.read_table(dim_path, columns=read_cols)
                if tbl_preds:
                    dim_tbl = dim_tbl.filter(
                        _pred_mask(dim_tbl, tbl_preds)).select(dim_keep)
                if _dim_member_mask is not None:
                    dim_tbl = dim_tbl.filter(_dim_member_mask(dim_tbl))
                key_arr = dim_tbl[right_key]
                unique = (pc.count_distinct(key_arr).as_py()
                          == len(key_arr))
            else:
                # metadata-cheap hint for the trace: one row group's key
                # column, never the whole table
                unique = _first_row_group_unique(dim_path, right_key)
            if unique:
                if explain is not None:
                    explain.append(
                        f"{how.upper()} JOIN {tbl} ON {left_key} = "
                        f"{right_key} -> BROADCAST enrich ({n_dim} rows, "
                        f"~{max(est_bytes >> 10, 1)} KiB compressed, "
                        "unique key)"
                        f"{pred_note}: pc.index_in lookup inside "
                        "map_batches, ZERO shuffle"
                        + ("; unmatched fact rows keep null dim columns"
                           if how == "left" else ""))
                else:
                    ds = _broadcast_enrich(ds, dim_tbl, left_key,
                                           right_key, out_cols, how=how)
                attached.update(out_cols)
                cur_cols += out_cols
                if how == "inner":
                    # valid only for INNER: a LEFT enrich leaves the dim
                    # key NULL on unmatched rows, not equal to the fact key
                    key_eq[right_key] = left_key
                continue
            from .join import broadcast_expand_join

            if explain is not None:
                explain.append(
                    f"{how.upper()} JOIN {tbl} ON {left_key} = "
                    f"{right_key} -> BROADCAST expand join ({n_dim} rows, "
                    f"~{max(est_bytes >> 10, 1)} KiB compressed, "
                    "duplicate keys: 1:N)"
                    f"{pred_note}: per-batch pandas merge against the "
                    "broadcast dim, ZERO shuffle"
                    + ("; unmatched fact rows keep null dim columns"
                       if how == "left" else ""))
            else:
                ds = broadcast_expand_join(ds, dim_tbl, left_key,
                                           right_key, how=how)
            attached.update(dim_keep)
            cur_cols += dim_keep
            if how != "inner":
                import pyarrow as pa
                for c in dim_keep:
                    t = col_type.get(c)
                    if t is not None and pa.types.is_integer(t):
                        col_type[c] = pa.int64()
            continue
        # both sides large → bucketed hash join (1 shuffle)
        from .join import hash_join

        if explain is not None:
            explain.append(
                f"{how.upper()} JOIN {tbl} ON {left_key} = {right_key} -> "
                f"bucketed HASH JOIN ({reason}){pred_note}: one shuffle, "
                f"{join_buckets} buckets")
        else:
            dim_ds = rd.read_parquet(dim_path, columns=read_cols)
            if tbl_preds:
                dim_ds = dim_ds.map_batches(
                    _scalar_filter_fn(tbl_preds),
                    batch_format="pyarrow", zero_copy_batch=True)
            if _dim_member_mask is not None:
                dim_ds = dim_ds.map_batches(
                    lambda t, _f=_dim_member_mask: t.filter(_f(t)),
                    batch_format="pyarrow", zero_copy_batch=True)
            if read_cols != dim_keep:
                dim_ds = dim_ds.select_columns(dim_keep)
            ds = hash_join(ds, dim_ds, left_key, right_key,
                           buckets=join_buckets, how=how,
                           left_schema=_known_schema(cur_cols),
                           right_schema=_known_schema(dim_keep))
        attached.update(dim_keep)
        cur_cols += dim_keep                  # merge output = lcols + rcols
        if how != "inner":
            # the bucket merge null-pads the unpreserved side; its int
            # columns come back as int64 (nullable-ext -> arrow int64),
            # so keep the tracked types honest for the NEXT join's padding
            import pyarrow as pa
            for c in cur_cols:
                t = col_type.get(c)
                if t is not None and pa.types.is_integer(t):
                    col_type[c] = pa.int64()
    ds = _apply_ready_members(ds)      # probes readied by the last join
    if post:
        if explain is not None:
            explain.append(
                f"FILTER (after joins, dim-attached cols): "
                f"{_fmt_preds(post)}")
        else:
            ds = ds.map_batches(_scalar_filter_fn(post),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
    for p in member_left:
        # leftovers whose probe column never attached: apply at the end
        # (same loud failure mode as before the early-probe rewrite)
        ds = _apply_membership(ds, p)
    member_left = []

    # -------------------- decorrelated scalar-subquery comparisons
    # each _CorrPred: grouped-aggregate build over the sub table (its own
    # streaming run_sql plan — pruned read, map-side combine) -> join the
    # outer stream on the correlation key (broadcast enrich when the sub
    # table fits the budget, bucketed hash join otherwise; build keys are
    # unique by construction) -> ONE vectorized comparison filter ->
    # helper columns dropped
    for ci, cp in enumerate(plan.corr_where):
        import dataclasses

        okey = cp.outer_key
        seen = set()
        while okey not in cur_cols and okey in key_eq and okey not in seen:
            seen.add(okey)
            okey = key_eq[okey]       # broadcast enrich drops dim keys;
        if okey not in cur_cols:      # use the fact-side equivalent
            raise ValueError(
                f"correlated subquery outer key {cp.outer_key!r} is not "
                "available on the scanned stream")
        ck, cv = f"_ck{ci}", f"_cv{ci}"
        key_item = _Agg(fn="col", col=cp.inner_key, alias=ck)
        agg_item = dataclasses.replace(cp.agg_item, alias=cv)
        build_plan = _Plan(table=cp.sub_table,
                           items=[key_item, agg_item],
                           where=list(cp.build_preds),
                           group_by=[cp.inner_key])
        build_opts = dict(join_buckets=join_buckets,
                          max_broadcast_rows=max_broadcast_rows,
                          approx_membership=approx_membership,
                          bloom_capacity=bloom_capacity,
                          bloom_fpp=bloom_fpp)
        cmp_pred = _Pred("", cp.op, lexpr=cp.outer_expr,
                         rexpr=("col", cv))
        mds = _table_meta(f"{sf_dir}/{cp.sub_table}.parquet")
        small = (sum(m.num_rows for m in mds) <= max_broadcast_rows
                 and sum(_parquet_col_bytes(m, [cp.inner_key])
                         for m in mds)
                 * 3 <= _MAX_BROADCAST_BYTES)
        if explain is not None:
            explain.append(
                f"CORRELATED SUBQUERY ({agg_item.fn or 'expr'} FROM "
                f"{cp.sub_table} per {cp.inner_key}) -> decorrelated: "
                "grouped-aggregate build below, then "
                + (f"BROADCAST enrich on {cp.outer_key} (unique build "
                   "keys, zero shuffle)" if small else
                   f"bucketed HASH JOIN on {cp.outer_key} (one shuffle)")
                + f", then one vectorized filter "
                  f"{_fmt_preds([cmp_pred])}:")
            run_sql("", sf_dir, _plan=build_plan, explain=explain,
                    **build_opts)
            continue
        build_ds = run_sql("", sf_dir, _plan=build_plan, **build_opts)
        base_cols = list(cur_cols)
        if small:
            # the build is one row per correlation key — it crosses the
            # driver once, like any broadcast dim
            bdf = build_ds.to_pandas()
            import pyarrow as pa
            build_tbl = pa.Table.from_pandas(bdf, preserve_index=False)
            ds = _broadcast_enrich(ds, build_tbl, okey, ck,
                                   [cv], how="inner")
        else:
            from .join import hash_join

            # materialize() pins the (group-count-sized) build so the
            # schema probe and the join consume one execution
            build_ds = build_ds.materialize()
            ds = hash_join(ds, build_ds, okey, ck,
                           buckets=join_buckets,
                           left_schema=_known_schema(cur_cols))
        ds = ds.map_batches(_scalar_filter_fn([cmp_pred]),
                            batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.select_columns(base_cols)

    # -------------- re-attach SELECTed dim join keys dropped by enrich
    # a broadcast INNER enrich attaches the dim payload but not the dim
    # key (it equals the fact key on every surviving row); if the caller
    # still needs the dim key by name, alias-copy its fact equivalent —
    # one zero-copy append, no data pass
    want_back = needed_post if needed_post is not None else needed
    back_pairs = []
    for c in sorted(want_back):
        if c in cur_cols or c not in key_eq:
            continue
        src, seen = c, set()
        while src not in cur_cols and src in key_eq and src not in seen:
            seen.add(src)
            src = key_eq[src]
        if src in cur_cols:
            back_pairs.append((c, src))
    if back_pairs:
        if explain is not None:
            explain.append(
                "RESTORE dim join keys "
                f"{[f'{c} := {s}' for c, s in back_pairs]} (dropped by "
                "the broadcast enrich; zero-copy alias of the fact key)")
        else:
            def _restore(b: pa.Table, _pairs=tuple(back_pairs)) -> pa.Table:
                for name, src_col in _pairs:
                    b = b.append_column(name, b[src_col])
                return b

            ds = ds.map_batches(_restore, batch_format="pyarrow",
                                zero_copy_batch=True)
        cur_cols += [c for c, _ in back_pairs]

    return ds, schemas, per_table


def _zero_like(t):
    """A type-correct fill scalar for null group keys (the paired is-null
    bit disambiguates it from real zeros/empties); None = unsupported
    type, the key passes through unwrapped (pre-wrap crash behavior)."""
    try:
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.scalar("", type=t)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return pa.scalar(b"", type=t)
        if (pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_boolean(t) or pa.types.is_timestamp(t)
                or pa.types.is_date(t) or pa.types.is_time(t)
                or pa.types.is_decimal(t)):
            return pa.scalar(0, type=t)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, OverflowError,
            ValueError, TypeError):
        pass
    return None


def _sort_with_nulls(out, order_by: list, order_nulls: dict,
                     rename: dict | None = None, limit: int | None = None):
    """Global Dataset sort honoring explicit NULLS FIRST/LAST.

    Ray Data's sort (Arrow sort_indices) places nulls at the end in either
    direction — DuckDB's default — so when no explicit placement was
    written this is a plain ``ds.sort``. An explicit placement adds a
    derived is-null sentinel key IN FRONT of that column (int8, one
    vectorized kernel; also makes the range-partitioned shuffle of null
    rows deterministic), sorts on the widened key list, and drops the
    sentinels. ``rename`` maps ORDER BY names to physical columns (the
    plain-scan route sorts before its alias projection).

    ``limit``: TOP-K PUSHDOWN — when the caller follows this sort with
    ``.limit(n)``, pass n and every block pre-truncates to its local
    top-n first (one vectorized pc.sort_indices + take per block, same
    comparator incl. the null sentinels), so the global sort shuffles
    blocks×n rows instead of every row. The global top-n is a subset of
    the union of per-block top-n, so the result is identical; at 100 TB
    this turns an all-rows exchange into a KiB-scale one."""
    rename = rename or {}
    keys: list[str] = []
    desc: list[bool] = []
    helpers: list[tuple[str, str, str]] = []
    for c, d in order_by:
        phys = rename.get(c, c)
        # EVERY key sorts as a (is-null sentinel, null-FILLED value)
        # pair — no raw null ever reaches Ray's range-partition sampler,
        # whose sampled boundaries crash numpy searchsorted on None
        # (deterministically so when a key column is all-null). Default
        # placement is nulls-LAST in both directions (DuckDB's
        # default_null_order), which the sentinel reproduces exactly.
        place = order_nulls.get(c, "last")
        h, v = f"_nulls_{phys}", f"_nsv_{phys}"
        helpers.append((h, phys, v))
        keys.append(h)
        # is_null=1 first ⇒ sort the sentinel DESCENDING
        desc.append(place == "first")
        keys.append(v)
        desc.append(d)
    if helpers:
        def _add(b: pa.Table, _h=tuple(helpers)) -> pa.Table:
            for name, src, val in _h:
                col = b[src]
                b = b.append_column(
                    name, pc.cast(pc.is_null(col), pa.int8()))
                if pa.types.is_null(col.type):
                    # an ALL-null column may surface as Arrow null type
                    # (e.g. out of a pandas window stage): every row is
                    # in the sentinel=1 group, so the value key is a
                    # constant typed zero
                    b = b.append_column(val, pa.chunked_array([
                        pa.array([0] * b.num_rows, pa.int8())]))
                    continue
                z = _zero_like(col.type)
                b = b.append_column(
                    val, col if z is None else pc.fill_null(col, z))
            return b

        out = out.map_batches(_add, batch_format="pyarrow",
                              zero_copy_batch=True)
    if limit is not None and limit <= 100_000:
        sort_keys = tuple((k, "descending" if d else "ascending")
                          for k, d in zip(keys, desc))

        def _topk_block(b: pa.Table, _sk=sort_keys,
                        _n=limit) -> pa.Table:
            if b.num_rows <= _n:
                return b
            idx = pc.sort_indices(b, sort_keys=list(_sk),
                                  null_placement="at_end")
            return b.take(idx.slice(0, _n))

        out = out.map_batches(_topk_block, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = out.sort(keys, descending=desc)
    if helpers:
        out = out.map_batches(
            lambda b, _h=tuple(c for h, _s, v in helpers
                               for c in (h, v)): b.drop_columns(
                [c for c in _h if c in b.schema.names]),
            batch_format="pyarrow", zero_copy_batch=True)
    return out


def _bucketed_group_merge(ds, gk_pairs: list, specs: list, buckets: int):
    """High-cardinality-safe exact grouped aggregate: ONE shuffle keyed
    on a small int bucket (``hash64(keys) % B``) + a fully vectorized
    Arrow hash aggregate per bucket. Ray's sort-based
    ``groupby(keys).aggregate`` sorts and merge-reduces blocks×keys
    partial rows BY KEY — measured 3.5–7× slower at 150k groups (sf0.1
    lineitem/l_orderkey: 4.2–8.6 s vs 1.2 s) and no faster at 4 groups.
    Input: the map-side pre-combined partials with wrapped group keys;
    ``specs`` = (partial col, arrow merge fn, output alias). Output is
    column-identical to the Ray aggregate route (wrapped keys + aliases).
    Bucket skew is bounded: per-block pre-combine caps any single key at
    n_blocks partial rows, so a bucket holds ≈ keys/B × blocks rows."""
    import numpy as np

    from .sketches.hashing import hash64

    wrapped = [c for _, gkn, gk in gk_pairs for c in (gkn, gk)]
    B = np.uint64(buckets)
    FNV = np.uint64(1099511628211)

    def tag(b: pa.Table) -> pa.Table:
        h = np.zeros(len(b), dtype=np.uint64)
        for _, _gkn, gk in gk_pairs:
            col = b[gk]
            if (pa.types.is_temporal(col.type)
                    or pa.types.is_boolean(col.type)):
                col = pc.cast(col, pa.int64())
            h = (h * FNV) ^ hash64(col, seed=23)
        return b.append_column("_bkt",
                               pa.array((h % B).astype(np.int64)))

    agg_list = sorted({(pcol, fn) for pcol, fn, _ in specs})

    def merge(g: pa.Table, _wr=tuple(wrapped),
              _al=tuple(agg_list),
              _sp=tuple(specs)) -> pa.Table:
        o = g.group_by(list(_wr), use_threads=False).aggregate(list(_al))
        cols: dict = {}
        for w in _wr:
            cols[w] = o[w]
        for pcol, fn, alias in _sp:
            cols[alias] = o[f"{pcol}_{fn}"]
        return pa.table(cols)

    return (ds.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_bkt").map_groups(merge, batch_format="pyarrow"))


def _split_ctes(sql: str):
    """Parse ``WITH name AS (body) [, name2 AS (body2)]* main`` at the
    text level (single-quote-aware parenthesis matching — a CTE body is
    any router-supported query text). Returns ([(name, body), …], main)."""
    i = re.match(r"\s*WITH\s+", sql, re.I).end()
    ctes = []
    while True:
        m = re.match(r"([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", sql[i:], re.I)
        if not m:
            raise ValueError("WITH: expected ``name AS ( select … )``")
        name = m.group(1).lower()
        j = i + m.end()
        depth, k, instr = 1, j, False
        while k < len(sql):
            ch = sql[k]
            if instr:
                instr = ch != "'"
            elif ch == "'":
                instr = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if depth != 0:
            raise ValueError("WITH: unbalanced parentheses in CTE body")
        if name in {n for n, _ in ctes}:
            raise ValueError(f"WITH: duplicate CTE name {name!r}")
        ctes.append((name, sql[j:k]))
        i = k + 1
        m2 = re.match(r"\s*,\s*", sql[i:])
        if not m2:
            break
        i += m2.end()
    return ctes, sql[i:]


def _materialize_ctes(sql: str, sf_dir: str, opts: dict,
                      explain: list | None):
    """Execute a ``WITH`` prelude by materializing each CTE ONCE: the
    body runs as its own streaming plan and ``write_parquet``s
    (distributed, many part files — never a driver funnel) into a temp
    OVERLAY directory that symlinks every base table; the main query and
    any later CTE then run against the overlay, so a CTE is a
    first-class table in EVERY position — FROM, JOIN, membership /
    scalar subqueries, EXISTS, the correlation classifier. This is the
    spool strategy engines use for multiply-referenced CTEs; a
    single-use CTE pays one extra materialization vs inlining
    (documented trade — the spool is columnar parquet with pruned reads
    downstream). A CTE may shadow a base table and may reference earlier
    CTEs (including its own nested WITH). Explain mode still EXECUTES
    the CTE bodies (the main plan's metadata checks need their output
    schemas on disk); only the main query stays plan-only."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    ctes, main = _split_ctes(sql)
    overlay = tempfile.mkdtemp(prefix="vr_cte_")
    for fn in os.listdir(sf_dir):
        if fn.endswith(".parquet"):
            os.symlink(os.path.join(sf_dir, fn),
                       os.path.join(overlay, fn))
    for name, body in ctes:
        if explain is not None:
            explain.append(
                f"CTE {name} -> materialized ONCE (streaming distributed "
                "write_parquet into a session overlay); referenced below "
                "as a plain table")
        out = run_sql(body, overlay, **{**opts, "explain": None})
        path = os.path.join(overlay, f"{name}.parquet")
        if os.path.islink(path):
            # the CTE shadows a base table: earlier CTEs (and this
            # body, just executed) saw the base; from here on the name
            # resolves to the spool — standard SQL WITH scoping
            os.remove(path)
        out.write_parquet(path)
        import glob

        if not glob.glob(os.path.join(path, "*.parquet")):
            # empty CTE result: pin one zero-row part so downstream
            # schema/metadata reads stay uniform
            sch = out.schema()
            if sch is None and not re.match(r"\s*WITH\b", body, re.I):
                # a filter that dropped EVERY row leaves Ray's lazy
                # Dataset schemaless — the schema is a property of the
                # query STRUCTURE, not the predicate, so probe it by
                # running the body with filters stripped and LIMIT 1
                import dataclasses
                pp = dataclasses.replace(
                    parse_sql(body), where=[], having=[], qualify=[],
                    corr_where=[], limit=1, offset=0, order_by=[],
                    order_nulls={})
                probe = run_sql("", overlay, _plan=pp,
                                **{**opts, "explain": None})
                sch = probe.schema()
            if sch is None:
                raise ValueError(
                    f"CTE {name!r} produced no rows and its schema "
                    "could not be derived (empty base tables?)")
            os.makedirs(path, exist_ok=True)   # a zero-row write_parquet
            #                                    may not create the dir
            pq.write_table(
                pa.table({n: pa.array([], type=t)
                          for n, t in zip(sch.names, sch.types)}),
                os.path.join(path, "empty.parquet"))
    return main, overlay


def run_sql(sql: str, sf_dir: str, *, hll_p: int = 14, kll_k: int = 200,
            with_bounds: bool = False, approx_membership: bool = False,
            bloom_capacity: int = 1_000_000, bloom_fpp: float = 0.01,
            join_buckets: int = 32, max_broadcast_rows: int = 2_000_000,
            cms_eps: float = 1e-3, cms_delta: float = 1e-2,
            explain: list | None = None, _plan: "_Plan | None" = None):
    """Parse ``sql`` and execute it as a streaming Ray Data pipeline over
    ``{sf_dir}/{table}.parquet``. Returns a Dataset. See module docstring
    for the grammar and the routing table.

    ``explain``: pass a list to collect the routing decisions THIS call
    takes (emitted by the same branches that execute, so the trace cannot
    diverge from execution) and skip all data-pass work — only
    metadata-level checks run (parquet schemas / row counts / small-dim
    key uniqueness). Use :func:`explain_sql` for the string form."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from .udaf import ExactDistinct, HllAgg, KllAgg

    if _plan is None and re.match(r"\s*WITH\b", sql, re.I):
        sql, sf_dir = _materialize_ctes(
            sql, sf_dir,
            dict(hll_p=hll_p, kll_k=kll_k, with_bounds=with_bounds,
                 approx_membership=approx_membership,
                 bloom_capacity=bloom_capacity, bloom_fpp=bloom_fpp,
                 join_buckets=join_buckets,
                 max_broadcast_rows=max_broadcast_rows,
                 cms_eps=cms_eps, cms_delta=cms_delta),
            explain)

    plan = _plan if _plan is not None else parse_sql(sql)

    if plan.no_from:
        # SELECT <literal exprs> with no FROM — one synthetic row through
        # the same _eval_expr kernels, no reads, no shuffle
        one = pa.table({"_one": pa.array([1])})
        cols: dict = {}
        for it in plan.items:
            if it.fn == "col":
                raise ValueError(
                    f"column {it.col!r} referenced without a FROM clause")
            if it.fn != "expr" or it.expr is None:
                raise ValueError("SELECT without FROM supports literal "
                                 "scalar expressions only")
            v = _eval_expr(one, it.expr)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()])
            elif isinstance(v, (pa.Array, pa.ChunkedArray)) and len(v) > 1:
                v = v.slice(0, 1)
            cols[it.name] = v
        if explain is not None:
            explain.append("SELECT (no FROM) -> one constant row, no "
                           "reads, no shuffle")
            return rd.from_items([])
        return rd.from_arrow(pa.table(cols))

    if plan.self_joins:
        sf_dir = _materialize_self_joins(plan, sf_dir, explain)

    _expand_stars(plan, sf_dir)

    if plan.distinct_on:
        # DISTINCT ON (k, …) → hidden ROW_NUMBER() OVER (PARTITION BY
        # k… ORDER BY <residual ORDER BY>) + QUALIFY _don = 1. The
        # ORDER BY must start with the ON keys and continue with at
        # least one residual column — otherwise which row is "first"
        # is engine-order-dependent (same determinism stance as OFFSET)
        keys = list(plan.distinct_on)
        ob = plan.order_by
        if ([c for c, _ in ob[:len(keys)]] != keys
                or len(ob) <= len(keys)):
            raise ValueError(
                "DISTINCT ON (k, …) requires ORDER BY to start with "
                "the ON keys and continue with at least one residual "
                "tiebreak column (deterministic first-row-per-key)")
        if plan.unions or plan.group_by:
            raise ValueError("DISTINCT ON does not combine with set "
                             "operations or GROUP BY")
        hid = _Agg("row_number", None, alias="_don", hidden=True)
        hid.window = (tuple(keys), tuple(ob[len(keys):]), None)
        plan.items.append(hid)
        # residual order columns the SELECT list does not carry ride as
        # HIDDEN passthrough columns (available to the final sort, then
        # dropped with the row-number helper)
        have = {it.name for it in plan.items} | {
            it.col for it in plan.items if it.col}
        for c, _d in ob[len(keys):]:
            if c not in have:
                plan.items.append(_Agg("col", c, hidden=True))
        plan.qualify.append(_Pred("_don", "=", 1))
        plan.distinct_on = None

    if plan.offset:
        # LIMIT n OFFSET m: run the same plan with LIMIT n+m (parse
        # guarantees ORDER BY + LIMIT, so the result is deterministic and
        # small), then slice the skipped prefix off the collected rows —
        # a driver-side op over <= n+m rows, never over the input
        import dataclasses
        inner = dataclasses.replace(
            plan, limit=plan.limit + plan.offset, offset=0)
        out = run_sql(sql, sf_dir, hll_p=hll_p, kll_k=kll_k,
                      with_bounds=with_bounds,
                      approx_membership=approx_membership,
                      bloom_capacity=bloom_capacity, bloom_fpp=bloom_fpp,
                      join_buckets=join_buckets,
                      max_broadcast_rows=max_broadcast_rows,
                      cms_eps=cms_eps, cms_delta=cms_delta,
                      explain=explain, _plan=inner)
        if explain is not None:
            explain.append(f"OFFSET {plan.offset} -> slice of the "
                           f"<= {inner.limit}-row sorted result")
            return out
        parts = list(out.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))
        if not parts:
            # empty result (a WHERE dropped every row): nothing to skip,
            # and an all-empty grouped Dataset may carry no schema at all
            return out
        return rd.from_arrow(pa.concat_tables(parts).slice(plan.offset))

    if plan.unions:
        # UNION ALL: each SELECT core runs as its own streaming plan and
        # the Datasets concatenate block-wise (Dataset.union — zero
        # shuffles, zero materialization); the trailing ORDER BY / LIMIT
        # bind to the whole union, standard SQL
        import dataclasses

        parts = [plan] + plan.unions
        names0 = [it.name for it in parts[0].items]
        for i, p in enumerate(parts[1:], 2):
            names = [it.name for it in p.items]
            if names != names0:
                raise ValueError(f"set-operation part {i} columns {names} "
                                 f"!= part 1 columns {names0}")
        opts = dict(hll_p=hll_p, kll_k=kll_k, with_bounds=with_bounds,
                    approx_membership=approx_membership,
                    bloom_capacity=bloom_capacity, bloom_fpp=bloom_fpp,
                    join_buckets=join_buckets,
                    max_broadcast_rows=max_broadcast_rows,
                    cms_eps=cms_eps, cms_delta=cms_delta, explain=explain)
        set_op = plan.set_op or "union_all"
        outs = []
        for i, p in enumerate(parts, 1):
            sub = dataclasses.replace(p, order_by=[], limit=None,
                                      unions=[], set_op=None,
                                      union_distinct=False)
            if explain is not None:
                explain.append(f"{set_op.upper()} part {i}/{len(parts)}:")
            outs.append(run_sql(sql, sf_dir, _plan=sub, **opts))
        if explain is not None:
            explain.append(
                f"{set_op.upper()} -> Dataset.union of {len(parts)} "
                "streaming parts (block concatenation, no shuffle)"
                + ("" if set_op == "union_all" else
                   "; then per-block Arrow pre-dedup "
                   + ("+ side-indicator columns " if set_op != "union"
                      else "")
                   + "-> ONE null-safe distinct-rows groupby shuffle"
                   + ("" if set_op == "union" else
                      " -> vectorized presence filter")))
            return rd.from_items([])
        if set_op == "union_all":
            out = outs[0].union(*outs[1:])
        else:
            # SQL set semantics (distinct rows; NULLs compare equal):
            # each part pre-dedups per block and, for INTERSECT/EXCEPT,
            # carries one int side-indicator column per part; ONE grouped
            # presence count across the concatenation decides membership
            # (intersect: present in every side; except: in side 0 and no
            # other). Output columns ride the same null-safe (is-null,
            # filled) key wrap the aggregate route uses — Ray's
            # sort-based groupby cannot compare None.
            from ray.data.aggregate import Count, Sum

            side_cols = ([f"_s{j}" for j in range(len(outs))]
                         if set_op != "union" else [])

            def _tag_fn(idx: int):
                def fn(b: pa.Table) -> pa.Table:
                    b = b.group_by(names0).aggregate([])
                    b = b.select(names0)
                    for j, s in enumerate(side_cols):
                        b = b.append_column(
                            s, pa.chunked_array([pa.array(
                                [1 if j == idx else 0] * b.num_rows,
                                pa.int64())]))
                    return b
                return fn

            tagged = [o.map_batches(_tag_fn(i), batch_format="pyarrow",
                                    zero_copy_batch=True)
                      for i, o in enumerate(outs)]
            allp = tagged[0].union(*tagged[1:])
            gkp = [(c, f"_gkn_{c}", f"_gk_{c}") for c in names0]

            def _wrap(b: pa.Table, _gk=tuple(gkp)) -> pa.Table:
                for c, gkn, gkc in _gk:
                    col = b[c]
                    z = _zero_like(col.type)
                    b = b.append_column(gkn, pc.cast(pc.is_null(col),
                                                     pa.int8()))
                    b = b.append_column(gkc, col if z is None
                                        else pc.fill_null(col, z))
                return b.drop_columns(list(names0))

            allp = allp.map_batches(_wrap, batch_format="pyarrow",
                                    zero_copy_batch=True)
            group_cols = [c for _, gkn, gkc in gkp for c in (gkn, gkc)]
            aggs_ = ([Sum(s, alias_name=s) for s in side_cols]
                     or [Count(alias_name="_union_dn")])
            grouped = allp.groupby(group_cols).aggregate(*aggs_)

            def _present(b: pa.Table, _op=set_op,
                         _gk=tuple(gkp)) -> pa.Table:
                if _op != "union":
                    m = pc.greater(b[side_cols[0]], 0)
                    for s in side_cols[1:]:
                        other = pc.greater(b[s], 0)
                        m = (pc.and_(m, other) if _op == "intersect"
                             else pc.and_(m, pc.invert(other)))
                    b = b.filter(pc.fill_null(m, False))
                for c, gkn, gkc in _gk:
                    arr = b[gkc]
                    b = b.append_column(
                        c, pc.if_else(pc.cast(b[gkn], pa.bool_()),
                                      pa.scalar(None, type=arr.type),
                                      arr))
                return b.select(names0)

            out = grouped.map_batches(_present, batch_format="pyarrow")
        if plan.order_by:
            out = _sort_with_nulls(out, plan.order_by, plan.order_nulls,
                                   limit=plan.limit)
        if plan.limit is not None:
            out = out.limit(plan.limit)
        return out

    # scalar subqueries execute first (SQL's logical order: they are
    # constants for the outer query); a derived table compiles to its own
    # streaming Dataset the outer plan consumes block-wise
    sub_opts = dict(hll_p=hll_p, kll_k=kll_k, with_bounds=with_bounds,
                    approx_membership=approx_membership,
                    bloom_capacity=bloom_capacity, bloom_fpp=bloom_fpp,
                    join_buckets=join_buckets,
                    max_broadcast_rows=max_broadcast_rows,
                    cms_eps=cms_eps, cms_delta=cms_delta)
    sf_dir = _rewrite_corr_items(plan, sf_dir, sub_opts, explain)
    _rewrite_correlated(plan, sf_dir, explain)
    _resolve_scalar_subqueries(plan, sf_dir, sub_opts, explain)
    sub = None
    if plan.sub_from is not None:
        if explain is not None:
            explain.append(f"FROM (SELECT …) AS {plan.table} -> derived "
                           "table: the inner plan below executes as its "
                           "own streaming Dataset (lazy, never "
                           "materialized; outer stages consume it "
                           "block-wise):")
        inner = run_sql(sql, sf_dir, _plan=plan.sub_from, explain=explain,
                        **sub_opts)
        sub = (inner, [it.name for it in plan.sub_from.items])

    if (any(it.window or it.fn == "wexpr" for it in plan.items)
            or _qualify_waggs(plan.qualify)):
        if plan.select_distinct:
            # SELECT DISTINCT over window items: run the window stage
            # with ORDER BY/LIMIT deferred, dedup the (usually tiny)
            # windowed projection with the null-safe distinct-rows
            # shuffle (per-block Arrow pre-dedup first), then sort/limit
            import dataclasses
            wplan = dataclasses.replace(
                plan, select_distinct=False, order_by=[], limit=None,
                offset=0, order_nulls={})
            out = _run_window_sql(wplan, sf_dir, buckets=join_buckets,
                                  max_broadcast_rows=max_broadcast_rows,
                                  approx_membership=approx_membership,
                                  bloom_capacity=bloom_capacity,
                                  bloom_fpp=bloom_fpp, explain=explain,
                                  sub=sub)
            names = [it.name for it in plan.items]
            if explain is not None:
                explain.append(
                    f"SELECT DISTINCT -> per-block Arrow pre-dedup + one "
                    f"null-safe distinct-rows groupby over {names}")
                return out
            out = _distinct_rows(out, names)
            if plan.order_by:
                out = _sort_with_nulls(out, plan.order_by,
                                       plan.order_nulls, limit=plan.limit)
            if plan.limit is not None:
                out = out.limit(plan.limit)
            return out
        return _run_window_sql(plan, sf_dir, buckets=join_buckets,
                               max_broadcast_rows=max_broadcast_rows,
                               approx_membership=approx_membership,
                               bloom_capacity=bloom_capacity,
                               bloom_fpp=bloom_fpp, explain=explain,
                               sub=sub)

    if plan.select_distinct:
        # exact distinct rows = GROUP BY every selected column with a
        # throwaway map-side-combined counter (one shuffle of distinct
        # rows per block, not of the input)
        if any(it.fn != "col" for it in plan.items):
            raise ValueError("SELECT DISTINCT takes plain columns only")
        if plan.group_by or plan.having:
            raise ValueError("SELECT DISTINCT does not combine with "
                             "GROUP BY/HAVING")
        plan.group_by = [it.col for it in plan.items]
        if explain is not None:
            explain.append(f"SELECT DISTINCT -> GROUP BY "
                           f"{plan.group_by} with a dropped counter")

    # ------------------------------------------------ plain scan route
    # SELECT cols/exprs FROM … [WHERE …] [ORDER BY …] [LIMIT n] with no
    # aggregate and no GROUP BY: a pure streaming projection/filter
    # query — pruned read -> pushed-down vectorized filters -> joins ->
    # one derive stage -> (global sort only if ORDER BY) -> limit.
    if (not plan.group_by and not plan.having
            and all(it.fn in ("col", "expr") for it in plan.items)):
        exprs = {}
        for it in plan.items:
            if it.fn == "expr":
                if not it.alias:
                    raise ValueError("an expression SELECT item needs "
                                     f"AS alias (got {_fmt_expr(it.expr)})")
                exprs[it.alias] = it.expr
                it.col = it.alias
        sel_names = [it.name for it in plan.items if not it.hidden]
        needed = set()
        for it in plan.items:
            if it.col in exprs:
                needed.update(_expr_cols(exprs[it.col]))
            else:
                needed.add(it.col)
        # ORDER BY may reference unselected columns — sort runs before
        # the projection, so they just join the pruned read
        needed.update(c for c, _ in plan.order_by
                      if c not in exprs and c not in sel_names)
        needed_post = set(needed)
        for p in plan.where:
            needed.update(_pred_cols([p]))
        for _tbl, a, b, _how in plan.joins:
            needed.update(c for c in (a, b) if c)
        ds, _sch, _pt = _scan_with_joins(
            plan, sf_dir, needed, join_buckets=join_buckets,
            max_broadcast_rows=max_broadcast_rows,
            approx_membership=approx_membership,
            bloom_capacity=bloom_capacity, bloom_fpp=bloom_fpp,
            explain=explain, sub=sub, needed_post=needed_post)
        if exprs:
            if explain is not None:
                for name, e in exprs.items():
                    explain.append(f"DERIVE {name} = {_fmt_expr(e)} -> "
                                   "one vectorized pyarrow.compute "
                                   "column (no row loops)")
            else:
                ds = ds.map_batches(_expr_derive_fn(exprs),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
        if explain is not None:
            explain.append(
                f"PLAIN SCAN -> streaming projection {sel_names}"
                + (f"; ORDER BY {plan.order_by} -> global sort"
                   if plan.order_by else "")
                + (f"; LIMIT {plan.limit}" if plan.limit is not None
                   else " (no sort/limit: fully streaming)"))
            return rd.from_items([])
        if plan.order_by:
            # the sort runs BEFORE the alias-rename projection, so ORDER BY
            # an alias of a plain column (or an ordinal, which _order_limit
            # resolves to the alias) must translate back to the source
            # column; expression aliases already exist as derived columns
            alias_src = {it.alias: it.col for it in plan.items
                         if it.fn == "col" and it.alias
                         and it.col not in exprs}
            ds = _sort_with_nulls(ds, plan.order_by, plan.order_nulls,
                                  rename=alias_src, limit=plan.limit)
        if plan.limit is not None:
            ds = ds.limit(plan.limit)

        def project(b: pa.Table, _items=tuple(
                (it.name, it.col) for it in plan.items
                if not it.hidden)) -> pa.Table:
            return pa.table({name: b[col] for name, col in _items})

        return ds.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True)

    # -------------- post-aggregate expression items (100*SUM(a)/SUM(b))
    # Each aggregate leaf becomes a HIDDEN aggregate output column
    # (aggregated like any exact/sketch agg, map-side combined); the
    # arithmetic then runs as ONE vectorized pyarrow.compute pass in the
    # finish stage over the tiny aggregated table, and the hidden columns
    # drop at projection. SQL's logical order, zero extra passes.
    aggexpr_items = [it for it in plan.items if it.fn == "aggexpr"]
    hidden_aggs: list[_Agg] = []
    # identical aggregate leaves (e.g. SUM(x) referenced twice in one
    # expression, or COUNT(x) shared by STDDEV and VAR items) compute ONCE
    # — dedup by value signature, not object identity (a shared subtree
    # would otherwise be re-aliased on its second visit, leaving the first
    # reference pointing at a column that no longer exists)
    _seen_hidden: dict[tuple, str] = {}
    for it in aggexpr_items:
        if not it.alias:
            raise ValueError("an aggregate expression item needs AS "
                             f"alias (got {_fmt_expr(it.expr)})")

        def _hide(e, _alias=it.alias):
            if not isinstance(e, tuple):
                return e
            if len(e) and e[0] == "agg":
                ag = e[1]
                if ag.fn in ("approx_top_k", "quantile_cont"):
                    raise ValueError(f"{ag.fn.upper()} is not supported "
                                     "inside aggregate expressions")
                sig = (ag.fn, ag.col, ag.distinct, ag.phi,
                       repr(ag.expr), repr(ag.filter_pred))
                if sig in _seen_hidden:
                    return ("col", _seen_hidden[sig])
                ag.alias = f"_hx{len(hidden_aggs)}_{_alias}"
                _seen_hidden[sig] = ag.alias
                hidden_aggs.append(ag)
                return ("col", ag.alias)
            return tuple(_hide(c) for c in e)

        it.expr = _hide(it.expr)

    # ------------------------------------ scalar expressions → derived cols
    # Each expression (an aggregate's argument, or an aliased SELECT item
    # used as a group key) compiles to ONE derived Arrow column attached by
    # a single vectorized map_batches stage after the joins; everything
    # downstream (FILTER masks, cents conversion, group keys, aggregates)
    # then sees a plain column.
    exprs = _register_exprs(plan, group_aliases=True)
    for ag in hidden_aggs:
        # hidden aggregates over expression args get the same derived
        # column treatment as visible ones
        if ag.expr is not None:
            dname = f"_expr_{ag.alias}"
            exprs[dname] = ag.expr
            ag.col = dname
    derived = set(exprs)

    # -------------------------------------------------- read, pruned
    needed = {c for c in plan.group_by if c not in derived}
    for it in list(plan.items) + hidden_aggs:
        if it.col is not None:
            if it.col in derived:
                needed.update(_expr_cols(exprs[it.col]))
            else:
                needed.add(it.col)
        if it.col2 is not None:
            needed.add(it.col2)
        for p in (it.filter_pred or ()):
            needed.update(_pred_cols([p]))
    needed_post = set(needed)
    for p in plan.where:
        needed.update(_pred_cols([p]))
    for _tbl, a, b, _how in plan.joins:
        needed.update(c for c in (a, b) if c)
    ds, schemas, per_table = _scan_with_joins(
        plan, sf_dir, needed, join_buckets=join_buckets,
        max_broadcast_rows=max_broadcast_rows,
        approx_membership=approx_membership,
        bloom_capacity=bloom_capacity, bloom_fpp=bloom_fpp,
        explain=explain, sub=sub, needed_post=needed_post)

    # ----------------------------- derived expression columns (one stage)
    if exprs:
        if explain is not None:
            for name, e in exprs.items():
                explain.append(f"DERIVE {name} = {_fmt_expr(e)} -> one "
                               "vectorized pyarrow.compute column (no row "
                               "loops), attached after the joins")
        else:
            ds = ds.map_batches(_expr_derive_fn(exprs),
                                batch_format="pyarrow",
                                zero_copy_batch=True)

    # ------------------------------------- APPROX_TOP_K (heavy hitters)
    topk = [it for it in plan.items if it.fn == "approx_top_k"]
    if topk:
        if plan.rollup:
            raise ValueError("APPROX_TOP_K does not roll up in this "
                             "router (heavy-hitter rows explode per "
                             "group; use one level per query)")
        non_key = [it for it in plan.items
                   if it.fn != "approx_top_k"
                   and not (it.fn == "col" and it.col in plan.group_by)]
        if (len(topk) != 1 or non_key or plan.having
                or topk[0].col in plan.group_by):
            raise ValueError(
                "APPROX_TOP_K must be the only SELECT item (besides the "
                "GROUP BY key), over a non-key column, without HAVING")
        it = topk[0]
        k = int(it.phi)
        if explain is not None:
            grouped_note = (f" per {plan.group_by[0]} group (blob decoded "
                            "in a distributed map_batches finish stage)"
                            if plan.group_by else "")
            explain.append(
                f"AGG {it.name} = APPROX_TOP_K({it.col}, {k}) -> "
                f"Count-Min heavy hitters (eps={cms_eps}, "
                f"delta={cms_delta}); <= {k} rows{grouped_note}; "
                "one-sided bound est <= true + eps*N")
            return rd.from_items([])
        from .sketches.cms import CountMin
        from .udaf import CmsAgg

        agg = CmsAgg(on=it.col, alias_name="_cms", eps=cms_eps,
                     delta=cms_delta, hh_capacity=max(2 * k, 16),
                     output="blob")

        def _decode(blob) -> tuple[list, list, list]:
            sk = CountMin.from_bytes(blob)
            pairs = sk.top_k(k)
            return ([p[0] for p in pairs], [int(p[1]) for p in pairs],
                    [float(cms_eps * sk.n)] * len(pairs))

        if plan.group_by:
            # grouped heavy hitters: per-key CMS blob → ≤k rows per key,
            # decoded inside a distributed map_batches stage
            key = plan.group_by[0]
            if len(plan.group_by) != 1:
                raise ValueError("grouped APPROX_TOP_K supports one key")
            grouped = ds.groupby(key).aggregate(agg)

            def explode(batch: pa.Table) -> pa.Table:
                keys_o, items_o, est_o, b_o = [], [], [], []
                key_vals = batch[key].to_pylist()
                blobs = batch["_cms"].to_pylist()
                for kv, blob in zip(key_vals, blobs):
                    items, ests, bnds = _decode(blob)
                    keys_o.extend([kv] * len(items))
                    items_o.extend(items)
                    est_o.extend(ests)
                    b_o.extend(bnds)
                cols = {key: pa.array(keys_o, batch.schema.field(key).type),
                        it.col: pa.array(items_o),
                        it.name: pa.array(est_o, pa.int64())}
                if with_bounds:
                    cols[f"{it.name}_bound"] = pa.array(b_o, pa.float64())
                return pa.table(cols)

            out = grouped.map_batches(explode, batch_format="pyarrow")
            if plan.order_by:
                out = _sort_with_nulls(out, plan.order_by,
                                       plan.order_nulls)
            if plan.limit is not None:
                out = out.limit(plan.limit)
            return out

        row = ds.aggregate(agg)
        items, ests, bnds = _decode(row["_cms"])
        tbl = pa.table({
            it.col: pa.array(items),
            it.name: pa.array(ests, pa.int64()),
        })
        if with_bounds:
            # CMS is one-sided: true count ∈ [est − εN, est]
            tbl = tbl.append_column(f"{it.name}_bound",
                                    pa.array(bnds, pa.float64()))
        if plan.order_by:
            tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[
                (c, "descending" if d else "ascending")
                for c, d in plan.order_by]))
        if plan.limit is not None:
            tbl = tbl.slice(0, plan.limit)
        return rd.from_arrow(tbl)

    # ----------------------------- QUANTILE_CONT (exact, per-group task)
    qcont = [it for it in plan.items if it.fn == "quantile_cont"]
    if qcont:
        if plan.rollup:
            raise ValueError(
                "QUANTILE_CONT cannot roll up (exact quantiles are not "
                "re-aggregable from level outputs) — GROUP BY "
                "ROLLUP/CUBE supports exact decomposables and the "
                "mergeable sketches APPROX_QUANTILE[_TDIGEST] / "
                "APPROX_COUNT_DISTINCT")
        bad = [it.fn for it in plan.items
               if it.fn not in ("col", "quantile_cont")]
        if bad or plan.having:
            raise ValueError(
                "QUANTILE_CONT combines only with GROUP BY keys in this "
                f"router (exact route holds one group's values in a "
                f"task); got {bad or 'HAVING'} — use APPROX_QUANTILE for "
                "the mergeable sketch route")
        if explain is not None:
            for it in qcont:
                explain.append(
                    f"AGG {it.name} = QUANTILE_CONT({it.col}, {it.phi}) "
                    + ("-> EXACT interpolated quantile (one groupby "
                       "shuffle co-locates each group; one vectorized "
                       "np.quantile per group; contract: one group's "
                       "values fit a task - the KLL route is the sketch "
                       "path otherwise)" if plan.group_by else
                       "-> EXACT distributed order-statistic selection "
                       "(ops.global_quantile_cont): sampled range bounds "
                       "-> one vectorized counting pass -> only the "
                       "target range's ~n/ranges values sort locally; "
                       "NO single-task funnel"))
            return rd.from_items([])
        import numpy as np
        import pandas as pd_

        keys = list(plan.group_by)
        specs = tuple((it.name, it.col, float(it.phi), it.round_to)
                      for it in qcont)
        col_order = [it.name for it in plan.items]

        def qt(g: "pd_.DataFrame") -> "pd_.DataFrame":
            row = {}
            for k in keys:
                row[k] = [g[k].iloc[0]]
            for name, col, phi, nd in specs:
                arr = g[col].dropna().to_numpy(dtype=np.float64)
                if arr.size == 0:
                    row[name] = [None]
                    continue
                v = float(np.quantile(arr, phi, method="linear"))
                if nd is not None:
                    v = pc.round(pa.scalar(v), ndigits=nd,
                                 **_ROUND).as_py()
                row[name] = [v]
            return pd_.DataFrame({c: row[c] for c in col_order})

        if keys:
            out = ds.groupby(keys).map_groups(qt, batch_format="pandas")
        else:
            # global exact quantile: distributed order-statistic
            # selection — sampled range bounds, one counting pass, only
            # the target range sorts locally (never a one-task funnel)
            from .ops import global_quantile_cont

            row = {}
            for name, col, phi, nd in specs:
                v = global_quantile_cont(ds, col, phi)
                if v is not None and nd is not None:
                    v = pc.round(pa.scalar(v), ndigits=nd,
                                 **_ROUND).as_py()
                row[name] = [v]
            out = rd.from_arrow(pa.table(
                {c: row[c] for c in col_order}))
        if plan.order_by:
            out = _sort_with_nulls(out, plan.order_by, plan.order_nulls,
                                   limit=plan.limit)
        if plan.limit is not None:
            out = out.limit(plan.limit)
        return out

    # -------------------------------------------------- aggregates
    aggs, posts, bounds = [], [], []
    hll_blob_items: list[str] = []   # rollup APPROX_COUNT_DISTINCT names
    qblob_items: list[tuple] = []    # rollup quantile sketches (name, phi)
    plain_cols = [it for it in plan.items if it.fn == "col"]
    # "expr" items are derived group keys — already validated against
    # plan.group_by above, and they flow through the groupby like any
    # key; "aggexpr" items contribute their HIDDEN aggregates here and
    # evaluate their arithmetic in the finish stage
    grouping_items = [it for it in plan.items if it.fn == "grouping"]
    if grouping_items:
        if not plan.rollup:
            raise ValueError("GROUPING(col) requires GROUP BY "
                             "ROLLUP/CUBE")
        bad_g = [it.col for it in grouping_items
                 if it.col not in plan.group_by]
        if bad_g:
            raise ValueError(f"GROUPING column(s) {bad_g} are not "
                             "ROLLUP/CUBE keys")
    agg_items = [it for it in plan.items
                 if it.fn not in ("col", "expr", "aggexpr",
                                  "grouping")] + hidden_aggs
    for it in plain_cols:
        if it.col not in plan.group_by:
            raise ValueError(f"non-aggregate column {it.col!r} must be in "
                             "GROUP BY")

    # ---------------------------------------- FILTER (WHERE …) aggregates
    flt_items = [it for it in agg_items if it.filter_pred]
    if flt_items:
        bad = [it.fn for it in flt_items
               if it.fn not in ("count", "sum", "avg", "min", "max")
               or it.distinct]
        if bad:
            raise ValueError(f"FILTER (WHERE …) supports exact COUNT/SUM/"
                             f"AVG/MIN/MAX only, got {bad}")
        # one vectorized mask per filtered item: COUNT gets a 0/1 column
        # (a plain map-side-combined Sum counts it), the rest get the
        # value column nulled where the mask fails (every exact agg
        # ignores nulls, so an all-masked group yields SQL's NULL)
        specs = tuple((f"_flt_{it.name}", it.fn, it.col,
                       tuple(it.filter_pred)) for it in flt_items)
        if explain is not None:
            for cname, fn_, col_, preds in specs:
                explain.append(
                    f"FILTER (WHERE {_fmt_preds(list(preds))}) on "
                    f"{fn_.upper()}({col_ or '*'}) -> vectorized mask "
                    "column, aggregated map-side like any exact agg")
        else:
            def with_filter_cols(b: pa.Table, _specs=specs) -> pa.Table:
                for cname, fn_, col_, preds in _specs:
                    mask = _pred_mask(b, list(preds))
                    if fn_ == "count":
                        keep = mask if col_ is None else                             pc.and_(mask, pc.is_valid(b[col_]))
                        arr = pc.cast(keep, pa.int64())
                    else:
                        vals = b[col_]
                        arr = pc.if_else(mask, vals,
                                         pa.scalar(None, type=vals.type))
                    b = b.append_column(cname, arr)
                return b

            ds = ds.map_batches(with_filter_cols, batch_format="pyarrow",
                                zero_copy_batch=True)

    # exact-only grouped aggregates pre-combine INSIDE map_batches via
    # Arrow's hash aggregate (one tiny partial row per key per block), so
    # the wide groupby shuffles blocks×keys partial rows instead of raw
    # rows (600k → 384 on TPC-H Q1). Interleaved A/B at sf0.1/32cpu:
    # ~15% wall (1.86 s vs 2.19 s median) — the shuffle-volume cut is the
    # 100-TB win; VR_SQL_PRECOMBINE=0 disables for A/B. High-cardinality
    # keys degrade gracefully: partials ≈ raw rows, the extra Arrow hash
    # agg is ~µs/row.
    _EXACT_KINDS = {"count", "sum", "avg", "min", "max", "money_sum",
                    "money_avg"}
    import os as _os
    precombine = (bool(plan.group_by) and bool(agg_items)
                  and all(it.fn in _EXACT_KINDS and not it.distinct
                          for it in agg_items)
                  and _os.environ.get("VR_SQL_PRECOMBINE", "1") != "0")
    # ROLLUP/CUBE re-aggregates the finest level's outputs, so every
    # aggregate must be mergeable from them: exact decomposables ride the
    # precombine partials; without precombine, COUNT/SUM/MIN/MAX/cents
    # re-aggregate from their finalized values and APPROX_COUNT_DISTINCT
    # re-MERGES HLL blobs (the flagship mergeable-sketch algebra — exact
    # DISTINCT is the classic non-decomposable case, the sketch is not)
    _ROLLUP_REAGG = {"count", "sum", "min", "max", "money_sum",
                     "money_avg", "approx_count_distinct",
                     "approx_quantile", "approx_quantile_tdigest"}
    if plan.rollup and not precombine:
        bad_r = [it.fn for it in agg_items if it.fn not in _ROLLUP_REAGG
                 or it.distinct]
        if bad_r:
            raise ValueError(
                "GROUP BY ROLLUP/CUBE supports exact decomposable "
                "aggregates and the mergeable sketches "
                "APPROX_COUNT_DISTINCT / APPROX_QUANTILE[_TDIGEST] "
                f"(blobs merge associatively across levels) — got {bad_r}")
    if plan.rollup and plan.sub_from is not None:
        raise ValueError("GROUP BY ROLLUP over a derived table is not "
                         "supported (key types come from parquet schema)")

    if explain is not None:
        routes = {
            "count": "Ray Count (exact, map-side combined)",
            "sum": "Ray Sum (exact, map-side combined)",
            "avg": "Ray Mean (exact, map-side combined)",
            "min": "Ray Min", "max": "Ray Max",
            "money_sum": "exact integer-cents Sum (order-independent, "
                         "bit-stable)",
            "money_avg": "exact integer-cents Sum / Count "
                         "(order-independent, bit-stable)",
            "approx_count_distinct":
                f"HyperLogLog (p={hll_p}, 3-sigma rel err ~"
                f"{3 * 1.04 / (2 ** hll_p) ** 0.5:.4f})",
            "approx_quantile": f"KLL (k={kll_k}, eps rank bound)",
            "approx_quantile_tdigest": "merging t-digest (tail-accurate)",
        }
        for it in agg_items:
            if it.fn == "count" and it.distinct:
                route = "ExactDistinct (sorted 8-byte hash sets)"
            elif it.distinct:
                route = ("DistinctValuesAgg (sorted 8-byte value sets, "
                         f"{it.fn} finalize)")
            elif it.fn in ("arg_max", "arg_min"):
                route = ("ArgMinMaxAgg (O(1) (best_val, best_arg) pair "
                         "accumulator)")
            elif it.fn == "string_agg":
                route = ("StringAggAgg ((order_key, value) pair lists, "
                         "one sort+join at finalize)")
            else:
                route = routes[it.fn]
            arg = (_fmt_expr(it.expr) if it.expr is not None
                   else (it.col or "*"))
            explain.append(f"AGG {it.name} = {it.fn.upper()}"
                           f"({arg}) -> {route}")
        for it in aggexpr_items:
            explain.append(
                f"ITEM {it.name} = {_fmt_expr(it.expr)} -> "
                "post-aggregate vectorized expression over hidden "
                "aggregate columns (finish stage, group-count rows)")
        explain.append(
            f"GROUP BY {plan.group_by} -> "
            + ("Arrow-hash PRE-COMBINE per block (blocks x keys partial "
               "rows through the shuffle), then " if precombine else "")
            + "one map-side-combined "
            "aggregate shuffle" if plan.group_by else
            "global aggregate -> partials combine to a single row, "
            "no wide shuffle")
        if plan.having:
            explain.append(f"HAVING {_fmt_preds(plan.having)} -> "
                           "vectorized post-aggregate filter")
        if plan.order_by:
            explain.append(f"ORDER BY {plan.order_by} -> sorts the "
                           "aggregated result only (group-count rows)")
        if plan.limit is not None:
            explain.append(f"LIMIT {plan.limit}")
        import ray.data as rd
        return rd.from_items([])
    avg_div: list[str] = []
    arrow_specs: dict = {}   # (col, arrow_fn) -> partial column name

    def _partial(col, fn) -> str:
        key = (col or "", fn)
        if key not in arrow_specs:
            arrow_specs[key] = f"_pc{len(arrow_specs)}"
        return arrow_specs[key]

    # (partial column, arrow merge fn, output alias) — drives BOTH the
    # Ray aggregate fallback and the bucketed Arrow hash-merge fast path
    merge_specs: list[tuple] = []

    def _padd(kind: str, pcol: str, alias: str) -> None:
        merge_specs.append((pcol, kind, alias))
        aggs.append({"sum": Sum, "min": Min,
                     "max": Max}[kind](pcol, alias_name=alias))

    if precombine:
        for it in agg_items:
            name = it.name
            fcol = f"_flt_{name}" if it.filter_pred else it.col
            if it.fn == "count":
                if it.filter_pred:      # 0/1 mask column: sum of sums
                    _padd("sum", _partial(fcol, "sum"), name)
                elif it.col is None:
                    _padd("sum", _partial(None, "count_all"), name)
                else:
                    _padd("sum", _partial(it.col, "count"), name)
            elif it.fn == "sum":
                _padd("sum", _partial(fcol, "sum"), name)
            elif it.fn == "money_sum":
                _padd("sum", _partial(f"_cents_{name}", "sum"),
                      f"_cents_{name}")
            elif it.fn == "money_avg":
                _padd("sum", _partial(f"_cents_{name}", "sum"),
                      f"_cents_{name}")
                _padd("sum", _partial(f"_cents_{name}", "count"),
                      f"_cnt_{name}")
            elif it.fn == "min":
                _padd("min", _partial(fcol, "min"), name)
            elif it.fn == "max":
                _padd("max", _partial(fcol, "max"), name)
            else:                        # avg = Sum(sums)/Sum(counts)
                _padd("sum", _partial(fcol, "sum"), f"_avgs_{name}")
                _padd("sum", _partial(fcol, "count"), f"_avgn_{name}")
                avg_div.append(name)
    for it in (() if precombine else agg_items):
        name = it.name
        fcol = f"_flt_{name}" if it.filter_pred else it.col
        if it.fn == "count" and it.distinct:
            aggs.append(ExactDistinct(it.col, alias_name=name))
        elif it.fn in ("sum", "avg") and it.distinct:
            from .udaf import DistinctValuesAgg

            aggs.append(DistinctValuesAgg(it.col, alias_name=name,
                                          finalize=it.fn))
        elif it.fn in ("arg_max", "arg_min"):
            from .udaf import ArgMinMaxAgg

            aggs.append(ArgMinMaxAgg(it.col, it.col2, alias_name=name,
                                     mode=it.fn[4:]))
        elif it.fn == "string_agg":
            from .udaf import StringAggAgg

            sep, desc = it.default
            aggs.append(StringAggAgg(it.col, sep, it.col2, desc=desc,
                                     alias_name=name))
        elif it.fn == "count":
            if it.filter_pred:        # sum of the 0/1 mask column
                aggs.append(Sum(fcol, alias_name=name))
            elif it.col is None:
                if plan.group_by:
                    aggs.append(Count(alias_name=name))
                else:
                    # Ray 2.49: an argless Count in a GLOBAL aggregate
                    # returns 0 (grouped and on-column forms are fine) —
                    # count a physical fact column with ignore_nulls=False
                    # instead, which is the same row count
                    aggs.append(Count(on=per_table[plan.table][0],
                                      ignore_nulls=False, alias_name=name))
            else:
                aggs.append(Count(on=it.col, ignore_nulls=True,
                                  alias_name=name))
        elif it.fn == "sum":
            aggs.append(Sum(fcol, alias_name=name))
        elif it.fn == "money_sum":
            # exact integer-cents accumulation: per-row rounding is
            # deterministic and integer sums are order-independent, so
            # the result is bit-stable across block orders / runs
            # (unlike float SUM, whose last cent can flip with merge
            # order at ~1e8 magnitudes)
            aggs.append(Sum(f"_cents_{name}", alias_name=f"_cents_{name}"))
        elif it.fn == "money_avg":
            # same cents discipline as MONEY_SUM plus an exact non-null
            # count; the finalize divides ints, so the float result is the
            # SAME two deterministic ops on every run/merge order
            aggs.append(Sum(f"_cents_{name}", alias_name=f"_cents_{name}"))
            aggs.append(Count(on=f"_cents_{name}", ignore_nulls=True,
                              alias_name=f"_cnt_{name}"))
        elif it.fn == "avg":
            aggs.append(Mean(fcol, alias_name=name))
        elif it.fn == "min":
            aggs.append(Min(fcol, alias_name=name))
        elif it.fn == "max":
            aggs.append(Max(fcol, alias_name=name))
        elif it.fn == "approx_count_distinct":
            if plan.rollup:
                # finest level keeps the SERIALIZED sketch; each coarser
                # level re-merges blobs (SketchMergeAgg below), finish
                # decodes blob -> estimate once over the level union
                aggs.append(HllAgg(on=it.col, alias_name=f"_blob_{name}",
                                   p=hll_p, output="blob"))
                hll_blob_items.append(name)
            else:
                aggs.append(HllAgg(on=it.col, alias_name=name, p=hll_p))
            if with_bounds:
                rel = 3 * 1.04 / (2 ** hll_p) ** 0.5
                bounds.append((name, "hll_rel", rel))
        elif it.fn == "approx_quantile":
            phis = (it.phi,) if not with_bounds else tuple(sorted({
                max(0.0, it.phi - 1.65 / kll_k * 3), it.phi,
                min(1.0, it.phi + 1.65 / kll_k * 3)}))
            if plan.rollup:
                aggs.append(KllAgg(on=it.col, alias_name=f"_blob_{name}",
                                   k=kll_k, output="blob"))
                qblob_items.append((name, it.phi))
            else:
                aggs.append(KllAgg(on=it.col, alias_name=f"_kll_{name}",
                                   k=kll_k, phis=phis,
                                   output="quantiles"))
                posts.append((name, it.phi, phis))
        elif it.fn == "approx_quantile_tdigest":
            from .udaf import TDigestAgg

            if plan.rollup:
                aggs.append(TDigestAgg(on=it.col,
                                       alias_name=f"_blob_{name}",
                                       output="blob"))
                qblob_items.append((name, it.phi))
            else:
                aggs.append(TDigestAgg(on=it.col,
                                       alias_name=f"_kll_{name}",
                                       phis=(it.phi,),
                                       output="quantiles"))
                posts.append((name, it.phi, (it.phi,)))
        if it.round_to is not None:
            # rounding applies after finalize (and after Mean division)
            pass

    money = [(f"_cents_{it.name}", it.col) for it in agg_items
             if it.fn in ("money_sum", "money_avg")]
    if money:
        def to_cents(b: pa.Table, _mc=tuple(money)) -> pa.Table:
            for cname, col in _mc:
                cents = pc.cast(
                    pc.round(pc.multiply(pc.cast(b[col], pa.float64()),
                                         pa.scalar(100.0)), **_ROUND),
                    pa.int64())
                b = b.append_column(cname, cents)
            return b

        ds = ds.map_batches(to_cents, batch_format="pyarrow",
                            zero_copy_batch=True)

    if precombine:
        _keys = tuple(plan.group_by)
        _specs = tuple((c, f, out) for (c, f), out in arrow_specs.items())

        def block_combine(b: pa.Table, _sp=_specs,
                          _k=_keys) -> pa.Table:
            agg_list, renames = [], {}
            for col, fn, out in _sp:
                if fn == "count_all":
                    agg_list.append(([], "count_all"))
                    renames["count_all"] = out
                else:
                    agg_list.append((col, fn))
                    renames[f"{col}_{fn}"] = out
            g = b.group_by(list(_k), use_threads=False).aggregate(agg_list)
            return pa.table({renames.get(n, n): g[n]
                             for n in g.schema.names})

        ds = ds.map_batches(block_combine, batch_format="pyarrow",
                            zero_copy_batch=True)

    key_cols = list(plan.group_by)
    if plan.select_distinct and not aggs:
        # groupby needs ≥1 aggregate; the counter is dropped by finish()
        aggs.append(Count(alias_name="_distinct_n"))
    # Ray's sort-based groupby shuffle cannot compare None keys ('<' on
    # NoneType), so SQL's null group keys would crash. Wrap every key as
    # (_gkn_k is-null int8, _gk_k null-filled value) — bijective with the
    # original (the is-null bit disambiguates a real zero/'' from a filled
    # null), nulls form one SQL-style group, and `finish` reconstructs the
    # original column. Runs AFTER the map-side pre-combine, so the extra
    # bytes ride only the already-combined distinct-row blocks.
    gk_pairs: list[tuple[str, str, str]] = []   # (k, gkn, gk)
    if key_cols:
        gk_pairs = [(k, f"_gkn_{k}", f"_gk_{k}") for k in key_cols]

        def _wrap_keys(b: pa.Table, _ks=tuple(gk_pairs)) -> pa.Table:
            for k, gkn, gk in _ks:
                col = b[k]
                z = _zero_like(col.type)
                b = b.append_column(gkn, pc.cast(pc.is_null(col),
                                                 pa.int8()))
                b = b.append_column(gk, col if z is None
                                    else pc.fill_null(col, z))
            return b

        ds = ds.map_batches(_wrap_keys, batch_format="pyarrow",
                            zero_copy_batch=True)
        if precombine and _os.environ.get("VR_SQL_BUCKETAGG", "1") != "0":
            # exact decomposable aggs: bucketed Arrow hash merge — the
            # shuffle sorts a small int instead of the full key tuple
            out = _bucketed_group_merge(ds, gk_pairs, merge_specs,
                                        buckets=join_buckets * 2)
        else:
            out = ds.groupby(
                [c for _, gkn, gk in gk_pairs for c in (gkn, gk)]
            ).aggregate(*aggs)
    else:
        row = ds.aggregate(*aggs)
        out = rd.from_items([row])

    if plan.rollup:
        # ROLLUP = ONE distributed pass over the data (the finest grouped
        # aggregate above), then each coarser level re-aggregates the
        # group-count-sized finest PARTIALS (counts/sums/cents/min/max are
        # decomposable; AVG and MONEY_AVG re-sum their sum+count pairs) —
        # never a second scan of the input. Rolled-up keys are NULL with
        # their parquet-pinned types so the level union block-concatenates
        # cleanly; `finish` below then runs once over the union.
        import pyarrow.parquet as pq_

        # the finest partials feed len(key_cols)+1 consumers; without this
        # checkpoint each level would LAZILY re-run the whole input scan +
        # shuffle. The materialized set is group-count-sized (aggregate
        # output, not input) — the one place mid-pipeline materialization
        # is the scale-correct choice.
        out = out.materialize()
        ktypes: dict = {}
        for t in [plan.table] + [j[0] for j in plan.joins]:
            s_ = _table_schema(f"{sf_dir}/{t}.parquet")
            ktypes.update((n, ty) for n, ty in zip(s_.names, s_.types)
                          if n in key_cols)
        missing_t = [k for k in key_cols if k not in ktypes]
        if missing_t:
            # DERIVED keys (expression items grouped via alias —
            # EXTRACT(year …) AS y): their type is whatever the finest
            # pass produced, readable from its materialized _gk_<k>
            # wrapped key column
            osch = out.schema()
            otypes_r = (dict(zip(osch.names, osch.types))
                        if osch is not None else {})
            for k in list(missing_t):
                ty = otypes_r.get(f"_gk_{k}")
                if isinstance(ty, pa.DataType):
                    ktypes[k] = ty
                    missing_t.remove(k)
        if missing_t:
            # EMPTY input leaves even the finest pass schemaless — the
            # derived key's type is still statically determined: run its
            # expression over a ZERO-ROW batch of the source columns
            src_types: dict = {}
            for t in [plan.table] + [j[0] for j in plan.joins]:
                s_ = _table_schema(f"{sf_dir}/{t}.parquet")
                src_types.update(zip(s_.names, s_.types))
            for k in list(missing_t):
                tree = exprs.get(k)
                if tree is None:
                    continue
                try:
                    zb = pa.table({c: pa.array([], type=src_types[c])
                                   for c in _expr_cols(tree)})
                    zv = _eval_expr(zb, tree)
                    ktypes[k] = (zv.type if not isinstance(zv, pa.Scalar)
                                 else zv.type)
                    missing_t.remove(k)
                except Exception:
                    pass
        if missing_t:
            raise ValueError("GROUP BY ROLLUP key types could not be "
                             f"resolved for {missing_t}")
        reaggs, re_names = [], []
        for it in agg_items:
            name = it.name
            if it.fn in ("count", "sum"):
                reaggs.append(Sum(name, alias_name=name))
                re_names.append(name)
            elif it.fn == "min":
                reaggs.append(Min(name, alias_name=name))
                re_names.append(name)
            elif it.fn == "max":
                reaggs.append(Max(name, alias_name=name))
                re_names.append(name)
            elif it.fn == "money_sum":
                reaggs.append(Sum(f"_cents_{name}",
                                  alias_name=f"_cents_{name}"))
                re_names.append(f"_cents_{name}")
            elif it.fn == "money_avg":
                reaggs.append(Sum(f"_cents_{name}",
                                  alias_name=f"_cents_{name}"))
                reaggs.append(Sum(f"_cnt_{name}",
                                  alias_name=f"_cnt_{name}"))
                re_names.extend([f"_cents_{name}", f"_cnt_{name}"])
            elif it.fn in ("approx_count_distinct", "approx_quantile",
                           "approx_quantile_tdigest"):
                from .udaf import SketchMergeAgg
                reaggs.append(SketchMergeAgg(f"_blob_{name}",
                                             alias_name=f"_blob_{name}"))
                re_names.append(f"_blob_{name}")
            else:                       # avg: re-sum the sum+count pair
                reaggs.append(Sum(f"_avgs_{name}",
                                  alias_name=f"_avgs_{name}"))
                reaggs.append(Sum(f"_avgn_{name}",
                                  alias_name=f"_avgn_{name}"))
                re_names.extend([f"_avgs_{name}", f"_avgn_{name}"])
        # the finest aggregate's key columns are the null-safe wrapped
        # pairs; a rolled-up key is simply (_gkn=1, _gk=null) — `finish`
        # reconstructs it as SQL NULL with no extra machinery
        col_order = ([c for _, gkn, gk in gk_pairs for c in (gkn, gk)]
                     + re_names
                     + [it.name for it in grouping_items])

        def _level_fn(level_keys: tuple):
            absent = tuple((gkn, gk, ktypes[k])
                           for k, gkn, gk in gk_pairs
                           if k not in level_keys)
            # GROUPING(col) is a per-LEVEL literal: 1 where the level
            # rolls the key up, 0 where it groups by it
            gmarks = tuple((it.name, 0 if it.col in level_keys else 1)
                           for it in grouping_items)

            def fn(b: pa.Table) -> pa.Table:
                for gkn, gk, ty in absent:
                    b = b.append_column(
                        gkn, pa.chunked_array([pa.array(
                            [1] * b.num_rows, pa.int8())]))
                    b = b.append_column(gk, pa.nulls(b.num_rows, type=ty))
                for gname, gval in gmarks:
                    b = b.append_column(
                        gname, pa.chunked_array([pa.array(
                            [gval] * b.num_rows, pa.int64())]))
                return b.select(col_order)
            return fn

        parts = []
        if plan.gsets is not None:
            # GROUPING SETS: only the REQUESTED levels emit (duplicates
            # emit twice, per SQL); a set equal to the full key union IS
            # the finest pass — no re-aggregation
            full = tuple(key_cols)
            _levels = []
            for s in plan.gsets:
                lv = [k for k in key_cols if k in s]
                if len(lv) != len(set(s)):
                    raise ValueError(
                        f"GROUPING SET {s} names keys outside GROUP BY")
                if tuple(lv) == full:
                    parts.append(out.map_batches(_level_fn(full),
                                                 batch_format="pyarrow",
                                                 zero_copy_batch=True))
                else:
                    _levels.append(lv)
        else:
            parts.append(out.map_batches(_level_fn(tuple(key_cols)),
                                         batch_format="pyarrow",
                                         zero_copy_batch=True))
            if plan.cube:
                from itertools import combinations
                _levels = [list(c)
                           for n in range(len(key_cols) - 1, -1, -1)
                           for c in combinations(key_cols, n)]
            else:
                _levels = [key_cols[:n]
                           for n in range(len(key_cols) - 1, -1, -1)]
        for lv in _levels:
            if lv:
                lvl = out.groupby(
                    [c for k, gkn, gk in gk_pairs if k in lv
                     for c in (gkn, gk)]).aggregate(*reaggs)
            else:
                grand = out.aggregate(*reaggs)
                # SQL: the grand-total () row exists even over an EMPTY
                # input — COUNT-family partials are 0 there, value
                # aggregates stay NULL. Ray's aggregate over an empty
                # Dataset returns None values (or None outright), which
                # would put a None through the sort's range sampler.
                if grand is None:
                    grand = {}
                zero_partials = set()
                for it in agg_items:
                    if it.fn == "count":
                        zero_partials.add(it.name)
                    elif it.fn == "money_avg":
                        zero_partials.add(f"_cnt_{it.name}")
                    elif it.fn == "avg":
                        zero_partials.add(f"_avgn_{it.name}")
                oschema = out.schema()
                otypes = (dict(zip(oschema.names, oschema.types))
                          if oschema is not None else {})
                cols_g = {}
                for n_ in re_names:
                    v = grand.get(n_)
                    if v is None and n_ in zero_partials:
                        v = 0
                    ty = otypes.get(n_)
                    if not isinstance(ty, pa.DataType):
                        ty = (pa.int64() if n_ in zero_partials
                              else pa.float64()) if v is None else None
                    cols_g[n_] = pa.array([v], type=ty)
                lvl = rd.from_arrow(pa.table(cols_g))
            parts.append(lvl.map_batches(_level_fn(tuple(lv)),
                                         batch_format="pyarrow",
                                         zero_copy_batch=True))
        out = parts[0].union(*parts[1:])

    def finish(batch: pa.Table) -> pa.Table:
        # reconstruct the original group-key columns from the null-safe
        # (_gkn, _gk) wrap — a filled value with _gkn=1 (including every
        # rolled-up ROLLUP key) becomes SQL NULL
        for k, gkn, gk in gk_pairs:
            if gk in batch.schema.names:
                arr = batch[gk]
                nul = pc.cast(batch[gkn], pa.bool_())
                batch = batch.append_column(
                    k, pc.if_else(nul, pa.scalar(None, type=arr.type),
                                  arr))
                batch = batch.drop_columns([gkn, gk])
        for name, phi, phis in posts:
            lst = batch[f"_kll_{name}"]
            vals = pc.list_element(lst, phis.index(phi))
            batch = batch.append_column(name, pc.cast(vals, pa.float64()))
            if len(phis) > 1:
                batch = batch.append_column(
                    f"{name}_bound_lo",
                    pc.cast(pc.list_element(lst, 0), pa.float64()))
                batch = batch.append_column(
                    f"{name}_bound_hi",
                    pc.cast(pc.list_element(lst, len(phis) - 1),
                            pa.float64()))
            batch = batch.drop_columns([f"_kll_{name}"])
        for name in hll_blob_items:
            # group-count-sized level union: one python decode per row
            from .sketches.base import Sketch as _Sk
            blobs = batch[f"_blob_{name}"].to_pylist()
            batch = batch.append_column(name, pa.array(
                [None if b is None else float(_Sk.from_bytes(b).finalize())
                 for b in blobs], pa.float64()))
            batch = batch.drop_columns([f"_blob_{name}"])
        for name, phi in qblob_items:
            from .sketches.base import Sketch as _Sk
            blobs = batch[f"_blob_{name}"].to_pylist()
            batch = batch.append_column(name, pa.array(
                [None if b is None
                 else float(_Sk.from_bytes(b).quantiles([phi])[0])
                 for b in blobs], pa.float64()))
            batch = batch.drop_columns([f"_blob_{name}"])
        for name, kind, rel in bounds:
            est = pc.cast(batch[name], pa.float64())
            batch = batch.append_column(
                f"{name}_bound", pc.multiply(est, pa.scalar(rel)))
        for name in avg_div:
            # pre-combined AVG finalize: Sum(partial sums)/Sum(partial
            # counts) — the same two ops Ray's Mean runs; all-null group
            # (count 0) yields SQL's NULL
            s = pc.cast(batch[f"_avgs_{name}"], pa.float64())
            n_ = pc.cast(batch[f"_avgn_{name}"], pa.float64())
            batch = batch.append_column(
                name, pc.if_else(pc.greater(n_, pa.scalar(0.0)),
                                 pc.divide(s, n_),
                                 pa.scalar(None, pa.float64())))
            batch = batch.drop_columns([f"_avgs_{name}", f"_avgn_{name}"])
        for it in agg_items:
            if it.fn == "money_sum":
                batch = batch.append_column(
                    it.name,
                    pc.divide(pc.cast(batch[f"_cents_{it.name}"],
                                      pa.float64()), pa.scalar(100.0)))
                batch = batch.drop_columns([f"_cents_{it.name}"])
            elif it.fn == "money_avg":
                # (cents / 100.0) / n — mirrors the DuckDB re-derivation
                # SUM(CAST(ROUND(c*100) AS BIGINT)) / 100.0 / COUNT(c)
                # operation-for-operation, so the float64 result is
                # bit-identical
                euros = pc.divide(pc.cast(batch[f"_cents_{it.name}"],
                                          pa.float64()), pa.scalar(100.0))
                batch = batch.append_column(
                    it.name,
                    pc.divide(euros, pc.cast(batch[f"_cnt_{it.name}"],
                                             pa.float64())))
                batch = batch.drop_columns([f"_cents_{it.name}",
                                            f"_cnt_{it.name}"])
        for it in aggexpr_items:
            # post-aggregate arithmetic: one vectorized pass over the
            # aggregated (group-count-sized) table; hidden columns drop
            # at the projection below
            arr = _eval_expr(batch, it.expr)
            if isinstance(arr, pa.Array):
                arr = pa.chunked_array([arr])
            batch = batch.append_column(it.name, arr)
        for it in agg_items + aggexpr_items:
            if it.round_to is not None:
                i = batch.schema.get_field_index(it.name)
                batch = batch.set_column(
                    i, it.name,
                    pc.round(pc.cast(batch[it.name], pa.float64()),
                             ndigits=it.round_to, **_ROUND))
        # plain (group-key) columns selected under an alias surface as
        # the alias — SQL output naming
        for it in plan.items:
            if (it.fn == "col" and it.alias and it.alias != it.col
                    and it.alias not in batch.schema.names):
                batch = batch.append_column(it.alias, batch[it.col])
        # Ray's groupby shuffle can downgrade a timestamp group key to
        # second precision (pandas block roundtrip); re-pin parquet's
        # canonical microsecond unit so output dtypes match any SQL
        # engine's (lossless — the values are already second-aligned)
        for i, f in enumerate(batch.schema):
            if pa.types.is_timestamp(f.type) and f.type.unit != "us":
                batch = batch.set_column(
                    i, f.name,
                    pc.cast(batch[f.name], pa.timestamp("us", f.type.tz)))
        # projection order: as written in the SELECT list
        cols = [it.name for it in plan.items]
        extra = [n for n in batch.schema.names if n not in cols]
        return batch.select(cols + [n for n in extra
                                    if n.endswith(("_bound", "_bound_lo",
                                                   "_bound_hi"))])

    out = out.map_batches(finish, batch_format="pyarrow")

    # -------------------------------------------------- HAVING
    if plan.having:
        out_names = {it.name for it in plan.items} | set(plan.group_by)
        for p in plan.having:
            if (any(a.sub is not None for a in _pred_atoms(p))
                    or not _pred_cols([p]) <= out_names):
                raise ValueError("HAVING predicates must reference "
                                 "SELECTed aliases/keys, got "
                                 f"{sorted(_pred_cols([p]) - out_names)}")
        out = out.map_batches(_scalar_filter_fn(plan.having),
                              batch_format="pyarrow")

    # -------------------------------------------------- order / limit
    if plan.order_by:
        if plan.order_nulls or len(plan.order_by) > 1:
            out = _sort_with_nulls(out, plan.order_by, plan.order_nulls,
                                   limit=plan.limit)
        else:
            c, d = plan.order_by[0]
            out = out.sort(c, descending=d)
    if plan.limit is not None:
        out = out.limit(plan.limit)
    # hidden items (HAVING-lifted aggregates, ORDER BY / GROUP BY
    # expression keys) drop AFTER the sort that may reference them
    hidden = [it.name for it in plan.items if it.hidden]
    if hidden:
        out = out.map_batches(
            lambda b, _h=tuple(hidden): b.drop_columns(list(_h)),
            batch_format="pyarrow")
    return out


def _drop_hidden_items(out, plan: "_Plan", explain: list | None):
    """Drop hidden window items (e.g. the DISTINCT ON row-number) AFTER
    QUALIFY consumed them, before ORDER BY/LIMIT and the caller."""
    hidden = [it.name for it in plan.items if it.hidden]
    if not hidden or explain is not None:
        return out
    return out.map_batches(
        lambda b, _h=tuple(hidden): b.drop_columns(
            [c for c in _h if c in b.schema.names]),
        batch_format="pyarrow", zero_copy_batch=True)


def _apply_qualify(out, plan: "_Plan", explain: list | None):
    """QUALIFY — one vectorized filter over the windowed stream after
    window columns attach (post-finish, so predicates reference SELECTed
    item names; runs before ORDER BY/LIMIT, SQL's logical order)."""
    if not plan.qualify:
        return out
    names = {it.name for it in plan.items}
    bad = _pred_cols(plan.qualify) - names
    if bad:
        raise ValueError("QUALIFY predicates must reference SELECTed "
                         f"items, got {sorted(bad)}")
    if explain is not None:
        explain.append(f"QUALIFY {_fmt_preds(plan.qualify)} -> "
                       "vectorized post-window filter")
        return out
    return out.map_batches(_scalar_filter_fn(plan.qualify),
                           batch_format="pyarrow", zero_copy_batch=True)


def _run_window_sql(plan: _Plan, sf_dir: str, *, buckets: int = 32,
                    max_broadcast_rows: int = 2_000_000,
                    approx_membership: bool = False,
                    bloom_capacity: int = 1_000_000,
                    bloom_fpp: float = 0.01,
                    explain: list | None = None,
                    sub: tuple | None = None):
    """Execute a SELECT whose items carry OVER clauses — routed to
    window.partitioned_window (one hash-bucket shuffle on the partition
    key, vectorized per-bucket prefix scans; ANSI default RANGE framing).
    All window items must share ONE window spec; plain column items pass
    through. The scan phase is the shared _scan_with_joins: scalar WHERE
    filters push below the window shuffle at the pruned read, JOIN chains
    and IN (SELECT …) membership compose (all applied BEFORE the window,
    per SQL's logical order). GROUP BY / HAVING do not combine with
    window items (raise) — the standard engines' separate window stage."""
    import ray.data as rd

    from .window import partitioned_window

    if plan.group_by or plan.having:
        raise ValueError("window functions cannot combine with "
                         "GROUP BY/HAVING in one router query")
    # items that are EXPRESSIONS over window results (ratio-to-report:
    # 100 * v / SUM(v) OVER (…)): each ("wagg", _Agg) leaf computes as a
    # HIDDEN window item, the expression then derives in the finish
    # stage (one vectorized pass over the windowed batch), and the
    # hidden leaf columns drop at the projection
    wexpr_items = [it for it in plan.items if it.fn == "wexpr"]
    # window leaves inside QUALIFY predicates: compute each as a HIDDEN
    # window ITEM (rides sel through the finish so the qualify filter
    # sees it; _drop_hidden_items removes it at the end)
    q_hidden: list[_Agg] = []

    def _qrepl(tree):
        if isinstance(tree, _Pred):
            if tree.op in ("and", "or", "not"):
                tree.value = [_qrepl(c) for c in tree.value]
            if tree.lexpr is not None:
                tree.lexpr = _qrepl(tree.lexpr)
            if tree.rexpr is not None:
                tree.rexpr = _qrepl(tree.rexpr)
            return tree
        if not isinstance(tree, tuple):
            return tree
        if len(tree) and tree[0] == "wagg":
            ag = tree[1]
            ag.alias = f"_qw{len(q_hidden)}"
            ag.hidden = True
            q_hidden.append(ag)
            return ("col", ag.alias)
        return tuple(_qrepl(c) for c in tree)

    for qp in plan.qualify:
        for a in _pred_atoms(qp):
            if a.lexpr is not None:
                a.lexpr = _qrepl(a.lexpr)
            if a.rexpr is not None:
                a.rexpr = _qrepl(a.rexpr)
    plan.items.extend(q_hidden)
    # the final ORDER BY may reference UNSELECTED plain columns (SQL
    # sorts before projection): carry them as hidden passthroughs, the
    # post-sort _drop_hidden_items removes them
    have_names = ({it.name for it in plan.items}
                  | {it.col for it in plan.items if it.col})
    for c_, _d in plan.order_by:
        if c_ not in have_names:
            plan.items.append(_Agg("col", c_, hidden=True))
            have_names.add(c_)
    hidden_wleaves: list[_Agg] = []
    wexpr_srccols: set = set()
    for it in wexpr_items:
        if not it.alias:
            raise ValueError("an expression over window functions needs "
                             "AS alias")

        def _wrepl(tree, _h=hidden_wleaves):
            if isinstance(tree, _Pred):
                # CASE WHEN predicates may carry window leaves in their
                # comparison sides — rewrite in place (preds are ours)
                if tree.op in ("and", "or", "not"):
                    tree.value = [_wrepl(c) for c in tree.value]
                if tree.lexpr is not None:
                    tree.lexpr = _wrepl(tree.lexpr)
                if tree.rexpr is not None:
                    tree.rexpr = _wrepl(tree.rexpr)
                return tree
            if not isinstance(tree, tuple):
                return tree
            if len(tree) and tree[0] == "wagg":
                ag = tree[1]
                ag.alias = f"_wl{len(_h)}"
                ag.hidden = True
                _h.append(ag)
                return ("col", ag.alias)
            return tuple(_wrepl(c) for c in tree)

        it.expr = _wrepl(it.expr)
        wexpr_srccols |= {c for c in _expr_cols(it.expr)
                          if not c.startswith("_wl")}

    win_items = ([it for it in plan.items if it.window]
                 + hidden_wleaves)
    passthru = [it for it in plan.items
                if not it.window and it.fn != "wexpr"]
    # plain scalar-expression items (CASE, arithmetic, scalar fns) ride
    # along: each derives as ONE vectorized column right after the scan,
    # before any window shuffle
    pass_exprs: dict[str, tuple] = {}
    for it in passthru:
        if it.fn == "expr":
            if not it.alias:
                raise ValueError("a scalar expression item in a window "
                                 "query needs AS alias")
            pass_exprs[it.alias] = it.expr
        elif it.fn != "col":
            raise ValueError("non-window aggregates cannot mix with "
                             "window items (no implicit GROUP BY)")
    # window aggregates over EXPRESSION arguments: derive each argument
    # to a hidden column in the same vectorized stage as the pass-through
    # expression items, then window over the derived column
    for it in win_items:
        if it.expr is not None:
            if not it.alias:
                raise ValueError("a window aggregate over an expression "
                                 "needs AS alias")
            dname = f"_wx_{it.alias}"
            pass_exprs[dname] = it.expr
            it.col = dname
    expr_cols = set()
    for tree in pass_exprs.values():
        expr_cols |= _expr_cols(tree)
    # group items by their window spec — each DISTINCT spec runs as its
    # own partitioned_window pass (one hash-bucket shuffle per spec;
    # every pass appends its columns and passes the rest through, so the
    # passes chain on one streaming Dataset)
    groups: list[tuple[tuple, list]] = []
    for it in win_items:
        for sp, its in groups:
            if sp == it.window:
                its.append(it)
                break
        else:
            groups.append((it.window, [it]))
    if len(groups) > 1:
        if any(sp[2] is not None and sp[2][0] == "range"
               for sp, _ in groups):
            raise ValueError("a RANGE INTERVAL frame cannot mix with "
                             "other window specs in one query")
        for sp, its in groups:
            bad = [it.fn for it in its
                   if sp[2] is not None and sp[2][0] == "rows"
                   and it.fn not in _WINDOW_CUM]
            if bad:
                raise ValueError(f"a ROWS frame applies to cumulative "
                                 f"aggregates only, got {bad}")
        needed = set()
        for (g_part, g_order, _g_frame), _its in groups:
            needed |= {*g_part, *(c for c, _ in g_order)}
        needed.update(it.col for it in plan.items
                      if it.col is not None and it.col not in pass_exprs)
        needed.update(it.col for it in win_items
                      if it.col is not None and it.col not in pass_exprs)
        needed |= wexpr_srccols
        needed |= expr_cols
        needed_post = set(needed)
        needed.update(_pred_cols(plan.where))
        for _tbl, a, b, _how in plan.joins:
            needed.update(c for c in (a, b) if c)
        ds, _schemas2, _pt2 = _scan_with_joins(
            plan, sf_dir, needed, join_buckets=buckets,
            max_broadcast_rows=max_broadcast_rows,
            approx_membership=approx_membership,
            bloom_capacity=bloom_capacity, bloom_fpp=bloom_fpp,
            explain=explain, sub=sub, needed_post=needed_post)
        if pass_exprs and explain is None:
            ds = ds.map_batches(_expr_derive_fn(pass_exprs),
                                batch_format="pyarrow")
        out = ds
        for (g_part, g_order, g_frame), its in groups:
            g_specs = [{"func": it.fn, "col": it.col, "alias": it.name,
                        "offset": it.offset, "default": it.default}
                       for it in its]
            if explain is not None:
                explain.append(
                    f"WINDOW OVER (PARTITION BY {list(g_part)} ORDER BY "
                    f"{list(g_order)}) -> one hash-bucket shuffle on "
                    f"{list(g_part)} ({buckets} buckets), vectorized "
                    "per-bucket prefix scans; funcs="
                    + ", ".join(f"{sp_['func']}({sp_['col'] or ''})"
                                for sp_ in g_specs))
                continue
            out = partitioned_window(out, list(g_part), list(g_order),
                                     g_specs, buckets=buckets,
                                     frame=g_frame)
        if explain is not None:
            if plan.qualify:
                explain.append(f"QUALIFY {_fmt_preds(plan.qualify)} -> "
                               "vectorized post-window filter")
            if plan.order_by:
                explain.append(f"ORDER BY {plan.order_by} -> sorts the "
                               "windowed result")
            if plan.limit is not None:
                explain.append(f"LIMIT {plan.limit}")
            return rd.from_items([])
        rounds = [(it.name, it.round_to)
                  for it in list(win_items) + wexpr_items
                  if it.round_to is not None]
        sel = [it.name for it in plan.items]
        renames = [(it.col, it.alias) for it in plan.items
                   if it.fn == "col" and it.alias and it.alias != it.col]
        wspec = tuple((it.name, it.expr) for it in wexpr_items)

        def finish_multi(batch: pa.Table) -> pa.Table:
            for nm, ex in wspec:
                v = _eval_expr(batch, ex)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * batch.num_rows)
                batch = batch.append_column(nm, v)
            for name, nd in rounds:
                i = batch.schema.get_field_index(name)
                batch = batch.set_column(
                    i, name, pc.round(pc.cast(batch[name], pa.float64()),
                                      ndigits=nd, **_ROUND))
            for col, alias in renames:
                if alias not in batch.schema.names:
                    batch = batch.append_column(alias, batch[col])
            return batch.select(sel)

        out = out.map_batches(finish_multi, batch_format="pyarrow",
                              zero_copy_batch=True)
        out = _apply_qualify(out, plan, explain)
        if plan.order_by:
            out = _sort_with_nulls(out, plan.order_by, plan.order_nulls,
                                   limit=plan.limit)
        if plan.limit is not None:
            out = out.limit(plan.limit)
        return _drop_hidden_items(out, plan, explain)

    spec0 = win_items[0].window
    part, order, frame = spec0
    if frame is not None and frame[0] == "rows":
        bad = [it.fn for it in win_items if it.fn not in _WINDOW_CUM]
        if bad:
            raise ValueError(f"a ROWS frame applies to cumulative "
                             f"aggregates only, got {bad}")
    if frame is not None and frame[0] == "range":
        bad = [it.fn for it in win_items
               if it.fn not in ("sum", "avg", "count")]
        if bad:
            raise ValueError(f"a RANGE INTERVAL frame supports "
                             f"SUM/AVG/COUNT only, got {bad}")
        if len(part) != 1:
            raise ValueError("a RANGE INTERVAL frame requires exactly "
                             "one PARTITION BY column")
        vcols = {it.col for it in win_items if it.fn in ("sum", "avg")}
        if len(vcols) > 1:
            raise ValueError("RANGE-frame SUM/AVG items must share one "
                             f"value column (got {sorted(vcols)})")
    part = list(part)
    order = list(order)

    needed = {*part, *(c for c, _ in order)}
    needed.update(it.col for it in plan.items
                  if it.col is not None and it.col not in pass_exprs)
    needed.update(it.col for it in win_items
                  if it.col is not None and it.col not in pass_exprs)
    needed |= wexpr_srccols
    needed |= expr_cols
    needed_post = set(needed)
    needed.update(_pred_cols(plan.where))
    for _tbl, a, b, _how in plan.joins:
        needed.update(c for c in (a, b) if c)
    ds, _schemas, _per_table = _scan_with_joins(
        plan, sf_dir, needed, join_buckets=buckets,
        max_broadcast_rows=max_broadcast_rows,
        approx_membership=approx_membership,
        bloom_capacity=bloom_capacity, bloom_fpp=bloom_fpp,
        explain=explain, sub=sub, needed_post=needed_post)
    if pass_exprs and explain is None:
        ds = ds.map_batches(_expr_derive_fn(pass_exprs),
                            batch_format="pyarrow")

    specs = [{"func": it.fn, "col": it.col, "alias": it.name,
              "offset": it.offset, "default": it.default}
             for it in win_items]
    if frame is not None and frame[0] == "range":
        if wexpr_items:
            raise ValueError("expressions over window results do not "
                             "combine with RANGE INTERVAL frames")
        from .window import rolling_range_agg

        ts_col = order[0][0]
        vcols = {it.col for it in win_items if it.fn in ("sum", "avg")}
        value_col = next(iter(vcols)) if vcols else ts_col
        fn_map = {"sum": "rolling_sum", "avg": "rolling_mean",
                  "count": "rolling_count"}
        aggs = tuple(sorted({{"sum": "sum", "avg": "mean",
                              "count": "count"}[it.fn]
                             for it in win_items}))
        if explain is not None:
            explain.append(
                f"WINDOW OVER (PARTITION BY {part} ORDER BY {ts_col} "
                f"RANGE BETWEEN INTERVAL {frame[1]} SECOND PRECEDING AND "
                f"CURRENT ROW) -> window.rolling_range_agg: one "
                f"hash-bucket shuffle on {part[0]} ({buckets} buckets), "
                "per-key vectorized prefix-sum + searchsorted frames "
                "(endpoints inclusive, equal-ts peers share frames); "
                "funcs=" + ", ".join(
                    f"{s['func']}({s['col'] or ''})" for s in specs))
            if plan.order_by:
                explain.append(f"ORDER BY {plan.order_by} -> sorts the "
                               "windowed result")
            if plan.limit is not None:
                explain.append(f"LIMIT {plan.limit}")
            return rd.from_items([])
        out = rolling_range_agg(ds, key=part[0], ts_col=ts_col,
                                value_col=value_col, width_s=frame[1],
                                aggs=aggs, buckets=buckets)
        sel = [it.name for it in plan.items]
        win_map = [(fn_map[it.fn], it.name) for it in win_items]
        renames = [(it.col, it.alias) for it in plan.items
                   if it.fn == "col" and it.alias and it.alias != it.col]
        rounds = [(it.name, it.round_to) for it in win_items
                  if it.round_to is not None]

        def finish_range(batch: pa.Table) -> pa.Table:
            for src, alias in win_map:
                if alias not in batch.schema.names:
                    batch = batch.append_column(alias, batch[src])
            for col, alias in renames:
                if alias not in batch.schema.names:
                    batch = batch.append_column(alias, batch[col])
            for name, nd in rounds:
                i = batch.schema.get_field_index(name)
                batch = batch.set_column(
                    i, name, pc.round(pc.cast(batch[name], pa.float64()),
                                      ndigits=nd, **_ROUND))
            return batch.select(sel)

        out = out.map_batches(finish_range, batch_format="pyarrow",
                              zero_copy_batch=True)
        out = _apply_qualify(out, plan, explain)
        if plan.order_by:
            out = _sort_with_nulls(out, plan.order_by, plan.order_nulls,
                                   limit=plan.limit)
        if plan.limit is not None:
            out = out.limit(plan.limit)
        return _drop_hidden_items(out, plan, explain)
    if explain is not None:
        frame_note = ("ANSI default RANGE framing: peers share frame "
                      "results" if frame is None else
                      f"ROWS BETWEEN "
                      f"{'UNBOUNDED' if frame[1] is None else frame[1]} "
                      "PRECEDING AND CURRENT ROW: per-row frames, "
                      "vectorized rolling scans")
        explain.append(
            f"WINDOW OVER (PARTITION BY {part} ORDER BY {order}) -> one "
            f"hash-bucket shuffle on {part} ({buckets} buckets), "
            "vectorized per-bucket prefix scans; funcs="
            + ", ".join(f"{s['func']}({s['col'] or ''})" for s in specs)
            + f" ({frame_note})")
        if plan.qualify:
            explain.append(f"QUALIFY {_fmt_preds(plan.qualify)} -> "
                           "vectorized post-window filter")
        if plan.order_by:
            explain.append(f"ORDER BY {plan.order_by} -> sorts the "
                           "windowed result")
        if plan.limit is not None:
            explain.append(f"LIMIT {plan.limit}")
        return rd.from_items([])

    out = partitioned_window(ds, part, order, specs, buckets=buckets,
                             frame=frame)

    rounds = [(it.name, it.round_to)
              for it in list(win_items) + wexpr_items
              if it.round_to is not None]
    sel = [it.name for it in plan.items]
    renames = [(it.col, it.alias) for it in plan.items
               if it.fn == "col" and it.alias and it.alias != it.col]
    wspec = tuple((it.name, it.expr) for it in wexpr_items)

    def finish(batch: pa.Table) -> pa.Table:
        for nm, ex in wspec:
            v = _eval_expr(batch, ex)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * batch.num_rows)
            batch = batch.append_column(nm, v)
        for name, nd in rounds:
            i = batch.schema.get_field_index(name)
            batch = batch.set_column(
                i, name, pc.round(pc.cast(batch[name], pa.float64()),
                                  ndigits=nd, **_ROUND))
        for col, alias in renames:
            if alias not in batch.schema.names:
                batch = batch.append_column(alias, batch[col])
        return batch.select(sel)

    out = out.map_batches(finish, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = _apply_qualify(out, plan, explain)
    if plan.order_by:
        out = _sort_with_nulls(out, plan.order_by, plan.order_nulls,
                               limit=plan.limit)
    if plan.limit is not None:
        out = out.limit(plan.limit)
    return _drop_hidden_items(out, plan, explain)


def explain_sql(sql: str, sf_dir: str, **opts) -> str:
    """EXPLAIN for the router: the routing decisions run_sql would take
    for this exact query over this exact data, one line per decision.

    The trace is emitted by run_sql's OWN branches (``explain=`` hook),
    so data-dependent choices — broadcast vs hash join, pushdown splits,
    membership route — cannot diverge from what execution does. Only
    metadata-level work happens: parquet schemas and row counts, plus the
    small-dimension key-uniqueness probe the broadcast gate itself makes.
    No pass over the fact data runs."""
    lines: list[str] = []
    run_sql(sql, sf_dir, explain=lines, **opts)
    return "\n".join(lines)


# ======================================================================
# SQL over the sketch STORE — the Verdict-style interactive loop: the
# same aggregate-SQL text answered in milliseconds from PREBUILT per-key
# sketch state (query.SketchStore), never rescanning the data.
# ======================================================================
def run_sql_store(sql: str, store, key_col: str | None = None,
                  with_bounds: bool = False) -> pa.Table:
    """Answer aggregate SQL from a ``query.SketchStore``.

    Supported: ``SELECT [key,] agg... FROM <any> [WHERE key =/!=/IN ...]
    [GROUP BY key] [ORDER BY ...] [LIMIT n]`` with aggs
    - APPROX_COUNT_DISTINCT(col) → HLL estimate (per key, or the HLL
      rollup union when there is no GROUP BY)
    - APPROX_QUANTILE(col, phi)  → KLL (per key; no-GROUP-BY form merges
      the per-key KLLs first — same mergeable-state algebra)
    - COUNT(*) → the CMS exact row counter (per key / summed)
    The column name inside the agg is advisory (a store does not record
    which column each sketch ingested); WHERE may only constrain the
    group key. Output column dtypes mirror run_sql's. with_bounds adds
    the same ``_bound`` columns as the scan router."""
    from .sketches import Sketch

    plan = parse_sql(sql)
    if plan.unions:
        raise ValueError("UNION ALL is not answerable from the sketch "
                         "store; use run_sql")
    if any(it.window or it.fn == "wexpr" for it in plan.items):
        raise ValueError("window functions are not answerable from the "
                         "sketch store; use run_sql")
    if any(it.filter_pred for it in plan.items):
        raise ValueError("FILTER (WHERE …) needs the raw rows; the store "
                         "holds only sketch state — use run_sql")
    kc = key_col or "group_key"
    keys = store.keys()
    # WHERE: key-equality / IN filters only (there is no other column)
    for p in plan.where:
        if p.sub is not None:
            raise ValueError("store router does not support IN (SELECT …)")
        if p.op == "=":
            keys = [k for k in keys if k == p.value]
        elif p.op == "!=":
            keys = [k for k in keys if k != p.value]
        elif p.op == "in":
            keys = [k for k in keys if k in set(p.value)]
        elif p.op == "not_in":
            keys = [k for k in keys if k not in set(p.value)]
        else:
            raise ValueError(f"store router WHERE supports =/!=/IN on the "
                             f"group key, got {p.op!r}")
    grouped = bool(plan.group_by)
    if grouped and plan.group_by != [kc] and len(plan.group_by) != 1:
        raise ValueError("store router supports GROUP BY the single key")

    agg_items = [it for it in plan.items if it.fn != "col"]
    import numpy as np

    def _round(vals, nd):
        if nd is None:
            return vals
        scale = 10.0 ** nd
        v = np.asarray(vals, dtype=np.float64)
        return np.copysign(np.floor(np.abs(v) * scale + 0.5), v) / scale

    cols: dict[str, object] = {}
    bound_cols: dict[str, object] = {}
    if grouped:
        cols[plan.group_by[0]] = pa.array(keys, pa.string())
        for it in agg_items:
            name = it.name
            if it.fn == "approx_count_distinct":
                sk = [store.sketch(k, "hll") for k in keys]
                vals = [s.estimate() for s in sk]
                if with_bounds:
                    bound_cols[f"{name}_bound"] = pa.array(
                        [3 * s.error_bound() * s.estimate() for s in sk],
                        pa.float64())
            elif it.fn == "approx_quantile":
                vals = [store.sketch(k, "kll").quantile(it.phi)
                        for k in keys]
                if with_bounds:
                    lo, hi = [], []
                    for k in keys:
                        s = store.sketch(k, "kll")
                        eps = s.error_bound()
                        lo.append(s.quantile(max(0.0, it.phi - eps)))
                        hi.append(s.quantile(min(1.0, it.phi + eps)))
                    bound_cols[f"{name}_bound_lo"] = pa.array(lo, pa.float64())
                    bound_cols[f"{name}_bound_hi"] = pa.array(hi, pa.float64())
            elif it.fn == "count" and it.col is None:
                cols[name] = pa.array(
                    [int(store.sketch(k, "cms").n) for k in keys], pa.int64())
                continue
            else:
                raise ValueError(f"store router cannot answer {it.fn!r}")
            cols[name] = pa.array(_round(vals, it.round_to), pa.float64())
    else:
        for it in agg_items:
            name = it.name
            if it.fn == "approx_count_distinct":
                sk = store.rollup("hll", keys)
                vals = [sk.estimate()]
                if with_bounds:
                    bound_cols[f"{name}_bound"] = pa.array(
                        [3 * sk.error_bound() * sk.estimate()], pa.float64())
            elif it.fn == "approx_quantile":
                acc = None
                for k in keys:
                    s = Sketch.from_bytes(
                        store.sketch(k, "kll").to_bytes())  # copy
                    acc = s if acc is None else acc.merge(s)
                vals = [acc.quantile(it.phi)]
                if with_bounds:
                    eps = acc.error_bound()
                    bound_cols[f"{name}_bound_lo"] = pa.array(
                        [acc.quantile(max(0.0, it.phi - eps))], pa.float64())
                    bound_cols[f"{name}_bound_hi"] = pa.array(
                        [acc.quantile(min(1.0, it.phi + eps))], pa.float64())
            elif it.fn == "count" and it.col is None:
                cols[name] = pa.array(
                    [sum(int(store.sketch(k, "cms").n) for k in keys)],
                    pa.int64())
                continue
            else:
                raise ValueError(f"store router cannot answer {it.fn!r}")
            cols[name] = pa.array(_round(vals, it.round_to), pa.float64())

    out = pa.table({**cols, **bound_cols})
    if plan.order_by:
        import pyarrow.compute as _pc

        out = out.take(_pc.sort_indices(
            out, sort_keys=[(c, "descending" if d else "ascending")
                            for c, d in plan.order_by]))
    if plan.limit is not None:
        out = out.slice(0, plan.limit)
    return out


# ======================================================================
# Progressive SQL — online aggregation over the scan: the SAME grammar
# answered as a stream of converging (estimates, envelope) emissions
# while Ray Data's streaming executor scans the table. Only per-key
# partial-sketch/counter blob rows ever reach the driver (KiB per input
# block) — raw rows stay in the workers, so the surface is scale-true.
# Public-VerdictDB analogy: block-by-block progressive answers with
# shrinking error envelopes (SIGMOD'18); no reference file:line —
# /root/reference is empty.
# ======================================================================
from dataclasses import dataclass as _dataclass


@_dataclass
class SqlProgressiveEmission:
    progress: dict          # rows_done/rows_total/fraction/emission index
    estimates: pa.Table     # [group key,] one column per SELECT item
    envelope: pa.Table      # (group, column, lo, hi) for boundable items

    def __iter__(self):
        return iter((self.progress, self.estimates, self.envelope))


_PROG_KINDS = {"count", "sum", "avg", "min", "max", "money_sum",
               "approx_count_distinct", "approx_quantile"}


def _prog_partial_fn(key_col, items, filter_fn, hll_p, kll_k):
    """Stateless map_batches fn: raw block → one partial row per group key
    present in the block (counters + sketch blobs), plus the block's raw
    pre-filter row count on its first output row (progress accounting)."""
    import numpy as np

    from .sketches.hll import HyperLogLog
    from .sketches.kll import KLL

    def fn(b: pa.Table) -> pa.Table:
        raw = len(b)
        if filter_fn is not None:
            b = filter_fn(b)
        key_type = b.schema.field(key_col).type if key_col else pa.string()
        cols: dict[str, list] = {f"_c{i}": [] for i in range(len(items))}
        sums: dict[str, list] = {f"_c{i}_n": [] for i, it in enumerate(items)
                                 if it.fn == "avg"}
        out_keys = []
        if len(b):
            if key_col is not None:
                d = pc.dictionary_encode(b[key_col]).combine_chunks()
                codes = d.indices.to_numpy(zero_copy_only=False)
                keys = d.dictionary
                order = np.argsort(codes, kind="stable")
                starts = np.searchsorted(codes[order], np.arange(len(keys)))
                ends = np.append(starts[1:], len(codes))
                take = pa.array(order)
            else:
                keys = pa.array([None], key_type)
                starts, ends, take = np.array([0]), np.array([len(b)]), None
            vals = {}
            for it in items:
                if it.col is not None and it.col not in vals:
                    v = b[it.col].combine_chunks()
                    vals[it.col] = v.take(take) if take is not None else v
            for g in range(len(starts)):
                s, e = int(starts[g]), int(ends[g])
                out_keys.append(keys[g].as_py() if key_col else None)
                for i, it in enumerate(items):
                    name = f"_c{i}"
                    seg = (vals[it.col].slice(s, e - s)
                           if it.col is not None else None)
                    if it.fn == "count" and it.col is None:
                        cols[name].append(e - s)
                    elif it.fn == "count":
                        cols[name].append(e - s - seg.null_count)
                    elif it.fn in ("sum", "avg"):
                        v = pc.sum(seg)
                        cols[name].append(
                            float(v.as_py()) if v.as_py() is not None else 0.0)
                        if it.fn == "avg":
                            sums[f"{name}_n"].append(e - s - seg.null_count)
                    elif it.fn == "money_sum":
                        cents = pc.cast(
                            pc.round(pc.multiply(
                                pc.cast(seg, pa.float64()),
                                pa.scalar(100.0)), **_ROUND), pa.int64())
                        v = pc.sum(cents).as_py()
                        cols[name].append(int(v) if v is not None else 0)
                    elif it.fn in ("min", "max"):
                        mm = pc.min_max(seg)
                        cols[name].append(mm[it.fn].as_py())
                    elif it.fn == "approx_count_distinct":
                        sk = HyperLogLog(p=hll_p)
                        sk.update(pc.drop_null(seg))
                        cols[name].append(sk.to_bytes())
                    elif it.fn == "approx_quantile":
                        sk = KLL(k=kll_k)
                        sk.update(pc.drop_null(seg))
                        cols[name].append(sk.to_bytes())
        else:
            # progress-only row: records the raw count, carries no state
            out_keys.append(None)
            for i, it in enumerate(items):
                cols[f"_c{i}"].append(None)
                if it.fn == "avg":
                    sums[f"_c{i}_n"].append(None)
        n_out = len(out_keys)
        arrs = {"_key": pa.array(out_keys, key_type)}
        for i, it in enumerate(items):
            typ = (pa.binary() if it.fn.startswith("approx_")
                   else pa.float64() if it.fn in ("sum", "avg", "min", "max")
                   else pa.int64())
            arrs[f"_c{i}"] = pa.array(cols[f"_c{i}"], typ)
            if it.fn == "avg":
                arrs[f"_c{i}_n"] = pa.array(sums[f"_c{i}_n"], pa.int64())
        arrs["_raw_rows"] = pa.array([raw] + [0] * (n_out - 1), pa.int64())
        arrs["_has_state"] = pa.array([len(b) > 0] * n_out, pa.bool_())
        return pa.table(arrs)

    return fn


def run_sql_progressive(sql: str, sf_dir: str, *, hll_p: int = 14,
                        kll_k: int = 200, override_num_blocks=None):
    """Online-aggregation iterator for single-table aggregate SQL: yields a
    SqlProgressiveEmission per consumed partial block — converging
    estimates plus a deterministic envelope on the FULL-data answer:

    - COUNT(*) / COUNT(col): [seen, seen + rows_unseen] (additive; width
      strictly shrinks every emission);
    - APPROX_COUNT_DISTINCT: [est·(1−3σ), est·(1+3σ) + rows_unseen];
    - APPROX_QUANTILE(φ): seen-data quantiles at the displaced ranks
      (φ(n+m)−m)/n … φ(n+m)/n, widened by KLL's rank ε (m = rows unseen);
    - SUM/AVG/MIN/MAX: estimate streams, no distribution-free finite
      bound exists without value-range assumptions — no envelope row.

    The final emission (fraction == 1.0) is the complete answer — same
    merge algebra as run_sql's sketch routes. Grammar restrictions: one
    table, scalar WHERE only, at most one GROUP BY key, no JOIN /
    IN (SELECT) / HAVING / APPROX_TOP_K (use run_sql for those)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from .sketches import Sketch

    plan = parse_sql(sql)
    if plan.unions:
        raise ValueError("UNION ALL does not stream progressively; "
                         "use run_sql")
    if any(it.window or it.fn == "wexpr" for it in plan.items):
        raise ValueError("window functions do not stream progressively; "
                         "use run_sql")
    if any(it.filter_pred for it in plan.items):
        raise ValueError("FILTER (WHERE …) is not supported progressively "
                         "yet; use run_sql")
    if plan.joins or plan.having or len(plan.group_by) > 1:
        raise ValueError("progressive SQL supports a single table, scalar "
                         "WHERE, and at most one GROUP BY key")
    if any(p.sub is not None for p in plan.where):
        raise ValueError("progressive SQL does not support IN (SELECT …)")
    key_col = plan.group_by[0] if plan.group_by else None
    items = [it for it in plan.items if it.fn != "col"]
    for it in plan.items:
        if it.fn == "col" and it.col != key_col:
            raise ValueError(f"non-aggregate column {it.col!r} must be the "
                             "GROUP BY key")
        if it.fn == "count" and it.distinct:
            raise ValueError("progressive COUNT(DISTINCT) is approximate "
                             "by nature — use APPROX_COUNT_DISTINCT")
        if it.fn not in _PROG_KINDS and it.fn != "col":
            raise ValueError(f"progressive SQL cannot stream {it.fn!r}")
    # expression aggregate arguments derive per block (a map stage Ray
    # fuses with the partials stage), exactly like run_sql's derive
    exprs = _register_exprs(plan, group_aliases=False)

    path = f"{sf_dir}/{plan.table}.parquet"
    rows_total = sum(m.num_rows for m in _table_meta(path))
    derived = set(exprs)
    needed = {it.col for it in items
              if it.col is not None and it.col not in derived}
    for e in exprs.values():
        needed |= _expr_cols(e)
    needed |= _pred_cols(plan.where)
    if key_col:
        needed.add(key_col)
    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = rd.read_parquet(path, columns=sorted(needed), **kwargs)
    if exprs:
        ds = ds.map_batches(_expr_derive_fn(exprs),
                            batch_format="pyarrow", zero_copy_batch=True)
    filter_fn = _scalar_filter_fn(plan.where) if plan.where else None
    partials = ds.map_batches(
        _prog_partial_fn(key_col, items, filter_fn, hll_p, kll_k),
        batch_format="pyarrow", zero_copy_batch=True)

    # ---------------- driver-side merge loop (blob rows only) ----------
    state: dict = {}
    rows_seen = 0
    emission = 0

    def _emit() -> SqlProgressiveEmission:
        unseen = rows_total - rows_seen
        keys = sorted(state, key=lambda k: (k is None, k))
        est_cols: dict[str, list] = {}
        env = {"group": [], "column": [], "lo": [], "hi": []}
        if key_col:
            est_cols[key_col] = keys
        for i, it in enumerate(items):
            name, out = it.name, []
            for k in keys:
                st = state[k][i]
                if it.fn in ("count",):
                    out.append(int(st))
                    env["group"].append(str(k))
                    env["column"].append(name)
                    env["lo"].append(float(st))
                    env["hi"].append(float(st + unseen))
                elif it.fn in ("sum", "min", "max"):
                    out.append(st)
                elif it.fn == "money_sum":
                    out.append((st or 0) / 100.0)
                elif it.fn == "avg":
                    s, n = st
                    out.append(s / n if n else None)
                elif it.fn == "approx_count_distinct":
                    est = st.estimate()
                    rel = 3 * st.error_bound()
                    out.append(est)
                    env["group"].append(str(k))
                    env["column"].append(name)
                    env["lo"].append(max(0.0, est * (1 - rel)))
                    env["hi"].append(est * (1 + rel) + unseen)
                elif it.fn == "approx_quantile":
                    n = max(int(st.n), 1)
                    eps = st.error_bound()
                    phi = it.phi
                    out.append(float(st.quantile(phi)))
                    lo_phi = max(0.0, (phi * (n + unseen) - unseen) / n - eps)
                    hi_phi = min(1.0, phi * (n + unseen) / n + eps)
                    env["group"].append(str(k))
                    env["column"].append(name)
                    env["lo"].append(float(st.quantile(lo_phi)))
                    env["hi"].append(float(st.quantile(hi_phi)))
            if it.round_to is not None:
                out = [None if v is None else
                       float(np.copysign(np.floor(abs(v) * 10.0**it.round_to
                                                  + 0.5), v)
                             / 10.0**it.round_to) for v in out]
            est_cols[name] = out
        est = pa.table(est_cols) if est_cols else pa.table({})
        if plan.order_by:
            est = est.take(pc.sort_indices(est, sort_keys=[
                (c, "descending" if d else "ascending")
                for c, d in plan.order_by]))
        if plan.limit is not None:
            est = est.slice(0, plan.limit)
        return SqlProgressiveEmission(
            progress={"rows_done": rows_seen, "rows_total": rows_total,
                      "fraction": rows_seen / max(rows_total, 1),
                      "emission": emission},
            estimates=est,
            envelope=pa.table({
                "group": pa.array(env["group"], pa.string()),
                "column": pa.array(env["column"], pa.string()),
                "lo": pa.array(env["lo"], pa.float64()),
                "hi": pa.array(env["hi"], pa.float64()),
            }))

    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        rows_seen += int(pc.sum(b["_raw_rows"]).as_py() or 0)
        has = b["_has_state"].to_pylist()
        keys_b = b["_key"].to_pylist()
        for r in range(len(b)):
            if not has[r]:
                continue
            k = keys_b[r]
            slot = state.get(k)
            if slot is None:
                slot = state[k] = [None] * len(items)
            for i, it in enumerate(items):
                v = b[f"_c{i}"][r].as_py()
                cur = slot[i]
                if it.fn in ("count", "money_sum"):
                    slot[i] = (cur or 0) + v
                elif it.fn == "sum":
                    slot[i] = (cur or 0.0) + v
                elif it.fn == "avg":
                    n = b[f"_c{i}_n"][r].as_py()
                    s0, n0 = cur or (0.0, 0)
                    slot[i] = (s0 + v, n0 + n)
                elif it.fn == "min":
                    slot[i] = v if cur is None else min(cur, v)
                elif it.fn == "max":
                    slot[i] = v if cur is None else max(cur, v)
                else:
                    sk = Sketch.from_bytes(v)
                    slot[i] = sk if cur is None else cur.merge(sk)
        emission += 1
        yield _emit()
    if emission == 0 or rows_seen >= rows_total:
        if emission == 0:
            yield _emit()
