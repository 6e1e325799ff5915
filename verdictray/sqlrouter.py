"""Minimal SQL frontend routed to Ray Data aggregates and sketch UDAFs —
the Verdict-lineage "interactive query" surface (public VerdictDB accepts
aggregate SQL and answers from pre-built state; SIGMOD'18. No reference
file:line — /root/reference is empty).

Supported grammar (case-insensitive keywords; one table, no subqueries
except membership ``IN (SELECT col FROM t)``):

    SELECT item ("," item)*
    FROM table
    [WHERE pred ("AND" pred)*]
    [GROUP BY col ("," col)*]
    [ORDER BY col [ASC|DESC] ("," ...)*]
    [LIMIT n]

    item := expr ["AS" alias]
    expr := col
          | COUNT(*) | COUNT([DISTINCT] col)
          | SUM(col) | AVG(col) | MIN(col) | MAX(col)
          | APPROX_COUNT_DISTINCT(col)          -- HyperLogLog
          | APPROX_QUANTILE(col, phi)           -- KLL
          | ROUND(<aggregate expr>, n)          -- half-away-from-zero
    pred := col (=|!=|<>|<|<=|>|>=) literal
          | col [NOT] IN (literal, ...)
          | col [NOT] IN (SELECT col FROM table)   -- semi/anti join

Routing:
- exact aggregates → Ray Data built-ins (Count/Sum/Min/Max/Mean) with
  map-side combine; COUNT(DISTINCT) → udaf.ExactDistinct (8 B hash sets).
- APPROX_COUNT_DISTINCT → HllAgg; APPROX_QUANTILE → KllAgg. With
  ``with_bounds=True`` each approximate output column gains an
  ``<alias>_bound`` column (HLL: 3σ relative; KLL: value at φ±ε rank).
- membership ``IN (SELECT …)`` → join.semi_anti_join (exact, bucketed,
  key-only shuffle); ``approx_membership=True`` routes it through a Bloom
  filter built once and broadcast to an actor pool (query.BloomProbe) —
  no shuffle at all, ~fpp false matches, zero false negatives.
- scalar WHERE predicates compile to ONE vectorized pyarrow.compute
  filter; referenced columns are pruned at the parquet read.

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

_AGGS = {"count", "sum", "avg", "min", "max",
         "approx_count_distinct", "approx_quantile"}

_TOKEN = re.compile(r"""
    \s*(
        '(?:[^']|'')*'            # string literal
      | [A-Za-z_][A-Za-z_0-9.]*   # ident / keyword
      | \d+\.\d+ | \.\d+ | \d+    # number
      | <> | != | <= | >= | [(),*=<>]
    )""", re.VERBOSE)


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

    @property
    def name(self) -> str:
        if self.alias:
            return self.alias
        if self.fn == "col":
            return self.col
        if self.fn == "count" and self.col is None:
            return "count_star"
        d = "distinct_" if self.distinct else ""
        return f"{self.fn}_{d}{self.col}"


@dataclass
class _Pred:
    col: str
    op: str                  # =, !=, <, <=, >, >=, in, not_in
    value: object = None     # literal or list of literals
    sub: tuple | None = None  # (table, col) for IN (SELECT ...)


@dataclass
class _Plan:
    table: str
    items: list = field(default_factory=list)
    where: list = field(default_factory=list)
    group_by: list = field(default_factory=list)
    order_by: list = field(default_factory=list)   # (col, desc)
    limit: int | None = None


class _Parser:
    def __init__(self, sql: str):
        self.t = _tokenize(sql)
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
        if tok.startswith("'"):
            return tok[1:-1].replace("''", "'")
        try:
            return int(tok)
        except ValueError:
            return float(tok)

    # ------------------------------------------------------- select item
    def item(self) -> _Agg:
        tok = self.take()
        low = tok.lower()
        if low == "round":
            self.expect("(")
            inner = self.item()
            self.expect(",")
            nd = int(self.take())
            self.expect(")")
            inner.round_to = nd
            return inner
        if low in _AGGS:
            self.expect("(")
            if low == "count" and self.peek() == "*":
                self.take()
                self.expect(")")
                return _Agg("count", None)
            distinct = False
            if self.kw("distinct"):
                self.take()
                distinct = True
                if low != "count":
                    raise ValueError("DISTINCT only supported in COUNT")
            col = self.take()
            phi = None
            if low == "approx_quantile":
                self.expect(",")
                phi = float(self.take())
            self.expect(")")
            return _Agg(low, col, distinct=distinct, phi=phi)
        return _Agg("col", tok)

    # --------------------------------------------------------- predicate
    def pred(self) -> _Pred:
        col = self.take()
        if self.kw("not"):
            self.take()
            self.expect("in")
            return self._in_pred(col, negated=True)
        if self.kw("in"):
            self.take()
            return self._in_pred(col, negated=False)
        op = self.take()
        if op == "<>":
            op = "!="
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"unsupported operator {op!r}")
        return _Pred(col, op, self.literal())

    def _in_pred(self, col: str, negated: bool) -> _Pred:
        self.expect("(")
        if self.kw("select"):
            self.take()
            sub_col = self.take()
            self.expect("from")
            sub_table = self.take()
            self.expect(")")
            return _Pred(col, "not_in" if negated else "in",
                         sub=(sub_table, sub_col))
        vals = [self.literal()]
        while self.peek() == ",":
            self.take()
            vals.append(self.literal())
        self.expect(")")
        return _Pred(col, "not_in" if negated else "in", value=vals)

    # -------------------------------------------------------------- plan
    def parse(self) -> _Plan:
        self.expect("select")
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
        self.expect("from")
        plan = _Plan(table=self.take(), items=items)
        if self.kw("where"):
            self.take()
            plan.where.append(self.pred())
            while self.kw("and"):
                self.take()
                plan.where.append(self.pred())
        if self.kw("group"):
            self.take()
            self.expect("by")
            plan.group_by.append(self.take())
            while self.peek() == ",":
                self.take()
                plan.group_by.append(self.take())
        if self.kw("order"):
            self.take()
            self.expect("by")
            while True:
                col = self.take()
                desc = False
                if self.kw("asc", "desc"):
                    desc = self.take().lower() == "desc"
                plan.order_by.append((col, desc))
                if self.peek() == ",":
                    self.take()
                    continue
                break
        if self.kw("limit"):
            self.take()
            plan.limit = int(self.take())
        if self.peek() is not None:
            raise ValueError(f"unexpected trailing token {self.peek()!r}")
        return plan


def parse_sql(sql: str) -> _Plan:
    return _Parser(sql).parse()


# ======================================================================
# execution
# ======================================================================
def _scalar_filter_fn(preds: list[_Pred]):
    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for p in preds:
            col = batch[p.col]
            if p.op == "in":
                m = pc.is_in(col, value_set=pa.array(p.value))
            elif p.op == "not_in":
                m = pc.invert(pc.is_in(col, value_set=pa.array(p.value)))
            else:
                kernel = {"=": pc.equal, "!=": pc.not_equal,
                          "<": pc.less, "<=": pc.less_equal,
                          ">": pc.greater, ">=": pc.greater_equal}[p.op]
                m = kernel(col, pa.scalar(p.value))
            mask = m if mask is None else pc.and_kleene(mask, m)
        return batch.filter(pc.fill_null(mask, False))

    return fn


def run_sql(sql: str, sf_dir: str, *, hll_p: int = 14, kll_k: int = 200,
            with_bounds: bool = False, approx_membership: bool = False,
            bloom_capacity: int = 1_000_000, bloom_fpp: float = 0.01,
            join_buckets: int = 32):
    """Parse ``sql`` and execute it as a streaming Ray Data pipeline over
    ``{sf_dir}/{table}.parquet``. Returns a Dataset. See module docstring
    for the grammar and the routing table."""
    import ray.data as rd

    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from .udaf import ExactDistinct, HllAgg, KllAgg

    plan = parse_sql(sql)

    # -------------------------------------------------- read, pruned
    needed = set(plan.group_by)
    for it in plan.items:
        if it.col is not None:
            needed.add(it.col)
    for p in plan.where:
        needed.add(p.col)
    ds = rd.read_parquet(f"{sf_dir}/{plan.table}.parquet",
                         columns=sorted(needed))

    # -------------------------------------------------- WHERE
    scalar = [p for p in plan.where if p.sub is None]
    member = [p for p in plan.where if p.sub is not None]
    if scalar:
        ds = ds.map_batches(_scalar_filter_fn(scalar),
                            batch_format="pyarrow", zero_copy_batch=True)
    for p in member:
        sub_table, sub_col = p.sub
        build = rd.read_parquet(f"{sf_dir}/{sub_table}.parquet",
                                columns=[sub_col])
        if approx_membership:
            if p.op == "not_in":
                from .query import anti_join_bloom as _bloom_join
            else:
                from .query import semi_join_bloom as _bloom_join
            ds = _bloom_join(ds, build, p.col, sub_col,
                             capacity=bloom_capacity, fpp=bloom_fpp)
        else:
            from .join import semi_anti_join

            ds = semi_anti_join(ds, build, p.col, sub_col,
                                how="anti" if p.op == "not_in" else "semi",
                                buckets=join_buckets)

    # -------------------------------------------------- aggregates
    aggs, posts, bounds = [], [], []
    plain_cols = [it for it in plan.items if it.fn == "col"]
    agg_items = [it for it in plan.items if it.fn != "col"]
    for it in plain_cols:
        if it.col not in plan.group_by:
            raise ValueError(f"non-aggregate column {it.col!r} must be in "
                             "GROUP BY")
    for it in agg_items:
        name = it.name
        if it.fn == "count" and it.distinct:
            aggs.append(ExactDistinct(it.col, alias_name=name))
        elif it.fn == "count":
            aggs.append(Count(alias_name=name) if it.col is None
                        else Count(on=it.col, ignore_nulls=True,
                                   alias_name=name))
        elif it.fn == "sum":
            aggs.append(Sum(it.col, alias_name=name))
        elif it.fn == "avg":
            aggs.append(Mean(it.col, alias_name=name))
        elif it.fn == "min":
            aggs.append(Min(it.col, alias_name=name))
        elif it.fn == "max":
            aggs.append(Max(it.col, alias_name=name))
        elif it.fn == "approx_count_distinct":
            aggs.append(HllAgg(on=it.col, alias_name=name, p=hll_p))
            if with_bounds:
                rel = 3 * 1.04 / (2 ** hll_p) ** 0.5
                bounds.append((name, "hll_rel", rel))
        elif it.fn == "approx_quantile":
            phis = (it.phi,) if not with_bounds else tuple(sorted({
                max(0.0, it.phi - 1.65 / kll_k * 3), it.phi,
                min(1.0, it.phi + 1.65 / kll_k * 3)}))
            aggs.append(KllAgg(on=it.col, alias_name=f"_kll_{name}",
                               k=kll_k, phis=phis, output="quantiles"))
            posts.append((name, it.phi, phis))
        if it.round_to is not None:
            # rounding applies after finalize (and after Mean division)
            pass

    key_cols = list(plan.group_by)
    if key_cols:
        out = ds.groupby(key_cols).aggregate(*aggs)
    else:
        row = ds.aggregate(*aggs)
        out = rd.from_items([row])

    def finish(batch: pa.Table) -> pa.Table:
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
        for name, kind, rel in bounds:
            est = pc.cast(batch[name], pa.float64())
            batch = batch.append_column(
                f"{name}_bound", pc.multiply(est, pa.scalar(rel)))
        for it in agg_items:
            if it.round_to is not None:
                i = batch.schema.get_field_index(it.name)
                batch = batch.set_column(
                    i, it.name,
                    pc.round(pc.cast(batch[it.name], pa.float64()),
                             ndigits=it.round_to, **_ROUND))
        # projection order: as written in the SELECT list
        cols = [it.name for it in plan.items]
        extra = [n for n in batch.schema.names if n not in cols]
        return batch.select(cols + [n for n in extra
                                    if n.endswith(("_bound", "_bound_lo",
                                                   "_bound_hi"))])

    out = out.map_batches(finish, batch_format="pyarrow")

    # -------------------------------------------------- order / limit
    if plan.order_by:
        if len(plan.order_by) > 1:
            out = out.sort([c for c, _ in plan.order_by],
                           descending=[d for _, d in plan.order_by])
        else:
            c, d = plan.order_by[0]
            out = out.sort(c, descending=d)
    if plan.limit is not None:
        out = out.limit(plan.limit)
    return out


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
