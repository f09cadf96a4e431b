"""Basic-graph-pattern (BGP) queries over the constructed KG — the
SPARQL-core conjunctive query shape (tripsu itself has no query engine;
this is the "use the graph you built" capability a KG pipeline needs).

A pattern is an (s, p, o) triple of strings where a leading ``?`` marks a
variable; constants must match exactly (bare IRIs / literal lexical forms,
as stored in the TRIPLES columns). The BGP is the natural join of its
pattern relations on shared variables, DISTINCT (set semantics).

Execution is Ray-Data-first and mirrors the proven relational machinery:

- each pattern becomes a map-only selection/projection over the triple
  stream (constant equality via vectorized masks; variables project the
  matching columns) with a partition-local dedup;
- each pairwise join is the union-tag + single-int-key hash exchange used
  by ``q_rel_shuffle_join`` (both sides may be big; ``Dataset.join`` is
  avoided per the Ray 2.49 hazard in BASELINE.md): rows co-partition on
  the hash of the FIRST shared variable, the full multi-variable equality
  happens in a vectorized per-partition pandas merge;
- the final DISTINCT is one row-hash exchange + per-partition dedup
  (exact: equal rows share a partition).

Join order is the caller's pattern order (selectivity-based reordering is
an optimizer concern; the showcase query orders most-selective first).
Cross products (no shared variable) are rejected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import KIND_IRI

_P = 16


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _pattern_relation(triples, pattern):
    """One pattern → Dataset whose columns are the pattern's variables.

    A variable repeated WITHIN the pattern (``(?x, p, ?x)`` — a
    self-loop probe) is an implicit equality constraint: all its
    positions must hold the same value, enforced as an extra mask."""
    s, p, o = pattern
    var_cols: dict[str, list[str]] = {}
    for term, col in ((s, "subject"), (p, "predicate"), (o, "object_value")):
        if _is_var(term):
            var_cols.setdefault(term[1:], []).append(col)
    if not var_cols:
        raise ValueError(f"pattern {pattern} binds no variable")

    def sel(batch: pa.Table) -> pd.DataFrame:
        n = batch.num_rows
        mask = np.ones(n, dtype=bool)
        for term, col in ((s, "subject"), (p, "predicate"), (o, "object_value")):
            if not _is_var(term):
                mask &= batch[col].to_numpy(zero_copy_only=False) == term
        for cols in var_cols.values():
            for extra in cols[1:]:  # repeated variable → positional equality
                mask &= (
                    batch[cols[0]].to_numpy(zero_copy_only=False)
                    == batch[extra].to_numpy(zero_copy_only=False)
                )
        df = pd.DataFrame(
            {
                v: pd.Series(
                    batch[cols[0]].to_numpy(zero_copy_only=False)[mask], dtype=object
                )
                for v, cols in var_cols.items()
            }
        )
        return df.drop_duplicates(ignore_index=True)

    return triples.map_batches(sel, batch_format="pyarrow"), sorted(var_cols)


def _hash_join(a, a_vars, b, b_vars, *, num_partitions=_P, how: str = "inner"):
    """Distributed natural join on shared variables (union-tag exchange).

    ``how="left"`` keeps unmatched left rows with None for right-only
    variables — the SPARQL OPTIONAL join. Exact under the same argument
    as the inner join: every row with join key k (and every row whose
    key is None — hashed consistently) lands in partition hash(k), so
    the per-partition pandas merge sees all potential partners."""
    shared = sorted(set(a_vars) & set(b_vars))
    if not shared:
        raise ValueError(f"cross product: {a_vars} ⋈ {b_vars} share no variable")
    key = shared[0]
    out_vars = sorted(set(a_vars) | set(b_vars))

    def tag(side):
        # Ray's union needs ONE schema: each side pads the other's
        # variables with None (ignored at merge time via the _side split)
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for v in out_vars:
                if v not in df.columns:
                    df[v] = pd.Series([None] * len(df), dtype=object)
            df["_side"] = np.int8(side)
            df["_part"] = pd.util.hash_array(
                df[key].to_numpy(dtype=object)
            ) % num_partitions
            return df[out_vars + ["_side", "_part"]]

        return f

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        res_vars = a_vars if how in ("anti", "semi") else out_vars
        empty = pd.DataFrame({v: pd.Series([], dtype=object) for v in res_vars})
        if not len(g):
            return empty
        left = g[g["_side"] == 0][a_vars].drop_duplicates()
        right = g[g["_side"] == 1][b_vars].drop_duplicates()
        if not len(left):
            return empty
        if how == "anti":
            return _anti_merge(left, right, shared, a_vars)
        if how == "semi":
            return _semi_merge(left, right, shared, a_vars)
        if not len(right):
            if how != "left":
                return empty
            m = left.copy()
            for v in out_vars:
                if v not in m.columns:
                    m[v] = pd.Series([None] * len(m), dtype=object)
        else:
            m = left.merge(right, on=shared, how=how)
            # pandas turns unmatched object cells into NaN; normalize to None
            if how == "left":
                m = m.astype(object).where(pd.notna(m), None)
        return m[out_vars].drop_duplicates(ignore_index=True)

    u = a.map_batches(tag(0), batch_format="pandas").union(
        b.map_batches(tag(1), batch_format="pandas")
    )
    res_vars = a_vars if how in ("anti", "semi") else out_vars
    return u.groupby("_part").map_groups(join_part, batch_format="pandas"), res_vars


def _semi_merge(left: pd.DataFrame, right: pd.DataFrame, shared, a_vars) -> pd.DataFrame:
    """FILTER EXISTS kernel: keep left rows with a compatible right match.

    Left rows with an unbound (None) shared variable FAIL the filter
    (dropped) — the same unbound-fails rule as :func:`_apply_filters`;
    the right side of a pattern conjunction is always fully bound."""
    if not len(right):
        return left.iloc[:0][a_vars]
    bound = left[shared].notna().all(axis=1).to_numpy(dtype=bool)
    lb = left[bound]
    if not len(lb):
        return left.iloc[:0][a_vars]
    m = lb.merge(right[shared].drop_duplicates(), on=shared, how="inner")
    return m[a_vars].drop_duplicates(ignore_index=True)


def _anti_merge(left: pd.DataFrame, right: pd.DataFrame, shared, a_vars) -> pd.DataFrame:
    """SPARQL MINUS kernel: drop left rows with a compatible right match.

    Left rows with ANY unbound (None) shared variable are KEPT — the
    common-domain overlap rule degenerates safely for the fully-bound
    right side a pattern conjunction produces (a partially-bound left row
    is the OPTIONAL-then-MINUS corner; SPARQL would still remove it when
    a μ2 agrees on the bound subset — documented simplification: MINUS
    here applies to bound variables, the overwhelmingly common shape)."""
    if not len(right):
        return left[a_vars].drop_duplicates(ignore_index=True)
    bound = left[shared].notna().all(axis=1).to_numpy(dtype=bool)
    keep_unbound = left[~bound]
    lb = left[bound]
    if len(lb):
        m = lb.merge(
            right[shared].drop_duplicates(), on=shared, how="left", indicator=True
        )
        lb = m[m["_merge"] == "left_only"][a_vars]
    out = pd.concat([lb, keep_unbound[a_vars]], ignore_index=True)
    return out.drop_duplicates(ignore_index=True)


#: filter operators (SQL/SPARQL semantics: an unbound (None) value FAILS
#: every predicate, like SQL NULL comparisons / SPARQL type errors)
_FILTER_OPS = {
    "==": lambda col, v: col == v,
    "!=": lambda col, v: col != v,
    "<": lambda col, v: col < v,
    "<=": lambda col, v: col <= v,
    ">": lambda col, v: col > v,
    ">=": lambda col, v: col >= v,
    "prefix": lambda col, v: col.str.startswith(v, na=False),
}


def _apply_filters(df: pd.DataFrame, filters) -> pd.DataFrame:
    for var, op, val in filters:
        if not len(df):
            return df
        col = df[var]
        # a "?name" value compares var-to-var (FILTER(?a < ?b));
        # otherwise the value is a constant
        rhs = df[val[1:]] if isinstance(val, str) and _is_var(val) else val
        # evaluate only on bound values: object-dtype order comparisons
        # against None raise, and SQL/SPARQL fail unbound rows anyway
        bound = col.notna().to_numpy(dtype=bool)
        if isinstance(rhs, pd.Series):
            bound &= rhs.notna().to_numpy(dtype=bool)
            rhs = rhs[bound]
        mask = np.zeros(len(df), dtype=bool)
        if bound.any():
            mask[bound] = np.asarray(
                _FILTER_OPS[op](col[bound], rhs), dtype=bool
            )
        df = df[mask]
    return df


def _bind_term(df: pd.DataFrame, term):
    """A BIND argument → Series (variable reference) or scalar constant."""
    if isinstance(term, str) and _is_var(term):
        return df[term[1:]]
    return term


def _eval_bind(df: pd.DataFrame, expr) -> pd.Series:
    """Evaluate one BIND expression AST over a binding frame, vectorized.

    Supported forms (terms are ``?var`` references or string constants):

        ("concat", t1, t2, ...)    string concatenation
        ("strafter", t, sep)       substring after the FIRST ``sep`` ("" if absent)
        ("strbefore", t, sep)      substring before the FIRST ``sep`` ("" if absent)
        ("ucase", t) / ("lcase", t)
        ("replace", t, old, new)   literal (non-regex) replacement
        ("strlen", t)              int64 character count

    SPARQL error-propagation rule: an unbound (None) input makes the
    result unbound (None) for that row — matching the SQL NULL semantics
    of the oracle's rendering, so bound/unbound rows hash identically."""
    op = expr[0]
    if op == "concat":
        parts = [_bind_term(df, t) for t in expr[1:]]
        na = np.zeros(len(df), dtype=bool)
        for p in parts:
            if isinstance(p, pd.Series):
                na |= p.isna().to_numpy(dtype=bool)
        out = pd.Series([""] * len(df), index=df.index, dtype=object)
        for p in parts:
            out = out + (p.astype(object) if isinstance(p, pd.Series) else p)
        out[na] = None
        return out
    if op in ("strafter", "strbefore"):
        s, sep = _bind_term(df, expr[1]), expr[2]
        na = s.isna().to_numpy(dtype=bool)
        filled = s.fillna("").astype(str)
        # split(n=1).str[i]: NaN marks "separator absent" → SPARQL returns ""
        piece = filled.str.split(sep, n=1, regex=False).str[
            1 if op == "strafter" else 0
        ]
        absent = piece.isna().to_numpy(dtype=bool)
        # strbefore("x", sep-absent) is "" too, but split's [0] returns the
        # whole string when sep is absent — mask it explicitly
        if op == "strbefore":
            absent = ~filled.str.contains(sep, regex=False).to_numpy(dtype=bool)
        out = piece.astype(object)
        out[absent] = ""
        out[na] = None
        return out
    if op in ("ucase", "lcase"):
        s = _bind_term(df, expr[1])
        na = s.isna().to_numpy(dtype=bool)
        out = (
            s.fillna("").astype(str).str.upper()
            if op == "ucase"
            else s.fillna("").astype(str).str.lower()
        ).astype(object)
        out[na] = None
        return out
    if op == "replace":
        s, old, new = _bind_term(df, expr[1]), expr[2], expr[3]
        na = s.isna().to_numpy(dtype=bool)
        out = s.fillna("").astype(str).str.replace(old, new, regex=False).astype(object)
        out[na] = None
        return out
    if op == "strlen":
        s = _bind_term(df, expr[1])
        return s.str.len().astype("int64" if not s.isna().any() else "Int64")
    raise ValueError(f"unknown BIND op: {op!r}")


def _apply_binds(df: pd.DataFrame, binds) -> pd.DataFrame:
    """Apply ``(new_var, expr)`` BINDs in order (later binds may reference
    earlier ones, as in SPARQL's sequential group evaluation)."""
    df = df.copy()
    for var, expr in binds:
        if var in df.columns:
            raise ValueError(f"BIND target ?{var} is already bound")
        df[var] = (
            _eval_bind(df, expr)
            if len(df)
            else pd.Series([], dtype=object, index=df.index)
        )
    return df


#: a pattern relation at or under this row count joins by broadcast
#: (ray.put once, per-batch merge) instead of an all-to-all exchange —
#: the size-based join-strategy selection every distributed SQL engine
#: performs; at sf0.1 this removes 2 of kg_bgp's 3 exchanges
_BGP_BROADCAST_MAX = 100_000


def _broadcast_join(a, a_vars, small_df, b_vars, *, how: str = "inner"):
    """Join the streaming side against a driver-materialized SMALL
    relation shipped once via ``ray.put`` — zero shuffle; per-batch
    pandas merge. Local dedup only: global DISTINCT is bgp()'s final
    exchange, same as the hash-join path."""
    import ray

    shared = sorted(set(a_vars) & set(b_vars))
    if not shared:
        raise ValueError(f"cross product: {a_vars} ⋈ {b_vars} share no variable")
    out_vars = sorted(set(a_vars) | set(b_vars))
    ref = ray.put(small_df.drop_duplicates(ignore_index=True))

    res_vars = a_vars if how in ("anti", "semi") else out_vars

    def f(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
        empty = pd.DataFrame({v: pd.Series([], dtype=object) for v in res_vars})
        if not len(df) or shared[0] not in df.columns:
            return empty
        if how == "anti":
            return _anti_merge(df, ray.get(_r), shared, a_vars)
        if how == "semi":
            return _semi_merge(df, ray.get(_r), shared, a_vars)
        m = df.merge(ray.get(_r), on=shared, how=how)
        if how == "left":
            m = m.astype(object).where(pd.notna(m), None)
        return m[out_vars].drop_duplicates(ignore_index=True)

    return a.map_batches(f, batch_format="pandas"), res_vars


def _join_adaptive(rel, vars_, r, v, *, num_partitions, how: str = "inner"):
    """Size-based join strategy: materialize the new side, count it, and
    broadcast if it fits (``_BGP_BROADCAST_MAX``); otherwise, for INNER
    joins, try the SWAPPED broadcast — the accumulated bindings after a
    selective root pattern are often the small side while the new pattern
    is unconstrained (the ``{selective} . ?f <inRepo> ?r`` shape), and
    inner natural joins are symmetric. Only when both sides exceed the
    bound does the union-tag exchange run (both materialized sides
    re-stream at no extra cost). The caller decides whether counting is
    worth it — an unconstrained-only conjunction goes straight to the
    exchange."""
    rm = r.materialize()
    n = rm.count()
    if n <= _BGP_BROADCAST_MAX:
        if n == 0:  # Ray 2.49: empty to_pandas drops the schema
            small = pd.DataFrame({c: pd.Series([], dtype=object) for c in v})
        else:
            small = rm.to_pandas()
        return _broadcast_join(rel, vars_, small, v, how=how)
    if how == "inner":
        relm = rel.materialize()
        nl = relm.count()
        if nl <= _BGP_BROADCAST_MAX:
            if nl == 0:
                small = pd.DataFrame(
                    {c: pd.Series([], dtype=object) for c in vars_}
                )
            else:
                small = relm.to_pandas()
            return _broadcast_join(rm, v, small, vars_, how=how)
        return _hash_join(relm, vars_, rm, v, num_partitions=num_partitions, how=how)
    return _hash_join(rel, vars_, rm, v, num_partitions=num_partitions, how=how)


def _conjunction(triples, patterns, *, num_partitions: int = _P):
    """Pattern list → (relation Dataset, sorted variable list)."""
    rel, vars_ = _pattern_relation(triples, patterns[0])
    selective_root = any(not _is_var(t) for t in patterns[0])
    # left-deep, but DEFER patterns that don't yet share a variable with
    # the accumulated bindings — a connected BGP is accepted in any
    # caller order; only a genuinely disconnected one is rejected
    pending = list(patterns[1:])
    while pending:
        for i, pat in enumerate(pending):
            pat_vars = {t[1:] for t in pat if _is_var(t)}
            if pat_vars & set(vars_):
                break
        else:
            raise ValueError(
                f"cross product: patterns {pending} share no variable "
                f"with bindings {vars_}"
            )
        pat = pending.pop(i)
        r, v = _pattern_relation(triples, pat)
        if any(not _is_var(t) for t in pat) or selective_root:
            # a constant makes the NEW pattern selective → worth counting;
            # a selective ROOT makes the accumulated side a broadcast
            # candidate even against an unconstrained pattern (the
            # swapped-broadcast path in _join_adaptive)
            rel, vars_ = _join_adaptive(
                rel, vars_, r, v, num_partitions=num_partitions
            )
        else:
            rel, vars_ = _hash_join(rel, vars_, r, v, num_partitions=num_partitions)
    return rel, vars_


def _bgp_rel(
    triples,
    patterns,
    *,
    optional=(),
    minus=(),
    values=None,
    exists=(),
    not_exists=(),
    num_partitions: int = _P,
):
    """Evaluate required + VALUES + OPTIONAL + MINUS + EXISTS/NOT-EXISTS
    → (relation, vars); NO top-level filters and NO global DISTINCT
    (bgp()/bgp_union() own those)."""
    rel, vars_ = _conjunction(triples, patterns, num_partitions=num_partitions)
    required = set(vars_)
    if values is not None:
        # SPARQL VALUES: an inline binding table, joined in by broadcast
        # (inline data is small by construction — it's literal query text)
        v_vars, v_rows = values
        v_vars = [v[1:] if v.startswith("?") else v for v in v_vars]
        if not set(v_vars) & set(vars_):
            raise ValueError(
                f"VALUES variables {v_vars} share nothing with bindings {vars_}"
            )
        vdf = pd.DataFrame(
            [tuple(r) for r in v_rows], columns=list(v_vars), dtype=object
        ).drop_duplicates(ignore_index=True)
        rel, vars_ = _broadcast_join(rel, vars_, vdf, sorted(v_vars))
        required = set(vars_)
    for grp in optional:
        grp_pats, grp_filters = (
            grp if isinstance(grp, tuple) else (grp, ())
        )
        r, v = _conjunction(triples, grp_pats, num_partitions=num_partitions)
        if grp_filters:
            r = r.map_batches(
                lambda df, _f=tuple(grp_filters): _apply_filters(df, _f),
                batch_format="pandas",
            )
        shared = set(v) & set(vars_)
        if not shared or not shared <= required:
            raise ValueError(
                f"optional group {grp_pats} must join on required "
                f"variables; shares {sorted(shared)} with bindings, "
                f"required are {sorted(required)}"
            )
        # optional groups are conjunctions of (usually selective)
        # patterns — same size-based broadcast/exchange choice
        rel, vars_ = _join_adaptive(
            rel, vars_, r, v, num_partitions=num_partitions, how="left"
        )
    for grp in minus:
        # SPARQL MINUS: remove bindings compatible with the group's
        # matches on their shared variables (distributed anti-join; the
        # group side gets the same size-based broadcast/exchange choice)
        grp_pats, grp_filters = (
            grp if isinstance(grp, tuple) else (grp, ())
        )
        r, v = _conjunction(triples, grp_pats, num_partitions=num_partitions)
        if grp_filters:
            r = r.map_batches(
                lambda df, _f=tuple(grp_filters): _apply_filters(df, _f),
                batch_format="pandas",
            )
        if not set(v) & set(vars_):
            # disjoint domains: SPARQL MINUS removes nothing — explicit
            # no-op (never a silent full wipe)
            continue
        rel, vars_ = _join_adaptive(
            rel, vars_, r, v, num_partitions=num_partitions, how="anti"
        )
    for grp, positive in [(g, True) for g in exists] + [
        (g, False) for g in not_exists
    ]:
        # SPARQL FILTER (NOT) EXISTS: a correlated existence filter —
        # semi-join (anti-join) on the shared variables. Distinct from
        # MINUS exactly in the no-shared-variable corner: (NOT) EXISTS
        # then degenerates to a global boolean gate (keep-all/drop-all by
        # whether the group matches AT ALL), where MINUS removes nothing.
        grp_pats, grp_filters = grp if isinstance(grp, tuple) else (grp, ())
        r, v = _conjunction(triples, grp_pats, num_partitions=num_partitions)
        if grp_filters:
            r = r.map_batches(
                lambda df, _f=tuple(grp_filters): _apply_filters(df, _f),
                batch_format="pandas",
            )
        if not set(v) & set(vars_):
            nonempty = len(r.limit(1).take(1)) > 0
            if nonempty != positive:
                rel = rel.limit(0)
            continue
        rel, vars_ = _join_adaptive(
            rel,
            vars_,
            r,
            v,
            num_partitions=num_partitions,
            how="semi" if positive else "anti",
        )
    return rel, vars_


def _distinct_bindings(rel, vars_, filters, *, num_partitions: int = _P):
    """Top-level FILTER + global DISTINCT: one row-hash exchange."""
    filters = tuple(filters)

    def redist(df: pd.DataFrame) -> pd.DataFrame:
        if filters:
            df = _apply_filters(df, filters)
        df = df.drop_duplicates(ignore_index=True)
        key = df[vars_[0]].astype(str)
        for v in vars_[1:]:
            key = key + "\x00" + df[v].astype(str)
        df["_dpart"] = pd.util.hash_array(key.to_numpy(dtype=object)) % num_partitions
        return df

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_dpart"]).drop_duplicates(ignore_index=True)

    return (
        rel.map_batches(redist, batch_format="pandas")
        .groupby("_dpart")
        .map_groups(dedup_part, batch_format="pandas")
    )


def bgp(
    triples,
    patterns,
    *,
    optional=(),
    filters=(),
    minus=(),
    values=None,
    bind=(),
    exists=(),
    not_exists=(),
    num_partitions: int = _P,
):
    """Evaluate a graph pattern → DISTINCT Dataset of bindings (one string
    column per variable, ``?`` stripped).

    - ``patterns``: required conjunctive patterns (SPARQL BGP).
    - ``optional``: OPTIONAL groups — each a pattern list or a
      ``(pattern_list, filter_list)`` tuple, evaluated as its own
      conjunction (with group-local filters, matching
      ``OPTIONAL { ... FILTER ... }``) then LEFT-joined; unmatched rows
      keep None for the group's variables. Groups must join on REQUIRED
      variables (joining on another optional's possibly-unbound output
      has no single well-defined SPARQL rendering — rejected).
    - ``filters``: top-level ``(var, op, value)`` constraints
      (ops: == != < <= > >= prefix); None/unbound fails every filter,
      matching SQL NULL / SPARQL type-error semantics.
    - ``minus``: MINUS groups (same shape as ``optional``) — bindings
      with a compatible group match on shared variables are removed
      (distributed anti-join; disjoint-domain groups remove nothing,
      per the SPARQL common-domain rule).
    - ``values``: SPARQL VALUES inline data — ``(var_names, rows)``;
      broadcast-joined into the bindings (must share a variable).
    - ``bind``: SPARQL BIND — ``(new_var, expr)`` pairs evaluated in
      order over the joined bindings (vectorized, map-only; see
      :func:`_eval_bind` for the expression forms). Binds run BEFORE
      top-level filters, so a filter may constrain a bound variable.
    - ``exists`` / ``not_exists``: SPARQL FILTER (NOT) EXISTS groups
      (same shape as ``optional``) — correlated existence filters
      evaluated as semi-/anti-joins on shared variables; a group sharing
      NO variable degenerates to a global keep-all/drop-all gate (the
      corner where (NOT) EXISTS and MINUS genuinely differ). Unbound
      shared variables fail the filter (same simplification as MINUS —
      see :func:`_semi_merge`).
    """
    rel, vars_ = _bgp_rel(
        triples,
        patterns,
        optional=optional,
        minus=minus,
        values=values,
        exists=exists,
        not_exists=not_exists,
        num_partitions=num_partitions,
    )
    if bind:
        binds = tuple(bind)
        for var, _ in binds:
            if var in vars_:
                raise ValueError(f"BIND target ?{var} is already bound")
        rel = rel.map_batches(
            lambda df, _b=binds: _apply_binds(df, _b), batch_format="pandas"
        )
        vars_ = sorted(set(vars_) | {v for v, _ in binds})
    return _distinct_bindings(rel, vars_, filters, num_partitions=num_partitions)


def bgp_ask(
    triples,
    patterns,
    *,
    optional=(),
    filters=(),
    minus=(),
    values=None,
    num_partitions: int = _P,
) -> bool:
    """SPARQL ASK: does the pattern have at least one solution?

    Map-only existence probe: each batch of the joined relation reduces
    to AT MOST ONE marker row (after top-level filters), and ``take(1)``
    consumes the stream with early stop — the executor cancels remaining
    work once the first marker arrives, so a satisfiable ASK touches only
    a prefix of the data and an unsatisfiable one never shuffles (the
    final DISTINCT exchange is skipped entirely)."""
    rel, _ = _bgp_rel(
        triples,
        patterns,
        optional=optional,
        minus=minus,
        values=values,
        num_partitions=num_partitions,
    )
    filters = tuple(filters)

    def marker(df: pd.DataFrame) -> pa.Table:
        if filters:
            df = _apply_filters(df, filters)
        # Arrow out: zero-row object-dtype pandas trips Ray's size estimator
        return pa.table({"hit": pa.array([1] if len(df) else [], type=pa.int64())})

    return len(rel.map_batches(marker, batch_format="pandas").take(1)) > 0


def bgp_union(triples, groups, *, filters=(), num_partitions: int = _P):
    """SPARQL UNION: evaluate each group and take the set union.

    ``groups``: each a pattern list OR a dict of bgp() keyword pieces
    (``patterns``, ``optional``, ``filters``, ``minus``, ``values``).
    Groups may bind different variable sets — missing variables pad with
    None (SPARQL leaves them unbound), and the result's columns are the
    union. Set semantics throughout (this engine is DISTINCT end-to-end;
    SPARQL's bag-union multiplicities are not preserved). Top-level
    ``filters`` apply to the unioned bindings."""
    rels: list = []
    var_sets: list[list[str]] = []
    for grp in groups:
        kw = dict(grp) if isinstance(grp, dict) else {"patterns": grp}
        grp_filters = tuple(kw.pop("filters", ()))
        rel, vars_ = _bgp_rel(triples, num_partitions=num_partitions, **kw)
        if grp_filters:
            rel = rel.map_batches(
                lambda df, _f=grp_filters: _apply_filters(df, _f),
                batch_format="pandas",
            )
        rels.append(rel)
        var_sets.append(vars_)
    out_vars = sorted(set().union(*var_sets))

    def pad(vars_have):
        missing = [v for v in out_vars if v not in vars_have]

        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for v in missing:
                df[v] = pd.Series([None] * len(df), dtype=object)
            return df[out_vars]

        return f

    u = rels[0].map_batches(pad(var_sets[0]), batch_format="pandas")
    for rel, vs in zip(rels[1:], var_sets[1:]):
        u = u.union(rel.map_batches(pad(vs), batch_format="pandas"))
    return _distinct_bindings(u, out_vars, filters, num_partitions=num_partitions)


def q_kg_bgp(sf_dir: str):
    """Showcase BGP over the extracted KG: every (file, imported module,
    repo, repo author) conjunction — a 3-hop join path through two
    different variables:

        ?f <imports> ?m .  ?f <inRepo> ?r .  ?r <author> ?a

    DuckDB oracle: the same three-way self-join with DISTINCT."""
    from ..stages.extract import NS, extract_triples
    from ..sources.synth import read_source_files

    # pin the extracted stream: each pattern scans the SAME triples; a lazy
    # dataset would re-run synthesis+extraction once per pattern
    from .queries import _extracted

    triples = _extracted(sf_dir)
    out = bgp(
        triples,
        [
            ("?f", f"{NS}imports", "?m"),
            ("?f", f"{NS}inRepo", "?r"),
            ("?r", f"{NS}author", "?a"),
        ],
    )
    return out


def q_kg_bgp_optional(sf_dir: str):
    """OPTIONAL + FILTER showcase: every non-Rust file with its language
    and — optionally — the hub module it imports (only even-numbered docs
    import ``core``, so roughly half the rows carry None):

        ?f rdf:type File . ?f <language> ?lang .
        OPTIONAL { ?f <imports> ?hub FILTER(strstarts(?hub, mod/core)) }
        FILTER(?lang != "rs")

    DuckDB oracle: LEFT JOIN with the optional constraint in the ON
    clause, the top-level filter in WHERE."""
    from ..stages.extract import MOD_NS, NS, extract_triples
    from ..sources.synth import read_source_files
    from ..schema import RDF_TYPE

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return bgp(
        triples,
        [
            ("?f", RDF_TYPE, NS + "File"),
            ("?f", NS + "language", "?lang"),
        ],
        optional=[
            (
                [("?f", NS + "imports", "?hub")],
                [("hub", "prefix", MOD_NS + "core")],
            )
        ],
        filters=[("lang", "!=", "rs")],
    )


def sql_kg_bgp_optional() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import MOD_NS, NS
    from ..schema import RDF_TYPE
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.s AS f, t2.o AS lang, t3.o AS hub
FROM raw_triples t1
JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "language")}
LEFT JOIN raw_triples t3 ON t3.s = t1.s AND t3.p = {_q(NS + "imports")}
  AND t3.o LIKE {_q(MOD_NS + "core%")}
WHERE t1.p = {_q(RDF_TYPE)} AND t1.o = {_q(NS + "File")} AND t2.o <> 'rs'
ORDER BY f, hub"""
    )


def sql_kg_bgp() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.s AS f, t1.o AS m, t2.o AS r, t3.o AS a
FROM raw_triples t1
JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
JOIN raw_triples t3 ON t3.s = t2.o AND t3.p = {_q(NS + "author")}
WHERE t1.p = {_q(NS + "imports")}
ORDER BY f, m"""
    )


def q_kg_bgp_agg(sf_dir: str, *, num_partitions: int = _P):
    """SPARQL aggregate over a BGP (GROUP BY + COUNT + COUNT DISTINCT):

        SELECT ?a (COUNT(*) AS n_matches)
                  (COUNT(DISTINCT ?m) AS n_modules)
        WHERE { ?f <imports> ?m . ?f <inRepo> ?r . ?r <author> ?a }
        GROUP BY ?a

    Plan: the BGP's (already globally DISTINCT) match relation feeds ONE
    author-hash exchange carrying two pre-reduced partial streams in one
    union-tagged pass — per-batch (a, n) count partials (side 0) and
    per-batch deduped (a, m) pairs (side 1) — so shuffle volume is
    authors×batches + distinct author-module pairs, not match rows.
    Per partition: counts sum; modules dedup-then-count, exact because an
    author's rows co-locate."""
    from ..stages.extract import NS, extract_triples
    from ..sources.synth import read_source_files

    from .queries import _extracted

    triples = _extracted(sf_dir)
    matches = bgp(
        triples,
        [
            ("?f", f"{NS}imports", "?m"),
            ("?f", f"{NS}inRepo", "?r"),
            ("?r", f"{NS}author", "?a"),
        ],
        num_partitions=num_partitions,
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=object),
                "m": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "side": pd.Series([], dtype="int8"),
                "_part": pd.Series([], dtype="int64"),
            }
        )
        if not len(b) or "a" not in b.columns:
            return empty
        counts = b.groupby("a", sort=False, as_index=False).size()
        c = pd.DataFrame(
            {
                "a": counts["a"].astype(object),
                "m": "",
                "n": counts["size"].astype("int64"),
                "side": np.int8(0),
            }
        )
        mods = b[["a", "m"]].drop_duplicates()
        m = pd.DataFrame(
            {
                "a": mods["a"].astype(object),
                "m": mods["m"].astype(object),
                "n": np.int64(0),
                "side": np.int8(1),
            }
        )
        out = pd.concat([c, m], ignore_index=True)
        out["_part"] = (
            pd.util.hash_pandas_object(out["a"], index=False) % num_partitions
        ).astype("int64")
        return out

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "author": pd.Series([], dtype=object),
                "n_matches": pd.Series([], dtype="int64"),
                "n_modules": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "side" not in g.columns:
            return empty
        n = (
            g[g["side"] == 0]
            .groupby("a", sort=False)["n"]
            .sum()
            .rename("n_matches")
        )
        nm = (
            g[g["side"] == 1][["a", "m"]]
            .drop_duplicates()
            .groupby("a", sort=False)
            .size()
            .rename("n_modules")
        )
        out = pd.concat([n, nm], axis=1).reset_index().rename(columns={"a": "author"})
        out["author"] = out["author"].astype(object)
        return out.astype({"n_matches": "int64", "n_modules": "int64"})

    return (
        matches.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
    )


def sql_kg_bgp_agg() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT a AS author, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(count(DISTINCT m) AS BIGINT) AS n_modules
FROM (
  SELECT DISTINCT t1.s AS f, t1.o AS m, t2.o AS r, t3.o AS a
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
  JOIN raw_triples t3 ON t3.s = t2.o AND t3.p = {_q(NS + "author")}
  WHERE t1.p = {_q(NS + "imports")}
)
GROUP BY 1 ORDER BY 1"""
    )


def q_kg_bgp_agg_minmax(sf_dir: str, *, num_partitions: int = _P):
    """SPARQL MIN/MAX/AVG aggregates over a BGP (rounding out
    :func:`q_kg_bgp_agg`'s COUNT family):

        SELECT ?a (MIN(?m) AS ?first_module) (MAX(?m) AS ?last_module)
                  (COUNT(*) AS ?n) (AVG(STRLEN(?m)) AS ?avg_len)
        WHERE { ?f <imports> ?m . ?f <inRepo> ?r . ?r <author> ?a }
        GROUP BY ?a

    MIN/MAX are associative (per-batch partials pre-reduce before the
    author exchange); AVG is the exact (sum, n) integer pair with ONE
    floor division at the end — `avg_len_q = (10⁶·Σ strlen)//n`."""
    from ..sources.synth import read_source_files
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    matches = bgp(
        triples,
        [
            ("?f", f"{NS}imports", "?m"),
            ("?f", f"{NS}inRepo", "?r"),
            ("?r", f"{NS}author", "?a"),
        ],
        num_partitions=num_partitions,
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype=object),
             "mn": pd.Series([], dtype=object), "mx": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64"), "s": pd.Series([], dtype="int64"),
             "_part": pd.Series([], dtype="int64")}
        )
        if not len(b) or "a" not in b.columns:
            return empty
        g = (
            b.assign(_len=b["m"].str.len().astype("int64"))
            .groupby("a", sort=False)
            .agg(mn=("m", "min"), mx=("m", "max"), n=("m", "size"), s=("_len", "sum"))
            .reset_index()
        )
        g["_part"] = (
            pd.util.hash_pandas_object(g["a"], index=False) % num_partitions
        ).astype("int64")
        return g.astype({"n": "int64", "s": "int64"})

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"author": pd.Series([], dtype=object),
             "first_module": pd.Series([], dtype=object),
             "last_module": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64"),
             "avg_len_q": pd.Series([], dtype="int64")}
        )
        if not len(g) or "a" not in g.columns:
            return empty
        out = g.groupby("a", sort=False).agg(
            first_module=("mn", "min"), last_module=("mx", "max"),
            n=("n", "sum"), s=("s", "sum"),
        ).reset_index().rename(columns={"a": "author"})
        out["avg_len_q"] = (1_000_000 * out["s"].astype("int64")) // out["n"].astype(
            "int64"
        )
        return out[["author", "first_module", "last_module", "n", "avg_len_q"]].astype(
            {"n": "int64", "avg_len_q": "int64"}
        )

    return (
        matches.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
    )


def sql_kg_bgp_agg_minmax() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
m AS (
  SELECT DISTINCT t1.s AS f, t1.o AS m, t2.o AS r, t3.o AS a
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
  JOIN raw_triples t3 ON t3.s = t2.o AND t3.p = {_q(NS + "author")}
  WHERE t1.p = {_q(NS + "imports")}
)
SELECT a AS author, min(m) AS first_module, max(m) AS last_module,
       CAST(count(*) AS BIGINT) AS n,
       CAST((1000000 * sum(length(m))) // count(*) AS BIGINT) AS avg_len_q
FROM m GROUP BY 1 ORDER BY 1"""
    )


def q_kg_bgp_coalesce(sf_dir: str, *, num_partitions: int = _P):
    """OPTIONAL + COALESCE projection with an aggregate — SPARQL's
    bound-or-default idiom:

        SELECT (COALESCE(?a, "unknown") AS ?author) (COUNT(*) AS ?n_repos)
        WHERE { ?r rdf:type Repository . OPTIONAL { ?r <author> ?a } }
        GROUP BY COALESCE(?a, "unknown")

    Unbound OPTIONAL rows fold into the sentinel bucket instead of
    vanishing (the difference vs a plain BGP join). One author-hash
    exchange of per-batch count partials."""
    from ..schema import RDF_TYPE
    from ..sources.synth import read_source_files
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    matches = bgp(
        triples,
        [("?r", RDF_TYPE, NS + "Repository")],
        optional=[([("?r", NS + "author", "?a")], [])],
        num_partitions=num_partitions,
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"author": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64"),
             "_part": pd.Series([], dtype="int64")}
        )
        if not len(b) or "r" not in b.columns:
            return empty
        a = b["a"] if "a" in b.columns else pd.Series([None] * len(b))
        coal = a.where(a.notna(), "unknown").astype(object)
        g = pd.DataFrame({"author": coal}).groupby("author", sort=False).size()
        g = g.reset_index(name="n")
        g["_part"] = (
            pd.util.hash_pandas_object(g["author"], index=False) % num_partitions
        ).astype("int64")
        return g.astype({"n": "int64"})

    def census(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "author" not in g.columns:
            return pd.DataFrame(
                {"author": pd.Series([], dtype=object),
                 "n_repos": pd.Series([], dtype="int64")}
            )
        out = g.groupby("author", sort=False, as_index=False)["n"].sum()
        return out.rename(columns={"n": "n_repos"}).astype({"n_repos": "int64"})

    return (
        matches.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
    )


def sql_kg_bgp_coalesce() -> str:
    from ..schema import RDF_TYPE
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
repos AS (
  SELECT DISTINCT s AS r FROM raw_triples
  WHERE p = {_q(RDF_TYPE)} AND o = {_q(NS + "Repository")}
),
auth AS (
  SELECT DISTINCT s AS r, o AS a FROM raw_triples WHERE p = {_q(NS + "author")}
)
SELECT coalesce(auth.a, 'unknown') AS author,
       CAST(count(*) AS BIGINT) AS n_repos
FROM repos LEFT JOIN auth USING (r)
GROUP BY 1 ORDER BY 1"""
    )


def q_kg_bgp_subquery(sf_dir: str, *, num_partitions: int = _P):
    """SPARQL subquery: an inner aggregate SELECT feeding an outer
    per-group winner —

        SELECT ?r ?m ?n WHERE {
          { SELECT ?r ?m (COUNT(?f) AS ?n)
            WHERE { ?f <imports> ?m . ?f <inRepo> ?r } GROUP BY ?r ?m }
        }  # keep the (n DESC, ?m ASC) winner per ?r

    ("each repository's most-imported module"). Plan: the BGP's distinct
    match relation pre-reduces per batch to (r, m, n) count partials,
    then ONE repo-hash exchange makes both the global (r, m) counts and
    the per-repo rank partition-local — the subquery result never
    materializes globally, only its winner rows leave the partition."""
    from ..stages.extract import NS, extract_triples
    from ..sources.synth import read_source_files

    from .queries import _extracted

    triples = _extracted(sf_dir)
    matches = bgp(
        triples,
        [("?f", f"{NS}imports", "?m"), ("?f", f"{NS}inRepo", "?r")],
        num_partitions=num_partitions,
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"r": pd.Series([], dtype=object), "m": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64"), "_part": pd.Series([], dtype="int64")}
        )
        if not len(b) or "r" not in b.columns:
            return empty
        g = b.groupby(["r", "m"], sort=False).size().reset_index(name="n")
        g["_part"] = (
            pd.util.hash_pandas_object(g["r"], index=False) % num_partitions
        ).astype("int64")
        return g.astype({"n": "int64"})

    def winner(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"repo": pd.Series([], dtype=object),
             "top_module": pd.Series([], dtype=object),
             "n_files": pd.Series([], dtype="int64")}
        )
        if not len(g) or "r" not in g.columns:
            return empty
        agg = g.groupby(["r", "m"], sort=False, as_index=False)["n"].sum()
        agg = agg.sort_values(["r", "n", "m"], ascending=[True, False, True])
        top = agg.groupby("r", sort=False).head(1)
        return pd.DataFrame(
            {"repo": top["r"].astype(object),
             "top_module": top["m"].astype(object),
             "n_files": top["n"].astype("int64")}
        ).reset_index(drop=True)

    return (
        matches.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(winner, batch_format="pandas")
    )


def sql_kg_bgp_subquery() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
base AS (
  SELECT DISTINCT t1.s AS f, t1.o AS m, t2.o AS r
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
  WHERE t1.p = {_q(NS + "imports")}
),
agg AS (SELECT r, m, count(*) AS n FROM base GROUP BY 1, 2),
ranked AS (
  SELECT r, m, n,
         row_number() OVER (PARTITION BY r ORDER BY n DESC, m ASC) AS rnk
  FROM agg
)
SELECT r AS repo, m AS top_module, CAST(n AS BIGINT) AS n_files
FROM ranked WHERE rnk = 1 ORDER BY repo"""
    )


def q_kg_construct(sf_dir: str, *, num_partitions: int = _P):
    """SPARQL CONSTRUCT — materialize NEW triples from a pattern match
    (the graph-transformation half of SPARQL; tripsu-class pipelines use
    it to derive edges the source never stated):

        CONSTRUCT { ?a1 <coAuthor> ?a2 }
        WHERE { ?r <author> ?a1 . ?r <author> ?a2 . FILTER(?a1 < ?a2) }

    The var-var FILTER makes each unordered co-author pair canonical
    (emitted once, lexicographically). Plan: the BGP machinery produces
    the DISTINCT (r, a1, a2) matches; projecting away ?r re-dedups via
    one row-hash exchange — output is a valid TRIPLES-shaped stream
    ready to union back into the graph."""
    from ..stages.extract import NS, extract_triples
    from ..sources.synth import read_source_files

    from .queries import _extracted

    triples = _extracted(sf_dir)
    matches = bgp(
        triples,
        [("?r", f"{NS}author", "?a1"), ("?r", f"{NS}author", "?a2")],
        filters=[("a1", "<", "?a2")],
        num_partitions=num_partitions,
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=object) for c in ("s", "p", "o")})
        if not len(b) or "a1" not in b.columns:
            return empty
        out = pd.DataFrame(
            {
                "s": b["a1"].astype(object),
                "p": f"{NS}coAuthor",
                "o": b["a2"].astype(object),
            }
        ).drop_duplicates()
        out["_part"] = (
            pd.util.hash_pandas_object(out["s"].astype(str) + "\x00" + out["o"].astype(str),
                                       index=False)
            % num_partitions
        ).astype("int64")
        return out

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=object) for c in ("s", "p", "o")})
        if not len(g) or "s" not in g.columns:
            return empty
        return g[["s", "p", "o"]].drop_duplicates(ignore_index=True)

    return (
        matches.map_batches(project, batch_format="pandas")
        .groupby("_part")
        .map_groups(dedup, batch_format="pandas")
    )


def sql_kg_construct() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.o AS s, {_q(NS + "coAuthor")} AS p, t2.o AS o
FROM raw_triples t1
JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "author")}
  AND t1.o < t2.o
WHERE t1.p = {_q(NS + "author")}
ORDER BY s, o"""
    )


def q_kg_describe(sf_dir: str, *, license: str = "MIT", num_partitions: int = _P):
    """SPARQL DESCRIBE — the 1-hop subgraph around a seed set (here: all
    repos carrying the given license): every triple whose subject OR
    object is a seed node, DISTINCT. Plan: the seed set is a small-side
    fold (repos ≪ triples) broadcast via `ray.put`; one map pass filters
    the triple stream vectorized (isin on both endpoints, local dedup);
    the global DISTINCT is one row-hash exchange. At scale the seed set
    graduates to the Bloom-pruned exchange (`rel_bloom_semi_join`'s
    plan) when it outgrows a broadcast."""
    import ray

    from ..stages.extract import NS, extract_triples
    from ..sources.synth import read_source_files
    from ..stages.folds import tree_fold_tables

    from .queries import _extracted

    triples = _extracted(sf_dir)

    def seed_partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["predicate"] == NS + "license") & (b["object_value"] == license)
        return pd.DataFrame({"s": b["subject"][m].astype(object)}).drop_duplicates()

    def seed_combine(frames):
        return pd.concat(frames, ignore_index=True).drop_duplicates(ignore_index=True)

    seeds = tree_fold_tables(
        triples.map_batches(seed_partial, batch_format="pandas"), seed_combine
    )
    seed_ref = ray.put(
        frozenset(seeds["s"]) if seeds is not None and len(seeds) else frozenset()
    )

    def hop(b: pd.DataFrame, _s=seed_ref) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in ("s", "p", "o")}
        ).assign(_part=pd.Series([], dtype="int64"))
        if not len(b):
            return empty
        ss = ray.get(_s)
        m = b["subject"].isin(ss).to_numpy() | b["object_value"].isin(ss).to_numpy()
        if not m.any():
            return empty
        f = b[m]
        out = pd.DataFrame(
            {
                "s": f["subject"].astype(object),
                "p": f["predicate"].astype(object),
                "o": f["object_value"].astype(object),
            }
        ).drop_duplicates()
        out["_part"] = (
            pd.util.hash_pandas_object(
                out["s"].astype(str) + "\x00" + out["p"].astype(str) + "\x00"
                + out["o"].astype(str),
                index=False,
            )
            % num_partitions
        ).astype("int64")
        return out

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=object) for c in ("s", "p", "o")})
        if not len(g) or "s" not in g.columns:
            return empty
        return g[["s", "p", "o"]].drop_duplicates(ignore_index=True)

    return (
        triples.map_batches(hop, batch_format="pandas")
        .groupby("_part")
        .map_groups(dedup, batch_format="pandas")
    )


def sql_kg_describe(license: str = "MIT") -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT s, p, o FROM raw_triples
WHERE s IN (SELECT s FROM raw_triples
            WHERE p = {_q(NS + "license")} AND o = {_q(license)})
   OR o IN (SELECT s FROM raw_triples
            WHERE p = {_q(NS + "license")} AND o = {_q(license)})
ORDER BY s, p, o"""
    )


def q_kg_bgp_union(sf_dir: str, *, num_partitions: int = _P):
    """SPARQL UNION showcase — files of interest by EITHER signal, with
    their repo:

        { ?f <imports> mod/core . ?f <inRepo> ?r }
        UNION
        { ?f <language> "rs" . ?f <inRepo> ?r }

    Each branch is its own conjunction (join included) so the union
    exercises branch-level plans, not just single-pattern selections.
    DuckDB oracle: UNION of the two join queries (set semantics both
    sides)."""
    from ..sources.synth import read_source_files
    from ..stages.extract import MOD_NS, NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return bgp_union(
        triples,
        [
            [("?f", NS + "imports", MOD_NS + "core"), ("?f", NS + "inRepo", "?r")],
            [("?f", NS + "language", "rs"), ("?f", NS + "inRepo", "?r")],
        ],
        num_partitions=num_partitions,
    )


def sql_kg_bgp_union() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import MOD_NS, NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT f, r FROM (
  SELECT t1.s AS f, t2.o AS r
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
  WHERE t1.p = {_q(NS + "imports")} AND t1.o = {_q(MOD_NS + "core")}
  UNION
  SELECT t1.s AS f, t2.o AS r
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
  WHERE t1.p = {_q(NS + "language")} AND t1.o = 'rs'
) ORDER BY f, r"""
    )


def q_kg_bgp_minus(sf_dir: str, *, num_partitions: int = _P):
    """SPARQL MINUS showcase — typed files and their language, EXCLUDING
    files that import the hub module (distributed anti-join):

        ?f rdf:type File . ?f <language> ?lang .
        MINUS { ?f <imports> mod/core }

    DuckDB oracle: the join with a NOT-IN anti condition."""
    from ..schema import RDF_TYPE
    from ..sources.synth import read_source_files
    from ..stages.extract import MOD_NS, NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return bgp(
        triples,
        [
            ("?f", RDF_TYPE, NS + "File"),
            ("?f", NS + "language", "?lang"),
        ],
        minus=[[("?f", NS + "imports", MOD_NS + "core")]],
        num_partitions=num_partitions,
    )


def sql_kg_bgp_minus() -> str:
    from ..schema import RDF_TYPE
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import MOD_NS, NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.s AS f, t2.o AS lang
FROM raw_triples t1
JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "language")}
WHERE t1.p = {_q(RDF_TYPE)} AND t1.o = {_q(NS + "File")}
  AND t1.s NOT IN (SELECT s FROM raw_triples
                   WHERE p = {_q(NS + "imports")} AND o = {_q(MOD_NS + "core")})
ORDER BY f, lang"""
    )


def q_kg_bgp_values(sf_dir: str, *, num_partitions: int = _P):
    """SPARQL VALUES showcase — restrict bindings by an inline data block
    (broadcast-joined; the block is literal query text, never big):

        VALUES ?lang { "py" "go" }
        ?f <language> ?lang . ?f <inRepo> ?r

    ("go" matches nothing — inline values outside the data are legal and
    must simply bind nothing.) DuckDB oracle: join against a VALUES
    relation."""
    from ..sources.synth import read_source_files
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return bgp(
        triples,
        [
            ("?f", NS + "language", "?lang"),
            ("?f", NS + "inRepo", "?r"),
        ],
        values=(("?lang",), [("py",), ("go",)]),
        num_partitions=num_partitions,
    )


def sql_kg_bgp_values() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.s AS f, t1.o AS lang, t2.o AS r
FROM raw_triples t1
JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
JOIN (VALUES ('py'), ('go')) v(lang) ON v.lang = t1.o
WHERE t1.p = {_q(NS + "language")}
ORDER BY f, lang, r"""
    )


def bgp_topk(
    triples,
    patterns,
    *,
    order_by: str,
    limit: int,
    offset: int = 0,
    ascending: bool = True,
    optional=(),
    filters=(),
    minus=(),
    values=None,
    num_partitions: int = _P,
):
    """SPARQL solution modifiers ``ORDER BY ?v LIMIT k [OFFSET o]`` over
    the DISTINCT bindings — distributed top-k, never a global sort: each
    partition of the deduped binding stream emits its LOCAL top-(k+o)
    (total order = (order_by, then every variable lexicographically) so
    ties are deterministic), and the (k+o)·partitions-row partial stream
    reduces in one tiny final pass that drops the first ``offset`` rows
    (the paging modifier costs only partial-stream width, never a second
    scan). Returns exactly ``limit`` rows (or fewer)."""
    rel, vars_ = _bgp_rel(
        triples,
        patterns,
        optional=optional,
        minus=minus,
        values=values,
        num_partitions=num_partitions,
    )
    if order_by.startswith("?"):
        order_by = order_by[1:]
    if order_by not in vars_:
        raise ValueError(f"ORDER BY ?{order_by} not among variables {vars_}")
    distinct = _distinct_bindings(rel, vars_, filters, num_partitions=num_partitions)
    sort_cols = [order_by] + [v for v in vars_ if v != order_by]
    asc = [ascending] + [True] * (len(vars_) - 1)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({v: pd.Series([], dtype=object) for v in vars_})
        return df.sort_values(sort_cols, ascending=asc).head(limit + offset)[vars_]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({v: pd.Series([], dtype=object) for v in vars_})
        return (
            df.sort_values(sort_cols, ascending=asc)
            .head(limit + offset)[vars_]
            .iloc[offset:]
            .reset_index(drop=True)
        )

    return (
        distinct.map_batches(local_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas")
    )


def q_kg_bgp_topk(sf_dir: str, *, limit: int = 25, num_partitions: int = _P):
    """ORDER BY + LIMIT showcase — the last 25 (file, module, repo)
    bindings in descending file order:

        SELECT ?f ?m ?r WHERE { ?f <imports> ?m . ?f <inRepo> ?r }
        ORDER BY DESC(?f) ?m ?r LIMIT 25

    DuckDB oracle: same DISTINCT + ORDER BY + LIMIT (binary collation =
    Python string order on this ASCII data)."""
    from ..sources.synth import read_source_files
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return bgp_topk(
        triples,
        [("?f", NS + "imports", "?m"), ("?f", NS + "inRepo", "?r")],
        order_by="?f",
        ascending=False,
        limit=limit,
        num_partitions=num_partitions,
    )


def sql_kg_bgp_topk(limit: int = 25) -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.s AS f, t1.o AS m, t2.o AS r
FROM raw_triples t1
JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
WHERE t1.p = {_q(NS + "imports")}
ORDER BY f DESC, m, r LIMIT {limit}"""
    )


def q_kg_bgp_bind(sf_dir: str, *, num_partitions: int = _P):
    """BIND showcase — derive new bindings from matched ones:

        SELECT ?f ?m ?mname ?r ?tag WHERE {
          ?f <imports> ?m . ?f <inRepo> ?r
          BIND(STRAFTER(STR(?m), mod-ns) AS ?mname)
          BIND(CONCAT(STR(?r), "#", ?mname) AS ?tag)
        }

    The binds are vectorized map-only passes over the joined bindings
    (zero extra shuffle — the final DISTINCT exchange was already there).
    DuckDB oracle: the same expressions via instr/substr and ``||``."""
    from ..sources.synth import read_source_files
    from ..stages.extract import MOD_NS, NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return bgp(
        triples,
        [("?f", NS + "imports", "?m"), ("?f", NS + "inRepo", "?r")],
        bind=[
            ("mname", ("strafter", "?m", MOD_NS)),
            ("tag", ("concat", "?r", "#", "?mname")),
        ],
        num_partitions=num_partitions,
    )


def sql_kg_bgp_bind() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import MOD_NS, NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    sep = _q(MOD_NS)
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT f, m, mname, r, r || '#' || mname AS tag
FROM (
  SELECT t1.s AS f, t1.o AS m,
         CASE WHEN instr(t1.o, {sep}) > 0
              THEN substr(t1.o, instr(t1.o, {sep}) + {len(MOD_NS)})
              ELSE '' END AS mname,
         t2.o AS r
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
  WHERE t1.p = {_q(NS + "imports")}
)
ORDER BY f, m, r"""
    )


def q_kg_bgp_ask(sf_dir: str, *, num_partitions: int = _P) -> pd.DataFrame:
    """ASK showcase — two existence probes, one satisfiable and one not:

        ASK { ?f <imports> mod:core . ?f <language> "py" }   → 1
        ASK { ?f <language> "cobol" }                        → 0

    The satisfiable probe early-stops after the first matching batch; the
    unsatisfiable one streams through without ever shuffling. DuckDB
    oracle: CAST(EXISTS(...) AS BIGINT) per probe."""
    from ..sources.synth import read_source_files
    from ..stages.extract import MOD_NS, NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    probes = {
        "cobol_file": ([("?f", NS + "language", "cobol")], {}),
        "core_import_py": (
            [
                ("?f", NS + "imports", MOD_NS + "core"),
                ("?f", NS + "language", "py"),
            ],
            {},
        ),
    }
    rows = [
        (name, int(bgp_ask(triples, pats, num_partitions=num_partitions, **kw)))
        for name, (pats, kw) in sorted(probes.items())
    ]
    return pd.DataFrame(rows, columns=["probe", "ask"]).astype({"ask": "int64"})


def sql_kg_bgp_ask() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import MOD_NS, NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT 'cobol_file' AS probe, CAST(EXISTS(
  SELECT 1 FROM raw_triples WHERE p = {_q(NS + "language")} AND o = 'cobol'
) AS BIGINT) AS ask
UNION ALL
SELECT 'core_import_py' AS probe, CAST(EXISTS(
  SELECT 1 FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "language")} AND t2.o = 'py'
  WHERE t1.p = {_q(NS + "imports")} AND t1.o = {_q(MOD_NS + "core")}
) AS BIGINT) AS ask
ORDER BY probe"""
    )


def q_kg_bgp_exists(sf_dir: str, *, num_partitions: int = _P):
    """FILTER EXISTS / NOT EXISTS showcase — files (with language) that
    import at least one ``mod_1``-family module but do NOT import the
    ``core`` hub:

        SELECT ?f ?lang WHERE {
          ?f <language> ?lang .
          FILTER EXISTS     { ?f <imports> ?m FILTER(strstarts(?m, mod/mod_1)) }
          FILTER NOT EXISTS { ?f <imports> ?h FILTER(strstarts(?h, mod/core)) }
        }

    Both groups evaluate as correlated semi-/anti-joins on ?f through the
    same adaptive broadcast/exchange gate as OPTIONAL/MINUS. DuckDB
    oracle: WHERE EXISTS(...) AND NOT EXISTS(...)."""
    from ..sources.synth import read_source_files
    from ..stages.extract import MOD_NS, NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return bgp(
        triples,
        [("?f", NS + "language", "?lang")],
        exists=[
            (
                [("?f", NS + "imports", "?m")],
                [("m", "prefix", MOD_NS + "mod_1")],
            )
        ],
        not_exists=[
            (
                [("?f", NS + "imports", "?h")],
                [("h", "prefix", MOD_NS + "core")],
            )
        ],
        num_partitions=num_partitions,
    )


def sql_kg_bgp_exists() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import MOD_NS, NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.s AS f, t1.o AS lang
FROM raw_triples t1
WHERE t1.p = {_q(NS + "language")}
  AND EXISTS (
    SELECT 1 FROM raw_triples t2
    WHERE t2.s = t1.s AND t2.p = {_q(NS + "imports")}
      AND t2.o LIKE {_q(MOD_NS + "mod_1%")}
  )
  AND NOT EXISTS (
    SELECT 1 FROM raw_triples t3
    WHERE t3.s = t1.s AND t3.p = {_q(NS + "imports")}
      AND t3.o LIKE {_q(MOD_NS + "core%")}
  )
ORDER BY f, lang"""
    )


def q_kg_bgp_group_concat(sf_dir: str, *, num_partitions: int = _P):
    """SPARQL GROUP_CONCAT over a BGP — per author, the DISTINCT modules
    their repos' files import, as an ordered comma list:

        SELECT ?a (GROUP_CONCAT(DISTINCT ?m; separator=",") AS ?modules)
               (COUNT(DISTINCT ?m) AS ?n)
        WHERE { ?r <author> ?a . ?f <inRepo> ?r . ?f <imports> ?m }
        GROUP BY ?a

    List aggregation is order-sensitive, so the order is fixed BEFORE
    concatenation (the ``rel_listagg`` discipline): the BGP's DISTINCT
    (a, m) bindings co-partition on the author, each partition sorts its
    authors' modules and renders the string ONCE — partial strings are
    never concatenated. DuckDB oracle: ``string_agg(DISTINCT m, ','
    ORDER BY m)``."""
    from ..sources.synth import read_source_files
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    matches = bgp(
        triples,
        [
            ("?r", NS + "author", "?a"),
            ("?f", NS + "inRepo", "?r"),
            ("?f", NS + "imports", "?m"),
        ],
        num_partitions=num_partitions,
    )

    def redist(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=object),
                "m": pd.Series([], dtype=object),
                "_gc": pd.Series([], dtype="int64"),
            }
        )
        if not len(df) or "a" not in df.columns:
            return empty
        out = df[["a", "m"]].drop_duplicates()
        out["_gc"] = (
            pd.util.hash_array(out["a"].to_numpy(dtype=object)) % num_partitions
        ).astype("int64")
        return out

    def concat_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=object),
                "n_modules": pd.Series([], dtype="int64"),
                "modules": pd.Series([], dtype=object),
            }
        )
        if not len(g) or "a" not in g.columns:
            return empty
        d = g[["a", "m"]].drop_duplicates().sort_values(["a", "m"])
        agg = d.groupby("a", sort=False)["m"].agg(
            n_modules="size", modules=lambda s: ",".join(s)
        )
        return agg.reset_index().astype({"n_modules": "int64"})

    return (
        matches.map_batches(redist, batch_format="pandas")
        .groupby("_gc")
        .map_groups(concat_part, batch_format="pandas")
    )


def sql_kg_bgp_group_concat() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT t1.o AS a,
       CAST(count(DISTINCT t3.o) AS BIGINT) AS n_modules,
       string_agg(DISTINCT t3.o, ',' ORDER BY t3.o) AS modules
FROM raw_triples t1
JOIN raw_triples t2 ON t2.o = t1.s AND t2.p = {_q(NS + "inRepo")}
JOIN raw_triples t3 ON t3.s = t2.s AND t3.p = {_q(NS + "imports")}
WHERE t1.p = {_q(NS + "author")}
GROUP BY t1.o ORDER BY a"""
    )


def q_kg_bgp_page(sf_dir: str, *, limit: int = 20, offset: int = 30, num_partitions: int = _P):
    """OFFSET paging showcase — the SECOND page of the ordered binding
    stream (rows 31–50 by ascending file): same distributed top-k plan,
    partial width k+o. DuckDB oracle: LIMIT 20 OFFSET 30."""
    from ..sources.synth import read_source_files
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return bgp_topk(
        triples,
        [("?f", NS + "imports", "?m"), ("?f", NS + "inRepo", "?r")],
        order_by="?f",
        limit=limit,
        offset=offset,
        num_partitions=num_partitions,
    )


def sql_kg_bgp_page(limit: int = 20, offset: int = 30) -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.s AS f, t1.o AS m, t2.o AS r
FROM raw_triples t1
JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "inRepo")}
WHERE t1.p = {_q(NS + "imports")}
ORDER BY f, m, r LIMIT {limit} OFFSET {offset}"""
    )
