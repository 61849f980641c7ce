"""Dominance-predicate SQL builders (engine-side and duckdb-oracle-side).

The dominance relation (SURVEY.md §1.1, ``ServiceTuple.java:67-77``):
``q`` dominates ``p``  iff  ``forall i: q_i <= p_i`` and ``exists i: q_i < p_i``
(minimization; MAX dimensions are negated before comparison; ties retained).

``skyline_oracle_sql`` emits the duckdb oracle in a *two-level bucketed*
form — local NOT-EXISTS skyline per hash bucket, then a global NOT-EXISTS
over the (small) union of local skylines.  This is semantically identical to
the flat NOT-EXISTS anti-join (skyline-merge associativity) but turns the
O(n^2) nested-loop into O(n^2 / B + |candidates|^2), which keeps the oracle
tractable at sf0.01+ .  The bucket expression is oracle-internal: ANY
bucketing yields the same skyline.
"""

from __future__ import annotations

from collections.abc import Sequence


def _norm_dims(dims: Sequence) -> list[tuple[str, str]]:
    out = []
    for d in dims:
        if isinstance(d, str):
            out.append((d, "min"))
        else:
            out.append((d[0], d[1].lower()))
    return out


def dominance_pred_sql(q: str, p: str, dim_names: Sequence[str]) -> str:
    """`q` dominates `p` over already-minimized columns ``dim_names``."""
    le = " AND ".join(f"{q}.{c} <= {p}.{c}" for c in dim_names)
    lt = " OR ".join(f"{q}.{c} < {p}.{c}" for c in dim_names)
    return f"({le}) AND ({lt})"


def skyline_oracle_sql(
    table_sql: str,
    dims: Sequence,
    out_cols: Sequence[str],
    bucket_sql: str,
    group_by: Sequence[str] | None = None,
    n_buckets: int = 64,
) -> str:
    """duckdb oracle for ``SKYLINE(table_sql; dims)`` returning ``out_cols``.

    ``table_sql``: a SELECT (or table name) producing the input rows with
    every column referenced by ``out_cols``/``dims``/``bucket_sql``.
    ``dims``: column names or (name, 'min'|'max') pairs — expressions
    allowed in the name slot as long as they are valid in a SELECT list.
    ``bucket_sql``: deterministic-per-row expression over src columns used
    only to split the local phase (e.g. ``l_orderkey % 64``).
    ``group_by``: optional per-group skyline keys (dominance restricted to
    equal keys).
    """
    nd = _norm_dims(dims)
    dim_aliases = [f"__d{i}" for i in range(len(nd))]
    dim_select = ", ".join(
        (f"-({c}) AS {a}" if direction == "max" else f"({c}) AS {a}")
        for (c, direction), a in zip(nd, dim_aliases)
    )
    notnull = " AND ".join(f"{a} IS NOT NULL AND NOT isnan({a})" for a in dim_aliases)
    grp = list(group_by or [])
    grp_eq = "".join(f" AND q.{g} = p.{g}" for g in grp)
    dom = dominance_pred_sql("q", "p", dim_aliases)
    out_list = ", ".join(f"p.{c}" for c in out_cols)

    return f"""
WITH src AS (
  SELECT *, {dim_select}, ({bucket_sql}) % {n_buckets} AS __b
  FROM ({table_sql})
),
val AS (SELECT * FROM src WHERE {notnull}),
loc AS (
  SELECT p.* FROM val p
  WHERE NOT EXISTS (
    SELECT 1 FROM val q
    WHERE q.__b = p.__b{grp_eq} AND {dom}
  )
)
SELECT {out_list} FROM loc p
WHERE NOT EXISTS (
  SELECT 1 FROM loc q
  WHERE {dom}{grp_eq}
)
""".strip()
