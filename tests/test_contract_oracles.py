"""Cross-engine gate rehearsal: run every ``queries()`` entry on Spark
and its ``oracle_sql()`` on DuckDB over the same parquet tables, then
compare row count, column names, and order-insensitive values — the
same comparison shape the driver applies at sf0.01.

Runs at sf0.001 to keep the suite fast; any mismatch here would be a
mismatch in the driver's CORRECTNESS gate too.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _type_sig(rows, cols):
    """Per-column set of value type classes (None excluded), keyed by
    lowercase column name.  The driver's hash is TYPE-sensitive (it goes
    through Arrow), so a DuckDB HUGEINT surfacing as ``Decimal`` against a
    Spark BIGINT ``int`` must fail HERE, not first at the driver
    (round-4 `graph_maxflow` escape)."""
    sig = {c: set() for c in cols}
    for r in rows:
        for c, v in zip(cols, r):
            if v is not None:
                sig[c].add(type(v).__name__)
    return sig


def _canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, round
    floats, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 6)
                if math.isnan(v):
                    v = "nan"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_pair(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sig_s = _type_sig(spark_rows, spark_cols)
    sig_d = _type_sig(duck_rows, duck_cols)
    bad_types = {
        c: (sorted(sig_s[c]), sorted(sig_d[c]))
        for c in sig_s
        if sig_s[c] != sig_d[c]
    }
    assert not bad_types, (
        f"{name}: output TYPE mismatch (driver hash is type-sensitive): "
        f"{bad_types}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
