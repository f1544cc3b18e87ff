"""TPC-H join-shape compositions (Q4/Q14/Q15/Q17/Q18/Q22 adapted to the
driver tables): each must be value-exact against its registered DuckDB
oracle at sf0.001 — the same comparison the graft driver runs at sf0.01.

These six shapes cover the join compositions the earlier Q1/Q3/Q6/Q9/Q13
suite misses: EXISTS semi (Q4), dim-attribute conditional aggregate
(Q14), argmax vs a global scalar (Q15), fact-side correlated average
(Q17), HAVING-filtered group joined back into two dims (Q18), and
global-threshold + NOT-EXISTS anti (Q22)."""

import hashlib
import importlib
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
NEW = [
    "q4_order_priority",
    "q14_promo_share",
    "q15_top_supplier",
    "q17_small_qty",
    "q18_volume_customers",
    "q22_idle_customers",
    "q10_returned_items",
]


def _hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", NEW)
def test_tpch_shape_matches_oracle(ray_session, oracle_con, name):
    e = importlib.import_module("__ray_entry__")
    got = e.queries()[name](SF_DIR).to_pandas()
    want = oracle_con.execute(e.oracle_sql()[name]).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    assert _hash(got) == _hash(want)
