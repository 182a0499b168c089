"""Driver-gate replica: every queries() entry with an oracle must match
DuckDB exactly at sf0.01 (same comparison the driver runs, but stricter)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_ORACLE
from tests.oracle_check import compare, duck_con

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR_ORACLE)


def _cases():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return sorted(q.keys()), q, o


NAMES, QUERIES, ORACLES = _cases()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    # Driver-canonicalizability contract (r8 verdict): the driver hashes
    # results via pandas sort_values, which cannot factorize list/dict
    # cells — registry outputs must never carry top-level
    # Array/Map/Struct columns.  Serialize (array_join/CSV/to_json) at
    # the registry surface; keep array internals in semantics tests.
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: top-level complex output columns {complex_cols} break "
        "the driver canonicalizer — serialize them (posting-CSV precedent)"
    )
    # No-decimal-output contract (r12, SURVEY §5 class 4 as a TYPE rule):
    # across the r10+r11 driver gates, a row went hash-red iff its output
    # schema carried a DECIMAL column — even a pure CAST(x AS DECIMAL)
    # value carry with no engine arithmetic (paste_join_battery), 100/100
    # consistent, every red bit-exact under local DuckDB.  Decimal
    # renderings differ across DuckDB builds; exact integer micros and
    # decimal-derived strings do not.  Emit those instead.
    decimal_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not decimal_cols, (
        f"{name}: DECIMAL-typed output columns {decimal_cols} split the "
        "driver gate across DuckDB builds — quantize to integer micros "
        "(CAST(v * 1000000 AS BIGINT) in the decimal domain) or emit "
        "exact-decimal strings on BOTH engine and oracle sides"
    )
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, mirrors driver's weak path
        return
    problems = compare(df, con, ORACLES[name], name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_schema_not_tz_aware(con, name):
    # No-tz-aware-oracle contract (r13, sibling of the r12 decimal pin):
    # the one r12 gate red (time_bucket_battery) was a DuckDB oracle whose
    # to_timestamp(...) column types as TIMESTAMP WITH TIME ZONE
    # (timestamp[us, tz=Etc/UTC] in arrow) while Spark emits naive
    # TimestampType — value-exact locally, schema+hash red in the driver
    # env.  DESCRIBE is a plan-only probe: no oracle output column may be
    # tz-aware; wrap epoch->timestamp conversions in CAST(.. AS TIMESTAMP).
    rows = con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    tz_cols = [(r[0], r[1]) for r in rows if "TIME ZONE" in str(r[1]).upper()]
    assert not tz_cols, (
        f"{name}: tz-aware oracle output columns {tz_cols} split the "
        "driver gate (DuckDB TIMESTAMPTZ vs Spark naive timestamp) — "
        "CAST(... AS TIMESTAMP) in the oracle SQL"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 2
