"""Mirror of the driver's DuckDB-oracle correctness gate: every declared
query must match its oracle SQL row-for-row (columns sorted by name,
rows sorted, exact value equality — same contract as the value hash)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if v is not None and not (
                    isinstance(v, float) and math.isnan(v)) else None)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                        name: str) -> None:
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), \
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rowcount {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avn = av.astype(float).to_numpy()
            bvn = bv.astype(float).to_numpy()
            both_nan = np.isnan(avn) & np.isnan(bvn)
            eq = (avn == bvn) | both_nan
            if not eq.all():
                bad = np.where(~eq)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {len(bad)}+ mismatches, e.g. rows {bad}: "
                    f"spark={avn[bad]} oracle={bvn[bad]} "
                    f"maxdiff={np.nanmax(np.abs(avn - bvn))}")
        else:
            eqs = (av == bv) | (av.isna() & bv.isna())
            assert eqs.all(), (
                f"{name}.{c}: mismatch rows {list(av[~eqs].index[:5])}: "
                f"spark={list(av[~eqs][:5])} oracle={list(bv[~eqs][:5])}")


@pytest.mark.parametrize("name", sorted(_QUERIES.keys()))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if name not in _ORACLES:
        assert spark_pdf is not None  # rows-only check
        return
    oracle_pdf = duck.execute(_ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
