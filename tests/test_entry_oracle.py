"""Driver-contract parity: every oracle-backed queries() entry must match its
DuckDB oracle_sql() at sf0.001 (the driver re-checks at sf0.01)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as E

    return E


def oracle_names():
    from bio_data_validation_ray.pipelines.queries import oracles

    return sorted(oracles("sf0.001"))


def test_entry_smoke(entry_mod):
    out = entry_mod.entry()
    assert len(out) >= 0
    assert list(out.columns) == ["row_key", "rule_id", "severity"]
    assert len(out) > 0  # seeded fixture always has violations


def test_queries_cover_oracles(entry_mod):
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


@pytest.mark.parametrize("name", oracle_names())
def test_oracle_parity(entry_mod, name):
    from bio_data_validation_ray.pipelines.queries import QUERIES, oracles

    from oracle_harness import compare, duckdb_con, to_pandas

    rdf = to_pandas(QUERIES[name](SF))
    con = duckdb_con(SF)
    sdf = con.sql(oracles("sf0.001")[name]).df()
    errs = compare(name, rdf, sdf)
    assert not errs, "\n".join(errs)


def test_rows_only_queries_run(entry_mod):
    from bio_data_validation_ray.pipelines.queries import QUERIES, oracles

    rows_only = set(QUERIES) - set(oracles("sf0.001"))
    for name in sorted(rows_only):
        out = QUERIES[name](SF)
        assert out is not None and len(out) >= 0, name
