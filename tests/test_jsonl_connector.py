"""JSONL connector: dynamic discovery, type widening, malformed-line
tolerance, configure lifecycle — the CSV connector's JSON sibling."""

import pytest

from steampipe_sqlite_spark.engine import Engine
from steampipe_sqlite_spark.sources.connector import ColumnType
from steampipe_sqlite_spark.sources.jsonlines import JsonlConnector

JSONL = "steampipe_sqlite_spark.sources.jsonlines:JsonlConnector"


@pytest.fixture()
def jsonl_dir(tmp_path):
    (tmp_path / "users.jsonl").write_text(
        '{"id": 1, "name": "ada", "score": 9.5, "active": true}\n'
        "not json at all\n"
        '{"id": 2, "name": "bob", "score": 3, "active": false, "extra": {"k": [1, 2]}}\n'
        '{"id": 3, "name": null, "score": "n/a"}\n'
    )
    (tmp_path / "empty.jsonl").write_text("")
    return tmp_path


class TestDiscovery:
    def test_types_widen_over_sample(self, jsonl_dir):
        c = JsonlConnector(f'{{"paths": ["{jsonl_dir}/users.jsonl"]}}')
        t = c.get_schema().table("users")
        types = {col.name: col.type for col in t.columns}
        assert types["id"] == ColumnType.INT
        assert types["name"] == ColumnType.STRING
        assert types["score"] == ColumnType.STRING  # 9.5, 3, "n/a" → widened
        assert types["active"] == ColumnType.BOOL
        assert types["extra"] == ColumnType.STRING  # nested → JSON string

    def test_empty_file_has_no_columns(self, jsonl_dir):
        c = JsonlConnector(f'{{"paths": ["{jsonl_dir}/empty.jsonl"]}}')
        t = c.get_schema().table("empty")
        assert t is not None and t.columns == ()


class TestScan:
    def test_rows_and_nulls(self, spark, jsonl_dir):
        eng = Engine(spark)
        eng.load(JSONL, alias="jl", config=f'paths = ["{jsonl_dir}/users.jsonl"]')
        rows = eng.sql(
            "SELECT id, name, active FROM jl_users ORDER BY id"
        ).collect()
        assert [(r.id, r.name, r.active) for r in rows] == [
            (1, "ada", True),
            (2, "bob", False),
            (3, None, None),
        ]

    def test_nested_value_queryable_as_json(self, spark, jsonl_dir):
        eng = Engine(spark)
        eng.load(JSONL, alias="jl", config=f'paths = ["{jsonl_dir}/users.jsonl"]')
        row = eng.sql(
            "SELECT get_json_object(extra, '$.k[1]') AS second "
            "FROM jl_users WHERE id = 2"
        ).collect()[0]
        assert row.second == "2"

    def test_qual_pushdown_filters(self, jsonl_dir):
        from steampipe_sqlite_spark.sources.connector import Qual

        c = JsonlConnector(f'{{"paths": ["{jsonl_dir}/users.jsonl"]}}')
        batches = list(c.execute("users", [Qual("id", ">", 1)], None, None))
        ids = [r["id"] for b in batches for r in b.to_pylist()]
        assert ids == [2, 3]

    def test_reconfigure_swaps_tables(self, spark, jsonl_dir, tmp_path):
        other = tmp_path / "cities.jsonl"
        other.write_text('{"city": "paris"}\n')
        eng = Engine(spark)
        eng.load(JSONL, alias="jl", config=f'{{"paths": ["{jsonl_dir}/users.jsonl"]}}')
        eng.sql(f"SELECT steampipe_configure_jl('paths = [\"{other}\"]')")
        assert eng.sql("SELECT count(*) AS n FROM jl_cities").collect()[0].n == 1
        with pytest.raises(Exception):
            eng.sql("SELECT * FROM jl_users").collect()
