"""CSV connector: dynamic discovery from files, reconfigure lifecycle,
typed inference, pushdown — the steampipe-plugin-csv parity scenario."""

import pytest

from steampipe_sqlite_spark.engine import Engine

CSV = "steampipe_sqlite_spark.sources.csvfiles:CsvConnector"


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csvs")
    (d / "people.csv").write_text(
        "name,age,score\nalice,34,91.5\nbob,29,78.25\ncarol,41,88.0\n"
    )
    (d / "cities.csv").write_text("city,pop\nparis,2100000\nlyon,520000\n")
    return d


def test_dynamic_discovery_and_typed_read(spark, csv_dir):
    eng = Engine(spark)
    eng.load(CSV, alias="files")
    assert eng.tables("files") == []  # dynamic: nothing before configure

    eng.configure(
        "files",
        f'{{"paths": ["{csv_dir}/people.csv", "{csv_dir}/cities.csv"]}}',
    )
    assert sorted(eng.tables("files")) == ["files_cities", "files_people"]

    rows = eng.sql(
        "SELECT name, age, score FROM files_people WHERE age > 30 ORDER BY name"
    ).collect()
    assert [(r.name, r.age, r.score) for r in rows] == [("alice", 34, 91.5), ("carol", 41, 88.0)]
    # inferred types survived into the Spark schema
    schema = {f.name: f.dataType.simpleString() for f in eng.table("files", "people").schema}
    assert schema == {"name": "string", "age": "bigint", "score": "double"}


def test_csv_joins_against_other_connectors(spark, csv_dir):
    eng = Engine(spark)
    eng.load(CSV, alias="files")
    eng.configure("files", f'{{"paths": ["{csv_dir}/cities.csv"]}}')
    eng.load("steampipe_sqlite_spark.sources.chaos:ChaosConnector")
    rows = eng.sql(
        """
        SELECT c.city, a.id FROM files_cities c
        JOIN chaos_all_types a ON a.id = CAST(c.pop / 520000 AS BIGINT)
        ORDER BY c.city
        """
    ).collect()
    assert {r.city for r in rows} == {"paris", "lyon"}


def test_reconfigure_swaps_tables(spark, csv_dir):
    eng = Engine(spark)
    eng.load(CSV, alias="files")
    eng.configure("files", f'{{"paths": ["{csv_dir}/people.csv"]}}')
    assert eng.sql("SELECT count(*) AS n FROM files_people").first().n == 3
    eng.configure("files", f'{{"paths": ["{csv_dir}/cities.csv"]}}')
    assert eng.sql("SELECT count(*) AS n FROM files_cities").first().n == 2
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM files_people").collect()
