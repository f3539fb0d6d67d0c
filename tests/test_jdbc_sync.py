"""End-to-end JDBC incremental CDC sync (reader.type jdbc_incremental):
DataX's core production job — poll an RDBMS table's monotone change-id
column, sync only the new span into the lake — executable here against
Spark's embedded Derby, applied through the exactly-once icetable_merge
sink. Covers bootstrap, incremental catch-up, update-in-place via a
higher lsn, empty-span no-op, and the crash window (write committed but
cursor not advanced → re-run must converge to the same state)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from datax_spark.jobspec import run_batch_job

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _job(db_url: str, root) -> dict:
    return {
        "reader": {
            "type": "jdbc_incremental",
            "jdbcUrl": db_url,
            "table": "pages",
            "driver": DRIVER,
            "cursorColumn": "change_id",
            "numPartitions": 2,
        },
        "writer": {
            "type": "icetable_merge",
            "path": str(root),
            "keyColumn": "url",
            "numPartitions": 4,
        },
    }


def _insert(spark, db_url: str, rows):
    df = spark.createDataFrame(
        rows, "change_id long, url string, body string"
    )
    df.write.mode("append").jdbc(db_url, "pages", properties={"driver": DRIVER})


def _state(spark, root) -> dict[str, str]:
    from datax_spark.icetable.table import IceTable

    t = IceTable.load(spark, root)
    return {r["url"]: r["body"] for r in t.read().collect()}


def test_jdbc_incremental_sync_lifecycle(spark, tmp_path):
    db_url = f"jdbc:derby:{tmp_path}/src;create=true"
    root = tmp_path / "lake"

    # ---- bootstrap: no cursor file, full table syncs
    _insert(spark, db_url, [(i, f"u{i % 10}", f"v{i}") for i in range(1, 31)])
    run_batch_job(spark, _job(db_url, root))
    state = _state(spark, root)
    # 10 urls, each keyed by its highest change_id (LWW on lsn)
    assert len(state) == 10
    assert state["u1"] == "v21"  # change_ids 1, 11, 21 → 21 wins
    cursor_files = list((root / "metadata").glob("sync-cursor-*.json"))
    assert len(cursor_files) == 1
    assert json.loads(cursor_files[0].read_text())["cursor"] == 30

    # ---- incremental: only the new span is read and merged
    _insert(spark, db_url, [(31, "u1", "v31-new"), (32, "u99", "fresh")])
    run_batch_job(spark, _job(db_url, root))
    state = _state(spark, root)
    assert len(state) == 11
    assert state["u1"] == "v31-new"  # update-in-place via higher lsn
    assert state["u99"] == "fresh"
    assert json.loads(cursor_files[0].read_text())["cursor"] == 32

    # ---- empty span: a successful no-op, no new epoch committed
    from datax_spark.icetable.table import IceTable

    epochs_before = IceTable.load(spark, root).committed_epochs()
    out = run_batch_job(spark, _job(db_url, root))
    assert out.count() == 0
    assert IceTable.load(spark, root).committed_epochs() == epochs_before
    assert json.loads(cursor_files[0].read_text())["cursor"] == 32

    # ---- crash window: write landed but the cursor didn't advance.
    # Re-running re-reads the span; replaying value-identical events
    # through the LWW merge converges to the same state.
    _insert(spark, db_url, [(33, "u2", "v33")])
    run_batch_job(spark, _job(db_url, root))
    want = _state(spark, root)
    cursor_files[0].write_text(json.dumps({"cursor": 32}))  # simulate crash
    run_batch_job(spark, _job(db_url, root))
    assert _state(spark, root) == want
    assert json.loads(cursor_files[0].read_text())["cursor"] == 33


def test_jdbc_incremental_op_column_deletes(spark, tmp_path):
    """A source that keeps a soft op flag: D rows delete the key."""
    db_url = f"jdbc:derby:{tmp_path}/src2;create=true"
    root = tmp_path / "lake2"
    # the D row's body is "" not NULL: Spark's writer setNulls string
    # columns as CLOB, which Derby refuses to store into a VARCHAR
    df = spark.createDataFrame(
        [(1, "a", "x", "I"), (2, "b", "y", "I"), (3, "a", "", "D")],
        "change_id long, url string, body string, op_flag string",
    )
    # VARCHAR, not Spark's default CLOB: the engine pushes the op/dirty
    # filters down to the source scan and Derby can't compare CLOBs
    df.write.option(
        "createTableColumnTypes",
        "change_id BIGINT, url VARCHAR(64), body VARCHAR(64), op_flag VARCHAR(4)",
    ).jdbc(db_url, "pages", properties={"driver": DRIVER})
    job = _job(db_url, root)
    job["reader"]["opColumn"] = "op_flag"
    run_batch_job(spark, job)
    assert _state(spark, root) == {"b": "y"}


def test_jdbc_incremental_rejects_non_numeric_cursor(spark, tmp_path):
    db_url = f"jdbc:derby:{tmp_path}/src3;create=true"
    spark.createDataFrame(
        [("2026-01-01", "a", "x")], "stamp string, url string, body string"
    ).write.option(
        "createTableColumnTypes",
        "stamp VARCHAR(32), url VARCHAR(64), body VARCHAR(64)",
    ).jdbc(db_url, "pages", properties={"driver": DRIVER})
    job = _job(db_url, tmp_path / "lake3")
    job["reader"]["cursorColumn"] = "stamp"
    job["reader"].pop("numPartitions")
    with pytest.raises(ValueError, match="INTEGER monotone"):
        run_batch_job(spark, job)


def test_jdbc_incremental_schema_evolution(spark, tmp_path):
    """The source table gains a column between syncs (ALTER TABLE ADD
    COLUMN — the classic RDBMS migration): the next span carries the
    wider schema and the lake widens additively; pre-evolution rows
    read back with NULL in the new column."""
    db_url = f"jdbc:derby:{tmp_path}/src4;create=true"
    root = tmp_path / "lake4"
    _insert(spark, db_url, [(1, "a", "x"), (2, "b", "y")])
    run_batch_job(spark, _job(db_url, root))

    conn = spark._jvm.java.sql.DriverManager.getConnection(db_url)
    try:
        st = conn.createStatement()
        # quoted: Derby upcases unquoted identifiers, and the lake
        # schema takes the JDBC column names verbatim
        st.execute('ALTER TABLE pages ADD COLUMN "tag" VARCHAR(16)')
        st.execute(
            "INSERT INTO pages VALUES (3, 'c', 'z', 't3'), (4, 'a', 'x2', 't4')"
        )
        st.close()
    finally:
        conn.close()

    run_batch_job(spark, _job(db_url, root))
    from datax_spark.icetable.table import IceTable

    rows = {r["url"]: r for r in IceTable.load(spark, root).read().collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["c"]["tag"] == "t3"
    assert rows["a"]["tag"] == "t4"  # updated row carries the new column
    assert rows["b"]["tag"] is None  # pre-evolution row: additive NULL


def test_jdbc_incremental_rejects_fractional_cursor(spark, tmp_path):
    """A DECIMAL cursor with fractional values must be rejected, not
    silently truncated (truncation would strand rows past int(hi))."""
    db_url = f"jdbc:derby:{tmp_path}/src5;create=true"
    spark.createDataFrame(
        [(10.5, "a", "x")], "change_id double, url string, body string"
    ).write.option(
        "createTableColumnTypes",
        "change_id DOUBLE, url VARCHAR(64), body VARCHAR(64)",
    ).jdbc(db_url, "pages", properties={"driver": DRIVER})
    job = _job(db_url, tmp_path / "lake5")
    job["reader"].pop("numPartitions")
    with pytest.raises(ValueError, match="INTEGER monotone"):
        run_batch_job(spark, job)


def test_jdbc_incremental_where_and_column(spark, tmp_path):
    """reader.where joins the span predicate inside the pushed-down
    subquery; reader.column projects (cursor column auto-retained)."""
    db_url = f"jdbc:derby:{tmp_path}/src6;create=true"
    root = tmp_path / "lake6"
    spark.createDataFrame(
        [(i, f"u{i}", f"v{i}", "EU" if i % 2 else "US") for i in range(1, 11)],
        "change_id long, url string, body string, region string",
    ).write.option(
        "createTableColumnTypes",
        "change_id BIGINT, url VARCHAR(64), body VARCHAR(64), region VARCHAR(4)",
    ).jdbc(db_url, "pages", properties={"driver": DRIVER})
    job = _job(db_url, root)
    job["reader"]["where"] = "\"region\" = 'EU'"
    job["reader"]["column"] = ["url", "body"]
    run_batch_job(spark, job)
    state = _state(spark, root)
    assert set(state) == {f"u{i}" for i in range(1, 11) if i % 2}
    from datax_spark.icetable.table import IceTable

    assert "region" not in IceTable.load(spark, root).read().columns
