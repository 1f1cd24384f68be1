"""Semantics tests for the second-wave operators (queries_extra): cyclic
match navigation edge cases and last-writer-wins upsert tie-breaks."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_match_navigation_wraparound(spark):
    # one doc with 3 matches, one with a single match (next/prev = itself)
    rows = [
        (1, 0, 5),
        (1, 1, 20),
        (1, 2, 41),
        (2, 0, 7),
    ]
    m = spark.createDataFrame(rows, "doc_id long, match_idx int, start int")
    w = Window.partitionBy("doc_id").orderBy("start")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = (
        m.select(
            "doc_id",
            "match_idx",
            F.coalesce(F.lead("start").over(w), F.first("start").over(wfull)).alias(
                "next_start"
            ),
            F.coalesce(F.lag("start").over(w), F.last("start").over(wfull)).alias(
                "prev_start"
            ),
        )
        .toPandas()
        .sort_values(["doc_id", "match_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert list(d1["next_start"]) == [20, 41, 5]  # last wraps to first
    assert list(d1["prev_start"]) == [41, 5, 20]  # first wraps to last
    d2 = out[out.doc_id == 2]
    assert list(d2["next_start"]) == [7] and list(d2["prev_start"]) == [7]


def test_manifest_upsert_last_writer_wins(spark):
    from janet_spark.queries_extra import q_manifest_upsert

    # build a tiny orders parquet: key collisions across generations with
    # controlled dates -> the later ts (then higher gen) must win
    pdf = pd.DataFrame(
        {
            "o_orderkey": [500, 1000, 1500, 2000],  # keys 0 and 500... % 500 -> 0,0,0,0
            "o_custkey": [1, 2, 3, 4],
            "o_orderstatus": ["F", "O", "F", "O"],
            "o_totalprice": [10.0, 20.0, 30.0, 40.0],
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-03", "2024-01-03", "2024-01-02"]
            ),
            "o_orderpriority": ["1"] * 4,
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/orders.parquet"
        )
        out = q_manifest_upsert(spark, d).toPandas()
    # all four rows collapse to key 0; ties on ts=2024-01-03 between gen 1
    # (price 30) and gen 2 (price 20) -> gen DESC wins -> gen 2, price 20
    assert len(out) == 1
    r = out.iloc[0]
    assert r["key"] == 0 and r["gen"] == 2 and r["payload"] == 20.0
