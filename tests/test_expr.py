"""Unit tests for operators/expr.py: let() single-evaluation binding and the
floor_parallelism zero-execution scan-width probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.expr import floor_parallelism, let


def test_let_matches_direct_evaluation(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, "x y z x y")], "id int, text string"
    )
    toks = F.split(F.col("text"), " ")
    direct = df.select(
        "id",
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("d"),
    )
    bound = df.select(
        "id",
        let(
            lambda t: F.struct(
                F.size(t).alias("n"), F.size(F.array_distinct(t)).alias("d")
            ),
            t=toks,
        ).alias("m"),
    ).select("id", "m.n", "m.d")
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, bound.collect())
    )


def test_let_evaluates_each_binding_once_per_row(spark):
    """Bind a Python-UDF column (observable evaluation count via an
    accumulator) and reference it three times in the body: the counter must
    equal the row count, not 3x it."""
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    u = F.udf(bump, "long")
    df = spark.range(50).select(F.col("id"))
    out = df.select(
        let(lambda v: v + v + v, v=u(F.col("id"))).alias("s")
    )
    rows = out.collect()
    assert [r.s for r in rows] == [3 * i for i in range(50)]
    assert acc.value == 50


def test_floor_parallelism_widens_pure_scan(spark, tmp_path):
    p = str(tmp_path / "one.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p).select((F.col("id") * 2).alias("x"))
    floored = floor_parallelism(df)
    cores = spark.sparkContext.defaultParallelism
    assert floored.rdd.getNumPartitions() == cores
    assert floored.count() == 1000


def test_floor_parallelism_leaves_shuffled_frames_alone(spark, tmp_path):
    p = str(tmp_path / "one.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    agg = spark.read.parquet(p).groupBy((F.col("id") % 7).alias("k")).count()
    assert floor_parallelism(agg) is agg  # shuffle node -> untouched
    joined = agg.join(agg.withColumnRenamed("count", "c2"), "k")
    assert floor_parallelism(joined) is joined


def test_floor_parallelism_ignores_keyword_column_names(spark, tmp_path):
    """ADVICE r6: the probe classifies by plan NODE CLASS, not by substring
    of the rendered plan — a column literally named after a shuffle node
    ("Sort", "Join", "Window"...) must not suppress the floor."""
    p = str(tmp_path / "kw.parquet")
    spark.range(1000).select(
        F.col("id").alias("Sort"),
        (F.col("id") * 2).alias("Join_Window_key"),
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p).select(
        (F.col("Sort") + 1).alias("Sort"), "Join_Window_key"
    )
    floored = floor_parallelism(df)
    cores = spark.sparkContext.defaultParallelism
    assert floored.rdd.getNumPartitions() == cores  # still floored
    assert floored.count() == 1000


def test_floor_parallelism_memoizes_verdict(spark, tmp_path):
    """The analyze+optimize probe runs once per DataFrame: a second call on
    the same frame answers from the weak-keyed verdict memo."""
    from payroll_etl_fastapi_spark.operators import expr as expr_mod

    p = str(tmp_path / "memo.parquet")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p).select((F.col("id") * 3).alias("x"))
    assert df not in expr_mod._FLOOR_VERDICTS
    f1 = floor_parallelism(df)
    assert expr_mod._FLOOR_VERDICTS.get(df) == (
        True,
        spark.sparkContext.defaultParallelism,
    )
    f2 = floor_parallelism(df)
    assert f1.rdd.getNumPartitions() == f2.rdd.getNumPartitions()


def test_floor_parallelism_leaves_local_and_wide_scans_alone(spark, tmp_path):
    local = spark.createDataFrame([(1,)], "id int")
    assert floor_parallelism(local) is local  # no backing files
    wide = str(tmp_path / "wide.parquet")
    cores = spark.sparkContext.defaultParallelism
    spark.range(10_000).repartition(cores).write.parquet(wide)
    scan = spark.read.parquet(wide)
    assert floor_parallelism(scan) is scan  # already >= cores/2 files
