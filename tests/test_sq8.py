"""SQ8 scalar-quantization ANN: code bounds, constant-dimension safety,
and recall against the exact integer-dot ranking."""

from pyspark.sql import functions as F

from furchild_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from furchild_spark.queries.catalog import table

    return table(spark, SF, "embeddings")


def test_sq8_codes_are_bounded_int8(spark):
    emb = _emb(spark)
    codec = similarity.sq8_train(emb, "embedding", dim=64)
    codes = similarity.sq8_encode(emb, codec, "vec_id", "embedding")
    row = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).first()
    assert 0 <= row["lo"] and row["hi"] <= 255
    # extremes are attained: some dimension somewhere hits both rails
    assert row["lo"] == 0 and row["hi"] == 255


def test_sq8_constant_dimension_encodes_zero(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0])], "vec_id long, embedding array<double>"
    )
    codec = similarity.sq8_train(df, "embedding", dim=2)
    codes = {r["vec_id"]: r["codes"] for r in
             similarity.sq8_encode(df, codec, "vec_id", "embedding").collect()}
    assert codes[1][0] == 0 and codes[2][0] == 0  # constant dim -> 0, no div/0
    assert codes[1][1] == 0 and codes[2][1] == 255


def test_sq8_topk_recall_vs_exact_dot(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    got = similarity.sq8_topk(emb, queries, "vec_id", "embedding", k=5, dim=64)
    sq = {}
    for r in got.collect():
        sq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # exact integer-dot ranking (the quantity SQ approximates)
    q = queries.select(F.col("vec_id").alias("query_id"),
                       similarity.quantize("embedding").alias("qq"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   similarity.quantize("embedding").alias("cq"))
    exact = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", similarity.dot_q(F.col("qq"), F.col("cq")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    ex = {}
    for r in exact.withColumn("rk", F.row_number().over(w)).filter("rk <= 5").collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(sq[k] & ex[k]) / 5 for k in ex]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
