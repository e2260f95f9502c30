"""Coverage for remaining public API: typed decimal decode, insert-replay
dedupe, catalog DDL apply, transport normalization, IVF knn, image resize."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_consumer_spark import functions as EF
from etl_consumer_spark.extensions.multimodal import resize_images, synthesize_media_table
from etl_consumer_spark.extensions.similarity import knn_ivf
from etl_consumer_spark.operators.apply import dedupe_insert_replays
from etl_consumer_spark.operators.ddl import apply_ddl_batch
from etl_consumer_spark.sources.kafka import as_transport
from etl_consumer_spark.sources.tables import load_table


def test_decimal_decode_typed(spark):
    from tests.test_decoders import py_encode

    df = spark.createDataFrame([(py_encode(123456),)], "b64 string")
    out = df.select(EF.decimal_decode_typed("b64", scale=3, precision=20).alias("d")).collect()
    assert out[0]["d"] == Decimal("123.456")


def test_dedupe_insert_replays(spark):
    events = spark.createDataFrame(
        [
            (None, Row(id=1, v=10), 5, 0),
            (None, Row(id=1, v=10), 5, 0),   # exact replay
            (None, Row(id=2, v=20), 6, 0),
        ],
        "before struct<id:long,v:long>, after struct<id:long,v:long>, pos long, ts_ms long",
    )
    assert dedupe_insert_replays(events, ["id"]).count() == 2


def test_apply_ddl_batch_on_catalog(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS ddl_target")
    spark.sql(f"CREATE TABLE ddl_target (id BIGINT) USING parquet LOCATION '{tmp_path}/ddl_target'")
    try:
        results = apply_ddl_batch(
            spark,
            [
                "ALTER TABLE ddl_target ADD COLUMN note VARCHAR(10)",
                "TRUNCATE SOMETHING UNSUPPORTED",
            ],
        )
        cols = [f.name for f in spark.table("ddl_target").schema.fields]
        assert cols == ["id", "note"]
        assert results[0].statement == "ALTER TABLE ddl_target ADD COLUMNS (note STRING)"
        assert results[1].statement is None and "unsupported" in results[1].reason
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_target")


def test_as_transport_fills_missing_columns(spark):
    df = spark.createDataFrame([("t1", bytearray(b"x"))], "topic string, value binary")
    out = as_transport(df)
    assert out.columns == ["topic", "value", "headers", "timestamp"]
    assert out.count() == 1


def test_knn_ivf_runs_and_is_plausible(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = knn_ivf(queries, emb, n_clusters=8, k=2).collect()
    assert len(out) > 0
    by_query: dict = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r["rank"])
        assert r["neighbor_id"] != r["query_id"]
    assert all(sorted(ranks) == list(range(1, len(ranks) + 1)) for ranks in by_query.values())


def test_resize_images_kernel(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    media = synthesize_media_table(docs, "doc_id", "text")
    out = resize_images(media, target_w=8, target_h=6).collect()
    assert len(out) == 20
    for r in out:
        assert (r["width"], r["height"]) == (8, 6)
        assert len(bytes(r["resized"])) == 8 * 6


def test_wire_fields_from_connect_schema():
    """Schema block shaped like the reference fixture (collection.json /
    data/model.go comment): enum + int32 + int64 + Decimal columns."""
    from etl_consumer_spark.sources.envelope import wire_fields_from_connect_schema

    block = {
        "type": "struct",
        "fields": [
            {
                "type": "struct",
                "field": "after",
                "fields": [
                    {"type": "int64", "optional": False, "field": "id"},
                    {"type": "int32", "optional": True, "field": "province_id"},
                    {
                        "type": "bytes", "optional": True,
                        "name": "org.apache.kafka.connect.data.Decimal",
                        "parameters": {"scale": "2", "connect.decimal.precision": "10"},
                        "field": "amount",
                    },
                    {
                        "type": "string", "optional": True,
                        "name": "io.debezium.data.Enum",
                        "parameters": {"allowed": "a,b"},
                        "field": "status",
                    },
                ],
            },
            {"type": "struct", "field": "before", "fields": []},
        ],
    }
    fields = wire_fields_from_connect_schema(block)
    by = {f.name: f for f in fields}
    assert by["id"].type == "int64" and by["id"].logical is None
    assert by["amount"].logical == "org.apache.kafka.connect.data.Decimal"
    assert by["amount"].scale == 2
    assert by["status"].logical == "io.debezium.data.Enum"  # decodes via default/string branch


def test_wide_decimal_routes_to_arrow_path(spark):
    """A DECIMAL(40) column decodes through the Arrow UDF (the expression
    fold would null out >15-byte payloads)."""
    from tests.test_decoders import py_encode
    from etl_consumer_spark.sources.envelope import WireField, decode_image
    from pyspark.sql import functions as F

    wide = 10**38  # 17-byte two's-complement payload
    fields = [
        WireField("amount", "bytes", logical="org.apache.kafka.connect.data.Decimal",
                  scale=2, precision=40),
    ]
    df = spark.createDataFrame([({"amount": py_encode(wide)},)], "img map<string,string>")
    out = df.select(decode_image(F.col("img"), fields).alias("d")).collect()
    assert abs(out[0]["d"]["amount"] - wide / 100) / (wide / 100) < 1e-12


def test_morton_key_clusters_both_dimensions(spark):
    """Chunks of a z-ordered dataset have a SMALL extent in BOTH dimensions
    (min/max stats prune predicates on either column); chunks of an
    a-ordered dataset leave b unconstrained — every chunk spans b fully."""
    from pyspark.sql import functions as F

    from etl_consumer_spark.operators.layout import morton_key

    df = spark.createDataFrame(
        [(a, b) for a in range(64) for b in range(64)], "a long, b long"
    )
    z_rows = (
        df.withColumn("z", morton_key(F.col("a"), F.col("b"), bits=6))
        .orderBy("z")
        .collect()
    )
    n_chunks, size = 16, len(z_rows) // 16

    def b_extents(rows):
        out = []
        for i in range(n_chunks):
            chunk = rows[i * size : (i + 1) * size]
            ys = [r["b"] for r in chunk]
            out.append(max(ys) - min(ys) + 1)
        return out

    # z-order: each 256-row chunk is a 16x16 quadrant -> b-extent 16
    assert all(e == 16 for e in b_extents(z_rows))
    # a-order: every chunk spans the full b range -> no pruning on b
    a_rows = sorted(z_rows, key=lambda r: (r["a"], r["b"]))
    assert all(e == 64 for e in b_extents(a_rows))
    # key is unique over the grid (invertible interleave, no collisions)
    assert len({r["z"] for r in z_rows}) == len(z_rows)
