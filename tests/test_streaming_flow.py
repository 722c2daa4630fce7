"""Hybrid batch + streaming flow test (SURVEY.md §3.2): a batch load and a
streamed topic feed the SAME warehouse raw tables; one transform serves both.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.flows import BatchFlow, StreamingFlow
from stock_crypto_data_pipeline_public_spark.schemas import SCHEMAS
from stock_crypto_data_pipeline_public_spark.sources.faker import MarketDataFaker


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("hybrid")
    batch = BatchFlow(landing_dir=str(base / "landing"), warehouse_dir=str(base / "wh"))
    raw = MarketDataFaker(seed=21, n_corporates=5, n_customers=25, n_transactions=80,
                          n_price_days=6, n_news=8).generate(spark)
    batch.land(raw, datetime(2024, 2, 1, 20, 0, 0))
    batch.ingest_raw(spark)
    return base, batch


def test_stream_new_customers_into_same_tables(spark, warehouse):
    base, batch = warehouse
    stream_flow = StreamingFlow(warehouse_dir=batch.warehouse_dir, checkpoint_dir=str(base / "ckpt"))

    before = spark.read.parquet(f"{batch.warehouse_dir}/raw_customers").count()

    # simulate a Kafka topic: 10 brand-new customers + 5 replays of already
    # batch-loaded rows (at-least-once redelivery)
    existing = spark.read.parquet(f"{batch.warehouse_dir}/raw_customers").limit(5)
    fresh_rows = []
    t0 = datetime(2024, 2, 2, 9, 0, 0)
    for i in range(10):
        fresh_rows.append((
            f"STREAMCUST{i:04d}", f"Stream{i}", f"Kafka{i}", f"s{i}@example.com",
            "F", "26-35", "US", datetime(2020, 1, 1).date(), "Silver", "Moderate",
            "PERSONAL", None, t0 + timedelta(minutes=i), "KAFKA_DATA",
        ))
    fresh = spark.createDataFrame(fresh_rows, SCHEMAS["raw_customers"])
    topic = str(base / "topic_customers")
    fresh.unionByName(existing).repartition(3).write.mode("overwrite").parquet(topic)

    q = stream_flow.consume(spark, topic, "raw_customers")
    q.awaitTermination(120)

    after = spark.read.parquet(f"{batch.warehouse_dir}/raw_customers").count()
    assert after == before + 10  # replays deduped, new rows landed

    # the shared transform sees batch + streamed customers together
    ctx = stream_flow.transform(spark, select=["dim_customer"])
    streamed = ctx["dim_customer"].filter(F.col("customer_bk").startswith("STREAMCUST"))
    assert streamed.count() == 10

    # second micro-batch drain of the same topic is a no-op (checkpoint +
    # keyed anti-join belt-and-suspenders)
    q2 = stream_flow.consume(spark, topic, "raw_customers")
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{batch.warehouse_dir}/raw_customers").count() == after
