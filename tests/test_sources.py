

def test_avro_availability_probe(spark):
    """Environment probe (the q-advice r5 protobuf-probe pattern): the
    spark-avro module is NOT bundled in this image (external package,
    no network to fetch it), so the engine's Avro surface is
    environment-blocked — this test keeps that claim evidence-backed
    and will fail loudly the day the jar appears, prompting a real
    from_avro/to_avro round-trip query."""
    import pytest
    from pyspark.sql import functions as F
    import pyspark.sql.avro.functions as AF

    df = spark.range(1).select(F.struct(F.col("id").alias("a")).alias("s"))
    try:
        df.select(AF.to_avro("s").alias("b")).collect()
    except Exception as ex:
        assert "AVRO_NOT_LOADED" in str(ex) or "avro" in str(ex).lower()
        return
    pytest.fail(
        "spark-avro is now loadable — add the from_avro/to_avro "
        "round-trip query (SURVEY.md formats row) and certify it"
    )
