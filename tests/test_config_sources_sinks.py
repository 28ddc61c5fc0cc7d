"""Config builder + source/sink option-shape tests (the Kafka paths
can't hit a broker here; what we verify is the exact option set the
reference's KafkaPropertiesBuilder.java:35-107 encodes, translated
to Spark source/sink options)."""

from __future__ import annotations

import pytest

from maston_spark.config import KafkaConfig
from maston_spark.sinks import to_kafka_records
from maston_spark.sources import file_batch, file_stream

CFG = KafkaConfig(
    bootstrap_servers="broker:9092",
    application_id="my-app",
    security_protocol="SASL_SSL",
    sasl_mechanism="PLAIN",
    sasl_jaas_config="org.apache.kafka.common.security.plain.PlainLoginModule required;",
    ssl_endpoint_identification_algorithm="https",
    schema_registry_url="https://registry:8081",
    schema_registry_basic_auth_user_info="user:pass",
    max_offsets_per_trigger=10_000,
)


def test_source_options_cover_auth_and_tuning():
    o = CFG.source_options(["topic-a", "topic-b"])
    assert o["kafka.bootstrap.servers"] == "broker:9092"
    assert o["subscribe"] == "topic-a,topic-b"
    assert o["kafka.security.protocol"] == "SASL_SSL"
    assert o["kafka.sasl.mechanism"] == "PLAIN"
    assert "PlainLoginModule" in o["kafka.sasl.jaas.config"]
    assert o["kafka.isolation.level"] == "read_committed"  # committed-only
    assert o["includeHeaders"] == "true"
    assert o["failOnDataLoss"] == "false"
    assert o["maxOffsetsPerTrigger"] == "10000"
    assert o["kafka.group.id"] == "my-app"


def test_sink_options_drop_consumer_only_keys():
    o = CFG.sink_options("out-topic")
    assert o["topic"] == "out-topic"
    assert "kafka.isolation.level" not in o
    assert o["kafka.security.protocol"] == "SASL_SSL"


def test_registry_config():
    r = CFG.registry_config()
    assert r["schema.registry.url"] == "https://registry:8081"
    assert r["basic.auth.user.info"] == "user:pass"
    assert r["basic.auth.credentials.source"] == "USER_INFO"
    assert r["auto.register.schemas"] == "false"  # prod default off


def test_file_batch_and_stream_roundtrip(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "n")
    path = str(tmp_path / "t")
    df.write.parquet(path)
    assert file_batch(spark, path).count() == 10
    s = file_stream(spark, path, schema="n bigint", max_files_per_trigger=1)
    assert s.isStreaming


def test_file_source_rejects_unknown_format(spark):
    with pytest.raises(ValueError):
        file_batch(spark, "/nonexistent", fmt="xml")


def test_to_kafka_records_shape(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(k="a", value_out=b"payload", headers=[Row(key="h", value=b"v")])]
    )
    out = to_kafka_records(df, key_col="k")
    assert [f.name for f in out.schema.fields] == ["key", "value", "headers"]
    assert dict(out.dtypes)["key"] == "binary"
    row = out.collect()[0]
    assert bytes(row.value) == b"payload"


def test_config_from_mapping_binds_reference_yaml_shape():
    """The exact yaml structure from the reference README
    (README.md:129-166) binds without modification."""
    from maston_spark.config import config_from_mapping

    mapping = {
        "kafka": {
            "common": {
                "bootstrap-servers": "broker:9092",
                "schema-registry-url": "https://sr:8081",
                "security-protocol": "SASL_SSL",
                "basic-auth-credentials-source": "USER_INFO",
                "schema-auto-register": False,
                "schema-registry-basic-auth-user-info": "u:p",
                "sasl-mechanism": "PLAIN",
                "sasl-jaas-config": "org.apache.kafka... required;",
                "ssl-endpoint-identification-algorithm": "https",
                "enabled-default-consumer-interceptor": True,
                "application-id": "my-app",
                "some-future-knob": "kept",
            },
            "consumer": {
                "your-topic-domain": {
                    "topic": "in-topic",
                    "error-topic": "err-topic",
                },
                "delta-domain": {
                    "topic": "in2",
                    "error-topic": "err2",
                    "output-topic": "out2",
                },
            },
        }
    }
    cfg, consumers, log_records = config_from_mapping(mapping)
    assert cfg.bootstrap_servers == "broker:9092"
    assert cfg.application_id == "my-app"
    assert cfg.security_protocol == "SASL_SSL"
    assert cfg.sasl_mechanism == "PLAIN"
    assert cfg.schema_registry_url == "https://sr:8081"
    assert cfg.schema_registry_basic_auth_user_info == "u:p"
    assert cfg.schema_auto_register is False
    # unknown keys survive in extra (relaxed binding), not an error
    assert cfg.extra == {"some-future-knob": "kept"}
    assert log_records is True
    assert consumers["your-topic-domain"].topic == "in-topic"
    assert consumers["your-topic-domain"].error_topic == "err-topic"
    assert consumers["your-topic-domain"].output_topic is None
    assert consumers["delta-domain"].output_topic == "out2"
    # the bound config produces working source/sink options
    opts = cfg.source_options("in-topic")
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
