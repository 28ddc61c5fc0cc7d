"""Kafka/connection config builder — the Spark analogue of the
reference's ``properties/KafkaPropertiesBuilder.java:35-107``.

The reference centralizes bootstrap/SASL/SSL/registry/delivery
settings and derives consumer, producer, and serde configs from one
common properties object. Here the same single source of truth
produces:

- ``source_options()`` — options for ``spark.readStream.format("kafka")``
  (``kafka.``-prefixed client configs + Spark source knobs),
- ``sink_options()`` — options for ``writeStream.format("kafka")``,
- ``registry_config()`` — schema-registry coordinates for the Avro
  serde layer (URL, basic-auth, auto-register), consumed by
  :mod:`maston_spark.validated`.

Reference parity decisions:
- ``isolation.level=read_committed`` default (KafkaPropertiesBuilder
  "consume only committed records").
- delivery robustness (the reference's infinite retries / max-block)
  maps to Spark's fault-tolerant sink semantics + checkpointing, so
  those knobs intentionally have no direct translation; the ones
  that do (request timeout, idle connections) are exposed.
- one stream thread per app ≙ one streaming query per topology;
  Spark parallelism comes from partitions, not threads.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class KafkaConfig:
    bootstrap_servers: str
    application_id: str = "maston-spark"
    security_protocol: str | None = None          # e.g. SASL_SSL
    sasl_mechanism: str | None = None             # e.g. PLAIN
    sasl_jaas_config: str | None = None
    ssl_endpoint_identification_algorithm: str | None = None
    isolation_level: str = "read_committed"
    request_timeout_ms: int = 300_000
    connections_max_idle_ms: int = 540_000
    # schema registry (Avro serde layer)
    schema_registry_url: str | None = None
    schema_registry_basic_auth_user_info: str | None = None
    basic_auth_credentials_source: str = "USER_INFO"
    schema_auto_register: bool = False
    # Spark-source tuning
    starting_offsets: str = "earliest"
    fail_on_data_loss: bool = False
    include_headers: bool = True
    max_offsets_per_trigger: int | None = None
    extra: dict = field(default_factory=dict)

    def _client_options(self) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "kafka.isolation.level": self.isolation_level,
            "kafka.request.timeout.ms": str(self.request_timeout_ms),
            "kafka.connections.max.idle.ms": str(self.connections_max_idle_ms),
        }
        if self.security_protocol:
            opts["kafka.security.protocol"] = self.security_protocol
        if self.sasl_mechanism:
            opts["kafka.sasl.mechanism"] = self.sasl_mechanism
        if self.sasl_jaas_config:
            opts["kafka.sasl.jaas.config"] = self.sasl_jaas_config
        if self.ssl_endpoint_identification_algorithm is not None:
            opts["kafka.ssl.endpoint.identification.algorithm"] = (
                self.ssl_endpoint_identification_algorithm
            )
        opts.update({str(k): str(v) for k, v in self.extra.items()})
        return opts

    def source_options(self, topics: str | list[str]) -> dict[str, str]:
        if isinstance(topics, (list, tuple)):
            topics = ",".join(topics)
        opts = self._client_options()
        opts.update(
            {
                "subscribe": topics,
                "startingOffsets": self.starting_offsets,
                "failOnDataLoss": str(self.fail_on_data_loss).lower(),
                "includeHeaders": str(self.include_headers).lower(),
                # consumer group identity mirrors application.id
                "kafka.group.id": self.application_id,
            }
        )
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        return opts

    def sink_options(self, topic: str) -> dict[str, str]:
        opts = {
            k: v
            for k, v in self._client_options().items()
            if not k.startswith("kafka.isolation")  # consumer-only
        }
        opts["topic"] = topic
        opts["includeHeaders"] = "true"
        return opts

    def registry_config(self) -> dict[str, str]:
        cfg = {}
        if self.schema_registry_url:
            cfg["schema.registry.url"] = self.schema_registry_url
        if self.schema_registry_basic_auth_user_info:
            cfg["basic.auth.user.info"] = self.schema_registry_basic_auth_user_info
            cfg["basic.auth.credentials.source"] = self.basic_auth_credentials_source
        cfg["auto.register.schemas"] = str(self.schema_auto_register).lower()
        return cfg


@dataclass(frozen=True)
class TopicBinding:
    """One consumer domain from the reference's ``kafka.consumer``
    yaml section: the input topic plus its error (DLQ) topic, and —
    for the delta topology — the output topic."""

    topic: str
    error_topic: str
    output_topic: str | None = None


def config_from_mapping(
    mapping: dict,
) -> tuple[KafkaConfig, dict[str, TopicBinding], bool]:
    """Bind the reference's ``application.yml`` shape
    (``README.md:129-166``: ``kafka.common`` kebab-case client
    properties + ``kafka.consumer.<domain>`` topic bindings) to
    :class:`KafkaConfig` — so a reference deployment's existing yaml
    (parsed with any yaml loader) drops in unchanged.

    Returns ``(config, consumers, log_records)``:
    ``consumers`` maps each domain name to its
    :class:`TopicBinding`; ``log_records`` carries the reference's
    ``enabled-default-consumer-interceptor`` toggle (its Spark
    equivalent is the ``log_records`` flag on both topologies). Keys
    of ``kafka.common`` that have no KafkaConfig field land in
    ``extra`` verbatim rather than erroring, mirroring Spring's
    lenient relaxed binding.
    """
    kafka = mapping.get("kafka", mapping)
    common = dict(kafka.get("common", {}))
    log_records = bool(common.pop("enabled-default-consumer-interceptor", False))
    fields = {
        f.name.replace("_", "-"): f.name
        for f in KafkaConfig.__dataclass_fields__.values()
    }
    kwargs: dict = {}
    extra: dict = {}
    for key, value in common.items():
        name = fields.get(key)
        if name is None or name == "extra":
            extra[key] = value
        else:
            kwargs[name] = value
    cfg = KafkaConfig(extra=extra, **kwargs)
    consumers = {
        domain: TopicBinding(
            topic=binding["topic"],
            error_topic=binding["error-topic"],
            output_topic=binding.get("output-topic"),
        )
        for domain, binding in dict(kafka.get("consumer", {})).items()
    }
    return cfg, consumers, log_records
