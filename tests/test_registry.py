"""Schema Registry client tests — mocked transport, no network.

Parity target: properties/KafkaPropertiesBuilder.java:43-55 (registry
URL + USER_INFO basic auth feeding the Avro serde layer). The wire
format side (magic byte + 4-byte schema id) is covered by the codec
tests; these pin the driver-side fetch: URL construction, auth
header, caching, and error mapping.
"""

from __future__ import annotations

import base64
import json

import pytest

from maston_spark.config import KafkaConfig
from maston_spark.registry import (
    SchemaRegistryClient,
    SchemaRegistryError,
    resolve_avro_schema,
)

SCHEMA = {
    "name": "DummyAvroTest",
    "type": "record",
    "fields": [{"name": "id", "type": "long"}],
}


class FakeTransport:
    """Records requests; serves canned registry responses."""

    def __init__(self):
        self.calls: list[tuple[str, dict]] = []
        self.routes = {
            "/subjects/orders-value/versions/latest": {
                "subject": "orders-value", "id": 42, "version": 3,
                "schema": json.dumps(SCHEMA),
            },
            "/subjects/orders-value/versions/3": {
                "subject": "orders-value", "id": 42, "version": 3,
                "schema": json.dumps(SCHEMA),
            },
            "/schemas/ids/42": {"schema": json.dumps(SCHEMA)},
        }

    def __call__(self, url, headers, timeout, method="GET", body=None):
        self.calls.append((url, headers))
        self.requests = getattr(self, "requests", [])
        self.requests.append((method, url, body))
        path = url.split("http://reg:8081", 1)[1]
        key = path if method == "GET" else f"{method} {path}"
        if key in self.routes:
            return 200, json.dumps(self.routes[key]).encode()
        return 404, b'{"error_code": 40401, "message": "Subject not found"}'


@pytest.fixture()
def transport():
    return FakeTransport()


@pytest.fixture()
def client(transport):
    return SchemaRegistryClient(
        "http://reg:8081/", basic_auth_user_info="user:secret", opener=transport
    )


def test_get_latest_parses_and_caches_immutables_only(client, transport):
    reg = client.get_latest("orders-value")
    assert reg.schema_id == 42 and reg.version == 3
    assert reg.schema == SCHEMA
    # immutable keys cached: the concrete version and the id
    client.get_version("orders-value", 3)
    client.get_by_id(42)
    assert len(transport.calls) == 1
    # but "latest" is MUTABLE — it resolves through the network each
    # call (Confluent client discipline), so a long-lived driver sees
    # newly registered versions
    client.get_latest("orders-value")
    assert len(transport.calls) == 2


def test_get_latest_ttl_caches_within_window(transport):
    c = SchemaRegistryClient("http://reg:8081", opener=transport, latest_ttl=300.0)
    c.get_latest("orders-value")
    c.get_latest("orders-value")
    assert len(transport.calls) == 1


def test_basic_auth_header_and_url(client, transport):
    client.get_latest("orders-value")
    url, headers = transport.calls[0]
    assert url == "http://reg:8081/subjects/orders-value/versions/latest"
    expected = base64.b64encode(b"user:secret").decode()
    assert headers["Authorization"] == f"Basic {expected}"


def test_get_by_id(client, transport):
    reg = client.get_by_id(42)
    assert reg.schema == SCHEMA and reg.subject is None
    assert transport.calls[0][0] == "http://reg:8081/schemas/ids/42"


def test_unknown_subject_maps_to_registry_error(client):
    with pytest.raises(SchemaRegistryError) as ei:
        client.get_latest("nope-value")
    assert ei.value.status == 404


def test_malformed_payload_raises(transport):
    transport.routes["/subjects/orders-value/versions/latest"] = {"bogus": 1}
    c = SchemaRegistryClient("http://reg:8081", opener=transport)
    with pytest.raises(SchemaRegistryError):
        c.get_latest("orders-value")


def test_from_kafka_config_roundtrip(transport):
    """KafkaConfig carries the registry coordinates the reference's
    properties builder does; from_config consumes them directly."""
    cfg = KafkaConfig(
        bootstrap_servers="b:9092",
        schema_registry_url="http://reg:8081",
        schema_registry_basic_auth_user_info="user:secret",
    )
    assert cfg.registry_config()["schema.registry.url"] == "http://reg:8081"
    assert cfg.registry_config()["basic.auth.credentials.source"] == "USER_INFO"
    schema = resolve_avro_schema(cfg, "orders-value", opener=transport)
    assert schema == SCHEMA


def test_missing_url_rejected():
    with pytest.raises(ValueError):
        SchemaRegistryClient("")


# ---------------------------------------------------------------- write path


def test_register_schema_posts_and_returns_id(client, transport):
    transport.routes["POST /subjects/orders-value/versions"] = {"id": 43}
    sid = client.register_schema("orders-value", SCHEMA)
    assert sid == 43
    method, url, body = transport.requests[-1]
    assert method == "POST"
    assert url == "http://reg:8081/subjects/orders-value/versions"
    assert json.loads(json.loads(body)["schema"]) == SCHEMA


def test_lookup_schema_resolves_existing(client, transport):
    transport.routes["POST /subjects/orders-value"] = {
        "subject": "orders-value", "id": 42, "version": 3,
        "schema": json.dumps(SCHEMA),
    }
    reg = client.lookup_schema("orders-value", SCHEMA)
    assert reg.schema_id == 42 and reg.version == 3
    # lookup primes the immutable caches
    client.get_by_id(42)
    client.get_version("orders-value", 3)
    assert len([r for r in transport.requests if r[0] == "GET"]) == 0


def test_schema_id_for_auto_register_on(client, transport):
    # unknown schema: lookup 404s, auto-register path registers it
    transport.routes["POST /subjects/orders-value/versions"] = {"id": 44}
    sid = client.schema_id_for("orders-value", SCHEMA, auto_register=True)
    assert sid == 44
    assert [m for m, _, _ in transport.requests] == ["POST", "POST"]


def test_schema_id_for_auto_register_off_fails_fast(client, transport):
    # parity: AUTO_REGISTER_SCHEMAS=false — an unregistered schema is
    # a config error, not a silent subject mutation
    with pytest.raises(SchemaRegistryError) as ei:
        client.schema_id_for("orders-value", SCHEMA, auto_register=False)
    assert "auto.register.schemas" in str(ei.value)
    assert len(transport.requests) == 1  # lookup only, no register


def test_schema_id_for_existing_skips_register(client, transport):
    transport.routes["POST /subjects/orders-value"] = {
        "subject": "orders-value", "id": 42, "version": 3,
        "schema": json.dumps(SCHEMA),
    }
    assert client.schema_id_for("orders-value", SCHEMA, auto_register=True) == 42
    assert len(transport.requests) == 1


def test_concurrent_get_by_id_single_flight():
    """Two threads fetching the SAME id must produce ONE network
    call — dynamic_avro_topology resolves ids inside foreachBatch
    where several streams can share a client."""
    import threading

    calls: list[str] = []
    release = threading.Event()

    def slow_opener(url, headers, timeout, method="GET", body=None):
        calls.append(url)
        release.wait(5)  # hold the first fetch open to widen the race
        return 200, json.dumps({"schema": json.dumps(SCHEMA)}).encode()

    client = SchemaRegistryClient("http://reg:8081", opener=slow_opener)
    got: list = []
    threads = [
        threading.Thread(target=lambda: got.append(client.get_by_id(7)))
        for _ in range(2)
    ]
    for t in threads:
        t.start()
    # let both threads reach the client before the fetch completes
    import time

    time.sleep(0.2)
    release.set()
    for t in threads:
        t.join(10)
    assert len(got) == 2 and got[0] is got[1]
    assert len(calls) == 1


def test_cache_lru_bound_evicts_oldest(transport):
    for i in (1, 2, 3):
        transport.routes[f"/schemas/ids/{i}"] = {"schema": json.dumps(SCHEMA)}
    client = SchemaRegistryClient(
        "http://reg:8081", opener=transport, max_cache=2
    )
    client.get_by_id(1)
    client.get_by_id(2)
    client.get_by_id(1)      # refresh 1 -> 2 is now oldest
    client.get_by_id(3)      # evicts 2
    n0 = len(transport.calls)
    client.get_by_id(1)      # still cached
    client.get_by_id(3)      # still cached
    assert len(transport.calls) == n0
    client.get_by_id(2)      # evicted -> refetched
    assert len(transport.calls) == n0 + 1
