"""Confluent Schema Registry client (driver-side, REST).

Parity: the reference wires registry URL + basic auth into its serde
layer via properties/KafkaPropertiesBuilder.java:43-55 and lets the
Confluent deserializer fetch schemas by the 4-byte id in the wire
format. Here the *driver* resolves the schema once (by subject or by
id) and bakes it into the task closure — executors never talk to the
registry, which is the right shape for Spark: one metadata fetch per
query instead of per-executor cache warm-up, and no registry
availability dependency in the hot path.

The HTTP transport is injectable (``opener``), so tests exercise the
full client (URL construction, basic auth, caching, error mapping)
without a network; the default opener is stdlib ``urllib``.

Public REST endpoints used (Confluent Schema Registry API, public
docs): ``GET /subjects/{subject}/versions/{version}`` and
``GET /schemas/ids/{id}``.
"""

from __future__ import annotations

import base64
import json
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Callable

_now = time.monotonic

__all__ = ["RegisteredSchema", "SchemaRegistryClient", "SchemaRegistryError"]


class SchemaRegistryError(RuntimeError):
    """Registry-level failure (HTTP error, malformed response)."""

    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


@dataclass(frozen=True)
class RegisteredSchema:
    subject: str | None
    schema_id: int
    version: int | None
    schema: dict  # parsed Avro schema (json.loads of the registry payload)


def _default_opener(
    url: str,
    headers: dict[str, str],
    timeout: float,
    method: str = "GET",
    body: bytes | None = None,
) -> tuple[int, bytes]:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers, data=body, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
            return resp.status, resp.read()
    except urllib.error.HTTPError as exc:  # non-2xx still carries a body
        return exc.code, exc.read()


class SchemaRegistryClient:
    """Fetch-by-subject / fetch-by-id with basic auth and caching.

    ``opener(url, headers, timeout) -> (status, body)`` is the whole
    transport surface — swap it in tests (write-path openers take two
    extra positional args: ``method`` and ``body``). Only IMMUTABLE
    lookups cache — by id and by concrete (subject, version); the
    mutable ``latest`` resolves through the network on each call
    (optionally within ``latest_ttl`` seconds), matching the
    Confluent client's cache discipline — a long-lived driver
    observes newly registered versions.

    Thread-safe: ``dynamic_avro_topology`` resolves ids inside
    ``foreachBatch`` where several streams can share one client, so
    reads hold a lock across check+fetch+store — two threads asking
    for the same id produce ONE network call (single-flight), and
    cache mutation never races. Caches are LRU-bounded
    (``max_cache`` entries per cache) so a pathological id churn
    can't grow driver memory unboundedly.
    """

    def __init__(
        self,
        url: str,
        basic_auth_user_info: str | None = None,
        timeout: float = 30.0,
        opener: Callable[[str, dict[str, str], float], tuple[int, bytes]] | None = None,
        latest_ttl: float = 0.0,
        max_cache: int = 1024,
    ):
        if not url:
            raise ValueError("schema registry url is required")
        if max_cache < 1:
            raise ValueError("max_cache must be >= 1")
        self._base = url.rstrip("/")
        self._timeout = timeout
        self._opener = opener or _default_opener
        self._latest_ttl = latest_ttl
        self._max_cache = max_cache
        self._headers = {"Accept": "application/vnd.schemaregistry.v1+json"}
        if basic_auth_user_info:
            token = base64.b64encode(basic_auth_user_info.encode()).decode()
            self._headers["Authorization"] = f"Basic {token}"
        self._lock = threading.RLock()
        self._by_id: OrderedDict[int, RegisteredSchema] = OrderedDict()
        self._by_subject: OrderedDict[tuple[str, str], RegisteredSchema] = OrderedDict()
        self._latest: OrderedDict[str, tuple[float, RegisteredSchema]] = OrderedDict()

    def _cache_put(self, cache: OrderedDict, key, value) -> None:
        # caller holds self._lock
        cache[key] = value
        cache.move_to_end(key)
        while len(cache) > self._max_cache:
            cache.popitem(last=False)

    def _cache_hit(self, cache: OrderedDict, key):
        # caller holds self._lock; None = miss (values are never None)
        value = cache.get(key)
        if value is not None:
            cache.move_to_end(key)
        return value

    @classmethod
    def from_config(cls, cfg, **kwargs) -> "SchemaRegistryClient":
        """Build from :class:`maston_spark.config.KafkaConfig` (parity:
        KafkaPropertiesBuilder.java:43-55 — URL + USER_INFO auth)."""
        return cls(
            url=cfg.schema_registry_url,
            basic_auth_user_info=cfg.schema_registry_basic_auth_user_info,
            **kwargs,
        )

    def _get(self, path: str) -> Any:
        url = f"{self._base}{path}"
        try:
            status, body = self._opener(url, dict(self._headers), self._timeout)
        except SchemaRegistryError:
            raise
        except Exception as exc:
            raise SchemaRegistryError(f"registry request failed: {url}: {exc}") from exc
        if status != 200:
            raise SchemaRegistryError(
                f"registry returned HTTP {status} for {url}: {body[:200]!r}",
                status=status,
            )
        try:
            return json.loads(body)
        except ValueError as exc:
            raise SchemaRegistryError(f"malformed registry response from {url}") from exc

    def get_latest(self, subject: str) -> RegisteredSchema:
        return self.get_version(subject, "latest")

    def get_version(self, subject: str, version: int | str) -> RegisteredSchema:
        # the lock spans check+fetch+store: concurrent same-key calls
        # are single-flight (one network round trip), and a fetch for
        # one key briefly serializes others — the right trade for a
        # driver-side metadata client (fetches are rare, races aren't)
        with self._lock:
            is_latest = str(version) == "latest"
            key = (subject, str(version))
            if not is_latest:
                hit = self._cache_hit(self._by_subject, key)
                if hit is not None:
                    return hit
            if is_latest and self._latest_ttl > 0:
                hit = self._cache_hit(self._latest, subject)
                if hit is not None and _now() - hit[0] < self._latest_ttl:
                    return hit[1]
            payload = self._get(f"/subjects/{subject}/versions/{version}")
            try:
                reg = RegisteredSchema(
                    subject=payload.get("subject", subject),
                    schema_id=int(payload["id"]),
                    version=int(payload["version"]),
                    schema=json.loads(payload["schema"]),
                )
            except (KeyError, ValueError, TypeError) as exc:
                raise SchemaRegistryError(
                    f"unexpected registry payload for {subject}/{version}: {payload!r}"
                ) from exc
            self._cache_put(self._by_id, reg.schema_id, reg)
            # only the IMMUTABLE concrete-version key caches; "latest" is
            # mutable and only enters the TTL side-cache
            self._cache_put(self._by_subject, (subject, str(reg.version)), reg)
            if is_latest:
                self._cache_put(self._latest, subject, (_now(), reg))
            return reg

    def get_by_id(self, schema_id: int) -> RegisteredSchema:
        with self._lock:
            hit = self._cache_hit(self._by_id, schema_id)
            if hit is not None:
                return hit
            payload = self._get(f"/schemas/ids/{schema_id}")
            try:
                reg = RegisteredSchema(
                    subject=None,
                    schema_id=schema_id,
                    version=None,
                    schema=json.loads(payload["schema"]),
                )
            except (KeyError, ValueError, TypeError) as exc:
                raise SchemaRegistryError(
                    f"unexpected registry payload for id {schema_id}: {payload!r}"
                ) from exc
            self._cache_put(self._by_id, schema_id, reg)
            return reg

    # ---------------------------------------------------------- write path

    def _post(self, path: str, payload: dict) -> Any:
        url = f"{self._base}{path}"
        headers = dict(self._headers)
        headers["Content-Type"] = "application/vnd.schemaregistry.v1+json"
        body = json.dumps(payload).encode()
        try:
            status, resp = self._opener(url, headers, self._timeout, "POST", body)
        except SchemaRegistryError:
            raise
        except Exception as exc:
            raise SchemaRegistryError(f"registry request failed: {url}: {exc}") from exc
        if status == 404:
            raise SchemaRegistryError(f"subject/schema not found at {url}", status=404)
        if status != 200:
            raise SchemaRegistryError(
                f"registry returned HTTP {status} for {url}: {resp[:200]!r}",
                status=status,
            )
        try:
            return json.loads(resp)
        except ValueError as exc:
            raise SchemaRegistryError(f"malformed registry response from {url}") from exc

    def register_schema(self, subject: str, schema: dict) -> int:
        """``POST /subjects/{subject}/versions`` — register (or no-op
        if already registered) and return the schema id. The produce-
        side half the fetch-only client lacked; parity with the
        Confluent serializer when ``AUTO_REGISTER_SCHEMAS`` is on
        (properties/KafkaPropertiesBuilder.java:67, README.md:139)."""
        payload = self._post(
            f"/subjects/{subject}/versions", {"schema": json.dumps(schema)}
        )
        try:
            return int(payload["id"])
        except (KeyError, ValueError, TypeError) as exc:
            raise SchemaRegistryError(
                f"unexpected register response for {subject}: {payload!r}"
            ) from exc

    def lookup_schema(self, subject: str, schema: dict) -> RegisteredSchema:
        """``POST /subjects/{subject}`` — find the id/version an
        EXISTING schema is registered under (no registration)."""
        payload = self._post(f"/subjects/{subject}", {"schema": json.dumps(schema)})
        try:
            reg = RegisteredSchema(
                subject=payload.get("subject", subject),
                schema_id=int(payload["id"]),
                version=int(payload["version"]),
                schema=json.loads(payload["schema"]),
            )
        except (KeyError, ValueError, TypeError) as exc:
            raise SchemaRegistryError(
                f"unexpected lookup response for {subject}: {payload!r}"
            ) from exc
        self._by_id[reg.schema_id] = reg
        self._by_subject[(subject, str(reg.version))] = reg
        return reg

    def schema_id_for(self, subject: str, schema: dict, auto_register: bool) -> int:
        """Confluent serializer semantics for ``AUTO_REGISTER_SCHEMAS``
        (properties/KafkaPropertiesBuilder.java:67): with the flag on,
        an unregistered schema is registered and its new id returned;
        with it off, only an already-registered schema resolves — an
        unknown one raises, so a misconfigured producer fails fast
        instead of silently mutating the subject."""
        try:
            return self.lookup_schema(subject, schema).schema_id
        except SchemaRegistryError as exc:
            if exc.status != 404:
                raise
        if auto_register:
            return self.register_schema(subject, schema)
        raise SchemaRegistryError(
            f"schema not registered under subject {subject!r} and "
            "auto.register.schemas is disabled",
            status=404,
        )


def resolve_avro_schema(cfg, subject: str, opener=None) -> dict:
    """One-call sugar for the serde layer: KafkaConfig → parsed Avro
    schema dict for ``subject``'s latest version, ready for
    ``validated.safe_from_avro_arrow``. The returned dict is what the
    driver bakes into the task closure."""
    client = SchemaRegistryClient.from_config(cfg, opener=opener) if opener else (
        SchemaRegistryClient.from_config(cfg)
    )
    return client.get_latest(subject).schema
