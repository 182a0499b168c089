"""Kafka topic administration (SURVEY.md §2.1 S7, §2.2 F2).

Ops parity with the reference's topic setup script
(/root/reference/scripts/setup_kafka_topics.py:19-97): ensure the
``sales_orders`` topic exists (3 partitions, RF 1), tolerate
already-exists, and list user topics with system topics (``_``-prefixed,
e.g. ``__consumer_offsets``) filtered out.

The admin client is injected so this is testable without a broker (none
exists in this environment) and library-agnostic: any object with
``create_topics(names_partitions_rf)`` and ``list_topics()`` works — a
``kafka-python`` ``KafkaAdminClient`` via the thin adapter below, or a
fake in tests.  No hard dependency on kafka-python: the adapter imports it
lazily and only when actually used.
"""

from __future__ import annotations

from dataclasses import dataclass

# The reference's topic config (scripts/setup_kafka_topics.py:22-29).
DEFAULT_TOPICS = [("sales_orders", 3, 1)]


@dataclass
class TopicResult:
    name: str
    partitions: int
    status: str  # "created" | "exists" | "error: ..."


def ensure_topics(
    admin, topics: list[tuple[str, int, int]] | None = None
) -> list[TopicResult]:
    """S7: create each (name, partitions, replication_factor) topic,
    recording created/exists/error per topic — the reference script's
    behavior without the console rendering."""
    results: list[TopicResult] = []
    for name, partitions, rf in topics or DEFAULT_TOPICS:
        try:
            admin.create_topics([(name, partitions, rf)])
            results.append(TopicResult(name, partitions, "created"))
        except TopicExistsError:
            results.append(TopicResult(name, partitions, "exists"))
        except Exception as e:  # mirror the script's catch-all row
            results.append(TopicResult(name, partitions, f"error: {e}"))
    return results


def list_user_topics(admin) -> list[str]:
    """F2: sorted topic names, system topics (leading '_') filtered out
    (scripts/setup_kafka_topics.py:92-93)."""
    return sorted(t for t in admin.list_topics() if not t.startswith("_"))


class TopicExistsError(Exception):
    """Raised by an admin adapter when a topic already exists."""


class KafkaPythonAdmin:
    """Adapter over kafka-python's KafkaAdminClient (lazy import — the
    library and a broker exist only in a real deployment)."""

    def __init__(self, bootstrap_servers: str = "localhost:9092"):
        from kafka.admin import KafkaAdminClient

        self._client = KafkaAdminClient(
            bootstrap_servers=bootstrap_servers, client_id="sales_analytics_admin"
        )

    def create_topics(self, names_partitions_rf: list[tuple[str, int, int]]) -> None:
        from kafka.admin import NewTopic
        from kafka.errors import TopicAlreadyExistsError

        new = [
            NewTopic(name=n, num_partitions=p, replication_factor=r)
            for n, p, r in names_partitions_rf
        ]
        try:
            self._client.create_topics(new, validate_only=False)
        except TopicAlreadyExistsError as e:
            raise TopicExistsError(str(e)) from e

    def list_topics(self) -> list[str]:
        return list(self._client.list_topics())

    def close(self) -> None:
        self._client.close()
