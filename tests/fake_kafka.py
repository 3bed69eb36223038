"""In-process fake of the ``kafka`` (kafka-python) client surface.

Just enough broker behavior to execute ``online.stream.KafkaTopic`` for
real in tests (this image has no broker or kafka client lib): a process-
global log per (topic, partition), a producer that appends, a consumer
with assign/seek/poll/end_offsets, and a ``stalled`` switch that makes
the broker report end offsets but deliver nothing — the failure mode the
adapter's bounded poll retry exists for.

Install with :func:`install` (uses pytest's monkeypatch so the real
import graph is restored afterwards).
"""

from __future__ import annotations

import sys
import types
from collections import namedtuple

TopicPartition = namedtuple("TopicPartition", ["topic", "partition"])
_ConsumerRecord = namedtuple("_ConsumerRecord", ["value", "offset"])


class FakeBroker:
    def __init__(self):
        self._logs = {}
        self.stalled = False

    def log(self, tp):
        return self._logs.setdefault((tp.topic, tp.partition), [])

    def append(self, topic, partition, value):
        self._logs.setdefault((topic, partition), []).append(bytes(value))


class _FakeProducer:
    def __init__(self, broker, bootstrap_servers=None):
        self._broker = broker
        self.bootstrap_servers = bootstrap_servers

    def send(self, topic, partition=None, value=None):
        if partition is None:
            raise ValueError("fake producer requires explicit partition")
        self._broker.append(topic, int(partition), value)

    def flush(self):
        pass


class _FakeConsumer:
    POLL_BATCH = 7  # deliver in small batches so read() really loops

    def __init__(self, broker, bootstrap_servers=None):
        self._broker = broker
        self._assigned = []
        self._pos = {}

    def assign(self, tps):
        self._assigned = list(tps)

    def seek(self, tp, offset):
        self._pos[tp] = int(offset)

    def end_offsets(self, tps):
        return {tp: len(self._broker.log(tp)) for tp in tps}

    def poll(self, timeout_ms=0):
        out = {}
        if self._broker.stalled:
            return out
        for tp in self._assigned:
            log = self._broker.log(tp)
            pos = self._pos.get(tp, 0)
            batch = log[pos:pos + self.POLL_BATCH]
            if batch:
                out[tp] = [_ConsumerRecord(value=v, offset=pos + i)
                           for i, v in enumerate(batch)]
                self._pos[tp] = pos + len(batch)
        return out


def install(monkeypatch) -> FakeBroker:
    """Register fake ``kafka`` + ``kafka.structs`` modules; return broker."""
    broker = FakeBroker()
    kafka_mod = types.ModuleType("kafka")
    structs_mod = types.ModuleType("kafka.structs")
    structs_mod.TopicPartition = TopicPartition
    kafka_mod.KafkaProducer = (
        lambda bootstrap_servers=None, **kw: _FakeProducer(
            broker, bootstrap_servers))
    kafka_mod.KafkaConsumer = (
        lambda bootstrap_servers=None, **kw: _FakeConsumer(
            broker, bootstrap_servers))
    kafka_mod.structs = structs_mod
    monkeypatch.setitem(sys.modules, "kafka", kafka_mod)
    monkeypatch.setitem(sys.modules, "kafka.structs", structs_mod)
    return broker
