"""Streaming ingestion transport: partitioned record topics + pollers.

TPU-native equivalent of the DGS ingestion fabric
(reference: dynamic_graph_service/ — dataloader clients partition update
records by vid hash and publish to Kafka
(`src/common/partitioner.h`, `dataloader/src/*.cc`,
`dataloader/apps/file_loader/loader.cc:32-256`); serving/sampling workers
consume their owned partitions with a RecordPoller
(`src/service/channel/record_poller.h:67`) and apply them to local state
(`src/service/data_update_actor.act.h:29`)):

- :class:`FileTopic` — a durable, partitioned, append-only record log on a
  shared filesystem.  It plays Kafka's role in this image (no broker):
  multiple producer processes append, multiple consumer processes poll by
  offset, each record lands in the partition owned by its vertex id.
- :class:`KafkaTopic` — the same interface over a real Kafka cluster when
  the ``kafka`` client package is importable (gated; not in this image).
- :class:`StreamProducer` — the dataloader client: splits update batches
  by owner partition and publishes (`dataloader/src/batch_producer.cc`).
- :class:`RecordPoller` — consumes an assigned partition set into an
  :class:`UpdateBuffer`, tracking per-partition offsets; ``offsets()`` is
  the checkpoint mark (what DGS records next to RocksDB backups,
  python/coordinator/checkpoint.py:44-197).
- :func:`bulk_load` — the file-loader app: a reference-layout TSV goes
  through the (native, csrc/ingest.cpp) parser and out to the topic.

The partition function mirrors DGS's hash partitioner over vid
(`src/common/partitioner.h`); FileTopic appends are line-atomic (single
``write`` of one JSON line), so concurrent producers interleave records
without tearing — the same contract Kafka gives per-partition.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from graph_learn_tpu.errors import (InvalidArgumentError, NotFoundError,
                                    UnimplementedError)
from graph_learn_tpu.online.update import UpdateBuffer


def partition_of(ids, num_partitions: int) -> np.ndarray:
    """Owner partition per vertex id (DGS: hash partitioner over vid).

    Fibonacci multiplicative hash — deterministic across producers and
    languages, uniform for both dense and strided id spaces.
    """
    v = np.asarray(ids, np.uint64)
    h = (v * np.uint64(11400714819323198485)) >> np.uint64(40)
    return (h % np.uint64(num_partitions)).astype(np.int64)


class FileTopic:
    """Durable partitioned record log: one JSONL file per partition."""

    def __init__(self, root: str, num_partitions: int = 1,
                 create: bool = True):
        self.root = os.path.abspath(root)
        meta = os.path.join(self.root, "topic.json")
        if os.path.exists(meta):
            self.num_partitions = json.load(open(meta))["num_partitions"]
        elif create:
            os.makedirs(self.root, exist_ok=True)
            self.num_partitions = int(num_partitions)
            with open(meta, "w") as f:
                json.dump({"num_partitions": self.num_partitions}, f)
        else:
            raise NotFoundError("no topic at %r" % root)

    def _part_path(self, p: int) -> str:
        if not 0 <= p < self.num_partitions:
            raise InvalidArgumentError("partition %d out of range" % p)
        return os.path.join(self.root, "part-%05d.jsonl" % p)

    def append(self, partition: int, record: dict) -> None:
        line = json.dumps(record, separators=(",", ":")) + "\n"
        # one write() of one complete line: atomic interleave on POSIX
        with open(self._part_path(partition), "a") as f:
            f.write(line)

    def read(self, partition: int, start: int = 0,
             max_records: Optional[int] = None) -> List[dict]:
        path = self._part_path(partition)
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as f:
            for i, line in enumerate(f):
                if i < start:
                    continue
                if max_records is not None and len(out) >= max_records:
                    break
                out.append(json.loads(line))
        return out

    def end_offset(self, partition: int) -> int:
        path = self._part_path(partition)
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return sum(1 for _ in f)


class KafkaTopic:
    """Same interface against a real Kafka cluster (gated on kafka client).

    Not exercisable in this image (no broker, no ``kafka`` package); the
    adapter exists so deployments with Kafka slot it in for FileTopic
    unchanged (reference transport: cppkafka in record_poller.h:67,
    sample_publisher.h:93).
    """

    def __init__(self, bootstrap_servers: str, topic: str,
                 num_partitions: int = 1):
        try:
            from kafka import KafkaConsumer, KafkaProducer  # noqa: F401
        except ImportError as e:
            raise UnimplementedError(
                "KafkaTopic needs the 'kafka' (kafka-python) package; use "
                "FileTopic on a shared filesystem instead") from e
        from kafka import KafkaConsumer, KafkaProducer
        from kafka.structs import TopicPartition
        self._TP = TopicPartition
        self.topic = topic
        self.num_partitions = int(num_partitions)
        self._producer = KafkaProducer(bootstrap_servers=bootstrap_servers)
        self._consumer = KafkaConsumer(bootstrap_servers=bootstrap_servers)

    def append(self, partition: int, record: dict) -> None:
        self._producer.send(self.topic, partition=partition,
                            value=json.dumps(record).encode())
        self._producer.flush()

    def read(self, partition: int, start: int = 0,
             max_records: Optional[int] = None) -> List[dict]:
        tp = self._TP(self.topic, partition)
        self._consumer.assign([tp])
        self._consumer.seek(tp, start)
        end = self._consumer.end_offsets([tp])[tp]
        n = end - start if max_records is None else min(
            max_records, end - start)
        out = []
        empty_polls = 0
        while len(out) < n:
            polled = self._consumer.poll(timeout_ms=1000)
            if not polled:
                # bounded retry: a broker that reported end offsets but
                # stops delivering must not spin this reader forever
                empty_polls += 1
                if empty_polls >= 10:
                    break
                continue
            empty_polls = 0
            for recs in polled.values():
                out.extend(json.loads(r.value) for r in recs)
        return out[:n]

    def end_offset(self, partition: int) -> int:
        tp = self._TP(self.topic, partition)
        return self._consumer.end_offsets([tp])[tp]


def _tolist(a):
    return None if a is None else np.asarray(a).tolist()


class StreamProducer:
    """Dataloader client: partition update batches by owner, publish.

    Node records go to the owner of the node id; edge records to the owner
    of the SRC id (DGS routes edge updates to the source vertex's
    partition so a vertex's out-adjacency lives on one worker,
    src/common/partitioner.h + sampling_actor.act.h:31).
    """

    def __init__(self, topic):
        self.topic = topic

    def put_nodes(self, node_type: str, ids, weights=None, labels=None,
                  float_attrs=None, int_attrs=None, timestamps=None):
        ids = np.asarray(ids, np.int64)
        parts = partition_of(ids, self.topic.num_partitions)
        fields = dict(weights=weights, labels=labels,
                      float_attrs=float_attrs, int_attrs=int_attrs,
                      timestamps=timestamps)
        for p in np.unique(parts):
            m = parts == p
            rec = {"kind": "nodes", "type": node_type,
                   "ids": ids[m].tolist()}
            for k, v in fields.items():
                if v is not None:
                    rec[k] = _tolist(np.asarray(v)[m])
            self.topic.append(int(p), rec)

    def put_edges(self, edge_type: str, src_ids, dst_ids, weights=None,
                  timestamps=None):
        src = np.asarray(src_ids, np.int64)
        dst = np.asarray(dst_ids, np.int64)
        if src.shape != dst.shape:
            raise InvalidArgumentError("src/dst length mismatch")
        parts = partition_of(src, self.topic.num_partitions)
        fields = dict(weights=weights, timestamps=timestamps)
        for p in np.unique(parts):
            m = parts == p
            rec = {"kind": "edges", "type": edge_type,
                   "src_ids": src[m].tolist(), "dst_ids": dst[m].tolist()}
            for k, v in fields.items():
                if v is not None:
                    rec[k] = _tolist(np.asarray(v)[m])
            self.topic.append(int(p), rec)


class RecordPoller:
    """Consume an assigned partition set into UpdateBuffers by offset.

    Reference: record_poller.h:67 — each worker polls only the partitions
    it owns; ``offsets()`` after a poll is the exactly-once resume mark.
    """

    def __init__(self, topic, partitions: Optional[Sequence[int]] = None,
                 offsets: Optional[Dict[int, int]] = None):
        self.topic = topic
        self.partitions = (list(range(topic.num_partitions))
                           if partitions is None else list(partitions))
        self._offsets = {int(p): 0 for p in self.partitions}
        if offsets:
            for p, o in offsets.items():
                self._offsets[int(p)] = int(o)

    def poll(self, buf: UpdateBuffer,
             max_records: Optional[int] = None) -> int:
        """Drain new records into ``buf``; returns the record count."""
        n = 0
        for p in self.partitions:
            budget = None if max_records is None else max_records - n
            if budget is not None and budget <= 0:
                break
            recs = self.topic.read(p, start=self._offsets[p],
                                   max_records=budget)
            for rec in recs:
                rec = dict(rec)
                kind, t = rec.pop("kind"), rec.pop("type")
                if kind == "nodes":
                    buf.add_nodes(t, **rec)
                elif kind == "edges":
                    buf.add_edges(t, **rec)
                else:
                    raise InvalidArgumentError("bad record kind %r" % kind)
            self._offsets[p] += len(recs)
            n += len(recs)
        return n

    def offsets(self) -> Dict[int, int]:
        return dict(self._offsets)

    def lag(self) -> int:
        return sum(self.topic.end_offset(p) - self._offsets[p]
                   for p in self.partitions)


def ingest(graph, poller: RecordPoller, service=None,
           max_records: Optional[int] = None) -> int:
    """Pump: poll owned partitions -> apply to the store -> refresh serving.

    The data_update_actor.act.h:29 loop, synchronously: returns the number
    of records applied.  ``service`` (a QueryService / ServingServer-like
    object with ``refresh()``) snapshots the new state copy-on-write, so
    in-flight queries keep serving the old tables.
    """
    from graph_learn_tpu.online.update import apply_updates
    buf = UpdateBuffer()
    n = poller.poll(buf, max_records=max_records)
    if not buf.empty:
        apply_updates(graph, buf)
        if service is not None:
            service.refresh()
    return n


def bulk_load(producer: StreamProducer, kind: str, type_name: str,
              path: str, decoder) -> int:
    """File-loader app: reference-layout TSV -> parsed -> topic records.

    Reference: dataloader/apps/file_loader/loader.cc:32-256 (read file,
    partition, publish).  Reuses the (native) ingest parser, so the TSV
    schema rules are identical to ``Graph.node()/edge()`` loading.
    Returns the row count published.
    """
    from graph_learn_tpu.core.ingest import load_edge_table, load_node_table
    if kind == "nodes":
        cols = load_node_table(path, decoder)
        producer.put_nodes(type_name, cols["ids"],
                           weights=cols.get("weights"),
                           labels=cols.get("labels"),
                           float_attrs=cols.get("float_attrs"),
                           int_attrs=cols.get("int_attrs"),
                           timestamps=cols.get("timestamps"))
        return int(np.asarray(cols["ids"]).shape[0])
    if kind == "edges":
        cols = load_edge_table(path, decoder)
        producer.put_edges(type_name, cols["src_ids"], cols["dst_ids"],
                           weights=cols.get("weights"),
                           timestamps=cols.get("timestamps"))
        return int(np.asarray(cols["src_ids"]).shape[0])
    raise InvalidArgumentError("kind must be 'nodes' or 'edges'")
