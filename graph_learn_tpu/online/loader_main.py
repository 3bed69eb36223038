"""Dataloader apps: file loader + output viewer CLIs for stream topics.

The deployable ingestion-side counterparts of ``serve_main``
(reference: dynamic_graph_service/dataloader/apps/file_loader/loader.cc:32-256
reads a file, partitions records by vid and publishes them to Kafka;
dataloader/apps/output_viewer dumps what landed).  Here the transport is
the partitioned topic abstraction of ``online/stream.py`` (FileTopic on
any shared filesystem, KafkaTopic when a broker exists), and the TSV
schema rules are identical to ``Graph.node()/edge()`` bulk loading
because the same (native) ingest parser runs underneath.

Usage::

    # publish reference-layout TSVs into a 4-partition topic
    python -m graph_learn_tpu.online.loader_main load \
        --topic /data/updates --partitions 4 \
        --nodes item=/data/node_table \
        --node-decoder '{"labeled": true, "attr_types": ["float", "float"]}' \
        --edges rel:item:item=/data/edge_table \
        --edge-decoder '{"weighted": true}'

    # inspect what landed (output viewer)
    python -m graph_learn_tpu.online.loader_main view \
        --topic /data/updates --partition 0 --start 0 --limit 5

    # per-partition end offsets (consumer-lag bookkeeping)
    python -m graph_learn_tpu.online.loader_main offsets --topic /data/updates
"""

from __future__ import annotations

import argparse
import json
import sys

from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.errors import InvalidArgumentError
from graph_learn_tpu.online.stream import (FileTopic, KafkaTopic,
                                           StreamProducer, bulk_load)


def _decoder(text: str) -> Decoder:
    spec = json.loads(text) if text else {}
    if "attr_types" in spec:
        spec["attr_types"] = [tuple(t) if isinstance(t, list) else t
                              for t in spec["attr_types"]]
    return Decoder(**spec)


def _topic(args, create: bool):
    if args.topic.startswith("kafka://"):
        # kafka://broker:9092/topic-name
        rest = args.topic[len("kafka://"):]
        broker, _, name = rest.partition("/")
        if not name:
            raise InvalidArgumentError("kafka:// topic needs /topic-name")
        return KafkaTopic(broker, name,
                          num_partitions=args.partitions)
    return FileTopic(args.topic, num_partitions=args.partitions,
                     create=create)


def _parse_target(spec: str, kind: str):
    """'item=/path' or 'rel:src:dst=/path' -> (type_name, path)."""
    type_part, _, path = spec.partition("=")
    if not path:
        raise InvalidArgumentError(
            "%s spec must look like type=/path (got %r)" % (kind, spec))
    return type_part.split(":")[0], path


def cmd_load(args) -> int:
    topic = _topic(args, create=True)
    producer = StreamProducer(topic)
    total = 0
    for spec in args.nodes or []:
        type_name, path = _parse_target(spec, "nodes")
        n = bulk_load(producer, "nodes", type_name, path,
                      _decoder(args.node_decoder))
        print("loaded %d node rows (%s) from %s" % (n, type_name, path))
        total += n
    for spec in args.edges or []:
        type_name, path = _parse_target(spec, "edges")
        n = bulk_load(producer, "edges", type_name, path,
                      _decoder(args.edge_decoder))
        print("loaded %d edge rows (%s) from %s" % (n, type_name, path))
        total += n
    print("published %d rows to %s (%d partitions)"
          % (total, args.topic, topic.num_partitions))
    return 0


def cmd_view(args) -> int:
    topic = _topic(args, create=False)
    parts = ([args.partition] if args.partition is not None
             else range(topic.num_partitions))
    shown = 0
    for p in parts:
        recs = topic.read(p, start=args.start,
                          max_records=args.limit - shown)
        for i, rec in enumerate(recs):
            print(json.dumps({"partition": p, "offset": args.start + i,
                              **rec}))
        shown += len(recs)
        if shown >= args.limit:
            break
    return 0


def cmd_offsets(args) -> int:
    topic = _topic(args, create=False)
    out = {str(p): topic.end_offset(p) for p in range(topic.num_partitions)}
    print(json.dumps({"topic": args.topic, "end_offsets": out}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="graph_learn_tpu.online.loader_main",
        description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    load = sub.add_parser("load", help="TSV file(s) -> topic records")
    load.add_argument("--topic", required=True,
                      help="FileTopic root dir or kafka://broker/topic")
    load.add_argument("--partitions", type=int, default=1)
    load.add_argument("--nodes", action="append",
                      metavar="TYPE=/path/to/node_table")
    load.add_argument("--edges", action="append",
                      metavar="TYPE[:SRC:DST]=/path/to/edge_table")
    load.add_argument("--node-decoder", default="{}",
                      help="Decoder kwargs as JSON")
    load.add_argument("--edge-decoder", default="{}")
    load.set_defaults(fn=cmd_load)

    view = sub.add_parser("view", help="dump topic records as JSON lines")
    view.add_argument("--topic", required=True)
    view.add_argument("--partitions", type=int, default=0,
                      help="0 = autodetect from the topic dir")
    view.add_argument("--partition", type=int, default=None)
    view.add_argument("--start", type=int, default=0)
    view.add_argument("--limit", type=int, default=20)
    view.set_defaults(fn=cmd_view)

    offs = sub.add_parser("offsets", help="per-partition end offsets")
    offs.add_argument("--topic", required=True)
    offs.add_argument("--partitions", type=int, default=0)
    offs.set_defaults(fn=cmd_offsets)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
