"""Serving-worker entrypoint: config JSON -> Graph -> HTTP server.

The deployable unit of the online tier — what a container runs
(reference: dynamic_graph_service/src/service/apps/service_main.cpp is
the DGS worker binary; k8s/charts/dgs templates launch it with a mounted
config).  Here one process loads the graph, optionally attaches a
streaming-update poller, and serves HTTP until SIGTERM.

Config JSON schema (see deploy/k8s/README.md for a k8s-mounted example)::

    {
      "port": 8080,
      "host": "0.0.0.0",
      "nodes": [{"source": "file:///data/node_table", "type": "item",
                 "decoder": {"weighted": true, "labeled": true,
                              "attr_types": ["float", "float"]}}],
      "edges": [{"source": "file:///data/edge_table",
                 "type": ["item", "item", "rel"],
                 "decoder": {"weighted": true}, "directed": false}],
      "queries": [{"plan": {...gsl/plan.py JSON...},
                   "micro_batch": 256}],          # pre-installed queries
      "update_topic": {"root": "/data/topic",     # optional streaming
                       "partitions": [0, 1],      # owned partition set
                       "poll_interval_s": 5.0},
      "graph_shards": 1                           # >1: partitioned store
    }

Run: ``python -m graph_learn_tpu.online.serve_main --config conf.json``.
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
import threading

from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.errors import InvalidArgumentError


def _decoder(spec: dict) -> Decoder:
    spec = dict(spec or {})
    if "attr_types" in spec:  # JSON lists -> tuples for bucketed entries
        spec["attr_types"] = [tuple(t) if isinstance(t, list) else t
                              for t in spec["attr_types"]]
    return Decoder(**spec)


def graph_from_config(cfg: dict):
    """Build and init a Graph from the config's nodes/edges sections —
    or restore a built-store snapshot (``"snapshot": "/path"``), skipping
    TSV ingest entirely (reference: DGS worker restore from RocksDB
    backups, checkpoint.py:44-197); the update pump then replays streamed
    deltas on top."""
    from graph_learn_tpu.graph import Graph
    from graph_learn_tpu.graph import Mask
    if cfg.get("snapshot"):
        return Graph.load(cfg["snapshot"])
    g = Graph()
    for n in cfg.get("nodes", []):
        mask = getattr(Mask, n["mask"].upper()) if n.get("mask") else None
        kw = {"mask": mask} if mask is not None else {}
        g.node(n["source"], node_type=n["type"],
               decoder=_decoder(n.get("decoder")), **kw)
    for e in cfg.get("edges", []):
        t = e["type"]
        if not (isinstance(t, (list, tuple)) and len(t) == 3):
            raise InvalidArgumentError(
                "edge type must be [src_type, dst_type, edge_type]")
        g.edge(e["source"], edge_type=tuple(t),
               decoder=_decoder(e.get("decoder")),
               directed=e.get("directed", True))
    return g.init()


def serve(cfg: dict, block: bool = True):
    """Start a ServingServer (+ optional update pump) from a config dict.

    Returns (server, stop_fn); with ``block=True`` runs until SIGTERM /
    SIGINT and returns after shutdown.
    """
    from graph_learn_tpu.online.http import ServingServer
    g = graph_from_config(cfg)
    server = ServingServer(g, host=cfg.get("host", "127.0.0.1"),
                           port=int(cfg.get("port", 0)),
                           graph_shards=int(cfg.get("graph_shards", 1)))
    server.start()
    from graph_learn_tpu.gsl.plan import plan_to_query
    for q in cfg.get("queries", []):
        server.service.install(plan_to_query(g, q["plan"]),
                               micro_batch=int(q.get("micro_batch", 256)))
    for m in cfg.get("models", []):
        # exported sample+forward artifacts served at POST /predict
        server.service.install_model(m["name"], m["artifact"])
    stop_evt = threading.Event()
    pump = None
    topic_cfg = cfg.get("update_topic")
    if topic_cfg:
        from graph_learn_tpu.online.stream import (FileTopic, RecordPoller,
                                                   ingest)
        topic = FileTopic(topic_cfg["root"], create=False)
        poller = RecordPoller(topic,
                              partitions=topic_cfg.get("partitions"),
                              offsets=topic_cfg.get("offsets"))
        interval = float(topic_cfg.get("poll_interval_s", 5.0))

        def _pump():
            while not stop_evt.wait(interval):
                try:
                    ingest(g, poller, service=server.service)
                except Exception as e:  # keep serving on bad batches
                    print("[serve] update batch failed: %s" % e,
                          file=sys.stderr)

        pump = threading.Thread(target=_pump, daemon=True)
        pump.start()

    def stop(*_a):
        stop_evt.set()
        server.stop()

    if block:
        signal.signal(signal.SIGTERM, stop)
        signal.signal(signal.SIGINT, stop)
        print("[serve] listening on %s:%d" % (server.host, server.port),
              flush=True)
        try:
            stop_evt.wait()
        except KeyboardInterrupt:
            pass
        stop()
        return None
    return server, stop


def main(argv=None):
    # honor GLT_PLATFORM before any backend initialises (this image's
    # sitecustomize preimports jax, so plain JAX_PLATFORMS env is too
    # late — utils/platform.py)
    from graph_learn_tpu.utils.platform import ensure_platform
    ensure_platform()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", required=True, help="config JSON path")
    ap.add_argument("--port", type=int, default=None,
                    help="override config port")
    ap.add_argument("--snapshot", default=None,
                    help="restore the built store from a Graph.save() "
                         "directory instead of ingesting TSVs")
    args = ap.parse_args(argv)
    cfg = json.load(open(args.config))
    if args.port is not None:
        cfg["port"] = args.port
    if args.snapshot is not None:
        cfg["snapshot"] = args.snapshot
    serve(cfg, block=True)


if __name__ == "__main__":
    main()
