"""Multi-worker serving router: vid routing + stitch, rate limiting,
barrier/checkpoint/restore.

Reference counterparts: DGS partitioned serving workers behind the
coordinator (dynamic_graph_service/src/common/partitioner.h hash routing,
src/service/test/serving_actor_unittest.cpp), AdaptiveRateLimiter
(src/service/adaptive_rate_limiter.h:30), and coordinator checkpoints =
durable-log offsets (python/coordinator/checkpoint.py:44-197).
"""

import threading
import time

import numpy as np
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.online.http import ServingClient, ServingServer
from graph_learn_tpu.online.router import RateLimiter, ServingRouter
from graph_learn_tpu.online.update import UpdateBuffer, UpdateLog, apply_updates


def _mk_graph(paths):
    g = gl.Graph()
    g.node(paths["node"], node_type="item",
           decoder=gl.Decoder(weighted=True, labeled=True,
                              attr_types=["float"] * 4))
    g.edge(paths["edge"], edge_type=("item", "item", "rel"),
           decoder=gl.Decoder(weighted=True))
    return g.init()


@pytest.fixture
def fleet(tmp_graph_dir):
    """3 serving workers over replicas of the same graph + a router."""
    servers = [ServingServer(_mk_graph(tmp_graph_dir)).start()
               for _ in range(3)]
    urls = ["http://%s:%d" % (s.host, s.port) for s in servers]
    router = ServingRouter(urls)
    yield servers, router
    for s in servers:
        s.stop()


def test_router_stitch_matches_single_worker(fleet, tmp_graph_dir):
    """Ids landing on different owners come back stitched identically to a
    single-worker run — including nested src_nodes/dst_nodes payloads of
    an outE alias (per-row dicts must be re-interleaved, not copied from
    one worker)."""
    servers, router = fleet
    g0 = servers[0].graph
    q = (g0.V("item").batch(4).alias("src")
         .outE("rel").sample(3).by("topk").alias("e1")
         .values())
    qid = router.install(q)
    # raw ids i*10: vid % 3 spreads across all 3 workers
    ids = [0, 10, 20, 30, 40, 50, 130, 260]
    owners = {int(v) % 3 for v in ids}
    assert owners == {0, 1, 2}
    single = ServingClient(
        "http://%s:%d" % (servers[0].host, servers[0].port)
    ).run(router._qids[qid][0], ids)
    routed = router.run(qid, ids)

    def assert_tree_equal(a, b, path=""):
        assert type(a) is type(b), (path, type(a), type(b))
        if isinstance(a, dict):
            assert set(a) == set(b), path
            for k in a:
                assert_tree_equal(a[k], b[k], path + "/" + str(k))
        elif isinstance(a, list):
            assert a == b, path
        else:
            assert a == b, path

    assert set(routed) == {"src", "e1"}
    assert_tree_equal(routed, single)
    # sanity: the nested payload really is per-row and full-length
    assert len(routed["e1"]["src_nodes"]["ids"]) == len(ids)


def test_router_empty_ids(fleet):
    servers, router = fleet
    q = (servers[0].graph.V("item").batch(4).alias("src")
         .outV("rel").sample(2).by("topk").alias("h1").values())
    qid = router.install(q)
    assert router.run(qid, np.array([], np.int64)) == {}


def test_router_single_owner_batch(fleet):
    """All ids on one owner (a degenerate stitch) still returns every row
    in request order."""
    servers, router = fleet
    q = (servers[0].graph.V("item").batch(4).alias("src")
         .outV("rel").sample(2).by("topk").alias("h1").values())
    qid = router.install(q)
    ids = [0, 30, 90, 120]  # all % 3 == 0 -> worker 0
    out = router.run(qid, ids)
    assert len(out["src"]["ids"]) == 4
    assert len(out["h1"]["ids"]) == 4


def test_router_stats_aggregate(fleet):
    servers, router = fleet
    q = (servers[0].graph.V("item").batch(4).alias("src")
         .outV("rel").sample(2).by("topk").alias("h1").values())
    qid = router.install(q)
    router.run(qid, [0, 10, 20])
    st = router.stats(qid)
    assert st["workers"] >= 1 and st["qps"] > 0


def test_rate_limiter_decays_then_recovers():
    """AIMD under injected latency: the rate halves per interval while p99
    is above target, then recovers additively once latency clears — and
    the law's speed is set by the interval, not the polling rate."""
    rl = RateLimiter(target_p99_ms=20.0, max_updates_per_s=64.0,
                     min_updates_per_s=1.0, adjust_interval_s=0.02)
    for _ in range(64):
        rl.observe_latency(100.0)  # way over target
    r0 = rl.rate
    # poll admit() fast: within one interval the rate must NOT move
    for _ in range(50):
        rl.admit()
    assert rl.rate == r0
    # across intervals it decays multiplicatively
    for _ in range(4):
        time.sleep(0.025)
        rl.admit()
    assert rl.rate <= r0 / 8
    decayed = rl.rate
    # latency clears -> additive recovery
    rl._lat.clear()
    for _ in range(64):
        rl.observe_latency(1.0)
    for _ in range(4):
        time.sleep(0.025)
        rl.admit()
    assert rl.rate > decayed
    assert rl.rate <= rl.max_rate


class _FakeWorker:
    """ServingClient-shaped stub with controllable run latency."""

    def __init__(self, delay=0.0):
        self.delay = delay
        self.updates = []

    def install(self, plan, micro_batch=256):
        return 0

    def run(self, qid, ids):
        time.sleep(self.delay)
        ids = list(np.asarray(ids).tolist())
        return {"src": {"ids": ids,
                        "src_nodes": {"ids": [i * 2 for i in ids]}}}

    def update(self, nodes=None, edges=None):
        self.updates.append((nodes, edges))

    def refresh(self):
        pass

    def stats(self, qid):
        return {"p99_ms": 1.0, "qps": 10.0}


def test_barrier_drains_inflight_queries():
    """barrier() must not return while a query/update is in flight (the
    DGS barrier waits for Kafka drain, barrier.py:36-56)."""
    workers = [_FakeWorker(delay=0.3), _FakeWorker(delay=0.3)]
    router = ServingRouter(workers)
    qid = router.install(None)
    t_run_done = []

    def slow_query():
        router.run(qid, [0, 1])
        t_run_done.append(time.monotonic())

    th = threading.Thread(target=slow_query)
    th.start()
    time.sleep(0.05)  # let run() enter flight
    with router.barrier():
        t_barrier = time.monotonic()
        assert t_run_done, "barrier returned before in-flight run drained"
        assert t_barrier >= t_run_done[0]
    th.join()


def test_barrier_blocks_new_updates():
    workers = [_FakeWorker()]
    router = ServingRouter(workers)
    with router.barrier():
        out = router.update(edges={"rel": {"src_ids": [1], "dst_ids": [2]}},
                            wait=False)
        assert out == {"applied": False, "reason": "barrier"}
        assert workers[0].updates == []
    out = router.update(edges={"rel": {"src_ids": [1], "dst_ids": [2]}},
                        wait=False)
    assert out["applied"] is True
    assert len(workers[0].updates) == 1


def test_checkpoint_offsets_then_replay_restore(tmp_graph_dir, tmp_path):
    """Checkpoint records the update-log offset under a barrier; a worker
    restored by replaying the log UP TO that offset serves exactly the
    checkpointed answers, ignoring later updates."""
    g = _mk_graph(tmp_graph_dir)
    srv = ServingServer(g).start()
    try:
        router = ServingRouter(
            ["http://%s:%d" % (srv.host, srv.port)])
        q = (g.V("item").batch(2).alias("src")
             .outV("rel").sample(3).by("topk").alias("h1").values())
        qid = router.install(q)
        log = UpdateLog(str(tmp_path / "updates.jsonl"))

        def routed_update(**edges_kw):
            log.append_edges("rel", **edges_kw)
            router.update(edges={"rel": {k: list(v) for k, v in
                                         edges_kw.items()}})
            router.refresh()

        routed_update(src_ids=[0, 0], dst_ids=[390, 380], weights=[9., 8.])
        mark = router.checkpoint([log])
        assert mark["log_offsets"] == [1]
        oracle = router.run(qid, [0])["h1"]["ids"]
        # post-checkpoint update changes node 0's topk answer
        routed_update(src_ids=[0], dst_ids=[370], weights=[99.0])
        changed = router.run(qid, [0])["h1"]["ids"]
        assert changed != oracle
        # restore a fresh worker from the log at the checkpoint offset
        g2 = _mk_graph(tmp_graph_dir)
        buf = UpdateBuffer()
        assert log.replay(buf, upto=mark["log_offsets"][0]) == 1
        apply_updates(g2, buf)
        srv2 = ServingServer(g2).start()
        try:
            router2 = ServingRouter(
                ["http://%s:%d" % (srv2.host, srv2.port)])
            qid2 = router2.install(q)
            assert router2.run(qid2, [0])["h1"]["ids"] == oracle
        finally:
            srv2.stop()
    finally:
        srv.stop()
