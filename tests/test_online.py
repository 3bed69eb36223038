"""Streaming updates + installed-query serving (DGS-capability tier)."""

import numpy as np
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.online.serving import QueryService
from graph_learn_tpu.online.update import (UpdateBuffer, UpdateLog,
                                           apply_updates)


@pytest.fixture
def g(tmp_graph_dir):
    g = gl.Graph()
    g.node(tmp_graph_dir["node"], node_type="item",
           decoder=gl.Decoder(weighted=True, labeled=True,
                              attr_types=["float"] * 4))
    g.edge(tmp_graph_dir["edge"], edge_type=("item", "item", "rel"),
           decoder=gl.Decoder(weighted=True))
    return g.init()


def test_add_edges_visible_after_refresh(g):
    et0 = g.store.edge_table("rel")
    n0 = et0.num_edges
    buf = UpdateBuffer()
    buf.add_edges("rel", src_ids=[0, 0, 0], dst_ids=[390, 380, 370],
                  weights=[9.0, 8.0, 7.0])
    apply_updates(g, buf)
    et1 = g.store.edge_table("rel")
    assert et1.num_edges == n0 + 3
    # node 0 (raw id 0) gained 3 out-neighbors
    deg = g.out_degrees(np.array([0]), "rel")
    assert deg[0] == 1 + 3


def test_add_nodes_then_edges(g):
    n0 = g.store.node_table("item").num_nodes
    buf = UpdateBuffer()
    buf.add_nodes("item", ids=[10_000, 10_010],
                  weights=[1.0, 1.0], labels=[2, 3],
                  float_attrs=np.ones((2, 4), np.float32))
    apply_updates(g, buf)
    t = g.store.node_table("item")
    assert t.num_nodes == n0 + 2
    buf.add_edges("rel", src_ids=[10_000], dst_ids=[10_010], weights=[1.0])
    apply_updates(g, buf)
    assert g.out_degrees(np.array([10_000]), "rel")[0] == 1


def test_duplicate_node_add_rejected(g):
    buf = UpdateBuffer()
    buf.add_nodes("item", ids=[0], weights=[1.0], labels=[0],
                  float_attrs=np.ones((1, 4), np.float32))
    with pytest.raises(gl.InvalidArgumentError):
        apply_updates(g, buf)


def test_update_log_replay(g, tmp_path):
    log = UpdateLog(str(tmp_path / "updates.jsonl"))
    log.append_edges("rel", src_ids=[0], dst_ids=[100], weights=[5.0])
    log.append_edges("rel", src_ids=[10], dst_ids=[200], weights=[5.0])
    buf = UpdateBuffer()
    assert log.replay(buf) == 2
    n0 = g.store.edge_table("rel").num_edges
    apply_updates(g, buf)
    assert g.store.edge_table("rel").num_edges == n0 + 2


def test_query_service_serving(g):
    q = (g.V("item").batch(8).alias("src")
         .outV("rel").sample(3).by("random").alias("h1")
         .outV("rel").sample(2).by("topk").alias("h2").values())
    svc = QueryService(g)
    qid = svc.install(q, micro_batch=8)
    out = svc.run(qid, np.array([0, 10, 20, 30, 40]))
    assert out["src"].ids.shape[0] == 5
    assert out["h1"].ids.shape == (5, 3)
    assert out["h2"].ids.shape == (5, 3, 2)
    # serve again after an update + refresh
    buf = UpdateBuffer()
    buf.add_edges("rel", src_ids=[0] * 5,
                  dst_ids=[100, 110, 120, 130, 140], weights=[9.0] * 5)
    apply_updates(g, buf)
    svc.refresh()
    out2 = svc.run(qid, np.array([0]))
    # node 0 now has 6 out edges; topk hop2 unaffected shape-wise
    assert out2["h1"].ids.shape == (1, 3)
    st = svc.stats(qid)
    assert st["qps"] > 0


def test_plan_roundtrip(g):
    """Query plan JSON round-trip (DGS fbs/query_plan.fbs parity)."""
    import json
    from graph_learn_tpu.gsl.plan import plan_to_query, query_to_plan
    q = (g.V("item").batch(6).alias("src")
         .outV("rel").sample(3).by("topk").alias("hop1")
         .outNeg("rel").sample(2).by("in_degree").alias("neg")
         .values())
    plan = json.loads(json.dumps(query_to_plan(q)))  # through the wire
    q2 = plan_to_query(g, plan)
    import jax
    out1 = q.run(np.arange(6, dtype=np.int32), jax.random.key(3))
    out2 = q2.run(np.arange(6, dtype=np.int32), jax.random.key(3))
    assert set(out1) == set(out2) == {"src", "hop1", "neg"}
    np.testing.assert_array_equal(np.asarray(out1["hop1"].ids),
                                  np.asarray(out2["hop1"].ids))
    np.testing.assert_array_equal(np.asarray(out1["neg"].ids),
                                  np.asarray(out2["neg"].ids))


def test_http_serving_tier(g):
    """Full HTTP loop: schema -> install plan -> run -> update -> refresh.

    Parity with the DGS edge (event_handler.cc:139-151 run_query,
    http_service.py:35-118 admin routes, Java client transport)."""
    from graph_learn_tpu.online.http import ServingClient, ServingServer
    srv = ServingServer(g).start()
    try:
        c = ServingClient("http://%s:%d" % (srv.host, srv.port))
        schema = c.schema()
        assert schema["nodes"]["item"] == 40

        q = (g.V("item").batch(4).alias("src")
             .outV("rel").sample(3).by("random").alias("hop1")
             .values())
        qid = c.install(q, micro_batch=8)
        out = c.run(qid, [0, 10, 20, 30, 40, 50])
        assert len(out["src"]["ids"]) == 6
        assert len(out["hop1"]["ids"]) == 6
        assert len(out["hop1"]["ids"][0]) == 3
        assert len(out["src"]["float_attrs"][0]) == 4

        st = c.stats(qid)
        assert st["qps"] > 0

        # streaming update: node 0 gains 2 heavy edges; visible after refresh
        c.update(edges={"rel": {"src_ids": [0, 0],
                                "dst_ids": [390, 380],
                                "weights": [9.0, 8.0]}})
        c.refresh()
        q2 = (g.V("item").batch(1).alias("src")
              .outV("rel").sample(3).by("topk").alias("top")
              .values())
        qid2 = c.install(q2, micro_batch=4)
        out2 = c.run(qid2, [0])
        # topk by weight: the new weight-9/8 edges dominate
        got = set(out2["top"]["ids"][0])
        assert 39 in got and 38 in got
    finally:
        srv.stop()


def test_export_serving_fn(g, tmp_path):
    """StableHLO export of sample+embed (TF-serving export parity)."""
    import jax
    import jax.numpy as jnp
    from graph_learn_tpu.gsl.compile import _execute
    from graph_learn_tpu.online.export import (export_serving_fn,
                                               load_serving_fn)

    q = (g.V("item").batch(4).alias("src")
         .outV("rel").sample(3).by("random").alias("hop1")
         .values())
    tables = q.device_tables()

    def serve(seeds, key):
        out = _execute(q, tables, seeds, key)
        # toy "embedding": mean of neighbor attrs concat src attrs
        nbr = jnp.mean(out["hop1"].float_attrs, axis=1)
        return jnp.concatenate([out["src"].float_attrs, nbr], axis=-1)

    seeds = jnp.arange(4, dtype=jnp.int32)
    key = jax.random.key(0)
    path = str(tmp_path / "serving.stablehlo")
    export_serving_fn(serve, (seeds, key), path=path)
    call = load_serving_fn(path)
    out = call(seeds, key)
    ref = serve(seeds, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_expire_edges_ttl(tmp_path):
    """TTL eviction parity (DGS RocksDB-TTL sample_store.h:71)."""
    from graph_learn_tpu.online.update import expire_edges
    d = tmp_path
    with open(d / "n", "w") as f:
        f.write("id:int64\n")
        for i in range(10):
            f.write("%d\n" % i)
    with open(d / "e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\ttimestamp:int64\n")
        for i in range(10):
            for j in range(3):
                f.write("%d\t%d\t%d\n" % (i, (i + j + 1) % 10,
                                          1000 + i * 10 + j))
    g = (gl.Graph().node(str(d / "n"), "v", gl.Decoder())
         .edge(str(d / "e"), ("v", "v", "e"),
               gl.Decoder(timestamped=True))).init()
    et0 = g.store.edge_table("e")
    assert et0.num_edges == 30
    dropped = expire_edges(g, older_than=1050)
    assert dropped == {"e": 15}  # ts 1000..1042 below 1050: nodes 0-4
    et1 = g.store.edge_table("e")
    assert et1.num_edges == 15
    assert int((et1.timestamps + et1.ts_base).min()) >= 1050
    # still queryable; early nodes now have zero degree -> default fill
    q = (g.V("v").batch(10).alias("s")
         .outV("e").sample(2).by("topk").alias("h").values())
    out = gl.Dataset(q, window=1).next()
    # nodes 0..3 fully expired -> default neighbor fill (id 0)
    ids = np.asarray(out["h"].ids)
    assert np.all(ids[:4] == 0)


def test_coalescer_batches_concurrent_requests(g):
    """Pending requests drain into ONE device launch (the device analogue
    of DGS's actor mailbox batching, serving_actor.act.h:29)."""
    from graph_learn_tpu.online.serving import _Pending
    q = (g.V("item").batch(4).alias("src")
         .outV("rel").sample(3).by("topk").alias("h1").values())
    svc = QueryService(g)
    qid = svc.install(q, micro_batch=16)
    iq = svc._queries[qid]
    iq.close()  # stop the live worker; drive _serve_once by hand
    calls = []
    orig = iq._execute_batch
    iq._execute_batch = lambda ids: (calls.append(ids.size), orig(ids))[1]
    pend = [_Pending(np.array([i * 10, i * 10 + 10], np.int64))
            for i in range(3)]
    for p in pend:
        iq._queue.put(p)
    assert iq._serve_once()  # one round
    assert calls == [6]  # 3 requests x 2 ids -> one 6-id launch
    for i, p in enumerate(pend):
        assert p.error is None
        got = np.asarray(p.result["src"].ids)
        assert got.shape == (2,)
        # each caller got exactly its own slice back
        assert list(np.asarray(p.result["h1"].ids).shape) == [2, 3]
    assert len(iq.latencies) == 3 and iq.served == 6


def test_refresh_is_copy_on_write(g):
    """refresh() swaps an immutable snapshot; in-flight requests keep the
    old one (DGS snapshot isolation under streaming ingest)."""
    q = (g.V("item").batch(4).alias("src")
         .outV("rel").sample(3).by("topk").alias("h1").values())
    svc = QueryService(g)
    qid = svc.install(q, micro_batch=8)
    iq = svc._queries[qid]
    snap0 = iq._snap
    out0 = svc.run(qid, np.array([100]))
    buf = UpdateBuffer()
    buf.add_edges("rel", src_ids=[100, 100], dst_ids=[390, 380],
                  weights=[9.0, 8.0])
    apply_updates(g, buf)
    svc.refresh()
    assert iq._snap is not snap0  # new snapshot object
    # old snapshot still evaluates (COW: nothing was mutated in place)
    old_out = iq._fn(snap0.tables,
                     np.full((8,), 10, np.int32), iq._key)
    assert np.asarray(old_out["h1"].ids).shape == (8, 3)
    out1 = svc.run(qid, np.array([100]))
    top = set(np.asarray(out1["h1"].ids)[0].tolist())
    assert {39, 38} <= top  # new heavy edges dominate topk
    assert set(np.asarray(out0["h1"].ids)[0].tolist()) != top
    svc.close()


def test_concurrent_clients_with_streaming_updates(g):
    """>= 8 concurrent clients on one installed query while updates stream
    through /admin/update + /admin/refresh.  Reads are never blocked by
    admin work and every response equals the deterministic (topk) oracle
    for ids the updates do not touch."""
    import threading
    from graph_learn_tpu.online.http import ServingClient, ServingServer

    srv = ServingServer(g).start()
    try:
        c = ServingClient("http://%s:%d" % (srv.host, srv.port))
        q = (g.V("item").batch(4).alias("src")
             .outV("rel").sample(3).by("topk").alias("h1").values())
        qid = c.install(q, micro_batch=32)
        # oracle: deterministic topk answer per id (ids never updated)
        ids = [100, 110, 120, 130, 140, 150, 160, 170]
        oracle = {i: c.run(qid, [i])["h1"]["ids"][0] for i in ids}

        errors = []
        done = threading.Event()

        def client(tid):
            cc = ServingClient("http://%s:%d" % (srv.host, srv.port))
            try:
                for r in range(6):
                    i = ids[(tid + r) % len(ids)]
                    out = cc.run(qid, [i])
                    if out["h1"]["ids"][0] != oracle[i]:
                        errors.append((tid, i, out["h1"]["ids"][0]))
            except Exception as e:
                errors.append((tid, repr(e)))

        def updater():
            cc = ServingClient("http://%s:%d" % (srv.host, srv.port))
            k = 0
            while not done.is_set() and k < 20:
                # touch only node 0's neighborhood — oracle ids unaffected
                cc.update(edges={"rel": {"src_ids": [0],
                                         "dst_ids": [(k * 10) % 390],
                                         "weights": [5.0 + k]}})
                cc.refresh()
                k += 1

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(8)]
        upd = threading.Thread(target=updater)
        upd.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        done.set()
        upd.join(timeout=120)
        assert not errors, errors[:5]
        st = c.stats(qid)
        assert st["p99_ms"] > 0 and st["qps"] > 0
    finally:
        srv.stop()


def test_subgraph_serving_not_coalesced(g):
    """SubGraph outputs are not seed-aligned (node union + edge_index are
    batch-global) — concurrent clients must get dedicated launches, never
    slices of a merged batch (which would leak other clients' seeds)."""
    from graph_learn_tpu.online.serving import _Pending

    q = (g.V("item").batch(4).alias("src")
         .SubGraph("rel").alias("sg").values())
    svc = QueryService(g)
    qid = svc.install(q, micro_batch=16)
    iq = svc._queries[qid]
    assert iq._seed_aligned is False
    # oracle: each id set served alone
    a_ids = np.array([0, 10], np.int64)
    b_ids = np.array([200, 210, 220], np.int64)
    oracle_a = iq.run(a_ids)
    oracle_b = iq.run(b_ids)
    # drive a round with both pending: each must still get its own result
    iq.close()
    pa, pb = _Pending(a_ids), _Pending(b_ids)
    iq._queue.put(pa)
    iq._queue.put(pb)
    assert iq._serve_once()  # serves ONLY pa (no coalescing)
    assert pa.error is None and pb.result is None
    assert iq._serve_once()
    assert pb.error is None
    na = int(pa.result["sg"].num_nodes)
    assert na == int(oracle_a["sg"].num_nodes)
    assert (np.asarray(pa.result["sg"].node_ids)[:na].tolist()
            == np.asarray(oracle_a["sg"].node_ids)[:na].tolist())
    nb = int(pb.result["sg"].num_nodes)
    assert nb == int(oracle_b["sg"].num_nodes)
    assert (np.asarray(pb.result["sg"].node_ids)[:nb].tolist()
            == np.asarray(oracle_b["sg"].node_ids)[:nb].tolist())
    # seed-aligned aliases of the same query are trimmed to the request
    assert np.asarray(pa.result["src"].ids).shape[0] == 2
    assert np.asarray(pb.result["src"].ids).shape[0] == 3


def test_subgraph_serving_rejects_oversized_request(g):
    q = (g.V("item").batch(4).alias("src")
         .SubGraph("rel").alias("sg").values())
    svc = QueryService(g)
    qid = svc.install(q, micro_batch=4)
    with pytest.raises(gl.InvalidArgumentError):
        svc.run(qid, np.arange(8, dtype=np.int64) * 10)
    svc.close()


def test_partitioned_serving_scales_past_one_chip(tmp_path):
    """QueryService over the range-partitioned store (VERDICT r2 next #6):
    8 virtual devices each hold < the full store, streaming updates land
    in shard-local blocks via refresh(), and answers match the
    single-device service exactly (deterministic strategies)."""
    import jax

    from graph_learn_tpu.parallel.sharded_store import build_sharded_tables

    rng = np.random.default_rng(0)
    n, deg, f = 2000, 8, 32
    with open(tmp_path / "nodes", "w") as fh:
        fh.write("id:int64\tfeature:string\n")
        for i in range(n):
            fh.write("%d\t%s\n" % (i, ":".join(
                "%.3f" % x for x in rng.random(f))))
    with open(tmp_path / "edges", "w") as fh:
        fh.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for i in range(n):
            for j in range(deg):
                fh.write("%d\t%d\t%.2f\n" % (i, (i * 13 + j * 7) % n,
                                             j + 1.0))
    def mk():
        return (gl.Graph()
                .node(str(tmp_path / "nodes"), "v",
                      gl.Decoder(attr_types=["float"] * f))
                .edge(str(tmp_path / "edges"), ("v", "v", "e"),
                      gl.Decoder(weighted=True))).init()

    g_part, g_single = mk(), mk()

    def q_of(g):
        return (g.V("v").batch(8).alias("src")
                .outV("e").sample(3).by("topk").alias("h1").values())

    svc = QueryService(g_part, graph_shards=8)
    qid = svc.install(q_of(g_part), micro_batch=8)
    ref = QueryService(g_single)
    rid = ref.install(q_of(g_single), micro_batch=8)
    ids = np.array([0, 5, 17, 123, 999, 1500, 1999, 3], np.int64)
    out = svc.run(qid, ids)
    oracle = ref.run(rid, ids)
    np.testing.assert_array_equal(np.asarray(out["h1"].ids),
                                  np.asarray(oracle["h1"].ids))
    np.testing.assert_allclose(np.asarray(out["h1"].float_attrs,
                                          dtype=np.float32),
                               np.asarray(oracle["h1"].float_attrs,
                                          dtype=np.float32), rtol=1e-6)
    # per-device bytes really shrink vs the full store
    full_bytes = sum(x.nbytes for x in jax.tree.leaves(
        q_of(g_single).device_tables()))
    st = build_sharded_tables(q_of(g_part), 8)
    assert st.bytes_per_device() < full_bytes * 0.3, (
        st.bytes_per_device(), full_bytes)

    # streaming update -> refresh rebuilds the SHARD blocks; the new
    # heavy edges dominate node 0's topk answer
    buf = UpdateBuffer()
    buf.add_edges("e", src_ids=[0, 0, 0], dst_ids=[42, 43, 44],
                  weights=[99.0, 98.0, 97.0])
    apply_updates(g_part, buf)
    svc.refresh()
    out2 = svc.run(qid, np.array([0], np.int64))
    assert set(np.asarray(out2["h1"].ids)[0].tolist()) == {42, 43, 44}
    svc.close()
    ref.close()


def test_partitioned_incremental_refresh_uploads_delta_only(tmp_path):
    """VERDICT r3 Missing #4: refresh() on a partitioned QueryService
    applies update deltas per shard — a small update re-uploads <= 1/P of
    the store bytes (counted at device_put granularity), while concurrent
    clients keep getting COW-consistent answers.  Reference: DGS applies
    per-record updates to partitioned state (data_update_actor.act.h:29)
    instead of rebuilding stores."""
    import threading

    from graph_learn_tpu.config import conf

    rng = np.random.default_rng(1)
    n, deg, f = 2000, 8, 16
    with open(tmp_path / "nodes", "w") as fh:
        fh.write("id:int64\tfeature:string\n")
        for i in range(n):
            fh.write("%d\t%s\n" % (i, ":".join(
                "%.3f" % x for x in rng.random(f))))
    with open(tmp_path / "edges", "w") as fh:
        fh.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for i in range(n):
            for j in range(deg):
                fh.write("%d\t%d\t%.2f\n" % (i, (i * 13 + j * 7) % n,
                                             j + 1.0))
    g = (gl.Graph()
         .node(str(tmp_path / "nodes"), "v",
               gl.Decoder(attr_types=["float"] * f))
         .edge(str(tmp_path / "edges"), ("v", "v", "e"),
               gl.Decoder(weighted=True))).init()

    prev_profile = conf.storage_profile
    conf.storage_profile = "minimal"
    svc = QueryService(g, graph_shards=8)
    try:
        q = (g.V("v").batch(8).alias("src")
             .outV("e").sample(3).by("topk").alias("h1").values())
        qid = svc.install(q, micro_batch=8)
        iq = svc._queries[qid]
        full_upload = iq.last_refresh_upload_bytes
        oracle_ids = [100, 600, 1100, 1600, 1999]
        oracle = {i: np.asarray(svc.run(qid, [i])["h1"].ids)[0].tolist()
                  for i in oracle_ids}

        errors = []
        done = threading.Event()

        def client(tid):
            try:
                for r in range(8):
                    i = oracle_ids[(tid + r) % len(oracle_ids)]
                    got = np.asarray(svc.run(qid, [i])["h1"].ids)[0].tolist()
                    if got != oracle[i]:
                        errors.append((tid, i, got))
            except Exception as e:  # pragma: no cover
                errors.append((tid, repr(e)))

        uploads = []

        def updater():
            k = 0
            while not done.is_set() and k < 5:
                buf = UpdateBuffer()
                buf.add_edges("e", src_ids=[0], dst_ids=[42 + k],
                              weights=[50.0 + k])
                apply_updates(g, buf)
                svc.refresh()
                uploads.append(iq.last_refresh_upload_bytes)
                k += 1

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(6)]
        upd = threading.Thread(target=updater)
        upd.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        done.set()
        upd.join(timeout=300)
        assert not errors, errors[:5]

        # every incremental refresh moved <= 1/P of the full upload
        # (touched: owner-of-node-0's out-CSR blocks + the edge-payload
        # tail block; everything else reuses the previous device buffers)
        assert uploads, "updater never refreshed"
        for up in uploads:
            assert up <= full_upload / 8, (up, full_upload)

        # and the updates are really visible after refresh: the streamed
        # edges (weights 50+k) dominate node 0's original <=8.0 weights,
        # so the topk answer is drawn from them, led by the heaviest
        out = np.asarray(svc.run(qid, [0])["h1"].ids)[0].tolist()
        assert set(out).issubset({42, 43, 44, 45, 46}), out
        assert (42 + len(uploads) - 1) in out, (out, len(uploads))
    finally:
        conf.storage_profile = prev_profile
        svc.close()


def test_model_predict_over_http(g, tmp_path):
    """POST /predict serves an exported sample+forward artifact by name —
    the role the reference delegates to an external TF-serving fleet fed
    by the Java client's predict module (gsl_client/.../predict/,
    examples/tf/serving/export_serving_model.py), collapsed into the
    worker: one StableHLO program answers raw-id predictions."""
    import jax
    import jax.numpy as jnp
    from graph_learn_tpu.gsl.compile import _execute
    from graph_learn_tpu.online.export import export_serving_fn
    from graph_learn_tpu.online.http import ServingClient, ServingServer

    q = (g.V("item").batch(4).alias("src")
         .outV("rel").sample(3).by("topk").alias("hop1")
         .values())
    tables = q.device_tables()

    def serve(seeds, key):
        out = _execute(q, tables, seeds, key)
        nbr = jnp.mean(out["hop1"].float_attrs, axis=1)
        return jnp.concatenate([out["src"].float_attrs, nbr], axis=-1)

    seeds = jnp.arange(4, dtype=jnp.int32)
    key = jax.random.key(0)
    path = str(tmp_path / "embed.stablehlo")
    blob = export_serving_fn(serve, (seeds, key), path=path)

    srv = ServingServer(g).start()
    try:
        c = ServingClient("http://%s:%d" % (srv.host, srv.port))
        r = c.install_model("embed", path)  # server-local path
        assert r == {"name": "embed", "batch": 4}
        got = np.asarray(c.predict("embed", [1, 2, 3]))
        want = np.asarray(serve(jnp.asarray([1, 2, 3, 1], jnp.int32),
                                jax.random.key(0)))[:3]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        # inline-bytes install (no shared filesystem needed)
        c.install_model("embed2", blob)
        got2 = np.asarray(c.predict("embed2", [5], seed=3))
        assert got2.shape == (1, 8)

        # error surfaces: unknown model / too many ids
        import urllib.error
        for bad in ({"model": "nope", "ids": [1]},
                    {"model": "embed", "ids": list(range(9))}):
            with pytest.raises(urllib.error.HTTPError):
                c._post("/predict", bad)
    finally:
        srv.stop()
