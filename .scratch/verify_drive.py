"""Verify drive: user-style end-to-end at the package boundary."""
import os, tempfile, numpy as np
import graph_learn_tpu as gl

d = tempfile.mkdtemp()
n = 30
with open(os.path.join(d, "nodes"), "w") as f:
    f.write("id:int64\tlabel:int64\tfeature:string\n")
    for i in range(n):
        f.write("%d\t%d\t%s\n" % (i, i % 3, ":".join("%.2f" % ((i + j) % 5) for j in range(4))))
with open(os.path.join(d, "edges"), "w") as f:
    f.write("src_id:int64\tdst_id:int64\tweight:float\n")
    for i in range(n):
        for j in range(1 + i % 4):
            f.write("%d\t%d\t%.1f\n" % (i, (i * 7 + j) % n, j + 1.0))
with open(os.path.join(d, "train"), "w") as f:
    f.write("id:int64\tweight:float\n")
    for i in range(0, n, 3):
        f.write("%d\t1.0\n" % i)

g = (gl.Graph()
     .node(os.path.join(d, "nodes"), "paper",
           gl.Decoder(labeled=True, attr_types=["float"] * 4))
     .edge(os.path.join(d, "edges"), ("paper", "paper", "cites"),
           gl.Decoder(weighted=True), directed=False)
     .node(os.path.join(d, "train"), "paper",
           gl.Decoder(weighted=True), mask=gl.Mask.TRAIN)
     .init())
print("stats:", g.get_stats())
print("degrees:", g.out_degrees(np.array([0, 1, 2]), "cites"))

q = (g.V("paper", mask=gl.Mask.TRAIN).batch(4).shuffle().alias("src")
     .outV("cites").sample(3).by("edge_weight").alias("hop1")
     .outV("cites").sample(2).by("random").alias("hop2").values())
ds = gl.Dataset(q)
b = ds.next()
print("src ids:", np.asarray(b["src"].ids))
assert np.asarray(b["hop1"].ids).shape == (4, 3)
assert np.asarray(b["hop2"].ids).shape == (4, 3, 2)

# serving tier with the NEW coalescer/COW path, through real HTTP
from graph_learn_tpu.online.http import ServingClient, ServingServer
srv = ServingServer(g).start()
try:
    c = ServingClient("http://%s:%d" % (srv.host, srv.port))
    q2 = (g.V("paper").batch(4).alias("src")
          .outV("cites").sample(3).by("topk").alias("h").values())
    qid = c.install(q2, micro_batch=16)
    out = c.run(qid, [0, 1, 2, 3, 4])
    assert len(out["src"]["ids"]) == 5 and len(out["h"]["ids"][0]) == 3
    c.update(edges={"cites": {"src_ids": [0, 0], "dst_ids": [20, 21],
                              "weights": [9.0, 8.0]}})
    c.refresh()
    out2 = c.run(qid, [0])
    assert {20, 21} <= set(out2["h"]["ids"][0]), out2["h"]["ids"]
    print("serving stats:", c.stats(qid))
finally:
    srv.stop()

# error probes
try:
    g.store.node_table("nope")
    raise SystemExit("expected NotFoundError")
except gl.NotFoundError:
    pass
try:
    bad = gl.Graph().node(os.path.join(d, "nodes"), "x",
                          gl.Decoder(labeled=True, attr_types=["float"] * 9))
    bad.init()
    raise SystemExit("expected InvalidArgumentError")
except gl.InvalidArgumentError:
    pass
print("VERIFY OK")

# C++ client boundary (if built at /tmp/gslc)
import subprocess, json as _json
if os.path.exists("/tmp/gslc"):
    srv2 = ServingServer(g).start()
    try:
        r = subprocess.run(["/tmp/gslc", "drive", srv2.host, str(srv2.port),
                            "paper", "cites", "0", "1", "2"],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        out = _json.loads(r.stdout)
        assert len(out["h1"]["ids"]) == 3
        print("CPP CLIENT OK")
    finally:
        srv2.stop()

# remote-filesystem boundary: ingest the same tables over http://
import functools, http.server, threading
os.environ.setdefault("GLT_FS_CACHE", tempfile.mkdtemp())
h = functools.partial(http.server.SimpleHTTPRequestHandler, directory=d)
httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), h)
threading.Thread(target=httpd.serve_forever, daemon=True).start()
base = "http://127.0.0.1:%d" % httpd.server_address[1]
g2 = (gl.Graph()
      .node(base + "/nodes", "paper",
            gl.Decoder(labeled=True, attr_types=["float"] * 4))
      .edge(base + "/edges", ("paper", "paper", "cites"),
            gl.Decoder(weighted=True))
      .init())
assert g2.get_stats()["nodes"]["paper"] == 30
httpd.shutdown()
print("HTTP FS OK")
