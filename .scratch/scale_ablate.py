"""62M-edge step ablation on the real chip: where do the 3.6 ms go?"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from graph_learn_tpu.utils.platform import ensure_platform
ensure_platform()

import jax, jax.numpy as jnp, numpy as np, optax
import graph_learn_tpu as gl
from graph_learn_tpu.config import conf
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.store import EdgeTable, NodeTable
from graph_learn_tpu.graph import Graph
from graph_learn_tpu.gsl.compile import _execute
from graph_learn_tpu.nn.data import EgoGraph
from graph_learn_tpu.nn.loss import supervised_softmax_loss
from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE

conf.storage_profile = "minimal"
if os.environ.get("GLT_BF16") == "1":
    conf.feature_dtype = "bfloat16"
n, e, d, classes = 2_450_000, 62_000_000, 100, 47
b, k1, k2 = 1024, 15, 10
rng = np.random.default_rng(0)
t0 = time.time()
node_dec = Decoder(labeled=True, attr_types=["float"] * d)
g = Graph()
nt = NodeTable("item", node_dec, np.arange(n, dtype=np.int64),
               float_attrs=rng.standard_normal((n, d)).astype(np.float32),
               labels=rng.integers(0, classes, n).astype(np.int32))
g.store.add_node_table(nt)
et = EdgeTable("rel", "item", "item", Decoder(),
               src=rng.integers(0, n, e), dst=rng.integers(0, n, e),
               num_src_nodes=n, num_dst_nodes=n)
g.store.add_edge_table(et)
g._node_decoders["item"] = node_dec
g._initialized = True
print("host build %.1fs" % (time.time() - t0), flush=True)

q = (g.V("item").batch(b).alias("src")
     .outV("rel").sample(k1).by("random").alias("hop1")
     .outV("rel").sample(k2).by("random").alias("hop2").values())
t0 = time.time()
tables = q.device_tables()
jax.block_until_ready(tables)
print("tables on device %.1fs (%.2f GB)" % (
    time.time() - t0,
    sum(x.nbytes for x in jax.tree.leaves(tables)) / 1e9), flush=True)

model = EgoGraphSAGE([d, 256, classes], node_dec, agg_type="gcn")
ds = gl.Dataset(q, window=1)
b0 = ds.next()
ego0 = EgoGraph.from_query_result(b0, "src", ["hop1", "hop2"])
params = model.init(jax.random.key(0), ego0, training=False)
opt = optax.adam(1e-3)
opt_state = opt.init(params)
K = 50


def scan_run(name, body, reps=3):
    @jax.jit
    def run(key):
        def one(c, k):
            return c + body(k), 0
        c, _ = jax.lax.scan(one, 0.0, jax.random.split(key, K))
        return c
    _ = float(run(jax.random.key(9)))
    t0 = time.perf_counter()
    for i in range(reps):
        _ = float(run(jax.random.key(i)))
    dt = (time.perf_counter() - t0) / (reps * K) * 1e3
    print("%-36s %8.3f ms/step" % (name, dt), flush=True)
    return dt


base = scan_run("baseline (seeds only)",
                lambda k: jnp.sum(jax.random.randint(
                    k, (b,), 0, n).astype(jnp.float32)) * 0)


def sample_only(k):
    ks, ksd = jax.random.split(k)
    seeds = jax.random.randint(ksd, (b,), 0, n)
    batch = _execute(q, tables, seeds, ks)
    return jnp.sum(batch["hop2"].ids.astype(jnp.float32)) * 0

s = scan_run("sampling only (ids, payload DCE'd)", sample_only)


def sample_feats(k):
    ks, ksd = jax.random.split(k)
    seeds = jax.random.randint(ksd, (b,), 0, n)
    batch = _execute(q, tables, seeds, ks)
    return (jnp.sum(batch["hop2"].float_attrs.astype(jnp.float32))
            + jnp.sum(batch["hop1"].float_attrs.astype(jnp.float32))
            + jnp.sum(batch["src"].float_attrs.astype(jnp.float32))) * 0

sf = scan_run("sampling + feature gathers", sample_feats)


def sample_feats_raw(k):
    ks, ksd = jax.random.split(k)
    seeds = jax.random.randint(ksd, (b,), 0, n)
    batch = _execute(q, tables, seeds, ks)
    return (jnp.sum(batch["hop2"].float_attrs.astype(jnp.float32))
            + jnp.sum(batch["hop2"].raw_ids.astype(jnp.float32))
            + jnp.sum(batch["hop2"].labels.astype(jnp.float32))) * 0



state = {"p": params, "o": opt_state}

def full(k):
    ks, km, ksd = jax.random.split(k, 3)
    seeds = jax.random.randint(ksd, (b,), 0, n)
    batch = _execute(q, tables, seeds, ks)
    def lf(pp):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model.apply(pp, ego, training=True, rngs={"dropout": km})
        return supervised_softmax_loss(logits, batch["src"].labels)
    loss, grads = jax.value_and_grad(lf)(state["p"])
    return loss

f = scan_run("full step (fwd+bwd, no update)", full)
print("net: sampling %.2f  feats %.2f  model %.2f (over baseline %.2f)"
      % (s - base, sf - s, f - sf, base), flush=True)
