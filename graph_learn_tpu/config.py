"""Global configuration flags.

TPU-native re-design of the reference's ``GLOBAL_FLAG`` system
(reference: graphlearn/src/include/config.h:28-109, defaults in
common/base/config.cc:77-115, Python mirror python/config.py:23-127).

Unlike the reference (C++ globals mirrored through pybind setters), flags here
are a single Python dataclass-like registry.  Flags that only made sense for
the gRPC server stack (timeouts, retry counts, channel sizes) are kept where
they still have a meaning for the host-side pipeline, and dropped where the
capability is subsumed by XLA (e.g. thread-pool sizing -> XLA runtime).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class _Config:
    # --- data / ingest -------------------------------------------------
    # reference: config.h DataInitBatchSize (ingest request batch)
    data_init_batch_size: int = 10240
    # reference: config.h FieldDelimiter ("\t")
    field_delimiter: str = "\t"
    # reference: config.h Padding mode: 0 = replicate, 1 = circular
    padding_mode: int = 1
    # reference: config.h DefaultNeighborId (fill for zero-degree seeds)
    default_neighbor_id: int = 0
    # reference: config.h SamplingRetryTimes (filter rejection retries)
    sampling_retry_times: int = 5
    # reference: config.h DefaultFullNbrNum — cap for "full" neighbor
    # sampling.  On TPU this is also the static padded width of the
    # segment-CSR result, so it is shape-affecting.
    default_full_nbr_num: int = 100
    # reference: config.h DefaultIntAttribute / FloatAttribute / StringAttribute
    default_int_attr: int = 0
    default_float_attr: float = 0.0
    default_string_attr: str = ""
    # --- dataset / pipeline -------------------------------------------
    # reference: config.h DatasetCapacity (client prefetch ring)
    dataset_capacity: int = 10
    # reference: config.h TapeCapacity — subsumed by host prefetch depth
    tape_capacity: int = 10
    # --- device placement ---------------------------------------------
    # Store graph feature tables on device (HBM) vs host RAM.
    storage_device: str = "device"  # "device" | "host"
    # dtype for float features / activations on device
    feature_dtype: str = "float32"
    compute_dtype: str = "float32"
    # Route hop feature gathers (ops/lookup.py) and embedding_agg
    # (ops/aggregate.py) through the Pallas kernels in ops/pallas/
    # (hardware-validated; GLT_USE_PALLAS=1 bench.py exercises them on
    # the chip).  Default False: measured on TPU v5e, XLA's vectorised
    # row gather runs at ~75% of the 4KB-tile-traffic speed of light on
    # uniform-random access, while per-row DMA issue is bound at
    # ~50ns/row — the kernel path wins only in the locality-bucketed
    # regime (community graphs relabeled by core/reorder.py).  See
    # ops/pallas/dispatch.py.
    use_pallas: bool = False
    # --- distributed ---------------------------------------------------
    # sorted-gather group aggregation (ops/aggregate.py gather_group_agg):
    # gather deepest-hop feature rows in sorted index order + segment
    # reduce instead of gather + reshape-reduce.  Default OFF: measured on
    # real v5e at the 62M-edge frontier shapes (2.45M x 100 table, 153.6k
    # draws, examples/gather_micro.py), sorting the indices buys only
    # ~11% on the raw gather, argsort costs 1.25 ms, and XLA's
    # segment-sum scatter-add is slower than the entire plain
    # gather+reshape-mean — the rewrite nets 1.5x SLOWER.  Kept (exact,
    # tested) for locality regimes where sorted access does pay
    # (reordered community graphs, host backends).
    sorted_gather: bool = False
    sorted_gather_min_bytes: int = 32 << 20
    # number of graph shards (mesh axis 'graph'); 1 = single device store
    graph_shards: int = 1
    # partitioned-plan payload exchange: "owner" routes feature vectors to
    # owning shards with all_to_all (O(n*D) bytes over the axis, result
    # striped), "psum" replicates via the masked psum stitch (O(P*n*D))
    # — the reference's DistributeRunner owner routing vs broadcast
    # (core/runner/op_runner.h:60-152).  Both are exact.
    partition_routing: str = "owner"
    # owner-route bucket capacity factor: capacity per (sender, owner)
    # bucket = max(ceil(n/P^2 * factor) + 8, 8).  Overflow stays exact via
    # a psum fallback; larger factors trade bytes for fewer fallbacks.
    owner_route_capacity: float = 2.0
    # reference: config.h KnnMetric: 0 = L2, 1 = inner product
    knn_metric: int = 0
    # serving-tier shard capacity slack: the partitioned QueryService
    # builds its sharded tables with this much per-shard tail headroom so
    # streaming appends keep block layouts stable and refresh() re-uploads
    # only the shard blocks an update touched
    # (ShardedTables.replace_blocks; DGS applies per-record updates to
    # partitioned state, data_update_actor.act.h:29)
    serving_shard_slack: float = 1.25
    # --- misc ----------------------------------------------------------
    seed: int = 0
    # reference: config.h StorageMode (2 = compressed/CSR).  We are always
    # CSR; kept for API compat.
    storage_mode: int = 2
    # device table profile: "full" uploads every auxiliary table
    # (id-sorted copies for membership bisection, weight/in-degree CDFs,
    # reverse CSR, negative pools); "minimal" uploads only the forward CSR
    # + payload (~12B/edge vs ~56B/edge) for HBM-bound graphs — samplers
    # that need a missing table raise.
    storage_profile: str = "full"


conf = _Config()


def _make_setter(field: str):
    def setter(value):
        setattr(conf, field, value)

    setter.__name__ = "set_" + field
    return setter


# gl.set_* surface mirroring reference python/config.py.
set_field_delimiter = _make_setter("field_delimiter")
set_padding_mode = _make_setter("padding_mode")
set_default_neighbor_id = _make_setter("default_neighbor_id")
set_retry_times = _make_setter("sampling_retry_times")
set_default_full_nbr_num = _make_setter("default_full_nbr_num")
set_default_int_attribute = _make_setter("default_int_attr")
set_default_float_attribute = _make_setter("default_float_attr")
set_default_string_attribute = _make_setter("default_string_attr")
set_dataset_capacity = _make_setter("dataset_capacity")
set_tape_capacity = _make_setter("tape_capacity")
set_storage_mode = _make_setter("storage_mode")
set_knn_metric = _make_setter("knn_metric")
set_seed = _make_setter("seed")
set_use_pallas = _make_setter("use_pallas")
set_storage_device = _make_setter("storage_device")
set_graph_shards = _make_setter("graph_shards")
set_partition_routing = _make_setter("partition_routing")
