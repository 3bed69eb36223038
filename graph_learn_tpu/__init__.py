"""graph_learn_tpu: a TPU-native GNN framework with graph-learn's capabilities.

Built from scratch for JAX/XLA/Pallas/pjit: GSL queries compile to jitted
gather kernels over an HBM-resident CSR store; aggregation runs as
Pallas/XLA segment kernels; multi-host graphs are edge-partitioned over a
device mesh with halo exchange over ICI.

Public surface mirrors ``import graphlearn as gl``
(reference: graphlearn/python/__init__.py).
"""

from graph_learn_tpu import config
from graph_learn_tpu.config import (conf, set_default_full_nbr_num,
                                    set_default_neighbor_id,
                                    set_dataset_capacity,
                                    set_field_delimiter, set_knn_metric,
                                    set_padding_mode, set_retry_times,
                                    set_seed, set_storage_device,
                                    set_tape_capacity, set_use_pallas)
from graph_learn_tpu.core.filesystem import register_filesystem
from graph_learn_tpu.core.schema import (Decoder, FeatureSpec, Mask,
                                         NodeFrom)
from graph_learn_tpu.core.values import (Edges, Nodes, SparseEdges,
                                         SparseNodes, SubGraphVal)
from graph_learn_tpu.errors import (GLError, InvalidArgumentError,
                                    NotFoundError, OutOfRangeError,
                                    UnimplementedError)
from graph_learn_tpu.graph import Graph
from graph_learn_tpu.gsl.dataset import Dataset
from graph_learn_tpu import sampler_api as _sampler_api  # attaches g.*_sampler
from graph_learn_tpu.ops.knn import KnnOption
from graph_learn_tpu.ops.sampling import register_sampler

__version__ = "0.1.0"

__all__ = [
    "Graph", "Dataset", "Decoder", "FeatureSpec", "Mask", "NodeFrom",
    "register_filesystem", "register_sampler", "KnnOption", "conf",
    "Nodes", "Edges", "SparseNodes", "SparseEdges", "SubGraphVal",
    "GLError", "OutOfRangeError", "InvalidArgumentError", "NotFoundError",
    "UnimplementedError",
]
