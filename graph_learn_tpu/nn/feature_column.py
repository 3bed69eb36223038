"""Feature encoding: raw attr columns -> dense float features.

Parity with the reference feature-column lattice
(reference: graphlearn/python/nn/tf/data/feature_column.py:34-299,
feature_handler.py:33-187): numeric passthrough, embedding columns for
bucketed int/string attrs, sparse (multival) embedding columns with mean
combiner, fused embedding option.

TPU redesign: embedding tables are flax params; the reference's
min_max_variable_partitioner over PS shards (feature_column.py:83-98) is
subsumed by sharding the embedding params over the device mesh
(parallel/mesh.py applies a sharding rule to params named 'embedding_*').
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.values import Nodes, SparseNodes

# modulus used for "dynamic bucket" (string attrs with no explicit bucket);
# reference uses PAI-TF dynamic embedding variables — we emulate with a
# large fixed hash space.
DYNAMIC_BUCKET = 1 << 20


class FeatureEncoder(nn.Module):
    """Encode one node type's attrs into [n, out_dim] floats.

    Column layout follows Decoder resolution (core/schema.py): numeric
    float columns pass through; int-id columns get embedding tables;
    multival columns get mean-pooled embeddings.
    """

    decoder: Decoder
    # force an output dim: adds a final Dense when set (used when numeric
    # attrs should be projected, reference FusedFeatureColumn behavior)
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, nodes) -> jax.Array:
        d = self.decoder
        feats = []
        if nodes.float_attrs is not None and d.float_attr_num:
            f = nodes.float_attrs
            feats.append(f.reshape((-1, f.shape[-1])))
        if nodes.int_attrs is not None and d.int_attr_num:
            ia = nodes.int_attrs.reshape((-1, nodes.int_attrs.shape[-1]))
            for col, a in enumerate(d.int_attrs):
                bucket = a.bucket_size or DYNAMIC_BUCKET
                dim = a.dim or 8
                emb = self.param(
                    "embedding_%d" % a.index,
                    nn.initializers.variance_scaling(1.0, "fan_out", "uniform"),
                    (bucket, dim))
                ids = jnp.clip(ia[:, col], 0, bucket - 1)
                feats.append(emb[ids])
        if nodes.multival_attrs is not None and d.multival_attr_num:
            mv = nodes.multival_attrs.reshape(
                (-1,) + nodes.multival_attrs.shape[-2:])
            ml = nodes.multival_lens.reshape((-1, nodes.multival_lens.shape[-1]))
            for col, a in enumerate(d.multival_attrs):
                bucket = a.bucket_size or DYNAMIC_BUCKET
                dim = a.dim or 8
                emb = self.param(
                    "embedding_mv_%d" % a.index,
                    nn.initializers.variance_scaling(1.0, "fan_out", "uniform"),
                    (bucket, dim))
                ids = jnp.clip(mv[:, col], 0, bucket - 1)  # [n, L]
                vecs = emb[ids]  # [n, L, dim]
                L = ids.shape[-1]
                mask = (jnp.arange(L)[None, :] < ml[:, col][:, None])
                s = jnp.sum(jnp.where(mask[..., None], vecs, 0.0), axis=1)
                cnt = jnp.maximum(ml[:, col][:, None], 1).astype(s.dtype)
                feats.append(s / cnt)  # mean combiner (feature_column.py)
        if not feats:
            raise ValueError("node type %r has no encodable attributes"
                             % getattr(nodes, "type_name", "?"))
        from graph_learn_tpu.config import conf as _conf
        compute = jnp.dtype(_conf.compute_dtype)
        feats = [f.astype(compute) if f.dtype != compute else f
                 for f in feats]
        out = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        if self.output_dim is not None:
            out = nn.Dense(self.output_dim, name="proj")(out)
        return out

    @staticmethod
    def out_dim(decoder: Decoder, output_dim: Optional[int] = None) -> int:
        if output_dim is not None:
            return output_dim
        dim = decoder.float_attr_num
        for a in decoder.int_attrs + decoder.multival_attrs:
            dim += a.dim or 8
        return dim
