"""EgoGraph convolution layers: SAGE / GAT / GIN / RGCN.

Math parity with the reference TF layers (shapes [batch, expand, dim],
dense reshape-reduce — the pattern XLA tiles perfectly onto the MXU/VPU):

- EgoSAGEConv: reference nn/tf/layers/ego_sage_conv.py:75-106
  (mean/sum/max aggregate neighbors -> concat with x -> Linear;
  'gcn' aggregates x together with neighbors then Linear)
- EgoGATConv: ego_gat_conv.py:84-119 (per-head: project x & nbrs,
  leaky-relu attention logits, softmax over expand, weighted sum;
  heads averaged)
- EgoGINConv: ego_gin_conv.py:80-99 (W((1+eps)x + sum nbrs))
- EgoRGCNConv: ego_rgcn_conv.py:85-150 (per-relation weights with
  basis/block decomposition, aggregated over relations + root weight)
- EgoLayer: ego_layer.py:41-94 (one conv per adjacent hop pair)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

InDim = Union[int, Tuple[int, int]]


def _pair(in_dim: InDim) -> Tuple[int, int]:
    if isinstance(in_dim, (tuple, list)):
        assert len(in_dim) == 2
        return tuple(in_dim)
    return (in_dim, in_dim)


class EgoSAGEConv(nn.Module):
    in_dim: InDim
    out_dim: int
    agg_type: str = "mean"  # mean | sum | max | gcn
    use_bias: bool = False

    # the aggregation this conv applies over the fanout axis — what a
    # pre-aggregated ``neighbor_agg`` must contain ('gcn' consumes a mean)
    @property
    def deferred_op(self) -> str:
        return "mean" if self.agg_type == "gcn" else self.agg_type

    @nn.compact
    def __call__(self, x, neighbor, expand, neighbor_agg=None):
        din = _pair(self.in_dim)
        if neighbor_agg is not None:
            # pre-aggregated neighbors (deferred-hop fast path): the
            # caller already reduced encoded rows with self.deferred_op
            if self.agg_type == "gcn":
                # mean over [k nbrs ++ x] == (k*mean_nbr + x) / (k+1)
                h = (expand * neighbor_agg + x) / (expand + 1.0)
                return nn.Dense(self.out_dim, use_bias=self.use_bias,
                                name="trans_nodes")(h)
            h = jnp.concatenate([x, neighbor_agg], axis=1)
            return nn.Dense(self.out_dim, use_bias=self.use_bias,
                            name="trans_nodes")(h)
        nbr = neighbor.reshape((-1, expand, din[1]))
        if self.agg_type == "gcn":
            # mean over [nbrs ++ x] then Linear (ego_sage_conv.py:84-88)
            h = jnp.concatenate([nbr, x[:, None, :]], axis=1)
            h = jnp.mean(h, axis=1)
            return nn.Dense(self.out_dim, use_bias=self.use_bias,
                            name="trans_nodes")(h)
        if self.agg_type == "mean":
            agg = jnp.mean(nbr, axis=1)
        elif self.agg_type == "sum":
            agg = jnp.sum(nbr, axis=1)
        elif self.agg_type == "max":
            agg = jnp.max(nbr, axis=1)
        else:
            raise ValueError("unknown agg_type %r" % self.agg_type)
        h = jnp.concatenate([x, agg], axis=1)
        return nn.Dense(self.out_dim, use_bias=self.use_bias,
                        name="trans_nodes")(h)


class EgoGATConv(nn.Module):
    """Multi-head ego attention, chunked over seeds.

    Math parity with the reference (ego_gat_conv.py:84-119): per head,
    project x & neighbors, score with leaky_relu(0.2) on attn([xt, nh]),
    softmax over the fanout, weighted-sum neighbors; heads averaged.
    The attn Dense on the concat splits linearly — xt @ a_l + nh @ a_r —
    so the broadcast concat is never materialised.

    TPU restructure (PERF.md "segment-softmax fusion" probe): the wide
    per-head neighbor projections ([b*e, heads*out] — ~1.3 GB at the
    62M-edge frontier width) dominate the step when they round-trip HBM.
    Chunking the project→score→softmax→weighted-sum block over
    ``seed_chunk`` seeds with ``lax.map`` keeps each chunk's projections
    on-chip — measured 1.8x forward at the frontier shape, beating even a
    hand-written Pallas kernel (6.52 vs 5.77 ms).  The mapped body is
    ``jax.checkpoint``ed so the backward recomputes the chunk projections
    instead of storing them as residuals (symmetric traffic win).
    Param names/trees are unchanged: x_%d / n_%d / attn_%d Dense layers.
    """

    in_dim: InDim
    out_dim: int
    num_head: int = 1
    use_bias: bool = False
    attn_dropout: float = 0.0
    # seed_chunk: None = AUTO (chunk at 256 only when the combined head
    # width is large enough that the projections spill — measured on the
    # 62M-edge frontier config, examples/gat_scale.py r5:
    #   hidden 256 x 8 heads: 256 -> 13.8M e/s, 512 -> 13.1M,
    #                         1024 -> 8.8M, unchunked -> 4.9M
    #   hidden 16 x 8 heads (reference width): unchunked 26.3M beats
    #                         chunked 19.3M — lax.map overhead with no
    #                         wide traffic to save);
    # 0 = never chunk; any int = explicit chunk size
    seed_chunk: Optional[int] = None

    _AUTO_CHUNK = 256
    _AUTO_MIN_WIDTH = 1024  # num_head * out_dim threshold for auto mode

    @nn.compact
    def __call__(self, x, neighbor, expand, training: bool = False):
        din = _pair(self.in_dim)
        is_homo = din[0] == din[1]
        H, W, e = self.num_head, self.out_dim, expand
        b = x.shape[0]
        neighbor = neighbor.reshape((b, e, din[1]))

        xh, wn, bn, al, ar, ba = [], [], [], [], [], []
        for i in range(H):
            x_layer = nn.Dense(W, use_bias=self.use_bias, name="x_%d" % i)
            xh.append(x_layer(x))  # [b, W]
            n_layer = x_layer if is_homo else nn.Dense(
                W, use_bias=self.use_bias, name="n_%d" % i)
            if not is_homo:
                n_layer(neighbor[:1, 0])  # create params; result DCE'd
            wn.append(n_layer.variables["params"]["kernel"])
            attn = nn.Dense(1, use_bias=self.use_bias, name="attn_%d" % i)
            attn(jnp.zeros((1, 2 * W), x.dtype))  # create params
            ak = attn.variables["params"]["kernel"]  # [2W, 1]
            al.append(ak[:W, 0])
            ar.append(ak[W:, 0])
            if self.use_bias:
                bn.append(n_layer.variables["params"]["bias"])
                ba.append(attn.variables["params"]["bias"][0])
        xh = jnp.stack(xh)  # [H, b, W]
        wn = jnp.stack(wn)  # [H, din, W]
        al, ar = jnp.stack(al), jnp.stack(ar)  # [H, W]
        bn = jnp.stack(bn)[:, None, :] if self.use_bias else None
        ba = jnp.stack(ba)[:, None, None] if self.use_bias else 0.0

        # el = xt @ a_l (+ x bias already inside xh): [H, b, 1]
        el = (xh * al[:, None, :]).sum(-1)[..., None]

        drop = None
        if self.attn_dropout and training:
            keep = 1.0 - self.attn_dropout
            drop = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (H, b, e)).astype(x.dtype) \
                / keep

        def block(nbr_c, el_c, drop_c):
            # nbr_c [S, e, din] -> per-head projections stay chunk-local
            S = nbr_c.shape[0]
            nh = jnp.einsum("nd,hdw->hnw", nbr_c.reshape(S * e, din[1]), wn)
            if bn is not None:
                nh = nh + bn
            er = (nh * ar[:, None, :]).sum(-1).reshape(H, S, e)
            # TF's leaky_relu default alpha is 0.2 (flax defaults to 0.01)
            logits = nn.leaky_relu(el_c + er + ba, 0.2)
            coef = jax.nn.softmax(logits, axis=2)  # [H, S, e]
            if drop_c is not None:
                coef = coef * drop_c
            return (coef[..., None] * nh.reshape(H, S, e, W)).sum(axis=2)

        S = self.seed_chunk
        if S is None:
            wide = self.num_head * self.out_dim >= self._AUTO_MIN_WIDTH
            S = self._AUTO_CHUNK if wide else 0
        if not S or b <= S:
            out = block(neighbor, el, drop)  # [H, b, W]
        else:
            nb = -(-b // S)
            pad = nb * S - b

            def padded(t, axis):
                if pad == 0:
                    return t
                widths = [(0, 0)] * t.ndim
                widths[axis] = (0, pad)
                return jnp.pad(t, widths)

            nbr_p = padded(neighbor, 0).reshape(nb, S, e, din[1])
            el_p = padded(el, 1).reshape(H, nb, S, 1).transpose(1, 0, 2, 3)
            if drop is None:
                ops = (nbr_p, el_p)
                body = jax.checkpoint(lambda o: block(o[0], o[1], None))
            else:
                dr_p = padded(drop, 1).reshape(H, nb, S, e).transpose(
                    1, 0, 2, 3)
                ops = (nbr_p, el_p, dr_p)
                body = jax.checkpoint(lambda o: block(*o))
            out = jax.lax.map(body, ops)  # [nb, H, S, W]
            out = out.transpose(1, 0, 2, 3).reshape(H, nb * S, W)[:, :b]
        return jnp.mean(out, axis=0)


class EgoGINConv(nn.Module):
    in_dim: InDim
    out_dim: int
    eps: float = 0.0
    use_bias: bool = False

    deferred_op = "sum"

    @nn.compact
    def __call__(self, x, neighbor, expand, neighbor_agg=None):
        din = _pair(self.in_dim)
        if neighbor_agg is not None:
            agg = neighbor_agg
        else:
            nbr = neighbor.reshape((-1, expand, din[1]))
            agg = jnp.sum(nbr, axis=1)
        if din[0] != din[1]:
            x = nn.Dense(self.out_dim, use_bias=self.use_bias,
                         name="trans_x")((1.0 + self.eps) * x)
            agg = nn.Dense(self.out_dim, use_bias=self.use_bias,
                           name="trans_nbrs")(agg)
            return nn.Dense(self.out_dim, use_bias=self.use_bias,
                            name="output")(x + agg)
        # NOTE reference parity: for equal dims the reference applies NO
        # (1+eps) factor (ego_gin_conv.py:92-99 only scales x inside the
        # trans branch) — matched here, activations allclose.
        return nn.Dense(self.out_dim, use_bias=self.use_bias,
                        name="output")(x + agg)


class EgoRGCNConv(nn.Module):
    """Multi-relation conv; ``neighbor`` is a list of per-relation tensors.

    Weight shapes match the reference exactly (ego_rgcn_conv.py:85-101):
    bases [B, in, out] + coefficient [R, B]; blocks [R, nb, in/nb, out/nb];
    else [R, in, out]; separate root Linear.  Relations are batched into a
    single einsum over the relation axis — the TPU-native "expert parallel"
    formulation (one big MXU contraction instead of R small ones).
    """

    in_dim: InDim
    out_dim: int
    num_relations: int
    num_bases: Optional[int] = None
    num_blocks: Optional[int] = None
    agg_type: str = "mean"
    use_bias: bool = False

    # the per-relation fanout reduction this conv applies — what
    # pre-aggregated ``neighbors_agg`` entries must contain
    @property
    def deferred_op(self) -> str:
        return self.agg_type

    @nn.compact
    def __call__(self, x, neighbors: Optional[Sequence[jax.Array]], expand,
                 neighbors_agg: Optional[Sequence[jax.Array]] = None):
        din = _pair(self.in_dim)
        R, I, O = self.num_relations, din[1], self.out_dim

        def agg(t):
            t = t.reshape((-1, expand, I))
            if self.agg_type == "mean":
                return jnp.mean(t, axis=1)
            if self.agg_type == "sum":
                return jnp.sum(t, axis=1)
            return jnp.max(t, axis=1)

        if neighbors_agg is not None:
            # per-relation pre-reduced neighbors (deferred deepest-hop
            # fast path, same contract as EgoSAGEConv.neighbor_agg)
            assert len(neighbors_agg) == R
            h = jnp.stack(list(neighbors_agg), axis=0)  # [R, b, I]
        else:
            assert len(neighbors) == R
            h = jnp.stack([agg(n) for n in neighbors], axis=0)  # [R, b, I]

        init = nn.initializers.lecun_normal()
        if self.num_bases is not None:
            basis = self.param("weight", init, (self.num_bases, I, O))
            coeff = self.param("coefficient", init, (R, self.num_bases))
            w = jnp.einsum("rb,bio->rio", coeff, basis)
            out = jnp.einsum("rbi,rio->rbo", h, w)
        elif self.num_blocks is not None:
            nb = self.num_blocks
            assert I % nb == 0 and O % nb == 0
            w = self.param("weight", init, (R, nb, I // nb, O // nb))
            hb = h.reshape((R, -1, nb, I // nb))
            out = jnp.einsum("rbni,rnio->rbno", hb, w).reshape((R, -1, O))
        else:
            w = self.param("weight", init, (R, I, O))
            out = jnp.einsum("rbi,rio->rbo", h, w)
        out = jnp.sum(out, axis=0)  # sum over relations (ego_rgcn_conv.py:141)
        out = out + nn.Dense(O, use_bias=False, name="root_weight")(x)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (O,))
        return out


class EgoLayer(nn.Module):
    """Apply conv i to hop pair (i-1, i): h_out[i] = conv_i(h[i], h[i+1]).

    ``share`` replicates ONE conv's params across all pairs of this layer
    (reference parameter sharing: EgoLayer([conv] * n), ego_sage.py:50-63).
    """

    convs: Sequence[nn.Module]
    share: bool = True

    def __call__(self, x_list, expands, deep_agg=None, **kwargs):
        # deep_agg: the DEEPEST hop's features arrive pre-aggregated
        # (deferred-payload fast path, nn/models/ego_gnn.py) — x_list is
        # then one entry short and the last conv consumes the aggregate
        n_pairs = len(expands)
        assert len(x_list) == n_pairs + (deep_agg is None)
        out = []
        for i in range(n_pairs):
            conv = self.convs[0] if self.share else self.convs[i]
            if deep_agg is not None and i == n_pairs - 1:
                out.append(conv(x_list[i], None, expands[i],
                                neighbor_agg=deep_agg, **kwargs))
            else:
                out.append(conv(x_list[i], x_list[i + 1], expands[i],
                                **kwargs))
        return out
