"""Data-source schema: Decoder, AttrDef, FeatureSpec, Mask.

Behavior parity with the reference schema layer
(reference: graphlearn/python/data/decoder.py:21-239,
python/data/feature_spec.py:22-125, python/utils.py:44-63 for masks), designed
for a shape-static TPU pipeline: the Decoder resolves, at graph-definition
time, exactly which dense device arrays a node/edge table will carry
(int attrs, float attrs, hashed-string attrs, multival offsets) so every
downstream jitted function sees fixed widths.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Sequence, Tuple, Union

from graph_learn_tpu.errors import InvalidArgumentError

AttrType = Union[str, Tuple]


class Mask(enum.Enum):
    """Train/val/test split selector.

    The reference loads splits as *virtual masked node types* by prefixing
    the type string (reference: python/utils.py:44-63, used graph.py:223).
    We keep the same trick so one logical node type can have several
    independently-traversable seed sets.
    """

    NONE = 0
    TRAIN = 1
    VAL = 2
    TEST = 3

    def decorate(self, type_name: str) -> str:
        if self == Mask.NONE:
            return type_name
        return "MASK" + "*" * self.value + type_name


class NodeFrom(enum.Enum):
    """Seed space selector for V() (reference pywrap.NodeFrom,
    python/graph.py:551-581): NODE iterates a node table/set, EDGE_SRC /
    EDGE_DST iterate the distinct src/dst nodes of an EDGE type."""

    NODE = 0
    EDGE_SRC = 1
    EDGE_DST = 2


def mask_type(type_name: str, mask: "Mask | str | None") -> str:
    if mask is None:
        return type_name
    if isinstance(mask, str):
        mask = Mask[mask.upper()]
    return mask.decorate(type_name)


@dataclasses.dataclass(frozen=True)
class AttrDef:
    """One resolved attribute column."""

    index: int  # position in attr_types
    type_name: str  # "int" | "float" | "string"
    bucket_size: Optional[int]  # hash bucket count, None = no hashing
    is_multival: bool  # comma-separated multi-value string
    dim: Optional[int]  # embedding dim (None/0 -> numeric passthrough)

    @property
    def is_numeric(self) -> bool:
        return (not self.is_multival and self.dim in (None, 0)
                and self.type_name in ("int", "float"))

    @property
    def is_embedding(self) -> bool:
        return not self.is_numeric


class Decoder:
    """Schema of a node/edge source.

    API-compatible with the reference ``gl.Decoder``
    (reference: python/data/decoder.py:27-110):

    - ``attr_types``: list of "int" | "float" | "string" |
      ("string", bucket) | ("string", bucket, True) | ("int", bucket).
    - ``attr_dims``: per-attr embedding dim (required for hashed attrs).
    - weighted / labeled / timestamped flags.

    Resolution for the TPU store: every attribute is materialised into one
    of three dense host->device arrays:

    - int columns  (``int`` numeric, plus hashed ``("int", b)`` /
      ``("string", b)`` / dynamic "string" columns: hashing happens at
      ingest, so the device only ever sees int32/int64 ids)
    - float columns (``float`` / ``int`` numeric)
    - multival columns (ragged -> padded [N, max_len] int32 + length)
    """

    def __init__(self,
                 weighted: bool = False,
                 labeled: bool = False,
                 timestamped: bool = False,
                 attr_types: Optional[Sequence[AttrType]] = None,
                 attr_delimiter: str = ":",
                 attr_dims: Optional[Sequence[Optional[int]]] = None,
                 multival_max_len: int = 8):
        self.weighted = bool(weighted)
        self.labeled = bool(labeled)
        self.timestamped = bool(timestamped)
        self.attr_delimiter = attr_delimiter
        self.multival_max_len = multival_max_len
        attr_types = list(attr_types or [])
        attr_dims = list(attr_dims) if attr_dims else [None] * len(attr_types)
        if len(attr_dims) != len(attr_types):
            raise InvalidArgumentError(
                "attr_dims size must equal attr_types size, got %d vs %d"
                % (len(attr_dims), len(attr_types)))
        self.attr_types = attr_types
        self.attr_dims = attr_dims
        self.attrs: List[AttrDef] = [
            self._resolve(i, t, d) for i, (t, d) in enumerate(zip(attr_types, attr_dims))
        ]
        self.attributed = bool(self.attrs)
        # Column layout (order of appearance, stable).
        # Embedding-id columns: hashed/bucketed ints and strings.
        self.int_attrs = [a for a in self.attrs
                          if not a.is_multival and a.is_embedding]
        # Numeric float columns include numeric ints (cast to float like the
        # reference's continuous tensors).
        self.float_attrs = [a for a in self.attrs if a.is_numeric]
        self.multival_attrs = [a for a in self.attrs if a.is_multival]

    @staticmethod
    def parse(attr_type: AttrType) -> Tuple[str, Optional[int], bool]:
        """Normalise one attr_types entry -> (type_name, bucket, multival)."""
        if isinstance(attr_type, str):
            return attr_type, None, False
        if isinstance(attr_type, (tuple, list)):
            items = list(attr_type) + [None] * (3 - len(attr_type))
            type_name, bucket, multival = items[0], items[1], bool(items[2])
            return type_name, bucket, multival
        raise InvalidArgumentError("invalid attr_type %r" % (attr_type,))

    def _resolve(self, index: int, attr_type: AttrType,
                 dim: Optional[int]) -> AttrDef:
        type_name, bucket, multival = self.parse(attr_type)
        if type_name not in ("int", "float", "string"):
            raise InvalidArgumentError("unknown attr type %r" % type_name)
        if type_name == "float" and (bucket or multival):
            raise InvalidArgumentError("float attrs take no bucket/multival")
        if multival and type_name != "string":
            raise InvalidArgumentError("multival only supported for string")
        if type_name == "string" and not multival and bucket is None and not dim:
            # plain string with no embedding: kept as hashed id column with
            # dynamic (unbounded) bucket — we hash to int64.
            pass
        if dim and type_name == "string" and bucket is None:
            # dynamic bucket embedding (PAI-TF in reference); we emulate with
            # a large fixed modulus chosen at feature-column build time.
            pass
        return AttrDef(index, type_name, bucket, multival, dim)

    # --- counts matching reference Decoder properties -----------------
    @property
    def int_attr_num(self) -> int:
        return len(self.int_attrs)

    @property
    def float_attr_num(self) -> int:
        return len(self.float_attrs)

    @property
    def multival_attr_num(self) -> int:
        return len(self.multival_attrs)

    @property
    def has_property(self) -> bool:
        return (self.weighted or self.labeled or self.timestamped
                or self.attributed)

    def feature_spec(self) -> "FeatureSpec":
        return FeatureSpec(self)

    def __repr__(self):
        return ("Decoder(weighted=%s, labeled=%s, timestamped=%s, attrs=%r)"
                % (self.weighted, self.labeled, self.timestamped, self.attrs))


class FeatureSpec:
    """Flattened view consumed by nn feature columns.

    Parity with reference FeatureSpec (python/data/feature_spec.py): a list
    of dense-numeric and embedding column descriptors in attribute order.
    """

    def __init__(self, decoder: Decoder):
        self.decoder = decoder
        self.numeric: List[AttrDef] = decoder.float_attrs
        self.embeddings: List[AttrDef] = decoder.int_attrs
        self.multivals: List[AttrDef] = decoder.multival_attrs

    @property
    def total_dim(self) -> int:
        d = len(self.numeric)
        for a in self.embeddings + self.multivals:
            d += a.dim or 0
        return d
