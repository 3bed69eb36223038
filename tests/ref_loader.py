"""Load the REFERENCE's TF layer modules without its pywrap C extension.

BASELINE.json requires per-layer activations allclose vs the reference;
these tests run the reference's own TF code (read-only from
/root/reference) against our JAX layers with identical weights.  Only the
leaf nn modules are loaded — the graphlearn package __init__ chain (which
imports the compiled pywrap extension) is bypassed with stub parents.
"""

import importlib.util
import sys
import types

REF = "/root/reference/graphlearn/python/nn/tf"

_PARENTS = [
    "graphlearn", "graphlearn.python", "graphlearn.python.nn",
    "graphlearn.python.nn.tf", "graphlearn.python.nn.tf.layers",
    "graphlearn.python.nn.tf.utils",
]

# leaf modules in dependency order: name -> path
_LEAVES = {
    "graphlearn.python.nn.tf.module": REF + "/module.py",
    "graphlearn.python.nn.tf.config": REF + "/config.py",
    "graphlearn.python.nn.tf.layers.linear_layer": REF + "/layers/linear_layer.py",
    "graphlearn.python.nn.tf.layers.ego_layer": REF + "/layers/ego_layer.py",
    "graphlearn.python.nn.tf.layers.sub_conv": REF + "/layers/sub_conv.py",
    "graphlearn.python.nn.tf.utils.softmax": REF + "/utils/softmax.py",
    "graphlearn.python.nn.tf.layers.ego_sage_conv": REF + "/layers/ego_sage_conv.py",
    "graphlearn.python.nn.tf.layers.ego_gat_conv": REF + "/layers/ego_gat_conv.py",
    "graphlearn.python.nn.tf.layers.ego_gin_conv": REF + "/layers/ego_gin_conv.py",
    "graphlearn.python.nn.tf.layers.ego_rgcn_conv": REF + "/layers/ego_rgcn_conv.py",
    "graphlearn.python.nn.tf.layers.sage_conv": REF + "/layers/sage_conv.py",
    "graphlearn.python.nn.tf.layers.gcn_conv": REF + "/layers/gcn_conv.py",
    "graphlearn.python.nn.tf.layers.gat_conv": REF + "/layers/gat_conv.py",
    "graphlearn.python.nn.tf.loss": REF + "/loss.py",
}

_loaded = False


def load_reference_layers():
    """Returns the dict of loaded reference modules (cached)."""
    global _loaded
    if not _loaded:
        for name in _PARENTS:
            if name not in sys.modules:
                pkg = types.ModuleType(name)
                pkg.__path__ = []
                sys.modules[name] = pkg
        for name, path in _LEAVES.items():
            if name in sys.modules:
                continue
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
        _loaded = True
    return {k.rsplit(".", 1)[-1]: sys.modules[k] for k in _LEAVES}
