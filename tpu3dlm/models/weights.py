"""Checkpoint conversion: torch state-dicts → Flax variables.

Supports the two finetuned checkpoints the reference pipeline loads:
* ultralytics YOLOv10 ``best.pt`` (src/detector/detector.py:36) via
  `convert_yolov10_state_dict` — key scheme "model.{i}.<module-path>" with
  Sequential indices, mapped mechanically onto the Flax module names
  (layers.py mirrors the naming);
* HF BEiT classification repos (src/damage/classifier.py:32-35) via
  `convert_beit_state_dict`.

Both converters take a plain ``dict[str, np.ndarray]`` so no torch import is
required at conversion time; `load_torch_state_dict` handles reading a .pt /
.bin / .safetensors file when torch is available.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


class _StubModules:
    """sys.modules shim so ultralytics .pt checkpoints unpickle WITHOUT the
    ultralytics package installed.

    Ultralytics .pt files pickle model *objects* (e.g.
    ``ultralytics.nn.tasks.DetectionModel``), so a plain ``torch.load``
    raises ModuleNotFoundError when the package is absent. Pickle never
    calls ``__init__`` — it only looks the class up and restores
    ``__dict__`` — so a dynamically-created ``nn.Module`` subclass is a
    faithful stand-in: the restored ``_parameters/_modules/_buffers`` make
    ``state_dict()`` work exactly. The shim fabricates such classes for any
    missing ``ultralytics*`` module on demand and removes itself afterwards.
    """

    PREFIXES = ("ultralytics",)

    def __init__(self):
        self._installed: list[str] = []

    def __enter__(self):
        import importlib.machinery
        import sys
        import types

        import torch

        def make_module(name: str) -> types.ModuleType:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
            mod.__path__ = []  # package, so submodules can import under it

            def __getattr__(attr, _name=name):
                if attr.startswith("__") and attr.endswith("__"):
                    raise AttributeError(attr)
                # submodule access (ultralytics.nn → ultralytics.nn.tasks)
                # resolves through sys.modules; class access fabricates a
                # pickle-compatible nn.Module subclass
                sub = f"{_name}.{attr}"
                if sub in sys.modules:
                    return sys.modules[sub]
                cls = type(attr, (torch.nn.Module,), {"__module__": _name})
                return cls

            mod.__getattr__ = __getattr__
            return mod

        import sys as _sys

        # pre-create the roots; deeper modules materialise lazily via pickle's
        # find_class → importlib.import_module, which we intercept by
        # registering a meta-path loader
        class MetaLoader:
            def find_spec(self, fullname, path=None, target=None):
                if any(
                    fullname == p or fullname.startswith(p + ".")
                    for p in _StubModules.PREFIXES
                ) and fullname not in _sys.modules:
                    import importlib.machinery
                    import importlib.util

                    return importlib.util.spec_from_loader(fullname, self)
                return None

            def create_module(self, spec):
                m = make_module(spec.name)
                self_installed.append(spec.name)
                return m

            def exec_module(self, module):
                pass

        self_installed = self._installed
        self._meta = MetaLoader()
        _sys.meta_path.insert(0, self._meta)
        return self

    def __exit__(self, *exc):
        import sys

        sys.meta_path.remove(self._meta)
        for name in self._installed:
            sys.modules.pop(name, None)
        return False


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint file into a {key: ndarray} dict.

    Handles raw state-dicts, {"state_dict": ...} wrappers, and ultralytics-
    style {"model": nn.Module} object checkpoints — the latter unpickle even
    without the ultralytics package via the `_StubModules` shim (pickle only
    needs a class with the right name; state_dict() reads the restored
    module tree).
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    with _StubModules():
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        obj = obj["model"].state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().float().cpu().numpy() for k, v in obj.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch (O, I/g, kh, kw) → flax (kh, kw, I/g, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# YOLOv10 (ultralytics naming)
# ---------------------------------------------------------------------------

_DETECT_BRANCH = {
    "cv2": ("detect_o2m", "cv2"),
    "cv3": ("detect_o2m", "cv3"),
    "one2one_cv2": ("detect_o2o", "cv2"),
    "one2one_cv3": ("detect_o2o", "cv3"),
}


def convert_yolov10_state_dict(
    sd: Mapping[str, np.ndarray], detect_layer_index: int = 23
) -> dict:
    """ultralytics YOLOv10 state-dict → flax {"params": ..., "batch_stats": ...}.

    Key scheme examples:
      model.0.conv.weight                  → params/m0/conv/kernel
      model.2.m.0.cv1.bn.running_mean      → batch_stats/m2/m_0/cv1/bn/mean
      model.23.one2one_cv2.1.0.conv.weight → params/detect_o2o/cv2_1_0/conv/kernel
    The DFL projection (model.23.dfl.*) is a fixed arange kernel we decode
    functionally — it is skipped.
    """
    params: dict = {}
    stats: dict = {}
    for key, val in sd.items():
        toks = key.split(".")
        if toks[0] == "model":
            toks = toks[1:]
        if not toks or not toks[0].isdigit():
            continue
        layer = int(toks[0])
        rest = toks[1:]
        if layer == detect_layer_index:
            if rest[0] == "dfl":
                continue
            scope, branch = _DETECT_BRANCH[rest[0]]
            # join the Sequential indices: cv2.1.0 → cv2_1_0
            name = branch
            i = 1
            while i < len(rest) and rest[i].isdigit():
                name += f"_{rest[i]}"
                i += 1
            path = [scope, name] + rest[i:]
        else:
            path = [f"m{layer}"]
            for t in rest:
                if t.isdigit():
                    path[-1] = f"{path[-1]}_{t}"
                else:
                    path.append(t)
        _route_leaf(path, np.asarray(val), params, stats)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# BEiT (HF naming)
# ---------------------------------------------------------------------------


def convert_beit_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """HF BeitForImageClassification state-dict → flax {"params": ...}.

    Raises on any weight tensor the mapping doesn't cover (other than the
    known inference-irrelevant buffers): silently dropping keys converted
    structurally-incompatible checkpoints (absolute position embeddings,
    shared relative-position bias) "successfully" with weights missing —
    every classification then wrong with no error.
    """
    # buffers/params with no inference-time counterpart in the Flax model
    _IGNORED = (
        re.compile(r"relative_position_index$"),  # constant index buffer
        re.compile(r"beit\.embeddings\.mask_token$"),  # MIM-pretrain only
    )
    p: dict = {}
    unconverted: list[str] = []
    for key, val in sd.items():
        v = np.asarray(val)
        if key == "beit.embeddings.cls_token":
            _set(p, ["cls_token"], v)
        elif key == "beit.embeddings.patch_embeddings.projection.weight":
            _set(p, ["patch_embed", "kernel"], _conv_kernel(v))
        elif key == "beit.embeddings.patch_embeddings.projection.bias":
            _set(p, ["patch_embed", "bias"], v)
        elif key == "beit.pooler.layernorm.weight":
            _set(p, ["pool_ln", "scale"], v)
        elif key == "beit.pooler.layernorm.bias":
            _set(p, ["pool_ln", "bias"], v)
        elif key == "beit.layernorm.weight":
            _set(p, ["final_ln", "scale"], v)
        elif key == "beit.layernorm.bias":
            _set(p, ["final_ln", "bias"], v)
        elif key == "classifier.weight":
            _set(p, ["classifier", "kernel"], v.T)
        elif key == "classifier.bias":
            _set(p, ["classifier", "bias"], v)
        else:
            m = re.match(r"beit\.encoder\.layer\.(\d+)\.(.+)", key)
            if not m:
                if not any(rx.search(key) for rx in _IGNORED):
                    unconverted.append(key)
                continue
            layer, rest = f"layer{m.group(1)}", m.group(2)
            mapping = {
                "layernorm_before.weight": (["ln1", "scale"], None),
                "layernorm_before.bias": (["ln1", "bias"], None),
                "layernorm_after.weight": (["ln2", "scale"], None),
                "layernorm_after.bias": (["ln2", "bias"], None),
                "lambda_1": (["lambda_1"], None),
                "lambda_2": (["lambda_2"], None),
                "attention.attention.query.weight": (["attn", "query", "kernel"], "T"),
                "attention.attention.query.bias": (["attn", "query", "bias"], None),
                "attention.attention.key.weight": (["attn", "key", "kernel"], "T"),
                "attention.attention.value.weight": (["attn", "value", "kernel"], "T"),
                "attention.attention.value.bias": (["attn", "value", "bias"], None),
                "attention.output.dense.weight": (["attn", "output", "kernel"], "T"),
                "attention.output.dense.bias": (["attn", "output", "bias"], None),
                "attention.attention.relative_position_bias.relative_position_bias_table": (
                    ["attn", "relative_position_bias_table"],
                    None,
                ),
                "intermediate.dense.weight": (["fc1", "kernel"], "T"),
                "intermediate.dense.bias": (["fc1", "bias"], None),
                "output.dense.weight": (["fc2", "kernel"], "T"),
                "output.dense.bias": (["fc2", "bias"], None),
            }
            if rest in mapping:
                path, op = mapping[rest]
                _set(p, [layer] + path, v.T if op == "T" else v)
            elif not any(rx.search(key) for rx in _IGNORED):
                unconverted.append(key)
    if unconverted:
        raise ValueError(
            "BEiT checkpoint carries weights this converter has no mapping "
            f"for (structurally incompatible config?): {unconverted[:8]}"
            + (" ..." if len(unconverted) > 8 else "")
        )
    return {"params": p}


def quantize_beit_variables(variables: Mapping) -> dict:
    """Float BEiT variables → int8 variables for ``BeitConfig(quant="int8")``.

    Every encoder Dense kernel (attn q/k/v/output, fc1, fc2 — the paths
    ``models/beit.py::_encoder_dense`` reroutes) is replaced by
    ``kernel_q`` int8 + per-output-channel ``scale`` (ops/quant.py).
    Biases, LayerNorms, layer scales, patch embed, relative-position
    tables, and the classifier head pass through untouched. Idempotent-
    safe: refuses a tree that is already quantized.
    """
    import jax.numpy as jnp

    from tpu3dlm.ops.quant import quantize_weight

    def walk(tree: Mapping, path: tuple) -> dict:
        out: dict = {}
        for k, v in tree.items():
            if isinstance(v, Mapping):
                if "kernel_q" in v:
                    raise ValueError(
                        f"quantize_beit_variables: {'/'.join(path + (k,))} "
                        "is already int8-quantized"
                    )
                # layer{i}/fc1, layer{i}/fc2, layer{i}/attn/{query,key,value,output}
                is_enc_dense = (
                    k in ("fc1", "fc2")
                    and path
                    and path[-1].startswith("layer")
                ) or (
                    k in ("query", "key", "value", "output")
                    and len(path) >= 2
                    and path[-1] == "attn"
                    and path[-2].startswith("layer")
                )
                if is_enc_dense and "kernel" in v:
                    wq, scale = quantize_weight(jnp.asarray(v["kernel"]))
                    q = {"kernel_q": wq, "scale": scale}
                    if "bias" in v:
                        q["bias"] = jnp.asarray(v["bias"], jnp.float32)
                    out[k] = q
                else:
                    out[k] = walk(v, path + (k,))
            else:
                out[k] = v
        return out

    return walk(dict(variables), ())


# ---------------------------------------------------------------------------
# shared leaf routing
# ---------------------------------------------------------------------------


def _route_leaf(path: list[str], v: np.ndarray, params: dict, stats: dict):
    """Route a torch leaf ('...conv.weight', '...bn.running_var', bare
    'weight'/'bias' for plain Conv2d) into params/batch_stats trees."""
    leaf = path[-1]
    parent = path[:-1]
    if leaf == "weight":
        if parent and parent[-1] == "conv":
            _set(params, parent + ["kernel"], _conv_kernel(v))
        elif parent and parent[-1] == "bn":
            _set(params, parent + ["scale"], v)
        elif v.ndim == 4:  # plain nn.Conv2d (detect head final 1x1)
            _set(params, parent + ["kernel"], _conv_kernel(v))
        else:
            _set(params, parent + ["kernel"], v.T)
    elif leaf == "bias":
        _set(params, parent + ["bias"], v)
    elif leaf == "running_mean":
        _set(stats, parent + ["mean"], v)
    elif leaf == "running_var":
        _set(stats, parent + ["var"], v)
    # num_batches_tracked → dropped


def save_flax_checkpoint(path: str, variables: dict) -> None:
    """Serialize a Flax variables tree to msgpack (framework-native format,
    replacing the reference's torch .pt dependency after one-time conversion)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax_tree_to_numpy(variables)))


def load_flax_checkpoint(path: str, template: dict) -> dict:
    """Load a msgpack checkpoint into the structure of `template` (e.g. a
    model.init tree) — shape/structure mismatches raise."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def init_template(model, *example_args) -> dict:
    """Restore-target tree for `load_flax_checkpoint` with ZERO device work.

    `model.init` would trace AND compile the whole forward pass on the
    default backend — ~3 minutes for YOLOv10 over a remote-compile TPU
    tunnel, just to learn the tree structure. `jax.eval_shape` traces
    abstractly (no compile, no device), and numpy zeros stand in for the
    leaves; flax's from_bytes only consumes structure + shapes/dtypes.
    """
    import jax

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_args)
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def jax_tree_to_numpy(tree):
    from tpu3dlm.utils.host import to_host

    return to_host(tree)  # batched async d2h: one latency for all leaves


def assert_tree_matches(converted: dict, reference: dict, prefix: str = "") -> list[str]:
    """Compare converted tree against a model-initialized tree; returns a list
    of mismatch descriptions (empty = exact structural + shape match)."""
    problems = []

    def walk(c, r, pre):
        ck, rk = set(c.keys()), set(r.keys())
        for k in sorted(rk - ck):
            problems.append(f"missing {pre}/{k}")
        for k in sorted(ck - rk):
            problems.append(f"unexpected {pre}/{k}")
        for k in sorted(ck & rk):
            cv, rv = c[k], r[k]
            if isinstance(rv, dict):
                if not isinstance(cv, dict):
                    problems.append(f"type mismatch {pre}/{k}")
                else:
                    walk(cv, rv, f"{pre}/{k}")
            else:
                if tuple(np.shape(cv)) != tuple(np.shape(rv)):
                    problems.append(
                        f"shape {pre}/{k}: {np.shape(cv)} vs {np.shape(rv)}"
                    )

    walk(converted, reference, prefix)
    return problems


if __name__ == "__main__":  # checkpoint conversion CLI
    import argparse

    parser = argparse.ArgumentParser(
        description="Convert a torch checkpoint (ultralytics YOLOv10 / HF "
        "BEiT) to a framework-native msgpack checkpoint."
    )
    parser.add_argument("input", help=".pt/.bin/.safetensors torch checkpoint")
    parser.add_argument("output", help="output .msgpack path")
    parser.add_argument("--model", choices=["yolo", "beit"], required=True)
    args = parser.parse_args()

    sd = load_torch_state_dict(args.input)
    if args.model == "yolo":
        variables = convert_yolov10_state_dict(sd)
    else:
        variables = convert_beit_state_dict(sd)
    save_flax_checkpoint(args.output, variables)
    import jax

    n = sum(int(np.prod(np.shape(v))) for v in jax.tree_util.tree_leaves(variables))
    print(f"converted {args.model}: {n/1e6:.2f}M params → {args.output}")
