"""Checkpointing: reference folder layout + native msgpack format + a
documented ``.pth`` ↔ ours conversion story.

Layout kept from the reference (trainer.py:97-131):
    {log_dir}/{version}/models/opt.json
    {log_dir}/{version}/models/weights_{idx}/{flownet,posenet,mobile_decoder,adam}.*

Native files are flax msgpack (``*.msgpack``); reference checkpoints are
torch ``*.pth``. Loads are key-intersection partial loads like the reference
(trainer.py:159-163): leaves whose paths match are taken from the file, the
rest keep their initialized values.

``.pth`` import maps torchvision/monodepth2 state-dict keys onto our Flax
trees (NCHW conv weights → HWIO kernels); export goes the other way so a
reference user can run our checkpoints in the original repo.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:
    from flax import serialization
except ImportError:  # pragma: no cover
    serialization = None


# ----------------------------------------------------------------- helpers


def latest_weights_idx(log_dir: str, version: str) -> int | None:
    """Highest COMPLETE ``weights_{idx}`` under ``log_dir/version/models``,
    or None. Used by ``--resume auto`` (preemption recovery — no reference
    analog; the reference resumes only via manual --v_load/--idx_load flags,
    options.py:186-196).

    A native checkpoint counts only if its ``meta.json`` commit marker exists
    (written last by :func:`save_checkpoint`, so a folder interrupted
    mid-save is skipped); reference-layout ``.pth`` folders have no marker
    and count on the mobile_decoder file alone."""
    models_dir = os.path.join(log_dir, version, "models")
    if not os.path.isdir(models_dir):
        return None
    best = None
    for name in os.listdir(models_dir):
        if not name.startswith("weights_"):
            continue
        try:
            idx = int(name.split("_", 1)[1])
        except ValueError:
            continue
        folder = os.path.join(models_dir, name)
        native_ok = os.path.exists(
            os.path.join(folder, "mobile_decoder.msgpack")
        ) and os.path.exists(os.path.join(folder, "meta.json"))
        if native_ok or os.path.exists(os.path.join(folder, "mobile_decoder.pth")):
            best = idx if best is None else max(best, idx)
    return best


def weights_folder(log_dir: str, version: str, idx: int) -> str:
    """(reference: trainer.py:111,146)"""
    return os.path.join(log_dir, version, "models", f"weights_{idx}")


def _flatten(tree: Any, prefix: tuple = ()) -> dict[tuple, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict[tuple, Any]) -> dict:
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return tree


def merge_partial(target: Any, loaded: Any) -> Any:
    """Key-intersection partial load (reference: trainer.py:159-163):
    take leaves from ``loaded`` where the path exists in ``target`` with a
    matching shape; keep ``target``'s leaf otherwise."""
    t = _flatten(target)
    l = _flatten(loaded)
    merged = {}
    for path, leaf in t.items():
        cand = l.get(path)
        if cand is not None and tuple(np.shape(cand)) == tuple(np.shape(leaf)):
            merged[path] = jnp.asarray(cand)
        else:
            merged[path] = leaf
    return _unflatten(merged)


# ------------------------------------------------------------ native format


def save_variables(path: str, variables: Any) -> None:
    """Atomic write: serialize to a sibling tmp file, then ``os.replace``.
    A preemption mid-write (the SIGTERM/SIGKILL pair most schedulers send)
    can never leave a truncated msgpack at the final path."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    os.replace(tmp, path)


def load_variables(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_checkpoint(
    folder: str,
    variables: dict,
    opt_state: Any = None,
    step: int = 0,
    models_to_save: tuple[str, ...] = ("flownet", "posenet", "mobile_decoder"),
    base_step: int = 0,
) -> None:
    """Save per-model files like the reference (trainer.py:108-131).

    Every file is written atomically, and ``meta.json`` is written LAST — its
    presence is the checkpoint's commit marker: a folder with meta.json is
    guaranteed to hold fully-written model files (``latest_weights_idx``
    refuses folders without it, so ``--resume auto`` can never pick up a
    half-saved checkpoint after a preemption).

    ``base_step``: the step-counter value at the START of the run that wrote
    this checkpoint. The global counter is inherited across fine-tune stages
    (a --v_load/--load_adam run continues its base checkpoint's count), so
    ``step - base_step`` — not ``step`` — is this run's progress; ``--resume
    auto`` uses it to re-enter the correct (epoch, batch) position."""
    os.makedirs(folder, exist_ok=True)
    for name in models_to_save:
        if name in variables:
            save_variables(os.path.join(folder, f"{name}.msgpack"), variables[name])
    if opt_state is not None:
        save_variables(os.path.join(folder, "adam.msgpack"), opt_state)
    tmp = os.path.join(folder, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"step": int(step), "base_step": int(base_step)}, f)
    os.replace(tmp, os.path.join(folder, "meta.json"))


def read_meta(folder: str) -> dict:
    """The checkpoint's commit-marker metadata ({} for reference-layout .pth
    folders, which have no marker)."""
    meta = os.path.join(folder, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return json.load(f)
    return {}


def load_checkpoint(
    folder: str,
    variables: dict,
    opt_state: Any = None,
    models_to_load: tuple[str, ...] = ("flownet", "posenet", "mobile_decoder"),
) -> tuple[dict, Any, int]:
    """Load per-model files, accepting .msgpack (native) or .pth (reference),
    with key-intersection semantics. Returns (variables, opt_state, step)."""
    variables = dict(variables)
    for name in models_to_load:
        msg = os.path.join(folder, f"{name}.msgpack")
        pth = os.path.join(folder, f"{name}.pth")
        if os.path.exists(msg):
            loaded = load_variables(msg, jax.device_get(variables[name]))
            variables[name] = merge_partial(variables[name], loaded)
        elif os.path.exists(pth):
            loaded = import_pth(pth, name)
            variables[name] = merge_partial(variables[name], loaded)
        else:
            raise FileNotFoundError(f"no checkpoint for {name} in {folder}")

    adam = os.path.join(folder, "adam.msgpack")
    if opt_state is not None and os.path.exists(adam):
        opt_state = load_variables(adam, jax.device_get(opt_state))

    step = read_meta(folder).get("step", 0)
    return variables, opt_state, step


# ------------------------------------------------------------- .pth import

# torch state-dict key → (collection, flax path) translation pieces.

_BN_LEAF = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _encoder_key(parts: list[str]) -> tuple[str, tuple, bool] | None:
    """Map torchvision resnet keys (after the 'encoder.encoder.' prefix) to
    (collection, path, is_conv). Returns None for ignorable keys."""
    if parts[-1] == "num_batches_tracked" or parts[0] == "fc":
        return None
    if parts[0] in ("conv1",):
        return "params", ("conv1", "kernel"), True
    if parts[0] == "bn1":
        coll, leaf = _BN_LEAF[parts[1]]
        return coll, ("bn1", leaf), False
    m = re.match(r"layer(\d)", parts[0])
    if m:
        block = f"layer{m.group(1)}_{parts[1]}"
        rest = parts[2:]
        if rest[0] == "downsample":
            if rest[1] == "0":
                return "params", (block, "downsample_conv", "kernel"), True
            coll, leaf = _BN_LEAF[rest[2]]
            return coll, (block, "downsample_bn", leaf), False
        if rest[0].startswith("conv"):
            return "params", (block, rest[0], "kernel"), True
        if rest[0].startswith("bn"):
            coll, leaf = _BN_LEAF[rest[1]]
            return coll, (block, rest[0], leaf), False
    return None


def _seq_decoder_name(net: str, index: int, scales: int = 4) -> str:
    """Translate the reference's ModuleList index back to the named conv:
    indices 0..9 are (upconv, i, j) for i=4..0, j=0..1; 10.. are the
    per-scale prediction heads (flow_net_v1.py:36-51, mobile_decoder.py:39-52)."""
    if index < 10:
        i = 4 - index // 2
        j = index % 2
        return f"upconv_{i}_{j}"
    head = {"flownet": "pred_flow", "mobile_decoder": "pred_mobile"}[net]
    return f"{head}_{index - 10}"


_POSE_NAMES = {0: "squeeze", 1: "pose_0", 2: "pose_1", 3: "pose_2"}


def torch_key_to_flax(model: str, key: str) -> tuple[str, tuple, bool] | None:
    """Map one reference state-dict key to (collection, flax path, is_conv).

    model ∈ {flownet, posenet, mobile_decoder}. Returns None for keys we
    intentionally skip (fc head, num_batches_tracked, height/width markers).
    """
    if key in ("height", "width"):
        return None
    parts = key.split(".")

    if model in ("flownet", "posenet") and parts[0] == "encoder":
        # FlowNet_v1.encoder = ResnetEncoder; ResnetEncoder.encoder = resnet
        inner = parts[1:]
        if inner and inner[0] == "encoder":
            inner = inner[1:]
        mapped = _encoder_key(inner)
        if mapped is None:
            return None
        coll, path, is_conv = mapped
        return coll, ("encoder",) + path, is_conv

    if model == "posenet" and parts[0] == "decoder":
        # decoder.pose_net.{idx}.{weight|bias} (pose_net_v3.py:28-37)
        idx = int(parts[2])
        leaf = "kernel" if parts[3] == "weight" else "bias"
        return "params", ("decoder", _POSE_NAMES[idx], leaf), parts[3] == "weight"

    if model == "flownet" and parts[0] == "decoder":
        if parts[1] == "flow_scale":
            return "params", ("decoder", "flow_scale"), False
        # decoder.flow_net.{idx}.conv[.conv].{weight|bias}
        idx = int(parts[2])
        name = _seq_decoder_name("flownet", idx)
        conv_path = tuple(p for p in parts[3:-1])  # ('conv',) or ('conv','conv')
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        return "params", ("decoder", name) + conv_path + (leaf,), parts[-1] == "weight"

    if model == "mobile_decoder":
        # mobile_net.{idx}.conv[.conv].{weight|bias} (mobile_decoder.py:54)
        if parts[0] != "mobile_net":
            return None
        idx = int(parts[1])
        name = _seq_decoder_name("mobile_decoder", idx)
        conv_path = tuple(p for p in parts[2:-1])
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        return "params", (name,) + conv_path + (leaf,), parts[-1] == "weight"

    return None


def import_pth(path: str, model: str) -> dict:
    """Load a reference ``.pth`` state dict into our variable-tree structure
    {'params': ..., 'batch_stats': ...} (mobile_decoder has params only).

    Conv weights (O, I, kh, kw) are transposed to HWIO kernels.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    flat: dict[tuple, np.ndarray] = {}
    for key, value in sd.items():
        mapped = torch_key_to_flax(model, key)
        if mapped is None:
            continue
        coll, p, is_conv = mapped
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        if is_conv and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
        flat[(coll,) + p] = arr
    tree = _unflatten(flat)
    if model == "mobile_decoder" and "params" in tree:
        return tree
    return tree


def export_pth(path: str, model: str, variables: dict) -> None:
    """Write our variables as a reference-compatible ``.pth`` state dict
    (the reverse mapping of :func:`import_pth`)."""
    import torch

    ours = _flatten(jax.device_get(variables))
    sd = {}
    # Build the inverse map by enumerating candidate torch keys and checking
    # which flax paths they land on.
    inverse: dict[tuple, tuple[str, bool]] = {}

    def register(tkey: str):
        mapped = torch_key_to_flax(model, tkey)
        if mapped:
            coll, p, is_conv = mapped
            inverse[(coll,) + p] = (tkey, is_conv)

    # encoder keys
    if model in ("flownet", "posenet"):
        for leaf in ("weight",):
            register(f"encoder.encoder.conv1.{leaf}")
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            register(f"encoder.encoder.bn1.{leaf}")
        for L in range(1, 5):
            for b in range(3):
                for c in ("conv1", "conv2", "conv3"):
                    register(f"encoder.encoder.layer{L}.{b}.{c}.weight")
                for bn in ("bn1", "bn2", "bn3"):
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        register(f"encoder.encoder.layer{L}.{b}.{bn}.{leaf}")
                register(f"encoder.encoder.layer{L}.{b}.downsample.0.weight")
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    register(f"encoder.encoder.layer{L}.{b}.downsample.1.{leaf}")
    if model == "posenet":
        for idx in range(4):
            for leaf in ("weight", "bias"):
                register(f"decoder.pose_net.{idx}.{leaf}")
    if model == "flownet":
        for idx in range(10):
            for leaf in ("weight", "bias"):
                register(f"decoder.flow_net.{idx}.conv.conv.{leaf}")
        for idx in range(10, 14):
            for leaf in ("weight", "bias"):
                register(f"decoder.flow_net.{idx}.conv.{leaf}")
    if model == "mobile_decoder":
        for idx in range(10):
            for leaf in ("weight", "bias"):
                register(f"mobile_net.{idx}.conv.conv.{leaf}")
        for idx in range(10, 14):
            for leaf in ("weight", "bias"):
                register(f"mobile_net.{idx}.conv.{leaf}")

    for path_, (tkey, is_conv) in inverse.items():
        if path_ in ours:
            arr = np.asarray(ours[path_])
            if is_conv and arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO → OIHW
            sd[tkey] = torch.from_numpy(np.ascontiguousarray(arr))

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(sd, path)
