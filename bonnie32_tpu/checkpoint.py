"""Checkpoint / resume for batched rollout state.

The reference app persists its world through level/asset/song files; a
datagen fleet additionally needs to snapshot the live simulation (the
batched ECS pytree + frame counters) and resume it later — the
checkpoint/resume aux subsystem from SURVEY.md.

Format: a single .npz holding every pytree leaf by flattened path, plus a
JSON metadata blob (treedef repr, framework version, user metadata).
Works for any JAX pytree (GameState batches, Events, framebuffers);
leaves come back as numpy and are re-wrapped by `restore` using a
template pytree's structure and dtypes.
"""

from __future__ import annotations

import io
import json
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 1


def _flatten_with_paths(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out


def save(path: str, tree, metadata: Optional[Dict[str, Any]] = None) -> None:
    """Write a checkpoint: every leaf as an npz entry + a metadata blob."""
    arrays = _flatten_with_paths(tree)
    meta = {"format_version": FORMAT_VERSION,
            "n_leaves": len(arrays),
            "user": metadata or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_metadata(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"]).decode("utf-8"))


def restore(path: str, template):
    """Load a checkpoint into the STRUCTURE of `template`: every leaf of
    the template must exist in the file with a matching shape; dtypes are
    cast to the template's (guards against x64/x32 drift)."""
    with np.load(path) as z:
        stored = {k: z[k] for k in z.files if k != "__meta__"}
    keys = _flatten_with_paths(template)
    missing = [k for k in keys if k not in stored]
    if missing:
        raise ValueError(f"checkpoint missing leaves: {missing[:5]}")

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        template)
    new_leaves = []
    for path_, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path_)
        arr = stored[key]
        want = np.asarray(leaf)
        if arr.shape != want.shape:
            raise ValueError(
                f"leaf {key}: shape {arr.shape} != template {want.shape}")
        new_leaves.append(jnp.asarray(arr.astype(want.dtype)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_bytes(tree, metadata: Optional[Dict[str, Any]] = None) -> bytes:
    """In-memory variant (for the storage layer / cloud sync)."""
    buf = io.BytesIO()
    arrays = _flatten_with_paths(tree)
    meta = {"format_version": FORMAT_VERSION, "n_leaves": len(arrays),
            "user": metadata or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    np.savez(buf, **arrays)
    return buf.getvalue()


def restore_bytes(data: bytes, template):
    import tempfile
    buf = io.BytesIO(data)
    with np.load(buf) as z:
        stored = {k: z[k] for k in z.files if k != "__meta__"}
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        template)
    new_leaves = []
    for path_, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path_)
        if key not in stored:
            raise ValueError(f"checkpoint missing leaf: {key}")
        want = np.asarray(leaf)
        arr = stored[key]
        if arr.shape != want.shape:
            raise ValueError(
                f"leaf {key}: shape {arr.shape} != template {want.shape}")
        new_leaves.append(jnp.asarray(arr.astype(want.dtype)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
