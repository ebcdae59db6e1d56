"""Checkpointing: params + optimizer state + PRNG + counters, plus the
hardware-oriented per-parameter ``.txt`` export.

Parity with src/checkpoint_utils/CheckPointUtil.py: ``save`` writes a full
training-state checkpoint (:21-63), ``save_weights(as_txt=True)`` additionally
exports every parameter as a standalone text file with an ``index.txt``
manifest (:91-122 — the export path for hardware decoders), and ``load``
restores (:125-159).  Storage is a single ``.npz`` (arrays flattened by pytree
path) + a JSON sidecar for metadata — no pickle, portable across hosts.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


class CheckpointManager:
    def __init__(self, checkpoint_dir: str = "checkpoints"):
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def save(
        self,
        filepath: str,
        params,
        opt_state=None,
        epoch: Optional[int] = None,
        metrics: Optional[dict[str, float]] = None,
        config: Optional[dict[str, Any]] = None,
        rng_key=None,
        extra_arrays: Optional[dict[str, np.ndarray]] = None,
    ) -> str:
        """Write ``<dir>/<filepath>.npz`` (+ ``.json`` metadata)."""
        base = filepath[:-4] if filepath.endswith(".npz") else filepath
        path = os.path.join(self.checkpoint_dir, base + ".npz")
        arrays = {f"params/{k}": v for k, v in _flatten_with_paths(params).items()}
        if opt_state is not None:
            arrays.update({f"opt_state/{k}": v for k, v in _flatten_with_paths(opt_state).items()})
        if rng_key is not None:
            arrays["rng_key"] = np.asarray(jax.random.key_data(rng_key))
        if extra_arrays:
            arrays.update({f"extra/{k}": np.asarray(v) for k, v in extra_arrays.items()})
        np.savez(path, **arrays)
        meta = {
            "epoch": epoch,
            "metrics": metrics or {},
            "config": config or {},
            "saved_at": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        }
        with open(os.path.join(self.checkpoint_dir, base + ".json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
        return path

    def load(self, filepath: str, params_template, opt_state_template=None):
        """Restore (params, opt_state, metadata[, rng_key]) from a checkpoint,
        reshaping into the provided pytree templates."""
        base = filepath[:-4] if filepath.endswith(".npz") else filepath
        path = base if os.path.isabs(base) else os.path.join(self.checkpoint_dir, base)
        data = np.load(path + ".npz")

        def restore(template, prefix):
            flat = _flatten_with_paths(template)
            restored = {k: data[f"{prefix}/{k}"] for k in flat}
            leaves_paths = jax.tree_util.tree_flatten_with_path(template)
            keys = ["/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
                    for p in path_) for path_, _ in leaves_paths[0]]
            leaves = [restored[k] for k in keys]
            return jax.tree_util.tree_unflatten(leaves_paths[1], leaves)

        params = restore(params_template, "params")
        opt_state = (
            restore(opt_state_template, "opt_state") if opt_state_template is not None else None
        )
        meta_path = path + ".json"
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        rng_key = None
        if "rng_key" in data:
            rng_key = jax.random.wrap_key_data(data["rng_key"])
        extras = {k[len("extra/"):]: data[k] for k in data.files if k.startswith("extra/")}
        return params, opt_state, meta, rng_key, extras

    # ------------------------------------------------------------------
    def save_weights(
        self,
        filepath: str,
        named_params: dict[str, np.ndarray],
        as_txt: bool = False,
    ) -> str:
        """Save weights only.  ``named_params`` maps exported parameter names
        (e.g. ``weight_CN_3``) to arrays; with ``as_txt`` each parameter is
        written to its own ``.txt`` with an ``index.txt`` manifest, matching
        the reference's hardware-export format (CheckPointUtil.py:91-122)."""
        base = filepath[:-4] if filepath.endswith(".npz") else filepath
        path = os.path.join(self.checkpoint_dir, base + ".npz")
        np.savez(path, **{k: np.asarray(v) for k, v in named_params.items()})

        if as_txt:
            txt_dir = os.path.join(self.checkpoint_dir, f"{base}_weights_txt")
            os.makedirs(txt_dir, exist_ok=True)
            index_file = os.path.join(txt_dir, "index.txt")
            total = sum(int(np.asarray(v).size) for v in named_params.values())
            with open(index_file, "w") as f:
                f.write(f"# Model weights saved at: {datetime.now().strftime('%Y-%m-%d %H:%M:%S')}\n")
                f.write(f"# Total parameters: {total}\n")
                f.write("# Format: Each parameter saved in separate .txt file\n")
                f.write("-" * 80 + "\n")
                f.write("Parameter_Name, Shape, Filename\n")
            for name, param in named_params.items():
                arr = np.asarray(param)
                safe = name.replace(".", "_").replace("/", "_")
                fname = f"{safe}.txt"
                out = os.path.join(txt_dir, fname)
                if arr.ndim > 2:
                    np.savetxt(out, arr.reshape(arr.shape[0], -1),
                               header=f"Original shape: {arr.shape}\nReshaped to 2D for savetxt")
                else:
                    np.savetxt(out, np.atleast_1d(arr))
                with open(index_file, "a") as f:
                    f.write(f"{name}, {list(arr.shape)}, {fname}\n")
        return path


# ---------------------------------------------------------------------------
# Torch-reference checkpoint import
# ---------------------------------------------------------------------------
def _read_reference_txt_dir(txt_dir: str) -> dict[str, np.ndarray]:
    """Parse a reference ``*_weights_txt`` export (CheckPointUtil.py:91-122):
    an ``index.txt`` manifest of ``name, [shape], filename`` rows plus one
    ``np.savetxt`` file per parameter."""
    named = {}
    with open(os.path.join(txt_dir, "index.txt")) as f:
        lines = [l.strip() for l in f if l.strip()]
    for line in lines:
        if line.startswith(("#", "-", "Parameter_Name")):
            continue
        # "{name}, {list(shape)}, {filename}" — the shape repr has inner commas
        name, rest = line.split(", ", 1)
        shape_s, fname = rest.rsplit(", ", 1)
        shape = json.loads(shape_s)
        arr = np.loadtxt(os.path.join(txt_dir, fname), dtype=np.float64)
        named[name] = np.asarray(arr, np.float32).reshape(shape)
    return named


def _read_reference_pth(path: str, allow_unsafe: bool = False) -> dict[str, np.ndarray]:
    """Load a reference ``.pth`` — either a full training checkpoint
    (``{'model_state_dict': ...}``, CheckPointUtil.save :21-63) or a bare
    ``state_dict`` (save_weights :65-89).

    Loads with ``weights_only=True`` (no arbitrary-pickle execution); the
    reference's own checkpoints load fine that way.  A checkpoint that fails
    the safe loader is only retried with full unpickling when the caller
    explicitly opts in via ``allow_unsafe=True`` — full unpickling executes
    arbitrary code embedded in the file."""
    import torch  # the torch-cpu wheel in this image; only needed for .pth

    try:
        data = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_unsafe:
            raise ValueError(
                f"{path!r} failed the safe (weights_only=True) torch loader: {e}. "
                "If you trust this file, retry with allow_unsafe=True "
                "(CLI: --import-reference-unsafe); full unpickling can execute "
                "arbitrary code embedded in the checkpoint."
            ) from e
        import warnings

        warnings.warn(
            f"UNSAFE LOAD: retrying {path!r} with weights_only=False — "
            "arbitrary code in the pickle will execute.",
            stacklevel=3,
        )
        data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model_state_dict" in data:
        data = data["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy(), np.float32) for k, v in data.items()}


def read_reference_named_weights(path: str, allow_unsafe: bool = False) -> dict[str, np.ndarray]:
    """Reference checkpoint -> {parameter name: array}, from a ``.pth`` file
    or a ``*_weights_txt`` directory."""
    if os.path.isdir(path):
        return _read_reference_txt_dir(path)
    return _read_reference_pth(path, allow_unsafe=allow_unsafe)


def import_reference_weights(decoder, path: str, allow_unsafe: bool = False):
    """Build a framework params pytree from a torch-reference checkpoint.

    ``decoder`` is a BoostedNeuralDecoder (stacked ``weight_{cn,ucn,vn}``
    leaves; reference names ``weight_{CN,UCN,VN}_{iter}``,
    BoostedNeuralLDPCDecoder._param_name :105-106) or a NeuralMinSumDecoder
    (``weights_var``/``biases_var`` stacks; reference nn.ParameterList keys
    ``weights_var.{i}``).  Inverse of ``named_parameter_rows``; cross-validates
    trained reference decoders inside this framework."""
    named = read_reference_named_weights(path, allow_unsafe=allow_unsafe)

    if hasattr(decoder, "specs"):  # boosted family
        params = {}
        template = decoder.init_params()
        for key, spec in decoder.specs.items():
            pk = f"weight_{key}"
            if pk not in template:
                continue
            row_iters = spec.temporal_rows if spec.temporal_rows else range(spec.n_iterations)
            rows = []
            for it in row_iters:
                name = f"weight_{key.upper()}_{it}"
                if name not in named:
                    raise KeyError(
                        f"reference checkpoint at {path!r} is missing {name!r} "
                        f"(has: {sorted(named)[:8]}...)"
                    )
                rows.append(np.asarray(named[name], np.float32).reshape(-1))
            params[pk] = jnp.asarray(np.stack(rows))
            if params[pk].shape != template[pk].shape:
                raise ValueError(
                    f"{pk}: reference rows stack to {params[pk].shape}, decoder "
                    f"expects {template[pk].shape} (sharing config mismatch?)"
                )
        return params

    # Dai neural decoder: ParameterList entries weights_var.{i} / biases_var.{i}
    n = decoder.config.n_iterations
    out = {}
    for stack, ref_prefix in (("weights_var", "weights_var"), ("biases_var", "biases_var")):
        rows = []
        for i in range(n):
            for cand in (f"{ref_prefix}.{i}", f"{ref_prefix}_{i}"):
                if cand in named:
                    rows.append(np.asarray(named[cand], np.float32).reshape(-1))
                    break
            else:
                raise KeyError(f"reference checkpoint missing {ref_prefix}.{i}")
        out[stack] = jnp.asarray(np.stack(rows))
    return out
