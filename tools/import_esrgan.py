#!/usr/bin/env python3
"""Convert a public RealSR/ESRGAN PyTorch checkpoint to an ncnn ``x4.bin``.

The reference loads its weights from ``models/models-DF2K/x4.bin``
(/root/reference/src/realsr.cpp:75-76), but this snapshot ships none
(/root/reference/.MISSING_LARGE_BLOBS). Real RealSR/ESRGAN weights
circulate publicly as PyTorch checkpoints (``.pth``/``.pt``), ``.npz``
bundles, or ``.safetensors`` — this tool maps any of them onto the parsed
``x4.param`` graph and writes a tag-0 fp32 ``.bin`` in the real ncnn
format (realsr_tpu.ncnn.bin.write_weights), so dropping a checkpoint next
to the graph lights up the skipped >=50 dB parity test
(tests/test_golden.py) without code changes.

Checkpoint formats handled WITHOUT torch (production TPU hosts don't ship
it): the zip ``.pth`` container (torch >= 1.6) and the legacy sequential
pickle container (torch < 1.6 — the official RealSR CVPRW-2020 release
era), via a restricted unpickler that rebuilds plain numpy arrays and
refuses any non-tensor global. If ``torch`` happens to be importable it is
used as a fallback for exotic containers, never required.

Key mapping is POSITIONAL, not name-based: every RRDBNet export in the
wild (xinntao old ``model.1.sub.N...`` arch, xinntao ``RRDB_trunk`` arch,
modern BasicSR ``body.N.rdb*``) registers its conv modules in graph order
— conv_first, 23x3x5 dense-block convs, trunk conv, upconv1, upconv2,
HRconv, conv_last — which is exactly the ncnn ``.param`` layer order. So
the 4-D weight tensors are taken in state-dict insertion order and every
one is SHAPE-CHECKED against the corresponding Convolution layer before
anything is written; a single mismatch aborts with both shapes named.

Usage:
    python tools/import_esrgan.py CHECKPOINT [-p x4.param] [-o x4.bin]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import pickle
import struct
import sys
import zipfile
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from realsr_tpu.ncnn.bin import write_weights  # noqa: E402
from realsr_tpu.ncnn.param import ParamGraph, parse_param_file  # noqa: E402

# ---------------------------------------------------------------------------
# no-torch .pth reader
# ---------------------------------------------------------------------------

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _storage_np_dtype(name: str):
    table = {
        "FloatStorage": np.dtype("<f4"),
        "HalfStorage": np.dtype("<f2"),
        "DoubleStorage": np.dtype("<f8"),
        "LongStorage": np.dtype("<i8"),
        "IntStorage": np.dtype("<i4"),
        "ShortStorage": np.dtype("<i2"),
        "CharStorage": np.dtype("<i1"),
        "ByteStorage": np.dtype("<u1"),
        "BoolStorage": np.dtype("?"),
    }
    if name in table:
        return table[name]
    if name == "BFloat16Storage":
        import ml_dtypes  # ships with jax

        return np.dtype(ml_dtypes.bfloat16)
    raise ValueError(f"unsupported torch storage type: {name}")


class _StorageType:
    """Stands in for ``torch.FloatStorage`` etc. inside persistent ids."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _storage_np_dtype(name)


class _Storage:
    """A named storage; ``data`` is filled immediately (zip container) or
    after the main pickle (legacy container appends the byte payloads)."""

    def __init__(self, key: str, dtype, numel: int):
        self.key = key
        self.dtype = dtype
        self.numel = numel
        self.data: Optional[np.ndarray] = None


class _LazyTensor:
    """_rebuild_tensor_v2 output: materializes once storage data exists."""

    def __init__(self, storage: _Storage, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(int(s) for s in size)
        self.stride = tuple(int(s) for s in stride)

    def materialize(self) -> np.ndarray:
        arr = self.storage.data
        if arr is None:
            raise ValueError(
                f"storage {self.storage.key!r} has no data (truncated file?)"
            )
        if not self.size:
            return np.asarray(arr[self.offset]).astype(np.float32, copy=False)
        item = arr.dtype.itemsize
        out = np.lib.stride_tricks.as_strided(
            arr[self.offset :],
            shape=self.size,
            strides=tuple(s * item for s in self.stride),
        )
        return np.array(out)  # own the memory; drop the storage ref


def _rebuild_tensor_v2(storage, offset, size, stride, *unused):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_parameter(data, *unused):
    return data


class _TorchUnpickler(pickle.Unpickler):
    """Restricted unpickler: rebuilds tensors as numpy, refuses arbitrary
    globals (a checkpoint is untrusted input — only the handful of symbols
    a plain state_dict needs are allowed)."""

    _ALLOWED_PLAIN = {
        ("collections", "OrderedDict"),
        ("builtins", "dict"),
        ("builtins", "list"),
        ("builtins", "tuple"),
        ("builtins", "set"),
    }

    def __init__(self, file, storages: Dict[str, _Storage]):
        super().__init__(file, encoding="utf-8")
        self._storages = storages

    def find_class(self, module: str, name: str):
        if (module, name) in self._ALLOWED_PLAIN:
            return super().find_class(module, name)
        if module.startswith("torch"):
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name in ("_rebuild_tensor",):
                # _rebuild_tensor(storage, offset, size, stride)
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
            if name.endswith("Storage"):
                return _StorageType(name)
            if name in ("Size",):
                return tuple
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name} "
            "(only plain tensor state_dicts are supported)"
        )

    def persistent_load(self, pid):
        # ('storage', StorageType, key, location, numel[, view_metadata])
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id: {pid!r}")
        styp, key, _location, numel = pid[1], str(pid[2]), pid[3], int(pid[4])
        if key not in self._storages:
            self._storages[key] = _Storage(key, styp.dtype, numel)
        return self._storages[key]


def _materialize(obj: Any) -> Any:
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


def _read_pth_zip(path: str) -> Any:
    """torch >= 1.6 container: a zip with ``<name>/data.pkl`` + one file
    per storage under ``<name>/data/<key>``."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path}: no data.pkl in zip (not a torch save?)")
        pkl_name = pkl_names[0]
        prefix = pkl_name[: -len("data.pkl")]
        storages: Dict[str, _Storage] = {}
        up = _TorchUnpickler(io.BytesIO(zf.read(pkl_name)), storages)
        obj = up.load()
        for st in storages.values():
            raw = zf.read(f"{prefix}data/{st.key}")
            st.data = np.frombuffer(raw, dtype=st.dtype, count=st.numel)
    return _materialize(obj)


def _read_pth_legacy(path: str) -> Any:
    """torch < 1.6 sequential container: magic, protocol, sysinfo, the
    pickled object (tensors reference storages by key), then the pickled
    storage-key list followed by each storage's payload
    (int64 numel + raw bytes)."""
    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != _LEGACY_MAGIC:
            raise ValueError(f"{path}: bad legacy torch magic {magic!r}")
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info
        storages: Dict[str, _Storage] = {}
        obj = _TorchUnpickler(f, storages).load()
        keys: List[str] = pickle.load(f)
        for key in keys:
            st = storages[str(key)]
            (numel,) = struct.unpack("<q", f.read(8))
            if numel != st.numel:
                raise ValueError(
                    f"{path}: storage {key}: payload numel {numel} != "
                    f"pickled numel {st.numel}"
                )
            st.data = np.frombuffer(
                f.read(numel * st.dtype.itemsize), dtype=st.dtype, count=numel
            )
    return _materialize(obj)


def _read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal pure-numpy safetensors reader (header len + JSON + raw)."""
    dtypes = {
        "F64": "<f8", "F32": "<f4", "F16": "<f2", "I64": "<i8",
        "I32": "<i4", "I16": "<i2", "I8": "<i1", "U8": "<u1", "BOOL": "?",
    }
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = 8 + hlen
        out = {}
        for key, meta in header.items():
            if key == "__metadata__":
                continue
            if meta["dtype"] == "BF16":
                import ml_dtypes

                dt = np.dtype(ml_dtypes.bfloat16)
            else:
                dt = np.dtype(dtypes[meta["dtype"]])
            b0, b1 = meta["data_offsets"]
            f.seek(base + b0)
            out[key] = np.frombuffer(f.read(b1 - b0), dtype=dt).reshape(
                meta["shape"]
            )
    return out


def _unwrap(obj: Any) -> Dict[str, np.ndarray]:
    """Peel common checkpoint nestings down to the flat state dict."""
    if not isinstance(obj, dict):
        raise ValueError(f"checkpoint root is {type(obj).__name__}, not a dict")
    for key in ("params_ema", "params", "state_dict", "model", "generator", "net_g"):
        inner = obj.get(key)
        if isinstance(inner, dict) and any(
            isinstance(v, np.ndarray) and v.ndim == 4 for v in inner.values()
        ):
            obj = inner
            break
    out = {}
    for k, v in obj.items():
        if isinstance(v, np.ndarray):
            out[k.removeprefix("module.")] = v
    if not out:
        raise ValueError(
            "no tensors found in checkpoint (wrapped deeper than one level?)"
        )
    return out


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Checkpoint file -> flat {key: numpy array} in insertion order."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        with np.load(path) as z:
            return _unwrap({k: z[k] for k in z.files})
    if ext == ".safetensors":
        return _unwrap(_read_safetensors(path))
    # .pth / .pt / anything else: torch containers
    if zipfile.is_zipfile(path):
        return _unwrap(_read_pth_zip(path))
    try:
        return _unwrap(_read_pth_legacy(path))
    except Exception as exc:
        try:  # optional fallback for exotic containers; never required
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=True)
            obj = {
                k: v.detach().numpy() if hasattr(v, "detach") else v
                for k, v in obj.items()
            } if isinstance(obj, dict) else obj
            return _unwrap(obj)
        except ImportError:
            raise exc from None


# ---------------------------------------------------------------------------
# graph mapping
# ---------------------------------------------------------------------------


def ordered_convs(sd: Dict[str, np.ndarray]) -> List[Tuple[str, np.ndarray, Optional[np.ndarray]]]:
    """(key, OIHW weight, bias|None) for every conv, in insertion order."""
    out = []
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim == 4:
            b = sd.get(k[: -len(".weight")] + ".bias")
            out.append((k[: -len(".weight")], v, b))
    return out


def convert(
    param_path: str, ckpt_path: str, out_path: str, verbose: bool = True
) -> ParamGraph:
    graph = parse_param_file(param_path)
    convs = [l for l in graph.layers if l.type == "Convolution"]
    sd = load_state_dict(ckpt_path)
    ckpt = ordered_convs(sd)
    if len(ckpt) != len(convs):
        raise ValueError(
            f"conv count mismatch: checkpoint has {len(ckpt)} 4-D conv "
            f"weights, {os.path.basename(param_path)} declares {len(convs)} "
            "Convolution layers — wrong architecture or scale?"
        )
    weights: Dict[str, Dict[str, np.ndarray]] = {}
    for layer, (key, w, b) in zip(convs, ckpt):
        cout, kw, kh = layer.pi(0), layer.pi(1), layer.pi(11, layer.pi(1))
        wsize = layer.pi(6)
        cin = wsize // (cout * kh * kw)
        want = (cout, cin, kh, kw)
        if tuple(w.shape) != want:
            raise ValueError(
                f"shape mismatch at {layer.name} <- {key}: checkpoint "
                f"{tuple(w.shape)} vs .param {want}"
            )
        rec = {"weight": w.astype(np.float32)}
        if layer.pi(5):
            if b is None:
                raise ValueError(
                    f"{layer.name} declares a bias but checkpoint key "
                    f"{key}.bias is missing"
                )
            rec["bias"] = np.asarray(b, dtype=np.float32).reshape(cout)
        weights[layer.name] = rec
        if verbose:
            print(f"  {key:48s} -> {layer.name:14s} {want}")
    write_weights(graph, weights, out_path)
    if verbose:
        size = os.path.getsize(out_path)
        print(f"wrote {out_path}: {len(convs)} conv records, {size} bytes")
    return graph


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help=".pth/.pt/.npz/.safetensors file")
    ap.add_argument(
        "-p", "--param",
        default=os.path.join(REPO, "models", "models-DF2K", "x4.param"),
        help="ncnn .param graph to map onto (default: repo DF2K x4.param)",
    )
    ap.add_argument(
        "-o", "--out", default=None,
        help="output .bin path (default: x4.bin next to the .param)",
    )
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    out = args.out or os.path.join(os.path.dirname(args.param), "x4.bin")
    convert(args.param, args.checkpoint, out, verbose=not args.quiet)
    return 0


if __name__ == "__main__":
    sys.exit(main())
