"""Torch-free `.pth` checkpoint interchange.

RVC's entire model ecosystem is `.pth` files (inference "small models",
training G_/D_ checkpoints, hubert/rmvpe weights).  This module reads and
writes the torch zip-serialization format without importing torch:

  reader: zipfile + a pickle.Unpickler subclass that resolves the
          `torch._utils._rebuild_tensor_v2` / `torch.*Storage` globals to
          numpy-backed stand-ins (persistent-id protocol
          ('storage', dtype_stub, key, location, numel), raw little-endian
          buffers under `<prefix>/data/<key>`).
  writer: a hand-rolled pickle-bytecode emitter producing the same schema
          (protocol 2), so files we write load in stock PyTorch.

Reference behaviors this replaces: torch.load/torch.save usage at
infer/lib/train/utils.py:27-107 and infer/lib/train/process_ckpt.py:15-57.
Tensors round-trip as numpy arrays (bf16 via ml_dtypes).
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict, Optional

import numpy as np

try:  # bf16/fp8 numpy views; ml_dtypes ships with jax
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BF16 = None


class _StorageStub:
    """Marks a torch storage class; instances carry dtype + raw buffer."""

    dtype: np.dtype = None  # set per subclass

    def __init__(self, data: np.ndarray):
        self.data = data


_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
    "BFloat16Storage": _BF16,
    "ComplexFloatStorage": np.dtype("<c8"),
}

_DTYPE_TO_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}
if _BF16 is not None:
    _DTYPE_TO_STORAGE[_BF16] = "BFloat16Storage"


def _make_storage_class(name: str):
    dt = _STORAGE_DTYPES.get(name)

    class _S(_StorageStub):
        dtype = dt

    _S.__name__ = name
    return _S


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    dt = storage.dtype
    n = int(np.prod(size)) if size else 1
    flat = storage.data[storage_offset: storage_offset + max(n, 1)]
    if not size:
        return flat.reshape(())
    # honor strides (rarely non-contiguous in practice)
    contiguous_stride = tuple(
        int(np.prod(size[i + 1:])) for i in range(len(size)))
    if tuple(stride) == contiguous_stride:
        return flat.reshape(size)
    return np.lib.stride_tricks.as_strided(
        storage.data[storage_offset:], shape=size,
        strides=tuple(s * dt.itemsize for s in stride)).copy()


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


class _AttrDict(dict):
    """Stand-in for collections.OrderedDict in torch pickles: a plain dict
    that tolerates attribute state (e.g. state_dict._metadata)."""


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, storage_loader):
        super().__init__(file, encoding="latin1")
        self._storage_loader = storage_loader

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_tensor":
            return lambda storage, offset, size, stride: _rebuild_tensor_v2(
                storage, offset, size, stride)
        if module == "torch._tensor" and name == "_rebuild_from_type_v2":
            return _rebuild_from_type_v2
        if module == "torch" and name in _STORAGE_DTYPES:
            return _make_storage_class(name)
        if module == "torch" and name == "Size":
            return tuple
        if module.startswith("torch"):
            # dtype objects (torch.float32 etc.) and other inert globals
            class _Inert:
                def __init__(self, *a, **k):
                    pass

            _Inert.__name__ = name
            return _Inert
        if module == "collections" and name == "OrderedDict":
            # dict subclass (not plain dict): torch state_dicts carry a
            # `_metadata` attribute that pickle BUILD sets via __dict__
            return _AttrDict
        if module in ("numpy", "numpy.core.multiarray", "numpy._core.multiarray"):
            import numpy as _np
            mod = __import__(module, fromlist=[name])
            return getattr(mod, name)
        raise pickle.UnpicklingError(f"blocked global: {module}.{name}")

    def persistent_load(self, pid):
        typename = pid[0]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {typename}")
        storage_cls, key, location, numel = pid[1], pid[2], pid[3], pid[4]
        dt = storage_cls.dtype
        if dt is None:
            raise pickle.UnpicklingError(
                f"unsupported storage dtype {storage_cls.__name__}")
        raw = self._storage_loader(key, int(numel) * dt.itemsize)
        return storage_cls(np.frombuffer(raw, dtype=dt))


def load_pth(path: str) -> Any:
    """Load a torch-serialized checkpoint as nested dicts of numpy arrays."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl_name = next(n for n in names if n.endswith("data.pkl"))
            prefix = pkl_name[: -len("data.pkl")]

            def loader(key, nbytes):
                return zf.read(f"{prefix}data/{key}")

            with zf.open(pkl_name) as f:
                return _TorchUnpickler(io.BytesIO(f.read()), loader).load()
    # legacy: plain pickle stream (no storages split out)
    with open(path, "rb") as f:
        return _TorchUnpickler(f, lambda k, n: b"").load()


# ---------------------------------------------------------------------------
# Writer: emit torch-zip format with a minimal hand-rolled pickler.
# ---------------------------------------------------------------------------


class _PickleWriter:
    """Minimal protocol-2 pickler for dict/list/tuple/str/int/float/bool/None
    plus numpy-array leaves serialized as torch tensors (persistent storage)."""

    def __init__(self):
        self.out = io.BytesIO()
        self.storages = []  # list of (key, np flat array)
        self.memo_count = 0

    # -- opcode helpers
    def _w(self, b: bytes):
        self.out.write(b)

    def _put_memo(self):
        # LONG_BINPUT for simplicity
        self._w(b"r" + struct.pack("<I", self.memo_count))
        self.memo_count += 1

    def _global(self, module: str, name: str):
        self._w(b"c" + module.encode() + b"\n" + name.encode() + b"\n")
        self._put_memo()

    def _str(self, s: str):
        b = s.encode("utf-8")
        if len(b) < 256:
            self._w(b"U" + struct.pack("<B", len(b)) + b)  # SHORT_BINSTRING
        else:
            self._w(b"X" + struct.pack("<I", len(b)) + b)  # BINUNICODE
        self._put_memo()

    def _int(self, i: int):
        if 0 <= i < 256:
            self._w(b"K" + struct.pack("<B", i))
        elif -(2 ** 31) <= i < 2 ** 31:
            self._w(b"J" + struct.pack("<i", i))
        else:
            data = i.to_bytes((i.bit_length() + 8) // 8, "little", signed=True)
            self._w(b"\x8a" + struct.pack("<B", len(data)) + data)  # LONG1

    def _float(self, f: float):
        self._w(b"G" + struct.pack(">d", f))

    def save(self, obj):
        if obj is None:
            self._w(b"N")
        elif obj is True:
            self._w(b"\x88")
        elif obj is False:
            self._w(b"\x89")
        elif isinstance(obj, (int, np.integer)):
            self._int(int(obj))
        elif isinstance(obj, (float, np.floating)):
            self._float(float(obj))
        elif isinstance(obj, str):
            self._str(obj)
        elif isinstance(obj, np.ndarray) or isinstance(obj, np.generic):
            self._tensor(np.asarray(obj))
        elif isinstance(obj, dict):
            self._w(b"}")
            self._put_memo()
            if obj:
                self._w(b"(")  # MARK
                for k, v in obj.items():
                    self.save(k)
                    self.save(v)
                self._w(b"u")  # SETITEMS
        elif isinstance(obj, (list,)):
            self._w(b"]")
            self._put_memo()
            if obj:
                self._w(b"(")
                for v in obj:
                    self.save(v)
                self._w(b"e")  # APPENDS
        elif isinstance(obj, tuple):
            self._w(b"(")
            for v in obj:
                self.save(v)
            self._w(b"t")
            self._put_memo()
        else:
            raise TypeError(f"cannot pickle {type(obj)}")

    def _tuple(self, *items):
        self._w(b"(")
        for it in items:
            self.save(it)
        self._w(b"t")
        self._put_memo()

    def _tensor(self, arr: np.ndarray):
        storage_name = _DTYPE_TO_STORAGE.get(arr.dtype)
        if storage_name is None:
            arr = arr.astype(np.float32)
            storage_name = "FloatStorage"
        key = str(len(self.storages))
        flat = np.ascontiguousarray(arr).reshape(-1)
        self.storages.append((key, flat))
        # _rebuild_tensor_v2(storage, 0, size, stride, False, OrderedDict())
        self._global("torch._utils", "_rebuild_tensor_v2")
        self._w(b"(")
        # persistent id tuple ('storage', Storage, key, 'cpu', numel) -> BINPERSID
        self._tuple("storage",
                    _GlobalRef("torch", storage_name),
                    key, "cpu", int(flat.size))
        self._w(b"Q")  # BINPERSID
        self.save(0)
        size = tuple(int(s) for s in arr.shape)
        stride = tuple(int(np.prod(size[i + 1:])) for i in range(len(size)))
        self.save(size)
        self.save(stride)
        self._w(b"\x89")  # False (requires_grad)
        # empty OrderedDict for backward hooks
        self._global("collections", "OrderedDict")
        self._w(b")")  # EMPTY_TUPLE
        self._w(b"R")  # REDUCE -> OrderedDict()
        self._put_memo()
        self._w(b"t")  # close args tuple
        self._put_memo()
        self._w(b"R")  # REDUCE -> tensor
        self._put_memo()

    def dumps(self, obj) -> bytes:
        self._w(b"\x80\x02")  # PROTO 2
        self.save(obj)
        self._w(b".")
        return self.out.getvalue()


class _GlobalRef:
    def __init__(self, module, name):
        self.module, self.name = module, name


# _PickleWriter.save special-case for _GlobalRef
_orig_save = _PickleWriter.save


def _save_with_global(self, obj):
    if isinstance(obj, _GlobalRef):
        self._global(obj.module, obj.name)
        return
    _orig_save(self, obj)


_PickleWriter.save = _save_with_global


def save_pth(obj: Any, path: str, prefix: str = "archive") -> None:
    """Write `obj` (nested dicts/lists with numpy leaves) as a torch zip .pth."""
    w = _PickleWriter()
    data = w.dumps(obj)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{prefix}/data.pkl", data)
        for key, flat in w.storages:
            zf.writestr(f"{prefix}/data/{key}", flat.tobytes())
        zf.writestr(f"{prefix}/version", "3\n")
