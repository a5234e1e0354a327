"""Pure-Python GGUF reader/writer (host side).

Replaces the reference's gguf.h/ggml usage (gguf_loader.cpp:17-52,
text_decoder.cpp:38-114): parses GGUF v2/v3 metadata, exposes tensor data as
zero-copy numpy views over an mmap, and decodes Q8_0 blocks either to float
or to raw (int8, scale) pairs for on-device dequant matmuls.

GGUF layout notes (important for the JAX side):
- tensor dims are stored fastest-varying first (ne[0] fastest). A GGUF
  2-D tensor with ne=[in, out] therefore maps to a C-order numpy array of
  shape (out, in); most weights need a transpose to the [in, out] layout the
  TPU matmuls use (y = x @ W).
- Q8_0: blocks of 32 values as (f16 scale, 32x int8), 34 bytes per block.
"""

from __future__ import annotations

import mmap
import struct
from dataclasses import dataclass, field

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF"

# ggml_type ids (subset)
GGML_TYPE_F32 = 0
GGML_TYPE_F16 = 1
GGML_TYPE_Q8_0 = 8
GGML_TYPE_I32 = 26  # unused by models here, kept for completeness

Q8_0 = GGML_TYPE_Q8_0
_Q8_BLOCK = 32
_Q8_BLOCK_BYTES = 2 + _Q8_BLOCK  # f16 scale + 32 int8

_TYPE_NAMES = {GGML_TYPE_F32: "f32", GGML_TYPE_F16: "f16", GGML_TYPE_Q8_0: "q8_0"}

# GGUF metadata value types
_U8, _I8, _U16, _I16, _U32, _I32, _F32, _BOOL, _STR, _ARR, _U64, _I64, _F64 = range(13)

_SCALAR_FMT = {
    _U8: "<B", _I8: "<b", _U16: "<H", _I16: "<h", _U32: "<I", _I32: "<i",
    _F32: "<f", _U64: "<Q", _I64: "<q", _F64: "<d",
}


class _Reader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, fmt: str):
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return vals[0] if len(vals) == 1 else vals

    def read_str(self) -> str:
        n = self.read("<Q")
        s = bytes(self.buf[self.pos : self.pos + n]).decode("utf-8")
        self.pos += n
        return s

    def read_value(self, vtype: int):
        if vtype == _BOOL:
            return bool(self.read("<B"))
        if vtype == _STR:
            return self.read_str()
        if vtype == _ARR:
            etype = self.read("<I")
            n = self.read("<Q")
            return [self.read_value(etype) for _ in range(n)]
        return self.read(_SCALAR_FMT[vtype])


@dataclass
class TensorInfo:
    name: str
    shape: tuple[int, ...]  # GGUF order: ne[0] fastest
    ggml_type: int
    offset: int             # relative to data section

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def nbytes(self) -> int:
        if self.ggml_type == GGML_TYPE_F32:
            return self.n_elements * 4
        if self.ggml_type == GGML_TYPE_F16:
            return self.n_elements * 2
        if self.ggml_type == GGML_TYPE_Q8_0:
            assert self.n_elements % _Q8_BLOCK == 0
            return self.n_elements // _Q8_BLOCK * _Q8_BLOCK_BYTES
        raise ValueError(f"unsupported ggml type {self.ggml_type}")

    @property
    def type_name(self) -> str:
        return _TYPE_NAMES.get(self.ggml_type, str(self.ggml_type))


def dequantize_q8_0_py(raw: np.ndarray, n_elements: int) -> np.ndarray:
    """Pure-numpy Q8_0 decode (also the oracle for the native version)."""
    blocks = raw.reshape(-1, _Q8_BLOCK_BYTES)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # [n,1]
    qs = blocks[:, 2:].view(np.int8).astype(np.float32)
    return (qs * scales).reshape(-1)[:n_elements]


def dequantize_q8_0(raw: np.ndarray, n_elements: int) -> np.ndarray:
    """Decode Q8_0 blocks (uint8 raw bytes) -> float32 [n_elements].

    Uses the native C++ decoder when built (native/qwen3_host.cpp)."""
    try:
        from qwen3_asr_tpu.runtime import native

        out = native.q8_0_dequant(raw, n_elements)
        if out is not None:
            return out
    except Exception:
        pass
    return dequantize_q8_0_py(raw, n_elements)


def q8_0_views(raw: np.ndarray, n_elements: int) -> tuple[np.ndarray, np.ndarray]:
    """Split Q8_0 raw bytes into (int8 values [n], f16 scales [n/32]) for
    on-device dequantization."""
    blocks = raw.reshape(-1, _Q8_BLOCK_BYTES)
    scales = blocks[:, :2].copy().view(np.float16).reshape(-1)
    qs = blocks[:, 2:].view(np.int8).reshape(-1)[:n_elements]
    return qs, scales


class GGUFFile:
    """mmap-backed GGUF file: `.metadata` dict, `.tensors` dict of TensorInfo,
    `get(name)` -> numpy array in numpy (C-order) shape = reversed(ne)."""

    def __init__(self, path: str):
        self.path = path
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        r = _Reader(self._mm)

        magic = r.read("<I")
        if magic != GGUF_MAGIC:
            raise ValueError(f"not a GGUF file: {path}")
        self.version = r.read("<I")
        if self.version < 2:
            raise ValueError(f"unsupported GGUF version {self.version}")
        n_tensors = r.read("<q")
        n_kv = r.read("<q")

        self.metadata: dict = {}
        for _ in range(n_kv):
            key = r.read_str()
            vtype = r.read("<I")
            self.metadata[key] = r.read_value(vtype)

        self.tensors: dict[str, TensorInfo] = {}
        order: list[TensorInfo] = []
        for _ in range(n_tensors):
            name = r.read_str()
            n_dims = r.read("<I")
            shape = tuple(r.read("<Q") for _ in range(n_dims))
            ggml_type = r.read("<I")
            offset = r.read("<Q")
            ti = TensorInfo(name, shape, ggml_type, offset)
            self.tensors[name] = ti
            order.append(ti)

        alignment = self.metadata.get("general.alignment", 32)
        self.data_offset = (r.pos + alignment - 1) // alignment * alignment

    def close(self):
        """Best-effort close: numpy views handed out by get() keep the mmap
        alive (zero-copy contract, like the reference's mmap that must
        outlive its tensors, gguf_loader.h:93-95); in that case the mapping
        is released when the views are garbage collected."""
        try:
            self._mm.close()
        except BufferError:
            pass
        self._file.close()

    def raw_bytes(self, name: str) -> np.ndarray:
        ti = self.tensors[name]
        start = self.data_offset + ti.offset
        return np.frombuffer(self._mm, dtype=np.uint8, count=ti.nbytes, offset=start)

    def get(self, name: str, dequant: bool = True) -> np.ndarray:
        """Tensor as numpy array with shape reversed(ne) (C order).

        F32/F16 are zero-copy views into the mmap; Q8_0 is decoded to f32
        when `dequant`, else raises (use `get_q8_0` for raw int8+scales).
        """
        ti = self.tensors[name]
        raw = self.raw_bytes(name)
        np_shape = tuple(reversed(ti.shape))
        if ti.ggml_type == GGML_TYPE_F32:
            return raw.view(np.float32).reshape(np_shape)
        if ti.ggml_type == GGML_TYPE_F16:
            return raw.view(np.float16).reshape(np_shape)
        if ti.ggml_type == GGML_TYPE_Q8_0:
            if not dequant:
                raise ValueError("use get_q8_0 for raw quantized access")
            return dequantize_q8_0(raw, ti.n_elements).reshape(np_shape)
        raise ValueError(f"unsupported tensor type {ti.ggml_type} for {name}")

    def get_q8_0(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        ti = self.tensors[name]
        assert ti.ggml_type == GGML_TYPE_Q8_0
        return q8_0_views(self.raw_bytes(name), ti.n_elements)


# ---------------------------------------------------------------------------
# Writer (used by the converter and by tests to build synthetic models)
# ---------------------------------------------------------------------------

def _infer_vtype(v) -> int:
    if isinstance(v, bool):
        return _BOOL
    if isinstance(v, int):
        return _U32 if 0 <= v < 2**32 else _I64
    if isinstance(v, float):
        return _F32
    if isinstance(v, str):
        return _STR
    raise TypeError(type(v))


def quantize_q8_0(data: np.ndarray) -> bytes:
    """float array -> Q8_0 raw bytes (matches ggml quantize_row_q8_0)."""
    flat = np.ascontiguousarray(data, dtype=np.float32).reshape(-1)
    assert flat.size % _Q8_BLOCK == 0, "Q8_0 needs multiples of 32"
    blocks = flat.reshape(-1, _Q8_BLOCK)
    amax = np.abs(blocks).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = np.round(blocks * inv[:, None]).astype(np.int8)
    out = np.empty((blocks.shape[0], _Q8_BLOCK_BYTES), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = q.view(np.uint8)
    return out.tobytes()


class GGUFWriter:
    """Minimal GGUF v3 writer (enough for this model family)."""

    def __init__(self, path: str, alignment: int = 32):
        self.path = path
        self.alignment = alignment
        self.kv: list[tuple[str, int, object]] = []
        self.tensors: list[tuple[str, tuple[int, ...], int, bytes]] = []
        self.add("general.alignment", alignment, _U32)

    def add(self, key: str, value, vtype: int | None = None):
        if vtype is None:
            vtype = _infer_vtype(value)
        self.kv.append((key, vtype, value))

    def add_str_array(self, key: str, values: list[str]):
        self.kv.append((key, _ARR, (_STR, values)))

    def add_i32_array(self, key: str, values: list[int]):
        self.kv.append((key, _ARR, (_I32, [int(v) for v in values])))

    def add_f32(self, key: str, value: float):
        self.add(key, float(value), _F32)

    def add_u32(self, key: str, value: int):
        self.add(key, int(value), _U32)

    def add_tensor(self, name: str, data: np.ndarray, ggml_type: int | None = None):
        """`data` in numpy C-order; stored with GGUF dims = reversed(shape)."""
        data = np.ascontiguousarray(data)
        if ggml_type is None:
            ggml_type = GGML_TYPE_F32 if data.dtype == np.float32 else GGML_TYPE_F16
        if ggml_type == GGML_TYPE_F32:
            payload = data.astype(np.float32).tobytes()
        elif ggml_type == GGML_TYPE_F16:
            payload = data.astype(np.float16).tobytes()
        elif ggml_type == GGML_TYPE_Q8_0:
            payload = quantize_q8_0(data)
        else:
            raise ValueError(f"unsupported type {ggml_type}")
        ne = tuple(reversed(data.shape))
        self.tensors.append((name, ne, ggml_type, payload))

    @staticmethod
    def _pack_str(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack("<Q", len(b)) + b

    def _pack_value(self, vtype: int, value) -> bytes:
        if vtype == _BOOL:
            return struct.pack("<B", int(value))
        if vtype == _STR:
            return self._pack_str(value)
        if vtype == _ARR:
            etype, items = value
            out = struct.pack("<IQ", etype, len(items))
            for it in items:
                out += self._pack_value(etype, it)
            return out
        return struct.pack(_SCALAR_FMT[vtype], value)

    def write(self):
        align = self.alignment
        header = struct.pack("<IIqq", GGUF_MAGIC, 3, len(self.tensors), len(self.kv))
        kv_blob = b""
        for key, vtype, value in self.kv:
            kv_blob += self._pack_str(key) + struct.pack("<I", vtype)
            kv_blob += self._pack_value(vtype, value)

        info_blob = b""
        offset = 0
        offsets = []
        for name, ne, ggml_type, payload in self.tensors:
            info_blob += self._pack_str(name)
            info_blob += struct.pack("<I", len(ne))
            for d in ne:
                info_blob += struct.pack("<Q", d)
            info_blob += struct.pack("<IQ", ggml_type, offset)
            offsets.append(offset)
            offset += (len(payload) + align - 1) // align * align

        pre = len(header) + len(kv_blob) + len(info_blob)
        data_start = (pre + align - 1) // align * align

        with open(self.path, "wb") as f:
            f.write(header)
            f.write(kv_blob)
            f.write(info_blob)
            f.write(b"\x00" * (data_start - pre))
            pos = 0
            for (_, _, _, payload), off in zip(self.tensors, offsets):
                f.write(b"\x00" * (off - pos))
                f.write(payload)
                pos = off + len(payload)
