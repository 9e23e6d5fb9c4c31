"""Minimal Torch7 `.t7` format WRITER — test-fixture composition only.

No torchfile/torch-writer exists in this environment, so fixtures are
written byte-by-byte from the format definition (torch7 File.lua): int32
type tags, float64 numbers, int32-length strings, int64 longs. Every
structural byte (tags, heap indices, 1-based storage offsets) stays
explicit in the low-level helpers so a reader bug can't cancel a writer
bug; `GraphWriter` adds auto-assigned heap ids for composing whole
nn-module graphs (the t7_import automapper round-trip test).
"""

import struct

import numpy as np

from multipathnet_tpu.data import t7


def w_int(i):
    return struct.pack("<i", i)


def w_long(v):
    return struct.pack("<q", v)


def w_num(x):
    return w_int(t7.TYPE_NUMBER) + struct.pack("<d", x)


def w_rawstr(s):  # size+bytes, NO tag (torch object class/version strings)
    b = s.encode()
    return w_int(len(b)) + b


def w_str(s):
    return w_int(t7.TYPE_STRING) + w_rawstr(s)


def w_bool(b):
    return w_int(t7.TYPE_BOOLEAN) + w_int(1 if b else 0)


def w_nil():
    return w_int(t7.TYPE_NIL)


def w_table(idx, pairs):
    body = b"".join(k + v for k, v in pairs)
    return w_int(t7.TYPE_TABLE) + w_int(idx) + w_int(len(pairs)) + body


def w_ref(idx, tag=t7.TYPE_TABLE):
    """Re-reference a memoized heap object."""
    return w_int(tag) + w_int(idx)


def w_storage(idx, name, arr):
    arr = np.asarray(arr)
    return (w_int(t7.TYPE_TORCH) + w_int(idx) + w_rawstr("V 1")
            + w_rawstr(name) + w_long(arr.size) + arr.tobytes())


def w_tensor(idx, name, sizes, strides, offset1, storage_bytes):
    # nDimension is an int32 (THFile writeInt); sizes/strides/offset are
    # longs — r3 code-review fix: an earlier w_long(ndim) here mirrored the
    # same bug in the reader, so the suite was self-consistent but both
    # diverged from real torch.save output
    return (w_int(t7.TYPE_TORCH) + w_int(idx) + w_rawstr("V 1")
            + w_rawstr(name) + w_int(len(sizes))
            + b"".join(w_long(s) for s in sizes)
            + b"".join(w_long(s) for s in strides)
            + w_long(offset1) + storage_bytes)


def w_object(idx, classname, table_bytes, version="V 1"):
    return (w_int(t7.TYPE_TORCH) + w_int(idx) + w_rawstr(version)
            + w_rawstr(classname) + table_bytes)


class GraphWriter:
    """Compose nn-module graphs as `.t7` bytes with auto-assigned heap
    indices (each call allocates fresh ids, so no accidental memoization)."""

    def __init__(self, start: int = 1000):
        self._idx = start

    def nid(self) -> int:
        self._idx += 1
        return self._idx

    def tensor(self, arr) -> bytes:
        arr = np.ascontiguousarray(np.asarray(arr, np.float32))
        strides = [int(s // arr.itemsize) for s in arr.strides]
        return w_tensor(self.nid(), "torch.FloatTensor", list(arr.shape),
                        strides, 1,
                        w_storage(self.nid(), "torch.FloatStorage",
                                  arr.ravel()))

    def module(self, classname: str, arrays: dict | None = None,
               scalars: dict | None = None) -> bytes:
        """A leaf nn module: tensor-valued fields + numeric fields (e.g.
        SpatialConvolutionMM's kW/kH/nInputPlane)."""
        fields = [(w_str(k), self.tensor(v))
                  for k, v in (arrays or {}).items()]
        fields += [(w_str(k), w_num(v)) for k, v in (scalars or {}).items()]
        fields.append((w_str("train"), w_bool(False)))
        return w_object(self.nid(), classname,
                        w_table(self.nid(), fields))

    def container(self, classname: str, children: list) -> bytes:
        mods = w_table(self.nid(),
                       [(w_num(i + 1), c) for i, c in enumerate(children)])
        return w_object(self.nid(), classname,
                        w_table(self.nid(), [(w_str("modules"), mods)]))
