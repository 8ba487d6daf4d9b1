"""ctypes bindings for the C++ TFRecord reader (native/tfrecord_reader.cc).

Returns the same ``{name: (kind, values)}`` structure as the pure-Python
codec in ``tfrecord.py`` so the two are interchangeable; ``dataset.py``
prefers this one when the shared library is built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache
from typing import Dict, Iterator

_LIB_NAME = "libtfrecord_reader.so"


@lru_cache(maxsize=1)
def _load_library():
    candidates = [
        os.path.join(os.path.dirname(__file__), "..", "..", "native",
                     _LIB_NAME),
        os.path.join(os.path.dirname(__file__), _LIB_NAME),
        _LIB_NAME,
    ]
    lib = None
    for cand in candidates:
        try:
            lib = ctypes.CDLL(os.path.abspath(cand)
                              if os.path.sep in cand else cand)
            break
        except OSError:
            continue
    if lib is None:
        raise OSError(f"{_LIB_NAME} not built (run `make -C native`)")
    lib.tfr_open.restype = ctypes.c_void_p
    lib.tfr_open.argtypes = [ctypes.c_char_p]
    lib.tfr_close.argtypes = [ctypes.c_void_p]
    lib.tfr_num_examples.argtypes = [ctypes.c_void_p]
    lib.tfr_num_fields.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tfr_field_name.restype = ctypes.c_char_p
    lib.tfr_field_name.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.tfr_field_kind.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.tfr_field_count.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_int]
    lib.tfr_bytes_len.restype = ctypes.c_int64
    lib.tfr_bytes_len.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int]
    lib.tfr_bytes_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.tfr_bytes_data.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int]
    lib.tfr_float_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.tfr_float_data.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.tfr_int64_data.restype = ctypes.POINTER(ctypes.c_int64)
    lib.tfr_int64_data.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.tfr_crc32c.restype = ctypes.c_uint32
    lib.tfr_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    return lib


def available() -> bool:
    try:
        _load_library()
        return True
    except OSError:
        return False


def crc32c_native(data: bytes) -> int:
    lib = _load_library()
    return lib.tfr_crc32c(data, len(data))


def read_examples_native(path: str) -> Iterator[Dict[str, tuple]]:
    lib = _load_library()
    handle = lib.tfr_open(path.encode("utf-8"))
    if not handle:
        raise IOError(f"failed to read TFRecord: {path}")
    try:
        kinds = {0: "bytes", 1: "float", 2: "int64"}
        for e in range(lib.tfr_num_examples(handle)):
            example: Dict[str, tuple] = {}
            for f in range(lib.tfr_num_fields(handle, e)):
                name = lib.tfr_field_name(handle, e, f).decode("utf-8")
                kind = kinds[lib.tfr_field_kind(handle, e, f)]
                count = lib.tfr_field_count(handle, e, f)
                if kind == "bytes":
                    values = []
                    for i in range(count):
                        n = lib.tfr_bytes_len(handle, e, f, i)
                        ptr = lib.tfr_bytes_data(handle, e, f, i)
                        values.append(ctypes.string_at(ptr, n))
                elif kind == "float":
                    ptr = lib.tfr_float_data(handle, e, f)
                    values = [ptr[i] for i in range(count)]
                else:
                    ptr = lib.tfr_int64_data(handle, e, f)
                    values = [ptr[i] for i in range(count)]
                example[name] = (kind, values)
            yield example
    finally:
        lib.tfr_close(handle)
