"""Pure-Python unmarshaller for CPython 3.8 ``.pyc`` files.

Python 3.12's :mod:`marshal` cannot load 3.8 code objects (the code-object
layout changed in 3.10/3.11), so the reference's orphaned bytecode modules
(`/root/reference/__pycache__/*.cpython-38.pyc`, survey §0.2) are parsed
here into :class:`Code38` records — the raw building blocks the
:mod:`py38_vm` interpreter executes so parity tests can run the *original*
reference code rather than hand-written replicas.

Format: CPython 3.8 ``marshal.c`` ``w_object`` / ``r_object`` (version 4,
with FLAG_REF sharing).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, List, Tuple

MAGIC_38 = 3413


@dataclass
class Code38:
    """A CPython 3.8 code object, field-for-field."""

    argcount: int
    posonlyargcount: int
    kwonlyargcount: int
    nlocals: int
    stacksize: int
    flags: int
    code: bytes
    consts: Tuple[Any, ...]
    names: Tuple[str, ...]
    varnames: Tuple[str, ...]
    freevars: Tuple[str, ...]
    cellvars: Tuple[str, ...]
    filename: str
    name: str
    firstlineno: int
    lnotab: bytes

    def __repr__(self) -> str:  # keep pytest output short
        return f"<Code38 {self.name} @ {self.filename}:{self.firstlineno}>"


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.refs: List[Any] = []

    def _take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated marshal stream")
        self.pos += n
        return b

    def _u8(self) -> int:
        return self._take(1)[0]

    def _i32(self) -> int:
        return struct.unpack("<i", self._take(4))[0]

    def _u32(self) -> int:
        return struct.unpack("<I", self._take(4))[0]

    def _string(self) -> bytes:
        return self._take(self._u32())

    def read_object(self) -> Any:
        t = self._u8()
        flag_ref = bool(t & 0x80)
        t &= 0x7F
        c = chr(t)

        def ref(obj):
            # FLAG_REF objects enter the ref table in creation order; for
            # containers the slot is reserved BEFORE children are read, so
            # the index below is pre-allocated by the caller paths that
            # need it (containers handle it inline).
            if flag_ref:
                self.refs.append(obj)
            return obj

        if c == "N":
            return None  # never ref'd
        if c == "F":
            return False
        if c == "T":
            return True
        if c == ".":
            return Ellipsis
        if c == "0":
            return None  # C NULL; only inside dict sentinels
        if c == "i":
            return ref(self._i32())
        if c == "g":
            return ref(struct.unpack("<d", self._take(8))[0])
        if c == "y":  # BINARY_COMPLEX
            re = struct.unpack("<d", self._take(8))[0]
            im = struct.unpack("<d", self._take(8))[0]
            return ref(complex(re, im))
        if c == "l":  # LONG: 15-bit digits
            n = self._i32()
            sign = -1 if n < 0 else 1
            n = abs(n)
            val = 0
            for i in range(n):
                d = struct.unpack("<H", self._take(2))[0]
                val |= d << (15 * i)
            return ref(sign * val)
        if c == "s":  # bytes
            return ref(self._string())
        if c == "u" or c == "t":  # unicode / interned
            return ref(self._string().decode("utf-8"))
        if c == "a" or c == "A":  # ascii / ascii interned
            return ref(self._string().decode("ascii"))
        if c == "z" or c == "Z":  # short ascii (+interned)
            n = self._u8()
            return ref(self._take(n).decode("ascii"))
        if c == "r":  # reference
            return self.refs[self._u32()]
        if c in "([<>)":
            if c == ")":
                n = self._u8()
            else:
                n = self._u32()
            idx = None
            if flag_ref:
                idx = len(self.refs)
                self.refs.append(None)  # reserve before children
            items = [self.read_object() for _ in range(n)]
            if c == "[":
                obj: Any = items
            elif c == "<":
                obj = set(items)
            elif c == ">":
                obj = frozenset(items)
            else:
                obj = tuple(items)
            if idx is not None:
                self.refs[idx] = obj
            return obj
        if c == "{":
            idx = None
            if flag_ref:
                idx = len(self.refs)
                self.refs.append(None)
            d = {}
            while True:
                k = self.read_object()
                if k is None and self.buf[self.pos - 1] == ord("0"):
                    break
                v = self.read_object()
                d[k] = v
            if idx is not None:
                self.refs[idx] = d
            return d
        if c == "c":  # code object (3.8 layout)
            idx = None
            if flag_ref:
                idx = len(self.refs)
                self.refs.append(None)
            co = Code38(
                argcount=self._i32(),
                posonlyargcount=self._i32(),
                kwonlyargcount=self._i32(),
                nlocals=self._i32(),
                stacksize=self._i32(),
                flags=self._i32(),
                code=self.read_object(),
                consts=self.read_object(),
                names=self.read_object(),
                varnames=self.read_object(),
                freevars=self.read_object(),
                cellvars=self.read_object(),
                filename=self.read_object(),
                name=self.read_object(),
                firstlineno=self._i32(),
                lnotab=self.read_object(),
            )
            if idx is not None:
                self.refs[idx] = co
            return co
        raise ValueError(f"unhandled marshal type {c!r} at {self.pos - 1}")


def load_pyc(path: str) -> Code38:
    """Parse a CPython 3.8 .pyc into the module-level :class:`Code38`."""
    with open(path, "rb") as f:
        raw = f.read()
    magic = struct.unpack("<H", raw[:2])[0]
    if magic != MAGIC_38:
        raise ValueError(f"{path}: magic {magic}, expected {MAGIC_38} (3.8)")
    return _Reader(raw[16:]).read_object()


def iter_codes(co: Code38):
    """Yield co and every nested code object (class bodies, methods)."""
    yield co
    for c in co.consts:
        if isinstance(c, Code38):
            yield from iter_codes(c)
