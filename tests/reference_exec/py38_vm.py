"""Minimal CPython 3.8 bytecode interpreter for the reference's orphaned
``.pyc`` modules (survey §0.2).

Python 3.12 cannot execute 3.8 code objects, so the parity tests run the
reference's *original compiled bytecode* through this VM instead of
trusting hand-written replicas: class bodies and methods
(``__init__``/``forward``/``_make_layer``/...) execute instruction by
instruction, while every call into torch/math/builtins happens natively.
The result is a real ``torch.nn.Module`` subclass whose behavior is the
reference's own code.

Scope: exactly the opcode set the reference modules use (verified by
census over all 6 pycs); anything outside raises ``NotImplementedError``
rather than guessing. Generators/async are unsupported (only the unused
``save_sample``/``train`` entry points contain them).
"""

from __future__ import annotations

import operator
from typing import Any, Dict, List, Optional, Sequence, Tuple

from py38_marshal import Code38

# --- CPython 3.8 opcode numbers (opcode.py of 3.8) ---------------------
POP_TOP = 1
ROT_TWO = 2
ROT_THREE = 3
DUP_TOP = 4
DUP_TOP_TWO = 5
ROT_FOUR = 6
NOP = 9
UNARY_POSITIVE = 10
UNARY_NEGATIVE = 11
UNARY_NOT = 12
UNARY_INVERT = 15
BINARY_POWER = 19
BINARY_MULTIPLY = 20
BINARY_MODULO = 22
BINARY_ADD = 23
BINARY_SUBTRACT = 24
BINARY_SUBSCR = 25
BINARY_FLOOR_DIVIDE = 26
BINARY_TRUE_DIVIDE = 27
INPLACE_FLOOR_DIVIDE = 28
INPLACE_TRUE_DIVIDE = 29
INPLACE_ADD = 55
INPLACE_SUBTRACT = 56
INPLACE_MULTIPLY = 57
INPLACE_MODULO = 59
STORE_SUBSCR = 60
DELETE_SUBSCR = 61
GET_ITER = 68
LOAD_BUILD_CLASS = 71
BEGIN_FINALLY = 53
WITH_CLEANUP_START = 81
WITH_CLEANUP_FINISH = 82
RETURN_VALUE = 83
POP_BLOCK = 87
END_FINALLY = 88
SETUP_WITH = 143
STORE_NAME = 90
UNPACK_SEQUENCE = 92
FOR_ITER = 93
STORE_ATTR = 95
LOAD_CONST = 100
LOAD_NAME = 101
BUILD_TUPLE = 102
BUILD_LIST = 103
BUILD_SET = 104
BUILD_MAP = 105
LOAD_ATTR = 106
COMPARE_OP = 107
JUMP_FORWARD = 110
JUMP_IF_FALSE_OR_POP = 111
JUMP_IF_TRUE_OR_POP = 112
JUMP_ABSOLUTE = 113
POP_JUMP_IF_FALSE = 114
POP_JUMP_IF_TRUE = 115
LOAD_GLOBAL = 116
LOAD_FAST = 124
STORE_FAST = 125
DELETE_FAST = 126
RAISE_VARARGS = 130
CALL_FUNCTION = 131
MAKE_FUNCTION = 132
BUILD_SLICE = 133
LOAD_CLOSURE = 135
LOAD_DEREF = 136
STORE_DEREF = 137
CALL_FUNCTION_KW = 141
CALL_FUNCTION_EX = 142
EXTENDED_ARG = 144
LIST_APPEND = 145
SET_ADD = 146
MAP_ADD = 147
FORMAT_VALUE = 155
BUILD_CONST_KEY_MAP = 156
BUILD_STRING = 157
LOAD_METHOD = 160
CALL_METHOD = 161

_CMP = (
    operator.lt,
    operator.le,
    operator.eq,
    operator.ne,
    operator.gt,
    operator.ge,
    lambda a, b: a in b,
    lambda a, b: a not in b,
    operator.is_,
    operator.is_not,
)

_BINOPS = {
    BINARY_POWER: operator.pow,
    BINARY_MULTIPLY: operator.mul,
    BINARY_MODULO: operator.mod,
    BINARY_ADD: operator.add,
    BINARY_SUBTRACT: operator.sub,
    BINARY_SUBSCR: lambda a, b: a[b],
    BINARY_FLOOR_DIVIDE: operator.floordiv,
    BINARY_TRUE_DIVIDE: operator.truediv,
    INPLACE_FLOOR_DIVIDE: operator.ifloordiv,
    INPLACE_TRUE_DIVIDE: operator.itruediv,
    INPLACE_ADD: operator.iadd,
    INPLACE_SUBTRACT: operator.isub,
    INPLACE_MULTIPLY: operator.imul,
    INPLACE_MODULO: operator.imod,
}

_NULL = object()  # LOAD_METHOD stack sentinel


class Cell:
    __slots__ = ("value",)

    def __init__(self, value: Any = _NULL):
        self.value = value


class VMFunction:
    """A function whose body is 3.8 bytecode run by :class:`VM38`.

    Implements the descriptor protocol so it binds as a method on the
    rebuilt classes (``self.forward`` etc. work exactly like real
    functions, including through ``nn.Module.__call__``).
    """

    def __init__(
        self,
        vm: "VM38",
        code: Code38,
        globals_: Dict[str, Any],
        defaults: Tuple[Any, ...] = (),
        kwdefaults: Optional[Dict[str, Any]] = None,
        closure: Tuple[Cell, ...] = (),
        qualname: str = "",
    ):
        self.vm = vm
        self.code = code
        self.globals = globals_
        self.defaults = defaults
        self.kwdefaults = kwdefaults or {}
        self.closure = closure
        self.__name__ = code.name
        self.__qualname__ = qualname or code.name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        import functools

        bound = functools.partial(self, obj)
        bound.__name__ = self.__name__  # type: ignore[attr-defined]
        return bound

    def __call__(self, *args, **kwargs):
        co = self.code
        local: Dict[str, Any] = {}
        names = list(co.varnames[: co.argcount])
        # positional
        for name, val in zip(names, args):
            local[name] = val
        if len(args) > co.argcount:
            raise TypeError(f"{co.name}: too many positional args")
        # keyword + defaults
        for k, v in kwargs.items():
            if k in local:
                raise TypeError(f"{co.name}: duplicate arg {k}")
            local[k] = v
        ndef = len(self.defaults)
        for i, name in enumerate(names):
            if name not in local:
                di = i - (co.argcount - ndef)
                if 0 <= di < ndef:
                    local[name] = self.defaults[di]
                elif name in self.kwdefaults:
                    local[name] = self.kwdefaults[name]
                else:
                    raise TypeError(f"{co.name}: missing arg {name!r}")
        return self.vm.run(co, self.globals, local, self.closure)


class VM38:
    """Frame executor for the :data:`Code38` records."""

    def run(
        self,
        co: Code38,
        globals_: Dict[str, Any],
        local: Dict[str, Any],
        closure: Sequence[Cell] = (),
    ) -> Any:
        code = co.code
        stack: List[Any] = []
        # cells: one per cellvar (seeded from same-named locals), plus the
        # closure cells for freevars.
        cells: Dict[str, Cell] = {}
        for name in co.cellvars:
            cells[name] = Cell(local[name]) if name in local else Cell()
        for name, cell in zip(co.freevars, closure):
            cells[name] = cell

        pc = 0
        ext = 0
        blocks: List[int] = []  # loop/finally targets (FOR only here)

        def jump_target_rel(arg: int) -> int:
            return pc + arg  # pc already advanced past the instruction

        while True:
            op = code[pc]
            arg = code[pc + 1] | ext
            ext = 0
            pc += 2

            if op == EXTENDED_ARG:
                ext = arg << 8
                continue
            if op == LOAD_CONST:
                stack.append(co.consts[arg])
            elif op == LOAD_FAST:
                name = co.varnames[arg]
                if name not in local:
                    raise UnboundLocalError(name)
                stack.append(local[name])
            elif op == STORE_FAST:
                local[co.varnames[arg]] = stack.pop()
            elif op == DELETE_FAST:
                del local[co.varnames[arg]]
            elif op in (LOAD_GLOBAL, LOAD_NAME):
                name = co.names[arg]
                if op == LOAD_NAME and name in local:
                    stack.append(local[name])
                elif name in globals_:
                    stack.append(globals_[name])
                else:
                    import builtins

                    try:
                        stack.append(getattr(builtins, name))
                    except AttributeError:
                        raise NameError(f"name {name!r} is not defined")
            elif op == STORE_NAME:
                local[co.names[arg]] = stack.pop()
            elif op == LOAD_ATTR:
                stack.append(getattr(stack.pop(), co.names[arg]))
            elif op == STORE_ATTR:
                obj = stack.pop()
                val = stack.pop()
                setattr(obj, co.names[arg], val)
            elif op == LOAD_METHOD:
                obj = stack.pop()
                stack.append(_NULL)
                stack.append(getattr(obj, co.names[arg]))
            elif op == CALL_METHOD:
                args_ = [stack.pop() for _ in range(arg)][::-1]
                fn = stack.pop()
                sent = stack.pop()
                assert sent is _NULL
                stack.append(self._call(fn, args_, {}, local, co, cells))
            elif op == CALL_FUNCTION:
                args_ = [stack.pop() for _ in range(arg)][::-1]
                fn = stack.pop()
                stack.append(self._call(fn, args_, {}, local, co, cells))
            elif op == CALL_FUNCTION_KW:
                kwnames = stack.pop()
                vals = [stack.pop() for _ in range(arg)][::-1]
                nkw = len(kwnames)
                kw = dict(zip(kwnames, vals[arg - nkw :]))
                args_ = vals[: arg - nkw]
                fn = stack.pop()
                stack.append(self._call(fn, args_, kw, local, co, cells))
            elif op == CALL_FUNCTION_EX:
                kw = stack.pop() if arg & 1 else {}
                args_ = list(stack.pop())
                fn = stack.pop()
                stack.append(self._call(fn, args_, dict(kw), local, co, cells))
            elif op == MAKE_FUNCTION:
                qualname = stack.pop()
                fcode = stack.pop()
                fclosure: Tuple[Cell, ...] = ()
                annotations = None
                kwdefaults = None
                defaults: Tuple[Any, ...] = ()
                if arg & 0x08:
                    fclosure = tuple(stack.pop())
                if arg & 0x04:
                    annotations = stack.pop()
                if arg & 0x02:
                    kwdefaults = stack.pop()
                if arg & 0x01:
                    defaults = tuple(stack.pop())
                del annotations
                stack.append(
                    VMFunction(
                        self, fcode, globals_, defaults, kwdefaults,
                        fclosure, qualname,
                    )
                )
            elif op == LOAD_CLOSURE:
                name = (co.cellvars + co.freevars)[arg]
                stack.append(cells[name])
            elif op == LOAD_DEREF:
                name = (co.cellvars + co.freevars)[arg]
                cell = cells[name]
                if cell.value is _NULL:
                    raise NameError(f"free variable {name!r} unbound")
                stack.append(cell.value)
            elif op == STORE_DEREF:
                name = (co.cellvars + co.freevars)[arg]
                cells[name].value = stack.pop()
            elif op == RETURN_VALUE:
                return stack.pop()
            elif op == POP_TOP:
                stack.pop()
            elif op == DUP_TOP:
                stack.append(stack[-1])
            elif op == DUP_TOP_TWO:
                stack.extend(stack[-2:])
            elif op == ROT_TWO:
                stack[-1], stack[-2] = stack[-2], stack[-1]
            elif op == ROT_THREE:
                stack[-1], stack[-2], stack[-3] = (
                    stack[-2],
                    stack[-3],
                    stack[-1],
                )
            elif op == ROT_FOUR:
                stack[-1], stack[-2], stack[-3], stack[-4] = (
                    stack[-2],
                    stack[-3],
                    stack[-4],
                    stack[-1],
                )
            elif op == NOP:
                pass
            elif op in _BINOPS:
                b = stack.pop()
                a = stack.pop()
                stack.append(_BINOPS[op](a, b))
            elif op == UNARY_NEGATIVE:
                stack.append(-stack.pop())
            elif op == UNARY_POSITIVE:
                stack.append(+stack.pop())
            elif op == UNARY_NOT:
                stack.append(not stack.pop())
            elif op == UNARY_INVERT:
                stack.append(~stack.pop())
            elif op == STORE_SUBSCR:
                key = stack.pop()
                obj = stack.pop()
                val = stack.pop()
                obj[key] = val
            elif op == DELETE_SUBSCR:
                key = stack.pop()
                obj = stack.pop()
                del obj[key]
            elif op == COMPARE_OP:
                b = stack.pop()
                a = stack.pop()
                stack.append(_CMP[arg](a, b))
            elif op == BUILD_TUPLE:
                items = [stack.pop() for _ in range(arg)][::-1]
                stack.append(tuple(items))
            elif op == BUILD_LIST:
                items = [stack.pop() for _ in range(arg)][::-1]
                stack.append(items)
            elif op == BUILD_SET:
                items = [stack.pop() for _ in range(arg)][::-1]
                stack.append(set(items))
            elif op == BUILD_MAP:
                d = {}
                pairs = [stack.pop() for _ in range(2 * arg)][::-1]
                for i in range(0, len(pairs), 2):
                    d[pairs[i]] = pairs[i + 1]
                stack.append(d)
            elif op == BUILD_CONST_KEY_MAP:
                keys = stack.pop()
                vals = [stack.pop() for _ in range(arg)][::-1]
                stack.append(dict(zip(keys, vals)))
            elif op == BUILD_SLICE:
                if arg == 3:
                    step = stack.pop()
                else:
                    step = None
                stop = stack.pop()
                start = stack.pop()
                stack.append(slice(start, stop, step))
            elif op == BUILD_STRING:
                parts = [stack.pop() for _ in range(arg)][::-1]
                stack.append("".join(parts))
            elif op == FORMAT_VALUE:
                spec = stack.pop() if arg & 0x04 else ""
                val = stack.pop()
                conv = arg & 0x03
                if conv == 1:
                    val = str(val)
                elif conv == 2:
                    val = repr(val)
                elif conv == 3:
                    val = ascii(val)
                stack.append(format(val, spec))
            elif op == UNPACK_SEQUENCE:
                seq = list(stack.pop())
                if len(seq) != arg:
                    raise ValueError("unpack length mismatch")
                stack.extend(reversed(seq))
            elif op == GET_ITER:
                stack.append(iter(stack.pop()))
            elif op == FOR_ITER:
                it = stack[-1]
                try:
                    stack.append(next(it))
                except StopIteration:
                    stack.pop()
                    pc = jump_target_rel(arg)
            elif op == JUMP_FORWARD:
                pc = jump_target_rel(arg)
            elif op == JUMP_ABSOLUTE:
                pc = arg
            elif op == POP_JUMP_IF_FALSE:
                if not stack.pop():
                    pc = arg
            elif op == POP_JUMP_IF_TRUE:
                if stack.pop():
                    pc = arg
            elif op == JUMP_IF_FALSE_OR_POP:
                if not stack[-1]:
                    pc = arg
                else:
                    stack.pop()
            elif op == JUMP_IF_TRUE_OR_POP:
                if stack[-1]:
                    pc = arg
                else:
                    stack.pop()
            elif op == LIST_APPEND:
                val = stack.pop()
                stack[-arg].append(val)
            elif op == SET_ADD:
                val = stack.pop()
                stack[-arg].add(val)
            elif op == MAP_ADD:
                val = stack.pop()
                key = stack.pop()
                stack[-arg][key] = val
            elif op == RAISE_VARARGS:
                if arg == 0:
                    raise RuntimeError("re-raise outside except")
                exc = stack.pop() if arg >= 1 else None
                if arg == 2:
                    cause = exc
                    exc = stack.pop()
                    raise (exc() if isinstance(exc, type) else exc) from cause
                raise exc() if isinstance(exc, type) else exc
            elif op == POP_BLOCK:
                if blocks:
                    blocks.pop()
            # ``with`` statement, non-exception path only (the reference
            # uses it solely as ``with open(...) as f:``; an exception
            # inside the body propagates without calling __exit__ — the
            # file then closes via GC, same observable behavior for these
            # tests).
            elif op == SETUP_WITH:
                mgr = stack.pop()
                stack.append(type(mgr).__exit__.__get__(mgr))
                blocks.append(pc + arg)
                stack.append(type(mgr).__enter__(mgr))
            elif op == BEGIN_FINALLY:
                stack.append(None)
            elif op == WITH_CLEANUP_START:
                exc = stack.pop()  # None on the normal path
                if exc is not None:
                    raise NotImplementedError("with-cleanup on exception")
                exit_fn = stack.pop()
                stack.append(None)
                stack.append(exit_fn(None, None, None))
            elif op == WITH_CLEANUP_FINISH:
                stack.pop()  # __exit__ result
                stack.pop()  # the None exception marker
            elif op == END_FINALLY:
                if stack and stack[-1] is None:
                    stack.pop()
                # empty stack == normal completion: continue
            else:
                raise NotImplementedError(
                    f"py38 opcode {op} at {co.name}:{pc - 2} "
                    "(outside the verified reference opcode set)"
                )

    def _call(self, fn, args, kwargs, local, co, cells):
        """Native call, with zero-arg ``super()`` emulation: CPython feeds
        it the implicit ``__class__`` closure cell plus the frame's first
        argument — both available here (the 3.8 compiler adds the
        ``__class__`` freevar to any method that names ``super``)."""
        if fn is super and not args:
            cell = cells.get("__class__")
            self_obj = local.get(co.varnames[0]) if co.varnames else None
            if cell is None or cell.value is _NULL or self_obj is None:
                raise RuntimeError("zero-arg super() outside a VM method")
            return super(cell.value, self_obj)
        return fn(*args, **kwargs)


def build_classes(
    module_code: Code38,
    class_names: Sequence[str],
    globals_: Dict[str, Any],
) -> Dict[str, type]:
    """Execute the class-body code objects of ``module_code`` in the VM and
    materialize real Python classes (bases: ``torch.nn.Module``).

    The module-level bytecode itself is NOT executed — it imports deleted
    sibling modules and launches training on import (survey §7.5
    run-on-import quirk); only the class bodies run.
    """
    import torch.nn as tnn

    vm = VM38()
    globals_.setdefault("__name__", module_code.filename)
    out: Dict[str, type] = {}
    for const in module_code.consts:
        if not isinstance(const, Code38) or const.name not in class_names:
            continue
        ns: Dict[str, Any] = {}
        vm.run(const, globals_, ns, ())
        # The class body exposes its __class__ cell as __classcell__
        # (zero-arg super support); fill it after type() creation.
        classcell = ns.pop("__classcell__", None)
        ns.pop("__module__", None)
        ns.pop("__qualname__", None)
        cls = type(const.name, (tnn.Module,), dict(ns))
        if isinstance(classcell, Cell):
            classcell.value = cls
        out[const.name] = cls
        globals_[const.name] = cls  # later classes may reference earlier
    return out
