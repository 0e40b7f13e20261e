"""Load the reference's ACTUAL model code for execution at test time.

Two paths (VERDICT r1 "next" #1):

* :func:`load_source_classes` — AST-filter a reference ``.py`` (keep only
  resolvable imports + the requested class definitions, dropping the
  run-on-import training tails like ``FCT.py:410-412`` and imports of the
  deleted ``dataset``/``metric`` modules) and ``exec`` it against real
  torch.
* :func:`load_pyc_classes` — unmarshal a 3.8 ``.pyc``
  (:mod:`py38_marshal`) and execute its class bodies/methods in the
  :mod:`py38_vm` bytecode interpreter (Python 3.12 cannot run 3.8 code
  objects natively).

Both return real ``torch.nn.Module`` classes running the reference's own
logic, so parity tests compare against the executed original rather than
hand-written replicas.
"""

from __future__ import annotations

import ast
import math
import os
from typing import Dict, Sequence

import numpy as np
import torch
import torch.nn as nn

from py38_marshal import load_pyc
from py38_vm import build_classes

REFERENCE = "/root/reference"


def _import_resolvable(node: ast.stmt) -> bool:
    """Keep only imports of installed packages (torch/numpy/collections...);
    the reference also imports its own deleted modules (``dataset``,
    ``metric``) and training-only deps (tensorboardX, tqdm, scipy, PIL) that
    the model classes never touch."""
    if isinstance(node, ast.Import):
        roots = [a.name.split(".")[0] for a in node.names]
    elif isinstance(node, ast.ImportFrom):
        roots = [(node.module or "").split(".")[0]]
    else:
        return False
    allowed = {"torch", "numpy", "math", "collections", "typing", "functools"}
    return all(r in allowed for r in roots)


def _check_class_body(cls: ast.ClassDef, path: str) -> None:
    """Reject class-scope statements beyond defs/assigns/docstrings.

    The AST filter keeps whole ClassDef nodes; arbitrary code at CLASS
    scope (imports, calls, exec) would still run at exec() time even
    though module-level statements are dropped (round-2 advisor).
    Method bodies only run when a test instantiates/calls the class —
    that is the point of executed-reference testing — but class scope
    runs unconditionally, so it is held to a declarations-only shape."""
    for node in cls.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Assign,
                   ast.AnnAssign, ast.Pass, ast.ClassDef)
        ):
            continue
        if isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
            continue  # docstring
        raise ValueError(
            f"{path}: class {cls.name} has a non-declaration statement at "
            f"class scope (line {node.lineno}: {type(node).__name__}) — "
            f"refusing to exec untrusted class-scope code"
        )


def load_source_classes(
    module: str, class_names: Sequence[str]
) -> Dict[str, type]:
    """Exec the named classes from ``/root/reference/<module>.py``."""
    path = os.path.join(REFERENCE, module + ".py")
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    keep = [
        n
        for n in tree.body
        if _import_resolvable(n)
        or (isinstance(n, ast.ClassDef) and n.name in class_names)
    ]
    for n in keep:
        if isinstance(n, ast.ClassDef):
            _check_class_body(n, path)
    found = {n.name for n in keep if isinstance(n, ast.ClassDef)}
    missing = set(class_names) - found
    if missing:
        raise ValueError(f"{path}: classes not found: {sorted(missing)}")
    mod = ast.Module(body=keep, type_ignores=[])
    ns: Dict[str, object] = {}
    exec(compile(mod, path, "exec"), ns)  # noqa: S102 - the point of the test
    return {name: ns[name] for name in class_names}


def load_pyc_classes(
    module: str, class_names: Sequence[str]
) -> Dict[str, type]:
    """Build the named classes from the reference pyc via the 3.8 VM."""
    path = os.path.join(
        REFERENCE, "__pycache__", f"{module}.cpython-38.pyc"
    )
    co = load_pyc(path)
    from collections import OrderedDict

    g = {"torch": torch, "nn": nn, "math": math, "np": np, "numpy": np,
         "OrderedDict": OrderedDict}
    return build_classes(co, class_names, g)
