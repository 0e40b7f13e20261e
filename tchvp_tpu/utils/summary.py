"""Model summaries (the reference's torchsummary usage: recovered
``segmentationUNet.py`` import, commented ``FCT.py:258-262``).

Wraps ``flax.linen.tabulate`` — per-module shapes, param counts, and an
aggregate total matching the reference's pretty-printed parameter count
(``Model.py:149-150``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax

from tchvp_tpu.train.state import human_param_count, param_count


def summarize(
    model: nn.Module,
    example_input: Any,
    depth: Optional[int] = None,
    **call_kwargs,
) -> str:
    """Per-module table of output shapes + parameter counts.

    ``depth`` limits module nesting (torchsummary's flat view is
    depth=1); None shows every submodule.
    """
    tab_kwargs: dict = dict(
        console_kwargs={"width": 120, "force_terminal": False, "no_color": True},
    )
    if depth is not None:
        tab_kwargs["depth"] = depth
    return nn.tabulate(model, jax.random.PRNGKey(0), **tab_kwargs)(
        example_input, **call_kwargs
    )


def count_params(model: nn.Module, example_input: Any, **init_kwargs) -> int:
    variables = model.init(jax.random.PRNGKey(0), example_input, **init_kwargs)
    return param_count(variables["params"])


def describe(model: nn.Module, example_input: Any) -> str:
    """One-line description: class name + pretty param count."""
    n = count_params(model, example_input)
    return f"{type(model).__name__}: {human_param_count(n)} parameters ({n:,})"
