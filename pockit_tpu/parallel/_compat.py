"""shard_map compatibility across jax versions (the experimental module is
deprecated in 0.8 and the stable API renamed ``check_rep`` to
``check_vma``)."""

from __future__ import annotations

import inspect

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    _CHECK_KW = (
        "check_vma"
        if "check_vma" in inspect.signature(_shard_map).parameters
        else "check_rep"
    )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    _CHECK_KW = "check_rep"


def shard_map(f=None, *, mesh, in_specs, out_specs, check_rep=True):
    kw = {_CHECK_KW: check_rep}
    if f is None:
        return lambda g: _shard_map(
            g, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw
        )
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)
