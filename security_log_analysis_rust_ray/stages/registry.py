"""Pluggable parser registry — the reference's one real UDF seam.

`parse_log_file` / `parse_all_log_files` take a generic per-line
``parse_func`` (/root/reference/src/parse_logs.rs:120-124,143-151).  The
batch-engine equivalent: a registry of named VECTORIZED batch parsers, each
``(pa.Table with a text column) -> pa.Table`` emitting the routed-row schema.
Registering a new turn/log format is one function, no engine changes.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

BatchParseFn = Callable[[pa.Table], pa.Table]

_REGISTRY: dict[str, BatchParseFn] = {}


def register_parser(name: str, fn: BatchParseFn,
                    replace: bool = False) -> None:
    if name in _REGISTRY and not replace:
        raise ValueError(f"parser {name!r} already registered")
    _REGISTRY[name] = fn


def get_parser(name: str) -> BatchParseFn:
    return _REGISTRY[name]


def registered_parsers() -> list[str]:
    return sorted(_REGISTRY)


def parse_with(name: str, ds, **map_kwargs):
    """Apply a registered parser as a map_batches stage."""
    kwargs = {"batch_format": "pyarrow", "batch_size": None}
    kwargs.update(map_kwargs)
    return ds.map_batches(get_parser(name), **kwargs)


def _register_builtins() -> None:
    from .parse import route_parse
    _REGISTRY.setdefault("routed", route_parse)


_register_builtins()
