"""Nested-structure ↔ flat dotted-key codec (reference app/flat.py:5-96).

The web layer encodes nested metric specs into HTTP query strings:
``{'metrics': [{'name': 'one'}]}`` ↔ ``{'metrics.0.name': 'one'}``.
Lists round-trip through contiguous zero-based integer keys; decoding a
dict whose keys are all decimal requires them to start at 0 and have no
gaps.  ``max_depth`` bounds recursion on untrusted input.

Engine-independent Python (this is the reference's HTTP API surface, not
a relational operator — SURVEY.md §2.7 F7); the Spark analog for nested
*data* would be struct/array functions, not this codec.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

SEPARATOR = "."


def _check_depth(max_depth: int) -> None:
    if max_depth <= 0:
        raise ValueError("reached max_depth 0")


def _listify(value, max_depth: int = 10):
    """Recursively turn lists into {str(index): item} dicts."""
    if isinstance(value, Mapping):
        _check_depth(max_depth)
        return {k: _listify(v, max_depth - 1) for k, v in value.items()}
    if isinstance(value, Sequence) and not isinstance(value, (str, bytes)):
        _check_depth(max_depth)
        return {str(i): _listify(v, max_depth - 1) for i, v in enumerate(value)}
    return value


def _delistify(value, max_depth: int = 10):
    """Recursively turn all-decimal-keyed dicts back into lists."""
    if not isinstance(value, Mapping):
        return value
    _check_depth(max_depth)
    out = {k: _delistify(v, max_depth - 1) for k, v in value.items()}
    if out and all(k.isascii() and k.isdecimal() for k in out):
        indexes = sorted(int(k) for k in out)
        if indexes[0] != 0:
            raise ValueError("must start from 0")
        if indexes[-1] != len(indexes) - 1:
            raise ValueError("must have no gaps")
        return [out[str(i)] for i in indexes]
    return out


def flatten(nested, max_depth: int = 10) -> dict:
    """``{'a': {'b': 1}, 'c': [2]}`` → ``{'a.b': 1, 'c.0': 2}``."""

    def walk(d: Mapping, depth: int) -> dict:
        flat = {}
        for k, v in d.items():
            if isinstance(v, Mapping):
                if depth <= 1:
                    raise ValueError("reached max_depth 0")
                for ik, iv in walk(v, depth - 1).items():
                    flat[k + SEPARATOR + ik] = iv
            else:
                flat[k] = v
        return flat

    return walk(_listify(nested, max_depth=max_depth), max_depth)


def unflatten(flat: Mapping, max_depth: int = 10):
    """``{'a.b': 1, 'c.0': 2}`` → ``{'a': {'b': 1}, 'c': [2]}``."""
    nested: dict = {}
    for key, value in flat.items():
        parts = key.split(SEPARATOR)
        if len(parts) > max_depth:
            raise ValueError("reached max_depth 0")
        node = nested
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
                node[part] = nxt
            node = nxt
        node[parts[-1]] = value
    return _delistify(nested, max_depth=max_depth)
