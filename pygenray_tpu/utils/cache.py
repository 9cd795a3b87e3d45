"""Structural jit-cache keys and a small LRU used by the trace launchers.

Launchers memoize jitted closures so repeated calls (eigenray iterations,
Monte-Carlo realizations, benchmark loops) skip re-trace/re-hash overhead.
Keys are *structural* — environment treedef + leaf shapes/dtypes — so two
environments with identical structure share one compiled executable (the
environment arrays are passed as runtime arguments, never baked in).
"""

from __future__ import annotations

from collections import OrderedDict

import jax

__all__ = ["env_struct_key", "LRUCache"]


def env_struct_key(env):
    """Hashable structural identity of an ``EnvData`` (or any pytree):
    treedef (which carries the static metadata) + leaf shapes/dtypes."""
    leaves, treedef = jax.tree_util.tree_flatten(env)
    return treedef, tuple((leaf.shape, str(leaf.dtype)) for leaf in leaves)


class LRUCache:
    """Bounded mapping that evicts only the least-recently-used entry
    (a full ``clear()`` on overflow would drop live entries too)."""

    def __init__(self, maxsize: int):
        self.maxsize = maxsize
        self._data = OrderedDict()

    def get(self, key):
        try:
            self._data.move_to_end(key)
            return self._data[key]
        except KeyError:
            return None

    def put(self, key, value):
        self._data[key] = value
        self._data.move_to_end(key)
        while len(self._data) > self.maxsize:
            self._data.popitem(last=False)

    def __len__(self):
        return len(self._data)
